package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.KnnGraph
import graft.sources.{GraphStore, Tables}

/** Phase attribution for ann_graph_store's measured pass (r12: the
  * point-lookup serving walk raised the bench row 5.0 → 9.3 s; this
  * splits build / store write / corpus write / walk so the cost is
  * attributable). */
object ProfileStoreWalk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val e = Tables.embeddings(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime())
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = Option(starts.get(je.jobId)).getOrElse(System.nanoTime())
          jobNanos.addAndGet(System.nanoTime() - s)
        }
      })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val jn0 = jobNanos.get()
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(${jobs.get() - j0} jobs, ${(jobNanos.get() - jn0) / 1e9}%.2f s in-job)")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val layers = time("build (cached on pass 2)")(
        KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 3, maxLevel = 1))
      val path = java.nio.file.Files
        .createTempDirectory("graft-psw").toString
      time("GraphStore.write")(GraphStore.write(layers, path))
      time("GraphStore.writeCorpus")(GraphStore.writeCorpus(e, path))
      val queries = e.filter($"vec_id" === 0L)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      time("hierSearchPointLookup walk")(
        GraphStore.hierSearchPointLookup(spark, path, queries,
          beam = 12, hops = 3, k = 10).collect())
      time("hierSearch (whole-frame store walk)")(
        GraphStore.hierSearch(spark, path, e, queries,
          beam = 12, hops = 3, k = 10).collect())
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
    spark.stop()
  }
}
