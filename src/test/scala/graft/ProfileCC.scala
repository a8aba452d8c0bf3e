package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Round-count + wall attribution for dedup_cc at sf0.1. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64*1024*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cc = time("cc-total")(Dedup.simhashComponents(docs).count())
    println(s"PROF cc-rows=$cc")
    spark.catalog.clearCache()
    graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    // phase breakdown (JIT-warm)
    locally {
      val t0 = System.nanoTime()
      val (memberMap, repPairs, repNodes) =
        Dedup.simhashRepFrames(docs, "text", "doc_id", 6)
      println(f"PROF phase-repframes(sh.count): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val np = repPairs.count()
      println(f"PROF phase-reppairs: ${(System.nanoTime() - t1) / 1e9}%.2f s (pairs=$np)")
      val t2 = System.nanoTime()
      val repComp = Dedup.connectedComponents(repNodes,
        repPairs.select(col("r1").as("id1"), col("r2").as("id2")), "rep")
      val nc = repComp.count()
      println(f"PROF phase-ccloop: ${(System.nanoTime() - t2) / 1e9}%.2f s (rows=$nc)")
      val t3 = System.nanoTime()
      val n = memberMap.join(repComp, "rep").count()
      println(f"PROF phase-expand: ${(System.nanoTime() - t3) / 1e9}%.2f s (rows=$n)")
      spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
    val cc2 = time("cc-total2")(Dedup.simhashComponents(docs).count())
    println(s"PROF cc2-rows=$cc2")
    spark.catalog.clearCache()
    graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    // job-level attribution for the loop passes
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val t0g = System.nanoTime()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime() - t0g)
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = Option(starts.get(je.jobId)).getOrElse(0L)
        jobLog.add((je.jobId, s, System.nanoTime() - t0g - s))
      }
    })
    // A/B/C the closure regimes in one JVM (noise-paired): the rep
    // frames are rebuilt per pass so every pass pays the same pipeline;
    // only the regime flips. driver = union-find collect; clone-loop =
    // distributed loop in the AQE-off cloned session; plain-loop =
    // distributed loop under caller confs.
    for (round <- 1 to 2; regime <- Seq("driver", "clone-loop", "plain-loop")) {
      regime match {
        case "driver" =>
          spark.conf.set("graft.cc.driverUnionFindEdges", "4000000")
        case "clone-loop" =>
          spark.conf.set("graft.cc.driverUnionFindEdges", "0")
          spark.conf.set("graft.cc.smallGraphEdges", "10000000")
        case "plain-loop" =>
          spark.conf.set("graft.cc.driverUnionFindEdges", "0")
          spark.conf.set("graft.cc.smallGraphEdges", "0")
      }
      val (memberMap, repPairs, repNodes) =
        Dedup.simhashRepFrames(docs, "text", "doc_id", 6)
      repPairs.count()
      val t0 = System.nanoTime()
      jobLog.clear()
      Dedup.connectedComponents(repNodes,
        repPairs.select(col("r1").as("id1"), col("r2").as("id2")), "rep").count()
      println(f"PROF ab-loop regime=$regime round=$round: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      jobLog.forEach { case (id, s, d) =>
        println(f"PROF   job=$id start=${s / 1e9}%.2f dur=${d / 1e9}%.3f") }
      spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
    spark.conf.unset("graft.cc.smallGraphEdges")
    spark.conf.unset("graft.cc.driverUnionFindEdges")
    spark.stop()
  }
}
