package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.functions.TextFunctions._
import graft.sources.Tables

/** r16 diagnostic: the rep-index memoization (localCheckpoint pin)
  * versus the per-call persist it replaced, on the dedup_ngram shape —
  * which stage eats the serve-side wall when withSig/keyed come from
  * checkpoint scans instead of the columnar cache. */
object ProfileRepIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages += ((si.stageId, si.name.split("\n")(0).take(60), wall, si.numTasks))
      }
    })
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    val target = args.headOption.getOrElse("ngram")
    if (target == "opq") {
      // split the ann_opq pass into plan-construction / optimization /
      // execution wall — is the 1.6 s driver compute Catalyst work on
      // the literal-matrix encode tree?
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries("ann_opq")(spark, "/root/testdata/sf0.1")
        val t1 = System.nanoTime()
        val _ = df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        println(f"OPQ pass=$p build=${(t1 - t0) / 1e9}%.2f s plan=${(t2 - t1) / 1e9}%.2f s exec=${(t3 - t2) / 1e9}%.2f s rows=$n")
        spark.catalog.clearCache()
        graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      }
      spark.stop(); return
    }
    def q(): Long = target match {
      case "setjoin" =>
        SparkEntry.queries("setjoin_jaccard")(spark, "/root/testdata/sf0.1").count()
      case _ =>
        graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
          threshold = 0.55, hashedShingler = c => ngramHashes(c, 4),
          earlyCandidateDistinct = false).count()
    }
    def run(label: String): Unit = {
      q(); spark.catalog.clearCache()  // warmup (build lands here)
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      stages.clear()
      val t0 = System.nanoTime()
      q()
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      stages.sortBy(-_._3).take(8).foreach { case (id, n, w, t) =>
        println(f"  stage $id%4d $w%6d ms tasks=$t%3d  $n")
      }
      spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
    graft.util.IndexCache.enabled = true
    run("memoized")
    graft.util.IndexCache.clear()
    graft.util.IndexCache.enabled = false
    run("percall-persist")
    spark.stop()
  }
}
