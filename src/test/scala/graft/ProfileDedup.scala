package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Ad-hoc stage profiler for the dedup pipelines (run manually via
  * `Test/runMain graft.ProfileDedup`). Each pipeline run is followed by
  * clearCache so measurements are isolated (Bench contract). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64*1024*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); r
    }
    time("warm-docs")(docs.count())
    // per-stage breakdown of one cold word-unigram run (no clearCache
    // between stages — cumulative pipeline view)
    locally {
      val t0 = System.nanoTime()
      val (memberMap, verified) = graft.operators.Dedup.minhashRepPairs(
        docs, "text", "doc_id", 1, 12, 4, 0.8, null, null)
      println(f"PROF stage-materialize(sig+keyed): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val nv = verified.count()
      println(f"PROF stage-cand+verify: ${(System.nanoTime() - t1) / 1e9}%.2f s (pairs=$nv)")
      val t2 = System.nanoTime()
      val nm = memberMap.count()
      println(f"PROF stage-membermap: ${(System.nanoTime() - t2) / 1e9}%.2f s (rows=$nm)")
      val t3 = System.nanoTime()
      val n = graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count()
      println(f"PROF stage-expand+count(cached): ${(System.nanoTime() - t3) / 1e9}%.2f s (pairs=$n)")
      spark.catalog.clearCache()
    }
    // Spark-stage-level timing of a steady-state cold run
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), ms, i.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("listener-pipeline")(
      graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
        threshold = 0.55, hashedShingler = c => ngramHashes(c, 4)).count())
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, t) =>
      println(f"PROF stage $id%4d ${ms}%6d ms tasks=$t%3d  $n")
    }
    val full = time("full-pipeline")(
      graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count())
    println(s"PROF pairs=$full")
    val keep = time("minhash-keep")(
      graft.operators.Dedup.minhashKeep(docs, threshold = 0.8).count())
    println(s"PROF keep=$keep")
    // ngram micro-probes: where does the 256-output-pair query spend 5s?
    time("ngram-hash-pass")(
      docs.repartition(col("doc_id"))
        .select(ngramHashes(col("text"), 4).as("hs"))
        .select(sum(size(col("hs")))).collect())
    time("ngram-hash+fp")(
      docs.repartition(col("doc_id"))
        .select(col("doc_id"), ngramHashes(col("text"), 4).as("hs"))
        .withColumn("set_key", setFingerprint(array_distinct(col("hs"))))
        .select(max(col("set_key.f1"))).collect())
    time("ngram-materialize") {
      val (m, v) = graft.operators.Dedup.minhashRepPairs(
        docs, "text", "doc_id", 1, 48, 16, 0.55, null, c => ngramHashes(c, 4))
      ()
    }
    val fullNg = time("full-ngram")(
      graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
        threshold = 0.55, hashedShingler = c => ngramHashes(c, 4)).count())
    println(s"PROF ngram-pairs=$fullNg")
    val fullSh = time("full-simhash")(
      graft.operators.Dedup.simhashNearDups(docs).count())
    println(s"PROF simhash-pairs=$fullSh")
    spark.stop()
  }
}
