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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); r
    }
    time("warm-docs")(docs.count())
    val full = time("full-pipeline")(
      graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count())
    println(s"PROF pairs=$full")
    val keep = time("minhash-keep")(
      graft.operators.Dedup.minhashKeep(docs, threshold = 0.8).count())
    println(s"PROF keep=$keep")
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
