package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Focused warm-measured timing of the two hot dedup entries (Bench
  * conditions: warmup pass, clearCache, measured pass). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    def bench(label: String)(f: => Long): Unit = {
      f; spark.catalog.clearCache()                       // warmup
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"PROF $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    bench("ngram-fused")(
      graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
        threshold = 0.55, hashedShingler = c => ngramHashes(c, 4)).count())
    bench("ngram-hof")(
      graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
        threshold = 0.55, shingler = c => array_distinct(charShingles(c, 4))).count())
    bench("minhash")(
      graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count())
    spark.stop()
  }
}
