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
    val cc2 = time("cc-total2")(Dedup.simhashComponents(docs).count())
    println(s"PROF cc2-rows=$cc2")
    spark.stop()
  }
}
