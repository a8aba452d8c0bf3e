package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Stage attribution for dedup_spans / quality_bigram (Bench
  * conditions): which leg of each pipeline carries the wall time. */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    def t(label: String)(f: => Long): Unit = {
      f; spark.catalog.clearCache()
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      spark.catalog.clearCache()
    }
    t("tokens-only")(docs.select(tokens(col("text")).as("tok"))
      .select(sum(size(col("tok")))).head.getLong(0))
    t("shingles8")(docs.select(tokens(col("text")).as("tok"))
      .select(wordShingles(col("tok"), 8).as("sh"))
      .select(sum(size(col("sh")))).head.getLong(0))
    t("grams-hashed")(docs.select(col("doc_id"), tokens(col("text")).as("tok"))
      .select(col("doc_id"), wordShingles(col("tok"), 8).as("sh"))
      .select(col("doc_id"), posexplode(col("sh")))
      .select(col("doc_id"), col("pos"), hash32(col("col")).as("h"))
      .count())
    t("full-spans")(graft.operators.Dedup
      .duplicatedSpans(docs, k = 8, minCount = 2).count())
    t("bigram-full")(graft.operators.NgramLm.bigramNll(docs).count())
    t("bigram-grams")(docs.select(col("doc_id"), tokens(col("text")).as("tok"))
      .select(col("doc_id"), wordShingles(col("tok"), 2).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("a", substring_index(col("g"), " ", 1))
      .count())
    // ProfileScale leg: spans wall + output under corpus replication —
    // the gram-frequency design has no quadratic stage, so wall should
    // grow ~linearly while N×k (replicas get distinct ids; their gram
    // frequencies double/quadruple but the island merge stays per-doc)
    Seq(1, 2, 4).foreach { k =>
      val rep = (0 until k).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.duplicatedSpans(rep, k = 8, minCount = 2).count()
      println(f"PROF spans-x$k: ${(System.nanoTime() - t0) / 1e9}%.2f s (spans=$n)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
