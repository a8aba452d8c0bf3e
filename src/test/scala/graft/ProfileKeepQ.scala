package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Attribution for dedup_keep_quality: which leg re-executes. */
object ProfileKeepQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    docs.count()
    def t(label: String)(f: => Long): Unit = {
      f; spark.catalog.clearCache()                       // warmup
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"PROF $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
        spark.catalog.clearCache()
      }
    }
    t("ent-relational")(graft.operators.Quality.charEntropy(docs)
      .agg(sum($"entropy_q")).head.getLong(0))
    t("components-only")(graft.operators.Dedup.simhashComponents(docs).count())
    t("ent-hof-forced")(docs
      .select($"doc_id", normText($"text").as("norm"))
      .select($"doc_id", charsOf($"norm").as("chars"))
      .select($"doc_id", charEntropyQ($"chars").as("entropy_q"))
      .agg(sum($"entropy_q")).head.getLong(0))
    t("keep-quality-full")(
      graft.queries.TextQueries.queries("dedup_keep_quality")(spark, dir).count())
    spark.stop()
  }
}
