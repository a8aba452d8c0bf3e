package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Keep-path scale check at 10x (ad-hoc). */
object ProfileKeepOnly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1").select($"doc_id", $"text")
    val docs = (0 until 10).map { i =>
      base.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", "$1" + s"x$i").as("text"))
    }.reduce(_ unionByName _)
    docs.count()
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.minhashKeep(docs, threshold = 0.8).count()
      println(f"PROF keep-only#$r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
