package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object ExplainNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val df = graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
      threshold = 0.55, hashedShingler = c => ngramHashes(c, 4))
    df.count() // let AQE finalize
    println("==== FINAL PLAN ====")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
