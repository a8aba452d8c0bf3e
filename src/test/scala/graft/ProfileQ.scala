package graft
import org.apache.spark.sql.SparkSession
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64*1024*1024).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      val f = SparkEntry.queries(name)
      f(spark, dir).count(); spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime(); f(spark, dir).count()
        println(f"PROFQ $name#$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
        graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      }
    }
    spark.stop()
  }
}
