package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end timing of the prefix-filter Jaccard join at sf0.1.
  * History: the first shape paid 10.8 s re-tokenizing per shingle (the
  * inlined-HOF trap — fixed with the persist barrier in the query) and
  * 9.3 s shipping string arrays through the verify join (fixed by
  * hash56-encoding set elements + the candidate length filter). */
object ProfileSetJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("setjoin_jaccard")(spark, dir).count()
      println(f"PROFILE setjoin_jaccard pass $pass: ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
