package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Stage attribution for the ngram (48 hashes / 16 bands) pipeline. */
object ProfileNgramStages {
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
    (1 to 2).foreach { round =>
      spark.catalog.clearCache()
      val keyed = docs
        .select(col("doc_id").as("id"), ngramHashes(col("text"), 4).as("hs"))
        .withColumn("set_key", setFingerprint(col("hs")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round-keyed")(keyed.count())
      val reps = keyed.groupBy(col("set_key"))
        .agg(min(col("id")).as("rep"), first(col("hs")).as("hs"))
      val nr = time(s"r$round-reps")(reps.count())
      if (round == 2) println(s"PROF reps=$nr")
      val withSig = reps
        .select(col("set_key"), col("rep"),
          minhashFamilies(col("hs"), 48).as("minhash_sig"),
          array_distinct(col("hs")).as("hsd"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round-withSig")(withSig.count())
      val cand = graft.operators.Dedup.lshCandidates(
        withSig.select(col("rep").as("id"), col("minhash_sig")), "id", 16, 3)
      val nc = time(s"r$round-cand")(cand.count())
      if (round == 2) println(s"PROF cand=$nc")
      val hsSize = keyed.select(avg(size(col("hs")))).head().getDouble(0)
      if (round == 2) println(f"PROF avg-hs=$hsSize%.0f")
    }
    spark.stop()
  }
}
