package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Ad-hoc stage profiler for the dedup pipelines (run manually via
  * `Test/runMain graft.ProfileDedup`). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = docs.select($"doc_id".as("id"), array_distinct(tokens($"text")).as("sh"))
    val reps = sh.withColumn("set_key", md5(concat_ws("", array_sort($"sh"))))
      .groupBy($"set_key")
      .agg(min($"id").as("rep"), collect_list($"id").as("members"), first($"sh").as("sh"))
      .repartition($"rep")
    time("warm-docs")(docs.count())
    val nReps = time("rep-collapse")(reps.count())
    println(s"PROF reps=$nReps")
    val withSig = reps.withColumn("hs", transform($"sh", (s: Column) => hash32(s)))
      .withColumn("minhash_sig", minhashNumeric($"hs", 12))
    time("sig-compute")(withSig.select("minhash_sig").count())
    val cand = graft.operators.Dedup.lshCandidates(
      withSig.select($"rep".as("id"), $"minhash_sig"), "id", 4, 3)
    val nCand = time("candidates")(cand.count())
    println(s"PROF cand=$nCand")
    val full = time("full-pipeline")(
      graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count())
    println(s"PROF pairs=$full")
    val fullNg = time("full-ngram")(
      graft.operators.Dedup.minhashNearDups(docs, numHashes = 48, bands = 16,
        threshold = 0.55, shingler = c => array_distinct(charShingles(c, 4))).count())
    println(s"PROF ngram-pairs=$fullNg")
    val fullSh = time("full-simhash")(
      graft.operators.Dedup.simhashNearDups(docs).count())
    println(s"PROF simhash-pairs=$fullSh")
    spark.stop()
  }
}
