package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bq
import graft.sources.Tables

/** Scale evidence for the binary/MIH family (the ProfileScale pattern):
  * embeddings replicated ×k with perturbed components, measuring MIH
  * candidate volume and time — candidates must grow LINEARLY in N
  * (expected match rate per 8-bit substring is 1/256 × 8 probes ≈ 3.1%
  * of the corpus, never N²), which is the property that keeps the
  * probe cheap at 100 TB. Run:
  *   sbt "Test/runMain graft.ProfileBinary"
  */
object ProfileBinary {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = base.count()
    // replica i flips a deterministic i-dependent half of the
    // dimensions — signatures stay sign-diverse (a uniform shift would
    // drive every replica to the all-ones signature and hide growth)
    def replicate(k: Int) = (0 until k).map { i =>
      base.select(($"vec_id" + lit(i.toLong * 10000000L)).as("vec_id"),
        transform($"embedding", (x, d) =>
          x * when(pmod(d * 31 + lit(i * 17), lit(64)) < 32, lit(1f))
            .otherwise(lit(-1f)))
          .as("embedding"))
    }.reduce(_ unionByName _)
    val q = base.filter($"vec_id" === 0L).select($"embedding")
      .head.getSeq[Float](0).toArray
    val qs = Bq.signBitsLocal(q)
    Seq(1, 3, 10).foreach { k =>
      val enc = Bq.encode(replicate(k), 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      enc.count()
      // candidate volume: rows sharing >= 1 of the 8 substrings
      val mask = 255L
      val candCount = (0 until 8).map { j =>
        enc.filter(shiftright($"sig", 8 * j).bitwiseAND(lit(mask)) ===
          lit((qs >>> (8 * j)) & mask))
      }.reduce(_ unionByName _).select($"vec_id").distinct().count()
      val t0 = System.nanoTime()
      Bq.mihTopK(enc, qs, 10).count()
      val mihS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Bq.hammingTopK(enc, qs, 10).count()
      val scanS = (System.nanoTime() - t1) / 1e9
      println(f"PROF binary x$k N=${n * k} candidates=$candCount " +
        f"(${candCount * 100.0 / (n * k)}%.1f%%) mih=$mihS%.2f s fullscan=$scanS%.2f s")
      enc.unpersist()
    }
    spark.stop()
  }
}
