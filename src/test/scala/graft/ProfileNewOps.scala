package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scale legs for the round-8 session-4 operators (same replication
  * models as ProfileScale): decontam_bloom's row-local bitset probe and
  * embed_pc1's per-iteration d-cell accumulation should both be LINEAR
  * in corpus size — no stage may grow superlinearly. Run manually via
  * `Test/runMain graft.ProfileNewOps`. */
object ProfileNewOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
      spark.catalog.clearCache()
    }

    // documents ×k, replica-unique token suffix (disjoint vocabulary
    // shards, constant duplicate density — ProfileScale's model). The
    // eval slice (doc_id % 41) grows with the corpus, so the filter
    // load factor rises — realistic for a growing benchmark suite.
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    def repDocs(k: Int) = (0 until k).map { i =>
      base.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", "$1" + s"x$i").as("text"))
    }.reduce(_ unionByName _)
    Seq(1, 3, 10).foreach { k =>
      val docs = repDocs(k)
      time(s"bloom-x$k")(
        graft.operators.Decontaminate.bloomAudit(
          docs.filter($"doc_id" % 41 =!= 0), docs.filter($"doc_id" % 41 === 0),
          n = 3, m = 16384, kh = 3).count())
    }

    // embeddings ×k, per-replica constant shift (disjoint regions).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    def repEmb(k: Int) = (0 until k).map { i =>
      emb.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
    }.reduce(_ unionByName _)
    Seq(1, 3, 10).foreach { k =>
      val e = repEmb(k)
      time(s"pc1-x$k")(
        graft.operators.Pca.pc1(e, dim = 64, iters = 3).count())
    }
    spark.stop()
  }
}
