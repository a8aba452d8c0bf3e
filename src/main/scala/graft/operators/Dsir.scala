package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** DSIR-style data selection with importance resampling (arXiv:2302.03169):
  * score every raw document by how much it resembles a TARGET
  * distribution, using hashed n-gram features — the importance weight is
  * the log-likelihood ratio of the doc's tokens under smoothed unigram
  * bucket models of target vs raw. High scores select raw data "shaped
  * like" the target corpus without training a classifier.
  *
  * Spark-first shape, built for 100 TB:
  *  - token explode is linear; both bucket-count tables are
  *    partial-aggregated hash-groupBys on a SMALL key space (`buckets`,
  *    default 4096) — the shuffle moves at most `buckets` rows per task;
  *  - the per-bucket weight table is bounded by `buckets` and rides to
  *    the scoring join as a BROADCAST — the corpus never reshuffles on
  *    anything but doc_id for the final per-doc sum;
  *  - per-term weights are ×1e6 integer-quantized (the established
  *    cross-engine convention) so the per-doc reduction is an EXACT
  *    BIGINT sum — order-insensitive, hence deterministic under any
  *    parallelism. Laplace (+1) smoothing keeps every bucket finite.
  *
  * Returns (idCol, n_tokens, dsir_q): token count and the quantized
  * log-likelihood-ratio score (sum over token occurrences). */
object Dsir {

  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 4096, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = docs.sparkSession
    val tok = docs
      .select(col(idCol), isTarget.as("tgt"), tokens(col(textCol)).as("tok"))
      .select(col(idCol), col("tgt"), explode(col("tok")).as("t"))
      .select(col(idCol), col("tgt"),
        pmod(hash32(col("t")), lit(buckets.toLong)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tok.filter(col("tgt")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("tr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("tt")))
    // identical IEEE tree in the DuckDB oracle: two smoothed-probability
    // divisions, one ratio division, ln, ×1e6, round — then exact longs
    val w = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(
          ((col("ct") + lit(1L)).cast("double") /
            (col("tt") + lit(buckets.toLong)).cast("double")) /
          ((col("cr") + lit(1L)).cast("double") /
            (col("tr") + lit(buckets.toLong)).cast("double"))) * lit(1e6))
          .cast("long").as("wq"))
    tok.join(broadcast(w), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wq")).as("dsir_q"))
  }
}
