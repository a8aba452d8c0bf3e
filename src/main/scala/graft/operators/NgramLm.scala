package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-trained bigram language model — the classic quality signal a
  * KenLM-style filter computes (CCNet, arXiv:1911.00359 §3.3 scores
  * documents by LM perplexity; the n-gram model here is trained ON the
  * corpus itself, so no external artifact is needed). Each document is
  * scored by the total and mean negative log-likelihood of its bigrams
  * under Laplace-smoothed conditionals p(b|a) = (c(a,b)+1) / (c(a,·)+V).
  * Repetitive template docs score LOW mean NLL (predictable), garbage
  * and rare-token docs score HIGH — the two-sided filter band.
  *
  * Scale shape: bigram extraction is the linear wordShingles pass;
  * count tables shuffle on the bigram/context hash keys only (partial
  * aggregation, no text through exchanges beyond the gram strings);
  * scoring joins are equi-joins on the same keys (Catalyst broadcasts
  * them when small; at web scale they stay shuffled equi-joins — never
  * quadratic). Per-bigram NLL terms are ×1e6-quantized so per-doc sums
  * are exact BIGINTs — deterministic under any parallelism.
  *
  * Returns (idCol, n_bigrams, nll_q, mean_nll_q) for docs with ≥ 1
  * bigram (single-token docs have no bigram evidence and are skipped —
  * callers wanting them keep a left join on the id). */
object NgramLm {

  def bigramNll(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // persisted BEFORE the generator: a bare Project→Generate collapses
    // and explode re-evaluates the O(L) shingle array per OUTPUT row —
    // O(L²) per doc (measured 7.4 s vs 0.5 s on the sf0.1 bigram leg).
    // The cache then feeds all three downstream passes (c2, c1, score).
    val shingled = docs
      .select(col(idCol), tokens(col(textCol)).as("tok"))
      .select(col(idCol), wordShingles(col("tok"), 2).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = shingled
      .select(col(idCol), explode(col("sh")).as("g"))
      .withColumn("a", substring_index(col("g"), " ", 1))
    val c2 = grams.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = grams.groupBy(col("a")).agg(count(lit(1)).as("c1"))
    val v = docs
      .select(explode(tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("vsz"))
    // per-bigram quantized NLL: one division, ln, negate, ×1e6, round —
    // the identical IEEE tree in the oracle
    val wq = c2
      .withColumn("a", substring_index(col("g"), " ", 1))
      .join(c1, Seq("a"))
      .crossJoin(broadcast(v))
      .select(col("g"),
        round(-log((col("c2") + lit(1L)).cast("double") /
          (col("c1") + col("vsz")).cast("double")) * lit(1e6))
          .cast("long").as("wq"))
    grams.join(wq, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wq")).as("nll_q"))
      .select(col(idCol), col("n_bigrams"), col("nll_q"),
        round(col("nll_q").cast("double") / col("n_bigrams").cast("double"))
          .cast("long").as("mean_nll_q"))
  }
}
