package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** BM25 ranked retrieval over a document corpus (Robertson/Spärck
  * Jones probabilistic relevance; the scoring function every production
  * text index — including Lucene — ships). The reference system ranks
  * only by vector distance; BM25 is the lexical half a training-data
  * pipeline needs for corpus search, quality filtering by query
  * relevance, and hybrid (lexical + embedding) retrieval.
  *
  * score(D, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (k1 = 1.2, b = 0.75)
  *
  * Spark-first scale shape:
  *  - the token explode is filtered to the QUERY'S terms before any
  *    aggregation, so the only shuffle keys are (doc_id, term) for docs
  *    that contain a query term — never the full posting list;
  *  - document length rides along from the same projection (no second
  *    pass / no join back to the corpus);
  *  - df and the corpus stats (N, Σdl) are one-row/|Q|-row aggregates,
  *    broadcast to the scoring join;
  *  - per-term scores are quantized to ×1e6 integers BEFORE the
  *    per-document sum (the [[Pq]] move), so the final score is exact
  *    integer arithmetic — summation-order-free across engines and
  *    partitions. Inputs to the float math (tf, df, N, dl, Σdl) are all
  *    integers, so each per-term double is a deterministic function of
  *    them; the only library call is ln.
  */
object Bm25 {

  /** (doc_id, score) for every document containing ≥1 query term;
    * `score` is the ×1e6-scaled integer BM25 score (divide by 1e6 for
    * the conventional value). */
  def score(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val spark = docs.sparkSession
    // one projection computes tokens once: dl rides along with the
    // explode, and the term filter lands before the aggregation
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = base.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(tokens(col(textCol))).cast("long")).as("sumdl"))
    scoreFromPostings(tf, stats, k1, b, idCol)
  }

  /** BM25 from prepared postings — shared by the inline path above and
    * the persisted-index path ([[graft.sources.IndexStore]]): `tf` is
    * (idCol, term, dl, tf) ALREADY restricted to the query's terms
    * (df per term is derived from it — a pruned posting read carries
    * its own document frequencies), `stats` the 1-row (n, sumdl). */
  def scoreFromPostings(tf: DataFrame, stats: DataFrame,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // written with the same association order as the oracle SQL: every
    // double op sees identical operands in identical order (r7 protocol)
    val idf = log(lit(1.0) + ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val rel = col("dl") / (col("sumdl") / col("n"))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * rel))
    val termScore = round(idf * tfn * lit(1e6)).cast("long")
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), termScore.as("ts"))
      .groupBy(col(idCol))
      .agg(sum(col("ts")).as("score"))
  }

  /** Top-k BM25 retrieval: descending score, doc_id tie-break.
    * `orderBy().limit()` plans TakeOrderedAndProject. */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    score(docs, queryTerms, k1, b, idCol, textCol)
      .orderBy(col("score").desc, col(idCol)).limit(k)
}
