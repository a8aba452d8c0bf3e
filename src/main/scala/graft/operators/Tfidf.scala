package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions.tokens

/** TF-IDF cosine retrieval — the vector-space-model complement to
  * [[Bm25]] (Salton's classic; sklearn's smoothed idf). BM25 scores only
  * query-term postings; true cosine ALSO needs every document's norm
  * over its full term vector, i.e. a corpus-wide inverted-index build —
  * this operator is that pipeline.
  *
  * score(D, Q) = (w_D · w_Q) / (‖w_D‖ · ‖w_Q‖),
  * w(t, D) = tf(t, D) · idf(t),  idf(t) = ln((1+N)/(1+df(t))) + 1
  * (query tf = 1 per term).
  *
  * Spark-first scale shape:
  *  - ONE posting-list aggregation — `(doc, term) → tf` — is the only
  *    corpus-sized shuffle (map-side partial count). df derives from it
  *    (second small agg on term), and the per-doc norm rides the SAME
  *    persisted frame — the corpus text is read exactly once.
  *  - the df join keys on `term`, the same key the posting list already
  *    groups on; AQE broadcasts it at small vocabularies and
  *    shuffle-joins at web-scale ones.
  *  - query-term scoring is a filter of the persisted weighted frame
  *    (no second explode), re-aggregated on the doc id.
  *
  * Cross-engine float determinism (the r7 protocol): every per-term
  * double — w², w·idf_q, idf_q² — is a deterministic function of
  * INTEGER statistics (tf, df, N) and is ×1e6-quantized to a BIGINT
  * BEFORE any per-document sum, so norms and dots are exact integer
  * arithmetic with no summation order. The final score divides doubles
  * reconstructed from those exact integers in one fixed expression
  * shape, mirrored token-for-token in the DuckDB oracle.
  */
object Tfidf {

  /** (doc_id, score) for every document containing ≥1 query term;
    * `score` is raw cosine ∈ (0, 1] as a double (deterministic — see
    * object scaladoc). Callers own cache cleanup (Dedup convention). */
  def score(docs: DataFrame, queryTerms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
    val idf = log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) + lit(1.0)
    val w = col("tf") * idf
    // d2 feeds the norm, dq the query dot — quantized in ONE projection
    // over the single corpus pass
    val weighted = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        round((w * w) * lit(1e6)).cast("long").as("d2"),
        round((w * idf) * lit(1e6)).cast("long").as("dq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val norms = weighted.groupBy(col(idCol)).agg(sum(col("d2")).as("normsq"))
    val dots = weighted
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol)).agg(sum(col("dq")).as("dotq"))
    // query norm: idf² of each query term (tf = 1), absent terms get
    // df = 0; a |Q|-row frame folded to one integer
    val qn = queryTerms.toDF("term")
      .join(dfreq, Seq("term"), "left")
      .na.fill(0L, Seq("df"))
      .crossJoin(broadcast(stats))
      .select(round((idf * idf) * lit(1e6)).cast("long").as("q2"))
      .agg(sum(col("q2")).as("qnormsq"))
    dots
      .join(norms, idCol)
      .crossJoin(broadcast(qn))
      .select(col(idCol),
        ((col("dotq") / lit(1e6)) /
          (sqrt(col("normsq") / lit(1e6)) * sqrt(col("qnormsq") / lit(1e6))))
          .as("score"))
  }

  /** Top-k TF-IDF cosine retrieval: descending raw score, doc_id
    * tie-break (`TakeOrderedAndProject`). */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    score(docs, queryTerms, idCol, textCol)
      .orderBy(col("score").desc, col(idCol)).limit(k)
}
