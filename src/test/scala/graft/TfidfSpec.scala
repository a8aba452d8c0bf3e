package graft

import org.apache.spark.sql.functions._
import graft.operators.Tfidf
import graft.sources.Tables

/** TF-IDF cosine: engine scores equal a naive driver-side replay of the
  * quantized pipeline, a doc that IS the query scores cosine ≈ 1, and
  * docs without query terms are absent. */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def q6(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  test("scores equal a naive driver-side replay of the quantized cosine") {
    val corpus = Seq(
      (1L, "spark merge"),                              // exactly the query terms
      (2L, "spark query engine runs the query fast"),
      (3L, "merge join merge sort"),
      (4L, "nothing relevant here at all"))
    val terms = Seq("spark", "merge")
    val got = Tfidf.score(corpus.toDF("doc_id", "text"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val docs = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toLong
    def df(t: String) = docs.count(_._2.contains(t)).toLong
    def idf(t: String) = math.log((1.0 + n) / (1.0 + df(t))) + 1.0
    val qnormsq = terms.map(t => q6(idf(t) * idf(t))).sum
    val expected = docs.flatMap { case (id, toks) =>
      val byTerm = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val normsq = byTerm.toSeq.map { case (t, tf) =>
        q6((tf * idf(t)) * (tf * idf(t)))
      }.sum
      val dotq = terms.flatMap { t =>
        byTerm.get(t).map(tf => q6((tf * idf(t)) * idf(t)))
      }.sum
      if (dotq == 0L) None
      else Some(id -> (dotq / 1e6) /
        (math.sqrt(normsq / 1e6) * math.sqrt(qnormsq / 1e6)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, s) => assert(s === expected(id)) }
    // doc 1 IS the query's term set with tf 1 each → cosine ≈ 1, and top
    assert(math.abs(got(1L) - 1.0) < 1e-6)
    assert(!got.contains(4L))
    spark.catalog.clearCache()
  }

  test("topK orders by score desc with doc_id tie-break; plan is top-k") {
    val docs = Tables.documents(spark, sf)
    val top = Tfidf.topK(docs, Seq("spark", "merge", "customer"), k = 10)
    val rows = top.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 10)
    assert(rows.sliding(2).forall { case Array((i1, s1), (i2, s2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2) })
    assert(rows.forall { case (_, s) => s > 0.0 && s <= 1.0 + 1e-9 })
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    spark.catalog.clearCache()
  }
}
