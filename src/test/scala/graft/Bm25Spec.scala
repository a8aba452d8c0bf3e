package graft

import org.apache.spark.sql.functions._
import graft.operators.Bm25
import graft.sources.Tables

/** BM25: engine scores equal a naive driver-side replay, ranking prefers
  * term-dense short docs, and the plan broadcasts the statistics sides. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("scores equal a naive driver-side BM25 replay exactly") {
    val corpus = Seq(
      (1L, "spark query engine runs the query fast"),
      (2L, "slow table scan"),
      (3L, "spark spark spark"),
      (4L, "merge join merge sort"),
      (5L, "nothing relevant here at all")).toDF("doc_id", "text")
    val terms = Seq("spark", "merge")
    val got = Bm25.score(corpus, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // naive replay, same tokenization (lowercase, whitespace)
    val docs = Seq(
      1L -> "spark query engine runs the query fast",
      2L -> "slow table scan",
      3L -> "spark spark spark",
      4L -> "merge join merge sort",
      5L -> "nothing relevant here at all")
      .map { case (id, t) => id -> t.toLowerCase.trim.split("\\s+").toSeq }
    val n = docs.size.toLong
    val sumdl = docs.map(_._2.size.toLong).sum
    val expected = docs.map { case (id, toks) =>
      val dl = toks.size.toLong
      val ts = terms.flatMap { term =>
        val tf = toks.count(_ == term).toLong
        if (tf == 0) None else {
          val df = docs.count(_._2.contains(term)).toLong
          val idf = math.log(1.0 + ((n - df + 0.5) / (df + 0.5)))
          val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (sumdl.toDouble / n))))
          Some(BigDecimal(idf * tfn * 1e6)
            .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
        }
      }
      id -> ts.sum
    }.filter(_._2 != 0L).toMap
    assert(got === expected)
  }

  test("docs without any query term are absent; unknown terms yield empty") {
    val docs = Tables.documents(spark, sf)
    assert(Bm25.score(docs, Seq("zzz_not_a_token")).count() === 0L)
    val scored = Bm25.topK(docs, Seq("spark"), k = 5).collect()
    assert(scored.nonEmpty && scored.forall(_.getLong(1) > 0L))
  }

  test("ranking: repeating the term beats mentioning it once, short beats long") {
    val corpus = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark and a very long tail of completely unrelated words " +
        "padding the document length out considerably more and more"),
      (3L, "no match")).toDF("doc_id", "text")
    val top = Bm25.topK(corpus, Seq("spark"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(1L, 2L))
  }

  test("plan: df/stats sides broadcast; no sort-merge join anywhere") {
    val plan = Bm25.score(Tables.documents(spark, sf), Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("PRF expansion surfaces a doc that shares no query term with the query") {
    // "spark" docs consistently co-occur with "shuffle"; doc 5 mentions
    // ONLY "shuffle". Plain BM25 for "spark" cannot retrieve doc 5;
    // after feedback expansion picks up "shuffle", PRF must.
    // "shuffle" must dominate tfsum·idf over the one-off singletons
    // (tuning, spill, ...) whose idf is higher — hence twice per doc
    val corpus = Seq(
      (1L, "spark shuffle shuffle tuning"),
      (2L, "spark shuffle shuffle partitions"),
      (3L, "spark shuffle shuffle spill"),
      (4L, "cooking pasta at home tonight"),
      (5L, "shuffle service deep dive")).toDF("doc_id", "text")
    val q = Seq("spark")
    val plain = Bm25.topK(corpus, q, k = 5).collect().map(_.getLong(0)).toSet
    assert(!plain.contains(5L))
    // replicate the bm25_prf recipe at small scale: seed top-3, top-1
    // expansion term by tfsum·idf
    val seed = Bm25.topK(corpus, q, k = 3).select($"doc_id")
    val fb = corpus.join(broadcast(seed), "doc_id")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("term"))
      .filter(!$"term".isin(q: _*))
      .groupBy($"term").agg(count(lit(1)).as("tfsum"))
    val cdf = corpus
      .select(explode(graft.functions.TextFunctions.distinctTokens($"text")).as("term"))
      .join(broadcast(fb.select($"term")), "term")
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = corpus.agg(count(lit(1)).as("n"))
    val expansion = fb.join(cdf, "term").crossJoin(broadcast(stats))
      .select($"term", round($"tfsum" *
        log(lit(1.0) + (($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))) *
        lit(1e6)).cast("long").as("w"))
      .orderBy($"w".desc, $"term").limit(1)
      .select($"term").as[String].collect().toSeq
    assert(expansion === Seq("shuffle"))
    val prf = Bm25.topK(corpus, q ++ expansion, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(prf.contains(5L))
  }
}
