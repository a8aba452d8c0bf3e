package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Decontamination: n-gram extraction matches a driver replay (incl.
  * short-doc and repeated-phrase edges), overlap/keep semantics are
  * exact on a crafted corpus, and the training corpus never shuffles
  * (broadcast contamination join). */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("wordNgrams: distinct per doc, normalization applied, short docs emit nothing") {
    val docs = df(
      1L -> "the cat sat on the cat sat",  // "the cat sat" twice -> once
      2L -> "  The   CAT  sat ",           // normalizes to "the cat sat"
      3L -> "too short")                   // 2 tokens < n=3 -> nothing
    val got = Decontaminate.wordNgrams(docs, n = 3).as[(Long, String)]
      .collect().toSet
    // doc 1 tokens: [the cat sat on the cat sat] — positions 1 and 5
    // both yield "the cat sat"; distinct keeps one
    assert(got === Set(
      1L -> "the cat sat", 1L -> "cat sat on", 1L -> "sat on the",
      1L -> "on the cat",
      2L -> "the cat sat"))
  }

  test("overlap counts distinct shared grams; keep drops exactly the flagged docs") {
    val train = df(
      10L -> "alpha beta gamma delta",     // shares "alpha beta gamma" + "beta gamma delta"
      11L -> "epsilon zeta eta",           // clean
      12L -> "one two three alpha beta gamma")  // shares one gram
    val eval = df(100L -> "alpha beta gamma delta epsilon")
    val ov = Decontaminate.overlap(train, eval, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(ov === Map(10L -> 2L, 12L -> 1L))
    val kept = Decontaminate.keep(train, eval, n = 3)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept === Seq(11L))
  }

  test("plan: contamination check broadcasts the eval grams — the corpus never shuffles") {
    val train = df(10L -> "alpha beta gamma delta", 11L -> "epsilon zeta eta")
    val eval = df(100L -> "alpha beta gamma")
    val plan = Decontaminate.overlap(train, eval, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the STREAMED (training-corpus) side of the broadcast join — the
    // segment between the join node and its BroadcastExchange child in
    // the rendered tree — must be exchange-free; the eval side's tiny
    // distinct and the post-join per-doc count may each shuffle
    val streamed = plan.substring(
      plan.indexOf("BroadcastHashJoin"), plan.indexOf("BroadcastExchange"))
    assert(!streamed.contains("Exchange"), plan)
  }

  test("wordNgrams n=1 degenerates to distinct tokens") {
    val got = Decontaminate.wordNgrams(df(1L -> "a b a"), n = 1)
      .as[(Long, String)].collect().toSet
    assert(got === Set(1L -> "a", 1L -> "b"))
  }

  test("streaming keep: row-local filter matches the batch keep decision") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val eval = df(100L -> "alpha beta gamma delta epsilon")
    val docs = Seq(
      (10L, "alpha beta gamma unrelated tail"),   // contaminated
      (11L, "epsilon zeta eta totally clean"),    // clean
      (12L, "one two three"),                     // clean
      (13L, "delta epsilon zeta and more"))       // clean: no 3-gram of the EVAL text matches
    val hashes = Decontaminate.evalGramHashes(eval, n = 3)
    val mem = MemoryStream[(Long, String)]
    val out = Decontaminate.keepStream(
      mem.toDF().toDF("doc_id", "text"), hashes, n = 3)
    val q = out.writeStream.format("memory").queryName("dc_keep").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("dc_keep")
        .select($"doc_id").as[Long].collect().toSet
      val batch = Decontaminate.keep(docs.toDF("doc_id", "text"), eval, n = 3)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(!streamed.contains(10L) && streamed.contains(11L))
    } finally q.stop()
  }

  test("bloomAudit: no false negatives, n_bloom >= n_exact, exact column matches overlap") {
    val train = df(
      10L -> "alpha beta gamma delta",
      11L -> "epsilon zeta eta theta iota",
      12L -> "one two three alpha beta gamma",
      13L -> "clean words only here nothing shared")
    val eval = df(100L -> "alpha beta gamma delta epsilon")
    val audit = Decontaminate.bloomAudit(train, eval, n = 3, m = 4096, kh = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every truly contaminated doc must be flagged (Bloom never misses)
    val exact = Decontaminate.overlap(train, eval, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet.subsetOf(audit.keySet))
    // per-row invariants: n_grams >= n_bloom >= n_exact, and the exact
    // column agrees with the overlap operator (0 when unflagged there)
    audit.foreach { case (id, (grams, bloom, ex)) =>
      assert(grams >= bloom && bloom >= ex, s"doc $id: $grams/$bloom/$ex")
      assert(ex === exact.getOrElse(id, 0L), s"doc $id exact mismatch")
    }
  }

  test("bloomAudit plan: corpus side is scan -> project -> filter, no exchange, no sort-merge join") {
    val train = df(10L -> "alpha beta gamma delta", 11L -> "epsilon zeta eta")
    val eval = df(100L -> "alpha beta gamma")
    val plan = Decontaminate.bloomAudit(train, eval, n = 3, m = 4096, kh = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    // both single-row frames arrive as broadcast nested-loop joins; the
    // corpus segment ABOVE the first join must be exchange-free (the
    // eval side's distinct/collect_set aggregations may shuffle)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // shuffle nodes render as "Exchange hashpartitioning" (see
    // BucketingSpec) — "ShuffleExchange" never appears in plan strings,
    // so asserting on it would be vacuous
    val corpus = plan.substring(0, plan.indexOf("BroadcastExchange"))
    assert(!corpus.contains("Exchange hashpartitioning"), plan)
  }
}
