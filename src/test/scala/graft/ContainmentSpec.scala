package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Containment dedup: directional doc-in-doc semantics on crafted
  * corpora, and a driver-side differential over the real table. */
@HeavyTest
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a strict token-subset doc scores containment 1.0 even though jaccard < 1") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota"  // 9 of 10
    val docs = Seq((1L, a), (2L, b), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)))
  }

  test("set semantics: token multiplicity and order are ignored") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "five five four three two one one one"))  // same SET
    .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)))
  }

  test("differential: engine pairs equal a driver-side replay on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // driver replay: hashed distinct-token sets + the same banding
    val hs = docs.select($"doc_id",
        transform(array_distinct(
          graft.functions.TextFunctions.tokens($"text")),
          s => graft.functions.TextFunctions.hash32(s)).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).distinct.toSet)
      .toMap
    val sigs = docs.select($"doc_id",
        graft.functions.TextFunctions.minhashFamilies(
          transform(array_distinct(
            graft.functions.TextFunctions.tokens($"text")),
            s => graft.functions.TextFunctions.hash32(s)), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the shipped containment-calibrated banding: one band per hash
    def bands(sig: Seq[Long]): Seq[String] =
      (0 until 12).map(b => sig(b).toString)
    val ids = hs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      if bands(sigs(i)).zip(bands(sigs(j))).exists { case (x, y) => x == y }
      inter = (hs(i) & hs(j)).size.toDouble
      mn = math.min(hs(i).size, hs(j).size).toDouble
      if inter / mn >= 0.9
    } yield (i, j, BigDecimal(inter / mn)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got === expected)
  }

  test("exact prefix-filtered form: every true pair, no banding loss — ground-truth differential") {
    // the shipped dedup_containment path (r15): recall 1.0 by the
    // prefix-filter lemma, values the brute-force truth — on the real
    // corpus AND on a crafted size-asymmetric pair banding can miss
    val docs = Tables.documents(spark, sf)
    val got = Dedup.containmentPairsExact(docs)
      .as[(Long, Long, Double)].collect().toSet
    val hs = docs.select($"doc_id",
        transform(array_distinct(
          graft.functions.TextFunctions.tokens($"text")),
          s => graft.functions.TextFunctions.hash32(s)).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).distinct.toSet)
      .toMap
    val ids = hs.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      inter = (hs(i) & hs(j)).size.toDouble
      mn = math.min(hs(i).size, hs(j).size).toDouble
      if inter / mn >= 0.9
    } yield (i, j, BigDecimal(inter / mn)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got === truth,
      s"exact containment drifted from brute force: missing=${
        (truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    // the banded forms' documented leak is real on this corpus — the
    // exact form exists because of it
    val banded = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(banded.subsetOf(truth), "banded pairs must verify exactly")
    info(s"truth=${truth.size} banded=${banded.size} " +
      s"(banding loses ${truth.size - banded.size} true pairs here)")
  }

  test("all three exact regimes produce the identical pair set") {
    // the regime gate picks an EXECUTION STRATEGY, never a result:
    // (1) small vocab + few reps → bitmask all-pairs (the default on
    //     this corpus), (2) small vocab + many reps → prefix candidates
    //     with bitmask verify, (3) large vocab → prefix candidates with
    //     array-intersection verify. Force each via its conf and pin
    //     value identity on the real corpus.
    val docs = Tables.documents(spark, sf)
    def run(): Set[(Long, Long, Double)] =
      Dedup.containmentPairsExact(docs).as[(Long, Long, Double)]
        .collect().toSet
    val allPairs = run()
    // try/finally: a throw inside a forced run must not leak the regime
    // confs into every later test of the shared session (ADVICE r15)
    val (maskVerify, arrayVerify) =
      try {
        spark.conf.set("graft.containAllPairsMax", "0") // force mask-verify
        val mv = run()
        spark.conf.set("graft.containMaskBits", "0") // force array verify
        (mv, run())
      } finally {
        spark.conf.unset("graft.containAllPairsMax")
        spark.conf.unset("graft.containMaskBits")
      }
    assert(allPairs === maskVerify,
      "bitmask all-pairs vs prefix+mask-verify regimes disagree")
    assert(allPairs === arrayVerify,
      "bitmask vs prefix+array-verify regimes disagree")
    info(s"pairs=${allPairs.size} identical across all three regimes")
  }
}
