package graft

import graft.operators.NgramLm

/** Bigram LM NLL: predictable (template) docs score lower mean NLL than
  * rare-bigram docs; exact quantized sums are partitioning-invariant;
  * single-token docs carry no bigram evidence and are skipped. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b a b a b"),    // one dominant bigram pattern
    (2L, "a b a b a b a c"),    // mostly the pattern
    (3L, "x y z w q r s t"),    // every bigram unique
    (4L, "solo")                // no bigrams
  ).toDF("doc_id", "text")

  test("template docs score lower mean NLL than unique-bigram docs") {
    val m = NgramLm.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(1L) < m(2L) && m(2L) < m(3L))
    assert(!m.contains(4L))
    spark.catalog.clearCache()
  }

  test("scores invariant to input partitioning") {
    val a = NgramLm.bigramNll(docs.repartition(1)).orderBy($"doc_id").collect().toSeq
    spark.catalog.clearCache()
    val b = NgramLm.bigramNll(docs.repartition(5)).orderBy($"doc_id").collect().toSeq
    spark.catalog.clearCache()
    assert(a === b)
  }
}
