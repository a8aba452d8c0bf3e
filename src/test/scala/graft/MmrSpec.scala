package graft

import graft.operators.Mmr
import graft.sources.Tables

/** MMR re-rank: diversification actually spreads clustered candidates,
  * λ=1 degenerates to relevance order, and selection is reproducible. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query on the x-axis; a twin pair at +9.9°/+10° and a lone point at
  // −10° (same relevance as the +10° one, dissimilar to the twins);
  // a far point the r=4 shortlist excludes
  private def clustered = Seq(
    (0L, Seq(1.0f, 0.0f)),               // query row
    (1L, Seq(0.98481f, 0.17365f)),       // +10°  (twin of 2)
    (2L, Seq(0.98511f, 0.17193f)),       // +9.9° (slightly more relevant)
    (3L, Seq(0.98481f, -0.17365f)),      // −10°  (diverse side)
    (4L, Seq(0.0f, 1.0f))                // far — outside the r=4 shortlist
  ).toDF("vec_id", "embedding")
    .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  private val q = Array(1.0f, 0.0f)

  test("diversity: after the nearest pick, MMR jumps sides before taking the twin") {
    // after (query row, +9.9°): the +10° twin's penalty is max-sim ≈ 1
    // (cos 0.1°) while −10°'s is cos 10° — at λ=0.7 the twin scores
    // 0.7·cos10° − 0.3·1 < 0.4·cos10°, so the −10° point wins rank 3
    val got = Mmr.rerank(spark, clustered, q, r = 4, k = 3, lambda = 0.7)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(got === Seq(0L, 2L, 3L))
    // plain top-3 (λ=1) keeps the twin: +10° ties −10° on relevance
    // (identical |y|) and the id tiebreak resolves to the twin
    val plain = Mmr.rerank(spark, clustered, q, r = 4, k = 3, lambda = 1.0)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(plain === Seq(0L, 2L, 1L))
  }

  test("lambda=1 degenerates to pure relevance order") {
    val got = Mmr.rerank(spark, clustered, q, r = 6, k = 4, lambda = 1.0)
      .orderBy($"rank")
      .select($"vec_id", $"score_q").as[(Long, Long)].collect().toSeq
    // relevance order: query row, +9.9°, then the cos10° tie broken by id
    assert(got.map(_._1) === Seq(0L, 2L, 1L, 3L))
    // ranks follow non-increasing quantized relevance
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
  }

  test("reproducible on the real table; scores are the quantized marginals") {
    val e = Tables.embeddings(spark, sf)
    val qv = e.filter($"vec_id" === 0L).select($"embedding")
      .head.getSeq[Float](0).toArray
    val a = Mmr.rerank(spark, e, qv, r = 20, k = 5).collect().toSeq
    val b = Mmr.rerank(spark, e, qv, r = 20, k = 5).collect().toSeq
    assert(a === b)
    assert(a.size === 5)
    // rank 1 is the query row itself: cosine 1 → λ·1e6 exactly
    assert(a.head.getLong(2) === 700000L)
  }
}
