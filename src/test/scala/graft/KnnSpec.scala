package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Edge cases from FIXTURES.md §B, mirroring reference behavior:
  * k=0 → empty (`src/index/shard_manager.cc:31-36`), k>N → all rows
  * ascending (`src/index/vector_shard.cc:84-86`), duplicate ids kept
  * (`src/index/shard_manager.cc:129-145` dedups nothing), deterministic
  * (distance, id) tie-break (stricter than the reference — SURVEY.md §5.1).
  */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  private val fixture = vecDf(Seq(
    1L -> Seq(0f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f),
    4L -> Seq(1f, 1f), 5L -> Seq(2f, 2f)))

  test("k=0 returns empty (reference parity)") {
    assert(Knn.topK(fixture, Seq(0f, 0f), 0).count() === 0)
  }

  test("k > N returns all rows ascending") {
    val got = Knn.topK(fixture, Seq(0f, 0f), 100).collect()
    assert(got.length === 5)
    val dists = got.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted))
    assert(got.head.getLong(0) === 1L)
    assert(got.last.getLong(0) === 5L)
  }

  test("exact distances are squared L2 (no sqrt), FAISS IndexFlatL2 parity") {
    val got = Knn.topK(fixture, Seq(0f, 0f), 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(4L) === 2.0) // (1,1) vs (0,0) → 1+1, NOT sqrt(2)
    assert(got(5L) === 8.0)
  }

  test("ties break deterministically by id ascending") {
    // 2 and 3 are both at distance 1 from origin
    val got = Knn.topK(fixture, Seq(0f, 0f), 3).collect().map(_.getLong(0))
    assert(got.sameElements(Array(1L, 2L, 3L)))
  }

  test("duplicate ids across shards are NOT deduped (reference quirk)") {
    val dup = vecDf(Seq(1L -> Seq(0f, 0f), 1L -> Seq(0.1f, 0f), 2L -> Seq(5f, 5f)))
    val got = Knn.topK(dup, Seq(0f, 0f), 3).collect()
    assert(got.count(_.getLong(0) == 1L) === 2)
  }

  test("dedupById collapses duplicate ids to the best hit; core op keeps the quirk") {
    // id 1 lives in two "shards" at different distances
    val dup = vecDf(Seq(1L -> Seq(0f, 0f), 1L -> Seq(0.1f, 0f),
      2L -> Seq(1f, 0f), 3L -> Seq(5f, 5f)))
    val raw = Knn.topK(dup, Seq(0f, 0f), 4)
    assert(raw.collect().count(_.getLong(0) == 1L) === 2) // quirk preserved
    val deduped = Knn.dedupById(raw, queryIdCol = None).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(deduped.size === 3)       // one row per id
    assert(deduped(1L) === 0.0)      // the BEST duplicate survives
  }

  test("dedupById on batch output: one row per (query, id), dense re-rank") {
    val dup = vecDf(Seq(1L -> Seq(0f, 0f), 1L -> Seq(0.1f, 0f),
      2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f)))
    val q = vecDf(Seq(10L -> Seq(0f, 0f), 11L -> Seq(1f, 0f)))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = Knn.dedupById(Knn.batchTopK(dup, q, 4)).collect()
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val ids = rows.map(_.getLong(1))
      assert(ids.distinct.length === ids.length) // no duplicate ids
      // re-rank is dense 1..n in distance order
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to rows.length).toSeq)
      val d = byRank.map(_.getDouble(2))
      assert(d.sameElements(d.sorted))
    }
    assert(byQuery(10L).length === 3)
    // query 10 keeps id 1's closer copy (distance 0)
    assert(byQuery(10L).minBy(_.getLong(3)).getLong(1) === 1L)
    assert(byQuery(10L).minBy(_.getLong(3)).getDouble(2) === 0.0)
  }

  test("batchTopK returns k rows per query with rank 1..k") {
    val q = vecDf(Seq(10L -> Seq(0f, 0f), 11L -> Seq(2f, 2f)))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val got = Knn.batchTopK(fixture, q, 2).collect()
    assert(got.length === 4)
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery(10L).map(_.getLong(1)).toSet === Set(1L, 2L)
      || byQuery(10L).map(_.getLong(1)).toSet === Set(1L, 3L))
    // nearest to (2,2) is vec 5 exactly, then 4
    assert(byQuery(11L).sortBy(_.getLong(3)).map(_.getLong(1)).toSeq === Seq(5L, 4L))
  }

  test("groupedTopK: tenant isolation ≡ per-tenant batchTopK, never leaks") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 120L).map(i => (i, Seq.fill(4)(rnd.nextFloat() - 0.5f)))
    val df = vecDf(vecs).withColumn("tenant", pmod($"vec_id", lit(3L)))
    val q = df.filter($"vec_id" < 6)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"), $"tenant")
    val got = Knn.groupedTopK(df, q, k = 4, groupCol = "tenant")
      .orderBy($"query_id", $"rank").collect().toSeq
    // no query ever sees a foreign tenant's vector
    got.foreach(r => assert(r.getLong(1) % 3 === r.getLong(0) % 3))
    // equals running the plain batch within each tenant's slice
    val expected = (0L until 3L).flatMap { t =>
      Knn.batchTopK(df.filter($"tenant" === t).drop("tenant"),
          q.filter($"tenant" === t).drop("tenant"), 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    }.sortBy(r => (r._1, r._4))
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))) === expected)
  }

  test("batchTopK (BottomK aggregate) ≡ batchTopKWindow spec on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = vecDf(vecs)
    val q = vecDf((1000L until 1005L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    for (k <- Seq(1, 7, 250)) {
      val agg = Knn.batchTopK(df, q, k)
        .orderBy($"query_id", $"rank").collect().toSeq
      val win = Knn.batchTopKWindow(df, q, k)
        .orderBy($"query_id", $"rank").collect().toSeq
      assert(agg === win, s"k=$k")
    }
  }

  test("randomized differential: dedupById ≡ naive min-per-id + dense re-rank") {
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { _ =>
      // duplicate-rich corpus: ~half the ids appear 2-3 times with
      // DIFFERENT embeddings (re-sharded upserts drifted apart)
      val vecs = (0L until 60L).flatMap { i =>
        val copies = 1 + rnd.nextInt(if (i % 2 == 0) 3 else 1)
        (0 until copies).map(_ => (i, Seq.fill(4)(rnd.nextFloat() - 0.5f)))
      }
      val df = vecDf(vecs)
      val q = vecDf((100L until 103L).map(i => (i, Seq.fill(4)(rnd.nextFloat() - 0.5f))))
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val k = 15
      val raw = Knn.batchTopK(df, q, k)
      val got = Knn.dedupById(raw).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      // naive mirror over the RAW top-k rows: min distance per (query,
      // id), then dense rank by (distance, id) within each query
      val rawRows = raw.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expected = rawRows.groupBy(x => (x._1, x._2)).map { case ((qid, id), rs) =>
        (qid, id, rs.map(_._3).min)
      }.toSeq.groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).zipWithIndex.map {
          case ((qid, id, d), i) => (qid, id, d, (i + 1).toLong)
        }
      }.toSet
      assert(got === expected)
      // non-vacuous: the raw output really contained duplicate ids
      assert(rawRows.groupBy(x => (x._1, x._2)).exists(_._2.length > 1))
    }
  }

  test("batchTopKChunked ≡ batchTopK at a forced tiny chunk size") {
    val rnd = new scala.util.Random(11)
    val df = vecDf((0L until 100L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))))
    val q = vecDf((1000L until 1011L).map(i => (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    for (maxChunk <- Seq(1, 3, 100)) { // 11 chunks, 4 chunks, 1 (degenerate)
      val chunked = Knn.batchTopKChunked(df, q, 5, maxChunk = maxChunk)
        .orderBy($"query_id", $"rank").collect().toSeq
      val direct = Knn.batchTopK(df, q, 5)
        .orderBy($"query_id", $"rank").collect().toSeq
      assert(chunked === direct, s"maxChunk=$maxChunk")
    }
  }

  test("batchTopKChunked plan: every chunk joins broadcast — vectors never shuffle") {
    val rnd = new scala.util.Random(13)
    val df = vecDf((0L until 50L).map(i => (i, Seq.fill(4)(rnd.nextFloat()))))
    val q = vecDf((100L until 110L).map(i => (i, Seq.fill(4)(rnd.nextFloat()))))
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val plan = Knn.batchTopKChunked(df, q, 3, maxChunk = 3)
      .queryExecution.executedPlan.toString
    // per-chunk cross joins must all be query-side broadcast; a lost
    // hint beyond the threshold is exactly the degradation this
    // operator exists to prevent
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length === 4, plan)
    // the only hash exchanges are the post-partial-aggregation merges
    // over ≤ queries×k rows, never the vector scan side
    assert(plan.contains("partial_bottomk") || plan.contains("bottomk"), plan)
  }

  test("batchTopK plan has partial aggregation, no single-partition window exchange") {
    val q = vecDf(Seq(10L -> Seq(0f, 0f))).select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val plan = Knn.batchTopK(fixture, q, 2).queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottomk") || plan.contains("bottomk"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("topKWhere filters candidates before scan") {
    val got = Knn.topKWhere(fixture, $"vec_id" > 3, Seq(0f, 0f), 10).collect()
    assert(got.map(_.getLong(0)).toSet === Set(4L, 5L))
  }

  test("single-query plan is TakeOrderedAndProject (partial top-k, no full sort)") {
    val e = Tables.embeddings(spark, sf)
    val plan = Knn.topK(e, Seq.fill(64)(0.1f), 10).queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"))
  }

  test("dimension generality: 768-dim vectors (reference sample config) work end-to-end") {
    // config/node1.textproto:13 uses dim 768; testdata is 64 — prove the
    // operators are dimension-agnostic.
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(768)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val query = vecs(7)._2
    val hits = Knn.topK(df, query, 3).collect()
    assert(hits.head.getLong(0) === 7L) // self is nearest at distance 0
    assert(hits.head.getDouble(1) === 0.0)
    assert(hits.length === 3)
    val centroids = graft.operators.Ann.seedCentroids(df, 4)
    val assigned = graft.operators.Ann.assign(df, centroids)
    assert(assigned.count() === 50)
  }

  test("cosine of identical vectors is 1") {
    val df = vecDf(Seq(1L -> Seq(1f, 2f, 3f)))
      .select(cosine($"embedding", $"embedding").as("c"))
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }
}
