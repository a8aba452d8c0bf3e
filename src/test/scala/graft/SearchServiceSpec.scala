package graft

import graft.operators.SearchService

/** The reference's Search/Upsert/Delete lifecycle semantics end-to-end
  * (SURVEY.md §3.1/§3.2): cache hit flags, invalidate-on-mutation, k=0
  * gate, and read-your-writes after apply. */
class SearchServiceSpec extends SparkSpec {
  import spark.implicits._

  private def freshService = new SearchService(
    Seq((1L, "s0", Seq(0f, 0f)), (2L, "s0", Seq(1f, 0f)), (3L, "s1", Seq(2f, 2f)))
      .toDF("id", "shard_id", "embedding"))

  test("fromConfig wires cache settings from a node config (O-13)") {
    val cfg = graft.util.ConfigLoader.fromString(
      """cache {
        |  max_entries: 2
        |  default_ttl_seconds: 60
        |}""".stripMargin)
    val svc = SearchService.fromConfig(
      Seq((1L, "s0", Seq(0f, 0f)), (2L, "s0", Seq(1f, 0f)))
        .toDF("id", "shard_id", "embedding"), cfg)
    // LRU capacity 2: three distinct queries evict the oldest
    svc.search(Seq(0f, 0f), 1); svc.search(Seq(1f, 0f), 1); svc.search(Seq(2f, 0f), 1)
    assert(svc.cacheSize === 2)
    // default-on-absent parity: absent block → 1024 entries
    val dflt = graft.util.ConfigLoader.fromString("")
    assert(dflt.cache.maxEntries === 1024 && dflt.cache.ttlSeconds === 60)
  }

  test("second identical search is served from cache") {
    val svc = freshService
    val (h1, c1) = svc.search(Seq(0f, 0f), 2)
    val (h2, c2) = svc.search(Seq(0f, 0f), 2)
    assert(!c1 && c2)
    assert(h1 === h2)
    assert(h1.map(_.id) === Seq(1L, 2L))
  }

  test("k=0 returns empty and never caches") {
    val svc = freshService
    assert(svc.search(Seq(0f, 0f), 0)._1.isEmpty)
    assert(svc.cacheSize === 0)
  }

  test("different k is a different cache entry") {
    val svc = freshService
    svc.search(Seq(0f, 0f), 1)
    svc.search(Seq(0f, 0f), 2)
    assert(svc.cacheSize === 2)
  }

  test("STRONG read after mutation never sees a stale cache entry") {
    val svc = freshService
    svc.search(Seq(0f, 0f), 3)
    assert(svc.cacheSize === 1)
    // upsert a new nearest neighbor at the origin
    svc.upsert(Seq((9L, "s0", Seq(0f, 0.1f))).toDF("id", "shard_id", "embedding"))
    // snapshot-keyed cache: the old entry remains but is keyed to the
    // pre-mutation version — the STRONG read resolves to the new commit
    // index, misses, and recomputes (read-your-writes)
    val (hits, cached) = svc.search(Seq(0f, 0f), 2)
    assert(!cached)
    assert(hits.map(_.id) === Seq(1L, 9L))
  }

  test("EVENTUAL read after mutation may serve the warm previous version") {
    import graft.operators.MutationLog.{Eventual, Strong}
    val svc = freshService
    val (before, _) = svc.search(Seq(0f, 0f), 2) // materializes version 0
    assert(before.map(_.id) === Seq(1L, 2L))
    svc.upsert(Seq((9L, "s0", Seq(0f, 0.1f))).toDF("id", "shard_id", "embedding"))
    // version 1 exists but is not yet materialized by any read: an
    // EVENTUAL read resolves to the warm version 0 — and hits version
    // 0's own cache entry (stale by design, the level's contract)
    val (stale, fromCache) = svc.search(Seq(0f, 0f), 2, Eventual)
    assert(fromCache)
    assert(stale.map(_.id) === Seq(1L, 2L))
    // a STRONG read materializes version 1...
    val (fresh, _) = svc.search(Seq(0f, 0f), 2, Strong)
    assert(fresh.map(_.id) === Seq(1L, 9L))
    // ...after which EVENTUAL serves the freshest materialized version
    val (now, nowCached) = svc.search(Seq(0f, 0f), 2, Eventual)
    assert(nowCached)
    assert(now.map(_.id) === Seq(1L, 9L))
  }

  test("BOUNDED_STALENESS caps the lag; versions leaving retention flush their entries") {
    import graft.operators.MutationLog.BoundedStaleness
    val svc = freshService
    svc.search(Seq(0f, 0f), 2) // materialize version 0
    assert(svc.cacheSize === 1)
    // four mutations push commitIndex to 4; retention (maxSnapshots=4)
    // drops version 0 → its cache entries are flushed as unreachable
    (1 to 4).foreach { i =>
      svc.upsert(Seq((100L + i, "s0", Seq(5f + i, 5f))).toDF("id", "shard_id", "embedding"))
    }
    assert(svc.cacheSize === 0)
    // nothing recent is materialized: bounded read falls back to the
    // commit index (maxLag 1 admits only versions 3..4)
    val (hits, cached) = svc.search(Seq(0f, 0f), 2, BoundedStaleness(1))
    assert(!cached)
    assert(hits.map(_.id) === Seq(1L, 2L)) // 1,2 still nearest the origin
    assert(svc.currentCommitIndex === 4L)
  }

  test("batchSearch serves mixed-level batches on the leader, one scan per (snapshot, k)") {
    import graft.operators.MutationLog.{Eventual, Strong}
    import SearchService.BatchQuery
    val svc = freshService
    val got = svc.batchSearch(Seq(
      BatchQuery(Seq(0f, 0f), 2, Strong),
      BatchQuery(Seq(2f, 2f), 1, Eventual),
      BatchQuery(Seq(0f, 0f), 0, Strong))) // k=0 gate inside a batch
    val results = got.toOption.get
    assert(results.length === 3)
    assert(results(0)._1.map(_.id) === Seq(1L, 2L) && !results(0)._2)
    assert(results(1)._1.map(_.id) === Seq(3L) && !results(1)._2)
    assert(results(2)._1.isEmpty && !results(2)._2) // k=0: empty, uncached
    // batch members landed in the cache: re-batch is all cache hits
    val again = svc.batchSearch(Seq(
      BatchQuery(Seq(0f, 0f), 2, Strong),
      BatchQuery(Seq(2f, 2f), 1, Eventual))).toOption.get
    assert(again.forall(_._2))
    assert(again.map(_._1) === results.take(2).map(_._1))
    // and single-search sees the same entries (shared memo, same keying)
    val (single, fromCache) = svc.search(Seq(0f, 0f), 2)
    assert(fromCache && single.map(_.id) === Seq(1L, 2L))
  }

  test("follower rejects the WHOLE batch if any member demands STRONG (all-or-nothing)") {
    import graft.operators.MutationLog.{Eventual, Strong}
    import SearchService.BatchQuery
    val svc = freshService
    svc.search(Seq(0f, 0f), 2) // materialize v0 so relaxed reads could serve
    svc.setLeader(false)
    // one STRONG member poisons the batch — the EVENTUAL member that
    // would individually serve gets nothing (reference clears responses,
    // src/rpc/search_service_impl.cc:53-62)
    val rejected = svc.batchSearch(Seq(
      BatchQuery(Seq(2f, 2f), 1, Eventual),
      BatchQuery(Seq(0f, 0f), 2, Strong)))
    assert(rejected === Left(SearchService.NotLeader))
    // no partial service: the rejected batch cached nothing new
    assert(svc.cacheSize === 1)
    // an all-relaxed batch on the same follower serves fine
    val served = svc.batchSearch(Seq(
      BatchQuery(Seq(2f, 2f), 1, Eventual))).toOption.get
    assert(served.head._1.map(_.id) === Seq(3L))
    // single-read routing parity: STRONG rejected, relaxed served
    assert(svc.searchRouted(Seq(0f, 0f), 2, Strong) === Left(SearchService.NotLeader))
    assert(svc.searchRouted(Seq(0f, 0f), 2, Eventual).isRight)
    // back on the leader the same batch serves
    svc.setLeader(true)
    assert(svc.batchSearch(Seq(
      BatchQuery(Seq(0f, 0f), 2, Strong))).isRight)
  }

  test("delete removes from results after invalidation") {
    val svc = freshService
    svc.delete(Seq((1L, "s0")).toDF("id", "shard_id"))
    val (hits, _) = svc.search(Seq(0f, 0f), 3)
    assert(!hits.map(_.id).contains(1L))
  }

  test("upsert replaces the existing vector for the same (shard, id)") {
    val svc = freshService
    svc.upsert(Seq((2L, "s0", Seq(9f, 9f))).toDF("id", "shard_id", "embedding"))
    val (hits, _) = svc.search(Seq(9f, 9f), 1)
    assert(hits.head.id === 2L)
    assert(svc.current.count() === 3) // replaced, not duplicated
  }
}
