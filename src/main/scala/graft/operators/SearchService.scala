package graft.operators

import org.apache.spark.sql.DataFrame
import graft.TypedApi.ScoredPoint

/** The reference's read/write lifecycle as one object — the batch-engine
  * form of `ShardManager` + `SearchServiceImpl` (SURVEY.md §3):
  *
  *   search:  k=0 gate → cache lookup → exact scan + top-k merge →
  *            cache insert                (`src/index/shard_manager.cc:30-55`)
  *   mutate:  apply upserts/deletes → invalidate the whole cache
  *            (`src/index/shard_manager.cc:80-103`)
  *   warm:    materialize the vector set  (`src/index/shard_manager.cc:105-119`)
  *
  * The cache stores COLLECTED hit lists (≤ k rows by definition), keyed
  * on the actual (query, k) — no digest collisions (the reference bug,
  * `src/cache/query_cache.cc:76-87`, is fixed, not ported). Consistency:
  * a mutation invalidates everything, so a STRONG read after apply never
  * sees a stale cached result — same invariant as the reference's
  * invalidate-on-apply.
  */
final class SearchService(
    initial: DataFrame,
    cacheMaxEntries: Int = 1024,
    cacheTtlMillis: Long = 60000L,
    idCol: String = "id",
    embCol: String = "embedding") {

  private val memo = new QueryMemo[Seq[ScoredPoint]](cacheMaxEntries, cacheTtlMillis)
  @volatile private var state: DataFrame = initial

  /** Exact top-k with memoization. Returns (hits, servedFromCache). */
  def search(query: Seq[Float], k: Int): (Seq[ScoredPoint], Boolean) = {
    if (k <= 0) return (Nil, false) // k=0 short-circuit, reference parity
    memo.lookup(query, k) match {
      case Some(hits) => (hits, true)
      case None =>
        val hits = Knn.topK(state, query, k, idCol, embCol)
          .collect()
          .map(r => ScoredPoint(r.getLong(0), r.getDouble(1), ""))
          .toSeq
        memo.insert(query, k, hits)
        (hits, false)
    }
  }

  /** Upsert batch (delete-then-insert per key) + full cache flush. */
  def upsert(updates: DataFrame): Unit = synchronized {
    state = MutationLog.applyUpserts(state, updates)
    memo.invalidate()
  }

  /** Delete batch + full cache flush. */
  def delete(deletes: DataFrame): Unit = synchronized {
    state = MutationLog.applyDeletes(state, deletes)
    memo.invalidate()
  }

  /** O-8 warm: pin the current state in executor memory. */
  def warm(): Unit = { state = graft.sources.VectorStore.warm(state) }

  def cacheSize: Int = memo.size
  def current: DataFrame = state
}

object SearchService {
  /** O-13: build from a typed node config (file-based, default-on-absent
    * — see [[graft.util.ConfigLoader]]). The reference wires
    * `NodeRuntimeConfig.cache` into its query cache the same way
    * (`src/server/main.cc` → `ShardManager`). */
  def fromConfig(initial: DataFrame, cfg: graft.util.NodeRuntimeConfig,
      idCol: String = "id", embCol: String = "embedding"): SearchService =
    new SearchService(initial, cfg.cache.maxEntries,
      cfg.cache.ttlSeconds * 1000L, idCol, embCol)
}
