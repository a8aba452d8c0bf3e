package graft.operators

import org.apache.spark.sql.DataFrame
import graft.TypedApi.ScoredPoint

/** The reference's read/write lifecycle as one object — the batch-engine
  * form of `ShardManager` + `SearchServiceImpl` (SURVEY.md §3):
  *
  *   search:  k=0 gate → consistency gate (snapshot selection) → cache
  *            lookup → exact scan + top-k merge → cache insert
  *            (`src/index/shard_manager.cc:30-55`; consistency gate
  *            `src/rpc/search_service_impl.cc:26-31`)
  *   mutate:  apply upserts/deletes → advance the commit index, retain
  *            the previous version for stale reads
  *            (`src/index/shard_manager.cc:80-103`)
  *   warm:    materialize the current version (`:105-119`)
  *
  * CONSISTENCY (O-12): every read takes a [[MutationLog.Consistency]]
  * level. STRONG resolves to the current commit index; BOUNDED/EVENTUAL
  * may resolve to an older RETAINED version that has already been
  * materialized by a previous read — the serving-system reality the
  * levels model: after an apply, warm replicas still hold the previous
  * version, and relaxed reads keep being served from it until the new
  * version is loaded. Up to `maxSnapshots` versions are retained.
  *
  * CACHE: entries are keyed on the actual (query, k, resolved snapshot)
  * — no digest collisions (the reference bug,
  * `src/cache/query_cache.cc:76-87`, is fixed, not ported), and no
  * cross-version staleness: a STRONG read after apply resolves to the
  * new commit index and cannot match any entry computed from an older
  * version (key separation — strictly stronger than the reference's
  * blunt flush-on-apply, whose cache is version-oblivious and has no
  * other way to stay correct). An EVENTUAL read that legitimately
  * serves an older version hits that version's own entries. Entries of
  * a version that leaves retention are flushed (scoped O-7).
  */
final class SearchService(
    initial: DataFrame,
    cacheMaxEntries: Int = 1024,
    cacheTtlMillis: Long = 60000L,
    idCol: String = "id",
    embCol: String = "embedding",
    maxSnapshots: Int = 4) {

  import MutationLog.{Consistency, Strong}

  private val memo = new QueryMemo[Seq[ScoredPoint]](cacheMaxEntries, cacheTtlMillis)
  // retained versions: commit index → state plan (current always present)
  private val snapshots = scala.collection.mutable.TreeMap[Long, DataFrame](0L -> initial)
  // versions a read has materialized (what relaxed reads may serve);
  // the initial load counts — it IS the warm copy at startup
  private val materialized = scala.collection.mutable.TreeSet[Long](0L)
  private var commitIndex: Long = 0L

  /** Exact top-k with memoization under a consistency level.
    * Returns (hits, servedFromCache). */
  def search(query: Seq[Float], k: Int,
      level: Consistency = Strong): (Seq[ScoredPoint], Boolean) = {
    if (k <= 0) return (Nil, false) // k=0 short-circuit, reference parity
    val (snap, state) = synchronized {
      val s = MutationLog.snapshotIndex(commitIndex,
        materialized.toSeq.filter(snapshots.contains), level)
      (s, snapshots(s))
    }
    memo.lookup(query, k, snap) match {
      case Some(hits) => (hits, true)
      case None =>
        val hits = Knn.topK(state, query, k, idCol, embCol)
          .collect()
          .map(r => ScoredPoint(r.getLong(0), r.getDouble(1), ""))
          .toSeq
        synchronized { materialized += snap }
        memo.insert(query, k, hits, snap)
        (hits, false)
    }
  }

  /** Upsert batch (delete-then-insert per key); advances the commit
    * index and retains the previous version for relaxed reads. */
  def upsert(updates: DataFrame): Unit = synchronized {
    advance(MutationLog.applyUpserts(snapshots(commitIndex), updates))
  }

  /** Delete batch; same version bookkeeping as [[upsert]]. */
  def delete(deletes: DataFrame): Unit = synchronized {
    advance(MutationLog.applyDeletes(snapshots(commitIndex), deletes))
  }

  private def advance(next: DataFrame): Unit = {
    commitIndex += 1
    snapshots(commitIndex) = next
    while (snapshots.size > maxSnapshots) {
      val oldest = snapshots.firstKey
      snapshots -= oldest
      materialized -= oldest
      memo.invalidateSnapshot(oldest) // entries are unreachable now
    }
  }

  /** O-8 warm: pin the current version in executor memory. */
  def warm(): Unit = synchronized {
    snapshots(commitIndex) = graft.sources.VectorStore.warm(snapshots(commitIndex))
    materialized += commitIndex
  }

  /** O-7 operational flush of the whole cache (reference's
    * invalidate-on-apply surface; correctness never depends on it —
    * see the class scaladoc). */
  def invalidateCache(): Unit = memo.invalidate()

  def cacheSize: Int = memo.size
  def current: DataFrame = synchronized { snapshots(commitIndex) }
  def currentCommitIndex: Long = synchronized { commitIndex }
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
