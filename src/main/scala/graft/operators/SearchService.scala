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
  import SearchService.BatchQuery

  private val memo = new QueryMemo[Seq[ScoredPoint]](cacheMaxEntries, cacheTtlMillis)
  // Raft-role flag: the reference gates STRONG reads on leadership
  // (`src/rpc/search_service_impl.cc:10-12,28-31`); the batch engine has
  // no control plane (O-10/O-11 out of scope), so the ROLE is a flag and
  // the ROUTING semantics are what's preserved (and tested).
  @volatile private var leader: Boolean = true
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
        // guard: snap may have left retention while the scan ran, and a
        // re-added evicted index is a dead entry advance() never prunes
        synchronized { if (snapshots.contains(snap)) materialized += snap }
        memo.insert(query, k, hits, snap)
        (hits, false)
    }
  }

  /** Role transitions (no control plane here — tests/operators drive
    * them; the reference's Raft does, `src/raft/raft_state.cc`). */
  def setLeader(isLeader: Boolean): Unit = { leader = isLeader }
  def isLeader: Boolean = leader

  /** Single-read routing parity: a STRONG read on a follower is
    * rejected (`Search`, `src/rpc/search_service_impl.cc:28-31` —
    * FAILED_PRECONDITION + leader hint; the hint is the message here).
    * Relaxed reads serve locally. [[search]] stays the leader-local
    * form. */
  def searchRouted(query: Seq[Float], k: Int,
      level: Consistency = Strong): Either[String, (Seq[ScoredPoint], Boolean)] =
    if (!leader && level == Strong) Left(SearchService.NotLeader)
    else Right(search(query, k, level))

  /** Batch read with the reference's ALL-OR-NOTHING consistency gate
    * (`BatchSearch`, `src/rpc/search_service_impl.cc:53-62`): on a
    * follower, if ANY member demands STRONG the ENTIRE batch is
    * rejected — members that would individually be serveable get
    * nothing (the reference clears the response list). On the leader
    * every level serves.
    *
    * Execution is Spark-first, not the reference's per-request OpenMP
    * loop (`src/index/shard_manager.cc:61-78`): after per-member cache
    * lookups, the misses are grouped by (resolved snapshot, k) and each
    * group runs as ONE [[Knn.batchTopKChunked]] pass over that snapshot
    * — the batch is data, and arbitrary widths stay broadcast-sized.
    * Returns per-member (hits, servedFromCache) in request order. */
  def batchSearch(requests: Seq[BatchQuery])
      : Either[String, Seq[(Seq[ScoredPoint], Boolean)]] = {
    if (!leader && requests.exists(_.level == Strong))
      return Left(SearchService.NotLeader)
    // one lock: the whole batch resolves against a consistent view of
    // the retention/materialization state — INCLUDING the state plans
    // (re-reading snapshots(s) later would race a concurrent apply that
    // evicts s from retention mid-batch)
    val resolved = synchronized {
      val avail = materialized.toSeq.filter(snapshots.contains)
      requests.map { r =>
        val s = MutationLog.snapshotIndex(commitIndex, avail, r.level)
        (r, s, snapshots.get(s))
      }
    }
    val cached: Seq[Option[Seq[ScoredPoint]]] = resolved.map { case (r, s, _) =>
      if (r.k <= 0) Some(Nil) else memo.lookup(r.query, r.k, s)
    }
    val missIdx = resolved.indices.filter(i =>
      cached(i).isEmpty && resolved(i)._1.k > 0)
    val computed = scala.collection.mutable.Map[Int, Seq[ScoredPoint]]()
    missIdx.groupBy(i => (resolved(i)._2, resolved(i)._1.k)).foreach {
      case ((snap, k), idxs) =>
        // STRONG resolves to the commit index, which is always retained
        // at resolution time, so the plan was captured above
        val state = resolved(idxs.head)._3.getOrElse(
          sys.error(s"snapshot $snap not retained"))
        val sp = state.sparkSession
        import sp.implicits._
        val qdf = idxs.map(i => (i.toLong, resolved(i)._1.query)).toDF("query_id", "qvec")
        // the batch came from a local collection — its width is known, so
        // batchTopKChunked skips the count job AND the localCheckpoint
        val byQuery = Knn.batchTopKChunked(state, qdf, k, idCol = idCol,
          embCol = embCol, knownWidth = Some(idxs.size.toLong))
          .orderBy("query_id", "rank").collect()
          .map(r => (r.getLong(0).toInt, ScoredPoint(r.getLong(1), r.getDouble(2), "")))
          .groupBy(_._1).map { case (i, rows) => (i, rows.map(_._2).toSeq) }
        idxs.foreach { i =>
          val hits = byQuery.getOrElse(i, Nil)
          computed(i) = hits
          memo.insert(resolved(i)._1.query, k, hits, snap)
        }
        // only mark still-retained versions: re-adding an evicted index
        // would leave a dead entry advance() never prunes again
        synchronized { if (snapshots.contains(snap)) materialized += snap }
    }
    Right(resolved.indices.map { i =>
      cached(i) match {
        case Some(hits) => (hits, resolved(i)._1.k > 0)
        case None => (computed(i), false)
      }
    })
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

  /** The snapshot index a read at `level` resolves to RIGHT NOW — a
    * driver-side metadata read (one lock, no job). [[ResidentServing]]
    * polls this per lookup to decide whether its loaded loop is the
    * version the level demands. */
  private[graft] def resolvedSnapshot(level: Consistency): Long =
    synchronized {
      MutationLog.snapshotIndex(commitIndex,
        materialized.toSeq.filter(snapshots.contains), level)
    }

  /** [[resolvedSnapshot]] plus the resolved state plan, one lock. */
  private[graft] def resolvedState(level: Consistency): (Long, DataFrame) =
    synchronized {
      val s = MutationLog.snapshotIndex(commitIndex,
        materialized.toSeq.filter(snapshots.contains), level)
      (s, snapshots(s))
    }

  /** Open a driver-RESIDENT serve loop over the snapshot a read at
    * `level` would serve (the reference's loaded-shard model —
    * [[ServeLoop]] scaladoc): results are value-identical to [[search]]
    * against the same snapshot, latency is in-process instead of
    * one-Spark-job-per-query. None above the residency cap — callers
    * keep serving through [[search]], which handles any corpus size.
    * The loop is a point-in-time resident copy: mutations applied
    * after `residentLoop` returns are served by a REOPENED loop (the
    * reference reloads shards the same way — or use [[residentServing]]
    * for the self-reopening handle). */
  def residentLoop(level: Consistency = Strong): Option[ServeLoop] =
    ServeLoop.open(resolvedState(level)._2, idCol, embCol)

  /** The O-7 analog for the resident tier (VERDICT r17 next #2): a
    * long-lived serving handle that tracks the commit watermark the
    * way the reference invalidates its loaded state on every applied
    * mutation (`src/index/shard_manager.cc:90,99-101`) — a bare
    * [[residentLoop]] serves its open-time snapshot forever; this
    * handle checks the resolved snapshot index per lookup (a
    * driver-side metadata read, not a job) and REOPENS when it
    * advances. STRONG tracks the watermark on every lookup; EVENTUAL /
    * BOUNDED may keep serving the loaded version for up to
    * `stalenessMillis` between checks (the warm-replica lag the levels
    * model). */
  def residentServing(level: Consistency = Strong,
      stalenessMillis: Long = 0L): ResidentServing =
    new ResidentServing(this, level, stalenessMillis, idCol, embCol)
}

/** Self-reopening resident serve handle — see
  * [[SearchService.residentServing]]. Values are ≡
  * [[SearchService.search]] at the same snapshot throughout
  * (SearchServiceSpec pins mutate → STRONG resident read serves
  * post-mutation state with no caller-side reopen; EVENTUAL may serve
  * the old snapshot until its staleness window lapses or [[refresh]]).
  * Thread-safe: reopen is serialized, lookups race it benignly (they
  * serve either the old or the new loop — both are valid serves of
  * their own snapshot; STRONG lookups re-check before every scan). */
final class ResidentServing private[operators] (
    svc: SearchService,
    level: MutationLog.Consistency,
    stalenessMillis: Long,
    idCol: String,
    embCol: String) {

  private final class Loaded(val snap: Long, val loop: Option[ServeLoop])
  @volatile private var cur: Loaded = _
  @volatile private var lastCheckNanos: Long = _
  refresh()

  /** Force re-resolution and (if the resolved snapshot advanced)
    * reopen now. Synchronized: concurrent stale lookups fold into ONE
    * reopen — the second caller re-reads the already-updated state. */
  def refresh(): Unit = synchronized {
    val (snap, state) = svc.resolvedState(level)
    if (cur == null || cur.snap != snap)
      cur = new Loaded(snap, ServeLoop.open(state, idCol, embCol))
    lastCheckNanos = System.nanoTime()
  }

  /** The snapshot index currently loaded (spec observability). */
  def snapshot: Long = cur.snap

  /** Resident exact top-k at this handle's consistency level; None
    * when the resolved snapshot exceeds the residency cap — the caller
    * serves that query through [[SearchService.search]], which answers
    * any corpus size at the same level. */
  def search(query: Seq[Float], k: Int): Option[Seq[graft.TypedApi.ScoredPoint]] = {
    val mustCheck = level == MutationLog.Strong ||
      (System.nanoTime() - lastCheckNanos) / 1000000L >= stalenessMillis
    if (mustCheck) {
      if (svc.resolvedSnapshot(level) != cur.snap) refresh()
      else lastCheckNanos = System.nanoTime()
    }
    cur.loop.map(_.search(query, k))
  }
}

object SearchService {
  /** One member of a [[SearchService.batchSearch]] batch; STRONG default
    * mirrors the proto's zero value (`proto/search.proto:8-12`). */
  final case class BatchQuery(query: Seq[Float], k: Int,
      level: MutationLog.Consistency = MutationLog.Strong)

  /** The reference's rejection message, `src/rpc/search_service_impl.cc:59`. */
  val NotLeader = "Leader routing required for strong consistency"

  /** O-13: build from a typed node config (file-based, default-on-absent
    * — see [[graft.util.ConfigLoader]]). The reference wires
    * `NodeRuntimeConfig.cache` into its query cache the same way
    * (`src/server/main.cc` → `ShardManager`). */
  def fromConfig(initial: DataFrame, cfg: graft.util.NodeRuntimeConfig,
      idCol: String = "id", embCol: String = "embedding"): SearchService =
    new SearchService(initial, cfg.cache.maxEntries,
      cfg.cache.ttlSeconds * 1000L, idCol, embCol)
}
