package graft.operators

/** O-6 query-result memoization — the reference's LRU+TTL cache
  * (`src/cache/query_cache.cc`), minus its digest-collision bug.
  *
  * The reference keys on `(FNV-1a64(query bytes), top_k)` and never
  * verifies the stored query, so hash collisions silently serve wrong
  * results (`src/cache/query_cache.cc:51-56,76-87`). We key on the actual
  * `(query vector, k, snapshot)` — collision-free by construction, and
  * versioned: the snapshot component scopes every entry to the state
  * version it was computed from, so a STRONG read after a mutation can
  * never be served a stale entry (different snapshot → different key),
  * while a BOUNDED/EVENTUAL read of an older retained version hits that
  * version's own entries. TTL expiry on read (`:21-26`), LRU eviction on
  * insert (`:68-74`) are preserved; invalidation is available globally
  * (O-7, `:45-49`) or scoped to one retired snapshot.
  *
  * In a batch engine this is an optimization, never semantics: a miss
  * recomputes, which is always correct. Values are whatever the caller
  * materializes (typically collected top-k rows — small by definition).
  */
final class QueryMemo[V](maxEntries: Int, ttlMillis: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(value: V, insertedAt: Long)
  private val map =
    new java.util.LinkedHashMap[(Seq[Float], Int, Long), Entry](16, 0.75f, true)

  def lookup(query: Seq[Float], k: Int, snapshot: Long = 0L): Option[V] =
    synchronized {
      Option(map.get((query, k, snapshot))) match {
        case Some(e) if clock() - e.insertedAt <= ttlMillis => Some(e.value)
        case Some(_) => map.remove((query, k, snapshot)); None // TTL expiry on read
        case None => None
      }
    }

  def insert(query: Seq[Float], k: Int, value: V, snapshot: Long = 0L): Unit =
    synchronized {
      map.put((query, k, snapshot), Entry(value, clock()))
      // LRU eviction down to maxEntries (access-order LinkedHashMap)
      val it = map.entrySet().iterator()
      while (map.size() > maxEntries && it.hasNext) { it.next(); it.remove() }
    }

  /** O-7 global flush — the reference's invalidate-on-apply. With
    * snapshot-scoped keys this is an operational lever (free memory,
    * force recompute), not a correctness requirement. */
  def invalidate(): Unit = synchronized { map.clear() }

  /** Scoped flush: drop every entry of one snapshot version — called
    * when a state version leaves the retention window and its entries
    * become unreachable (no read can resolve to that snapshot again). */
  def invalidateSnapshot(snapshot: Long): Unit = synchronized {
    map.keySet().removeIf(_._3 == snapshot)
  }

  def size: Int = synchronized { map.size() }
}
