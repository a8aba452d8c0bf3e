package graft.operators

/** O-6 query-result memoization — the reference's LRU+TTL cache
  * (`src/cache/query_cache.cc`), minus its digest-collision bug.
  *
  * The reference keys on `(FNV-1a64(query bytes), top_k)` and never
  * verifies the stored query, so hash collisions silently serve wrong
  * results (`src/cache/query_cache.cc:51-56,76-87`). We key on the actual
  * `(query vector, k)` — collision-free by construction. TTL expiry on
  * read (`:21-26`), LRU eviction on insert (`:68-74`), global
  * invalidation on mutation (`:45-49`) are all preserved.
  *
  * In a batch engine this is an optimization, never semantics: a miss
  * recomputes, which is always correct. Values are whatever the caller
  * materializes (typically collected top-k rows — small by definition).
  */
final class QueryMemo[V](maxEntries: Int, ttlMillis: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(value: V, insertedAt: Long)
  private val map = new java.util.LinkedHashMap[(Seq[Float], Int), Entry](16, 0.75f, true)

  def lookup(query: Seq[Float], k: Int): Option[V] = synchronized {
    Option(map.get((query, k))) match {
      case Some(e) if clock() - e.insertedAt <= ttlMillis => Some(e.value)
      case Some(_) => map.remove((query, k)); None // TTL expiry on read
      case None => None
    }
  }

  def insert(query: Seq[Float], k: Int, value: V): Unit = synchronized {
    map.put((query, k), Entry(value, clock()))
    // LRU eviction down to maxEntries (access-order LinkedHashMap)
    val it = map.entrySet().iterator()
    while (map.size() > maxEntries && it.hasNext) { it.next(); it.remove() }
  }

  /** O-7: any applied mutation clears everything. */
  def invalidate(): Unit = synchronized { map.clear() }

  def size: Int = synchronized { map.size() }
}
