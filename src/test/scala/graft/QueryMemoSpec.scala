package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QueryMemo

/** O-6/O-7 cache semantics: TTL expiry on read, LRU eviction, global
  * invalidation — `src/cache/query_cache.cc` behavior, collision-free key. */
class QueryMemoSpec extends AnyFunSuite {

  private def memo(max: Int, ttl: Long, now: () => Long) =
    new QueryMemo[String](max, ttl, now)

  test("hit within TTL, miss after expiry (expiry happens on read)") {
    var t = 0L
    val m = memo(10, 100, () => t)
    m.insert(Seq(1f), 5, "r1")
    assert(m.lookup(Seq(1f), 5).contains("r1"))
    t = 101
    assert(m.lookup(Seq(1f), 5).isEmpty)
    assert(m.size === 0) // expired entry removed on read
  }

  test("key includes k: same vector different k are distinct entries") {
    val m = memo(10, 1000, () => 0L)
    m.insert(Seq(1f), 5, "k5")
    m.insert(Seq(1f), 10, "k10")
    assert(m.lookup(Seq(1f), 5).contains("k5"))
    assert(m.lookup(Seq(1f), 10).contains("k10"))
  }

  test("LRU eviction: least-recently-USED leaves first") {
    val m = memo(2, 1000, () => 0L)
    m.insert(Seq(1f), 1, "a")
    m.insert(Seq(2f), 1, "b")
    m.lookup(Seq(1f), 1) // touch a → b is LRU
    m.insert(Seq(3f), 1, "c")
    assert(m.lookup(Seq(2f), 1).isEmpty)
    assert(m.lookup(Seq(1f), 1).contains("a"))
    assert(m.lookup(Seq(3f), 1).contains("c"))
  }

  test("invalidate clears everything (any mutation → full flush)") {
    val m = memo(10, 1000, () => 0L)
    m.insert(Seq(1f), 1, "a"); m.insert(Seq(2f), 1, "b")
    m.invalidate()
    assert(m.size === 0)
    assert(m.lookup(Seq(1f), 1).isEmpty)
  }

  test("no digest collisions: distinct vectors never alias (fixes reference bug)") {
    val m = memo(100, 1000, () => 0L)
    // the reference keys on FNV-1a64(bytes) only; equal hashes alias.
    // Our key is the vector itself — distinct vectors stay distinct.
    (0 until 50).foreach(i => m.insert(Seq(i.toFloat), 1, s"v$i"))
    (0 until 50).foreach(i => assert(m.lookup(Seq(i.toFloat), 1).contains(s"v$i")))
  }
}
