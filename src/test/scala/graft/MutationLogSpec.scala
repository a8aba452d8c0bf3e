package graft

import graft.operators.MutationLog
import graft.operators.MutationLog._

/** Replay semantics per FIXTURES.md §B.4 and reference parity notes. */
class MutationLogSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, String, Long, String, Seq[Float])*) =
    rows.toDF("log_index", "op", "id", "shard_id", "embedding")

  test("upsert then delete excludes the id") {
    val l = log((1L, "UPSERT", 7L, "s0", Seq(1f)), (2L, "DELETE", 7L, "s0", null))
    assert(MutationLog.replay(l).count() === 0)
  }

  test("delete then (re)upsert includes the id with the later payload") {
    val l = log(
      (1L, "UPSERT", 7L, "s0", Seq(1f)),
      (2L, "DELETE", 7L, "s0", null),
      (3L, "UPSERT", 7L, "s0", Seq(9f)))
    val got = MutationLog.replay(l).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Seq[Float]]("embedding") === Seq(9f))
  }

  test("delete of absent id is a no-op (reference returns false, state unchanged)") {
    val l = log((1L, "UPSERT", 7L, "s0", Seq(1f)), (2L, "DELETE", 99L, "s0", null))
    assert(MutationLog.replay(l).count() === 1)
  }

  test("upsert same id into two shards keeps both entries (reference quirk)") {
    val l = log((1L, "UPSERT", 7L, "s0", Seq(1f)), (2L, "UPSERT", 7L, "s1", Seq(2f)))
    assert(MutationLog.replay(l).count() === 2)
  }

  test("delete only removes the targeted shard's entry") {
    val l = log(
      (1L, "UPSERT", 7L, "s0", Seq(1f)), (2L, "UPSERT", 7L, "s1", Seq(2f)),
      (3L, "DELETE", 7L, "s0", null))
    val got = MutationLog.replay(l).collect()
    assert(got.map(_.getAs[String]("shard_id")).toSeq === Seq("s1"))
  }

  test("commitIndex prefix: later entries invisible") {
    val l = log((1L, "UPSERT", 7L, "s0", Seq(1f)), (5L, "DELETE", 7L, "s0", null))
    assert(MutationLog.replay(l, commitIndex = 4).count() === 1)
    assert(MutationLog.replay(l, commitIndex = 5).count() === 0)
  }

  test("compact(log, i) replays identically to the raw log") {
    val l = log(
      (1L, "UPSERT", 1L, "s0", Seq(1f)), (2L, "UPSERT", 2L, "s0", Seq(2f)),
      (3L, "DELETE", 1L, "s0", null), (4L, "UPSERT", 1L, "s1", Seq(3f)),
      (5L, "UPSERT", 2L, "s0", Seq(4f)), (6L, "DELETE", 2L, "s0", null))
    for (cut <- Seq(0L, 2L, 3L, 4L, 6L)) {
      val direct = MutationLog.replay(l).select("shard_id", "id").collect().toSet
      val viaCompact = MutationLog.replay(MutationLog.compact(l, cut))
        .select("shard_id", "id").collect().toSet
      assert(viaCompact === direct, s"cut=$cut")
    }
  }

  test("applyUpserts is delete-then-insert; applyDeletes is anti join") {
    val cur = Seq((1L, "s0", Seq(1f)), (2L, "s0", Seq(2f))).toDF("id", "shard_id", "embedding")
    val up = Seq((2L, "s0", Seq(9f)), (3L, "s0", Seq(3f))).toDF("id", "shard_id", "embedding")
    val afterUp = MutationLog.applyUpserts(cur, up)
    assert(afterUp.count() === 3)
    assert(afterUp.filter($"id" === 2L).head().getAs[Seq[Float]]("embedding") === Seq(9f))
    val del = Seq((1L, "s0")).toDF("id", "shard_id")
    assert(MutationLog.applyDeletes(afterUp, del).count() === 2)
  }

  test("snapshotIndex honors consistency levels (O-12)") {
    assert(snapshotIndex(100, Seq(80, 95), Strong) === 100)
    assert(snapshotIndex(100, Seq(80, 95), BoundedStaleness(10)) === 95)
    assert(snapshotIndex(100, Seq(80), BoundedStaleness(10)) === 100) // none admissible → recompute at commit
    assert(snapshotIndex(100, Seq(80, 95), Eventual) === 95)
    assert(snapshotIndex(100, Nil, Eventual) === 100)
  }

  test("requireDim raises on dimension mismatch (error parity)") {
    val l = log((1L, "UPSERT", 1L, "s0", Seq(1f, 2f)), (2L, "UPSERT", 2L, "s0", Seq(1f)))
    val e = intercept[Exception] {
      MutationLog.replay(MutationLog.requireDim(l, 2)).collect()
    }
    assert(e.getMessage.contains("dimension mismatch"))
  }

  test("requireShards raises on unknown shard (error parity)") {
    val l = log((1L, "UPSERT", 1L, "sX", Seq(1f)))
    val e = intercept[Exception] {
      MutationLog.replay(MutationLog.requireShards(l, Seq("s0", "s1"))).collect()
    }
    assert(e.getMessage.contains("unknown shard"))
  }

  test("replay is insensitive to input partitioning/order") {
    val l = log(
      (1L, "UPSERT", 1L, "s0", Seq(1f)), (2L, "DELETE", 1L, "s0", null),
      (3L, "UPSERT", 1L, "s0", Seq(2f)), (4L, "UPSERT", 2L, "s0", Seq(3f)))
    val shuffled = l.orderBy($"log_index".desc).repartition(7)
    val a = MutationLog.replay(l).select("id", "log_index").collect().toSet
    val b = MutationLog.replay(shuffled).select("id", "log_index").collect().toSet
    assert(a === b)
  }
}
