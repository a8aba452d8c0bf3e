package graft

import java.nio.file.Files
import graft.sources.LogStore

class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def entries(rows: (Long, String, Long, String, Seq[Float])*) =
    rows.toDF("log_index", "op", "id", "shard_id", "embedding")

  test("append advances the watermark; snapshot folds committed state") {
    val dir = Files.createTempDirectory("graft-logstore").toString
    assert(LogStore.commitIndex(dir) === -1L)
    val c1 = LogStore.append(entries(
      (0L, "UPSERT", 1L, "s0", Seq(1f)), (1L, "UPSERT", 2L, "s0", Seq(2f))), dir)
    assert(c1 === 1L)
    assert(LogStore.snapshot(spark, dir).count() === 2)
    val c2 = LogStore.append(entries((2L, "DELETE", 1L, "s0", null)), dir)
    assert(c2 === 2L)
    val state = LogStore.snapshot(spark, dir).select("id").collect().map(_.getLong(0))
    assert(state.toSeq === Seq(2L))
  }

  test("non-monotone append is rejected (ordering invariant)") {
    val dir = Files.createTempDirectory("graft-logstore2").toString
    LogStore.append(entries((5L, "UPSERT", 1L, "s0", Seq(1f))), dir)
    val e = intercept[IllegalArgumentException] {
      LogStore.append(entries((3L, "UPSERT", 2L, "s0", Seq(1f))), dir)
    }
    assert(e.getMessage.contains("monotonically"))
    assert(LogStore.commitIndex(dir) === 5L)
  }

  test("segment rows beyond the watermark are invisible (torn append)") {
    val dir = Files.createTempDirectory("graft-logstore3").toString
    LogStore.append(entries((0L, "UPSERT", 1L, "s0", Seq(1f))), dir)
    // simulate a crash after segment write but before watermark advance
    entries((1L, "UPSERT", 99L, "s0", Seq(9f)))
      .write.mode("append").parquet(s"$dir/segments")
    assert(LogStore.commitIndex(dir) === 0L)
    val ids = LogStore.snapshot(spark, dir).select("id").collect().map(_.getLong(0))
    assert(!ids.contains(99L)) // uncommitted entry never applies
  }

  test("bounded staleness reads an admissible older prefix") {
    val dir = Files.createTempDirectory("graft-logstore4").toString
    LogStore.append(entries(
      (0L, "UPSERT", 1L, "s0", Seq(1f)), (1L, "DELETE", 1L, "s0", null)), dir)
    import graft.operators.MutationLog
    val strong = LogStore.snapshot(spark, dir, MutationLog.Strong)
    assert(strong.count() === 0)
    // an available snapshot at index 0 is admissible within lag 5
    val stale = MutationLog.snapshot(LogStore.readLog(spark, dir),
      LogStore.commitIndex(dir), MutationLog.BoundedStaleness(5), Seq(0L))
    assert(stale.count() === 1)
  }
}
