package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MutationLog

/** Durable mutation log + monotone commit watermark.
  *
  * This is the storage-layer replacement for the reference's Raft write
  * path (SURVEY.md §2 O-10): the log is an append-only set of parquet
  * segments; "commit" is a watermark file updated via temp-file +
  * atomic rename AFTER the segment write succeeds. Readers replay
  * `log_index <= commitIndex`, so a torn/failed append (segment written,
  * watermark not advanced — or vice versa never happens) is invisible:
  * exactly the reference's invariant that only committed entries apply
  * (`src/raft/raft_state.cc:416-459`), with quorum replaced by durable
  * write.
  *
  * At scale the segments are the natural streaming-source input
  * (IntegrationSpec tails them) and `MutationLog.compact` bounds replay.
  */
object LogStore {

  private def watermarkPath(path: String) = Paths.get(path, "_COMMIT")

  /** Highest committed log index; -1 for an empty store. */
  def commitIndex(path: String): Long = {
    val p = watermarkPath(path)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** Append entries (must carry log_index > current watermark), then
    * advance the watermark to the max appended index. Returns the new
    * commit index. */
  def append(entries: DataFrame, path: String): Long = {
    val prev = commitIndex(path)
    val mn = entries.agg(min(col("log_index")), max(col("log_index"))).head()
    require(!mn.isNullAt(0), "append of empty entry set")
    val (lo, hi) = (mn.getLong(0), mn.getLong(1))
    require(lo > prev,
      s"log_index must advance monotonically: min appended $lo <= committed $prev")
    entries.write.mode("append").parquet(s"$path/segments")
    // watermark advances only after the segment write succeeded
    val tmp = Paths.get(path, s"_COMMIT.tmp")
    Files.writeString(tmp, hi.toString)
    Files.move(tmp, watermarkPath(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    hi
  }

  /** The committed log (uncommitted segment rows filtered out). */
  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/segments")
      .filter(col("log_index") <= commitIndex(path))

  /** Materialized state at the given consistency level. */
  def snapshot(spark: SparkSession, path: String,
      level: MutationLog.Consistency = MutationLog.Strong): DataFrame =
    MutationLog.snapshot(readLog(spark, path), commitIndex(path), level)
}
