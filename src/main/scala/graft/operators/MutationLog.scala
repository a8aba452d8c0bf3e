package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mutation log — the reference's only write path, re-expressed.
  *
  * Reference semantics reproduced (SURVEY.md §2 O-4/O-5/O-9/O-12):
  *  - State = fold of a totally-ordered log of UPSERT/DELETE commands
  *    (`proto/mutation.proto:7-14`, apply loop `src/raft/raft_state.cc:416-459`).
  *  - Upsert is delete-then-insert *within one shard*
  *    (`src/index/vector_shard.cc:46-57`): the state key is
  *    `(shard_id, id)` — re-upserting an id into a different shard leaves
  *    the old shard's entry alive (duplicate-id quirk, SURVEY.md §2).
  *  - Delete removes only the `(shard_id, id)` entry
  *    (`src/index/shard_manager.cc:93-103`).
  *  - Consistency level selects WHICH log prefix you read (O-12):
  *    `STRONG` = everything at/below the commit watermark;
  *    `BOUNDED_STALENESS`/`EVENTUAL` = an older prefix is acceptable.
  *    Replication machinery itself (O-10/O-11) is control-plane and has
  *    no data-plane equivalent: durability comes from the storage layer.
  *
  * Scale design: replay is ONE shuffle on `(shard_id, id)` (window +
  * row_number), which is also the state's natural storage partitioning —
  * a compacted snapshot plus a log tail replays with the snapshot read
  * co-partitioned, so only the tail shuffles. Compaction
  * (`compact`) is an invisible optimization behind `replay`'s semantics:
  * replay(compact(log, i), tail) ≡ replay(log) — SURVEY.md §7 risk 3.
  */
object MutationLog {

  val Upsert = "UPSERT"
  val Delete = "DELETE"

  /** Materialize the state visible at `commitIndex`: last writer wins per
    * (shard_id, id); surviving UPSERTs carry their payload columns.
    * Output columns: everything except `op`, plus `log_index` of the
    * winning write (callers may drop it). */
  def replay(log: DataFrame, commitIndex: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(col("shard_id"), col("id"))
      .orderBy(col("log_index").desc)
    log.filter(col("log_index") <= commitIndex)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === Upsert)
      .drop("rn", "op")
  }

  /** Direct batch upsert against a materialized state: delete-then-insert
    * per (shard_id, id) — `src/index/vector_shard.cc:46-57` as an
    * anti-join + union. */
  def applyUpserts(current: DataFrame, updates: DataFrame): DataFrame =
    current.join(updates.select("shard_id", "id"), Seq("shard_id", "id"), "left_anti")
      .unionByName(updates)

  /** Direct batch delete: anti join on the state key. */
  def applyDeletes(current: DataFrame, deletes: DataFrame): DataFrame =
    current.join(deletes.select("shard_id", "id"), Seq("shard_id", "id"), "left_anti")

  /** Consistency levels, `proto/search.proto:8-12`. */
  sealed trait Consistency
  case object Strong extends Consistency
  /** Reads may lag the commit watermark by up to `maxLag` log entries. */
  final case class BoundedStaleness(maxLag: Long) extends Consistency
  case object Eventual extends Consistency

  /** Snapshot selection (O-12): which log prefix a read may serve.
    * STRONG must see exactly `commitIndex`; BOUNDED_STALENESS any prefix
    * within `maxLag` of it; EVENTUAL any available prefix. Given the
    * available materialized snapshot indexes, returns the prefix to use
    * (highest admissible — recomputing less is never wrong, the cap is
    * the point). */
  def snapshotIndex(
      commitIndex: Long,
      available: Seq[Long],
      level: Consistency): Long = level match {
    case Strong => commitIndex
    case BoundedStaleness(maxLag) =>
      available.filter(_ >= commitIndex - maxLag).maxOption.getOrElse(commitIndex)
    case Eventual => available.maxOption.getOrElse(commitIndex)
  }

  /** Snapshot read: state at the prefix admissible under `level`. */
  def snapshot(
      log: DataFrame,
      commitIndex: Long,
      level: Consistency,
      availableSnapshots: Seq[Long] = Nil): DataFrame =
    replay(log, snapshotIndex(commitIndex, availableSnapshots, level))

  /** Log compaction: collapse the prefix ≤ `upTo` into synthetic UPSERTs
    * (keeping their original winning log_index) and keep the tail
    * verbatim. replay(compact(log, i)) ≡ replay(log) for any i. At scale
    * this bounds replay cost to |state| + |tail| instead of |history|. */
  def compact(log: DataFrame, upTo: Long): DataFrame = {
    val head = replay(log, upTo).withColumn("op", lit(Upsert))
    val tail = log.filter(col("log_index") > upTo)
    head.select(tail.columns.map(col).toIndexedSeq: _*).unionByName(tail)
  }

  /** Analysis-time dimension guard — parity with the reference's upsert
    * validation (`src/index/shard_manager.cc:86-88`): any embedding of the
    * wrong dimension fails the job with a descriptive error. */
  def requireDim(log: DataFrame, dim: Int, embCol: String = "embedding"): DataFrame =
    log.withColumn(embCol,
      when(col(embCol).isNull || size(col(embCol)) === dim, col(embCol))
        .otherwise(raise_error(concat(
          lit(s"dimension mismatch: expected $dim, got "), size(col(embCol))))))

  /** Shard-existence guard — parity with unknown-shard errors
    * (`src/index/shard_manager.cc:81-84`). */
  def requireShards(log: DataFrame, known: Seq[String]): DataFrame =
    log.withColumn("shard_id",
      when(col("shard_id").isin(known: _*), col("shard_id"))
        .otherwise(raise_error(concat(lit("unknown shard: "), col("shard_id")))))
}
