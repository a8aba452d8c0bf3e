package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions._

/** One document heading into the streaming packer: `shard` is the
  * parallel packing lane (each lane owns its own token stream). */
case class PackDoc(shard: Long, doc_id: Long, n_tokens: Long)

/** A streaming pack assignment — same fields as the batch manifest,
  * scoped to the doc's shard lane. */
case class PackAssign(shard: Long, doc_id: Long, n_tokens: Long,
    start_offset: Long, pack_first: Long, pack_last: Long,
    pack_offset: Long)

/** Sequence packing — the manifest step of LM pre-training batch prep:
  * documents are concatenated in a canonical order (ascending id) into
  * one token stream and cut every `capacity` tokens, each cut being one
  * training sequence ("pack"). The manifest maps every document to its
  * global token offset and the pack range it lands in; a doc straddling
  * a cut continues in the next pack — exactly the GPT-style
  * concatenate-and-chunk regime (GPT-3, arXiv:2005.14165 §2.3). The
  * reference has no batch-prep surface at all (serving only,
  * `src/rpc/search_service_impl.cc`); this is pipeline-side curation.
  *
  * Scale shape — the global running sum is a DISTRIBUTED prefix scan,
  * not a single-partition window: range-repartition by id (contiguous
  * id ranges per partition), a partition-LOCAL running-sum window, and
  * per-partition totals offset via a broadcast of one row per partition
  * (bounded by cluster parallelism, never by data). The output is a
  * pure function of (id order, token counts), so it is invariant to the
  * actual range boundaries — verified by the cpu4-vs-cpu32 determinism
  * gate. All arithmetic is integer-exact (BIGINT on both engines).
  *
  * Returns (idCol, n_tokens, start_offset, pack_first, pack_last,
  * pack_offset): 0-based global token offset, inclusive pack ids, and
  * the offset of the doc's first token within its first pack. */
object Packing {

  def manifest(docs: DataFrame, capacity: Long = 512,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // persisted + materialized BEFORE branching: both the totals branch
    // and the join branch must observe the SAME range partitioning (a
    // recomputed RangePartitioner can sample differently, which would
    // desynchronize pid between the branches — wrong offsets, not just
    // nondeterminism). Callers own cleanup per the Dedup convention.
    val lens = docs
      .select(col(idCol).as("id"), tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lens.count()
    // one row per partition; the ordered offset window runs over a
    // frame bounded by the partition COUNT (cluster-sized, not
    // data-sized), then rides back as a broadcast
    val offs = lens.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("ptot"))
      .withColumn("poff",
        coalesce(sum(col("ptot")).over(
          Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("poff"))
    val wp = Window.partitionBy(col("pid")).orderBy(col("id"))
    lens
      .join(broadcast(offs), Seq("pid"))
      .withColumn("cum_end", sum(col("n_tokens")).over(wp) + col("poff"))
      .withColumn("start_offset", col("cum_end") - col("n_tokens"))
      .select(col("id").as(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div ${capacity}L").as("pack_first"),
        expr(s"(cum_end - 1) div ${capacity}L").as("pack_last"),
        pmod(col("start_offset"), lit(capacity)).as("pack_offset"))
  }

  /** Streaming form: ingest-time packing with one running token offset
    * per shard lane held in `GroupState` (state is bounded by the lane
    * count, never by stream length). Docs pack in ARRIVAL order across
    * micro-batches, id order within a batch — when a lane's batches
    * arrive in id order the output equals the batch [[manifest]] of
    * that lane's documents (parity-pinned in PackingSpec). The batch
    * path stays the reproducible-offsets authority; this is the
    * append-only ingest shape (new corpus slices pack as they land,
    * nothing recomputes). */
  def manifestStream(docs: Dataset[PackDoc],
      capacity: Long = 512): Dataset[PackAssign] = {
    require(capacity > 0, "capacity must be positive")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[Long, PackAssign](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val s = off
            off += d.n_tokens
            PackAssign(shard, d.doc_id, d.n_tokens, s, s / capacity,
              if (d.n_tokens == 0) s / capacity else (off - 1) / capacity,
              s % capacity)
          }
          state.update(off)
          out.iterator
      }
  }

  /** Curriculum ordering: round-robin interleave of per-source quality
    * rankings — round r of the curriculum takes each source's r-th best
    * doc (sources in name order), so every training window sees the
    * best remaining mix of sources instead of one source's contiguous
    * block. `round_no` = rank within source by (scoreCol desc, id);
    * `pos` = 1-based global curriculum position.
    *
    * SCALE: the obvious `row_number() OVER (ORDER BY round, source)` is
    * a single-partition window over the corpus. Instead the global
    * position is computed ARITHMETICALLY from the per-source size table
    * (one tiny agg, broadcast back): a doc at (round r, source s) is
    * preceded by the first r−1 rounds of every source — Σ_s' min(cnt_s',
    * r−1) — plus this round's earlier sources — |{s' < s : cnt_s' ≥ r}|.
    * The crossJoin is corpus × #sources with the size table broadcast
    * (BroadcastNestedLoopJoin — the intended scalar-broadcast shape),
    * re-aggregated on the doc key: fully distributed, no global window,
    * identical to the window form (differential-tested). */
  def curriculumOrder(docs: DataFrame, scoreCol: String,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val ranked = docs
      .select(col(idCol).as("id"), col(sourceCol).as("src"), col(scoreCol).as("score"))
      .withColumn("round_no",
        row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("score").desc, col("id"))).cast("long"))
    val sizes = docs.groupBy(col(sourceCol).as("csrc"))
      .agg(count(lit(1)).as("cnt"))
    ranked.crossJoin(broadcast(sizes))
      .groupBy(col("id"), col("src"), col("round_no"))
      .agg((sum(least(col("cnt"), col("round_no") - 1)) +
        sum(when(col("csrc") < col("src") && col("cnt") >= col("round_no"), 1L)
          .otherwise(0L)) + 1L).as("pos"))
      .select(col("id").as(idCol), col("src").as(sourceCol),
        col("round_no"), col("pos"))
  }
}
