package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the incremental form of the batch
  * event/log analytics (SURVEY.md §2 Table B, streaming row).
  *
  * The reference's only "stream" is the Raft mutation log applied
  * incrementally (`src/raft/raft_state.cc:416-459`); these operators
  * generalize that to event analytics with watermarked state:
  *  - tumbling/sliding window aggregation (streaming `events_hourly`)
  *  - session windows per user
  *  - streaming upsert compaction: latest-write-wins state per key,
  *    the incremental form of MutationLog.replay
  *
  * All transforms take a DataFrame and don't care whether it is
  * streaming or batch — the same plan incrementalizes under
  * `readStream` (tested with MemoryStream in EventStreamsSpec).
  */
object EventStreams {

  /** Tumbling-window counts/revenue per event type. Late rows beyond
    * `watermarkDelay` are dropped (state is bounded — required for an
    * unbounded 100 TB/day stream). */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    hourlyRollupOnWatermarked(events.withWatermark("ts", watermarkDelay))

  /** [[hourlyRollup]] minus the watermark definition — for composing
    * AFTER an upstream stateful operator (e.g. [[dedupStream]]) that
    * already set the event-time watermark: with chained stateful
    * operators Spark disallows redefining it downstream. On batch
    * frames identical to [[hourlyRollup]] (withWatermark is a no-op
    * there). */
  def hourlyRollupOnWatermarked(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("revenue"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("revenue"))

  /** Sliding-window (1h window, 15m slide) event rate per type. */
  def slidingRate(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"))

  /** Session windows per user: gap-based sessionization (built-in
    * session_window — state bounded by the watermark). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming exact dedup — the incremental form of Dedup.exact: drop
    * any document whose normalized-content hash was already seen within
    * the watermark horizon. `dropDuplicatesWithinWatermark` keeps one
    * state row per distinct hash and EVICTS it once the watermark
    * passes — bounded state on an unbounded stream (a plain
    * dropDuplicates would grow state forever at 100 TB/day). */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", graft.functions.TextFunctions.contentHash(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Batch form of [[dedupStream]] — Spark restricts
    * `dropDuplicatesWithinWatermark` to streaming frames, so this is
    * the one transform here whose batch equivalent needs a different
    * call (plain dropDuplicates; no horizon, since a bounded input IS
    * one horizon). Result parity with the streamed form is asserted in
    * IntegrationSpec, up to WHICH duplicate survives (batch picks
    * arbitrarily, the stream keeps first arrival). */
  def dedupBatch(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", graft.functions.TextFunctions.contentHash(col(textCol)))
      .dropDuplicates("content_hash")

  /** A mutation-log record for streaming compaction. */
  case class LogRecord(logIndex: Long, op: String, id: Long,
      shardId: String, embedding: Seq[Float])
  /** Current state of one (shardId, id) key. */
  case class KeyState(logIndex: Long, present: Boolean, embedding: Seq[Float])
  /** Emitted state change. */
  case class StateChange(shardId: String, id: Long, logIndex: Long, present: Boolean)

  /** Streaming upsert compaction — the incremental MutationLog.replay:
    * per (shardId, id) keep the highest-log_index write, emit a change
    * row whenever the winner changes. `flatMapGroupsWithState` holds one
    * small KeyState per live key (bounded by key cardinality, not log
    * length — the streaming analog of log compaction). */
  def compactLog(log: Dataset[LogRecord]): Dataset[StateChange] = {
    import log.sparkSession.implicits._
    log.groupByKey(r => (r.shardId, r.id))
      .flatMapGroupsWithState[KeyState, StateChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((shardId, id), rows, state: GroupState[KeyState]) =>
          val prior = state.getOption
          val winner = (prior.map(s => LogRecord(s.logIndex,
              if (s.present) "UPSERT" else "DELETE", id, shardId, s.embedding)).iterator
            ++ rows).maxBy(_.logIndex)
          val next = KeyState(winner.logIndex, winner.op == "UPSERT", winner.embedding)
          if (prior.contains(next)) Iterator.empty
          else {
            state.update(next)
            Iterator(StateChange(shardId, id, next.logIndex, next.present))
          }
      }
  }
}
