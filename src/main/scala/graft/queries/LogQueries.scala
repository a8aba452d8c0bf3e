package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.VectorFunctions._
import graft.operators.MutationLog
import graft.sources.Tables

/** Mutation-log replay (O-4/O-5/O-9/O-12) under the driver's oracle.
  *
  * A deterministic synthetic log is derived from `embeddings` in BOTH
  * engines:
  *   1. every vector upserted into `shard_<vec_id % 4>` at log_index vec_id;
  *   2. every 7th vector re-upserted into the NEXT shard at +10000 —
  *      exercising the reference quirk that a re-upsert into a different
  *      shard leaves the old entry alive (`src/index/vector_shard.cc:46-57`
  *      acts per shard);
  *   3. every 5th vector deleted from its original shard at +20000.
  *
  * `log_replay` reads the full prefix (STRONG); `log_replay_stale` reads
  * the prefix at commit 9999 (BOUNDED_STALENESS serving the pre-move
  * state — O-12's "which prefix" semantics).
  */
object LogQueries extends QueryPack {

  /** The synthetic log (Spark side). */
  def syntheticLog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val base = e.select(
      $"vec_id".as("log_index"), lit(MutationLog.Upsert).as("op"),
      $"vec_id".as("id"),
      concat(lit("shard_"), ($"vec_id" % 4).cast("string")).as("shard_id"),
      $"embedding")
    val moves = e.filter($"vec_id" % 7 === 0).select(
      ($"vec_id" + 10000).as("log_index"), lit(MutationLog.Upsert).as("op"),
      $"vec_id".as("id"),
      concat(lit("shard_"), (($"vec_id" + 1) % 4).cast("string")).as("shard_id"),
      $"embedding")
    val dels = e.filter($"vec_id" % 5 === 0).select(
      ($"vec_id" + 20000).as("log_index"), lit(MutationLog.Delete).as("op"),
      $"vec_id".as("id"),
      concat(lit("shard_"), ($"vec_id" % 4).cast("string")).as("shard_id"),
      lit(null).cast(ArrayType(FloatType)).as("embedding"))
    base.unionByName(moves).unionByName(dels)
  }

  private def replayAt(s: SparkSession, dir: String, commit: Long): DataFrame = {
    import s.implicits._
    MutationLog.replay(syntheticLog(s, dir), commit)
      .select($"shard_id", $"id", $"log_index",
        round(l2norm($"embedding"), 4).as("norm"))
      .orderBy($"shard_id", $"id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "log_replay" -> ((s, dir) => replayAt(s, dir, Long.MaxValue)),
    "log_replay_stale" -> ((s, dir) => replayAt(s, dir, 9999L)),

    // Snapshot DIFF between two log prefixes (the ops view of O-9/O-12:
    // "what changed between the state I served yesterday and now") —
    // full outer join of the two LWW states on the natural key, so at
    // scale it is one co-partitioned shuffle join; rows classify as
    // added (new shard entries from re-upsert moves), removed
    // (deletes), or updated (same key, newer winning log_index).
    "log_diff" -> ((s, dir) => {
      import s.implicits._
      val a = MutationLog.replay(syntheticLog(s, dir), 9999L)
        .select($"shard_id", $"id", $"log_index".as("li_old"))
      val b = MutationLog.replay(syntheticLog(s, dir), Long.MaxValue)
        .select($"shard_id", $"id", $"log_index".as("li_new"))
      a.join(b, Seq("shard_id", "id"), "full_outer")
        .filter($"li_old".isNull || $"li_new".isNull || $"li_old" =!= $"li_new")
        .select($"shard_id", $"id",
          when($"li_old".isNull, "added")
            .when($"li_new".isNull, "removed")
            .otherwise("updated").as("change"),
          coalesce($"li_old", lit(-1L)).as("li_old"),
          coalesce($"li_new", lit(-1L)).as("li_new"))
        .orderBy($"shard_id", $"id")
    }),

    // Oracle-level compaction proof: replaying compact(log, 9999) must
    // equal replaying the raw log — the oracle runs the RAW replay, so a
    // hash match IS the equivalence (compaction invisible to readers,
    // SURVEY.md §7 risk 3).
    "log_compacted" -> ((s, dir) => {
      import s.implicits._
      MutationLog.replay(MutationLog.compact(syntheticLog(s, dir), 9999L))
        .select($"shard_id", $"id", $"log_index",
          round(l2norm($"embedding"), 4).as("norm"))
        .orderBy($"shard_id", $"id")
    })
  )

  private val duckLog: String =
    s"""log AS (
       |  SELECT vec_id AS log_index, 'UPSERT' AS op, vec_id AS id,
       |         'shard_' || (vec_id % 4) AS shard_id, embedding
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000, 'UPSERT', vec_id,
       |         'shard_' || ((vec_id + 1) % 4), embedding
       |  FROM embeddings WHERE vec_id % 7 = 0
       |  UNION ALL
       |  SELECT vec_id + 20000, 'DELETE', vec_id,
       |         'shard_' || (vec_id % 4), NULL
       |  FROM embeddings WHERE vec_id % 5 = 0
       |)""".stripMargin

  private def duckReplay(commit: String): String =
    s"""WITH $duckLog, state AS (
       |  SELECT *, row_number() OVER (PARTITION BY shard_id, id
       |                               ORDER BY log_index DESC) AS rn
       |  FROM log WHERE log_index <= $commit
       |)
       |SELECT shard_id, id, log_index,
       |       round(sqrt(${VectorQueries.duckDot("embedding", "embedding")}), 4) AS norm
       |FROM state WHERE rn = 1 AND op = 'UPSERT'
       |ORDER BY shard_id, id""".stripMargin

  private def duckState(name: String, commit: String): String =
    s"""$name AS (
       |  SELECT shard_id, id, log_index FROM (
       |    SELECT *, row_number() OVER (PARTITION BY shard_id, id
       |                                 ORDER BY log_index DESC) AS rn
       |    FROM log WHERE log_index <= $commit)
       |  WHERE rn = 1 AND op = 'UPSERT'
       |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "log_replay" -> duckReplay("9223372036854775807"),
    "log_replay_stale" -> duckReplay("9999"),
    // raw replay — matching it proves compact() is reader-invisible
    "log_compacted" -> duckReplay("9223372036854775807"),

    "log_diff" ->
      s"""WITH $duckLog,
         |${duckState("sa", "9999")},
         |${duckState("sb", "9223372036854775807")}
         |SELECT coalesce(sa.shard_id, sb.shard_id) AS shard_id,
         |  coalesce(sa.id, sb.id) AS id,
         |  CASE WHEN sa.id IS NULL THEN 'added'
         |       WHEN sb.id IS NULL THEN 'removed'
         |       ELSE 'updated' END AS change,
         |  coalesce(sa.log_index, -1) AS li_old,
         |  coalesce(sb.log_index, -1) AS li_new
         |FROM sa FULL JOIN sb
         |  ON sa.shard_id = sb.shard_id AND sa.id = sb.id
         |WHERE sa.id IS NULL OR sb.id IS NULL OR sa.log_index <> sb.log_index
         |ORDER BY shard_id, id""".stripMargin
  )
}
