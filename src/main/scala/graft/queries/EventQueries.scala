package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Analytics over the `events` table: JSON extraction, time bucketing,
  * distinct counting — the batch shape of the streaming surface
  * (graft.streaming gives the same queries their incremental form).
  */
object EventQueries extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON scalar extraction + filtered agg. get_json_object is
    // codegen'd; at scale the props column is pruned unless referenced.
    "events_json" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .filter($"k" > 50)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          sum(dec2($"value")).cast("double").as("sum_value"))
        .orderBy($"event_type")
    }),

    // Hourly tumbling-window rollup (batch form of the streaming agg):
    // date_trunc bucketing + exact distinct users.
    "events_hourly" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("users"),
          sum(dec2($"value")).cast("double").as("revenue"))
        .orderBy($"hour", $"event_type")
    }),

    // Per-user session stats: event counts, purchase ratio, value span —
    // groupBy on user_id (the natural partitioning key for this table).
    "events_user_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          count(when($"event_type" === "purchase", 1)).as("n_purchases"),
          min($"ts").as("first_ts"),
          max($"ts").as("last_ts"),
          sum(dec2($"value")).cast("double").as("total_value"))
        .filter($"n_events" >= 5)
        .orderBy($"user_id")
    })
  )

  def oracle: Map[String, String] = Map(

    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |WHERE k > 50
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases,
        |  min(ts) AS first_ts, max(ts) AS last_ts,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY user_id
        |HAVING count(*) >= 5
        |ORDER BY user_id""".stripMargin
  )
}
