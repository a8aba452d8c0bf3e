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

  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesExtra ++ Map(

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

    // Map-typed columns end to end: build a per-user event_type→count
    // MAP (array_sort before map_from_entries pins entry order), then
    // read it back through the map surface — size, key membership,
    // element_at, transform_values + map_values folded to a scalar. The
    // map stays engine-internal; outputs are plain columns, so the
    // oracle replays the arithmetic without needing map parity.
    "map_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        // map keys must be non-null in Spark (map_from_entries throws)
        // while a plain GROUP BY tolerates them — filter on BOTH sides
        // so the contract is explicit, not an accident of the data
        .filter($"event_type".isNotNull)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct($"event_type", $"n")))).as("m"))
        .select($"user_id",
          size($"m").cast("long").as("n_types"),
          map_contains_key($"m", "purchase").as("has_purchase"),
          coalesce(element_at($"m", "view"), lit(0L)).as("n_view"),
          aggregate(map_values(transform_values($"m", (_, v) => v * 2)),
            lit(0L), _ + _).as("dbl_total"))
        .orderBy($"user_id")
    }),

    // Hourly tumbling-window rollup (batch form of the streaming agg):
    // date_trunc bucketing + exact distinct users.
    "events_hourly" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", $"ts").cast("timestamp_ntz").as("hour"), $"event_type")
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
    }),

    // Cohort retention matrix: users grouped by first-activity week
    // (ISO Monday truncation), counted distinct per week offset — the
    // standard product-analytics grid. Two natural shuffles (per-user
    // min on user_id; the cohort/offset count) and one equi-join back
    // on user_id — co-partitioned with the table's natural key at any
    // scale. All integers/dates.
    "events_cohorts" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val firstWeek = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cohort_ts"))
      ev.join(firstWeek, "user_id")
        .select($"user_id", $"cohort_ts",
          (datediff(date_trunc("week", $"ts"), $"cohort_ts") / 7)
            .cast("long").as("week_offset"))
        .groupBy($"cohort_ts", $"week_offset")
        .agg(countDistinct($"user_id").as("n_users"))
        .select($"cohort_ts".cast("date").as("cohort"), $"week_offset", $"n_users")
        .orderBy($"cohort", $"week_offset")
    })
  )

  def queriesExtra: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Conversion funnel: users whose first view precedes their first
    // click, which precedes their first purchase (order-sensitive).
    "events_funnel" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts")).as("first_view"),
          min(when($"event_type" === "click", $"ts")).as("first_click"),
          min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
        .withColumn("converted",
          $"first_view" < $"first_click" && $"first_click" < $"first_purchase")
        .filter($"converted")
        .select($"user_id", $"first_view", $"first_click", $"first_purchase")
        .orderBy($"user_id")
    }),

    // Week-over-week retention: users active in week 1 who return in
    // week 2 (self semi-join on time buckets), with per-type breakdown.
    // Sequential TIME-WINDOWED funnel — the strict ordered form next
    // to events_funnel's first-A-before-first-B: stage 1 = first view,
    // stage 2 = first click STRICTLY after it within 1 h, stage 3 =
    // first purchase strictly after that click within 1 h (greedy
    // earliest-completion — deterministic, and each stage anchors on
    // the previous stage's chosen event, not on any event). Integer
    // epoch seconds on both engines (duck's epoch() is fractional —
    // the date_diff truncation protocol). One row per reached stage
    // with user counts; stage 0 = users with events but no view.
    "events_funnel_seq" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id", $"event_type",
          unix_timestamp($"ts".cast("timestamp")).as("es"))
      val users = ev.select($"user_id").distinct()
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"es").as("v"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id")
        .filter($"es" > $"v" && $"es" <= $"v" + 3600L)
        .groupBy($"user_id").agg(min($"es").as("c"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id")
        .filter($"es" > $"c" && $"es" <= $"c" + 3600L)
        .groupBy($"user_id").agg(min($"es").as("p"))
      users
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id",
          when($"p".isNotNull, 3L).when($"c".isNotNull, 2L)
            .when($"v".isNotNull, 1L).otherwise(0L).as("stage"))
        .groupBy($"stage").agg(count(lit(1)).as("n_users"))
        .orderBy($"stage")
    }),

    "events_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val w1 = ev.filter($"ts" < lit("2024-01-08").cast("timestamp_ntz"))
        .select($"user_id").distinct()
      val w2 = ev.filter($"ts" >= lit("2024-01-08").cast("timestamp_ntz") &&
          $"ts" < lit("2024-01-15").cast("timestamp_ntz"))
        .select($"user_id").distinct()
      val retained = w1.join(w2, Seq("user_id"), "left_semi")
      ev.join(retained, Seq("user_id"), "left_semi")
        .filter($"ts" >= lit("2024-01-08").cast("timestamp_ntz") &&
          $"ts" < lit("2024-01-15").cast("timestamp_ntz"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_retained_users"))
        .orderBy($"event_type")
    }),

    // Anomaly detection: per-type z-scores from EXACT decimal moments
    // (order-insensitive mean/std), flagging |z| > 2.5 events.
    "events_zscore" -> ((s, dir) => {
      import s.implicits._
      val dec = $"value".cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val moments = Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec).cast("double").as("sx"),
          sum(dec * dec).cast("double").as("sx2"))
        .select($"event_type",
          ($"sx" / $"n").as("mean"),
          sqrt(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1)).as("sd"))
      Tables.events(s, dir)
        .join(broadcast(moments), "event_type")
        .withColumn("z", ($"value" - $"mean") / $"sd")
        .filter(abs($"z") > 2.5)
        .select($"event_id", $"event_type", $"value", round($"z", 6).as("z"))
        .orderBy($"event_id")
    }),

    // Boolean aggregates + conditional counting per status.
    "bool_aggs" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          bool_and($"o_totalprice" > 1000).as("all_over_1k"),
          bool_or($"o_totalprice" > 400000).as("any_over_400k"),
          count_if($"o_totalprice" > 300000).as("n_over_300k"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }),

    // Z-order (Morton) key over (user_id, intraday minute) — the
    // multi-dimensional clustering key for data-skipping layouts
    // (ZOrder.layoutBy; row-group pruning measured in ZOrderSpec).
    // Exact integer bit interleave, value-checked per event.
    "zorder_key" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id",
          graft.operators.ZOrder.zvalue(
            $"user_id", hour($"ts") * 60 + minute($"ts"), bits = 11)
            .as("zkey"))
        .orderBy($"event_id")
    })
  )

  def oracle: Map[String, String] = Map(

    // mirrors ZOrder.zvalue: 11-bit masked interleave, bit i of a at
    // position 2i, bit i of b at 2i+1, exact BIGINT shifts
    "zorder_key" ->
      """SELECT event_id,
        |  CAST(list_sum(list_transform(range(0, 11), i ->
        |    (((a >> CAST(i AS INT)) & 1) << CAST(2*i AS INT)) +
        |    (((b >> CAST(i AS INT)) & 1) << CAST(2*i + 1 AS INT))))
        |    AS BIGINT) AS zkey
        |FROM (
        |  SELECT event_id,
        |    user_id & 2047 AS a,
        |    (CAST(extract(hour FROM ts) AS BIGINT) * 60 +
        |     CAST(extract(minute FROM ts) AS BIGINT)) & 2047 AS b
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    "events_funnel" ->
      """SELECT user_id, first_view, first_click, first_purchase FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY user_id)
        |WHERE first_view < first_click AND first_click < first_purchase
        |ORDER BY user_id""".stripMargin,

    "events_funnel_seq" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es
        |  FROM events
        |), v AS (
        |  SELECT user_id, min(es) AS v FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.es) AS c
        |  FROM ev e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.es > v.v AND e.es <= v.v + 3600
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.es) AS p
        |  FROM ev e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.es > c.c AND e.es <= c.c + 3600
        |  GROUP BY e.user_id
        |)
        |SELECT stage, CAST(count(*) AS BIGINT) AS n_users FROM (
        |  SELECT u.user_id,
        |    CAST(CASE WHEN p.p IS NOT NULL THEN 3
        |              WHEN c.c IS NOT NULL THEN 2
        |              WHEN v.v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |  FROM (SELECT DISTINCT user_id FROM ev) u
        |  LEFT JOIN v ON v.user_id = u.user_id
        |  LEFT JOIN c ON c.user_id = u.user_id
        |  LEFT JOIN p ON p.user_id = u.user_id
        |)
        |GROUP BY stage
        |ORDER BY stage""".stripMargin,

    "events_retention" ->
      """WITH w1 AS (
        |  SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08'
        |), w2 AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |), retained AS (
        |  SELECT user_id FROM w1 WHERE user_id IN (SELECT user_id FROM w2)
        |)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_retained_users
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM retained)
        |  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "events_zscore" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx2
        |  FROM events GROUP BY event_type
        |), mm AS (
        |  SELECT event_type, sx / n AS mean,
        |         sqrt((sx2 - sx * sx / n) / (n - 1)) AS sd
        |  FROM m
        |)
        |SELECT event_id, e.event_type, value,
        |       round((value - mean) / sd, 6) AS z
        |FROM events e JOIN mm ON e.event_type = mm.event_type
        |WHERE abs((value - mean) / sd) > 2.5
        |ORDER BY event_id""".stripMargin,

    "bool_aggs" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_over_300k,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // replays the map reads as plain grouped arithmetic over the same
    // per-(user, type) counts the map was built from
    "map_fns" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY user_id, event_type
        |)
        |SELECT user_id,
        |  count(*) AS n_types,
        |  bool_or(event_type = 'purchase') AS has_purchase,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN n END), 0) AS BIGINT) AS n_view,
        |  CAST(sum(2 * n) AS BIGINT) AS dbl_total
        |FROM c GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

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
        |ORDER BY user_id""".stripMargin,

    // both sides week-truncate to Mondays, so the day diff is an exact
    // multiple of 7 — the /7 division is exact in either engine
    "events_cohorts" ->
      """WITH fw AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
        |  FROM events GROUP BY user_id
        |), j AS (
        |  SELECT e.user_id, fw.cohort_ts,
        |    CAST(date_diff('day', fw.cohort_ts, date_trunc('week', e.ts)) / 7
        |      AS BIGINT) AS week_offset
        |  FROM events e JOIN fw USING (user_id)
        |)
        |SELECT CAST(cohort_ts AS DATE) AS cohort, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY cohort_ts, week_offset
        |ORDER BY cohort, week_offset""".stripMargin
  )
}
