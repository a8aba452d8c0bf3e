package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Advanced relational surface: CUBE, exact percentiles, statistical
  * aggregates (computed from exact decimal moments so aggregation order
  * cannot perturb them), as-of join, pivot, gaps-and-islands
  * sessionization, and extended string functions.
  */
object AdvancedQueries extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(20, 4))

  import graft.queries.DuckSql.dHash32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CUBE over two dims (all 2^2 grouping combinations).
    "cube_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2($"o_totalprice")).cast("double").as("total"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("st"),
          coalesce($"o_orderpriority", lit("ALL")).as("prio"),
          $"n", $"total")
        .orderBy($"st", $"prio")
    }),

    // Quantile SKETCH: exact percentiles over a deterministic fixed-
    // size uniform sample (the 2000 smallest rows by hash32 of the
    // primary key — a bottom-k-by-hash sample, the distributed cousin
    // of KMV). The sample side is TakeOrderedAndProject: per-partition
    // s-row heaps + one s-row merge, state bounded by CONFIG — the
    // 100 TB quantile path. The full-table exact percentiles ride
    // along as the honesty columns (like kmv_est vs n_exact); at
    // production scale you keep only the sample estimate.
    "sample_quantiles" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select(
        $"l_extendedprice".as("x"),
        graft.functions.TextFunctions.hash32(
          concat_ws(":", $"l_orderkey", $"l_linenumber")).as("h"),
        $"l_orderkey", $"l_linenumber")
      val samp = li.orderBy($"h", $"l_orderkey", $"l_linenumber").limit(2000)
      val est = samp.agg(
        round(expr("percentile(x, 0.1)"), 4).as("est_p10"),
        round(expr("percentile(x, 0.5)"), 4).as("est_p50"),
        round(expr("percentile(x, 0.9)"), 4).as("est_p90"),
        round(expr("percentile(x, 0.99)"), 4).as("est_p99"))
      val exact = li.agg(
        round(expr("percentile(x, 0.1)"), 4).as("exact_p10"),
        round(expr("percentile(x, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(x, 0.9)"), 4).as("exact_p90"),
        round(expr("percentile(x, 0.99)"), 4).as("exact_p99"))
      est.crossJoin(exact)
    }),

    // Exact percentiles (linear interpolation) per order status.
    "percentiles" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy($"o_orderstatus")
    }),

    // Statistical aggregates from EXACT decimal moments: stddev and
    // corr recomposed from sum(x), sum(x²), sum(xy) — order-insensitive
    // by construction, unlike naive float stddev/corr.
    "stats_agg" -> ((s, dir) => {
      import s.implicits._
      val q = dec2($"l_quantity")
      val p = dec2($"l_extendedprice")
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sx2"),
          sum(p).cast("double").as("sy"),
          sum(dec4(p * p)).cast("double").as("sy2"),
          sum(q * p).cast("double").as("sxy"))
        .select($"l_returnflag", $"n",
          round(sqrt(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6).as("stddev_qty"),
          round((($"sxy" - $"sx" * $"sy" / $"n") /
            (sqrt($"sx2" - $"sx" * $"sx" / $"n") * sqrt($"sy2" - $"sy" * $"sy" / $"n"))), 6)
            .as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }),

    // As-of join: each purchase matched to the user's most recent
    // earlier view (union-free window form — one shuffle on user_id, no
    // range-join explosion; the scalable as-of pattern).
    "asof_join" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("last_view",
          max(when($"event_type" === "view", $"ts")).over(w))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts".as("purchase_ts"), $"last_view")
        .orderBy($"user_id", $"event_id")
    }),

    // The AsOfJoin OPERATOR under the oracle: purchases ⟕ most recent
    // view at-or-before, per user (the operator's union-trick plan vs the
    // oracle's window formulation — same semantics, value-checked).
    "asof_op" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts".as("purchase_ts"), $"value".as("amount"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts".as("view_ts"))
      graft.operators.AsOfJoin.joinAsOf(
          purchases, views, Seq("user_id"), "purchase_ts", "view_ts", Seq("view_ts"))
        .select($"user_id", $"event_id", $"purchase_ts", $"view_ts".as("last_view"))
        .orderBy($"user_id", $"event_id")
    }),

    // Ranking-function breadth: ntile/percent_rank/cume_dist + frame
    // first/last over order prices per status.
    "window_fns2" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first($"o_totalprice").over(frame).as("min_price"),
          last($"o_totalprice").over(frame).as("max_price"))
        .orderBy($"o_orderkey")
    }),

    // Pivot: daily event counts, one column per event type.
    "pivot_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(to_date($"ts").as("day"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select($"day",
          coalesce($"view", lit(0L)).as("n_view"),
          coalesce($"click", lit(0L)).as("n_click"),
          coalesce($"purchase", lit(0L)).as("n_purchase"),
          coalesce($"signup", lit(0L)).as("n_signup"),
          coalesce($"error", lit(0L)).as("n_error"))
        .orderBy($"day")
    }),

    // Gaps-and-islands sessionization (batch form of session windows):
    // new session when >30 min since the user's previous event.
    "events_sessions" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev", lag($"ts", 1).over(byUser))
        .withColumn("new_s",
          when($"prev".isNull ||
            unix_timestamp($"ts".cast("timestamp")) -
              unix_timestamp($"prev".cast("timestamp")) > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_s").over(cum))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"),
          max($"ts").as("session_end"))
        .orderBy($"user_id", $"session_id")
    }),

    // Forward as-of (pandas merge_asof direction='forward'): for each
    // purchase, the NEXT view at-or-after it per user — the mirror of
    // asof_op through the same single-shuffle union-trick plan, checked
    // against the oracle's following-frame window formulation.
    "asof_forward" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts".as("purchase_ts"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts".as("view_ts"))
      graft.operators.AsOfJoin.joinAsOfForward(
          purchases, views, Seq("user_id"), "purchase_ts", "view_ts", Seq("view_ts"))
        .select($"user_id", $"event_id", $"purchase_ts", $"view_ts".as("next_view"))
        .orderBy($"user_id", $"event_id")
    }),

    // Value-based RANGE window frame (the one frame kind rowsBetween
    // cannot express): per user, the trailing-10-minute event-value sum
    // ordered by epoch seconds. RANGE includes ALL peers of the current
    // ordering value, so equal-timestamp rows get identical sums no
    // matter how they arrive — deterministic where a ROWS frame is not;
    // decimal arithmetic keeps the sliding sum order-free in both
    // engines.
    "window_range" -> ((s, dir) => {
      import s.implicits._
      val sec = unix_timestamp($"ts".cast("timestamp"))
      val w = Window.partitionBy($"user_id").orderBy(sec)
        .rangeBetween(-600, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("trail_10m",
          sum($"value".cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .over(w).cast("double"))
        .select($"event_id", $"user_id", $"trail_10m")
        .orderBy($"event_id")
    }),

    // GROUPING SETS via the SQL surface (engine registers the table and
    // runs pure SQL — the DataFrame and SQL forms share one Catalyst).
    "grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |       coalesce(l_linestatus, 'ALL') AS ls,
          |       count(1) AS n,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY rf, ls""".stripMargin)
    }),

    // Extended string functions over part.
    "string_fns2" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .select($"p_partkey",
          regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
          translate($"p_brand", "B#", "b-").as("brand_t"),
          lpad($"p_partkey".cast("string"), 8, "0").as("key_pad"),
          expr("split_part(p_type, ' ', 1)").as("type_head"),
          levenshtein($"p_brand", $"p_type").cast("long").as("lev"),
          reverse($"p_brand").as("brand_rev"),
          repeat(lit("*"), ($"p_size" % 5).cast("int") + 1).as("stars"))
        .orderBy($"p_partkey")
    })
  )

  def oracle: Map[String, String] = Map(

    "cube_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY st, prio""".stripMargin,

    "sample_quantiles" ->
      s"""WITH k AS (
         |  SELECT l_extendedprice AS x,
         |    ${dHash32("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} AS h,
         |    l_orderkey, l_linenumber
         |  FROM lineitem
         |), samp AS (
         |  SELECT x FROM k ORDER BY h, l_orderkey, l_linenumber LIMIT 2000
         |), e AS (
         |  SELECT round(quantile_cont(x, 0.1), 4) AS est_p10,
         |         round(quantile_cont(x, 0.5), 4) AS est_p50,
         |         round(quantile_cont(x, 0.9), 4) AS est_p90,
         |         round(quantile_cont(x, 0.99), 4) AS est_p99
         |  FROM samp
         |), f AS (
         |  SELECT round(quantile_cont(x, 0.1), 4) AS exact_p10,
         |         round(quantile_cont(x, 0.5), 4) AS exact_p50,
         |         round(quantile_cont(x, 0.9), 4) AS exact_p90,
         |         round(quantile_cont(x, 0.99), 4) AS exact_p99
         |  FROM k
         |)
         |SELECT * FROM e CROSS JOIN f""".stripMargin,

    "percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(20,4))) AS DOUBLE) AS sy2,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  round(sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
        |  round((sxy - sx * sy / n) /
        |        (sqrt(sx2 - sx * sx / n) * sqrt(sy2 - sy * sy / n)), 6) AS corr_qty_price
        |FROM m
        |ORDER BY l_returnflag""".stripMargin,

    "asof_join" ->
      """SELECT user_id, event_id, ts AS purchase_ts, last_view FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    max(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    "asof_op" ->
      """SELECT user_id, event_id, ts AS purchase_ts, last_view FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    max(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
        |  FROM events WHERE event_type IN ('purchase', 'view'))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    "window_fns2" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  first_value(o_totalprice) OVER wf AS min_price,
        |  last_value(o_totalprice) OVER wf AS max_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
        |       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "pivot_agg" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,

    "events_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |                   OR date_diff('second', prev, ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), g AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM g
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "asof_forward" ->
      """SELECT user_id, event_id, purchase_ts, next_view FROM (
        |  SELECT user_id, event_id, ts AS purchase_ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_view
        |  FROM events
        |) WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    // epoch seconds via date_diff from the epoch origin — the same
    // truncation unix_timestamp applies (duck's epoch() is a fractional
    // DOUBLE whose cast would round, not truncate)
    "window_range" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
        |    PARTITION BY user_id
        |    ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_10m
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin,

    "string_fns2" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  translate(p_brand, 'B#', 'b-') AS brand_t,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
        |  reverse(p_brand) AS brand_rev,
        |  repeat('*', p_size % 5 + 1) AS stars
        |FROM part
        |ORDER BY p_partkey""".stripMargin
  )
}
