package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Relational surface over the TPC-H-ish star schema: aggregation, joins
  * (broadcast + shuffled, semi/anti/outer), window functions, rollup,
  * set operations, scalar string/date/math functions.
  *
  * The reference has none of these (SURVEY.md §2 Table B) — this is the
  * engine surface mandated by the north star + DuckDB oracle.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer) are
  * broadcast — at 100 TB the fact tables (lineitem/orders) shuffle only
  * when the join key demands it, and aggregations are partial (map-side)
  * by construction with `groupBy().agg()`. Filters sit directly on the
  * scans so parquet predicate pushdown + column pruning apply.
  */
object RelationalQueries extends QueryPack {

  /** Exact decimal view of a known-2-decimal double column. */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  /** revenue term ep*(1-disc), exact decimal */
  private def discPrice(ep: Column, disc: Column): Column =
    dec2(ep) * (one - disc.cast(DecimalType(3, 2)))

  /** DuckDB fragments mirroring the above exactly. */
  private val duckDisc =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val duckCharge =
    s"$duckDisc * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-style pricing summary: partial (map-side) hash agg on a
    // low-cardinality key — at 100 TB this reduces each partition to
    // ~6 groups before any shuffle.
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
          sum(discPrice($"l_extendedprice", $"l_discount")
            * (one + $"l_tax".cast(DecimalType(3, 2)))).cast("double").as("sum_charge"),
          (sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec2($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // RFM segmentation (classic CRM scoring): per-customer recency /
    // frequency / monetary quartiles with EXACT ntile semantics under
    // TOTAL orders (metric, custkey) — but NO global window anywhere in
    // the plan (VERDICT r8 "What's wrong #1": three `ntile(4) OVER
    // (ORDER BY …)` funneled every customer through one task per
    // window). Each quartile = the distributed prefix-scan rank
    // (Rank.withGlobalRank — range repartition, partition-local
    // windows, cluster-bounded offsets) + integer ntile arithmetic from
    // (rank, n); the DuckDB oracle keeps the ntile form as the spec, so
    // hash-green here proves the window-free plan is bit-identical.
    // Monetary sums go through exact decimals.
    "customer_rfm" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Rank
      val byCust = Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(max($"o_orderdate").as("last_order"),
          count(lit(1)).as("frequency"),
          sum(dec2($"o_totalprice")).cast("double").as("monetary"))
        .persist()
      val n = byCust.agg(count(lit(1)).as("__n"))
      // r20 consolidation (VERDICT r19 next #5): the three ranks CHAIN —
      // each withGlobalRank carries the previous rank columns through
      // its own range shuffle — so the three (custkey, rank) join-backs
      // the old shape paid (three broadcast builds + three join stages
      // re-reading byCust) disappear from the plan. A rank is a pure
      // function of the TOTAL key order (partitioning-invariant by the
      // cpu4-vs-cpu32 gate), so chaining cannot change any value; the
      // extra two long columns riding the second/third range shuffles
      // are narrower than the join traffic they replace at any scale.
      val ranked = Rank.withGlobalRank(
        Rank.withGlobalRank(
          Rank.withGlobalRank(byCust, "__rr", $"last_order", $"o_custkey"),
          "__fr", $"frequency", $"o_custkey"),
        "__mr", $"monetary", $"o_custkey")
      ranked
        .crossJoin(broadcast(n))
        .select($"o_custkey", $"frequency", $"monetary",
          Rank.ntileFromRank($"__rr", $"__n", 4).as("r_q"),
          Rank.ntileFromRank($"__fr", $"__n", 4).as("f_q"),
          Rank.ntileFromRank($"__mr", $"__n", 4).as("m_q"))
        .withColumn("segment", $"r_q" * 100 + $"f_q" * 10 + $"m_q")
        .orderBy($"o_custkey")
    }),

    // TPC-H Q3-style: two fact joins + small filtered dim broadcast;
    // revenue top-10 per order.
    "q3_join" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter($"o_orderdate" < lit("1998-06-30").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter($"l_shipdate" > lit("1998-06-30").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
        // timestamp outputs leave the engine as NTZ so the oracle (whose
        // TIMESTAMP is timezone-less) reads bit-identical values
        .select($"o_orderkey", $"o_orderdate".cast("timestamp_ntz").as("o_orderdate"), $"revenue")
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // TPC-H Q5-style: 6-way join, all dims broadcast, revenue by nation.
    "q5_join" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, dir)),
          $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Per-customer top-3 orders by price: window row_number (the same
    // primitive that powers batch k-NN and log replay).
    "window_topn" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).cast("long").as("rn"))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    }),

    // Running/leading frames: cumulative spend + previous order price.
    "window_running" -> ((s, dir) => {
      import s.implicits._
      val ord = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          sum(dec2($"o_totalprice")).over(cum).cast("double").as("running_spend"),
          lag($"o_totalprice", 1).over(ord).as("prev_price"),
          lead($"o_totalprice", 1).over(ord).as("next_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ROLLUP hierarchy totals; grouping-null markers coalesced to 'ALL'
    // so both engines order identically (null-order portability).
    "rollup_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2($"l_quantity")).cast("double").as("qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"n", $"qty")
        .orderBy($"rf", $"ls")
    }),

    // UNION / INTERSECT / EXCEPT (distinct set semantics on both sides).
    "set_ops" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      val building = cust.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val rich = cust.filter($"c_acctbal" > 5000).select($"c_custkey")
      val bigSpenders = ord.filter($"o_totalprice" > 100000)
        .select($"o_custkey".as("c_custkey"))
      val frozen = ord.filter($"o_orderstatus" === "F" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("c_custkey"))
      building.union(rich).distinct()
        .intersect(bigSpenders)
        .except(frozen)
        .orderBy($"c_custkey")
    }),

    // Semi join: customers having at least one >400k order.
    "join_semi" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.orders(s, dir).filter($"o_totalprice" > 400000)
      Tables.customer(s, dir)
        .join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    // Anti join: customers with no order above 490k.
    "join_anti" -> ((s, dir) => {
      import s.implicits._
      val huge = Tables.orders(s, dir).filter($"o_totalprice" > 490000)
      Tables.customer(s, dir)
        .join(huge, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Left outer join + agg: customer count per nation, zeros preserved.
    "join_outer" -> ((s, dir) => {
      import s.implicits._
      Tables.nation(s, dir)
        .join(Tables.customer(s, dir), $"c_nationkey" === $"n_nationkey", "left_outer")
        .groupBy($"n_name")
        .agg(count($"c_custkey").as("n_cust"),
          sum(dec2($"c_acctbal")).cast("double").as("total_bal"))
        .orderBy($"n_name")
    }),

    // Scalar string/math function salad over part.
    "scalar_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .select($"p_partkey",
          upper($"p_brand").as("brand_u"),
          substring($"p_name", 1, 5).as("name5"),
          length($"p_name").cast("long").as("name_len"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
          abs($"p_retailprice" - 1000.0).as("price_diff"),
          ($"p_size" % 5).cast("long").as("size_mod"),
          greatest($"p_size", lit(25)).cast("long").as("gsize"))
        .orderBy($"p_partkey")
    }),

    // Date/time functions over orders.
    "date_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("d"),
          date_trunc("month", $"o_orderdate").cast("timestamp_ntz").as("month_start"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).cast("timestamp_ntz").as("due_date"),
          datediff(lit("2002-01-01").cast("date"), $"o_orderdate").cast("long").as("age_days"))
        .orderBy($"o_orderkey")
    })
  )

  def oracle: Map[String, String] = Map(

    "customer_rfm" ->
      """SELECT o_custkey, frequency, monetary, r_q, f_q, m_q,
        |  CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment
        |FROM (
        |  SELECT o_custkey, frequency, monetary,
        |    CAST(ntile(4) OVER (ORDER BY last_order, o_custkey) AS BIGINT) AS r_q,
        |    CAST(ntile(4) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_q,
        |    CAST(ntile(4) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_q
        |  FROM (
        |    SELECT o_custkey, max(o_orderdate) AS last_order,
        |      CAST(count(*) AS BIGINT) AS frequency,
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
        |    FROM orders GROUP BY o_custkey
        |  )
        |)
        |ORDER BY o_custkey""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($duckDisc) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($duckCharge) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      s"""SELECT o_orderkey, o_orderdate, CAST(sum($duckDisc) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-30'
         |  AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,

    "q5_join" ->
      s"""SELECT n_name, CAST(sum($duckDisc) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "window_topn" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  lag(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "set_ops" ->
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  INTERSECT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
        |  EXCEPT
        |  SELECT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderstatus = 'F' AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 490000)
        |ORDER BY c_custkey""".stripMargin,

    "join_outer" ->
      """SELECT n_name, count(c_custkey) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "scalar_fns" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 5) AS name5,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  abs(p_retailprice - 1000.0) AS price_diff,
        |  CAST(p_size % 5 AS BIGINT) AS size_mod,
        |  CAST(greatest(p_size, 25) AS BIGINT) AS gsize
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "date_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS age_days
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
  )
}
