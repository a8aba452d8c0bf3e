package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables
import graft.queries.VectorQueries.duckL2sq

/** Remaining SQL-surface breadth: array functions (scalar outputs),
  * null-handling functions, bag-semantics set ops, correlated/scalar
  * subqueries, inequality (theta) joins, and a self-measuring ANN recall
  * query (IVF top-k overlap vs the exact baseline).
  */
object MiscQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Array functions with scalar outputs (element_at, slice, size,
    // array_min/max over computed arrays).
    "array_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select($"vec_id",
          size($"embedding").cast("long").as("dim"),
          round(element_at($"embedding", 1).cast("double"), 6).as("first"),
          round(element_at($"embedding", -1).cast("double"), 6).as("last"),
          round(array_min($"embedding").cast("double"), 6).as("lo"),
          round(array_max($"embedding").cast("double"), 6).as("hi"),
          round(aggregate(slice($"embedding", 1, 8),
            lit(0.0), (a, x) => a + x.cast("double")), 6).as("head8_sum"))
        .orderBy($"vec_id")
    }),

    // Null-handling: coalesce/nullif/nvl chains over generated nulls.
    "null_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .select($"c_custkey",
          when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal").as("bal_pos"))
        .select($"c_custkey",
          coalesce($"bal_pos", lit(0.0)).as("bal_or_zero"),
          $"bal_pos".isNull.as("was_negative"),
          nullif(coalesce($"bal_pos", lit(0.0)), lit(0.0)).as("bal_or_null"))
        .orderBy($"c_custkey")
    }),

    // Bag-semantics set operations (UNION ALL / EXCEPT ALL duplicates).
    "set_ops_all" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.orders(s, dir)
      val a = ord.filter($"o_totalprice" > 300000).select($"o_custkey")
      val b = ord.filter($"o_orderstatus" === "F" && $"o_totalprice" > 300000)
        .select($"o_custkey")
      a.unionAll(a).exceptAll(b)
        .groupBy($"o_custkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy($"o_custkey")
    }),

    // Scalar + correlated subquery: customers above their nation's mean.
    "scalar_subquery" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_sq")
      s.sql(
        """SELECT c_custkey, c_nationkey, c_acctbal
          |FROM cust_sq c
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust_sq i
          |                   WHERE i.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Inequality (theta) join: region pairs ordered by key.
    "theta_join" -> ((s, dir) => {
      import s.implicits._
      val r = Tables.region(s, dir)
      val a = r.select($"r_regionkey".as("k1"), $"r_name".as("n1"))
      val b = r.select($"r_regionkey".as("k2"), $"r_name".as("n2"))
      a.join(b, $"k1" < $"k2")
        .select($"k1".cast("long").as("k1"), $"n1", $"k2".cast("long").as("k2"), $"n2")
        .orderBy($"k1", $"k2")
    }),

    // Banded range join: price histogram via interval membership with NO
    // equality key — the banding rewrite turns a would-be nested-loop
    // join into an equi join on the band (asserted in PlanSpec).
    "range_band" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val bands = s.range(10).select($"id".as("band_id"),
        (lit(900.0) + $"id" * 10.0).as("lo"),
        (lit(909.99) + $"id" * 10.0).as("hi"))
      graft.operators.RangeJoin.banded(
          Tables.part(s, dir), "p_retailprice", bands, "lo", "hi", 10.0)
        .groupBy($"band_id")
        .agg(count(lit(1)).as("n_parts"),
          (sum($"p_retailprice".cast(DecimalType(15, 2))).cast("double") /
            count(lit(1))).as("avg_price"))
        .orderBy($"band_id")
    }),

    // Bit manipulation (exact integer semantics on both engines).
    "bit_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey",
          ($"o_orderkey".bitwiseAND(lit(255L))).as("low8"),
          ($"o_orderkey".bitwiseOR(lit(16L))).as("or16"),
          ($"o_orderkey".bitwiseXOR($"o_custkey")).as("xkey"),
          shiftleft($"o_orderkey", 3).as("shl3"),
          shiftright($"o_orderkey", 2).as("shr2"),
          bit_count($"o_orderkey").cast("long").as("popcnt"))
        .orderBy($"o_orderkey")
    }),

    // Encoding/codec functions: hex, base64, ascii/chr.
    "codec_fns" -> ((s, dir) => {
      import s.implicits._
      Tables.region(s, dir)
        .select($"r_regionkey".cast("long").as("r_regionkey"),
          lower(hex($"r_regionkey" + 1000)).as("key_hex"),
          base64(encode($"r_name", "UTF-8")).as("name_b64"),
          ascii($"r_name").cast("long").as("first_ascii"),
          chr($"r_regionkey" + 65).as("key_chr"))
        .orderBy($"r_regionkey")
    }),

    // Deterministic pagination: ORDER BY + OFFSET/LIMIT.
    "limit_offset" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(100)
        .limit(50)
        .select($"o_orderkey", $"o_totalprice")
    }),

    // EXISTS + NOT IN subquery forms (the TPC-H q4/q16 shapes): order
    // priority counts for orders with at least one returned lineitem,
    // excluding AUTOMOBILE-segment customers. Catalyst plans EXISTS as
    // a left-semi and NOT IN as a null-aware left-anti join — both
    // shuffle-on-key equi joins, no correlated per-row re-execution.
    "exists_in" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("ord_ei")
      Tables.lineitem(s, dir).createOrReplaceTempView("li_ei")
      Tables.customer(s, dir).createOrReplaceTempView("cust_ei")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM ord_ei o
          |WHERE EXISTS (SELECT 1 FROM li_ei l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_returnflag = 'R')
          |  AND o.o_custkey NOT IN (SELECT c_custkey FROM cust_ei
          |                          WHERE c_mktsegment = 'AUTOMOBILE')
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // Correlated LATERAL subquery — the per-row top-N join shape
    // (each customer's 2 most recent orders). Catalyst decorrelates
    // the LIMIT-bearing lateral into a window-rank join; the surface
    // matters because it is the SQL idiom users reach for before
    // window functions.
    "join_lateral" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_lat")
      Tables.orders(s, dir).createOrReplaceTempView("ord_lat")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM cust_lat c, LATERAL (
          |  SELECT o_orderkey, o_totalprice
          |  FROM ord_lat
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_orderdate DESC, o_orderkey
          |  LIMIT 2
          |) o
          |WHERE c.c_mktsegment = 'BUILDING'
          |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
    }),

    // UNPIVOT — the inverse of pivot_agg's columns-from-rows: decimal-
    // exact per-flag measures widen to columns, then melt back to
    // (key, metric, val) rows. The wide→long reshape every metrics
    // export needs; same SQL-standard syntax in both engines.
    "unpivot_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("li_up")
      s.sql(
        """SELECT l_returnflag, metric, val FROM (
          |  SELECT l_returnflag,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
          |    CAST(count(*) AS DOUBLE) AS n_rows
          |  FROM li_up GROUP BY l_returnflag
          |) UNPIVOT (val FOR metric IN (sum_qty, sum_price, n_rows))
          |ORDER BY l_returnflag, metric""".stripMargin)
    }),

    // Self-measuring approximation quality: IVF nprobe=2 recall@10 per
    // query against the exact scan (both computed in-engine).
    "ann_recall" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val exact = graft.operators.Knn.batchTopK(e, q, 10)
        .select($"query_id", $"vec_id")
      val ivf = Ann.search(e, Ann.seedCentroids(e, 8), q, k = 10, nprobe = 2)
        .select($"query_id", $"vec_id")
      exact.join(ivf, Seq("query_id", "vec_id"))
        .groupBy($"query_id")
        .agg((count(lit(1)).cast("double") / 10.0).as("recall_at_10"))
        .orderBy($"query_id")
    }),

    // The nprobe KNOB measured (the ANN mirror of
    // dedup_minhash_tradeoff): one summary row per nprobe against ONE
    // persisted exact top-10 set — total hits and the exact-integer
    // aggregate recall. Recall rises toward 1e6 as probing widens; the
    // table a user reads before trading probe work for recall.
    "ann_recall_tradeoff" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val exact = graft.operators.Knn.batchTopK(e, q, 10)
        .select($"query_id", $"vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val denom = exact.agg(count(lit(1)).as("n_exact"))
      val cents = Ann.seedCentroids(e, 8)
      Seq(1, 2, 4).map { np =>
        val ivf = Ann.search(e, cents, q, k = 10, nprobe = np)
          .select($"query_id", $"vec_id")
        exact.join(ivf, Seq("query_id", "vec_id"))
          .agg(count(lit(1)).as("n_hits"))
          .crossJoin(broadcast(denom))
          .select(lit(np.toLong).as("nprobe"), $"n_hits",
            expr("n_hits * 1000000L div n_exact").as("recall_q"))
      }.reduce(_ unionByName _).orderBy($"nprobe")
    }),

    // Edit-distance similarity self-join (PassJoin, PVLDB 2011): record
    // pair counts per exact Levenshtein distance 0..2 over part names.
    // The Spark side never goes quadratic — collapse to distinct
    // strings, pigeonhole segment index/probe join (recall 1.0 by
    // construction), exact verify on candidates, multiplicity products —
    // while the oracle value-checks it with the quadratic truth.
    "simjoin_edit" -> ((s, dir) => {
      import s.implicits._
      graft.operators.SimJoin.editPairCounts(Tables.part(s, dir), "p_name", k = 2)
        .select($"dist".cast("long").as("dist"), $"pairs")
        .orderBy($"dist")
    })
  )

  def oracle: Map[String, String] = Map(

    "array_fns" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first,
        |  round(CAST(embedding[-1] AS DOUBLE), 6) AS last,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS lo,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS hi,
        |  round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head8_sum
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "null_fns" ->
      """SELECT c_custkey,
        |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero,
        |  (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS was_negative,
        |  nullif(coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0), 0.0) AS bal_or_null
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "set_ops_all" ->
      """SELECT o_custkey, count(*) AS multiplicity FROM (
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |   UNION ALL
        |   SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderstatus = 'F' AND o_totalprice > 300000)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "scalar_subquery" ->
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
        |                   WHERE i.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "theta_join" ->
      """SELECT CAST(a.r_regionkey AS BIGINT) AS k1, a.r_name AS n1,
        |       CAST(b.r_regionkey AS BIGINT) AS k2, b.r_name AS n2
        |FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
        |ORDER BY k1, k2""".stripMargin,

    "range_band" ->
      """WITH bands AS (
        |  SELECT b AS band_id, 900.0 + 10.0 * b AS lo, 909.99 + 10.0 * b AS hi
        |  FROM (SELECT unnest(range(0, 10)) AS b)
        |)
        |SELECT band_id, count(*) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(15,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice <= hi
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin,

    "bit_fns" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low8,
        |  o_orderkey | 16 AS or16,
        |  xor(o_orderkey, o_custkey) AS xkey,
        |  o_orderkey << 3 AS shl3,
        |  o_orderkey >> 2 AS shr2,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "codec_fns" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,
        |  lower(to_hex(r_regionkey + 1000)) AS key_hex,
        |  to_base64(encode(r_name)) AS name_b64,
        |  CAST(ascii(r_name) AS BIGINT) AS first_ascii,
        |  chr(r_regionkey + 65) AS key_chr
        |FROM region
        |ORDER BY r_regionkey""".stripMargin,

    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,

    "exists_in" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |  AND o.o_custkey NOT IN (SELECT c_custkey FROM customer
        |                          WHERE c_mktsegment = 'AUTOMOBILE')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey
        |  LIMIT 2
        |) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin,

    "unpivot_agg" ->
      """SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag
        |) UNPIVOT (val FOR metric IN (sum_qty, sum_price, n_rows))
        |ORDER BY l_returnflag, metric""".stripMargin,

    "ann_recall" -> {
      val duckCentroids =
        "SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8"
      s"""WITH queries AS (
         |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 16
         |), exact AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${duckL2sq("e.embedding", "q.qvec")}, e.vec_id) AS rnk
         |    FROM embeddings e CROSS JOIN queries q
         |  ) WHERE rnk <= 10
         |), assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckL2sq("e.embedding", "c.centroid")}, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN ($duckCentroids) c
         |  ) WHERE rn = 1
         |), probed AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.query_id, q.qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${duckL2sq("q.qvec", "c.centroid")}, c.cell) AS crn
         |    FROM queries q CROSS JOIN ($duckCentroids) c
         |  ) WHERE crn <= 2
         |), ivf AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, e.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY ${duckL2sq("e.embedding", "p.qvec")}, e.vec_id) AS rnk
         |    FROM probed p
         |    JOIN assigned a ON a.cell = p.cell
         |    JOIN embeddings e ON e.vec_id = a.vec_id
         |  ) WHERE rnk <= 10
         |)
         |SELECT exact.query_id, count(*) * 1.0 / 10.0 AS recall_at_10
         |FROM exact JOIN ivf ON exact.query_id = ivf.query_id
         |                   AND exact.vec_id = ivf.vec_id
         |GROUP BY exact.query_id
         |ORDER BY exact.query_id""".stripMargin
    },

    "ann_recall_tradeoff" -> {
      val duckCentroids =
        "SELECT vec_id AS cell, embedding AS centroid FROM embeddings WHERE vec_id < 8"
      def row(np: Int) =
        s"""SELECT CAST($np AS BIGINT) AS nprobe, CAST(x.n_hits AS BIGINT) AS n_hits,
           |  CAST((x.n_hits * 1000000) // x.n_exact AS BIGINT) AS recall_q
           |FROM (
           |  WITH queries AS (
           |    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 16
           |  ), exact AS (
           |    SELECT query_id, vec_id FROM (
           |      SELECT q.query_id, e.vec_id,
           |        row_number() OVER (PARTITION BY q.query_id
           |          ORDER BY ${duckL2sq("e.embedding", "q.qvec")}, e.vec_id) AS rnk
           |      FROM embeddings e CROSS JOIN queries q
           |    ) WHERE rnk <= 10
           |  ), assigned AS (
           |    SELECT vec_id, cell FROM (
           |      SELECT e.vec_id, c.cell,
           |        row_number() OVER (PARTITION BY e.vec_id
           |          ORDER BY ${duckL2sq("e.embedding", "c.centroid")}, c.cell) AS rn
           |      FROM embeddings e CROSS JOIN ($duckCentroids) c
           |    ) WHERE rn = 1
           |  ), probed AS (
           |    SELECT query_id, qvec, cell FROM (
           |      SELECT q.query_id, q.qvec, c.cell,
           |        row_number() OVER (PARTITION BY q.query_id
           |          ORDER BY ${duckL2sq("q.qvec", "c.centroid")}, c.cell) AS crn
           |      FROM queries q CROSS JOIN ($duckCentroids) c
           |    ) WHERE crn <= $np
           |  ), ivf AS (
           |    SELECT query_id, vec_id FROM (
           |      SELECT p.query_id, e.vec_id,
           |        row_number() OVER (PARTITION BY p.query_id
           |          ORDER BY ${duckL2sq("e.embedding", "p.qvec")}, e.vec_id) AS rnk
           |      FROM probed p
           |      JOIN assigned a ON a.cell = p.cell
           |      JOIN embeddings e ON e.vec_id = a.vec_id
           |    ) WHERE rnk <= 10
           |  )
           |  SELECT (SELECT count(*) FROM exact JOIN ivf
           |            ON exact.query_id = ivf.query_id
           |           AND exact.vec_id = ivf.vec_id) AS n_hits,
           |         (SELECT count(*) FROM exact) AS n_exact
           |) x""".stripMargin
      s"""${row(1)}
         |UNION ALL
         |${row(2)}
         |UNION ALL
         |${row(4)}
         |ORDER BY nprobe""".stripMargin
    },

    // Quadratic truth for the PassJoin result: every key-ordered record
    // pair within Levenshtein 2 (the length filter only prunes pairs the
    // distance bound already excludes). MATERIALIZED — DuckDB 1.0
    // re-inlines plain CTEs per reference (BASELINE.md r9 lesson).
    "simjoin_edit" ->
      """WITH d AS MATERIALIZED (
        |  SELECT levenshtein(a.p_name, b.p_name) AS dist
        |  FROM part a JOIN part b
        |    ON a.p_partkey < b.p_partkey
        |   AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |)
        |SELECT CAST(dist AS BIGINT) AS dist, count(*) AS pairs
        |FROM d WHERE dist <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
