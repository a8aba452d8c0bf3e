package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Knn
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible. Column names and types are
  * aligned on BOTH sides (the driver sorts columns by name and
  * hash-compares values), and every query ends with a deterministic total
  * order. Floating-point results are either computed in a fixed fold
  * order (vector distances) or via exact decimal arithmetic (money
  * aggregates), then rounded — SURVEY.md §7 risks 1-2.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact k-NN — the reference's core operation (SURVEY.md §2 O-1/O-2). */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_single")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O-1/O-2: exact squared-L2 top-k, single query (query = vector of
    // vec_id 0, so oracle and engine score identical float inputs).
    "knn_single" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      e.crossJoin(broadcast(q))
        .select($"vec_id", round(l2sq($"embedding", $"qvec"), 4).as("distance"))
        .orderBy($"distance", $"vec_id")
        .limit(10)
    }),

    // O-3: batch search — queries are data; one scan serves the batch.
    "knn_batch" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      Knn.batchTopK(e, q, k = 5)
        .select($"query_id", $"vec_id",
          round($"distance", 4).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "knn_single" ->
      s"""SELECT e.vec_id,
         |       round(${duckL2sq("e.embedding", "q.qvec")}, 4) AS distance
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
         |ORDER BY distance, e.vec_id
         |LIMIT 10""".stripMargin,

    "knn_batch" ->
      s"""SELECT * FROM (
         |  SELECT query_id, vec_id, round(distance, 4) AS distance,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY distance, vec_id) AS rank
         |  FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |           ${duckL2sq("e.embedding", "q.embedding")} AS distance
         |    FROM embeddings e
         |    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
         |  )
         |) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
  )

  /** DuckDB squared-L2 fragment matching VectorFunctions.l2sq exactly:
    * double widening, element-order left fold. */
  private def duckL2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"
}
