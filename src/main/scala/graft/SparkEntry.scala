package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in domain packs (graft.queries.*); every entry
  * has a matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible. Column names and types are aligned on BOTH sides
  * (the driver sorts columns by name and hash-compares values), every
  * query ends with a deterministic total order, and floating-point
  * results are computed either in a fixed fold order (vector distances)
  * or via exact decimal arithmetic (money aggregates) — SURVEY.md §7
  * risks 1-2.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    VectorQueries,
    RelationalQueries,
    EventQueries,
    LogQueries,
    TextQueries,
    AnnQueries,
    AdvancedQueries,
    MiscQueries,
    MultimodalQueries,
    RetrievalQueries,
    DecontamQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact k-NN — the reference's core operation (SURVEY.md §2 O-1/O-2). */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_single")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap

  /** Queries name-sorted and filtered by the optional comma-separated
    * GRAFT_ONLY env var — the single definition of the local-iteration
    * subset contract shared by Verify, Bench, and ProfileForced (the
    * driver leaves the var unset and gets everything). A set-but-useless
    * GRAFT_ONLY fails fast: an empty value or names matching no query
    * would otherwise produce a partial BENCH/CORRECTNESS artifact that
    * looks complete (ADVICE r8). */
  def selectedQueries: Seq[(String, (SparkSession, String) => DataFrame)] = {
    val only = sys.env.get("GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty,
        "GRAFT_ONLY is set but names no queries — unset it or list query names")
      val unknown = names -- queries.keySet
      require(unknown.isEmpty,
        s"GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      System.err.println(
        s"[graft] GRAFT_ONLY active: ${names.toSeq.sorted.mkString(", ")}")
    }
    queries.toSeq.sortBy(_._1).filter { case (n, _) => only.forall(_.contains(n)) }
  }
}
