package graft

/** Every registered driver-contract query must run and return rows on
  * sf0.001, and every query key must have oracle SQL (or be explicitly
  * allow-listed as non-SQL-expressible). Full value-level correctness is
  * the DuckDB gate (tools/check_oracle.py); this is the fast guard. */
class QueriesSmokeSpec extends SparkSpec {

  /** Ops whose semantics cannot be expressed in DuckDB SQL (driver
    * records a weaker rows-only check for these). */
  private val noOracleAllowed: Set[String] = Set.empty

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Store-lifecycle queries whose smoke run builds+folds+serves a
    * persisted store even at sf0.001 (4-48 s each, ~120 s of the
    * suite's 262 s in the r20 full-run timing) — tagged Heavy so the
    * default `sbt test` fits the harness budget (see build.sbt). Their
    * VALUES are independently verified by the DuckDB oracle every
    * round, and GRAFT_HEAVY_TESTS=1 runs them here too. */
  private val heavySmoke: Set[String] = Set(
    "hybrid_log", "ann_graph_hier_insert", "ann_opq_adc_store",
    "ann_graph_adc_wide", "ann_graph_adc_hier", "ann_graph_insert",
    "bm25_log", "ann_graph_upsert", "ann_graph_delete")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    val tags = if (heavySmoke(name)) Seq(Heavy) else Nil
    test(s"$name runs with rows > 0 on sf0.001", tags: _*) {
      assert(SparkEntry.queries(name)(spark, sf).count() > 0)
    }
  }

  test("every query has oracle SQL unless allow-listed") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleAllowed
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no orphan oracle SQL") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
