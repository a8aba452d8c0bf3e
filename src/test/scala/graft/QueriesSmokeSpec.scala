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

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs with rows > 0 on sf0.001") {
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
