package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = new Timestamp(m * 60000L)

  // trades/quotes — the canonical as-of fixture
  private lazy val trades = Seq(
    ("A", t(10), 100.0), ("A", t(20), 101.0), ("B", t(15), 50.0), ("C", t(5), 7.0)
  ).toDF("sym", "trade_ts", "trade_px")

  private lazy val quotes = Seq(
    ("A", t(8), 99.5), ("A", t(10), 99.9), ("A", t(19), 100.8), ("B", t(1), 49.0)
  ).toDF("sym", "quote_ts", "quote_px")

  test("inclusive as-of: latest quote at or before each trade") {
    val got = AsOfJoin.joinAsOf(trades, quotes, Seq("sym"),
        "trade_ts", "quote_ts", Seq("quote_px"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(3)))).toSet
    assert(got === Set(
      ("A", t(10), Some(99.9)),   // quote AT trade ts is visible
      ("A", t(20), Some(100.8)),
      ("B", t(15), Some(49.0)),
      ("C", t(5), None)))         // no quote for C → null
  }

  test("strict as-of: same-timestamp quote is NOT visible") {
    val got = AsOfJoin.joinAsOf(trades, quotes, Seq("sym"),
        "trade_ts", "quote_ts", Seq("quote_px"), strict = true)
      .filter($"sym" === "A" && $"trade_ts" === t(10))
      .head()
    assert(got.getDouble(3) === 99.5) // falls back to the t(8) quote
  }

  test("plan shuffles once on the key — no range-join cross product") {
    val plan = AsOfJoin.joinAsOf(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_px")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
