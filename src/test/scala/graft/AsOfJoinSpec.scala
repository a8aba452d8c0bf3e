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

  test("randomized differential: joinAsOf ≡ naive per-row scan (both modes)") {
    val rnd = new scala.util.Random(17)
    (0 until 5).foreach { _ =>
      val keys = Seq("A", "B", "C")
      val lrows = (1 to 40).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(30)), i.toDouble))
      val rrows = (1 to 30).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(30)), 100.0 + i))
      val l = lrows.toDF("sym", "trade_ts", "trade_px")
      val r = rrows.toDF("sym", "quote_ts", "quote_px")
      Seq(false, true).foreach { strict =>
        val got = AsOfJoin.joinAsOf(l, r, Seq("sym"), "trade_ts", "quote_ts",
            Seq("quote_px"), strict = strict)
          .select("sym", "trade_ts", "trade_px", "quote_px").collect()
          .map(x => (x.getString(0), x.getTimestamp(1), x.getDouble(2),
            if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
        // naive: per left row, the max-ts (tie: max payload as the
        // deterministic tertiary) right row at/before (or strictly
        // before) the left ts for the same key
        val expected = lrows.map { case (k, ts, px) =>
          val cand = rrows.filter { case (rk, rts, _) =>
            rk == k && (if (strict) rts.before(ts) else !rts.after(ts))
          }
          val best = if (cand.isEmpty) None
            else Some(cand.maxBy(c => (c._2.getTime, c._3))._3)
          (k, ts, px, best)
        }.toSet
        assert(got === expected, s"strict=$strict")
      }
    }
  }

  test("forward as-of: earliest quote at or after each trade; strict hides same-ts") {
    val got = AsOfJoin.joinAsOfForward(trades, quotes, Seq("sym"),
        "trade_ts", "quote_ts", Seq("quote_px"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(3)))).toSet
    assert(got === Set(
      ("A", t(10), Some(99.9)),   // quote AT trade ts is visible
      ("A", t(20), None),         // nothing after t(20)
      ("B", t(15), None),         // B's only quote is before
      ("C", t(5), None)))
    val strict = AsOfJoin.joinAsOfForward(trades, quotes, Seq("sym"),
        "trade_ts", "quote_ts", Seq("quote_px"), strict = true)
      .filter($"sym" === "A" && $"trade_ts" === t(10)).head()
    assert(strict.getDouble(3) === 100.8) // skips the same-ts quote, takes t(19)
  }

  test("randomized differential: joinAsOfForward ≡ naive per-row scan (both modes)") {
    val rnd = new scala.util.Random(19)
    (0 until 5).foreach { _ =>
      val keys = Seq("A", "B", "C")
      val lrows = (1 to 40).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(30)), i.toDouble))
      val rrows = (1 to 30).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(30)), 100.0 + i))
      val l = lrows.toDF("sym", "trade_ts", "trade_px")
      val r = rrows.toDF("sym", "quote_ts", "quote_px")
      Seq(false, true).foreach { strict =>
        val got = AsOfJoin.joinAsOfForward(l, r, Seq("sym"), "trade_ts", "quote_ts",
            Seq("quote_px"), strict = strict)
          .select("sym", "trade_ts", "trade_px", "quote_px").collect()
          .map(x => (x.getString(0), x.getTimestamp(1), x.getDouble(2),
            if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toSet
        // naive: per left row, the min-ts (tie: MIN payload — first over
        // ascending (ts, payload)) right row at/after (or strictly
        // after) the left ts for the same key
        val expected = lrows.map { case (k, ts, px) =>
          val cand = rrows.filter { case (rk, rts, _) =>
            rk == k && (if (strict) rts.after(ts) else !rts.before(ts))
          }
          val best = if (cand.isEmpty) None
            else Some(cand.minBy(c => (c._2.getTime, c._3))._3)
          (k, ts, px, best)
        }.toSet
        assert(got === expected, s"strict=$strict")
      }
    }
  }

  test("plan shuffles once on the key — no range-join cross product") {
    val plan = AsOfJoin.joinAsOf(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("quote_px")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
