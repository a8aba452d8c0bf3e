package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded ≡ naive non-equi join on random points/intervals") {
    val rnd = new scala.util.Random(5)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "v")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("iid", "lo", "hi")
    val banded = RangeJoin.banded(points, "v", intervals, "lo", "hi", band = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(naive.nonEmpty)
  }

  test("each match is produced exactly once (no post-join distinct needed)") {
    val points = Seq((1L, 25.0)).toDF("pid", "v")
    // interval spans several bands; the point still matches once
    val intervals = Seq((1L, 0.0, 95.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.banded(points, "v", intervals, "lo", "hi", band = 10.0)
    assert(got.count() === 1)
  }
}
