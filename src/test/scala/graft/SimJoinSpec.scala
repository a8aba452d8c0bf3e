package graft

import org.apache.spark.sql.functions._
import graft.operators.SimJoin
import graft.sources.Tables

/** PassJoin edit-distance similarity join: candidate generation is
  * complete (recall 1.0 by the pigeonhole guarantee), verification is
  * exact, and record-pair counts reconstruct the quadratic truth. */
class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // edits at every segment boundary, inserts/deletes shifting starts by
  // the full ±k, equal strings, far strings, and a short string
  private val tricky = Seq(
    "abcdefghij", "Xbcdefghij", "abcdXfghij", "abcdefghiX", // sub per segment
    "bcdefghij", "abcdefghi", "acdefghij",                  // deletes
    "abcdefghijkl", "ZZabcdefghij", "abcdeZZfghij",         // inserts incl. front
    "abc", "abd", "ab", "a",                                 // short strings
    "totally-different-string", "abcdefghij"                 // dup + far
  )

  test("editPairs equals the quadratic truth on boundary-stress strings (k=1 and k=2)") {
    val distinct = tricky.distinct
    val df = distinct.toDF("s")
    for (k <- Seq(1, 2)) {
      val got = SimJoin.editPairs(df, k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val want = (for {
        a <- distinct; b <- distinct if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("editPairCounts reconstructs quadratic record-pair counts with duplicates") {
    // records with heavy duplication: multiplicities must multiply
    val records = tricky.zipWithIndex.flatMap { case (s, i) =>
      Seq.fill(1 + i % 3)(s)
    }
    val df = records.toDF("v")
    val got = SimJoin.editPairCounts(df, "v", k = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val idx = records.zipWithIndex
    val want = (for {
      (a, i) <- idx; (b, j) <- idx if i < j
      d = lev(a, b) if d <= 2
    } yield d).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("plan never goes quadratic: no cartesian product, collapse before the join") {
    val q = SimJoin.editPairCounts(Tables.part(spark, sf), "p_name", k = 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("part-name query matches a driver-side quadratic replay at this sf") {
    val names = Tables.part(spark, sf).select($"p_name").collect().map(_.getString(0))
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= 2
    } yield d).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SimJoin.editPairCounts(Tables.part(spark, sf), "p_name", k = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
