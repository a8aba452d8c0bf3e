package graft

import org.apache.spark.sql.functions._
import graft.operators.SetJoin
import graft.functions.TextFunctions.{tokens, wordShingles}
import graft.sources.Tables

/** Prefix-filter Jaccard join: candidate generation is complete (the
  * prefix lemma), verification exact, and the whole pipeline equals a
  * quadratic replay — including boundary thresholds and duplicate-heavy
  * vocabularies. */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def jacc(a: Set[String], b: Set[String]): (Long, Long) =
    ((a & b).size.toLong, (a | b).size.toLong)

  test("equals the quadratic truth on boundary-threshold sets (t = 1/2 and 2/3)") {
    // sets engineered to land exactly ON and just OFF the threshold,
    // plus shared rare/frequent tokens to stress the prefix order
    val sets: Seq[(Long, Set[String])] = Seq(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b", "c", "e"),    // J(1,2) = 3/5
      3L -> Set("a", "b"),              // J(1,3) = 2/4 = exactly 1/2
      4L -> Set("x", "y", "z"),
      5L -> Set("x", "y", "z"),         // J(4,5) = 1
      6L -> Set("q"),
      7L -> Set("a", "b", "c", "d", "e", "f", "g", "h"),  // J(1,7) = 4/8
      8L -> Set("b", "c", "d", "e"))    // J(1,8) = 3/5
    val df = sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "tk")
    for ((num, den) <- Seq((1, 2), (2, 3))) {
      val got = SetJoin.jaccardPairs(df, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        (i, a) <- sets; (j, b) <- sets if i < j
        (in, un) = jacc(a, b) if in * den >= un * num
      } yield (i, j, in, un)).toSet
      assert(got === want, s"t=$num/$den")
    }
  }

  test("randomized brute-force oracle across thresholds (window-rank prefix build, r17)") {
    // seeded random universe: 120 sets over a 30-token vocabulary with
    // heavy overlap — stresses the per-set row_number prefix build
    // (rank ties impossible: (cnt, t) total within a set), the length
    // filter, and the positional filter at three thresholds
    val rnd = new scala.util.Random(1717L)
    val vocab = (0 until 30).map(i => s"w$i")
    val sets: Seq[(Long, Set[String])] = (0 until 120).map { i =>
      val sz = 1 + rnd.nextInt(12)
      i.toLong -> Seq.fill(sz)(vocab(rnd.nextInt(vocab.size))).toSet
    }
    val df = sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "tk")
    for ((num, den) <- Seq((1, 2), (7, 10), (9, 10))) {
      val got = SetJoin.jaccardPairs(df, num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        (i, a) <- sets; (j, b) <- sets if i < j
        (in, un) = jacc(a, b) if in * den >= un * num
      } yield (i, j, in, un)).toSet
      assert(got === want, s"t=$num/$den (|want|=${want.size})")
      assert(want.nonEmpty, s"fixture degenerate at t=$num/$den")
    }
  }

  test("plan shape: no cartesian product; candidates come from the token equi-join") {
    val sets = Tables.documents(spark, sf)
      .select($"doc_id".as("id"),
        array_distinct(wordShingles(tokens($"text"), 3)).as("tk"))
    val q = SetJoin.jaccardPairs(sets, 3, 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("positional filter ≡ prefix-only form on the real corpus (pure pruning)") {
    // the PPJoin positional filter may only REMOVE candidates the exact
    // verify would kill anyway — outputs must be row-identical, and the
    // boundary-threshold fixtures above already pin it against the
    // quadratic truth
    val sets = Tables.documents(spark, sf)
      .select($"doc_id".as("id"),
        array_distinct(wordShingles(tokens($"text"), 3)).as("tk"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val withPos = rows(SetJoin.jaccardPairs(sets, 3, 5))
    val prefixOnly = rows(SetJoin.jaccardPairs(sets, 3, 5, positionalFilter = false))
    assert(withPos === prefixOnly,
      "positional filter changed the verified output")
  }

  test("real corpus: matches the quadratic replay; near-dup pairs found") {
    val rows = Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(wordShingles(tokens($"text"), 3)))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      (in, un) = jacc(a, b) if in * 5 >= un * 3
    } yield (i, j, in, un)).toSet
    val sets = Tables.documents(spark, sf)
      .select($"doc_id".as("id"),
        array_distinct(wordShingles(tokens($"text"), 3)).as("tk"))
    val got = SetJoin.jaccardPairs(sets, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain near-dup documents")
  }

  test("IntersectCountSortedLongs ≡ size(array_intersect) on sorted distinct longs (r20 verify kernel)") {
    val rnd = new scala.util.Random(20)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      (i.toLong, a, b)
    } :+ ((0L, Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("i", "a", "b")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val merged = ColumnBridge.column(
      graft.expressions.IntersectCountSortedLongs(
        ColumnBridge.expression($"a"), ColumnBridge.expression($"b")))
    val bad = df.select(
        merged.as("fast"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(bad === 0L)
  }
}
