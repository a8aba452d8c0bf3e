package graft

import graft.operators.Pca

/** Power-iteration PC1: recovers a planted dominant direction, returns a
  * unit vector, and is invariant to input partitioning (the quantization
  * points kill summation-order sensitivity). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 2-D embeddings stretched along (1, 1)/√2 with small orthogonal noise
  private def planted = Seq.tabulate(200) { r =>
    val t = (r % 21 - 10).toFloat          // spread along the axis
    val n = ((r % 7) - 3).toFloat * 0.05f  // small orthogonal wiggle
    (r.toLong, Array(t + n, t - n))
  }.toDF("vec_id", "embedding")

  test("recovers the planted dominant direction as a unit vector") {
    val rows = Pca.pc1(planted, dim = 2, iters = 5)
      .orderBy($"dim").collect()
    val v = rows.map(_.getDouble(1))
    val lambda = rows.head.getDouble(2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"not unit: $norm")
    // direction ≈ ±(0.7071, 0.7071): components equal-ish, same sign
    assert(math.abs(math.abs(v(0)) - 0.7071) < 0.02, v.toSeq)
    assert(math.abs(v(0) - v(1)) < 0.05, v.toSeq)
    assert(lambda > 0.0)
  }

  test("result is bit-identical across input partitionings") {
    val a = Pca.pc1(planted.repartition(1), dim = 2, iters = 3).collect()
    val b = Pca.pc1(planted.repartition(17), dim = 2, iters = 3).collect()
    assert(a.sortBy(_.getInt(0)).toSeq === b.sortBy(_.getInt(0)).toSeq)
  }

  test("corpus pc1 on the testdata embeddings is a unit vector with positive lambda") {
    val rows = Pca.pc1(graft.sources.Tables.embeddings(spark, sf), dim = 64)
      .collect()
    assert(rows.length === 64)
    val norm = math.sqrt(rows.map(_.getDouble(1)).map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"not unit: $norm")
    assert(rows.map(_.getDouble(2)).distinct.length === 1)
  }
}
