package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** KMV distinct sketch: exact-fallback below k, estimate formula replay
  * above k, invariance to input partitioning (the heap is a mergeable
  * partial aggregate), and error within the theoretical band. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct values the estimate IS the exact count") {
    val pairs = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "v")
    val got = Sketch.kmvDistinct(pairs, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map("a" -> (2L, 2.0), "b" -> (1L, 1.0)))
  }

  test("above k: estimate matches a driver-side replay and lands near truth") {
    val n = 2000
    val pairs = (0 until n).map(i => ("g", s"val_$i")).toDF("g", "v")
    val k = 64
    val got = Sketch.kmvDistinct(pairs, "g", "v", k)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    // driver replay with the same hash32 (first 8 md5 nibbles)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    val hk = (0 until n).map(i => h32(s"val_$i")).distinct.sorted.apply(k - 1)
    val est = BigDecimal(63L * 4294967296L / hk.toDouble)
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === n.toLong)
    assert(got._2 === est)
    // within 4 standard errors of truth (se ≈ n/√(k−2))
    assert(math.abs(got._2 - n) < 4.0 * n / math.sqrt(k - 2.0))
  }

  test("sketch is partitioning-invariant (mergeable partial aggregate)") {
    val pairs = (0 until 500).map(i => (s"g${i % 3}", s"v$i"))
    val one = Sketch.kmvDistinct(pairs.toDF("g", "v").repartition(1), "g", "v", 16)
      .orderBy($"g").collect().toSeq
    val many = Sketch.kmvDistinct(pairs.toDF("g", "v").repartition(13), "g", "v", 16)
      .orderBy($"g").collect().toSeq
    assert(one === many)
  }

  test("hll: engine registers/estimate equal a driver-side replay; error in band; " +
      "partitioning-invariant") {
    val n = 2000
    val pairs = (0 until n).map(i => ("g", s"val_$i")).toDF("g", "v")
    val row = Sketch.hllDistinct(pairs, "g", "v").collect().head
    val (regsUsed, harmQ, est, nExact) =
      (row.getLong(1), row.getLong(2), row.getDouble(3), row.getLong(4))
    // driver replay with the same hash56 (first 14 md5 nibbles)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h56(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(7).map(b => f"${b & 0xff}%02x").mkString, 16)
    val regs = (0 until n).map(i => h56(s"val_$i")).distinct
      .groupBy(h => (h & 63L))
      .view.mapValues(_.map { h =>
        val rest = h >> 6
        if (rest == 0L) 51 else 51 - java.lang.Long.toBinaryString(rest).length
      }.max).toMap
    val harm = regs.values.map(mr => 1L << (51 - mr)).sum +
      (64 - regs.size) * 2251799813685248L
    val wantEst = BigDecimal(709.0 * math.pow(2.0, 63) / harm.toDouble / 1000.0)
      .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nExact === n.toLong)
    assert(regsUsed === regs.size.toLong)
    assert(harmQ === harm)
    assert(est === wantEst)
    // within 4 standard errors (1.04/sqrt(64) = 13% each)
    assert(math.abs(est - n) < 4 * 0.13 * n, s"est $est vs $n")
    // max-merged registers are partitioning-invariant
    val many = Sketch.hllDistinct(pairs.repartition(13), "g", "v").collect().head
    assert(many.getLong(2) === harmQ && many.getDouble(3) === est)
  }

  test("hll registers stream with 64-rows-per-group state: complete-mode table " +
      "== batch registers of the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Sketch.hllRegisters(mem.toDF().toDF("g", "v"), "g", "v")
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_regs").start()
    try {
      val b1 = (0 until 400).map(i => (s"g${i % 2}", s"v$i"))
      val b2 = (300 until 900).map(i => (s"g${i % 2}", s"v$i")) // overlap re-sends
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("hll_regs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val want = Sketch.hllRegisters((b1 ++ b2).toDF("g", "v"), "g", "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === want)
      assert(got.size <= 2 * 64)
    } finally q.stop()
  }

  test("cms: every row partitions the full stream; estimates dominate exact " +
      "counts even under forced collisions (tiny w)") {
    val n = 300
    val values = (0 until n).map(i => Tuple1(s"tok${i % 17}")).toDF("v")
    val d = 3
    val w = 4 // 17 distinct values into 4 buckets: collisions guaranteed
    val cms = Sketch.cmsTable(values, "v", d, w)
    // each of the d rows hashes every stream element into exactly one
    // bucket, so per-row cell sums equal the stream length
    val perRow = cms.groupBy($"r").agg(sum($"c").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow === (0 until d).map(_ -> n.toLong).toMap)
    val exact = values.groupBy($"v").agg(count(lit(1)).as("n_exact"))
    val est = Sketch.cmsEstimate(cms, exact, "v", d, w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length === 17)
    est.foreach { case (_, ex, e) => assert(e >= ex) }
    // some bucket must actually collide at w=4, so some estimate exceeds
    assert(est.exists { case (_, ex, e) => e > ex })
  }

  test("cms is partitioning-invariant") {
    val values = (0 until 400).map(i => Tuple1(s"t${i % 23}"))
    val a = Sketch.cmsTable(values.toDF("v").repartition(1), "v")
      .orderBy($"r", $"b").collect().toSeq
    val b = Sketch.cmsTable(values.toDF("v").repartition(11), "v")
      .orderBy($"r", $"b").collect().toSeq
    assert(a === b)
  }

  test("cms runs AS A STREAM with bounded state: complete-mode table == batch sketch of the union") {
    // the d·w cell bound is exactly what makes the sketch streaming-
    // legal: the groupBy(r, b).count state cannot exceed d·w rows no
    // matter how long the stream runs — a full vocab count would grow
    // without bound. Two micro-batches, then parity vs one batch pass.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (0 until 300).map(i => s"w${i % 31}")
    val batch2 = (0 until 200).map(i => s"w${i % 17}")
    val mem = MemoryStream[String]
    val q = Sketch.cmsTable(mem.toDF().toDF("v"), "v")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = Sketch.cmsTable((batch1 ++ batch2).toDF("v"), "v")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.size <= 4 * 256)
    } finally q.stop()
  }
}
