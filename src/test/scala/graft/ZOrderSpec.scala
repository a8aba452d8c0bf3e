package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: the Morton key is exact bit math (driver replay),
  * and the clustered layout actually earns its keep — files cover small
  * rectangles of the key space, so min/max pruning bites on BOTH
  * dimensions, measured through the parquet reader's own row metric. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue equals a driver-side interleave, monotone in each key quadrant") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((rnd.nextInt(1 << 11).toLong, rnd.nextInt(1 << 11).toLong))
    val got = rows.toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", bits = 11).as("z"))
      .collect().map(_.getLong(0))
    def interleave(a: Long, b: Long): Long =
      (0 until 11).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    rows.zip(got).foreach { case ((a, b), z) =>
      assert(z === interleave(a, b), s"($a, $b)")
    }
    // out-of-range keys are masked, not corrupted
    val masked = Seq((4096L + 5L, 2048L + 7L)).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", bits = 11)).head.getLong(0)
    assert(masked === interleave(5L, 7L))
  }

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collectLeaves()
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered files cover small rectangles; both-dimension pruning measured") {
    val n = 100000
    val rnd = new scala.util.Random(17)
    val data = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      ZOrder.layoutBy(data, "a", "b", files = 16, bits = 10)
        .write.mode("overwrite").parquet(s"$dir/z")
      data.repartitionByRange(16, $"a").sortWithinPartitions($"a")
        .write.mode("overwrite").parquet(s"$dir/bya")
      // per-file key rectangles: the z layout bounds BOTH ranges; the
      // single-column sort leaves b wide open in every file
      val zCover = spark.read.parquet(s"$dir/z")
        .groupBy(input_file_name()).agg(max($"b") - min($"b"), max($"a") - min($"a"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(zCover.length >= 8)
      // files whose z-range straddles a top-level quadrant boundary can
      // span one full dimension (the Morton-curve jump); MOST files
      // must still be small rectangles
      val tight = zCover.count { case (bw, aw) => bw <= 600 && aw <= 600 }
      assert(tight >= zCover.length * 3 / 4,
        s"too few tight z files ($tight/${zCover.length}): ${zCover.mkString(", ")}")
      val aCover = spark.read.parquet(s"$dir/bya")
        .groupBy(input_file_name()).agg(max($"b") - min($"b"))
        .collect().map(_.getLong(1))
      assert(aCover.forall(_ >= 1000), "control: b is unclustered when sorting by a")
      // measured skipping: filter on b (the column the a-sort CANNOT
      // help) — parquet row-group stats prune the z layout only
      val zRead = scannedRows(spark.read.parquet(s"$dir/z").filter($"b" < 64))
      val aRead = scannedRows(spark.read.parquet(s"$dir/bya").filter($"b" < 64))
      assert(aRead >= n * 9L / 10L, s"control layout should scan ~all rows, got $aRead")
      assert(zRead <= n / 2L, s"z layout should skip most row groups, got $zRead")
      // and the same layout also prunes on a (the point of interleaving)
      val zReadA = scannedRows(spark.read.parquet(s"$dir/z").filter($"a" < 64))
      assert(zReadA <= n / 2L, s"z layout should prune on a too, got $zReadA")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
