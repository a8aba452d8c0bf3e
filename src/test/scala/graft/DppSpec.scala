package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the 100 TB fact-dim join story: a fact
  * store partitioned on the join key must NOT be scanned in full when
  * the dim side is filtered; Catalyst injects the dim's key set as a
  * runtime partition filter (the star-schema optimization every
  * warehouse query leans on). Measured through the scan's own row
  * metric with a DPP-disabled control, plus the plan-level assert that
  * the pruning subquery is actually attached to the scan.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  private def scannedRows(df: DataFrame): Long = PlanMetrics.scannedRows(df)

  test("partitioned fact scan is runtime-pruned by the filtered dim side") {
    val n = 20000
    val fact = spark.range(n)
      .select($"id".as("row_id"), ($"id" % 16).as("part_key"),
        ($"id" * 7 % 1000).as("v"))
    val dim = (0L until 16L).map(k => (k, s"grp_${k % 4}")).toDF("part_key", "grp")
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      fact.write.mode("overwrite").partitionBy("part_key").parquet(s"$dir/fact")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      val f = spark.read.parquet(s"$dir/fact")
      val d = spark.read.parquet(s"$dir/dim").filter($"grp" === "grp_0")
      def joined = f.join(d, "part_key").groupBy($"grp").agg(sum($"v").as("sv"))
      val pruned = joined
      val prunedRows = scannedRows(pruned)
      // grp_0 keeps part_keys {0, 4, 8, 12} — 4 of 16 partitions; the
      // fact side must scan only those (dim's 16 rows are noise)
      assert(prunedRows <= n / 4 + 16,
        s"DPP should scan 1/4 of the fact partitions, got $prunedRows")
      // the executed plan carries the runtime pruning subquery on the scan
      val planStr = pruned.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        "fact scan should carry a dynamicpruning partition filter")
      // control: same query with DPP off scans every fact row
      val conf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
      val prev = spark.conf.get(conf)
      try {
        spark.conf.set(conf, "false")
        val ctrlRows = scannedRows(joined)
        assert(ctrlRows >= n, s"control should scan all fact rows, got $ctrlRows")
      } finally spark.conf.set(conf, prev)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
