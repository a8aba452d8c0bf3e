package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Scan-metric helpers shared by the layout-proof specs (DppSpec,
  * IndexStoreSpec): under AQE, `collectLeaves` stops at QueryStageExec
  * boundaries and HIDES the file scans — a naive helper returns 0 and
  * passes any `<=` assert vacuously, so the traversal must descend
  * through adaptive wrappers and reused exchanges. */
object PlanMetrics {

  def scanLeaves(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scanLeaves(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scanLeaves(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      scanLeaves(r.child)
    case s if s.children.isEmpty => Seq(s)
    case s => s.children.flatMap(scanLeaves)
  }

  /** Executes `df` and returns the summed numOutputRows of every file
    * scan in the executed plan. Fails loudly if no scan is found. */
  def scannedRows(df: DataFrame): Long = {
    df.collect()
    val scans = scanLeaves(df.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("scan"))
    assert(scans.nonEmpty, "no file scans found in the executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }
}
