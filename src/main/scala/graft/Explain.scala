package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-review tool: dumps the formatted physical plan of every
  * registered query to a file (default target/plans.txt). Used to audit
  * pushdown / pruning / join strategies per round — the "explain and
  * iterate" loop, persisted. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "target/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // honors GRAFT_ONLY (same filter as Bench) so a round's targeted
    // before/after plan files can be produced without planning all 180
    val sel = SparkEntry.selectedQueries.sortBy(_._1)
    val sb = new StringBuilder
    sel.foreach { case (name, fn) =>
      sb.append(s"\n========== $name ==========\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote ${sel.size} plans to $out")
    spark.stop()
  }
}
