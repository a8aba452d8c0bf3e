package graft

import org.apache.spark.sql.SparkSession

/** Forced-materialization sweep: Bench forces with count(), which lets
  * Catalyst PRUNE select-only score columns (how the 6.2 s HOF entropy
  * hid behind a 0.07 s bench line). Verify DOES materialize every
  * column (parquet write), so hidden projection cost is real cost.
  * This sweep noop-writes every query at sf0.1 and prints the wall —
  * diff against BENCH to spot pruned-away compute. */
object ProfileForced {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.selectedQueries.foreach { case (name, fn) =>
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      try {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"FORCED $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"FORCED $name: FAILED ${e.getMessage.take(120)}")
      } finally {
        spark.catalog.clearCache()
        val keep = graft.util.IndexCache.pinnedRddIds
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) =>
            !persistedBefore.contains(id) && !keep.contains(id) }
          .values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
