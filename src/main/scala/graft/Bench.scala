package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds over
  * SPARK_GRAFT_SF_DIR. Each query gets one warmup execution (session/JIT/
  * codegen amortization) and one measured execution.
  *
  * Hygiene contract (VERDICT r2 finding #1/#2):
  *  - `spark.catalog.clearCache()` after EVERY execution — queries that
  *    persist intermediates (dedup signature/rep frames) must not leak
  *    cached plans into later queries: CacheManager plan-matching and
  *    storage pressure polluted r2 (3–18× regressions on untouched
  *    queries sorted after `dedup_*`). Each measured pass is therefore
  *    cold and isolated.
  *  - failures are printed to stderr and reported per-query in the JSON
  *    (negative time = failed), never silently swallowed.
  *  - the metric JSON is the last stdout line the program prints.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def runOnce(pass: String): Double =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name $pass FAILED: ${e.getClass.getName}: ${e.getMessage}")
            -1.0
        } finally {
          spark.catalog.clearCache()
          // clearCache misses localCheckpoint blocks (drop lists, CC
          // label rounds) — they register as persistent RDDs, not
          // CacheManager entries. Safe here: the frames are dead after
          // the pass (never unpersist a live checkpoint — its blocks
          // are the only copy).
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      runOnce("warmup")
      name -> runOnce("measured")
    }
    val failed = results.collect { case (n, t) if t < 0 => n }
    failed.foreach(n => System.err.println(s"[bench] FAILED QUERY: $n"))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // stop() before the JSON so no further stdout follows — but never
    // let a teardown failure eat the run's results
    try spark.stop() catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.size},"sf":"$sfDir"}""")
  }
}
