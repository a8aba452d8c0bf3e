package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // micros (not INT96) so the oracle's parquet reader sees the same
      // timestamp physical type the testdata uses
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.ts is TIMESTAMP(NANOS): read as long, graft.sources.Tables
      // converts to micros NTZ
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 64 MB broadcast threshold (production-typical; the 10 MB default
      // pushed borderline rep-signature frames into sort-merge joins)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // plan-cache sizing, mirrored from Bench (execution-only: values
      // are unaffected; the 100-entry JVM default self-evicts inside
      // wide serves and recompiles Janino units per pass)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // unpersisting dead localCheckpoint blocks after a pass is correct
    // but logs a scary per-RDD warning — keep driver tails clean
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.selectedQueries
    selected.foreach { case (name, fn) =>
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // don't leak persisted frames OR dead localCheckpoint blocks —
        // scoped to RDDs this query created, minus the session index
        // manager's live pins (shared across queries by design)
        spark.catalog.clearCache()
        val keep = graft.util.IndexCache.pinnedRddIds
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) =>
            !persistedBefore.contains(id) && !keep.contains(id) }
          .values.foreach(_.unpersist(false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
