package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Knn, MutationLog}
import graft.queries.LogQueries
import graft.sources.{Tables, VectorStore}

/** The reference's full lifecycle, end-to-end on real testdata:
  * mutation log → replay → persisted shard-partitioned snapshot →
  * reload → (pruned) search. SURVEY.md §3 as one test. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("log → replay → VectorStore roundtrip → partition-pruned kNN") {
    val dir = Files.createTempDirectory("graft-store").toString
    // 1. build + replay the synthetic log (STRONG = full prefix)
    val state = MutationLog.replay(LogQueries.syntheticLog(spark, sf))
    val n = state.count()
    assert(n > 0)
    // 2. persist partitioned by shard (shard = parquet partition dir)
    VectorStore.write(state.select($"id", $"embedding", $"shard_id"), dir)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(shardDirs.count(_.startsWith("shard_id=")) === 4)
    // 3. reload; shard filter must prune partitions at the scan
    val reloaded = VectorStore.read(spark, dir)
    assert(reloaded.count() === n)
    val pruned = reloaded.filter($"shard_id" === "shard_1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard_id"), scan)
    // 4. exact search over one shard of the reloaded snapshot
    val q = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val hits = Knn.topK(pruned, q, 5, idCol = "id").collect()
    assert(hits.length === 5)
    val dists = hits.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted))
    // 5. consistency prefix: stale snapshot differs from full replay
    val stale = MutationLog.snapshot(LogQueries.syntheticLog(spark, sf),
      commitIndex = 9999L, MutationLog.Strong)
    assert(stale.count() !== n) // deletes/moves at +10000/+20000 invisible
  }

  test("streaming file source tails the mutation log incrementally") {
    val logDir = Files.createTempDirectory("graft-log").toString
    val out = s"graft_stream_out_${System.nanoTime()}"
    val batch1 = LogQueries.syntheticLog(spark, sf).filter($"log_index" < 100)
    batch1.write.mode("append").parquet(logDir)
    val stream = spark.readStream
      .schema(batch1.schema)
      .parquet(logDir)
      .groupBy($"op").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(out).start()
    try {
      q.processAllAvailable()
      val n1 = spark.table(out).agg(sum($"n")).head().getLong(0)
      assert(n1 === batch1.count())
      // append a second batch — the stream picks up only the new files
      LogQueries.syntheticLog(spark, sf)
        .filter($"log_index" >= 100 && $"log_index" < 200)
        .write.mode("append").parquet(logDir)
      q.processAllAvailable()
      val n2 = spark.table(out).agg(sum($"n")).head().getLong(0)
      assert(n2 > n1)
    } finally q.stop()
  }
}
