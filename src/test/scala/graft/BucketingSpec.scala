package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tables, VectorStore}

/** Plan-level proof of the bucketed co-location layout: joins and
  * aggregations keyed on the bucket keys must run WITHOUT a shuffle
  * exchange, and a leading-key equality filter must prune buckets at
  * the scan. These are the 100 TB claims `VectorStore.writeBucketed`
  * makes — a correctness-green bucketed join that still shuffles would
  * defeat the layout's whole point. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withTables(names: String*)(body: => Unit): Unit =
    try body
    finally names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  /** The fixture tables are broadcast-sized, so the planner would pick a
    * broadcast join (and auto-bucketed-scan would then drop the bucket
    * layout as unneeded). At 100 TB neither side of a state join is
    * broadcastable — force the shuffle-join regime the layout exists
    * for, and restore the confs after. */
  private def atScale(body: => Unit): Unit = {
    val broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val autoScan = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", autoScan)
    }
  }

  test("join of two co-bucketed tables runs without any exchange") {
    val t1 = s"bk_state_${System.nanoTime()}"
    val t2 = s"bk_updates_${System.nanoTime()}"
    withTables(t1, t2) { atScale {
      val e = Tables.embeddings(spark, sf).select($"vec_id".as("id"), $"embedding")
      VectorStore.writeBucketed(e, t1, 8, Seq("id"))
      VectorStore.writeBucketed(
        e.select($"id", lit(1L).as("generation")), t2, 8, Seq("id"))
      val joined = VectorStore.readBucketed(spark, t1)
        .join(VectorStore.readBucketed(spark, t2), "id")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(joined.count() === e.count())
    } }
  }

  test("aggregation on the bucket key runs without an exchange") {
    val t = s"bk_agg_${System.nanoTime()}"
    withTables(t) { atScale {
      val e = Tables.embeddings(spark, sf).select($"vec_id".as("id"), $"label")
      VectorStore.writeBucketed(e, t, 8, Seq("id"))
      val agg = VectorStore.readBucketed(spark, t)
        .groupBy($"id").agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(agg.count() === e.count())
    } }
  }

  test("equality filter on the leading bucket key prunes buckets at the scan") {
    val t = s"bk_prune_${System.nanoTime()}"
    withTables(t) { atScale {
      val e = Tables.embeddings(spark, sf).select($"vec_id".as("id"), $"embedding")
      VectorStore.writeBucketed(e, t, 8, Seq("id"))
      val q = VectorStore.readBucketed(spark, t).filter($"id" === 42L)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
      assert(q.count() === 1)
    } }
  }

  test("MutationLog.replay over a log bucketed by the state key is shuffle-free") {
    val t = s"bk_log_${System.nanoTime()}"
    withTables(t) { atScale {
      val log = graft.queries.LogQueries.syntheticLog(spark, sf)
      VectorStore.writeBucketed(log, t, 8, Seq("shard_id", "id"))
      // replay's window partitions by (shard_id, id) — exactly the bucket
      // key, so the bucket distribution feeds it directly: the one
      // shuffle replay normally costs (the whole log, every replay)
      // disappears. At 100 TB this is the difference between re-shuffling
      // the full mutation history per snapshot build and only sorting
      // within already-co-located splits.
      val replayed = graft.operators.MutationLog.replay(
        VectorStore.readBucketed(spark, t))
      val p = replayed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      // and the result is identical to replaying the unbucketed frame
      val viaBuckets = replayed.select($"shard_id", $"id", $"log_index")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val direct = graft.operators.MutationLog.replay(log)
        .select($"shard_id", $"id", $"log_index")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaBuckets === direct)
      assert(viaBuckets.nonEmpty)
    } }
  }

  test("plain parquet read of the same files would reintroduce the exchange") {
    val t1 = s"bk_meta_${System.nanoTime()}"
    val t2 = s"bk_meta2_${System.nanoTime()}"
    withTables(t1, t2) { atScale {
      val e = Tables.embeddings(spark, sf).select($"vec_id".as("id"), $"embedding")
      VectorStore.writeBucketed(e, t1, 8, Seq("id"))
      VectorStore.writeBucketed(
        e.select($"id", lit(1L).as("generation")), t2, 8, Seq("id"))
      // same data, read WITHOUT bucket metadata: the join must shuffle —
      // proves the catalog metadata (not file layout luck) is load-bearing.
      // atScale + the hashpartitioning assert matter (ADVICE r6): outside
      // atScale a broadcast-sized fixture plans a BroadcastExchange and a
      // bare "Exchange" contains() passes vacuously.
      val loc = spark.sql(s"DESCRIBE EXTENDED $t1").filter($"col_name" === "Location")
        .select($"data_type").head().getString(0)
      val loc2 = spark.sql(s"DESCRIBE EXTENDED $t2").filter($"col_name" === "Location")
        .select($"data_type").head().getString(0)
      val joined = spark.read.parquet(loc).join(spark.read.parquet(loc2), "id")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("Exchange hashpartitioning"), p)
    } }
  }
}
