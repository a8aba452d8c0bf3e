package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Regression pins for the two r16 parallelism defects the bench
  * counters exposed — both are silent (values never change, only the
  * stage width does), so they need structural pins:
  *
  *  1. AQE-frozen pins: a memoized index frame is localCheckpointed by
  *     `Dedup.repIndex`; without an explicit-width repartition AQE
  *     coalesces the small-SF build shuffle to ~2 partitions and the
  *     checkpoint freezes that for every downstream serve join
  *     (measured: dedup_ngram serve 6.7 s at parallelism 2 vs 1.5 s
  *     after the fix).
  *  2. Narrow sources: a one-row-group parquet file scans as ONE task
  *     regardless of maxPartitionBytes; `Tables.spreadIfNarrow` must
  *     spread it to the session width, and must be a NO-OP when the
  *     input is already at least that wide (the production case whose
  *     zero-shuffle pipelines must keep their shape). */
class WidthSpec extends SparkSpec {
  import spark.implicits._

  test("repIndex pins carry the session shuffle width, not AQE's coalesced width") {
    val docs = Tables.documents(spark, sf)
    // force a fresh build so the pin is created under this session conf
    graft.util.IndexCache.clear()
    val (_, verified) = graft.operators.Dedup.minhashRepPairs(
      docs, "text", "doc_id", 1, 12, 4, 0.8, null)
    verified.count() // materialize through the pinned frames
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pinned = spark.sparkContext.getPersistentRDDs.values
      .filter(r => graft.util.IndexCache.pinnedRddIds.contains(r.id))
    assert(pinned.nonEmpty, "expected pinned index frames")
    pinned.foreach { r =>
      assert(r.getNumPartitions >= width,
        s"pinned RDD ${r.id} has ${r.getNumPartitions} partitions " +
          s"< session width $width — AQE coalescing leaked into the pin")
    }
  }

  test("spreadIfNarrow: spreads a narrow scan, no-op on an already-wide frame") {
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val narrow = Tables.documents(spark, sf) // one-row-group file
    assert(narrow.rdd.getNumPartitions < width,
      "fixture assumption: the documents scan under-splits")
    val spreadN = Tables.spreadIfNarrow(narrow)
    assert(spreadN.rdd.getNumPartitions == width)
    val wide = spark.range(0, 1000, 1, width + 3).toDF("doc_id")
    val spreadW = Tables.spreadIfNarrow(wide)
    assert(spreadW.rdd.getNumPartitions == width + 3,
      "spreadIfNarrow must not reshuffle an already-wide frame")
    // value identity both ways
    assert(spreadN.select($"doc_id").as[Long].collect().sorted.toSeq ===
      narrow.select($"doc_id").as[Long].collect().sorted.toSeq)
  }

  test("spreadIfNarrow is scan-shape-gated: a shuffle-bearing plan returns unchanged (ADVICE r16)") {
    // the width probe reads df.rdd, which under AQE EXECUTES upstream
    // query stages — so any plan that is not leaf-under-row-local-ops
    // must come back as the SAME object, un-probed and un-executed
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val agg = Tables.documents(spark, sf).groupBy($"lang").count()
      val out = Tables.spreadIfNarrow(agg)
      assert(out eq agg, "non-scan plan must be returned unchanged")
      // drain the async listener queues DETERMINISTICALLY before the
      // absence assertion — a fixed sleep would let a job event posted
      // late slip past the check (ADVICE r17 #4)
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      assert(jobs === 0, "the width probe must not run on a non-scan plan")
      // and the scan-shaped fixture still goes through the probe path
      val narrow = Tables.documents(spark, sf).select($"doc_id")
      assert(Tables.spreadIfNarrow(narrow) ne narrow)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
