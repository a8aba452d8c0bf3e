package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence-packing manifest: exact offsets on a hand-checked corpus,
  * invariance to input partitioning (the distributed prefix scan must
  * be a pure function of id order), and the scale-shape guarantee that
  * the full-corpus window is partition-local. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token counts: 3, 5, 4, 2, 6 → cumulative 3, 8, 12, 14, 20
  private def docs(parts: Int) = Seq(
    (10L, "a b c"),
    (20L, "d e f g h"),
    (30L, "i j k l"),
    (40L, "m n"),
    (50L, "o p q r s t")
  ).toDF("doc_id", "text").repartition(parts)

  test("manifest: hand-checked offsets and pack ranges at capacity 5") {
    val got = Packing.manifest(docs(3), capacity = 5)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val expected = Array(
      (10L, 3L, 0L, 0L, 0L, 0L),   // tokens [0,3) → pack 0
      (20L, 5L, 3L, 0L, 1L, 3L),   // [3,8) straddles packs 0-1
      (30L, 4L, 8L, 1L, 2L, 3L),   // [8,12) straddles 1-2
      (40L, 2L, 12L, 2L, 2L, 2L),  // [12,14) inside pack 2
      (50L, 6L, 14L, 2L, 3L, 4L))  // [14,20) straddles 2-3
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("manifest is invariant to input partitioning") {
    val a = Packing.manifest(docs(1), capacity = 7).orderBy($"doc_id")
      .collect().toSeq
    spark.catalog.clearCache()
    val b = Packing.manifest(docs(7), capacity = 7).orderBy($"doc_id")
      .collect().toSeq
    spark.catalog.clearCache()
    assert(a === b)
  }

  test("manifestStream across micro-batches ≡ batch manifest (in-order lane)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{PackAssign, PackDoc}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PackDoc]
    val q = Packing.manifestStream(mem.toDS(), capacity = 5)
      .writeStream.format("memory").queryName("packs")
      .outputMode("append").start()
    try {
      // lane 1 in id order over two batches; lane 2 interleaved
      mem.addData(PackDoc(1, 10, 3), PackDoc(1, 20, 5), PackDoc(2, 15, 4))
      q.processAllAvailable()
      mem.addData(PackDoc(1, 30, 4), PackDoc(2, 25, 2))
      q.processAllAvailable()
      val got = spark.table("packs").as[PackAssign].collect()
        .map(p => (p.shard, p.doc_id) ->
          (p.n_tokens, p.start_offset, p.pack_first, p.pack_last, p.pack_offset))
        .toMap
      // lane 1 must equal the batch manifest of its docs
      val batch1 = Packing.manifest(
          Seq((10L, "a b c"), (20L, "d e f g h"), (30L, "i j k l"))
            .toDF("doc_id", "text"), capacity = 5)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      batch1.foreach { case (id, exp) => assert(got((1L, id)) === exp, s"doc $id") }
      // lane 2 packs independently from offset 0
      assert(got((2L, 15L)) === ((4L, 0L, 0L, 0L, 0L)))
      assert(got((2L, 25L)) === ((2L, 4L, 0L, 1L, 4L)))
      spark.catalog.clearCache()
    } finally q.stop()
  }

  test("plan: the corpus-wide running sum windows over pid, not globally") {
    val plan = Packing.manifest(docs(3), capacity = 5)
      .queryExecution.optimizedPlan.toString
    // the per-row running sum must be partitioned (windowspecdefinition
    // lists pid before the ORDER BY spec); only the bounded
    // partition-totals frame may carry an unpartitioned window
    assert(!plan.contains("windowspecdefinition(id#"),
      s"per-row window must partition by pid, found global id window:\n$plan")
    assert(plan.contains("windowspecdefinition(pid#"), plan)
    spark.catalog.clearCache()
  }

  test("curriculumOrder: arithmetic pos ≡ global-window form; interleave shape") {
    // three sources of sizes 3/2/1 with distinct scores
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 20L), (3L, "a", 10L),
      (4L, "b", 25L), (5L, "b", 5L),
      (6L, "c", 99L)
    ).toDF("doc_id", "source", "score")
    val got = Packing.curriculumOrder(df, "score")
      .orderBy($"pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // round 1: a→1, b→4, c→6; round 2: a→2, b→5; round 3: a→3
    assert(got.toList === List(
      (1L, "a", 1L, 1L), (4L, "b", 1L, 2L), (6L, "c", 1L, 3L),
      (2L, "a", 2L, 4L), (5L, "b", 2L, 5L),
      (3L, "a", 3L, 6L)))
    // differential vs the single-partition window form on a wider frame
    val wide = (0L until 200L).map(i =>
      (i, s"s${(i % 7)}", (i * 37 % 101))).toDF("doc_id", "source", "score")
    val arith = Packing.curriculumOrder(wide, "score")
    val w = org.apache.spark.sql.expressions.Window
    val windowed = wide
      .withColumn("round_no", row_number().over(
        w.partitionBy($"source").orderBy($"score".desc, $"doc_id")).cast("long"))
      .withColumn("pos", row_number().over(
        w.orderBy($"round_no", $"source")).cast("long"))
      .select($"doc_id", $"source", $"round_no", $"pos")
    assert(arith.orderBy($"pos").collect().toSeq ===
      windowed.orderBy($"pos").collect().toSeq)
    // scale shape: no global (unpartitioned) row_number window in the plan
    val plan = arith.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("windowspecdefinition(round_no"),
      s"global window leaked into curriculumOrder:\n$plan")
  }
}
