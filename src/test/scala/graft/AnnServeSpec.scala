package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables
import graft.streaming.AnnServe

/** Online-serving parity: the streamed single-plan form must answer
  * each arriving query micro-batch with exactly the batch engine's
  * result ([[Ann.search]] — same centroids, same nprobe, same
  * tie-break), emitted once per query. */
@HeavyTest
class AnnServeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ANN serving ≡ Ann.search for every arriving query") {
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.embeddings(spark, sf)
    val centroids = Ann.seedCentroids(e, 8)
    val mem = MemoryStream[(Long, Seq[Float])]
    val served = AnnServe.annServeStream(
      mem.toDF().toDF("query_id", "qvec"), e, centroids, k = 5, nprobe = 2)
    val out = s"ann_serve_${System.nanoTime()}"
    // O-13 → serving path: the node config's batching block becomes the
    // processing-time trigger (delay-based request coalescing)
    val cfg = graft.util.ConfigLoader.fromString(
      """batching {
        |  preferred_batch_size: 4
        |  max_batch_delay_ms: 5
        |}""".stripMargin)
    val q = AnnServe.startServing(served, out, cfg.batching)
    try {
      val qvecs = e.filter($"vec_id".isin(3L, 17L, 120L))
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      // two arrival waves — a query's answer is final in its own batch
      mem.addData(qvecs(0))
      q.processAllAvailable()
      mem.addData(qvecs(1), qvecs(2))
      q.processAllAvailable()
      val got = spark.table(out)
        .select($"query_id", posexplode($"topk"))
        .select($"query_id", $"col.id".as("vec_id"), $"col.distance".as("distance"),
          ($"pos" + 1).cast("long").as("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val queries = e.filter($"vec_id".isin(3L, 17L, 120L))
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val expect = Ann.search(e, centroids, queries, k = 5, nprobe = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got === expect)
      assert(got.nonEmpty)
      // update mode + batch-final results: each query row emitted ONCE
      val emits = spark.table(out).groupBy($"query_id").count().collect()
      assert(emits.length === 3)
      assert(emits.forall(_.getLong(1) === 1L))
      // a RE-SENT query id (the RPC retry) is dropped: no re-emission,
      // and the stored topk is NOT corrupted by a duplicate-merging
      // re-score of its restored aggregation state
      mem.addData(qvecs(0))
      q.processAllAvailable()
      val after = spark.table(out)
        .select($"query_id", posexplode($"topk"))
        .select($"query_id", $"col.id".as("vec_id"), $"col.distance".as("distance"),
          ($"pos" + 1).cast("long").as("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(after === expect)
      val reEmits = spark.table(out).groupBy($"query_id").count().collect()
      assert(reEmits.forall(_.getLong(1) === 1L))
    } finally q.stop()
  }

  test("store-backed streaming serving ≡ batch hierSearch per arriving batch; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.KnnGraph
    import graft.sources.GraphStore
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2, rounds = 2,
      maxLevel = 1).map(_.persist())
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-serve-$tag").toString
    val dir = tmp("store"); val out = tmp("out"); val ckpt = tmp("ckpt")
    try {
      GraphStore.write(layers, dir, buckets = 8)
      GraphStore.writeCorpus(e, dir)
      layers.foreach(_.unpersist(false))
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = AnnServe.serveGraphStore(
        mem.toDF().toDF("query_id", "qvec"), dir, out, ckpt,
        k = 5, beam = 8, hops = 3)
      val panel = Seq(0L, 42L, 137L, 300L)
      val qvecs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      try {
        // two arrival waves
        mem.addData(qvecs(0), qvecs(1)); q.processAllAvailable()
        mem.addData(qvecs(2), qvecs(3)); q.processAllAvailable()
      } finally q.stop()
      def results() = spark.read.parquet(out)
        .select($"query_id", $"vec_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = results()
      // batch reference: the in-memory hier walk over the SAME store
      // layers and the whole panel at once (value-identical to the
      // point-lookup serving walk by the GraphStoreSpec contract)
      val qs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val expect = GraphStore.hierSearch(spark, dir, e, qs,
          beam = 8, hops = 3, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === expect,
        "streamed store-served results drifted from the batch hier walk")
      // failure replay: re-applying the LAST batch id recomputes the
      // identical walk and overwrites its own partition — results
      // unchanged
      val lastBatch = Seq(qvecs(2), qvecs(3)).toDF("query_id", "qvec")
      AnnServe.applyServeGraphStoreBatch(lastBatch, dir, out, 1L,
        k = 5, beam = 8, hops = 3, upperBeam = 4, upperHops = 6,
        handoff = 4, "query_id", "qvec")
      assert(results() === expect, "batch replay changed the served results")
    } finally {
      Seq(dir, out, ckpt).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("ADC streaming serving ≡ the batch hier ADC walk per arriving batch; replay is a no-op") {
    // the serveGraphStore fixture under compressed navigation: model
    // loaded once from the ModelStore at stream start, every micro-batch
    // descends the persisted level stack by integer ADC, results land
    // exactly-once per batch partition
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{KnnGraph, Pq}
    import graft.sources.{GraphStore, ModelStore}
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val model = Pq.trainRefined(e, m = 8, ks = 16, iters = 1)
    val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2, rounds = 2,
      maxLevel = 1).map(_.persist())
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-serve-$tag").toString
    val dir = tmp("adcstore"); val out = tmp("adcout"); val ckpt = tmp("adcckpt")
    try {
      GraphStore.write(layers, dir, buckets = 8)
      GraphStore.writeCorpus(e, dir)
      GraphStore.writeCodes(Pq.encode(e, model), dir)
      ModelStore.writePq(spark, model, s"$dir/model/pq")
      layers.foreach(_.unpersist(false))
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = AnnServe.serveGraphStoreAdc(
        mem.toDF().toDF("query_id", "qvec"), dir, s"$dir/model/pq", out,
        ckpt, k = 5, beam = 8, hops = 3)
      val panel = Seq(0L, 42L, 137L, 300L)
      val qvecs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      try {
        mem.addData(qvecs(0), qvecs(1)); q.processAllAvailable()
        mem.addData(qvecs(2), qvecs(3)); q.processAllAvailable()
      } finally q.stop()
      def results() = spark.read.parquet(out)
        .select($"query_id", $"vec_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = results()
      // batch reference: the same hier ADC walk over the whole panel
      val qs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
      val expect = GraphStore.hierSearchPointLookupAdc(spark, dir, qs,
          model, beam = 8, hops = 3, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === expect,
        "streamed ADC-served results drifted from the batch hier ADC walk")
      val lastBatch = Seq(qvecs(2), qvecs(3)).toDF("query_id", "qvec")
      AnnServe.applyServeGraphStoreAdcBatch(lastBatch, dir, out, 1L,
        model, k = 5, beam = 8, hops = 3, upperBeam = 4, upperHops = 6,
        handoff = 4, "query_id", "qvec")
      assert(results() === expect, "batch replay changed the served results")
    } finally {
      Seq(dir, out, ckpt).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
