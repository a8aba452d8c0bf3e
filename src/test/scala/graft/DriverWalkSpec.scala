package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnGraph, MutationLog, Pq}
import graft.sources.{GraphStore, Tables}

/** Driver-resident serving walk (VERDICT r14 next #1): the public
  * serve paths run the beam walk on the driver — zero Spark jobs above
  * layer 0, at most two bounded point-lookup jobs per layer-0 hop —
  * and must be VALUE-IDENTICAL to the distributed walk they replace,
  * on every store shape: compacted single-batch, multi-batch after a
  * mutation fold (latest-batch-wins on edges, vectors AND codes), and
  * tombstoned (dead targets dropped at expansion). The bucket mirror
  * is Spark's own XxHash64 expression evaluated in-process — pinned
  * here against the engine column it prunes with. */
class DriverWalkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dw-$tag").toString

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  test("bucketOfLocal ≡ the engine's pmod(xxhash64(id), buckets) column") {
    val ids = spark.range(0, 1000).select($"id")
    Seq(8, 16, 64).foreach { b =>
      val engine = ids
        .select($"id", pmod(xxhash64($"id"), lit(b.toLong)).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      engine.foreach { case (id, want) =>
        assert(GraphStore.bucketOfLocal(id, b) === want,
          s"driver bucket drifted from the engine at id=$id buckets=$b")
      }
    }
  }

  test("driver serve ≡ distributed serve on a mutated, tombstoned hier store (exact + ADC, flat + hier)") {
    val dir = tmp("parity")
    try {
      val model = Pq.trainRefined(e, m = 8, ks = 16, iters = 1)
      val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2,
        rounds = 2, maxLevel = 1)
      GraphStore.write(layers, dir, buckets = 8)
      GraphStore.writeCorpus(e, dir)
      GraphStore.writeCodes(Pq.encode(e, model), dir)
      // one mutation batch: an insert, an upsert-of-existing, deletes —
      // multi-batch edges/vectors + a live tombstone set, the store
      // shape where every resolution rule is load-bearing
      val emb2 = e.filter($"vec_id" === 2L).select($"embedding")
        .head.getSeq[Float](0)
      val batch = Seq(
        (1L, MutationLog.Upsert, 1000001L, emb2),
        (2L, MutationLog.Upsert, 7L, emb2),
        (3L, MutationLog.Delete, 3L, null),
        (4L, MutationLog.Delete, 10L, null)
      ).toDF("log_index", "op", "id", "embedding")
      GraphStore.applyMutationBatch(batch, dir, 0L, m = 4, beam = 8,
        hops = 3, maxDegree = 6)
      // codes for the batch's ids land on the refresh cadence
      GraphStore.refreshCodes(spark, dir, model)
      val panel = Seq(0L, 42L, 137L, 251L, 400L)
      val qs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
        .localCheckpoint(true)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet

      val hierD = rows(GraphStore.hierSearchPointLookup(spark, dir, qs,
        beam = 8, hops = 3, k = 5))
      val hierX = rows(GraphStore.hierSearchPointLookupDistributed(spark,
        dir, qs, beam = 8, hops = 3, k = 5, upperBeam = 4, upperHops = 6,
        handoff = 4, idCol = "vec_id", embCol = "embedding"))
      assert(hierD === hierX, "exact hier serve drifted from distributed")
      assert(hierD.nonEmpty)
      assert(hierD.map(_._2).intersect(Set(3L, 10L)).isEmpty,
        "dead ids served")

      val entry = GraphStore.statsHead(spark, dir).getLong(4)
      val seeds = panel.map(q => (q, entry)).toDF("qid", "cand")
      val adcD = rows(GraphStore.searchPointLookupAdc(spark, dir, qs,
        seeds, model, beam = 8, hops = 3, k = 5))
      val adcX = rows(GraphStore.searchPointLookupAdcDistributed(spark,
        dir, qs, seeds, model, beam = 8, hops = 3, k = 5))
      assert(adcD === adcX, "flat ADC serve drifted from distributed")
      assert(adcD.nonEmpty)

      val hadcD = rows(GraphStore.hierSearchPointLookupAdc(spark, dir,
        qs, model, beam = 8, hops = 3, k = 5))
      val hadcX = rows(GraphStore.hierSearchPointLookupAdcDistributed(
        spark, dir, qs, model, beam = 8, hops = 3, k = 5, upperBeam = 4,
        upperHops = 6, handoff = 4))
      assert(hadcD === hadcX, "hier ADC serve drifted from distributed")
      assert(hadcD.nonEmpty)

      // compact folds everything to one batch — the single-batch fast
      // paths must serve the same values
      GraphStore.compact(spark, dir)
      assert(rows(GraphStore.hierSearchPointLookup(spark, dir, qs,
        beam = 8, hops = 3, k = 5)) === hierD,
        "compaction changed driver-served values")
    } finally rm(dir)
  }

  test("resident graph serve ≡ hierSearchPointLookupAdc on a mutated store, ZERO jobs per query") {
    val dir = tmp("resident")
    try {
      val model = Pq.trainRefined(e, m = 8, ks = 16, iters = 1)
      val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2,
        rounds = 2, maxLevel = 1)
      GraphStore.write(layers, dir, buckets = 8)
      GraphStore.writeCorpus(e, dir)
      GraphStore.writeCodes(Pq.encode(e, model), dir)
      // same mutation shape as the parity test: multi-batch edges/
      // vectors/codes + live tombstones — every resolution rule the
      // preload mirrors is load-bearing
      val emb2 = e.filter($"vec_id" === 2L).select($"embedding")
        .head.getSeq[Float](0)
      val batch = Seq(
        (1L, MutationLog.Upsert, 1000001L, emb2),
        (2L, MutationLog.Upsert, 7L, emb2),
        (3L, MutationLog.Delete, 3L, null),
        (4L, MutationLog.Delete, 10L, null)
      ).toDF("log_index", "op", "id", "embedding")
      GraphStore.applyMutationBatch(batch, dir, 0L, m = 4, beam = 8,
        hops = 3, maxDegree = 6)
      GraphStore.refreshCodes(spark, dir, model)
      val panel = Seq(0L, 42L, 137L, 251L, 400L)
      val qs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
        .localCheckpoint(true)
      // the point-lookup serve's rows, keyed per query, rank order
      val want: Map[Long, Seq[(Long, Double, Long)]] =
        GraphStore.hierSearchPointLookupAdc(spark, dir, qs, model,
          beam = 8, hops = 3, k = 5).collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
          .groupBy(_._1).map { case (q, rs) =>
            q -> rs.map(_._2).toSeq.sortBy(_._3) }
      val qvs: Map[Long, Array[Float]] = qs.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

      val serve = GraphStore.openResidentHier(spark, dir, model,
        beam = 8, hops = 3).get
      graft.util.DispatchMeter.register(spark.sparkContext)
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val j0 = graft.util.DispatchMeter.jobs
      panel.foreach { q =>
        assert(serve.search(qvs(q), 5) === want(q), s"qid=$q")
      }
      // batch serve: per-member ≡ single-query
      serve.searchBatch(panel.map(qvs), 5).zip(panel).foreach {
        case (hits, q) => assert(hits === want(q), s"batch qid=$q")
      }
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      assert(graft.util.DispatchMeter.jobs - j0 === 0,
        "resident graph serve must dispatch ZERO jobs per query")
      // residency caps: an over-cap store declines, caller falls back
      assert(GraphStore.openResidentHier(spark, dir, model,
        beam = 8, hops = 3, rowCap = 3).isEmpty)
      assert(GraphStore.openResidentHier(spark, dir, model,
        beam = 8, hops = 3, edgeCap = 3).isEmpty)
    } finally rm(dir)
  }

  test("driver serve job count: upper layers run zero jobs, layer-0 hops at most two each") {
    val dir = tmp("jobs")
    try {
      val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2,
        rounds = 2, maxLevel = 1)
      GraphStore.write(layers, dir, buckets = 8)
      GraphStore.writeCorpus(e, dir)
      val qs = e.filter($"vec_id" === 0L)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))
        .localCheckpoint(true)
      graft.util.DispatchMeter.register(spark.sparkContext)
      // warm the session-level caches the serve shares (query collect)
      GraphStore.hierSearchPointLookup(spark, dir, qs,
        beam = 8, hops = 3, k = 5).collect()
      val j0 = graft.util.DispatchMeter.jobs
      GraphStore.hierSearchPointLookup(spark, dir, qs,
        beam = 8, hops = 3, k = 5).collect()
      val jobs = graft.util.DispatchMeter.jobs - j0
      // budget: queries collect (1) + stats head (1) + upper layer
      // edges+values (2) + L0: seed-values (1) + hops × (adj + values)
      // (6) + slack for listing-free metadata jobs
      assert(jobs <= 15,
        s"driver serve dispatched $jobs jobs — the walk is not driver-resident")
      info(s"driver hier serve dispatched $jobs jobs")
    } finally rm(dir)
  }
}
