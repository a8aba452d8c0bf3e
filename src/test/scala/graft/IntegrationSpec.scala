package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Knn, MutationLog}
import graft.queries.LogQueries
import graft.sources.{Tables, VectorStore}

/** The reference's full lifecycle, end-to-end on real testdata:
  * mutation log → replay → persisted shard-partitioned snapshot →
  * reload → (pruned) search. SURVEY.md §3 as one test. */
@HeavyTest
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

  test("mutation log drives the served graph index: streamed upserts + deletes fold into the GraphStore ≡ log replay") {
    // the reference's ENTIRE write path (raft_state.cc:416-459 apply
    // loop → shard_manager routing of UPSERT/DELETE) landing in the
    // served ANN index: a mutation stream folds through
    // GraphStore.applyMutationStream — upserts insert/replace,
    // deletes tombstone — and afterward (a) the store corpus IS the
    // MutationLog.replay of the full history, (b) the walk serves
    // upserted state and never a deleted id, (c) a replayed batch is a
    // no-op, (d) maintain purges the tombstones with values intact.
    import graft.sources.GraphStore
    import graft.operators.KnnGraph
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val base = e.filter($"vec_id" % 4 === 0)
    val embOf: Map[Long, Seq[Float]] = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    // three mutation batches: fresh inserts, then deletes + an
    // upsert-of-existing (id 0 takes id 16's embedding), then a
    // REVIVING re-upsert of a deleted id + a delete of a streamed id
    val b1 = e.filter($"vec_id" % 4 === 1).collect().zipWithIndex.map {
      case (r, i) => (1000L + i, MutationLog.Upsert, r.getLong(0),
        r.getSeq[Float](1).toSeq)
    }.toSeq
    val b2 = Seq(
      (2000L, MutationLog.Delete, 4L, Seq.empty[Float]),
      (2001L, MutationLog.Delete, 8L, Seq.empty[Float]),
      (2002L, MutationLog.Upsert, 0L, embOf(16L)))
    val b3 = Seq(
      (3000L, MutationLog.Upsert, 8L, embOf(20L)), // revive
      (3001L, MutationLog.Delete, 1L, Seq.empty[Float]))
    val dir = Files.createTempDirectory("graft-mutgraph").toString
    val ckpt = Files.createTempDirectory("graft-mutgraph-ckpt").toString
    val layers = KnnGraph.buildHierGraph(base, m = 4, ringM = 2,
      rounds = 2, maxLevel = 1)
    GraphStore.write(layers, dir, buckets = 8)
    GraphStore.writeCorpus(base, dir)
    val mem = MemoryStream[(Long, String, Long, Seq[Float])]
    val q = GraphStore.applyMutationStream(
      mem.toDF().toDF("log_index", "op", "id", "embedding"),
      dir, ckpt, m = 4, beam = 8, hops = 3, maxDegree = 6)
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // (a) corpus ≡ replay of the full history (base rows as the
    // initial upsert prefix)
    val log = base.select(($"vec_id" + lit(0L)).as("id"), $"embedding",
        lit("s0").as("shard_id"), lit(MutationLog.Upsert).as("op"),
        $"vec_id".as("log_index"))
      .unionByName((b1 ++ b2 ++ b3)
        .toDF("log_index", "op", "id", "embedding")
        .select($"id", $"embedding", lit("s0").as("shard_id"), $"op",
          $"log_index"))
    val expected = MutationLog.replay(log)
      .select($"id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet
    def corpusState() = GraphStore.readCorpus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet
    assert(corpusState() === expected,
      "store corpus diverged from the mutation-log replay")
    // (b) serving semantics: the upserted id answers at its NEW
    // embedding; the revived id serves; the deleted ids never appear
    def top1(qv: Seq[Float]) = GraphStore.hierSearchPointLookup(spark,
        dir, Seq((99L, qv)).toDF("qid", "qv"), beam = 12, hops = 6, k = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(top1(embOf(16L)) === Seq((0L, 0.0)),
      "upserted id must serve its new embedding")
    assert(top1(embOf(20L)) === Seq((8L, 0.0)),
      "revived id must serve again")
    val nearDeleted = GraphStore.hierSearchPointLookup(spark, dir,
        Seq((99L, embOf(4L))).toDF("qid", "qv"), beam = 12, hops = 6, k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(!nearDeleted.contains(4L) && !nearDeleted.contains(1L),
      "deleted ids leaked into the serve")
    // (c) failure replay of the last batch is a no-op
    GraphStore.applyMutationBatch(
      b3.toDF("log_index", "op", "id", "embedding"), dir, 2L,
      m = 4, beam = 8, hops = 3, maxDegree = 6)
    assert(corpusState() === expected, "batch replay changed the store")
    // (d) maintain purges tombstones, values intact, still serving
    GraphStore.maintain(spark, dir, m = 4, ringM = 2)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(corpusState() === expected, "maintain changed the state")
    assert(top1(embOf(16L)) === Seq((0L, 0.0)),
      "maintained store lost the upserted state")
  }

  test("mutation log drives the served IVF-PQ index: one stream folds upserts+deletes ≡ log replay; batch replay no-op") {
    // VERDICT r13 next #2, IVF-PQ family: appendStreamIvfPq +
    // deleteStream were separate streams a user could desynchronize;
    // applyMutationStreamIvfPq lands both halves of every micro-batch
    // under one checkpoint. Afterward readLive IS the MutationLog
    // replay of the full history, cell-assigned and PQ-encoded.
    import graft.operators.{Ann, Pq}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val embOf: Map[Long, Seq[Float]] = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val centroids = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val model = Pq.trainRefined(e, m = 8, ks = 16, iters = 1)
    // three batches: inserts, deletes + upsert-of-existing, revive
    val b1 = e.filter($"vec_id" % 4 === 1).collect().zipWithIndex.map {
      case (r, i) => (1000L + i, MutationLog.Upsert, r.getLong(0),
        r.getSeq[Float](1).toSeq)
    }.toSeq
    val b2 = Seq(
      (2000L, MutationLog.Delete, 5L, embOf(5L)), // payload ignored on delete
      (2001L, MutationLog.Upsert, 1L, embOf(17L)))
    val b3 = Seq(
      (3000L, MutationLog.Upsert, 5L, embOf(21L)), // revive
      (3001L, MutationLog.Delete, 9L, embOf(9L)))
    val dir = Files.createTempDirectory("graft-mutivfpq").toString + "/store"
    val ckpt = Files.createTempDirectory("graft-mutivfpq-ckpt").toString
    val mem = MemoryStream[(Long, String, Long, Seq[Float])]
    val q = VectorStore.applyMutationStreamIvfPq(
      mem.toDF().toDF("log_index", "op", "vec_id", "embedding"),
      centroids, model, dir, ckpt)
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // the served live state ≡ cell-assign + encode of the log replay
    val log = (b1 ++ b2 ++ b3)
      .toDF("log_index", "op", "id", "embedding")
      .select($"id", $"embedding", lit("s0").as("shard_id"), $"op",
        $"log_index")
    val expected = MutationLog.replay(log)
      .select($"id".as("vec_id"),
        Ann.nearestCell($"embedding", centroids).as("cell"),
        Pq.encodeCol($"embedding", model).as("codes"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2).toSeq)).toSet
    def liveState() = VectorStore.readLive(spark, dir, idCol = "vec_id")
      .select($"vec_id", $"cell".cast("long"), $"codes")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2).toSeq)).toSet
    assert(liveState() === expected,
      "IVF-PQ fold diverged from the mutation-log replay")
    // crash replay of the last batch is a no-op (same batch id)
    VectorStore.applyMutationBatchIvfPq(
      b3.toDF("log_index", "op", "vec_id", "embedding"),
      centroids, model, dir, 2L)
    assert(liveState() === expected, "batch replay changed the store")
    // the probe path prunes on the folded layout: cells are partition
    // dirs under every batch, so a cell filter still prunes the scan
    val probed = VectorStore.readLive(spark, dir, idCol = "vec_id")
      .filter($"cell" === expected.head._2)
    assert(probed.count() ===
      expected.count(_._2 == expected.head._2).toLong)
  }

  test("IndexFanout: ONE mutation stream drives all four index families in lockstep; crash replay no-op everywhere") {
    // the full-width apply loop (raft_state.cc:416-459): one stream,
    // one checkpoint, every micro-batch folded into the graph store,
    // the MIH index, the IVF-PQ cell store, AND the inverted index
    // before it commits — the anti-desync shape VERDICT r13 missing #1
    // asked for (hand-wired per-family streams can crash between
    // families and serve inconsistent results across probes).
    import graft.operators.{Ann, Bq, Pq}
    import graft.sources.{BinaryStore, GraphStore, IndexFanout, IndexStore}
    import graft.operators.KnnGraph
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val embOf: Map[Long, Seq[Float]] = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val docText: Map[Long, String] = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def textOf(id: Long): String = docText(id % 500)
    val base = e.filter($"vec_id" % 4 === 0)
    val baseIds = base.select($"vec_id").collect().map(_.getLong(0)).toSeq
    val centroids = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val model = Pq.trainRefined(e, m = 8, ks = 16, iters = 1)
    val root = Files.createTempDirectory("graft-fanout").toString
    val (gDir, bDir, vDir, iDir) =
      (s"$root/graph", s"$root/mih", s"$root/ivfpq", s"$root/postings")
    GraphStore.write(KnnGraph.buildHierGraph(base, m = 4, ringM = 2,
      rounds = 2, maxLevel = 1), gDir, buckets = 8)
    GraphStore.writeCorpus(base, gDir)
    BinaryStore.write(Bq.encode(base, 64)
      .select($"vec_id", array($"sig").as("sig")), bDir)
    IndexStore.write(baseIds.map(id => (id, textOf(id)))
      .toDF("doc_id", "text"), iDir, buckets = 8)
    // three mutation batches: inserts, deletes + upsert-of-existing,
    // revive — each row carries BOTH payloads (the hybrid-corpus shape)
    val b1 = e.filter($"vec_id" % 4 === 1).collect().zipWithIndex.map {
      case (r, i) => (1000L + i, MutationLog.Upsert, r.getLong(0),
        r.getSeq[Float](1).toSeq, textOf(r.getLong(0)))
    }.toSeq
    val b2 = Seq(
      (2000L, MutationLog.Delete, 4L, Seq.empty[Float], ""),
      (2001L, MutationLog.Upsert, 0L, embOf(16L), textOf(77L)))
    val b3 = Seq(
      (3000L, MutationLog.Upsert, 8L, embOf(20L), textOf(88L)), // revive
      (3001L, MutationLog.Delete, 1L, Seq.empty[Float], ""))
    val cfg = IndexFanout.Config(
      graphPath = Some(gDir), graphM = 4, graphBeam = 8, graphHops = 3,
      graphMaxDegree = 6,
      binaryPath = Some(bDir), binaryDim = 64,
      ivfPqPath = Some(vDir), centroids = centroids, pqModel = Some(model),
      indexPath = Some(iDir))
    val mem = MemoryStream[(Long, String, Long, Seq[Float], String)]
    val q = IndexFanout.applyMutationStream(
      mem.toDF().toDF("log_index", "op", "id", "embedding", "text"),
      s"$root/ckpt", cfg)
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // the replayed truth (base as the initial upsert prefix)
    val log = base.select($"vec_id".as("id"), $"embedding",
        lit("s0").as("shard_id"), lit(MutationLog.Upsert).as("op"),
        $"vec_id".as("log_index"))
      .unionByName((b1 ++ b2 ++ b3)
        .toDF("log_index", "op", "id", "embedding", "text")
        .select($"id", $"embedding", lit("s0").as("shard_id"), $"op",
          $"log_index"))
    val replayed = MutationLog.replay(log)
      .select($"id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    val expectedCorpus = replayed.toSet
    // family 1 — graph: corpus ≡ replay; the walk serves the upsert
    def checkAll(tag: String): Unit = {
      val corpus = GraphStore.readCorpus(spark, gDir).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet
      assert(corpus === expectedCorpus, s"[$tag] graph corpus diverged")
      val top1 = GraphStore.hierSearchPointLookup(spark, gDir,
          Seq((99L, embOf(16L))).toDF("qid", "qv"), beam = 12, hops = 6, k = 1)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(top1 === Seq((0L, 0.0)), s"[$tag] graph walk missed the upsert")
      // family 2 — MIH: upserted id serves its NEW signature once;
      // deleted id 4 never probes
      val sig16 = Array(Bq.signBitsLocal(embOf(16L).toArray))
      val probe = BinaryStore.probe(spark, bDir, sig16, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(probe.count(_._1 == 0L) === 1 &&
        probe.find(_._1 == 0L).get._2 === 0L,
        s"[$tag] MIH probe wrong for the upserted id: ${probe.toSeq}")
      val probe4 = BinaryStore.probe(spark, bDir,
          Array(Bq.signBitsLocal(embOf(4L).toArray)), k = 10)
        .collect().map(_.getLong(0))
      assert(!probe4.contains(4L), s"[$tag] MIH serves a deleted id")
      // family 3 — IVF-PQ: live state ≡ cell-assign + encode of the
      // batch-only replay (this store starts from the stream)
      val expIvf = MutationLog.replay((b1 ++ b2 ++ b3)
          .toDF("log_index", "op", "id", "embedding", "text")
          .select($"id", $"embedding", lit("s0").as("shard_id"), $"op",
            $"log_index"))
        .select($"id".as("vec_id"),
          Ann.nearestCell($"embedding", centroids).as("cell"),
          Pq.encodeCol($"embedding", model).as("codes"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2).toSeq)).toSet
      val gotIvf = VectorStore.readLive(spark, vDir, idCol = "id")
        .select($"id", $"cell".cast("long"), $"codes")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2).toSeq)).toSet
      assert(gotIvf === expIvf, s"[$tag] IVF-PQ fold diverged")
      // family 4 — postings: BM25 ≡ a fresh index over the replayed
      // docs (text replays by the same last-op rule)
      val liveTexts = scala.collection.mutable.Map[Long, String](
        baseIds.map(id => id -> textOf(id)): _*)
      (b1 ++ b2 ++ b3).sortBy(_._1).foreach {
        case (_, op, id, _, t) =>
          if (op == MutationLog.Upsert) liveTexts(id) = t
          else liveTexts.remove(id)
      }
      val freshDir = s"$root/fresh-$tag"
      IndexStore.write(liveTexts.toSeq.toDF("doc_id", "text"),
        freshDir, buckets = 8)
      val terms = Seq("spark", "window")
      val got = IndexStore.bm25TopK(spark, iDir, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = IndexStore.bm25TopK(spark, freshDir, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === want, s"[$tag] BM25 diverged from the replayed corpus")
    }
    checkAll("post-stream")
    // crash replay of the LAST batch across the whole fan-out: every
    // family rewrites its own partitions with identical bytes
    IndexFanout.applyMutationBatch(
      b3.toDF("log_index", "op", "id", "embedding", "text"), 2L, cfg)
    checkAll("replay")
    // PARTIAL fan-out crash (VERDICT r14 next #4): a batch that died
    // after ONE family landed — the stream replays the WHOLE batch;
    // the family that already landed rewrites identical bytes and all
    // four converge to the state of a clean single application.
    val b4 = Seq(
      (4000L, MutationLog.Upsert, 2L, embOf(24L), textOf(99L)),
      (4001L, MutationLog.Delete, 8L, Seq.empty[Float], ""))
    val b4df = b4.toDF("log_index", "op", "id", "embedding", "text")
    // crash simulation: only the graph family lands before the "crash"
    GraphStore.applyMutationBatch(b4df, gDir, 3L, m = 4, beam = 8,
      hops = 3, maxDegree = 6, idCol = "id")
    // the stream's recovery: the whole batch replays at full width
    IndexFanout.applyMutationBatch(b4df, 3L, cfg)
    def stateAll(): (Set[(Long, Seq[Float])], Set[(Long, Long)],
        Seq[(Long, Long)], Set[(Long, Long, Seq[Int])],
        Seq[(Long, Long)], Seq[Long]) = (
      GraphStore.readCorpus(spark, gDir).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet,
      GraphStore.read(spark, gDir, 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      BinaryStore.probe(spark, bDir,
          Array(Bq.signBitsLocal(embOf(24L).toArray)), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      VectorStore.readLive(spark, vDir, idCol = "id")
        .select($"id", $"cell".cast("long"), $"codes")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Int](2).toSeq)).toSet,
      IndexStore.bm25TopK(spark, iDir, Seq("spark", "window"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      GraphStore.deadIdSeq(spark, gDir))
    val afterReplay = stateAll()
    // a second full replay is a no-op everywhere
    IndexFanout.applyMutationBatch(b4df, 3L, cfg)
    assert(stateAll() === afterReplay,
      "partial-crash replay left non-idempotent state in some family")
    // semantics of the partial-crash batch: 2 serves its payload, the
    // b3-revived 8 is dead again across families
    val top2 = GraphStore.hierSearchPointLookup(spark, gDir,
        Seq((98L, embOf(24L))).toDF("qid", "qv"), beam = 12, hops = 6, k = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(top2 === Seq((2L, 0.0)), s"partial-crash upsert not served: $top2")
    assert(afterReplay._6.contains(8L), "b4 delete missing from dead set")
    assert(!afterReplay._4.exists(_._1 == 8L), "IVF-PQ still serves id 8")
    // PARTIAL compaction sweep (VERDICT r14 next #4's other half): one
    // family folds alone — the crash — then the composed sweep re-runs;
    // compaction is layout-only, so every observable value is invariant
    // and every family ends on the single batch_id=-1 layout.
    BinaryStore.compact(spark, bDir) // the lone pre-crash fold
    IndexFanout.maintain(spark, cfg) // the re-run sweep
    val afterSweep = stateAll()
    assert((afterSweep._1, afterSweep._2, afterSweep._3, afterSweep._4,
      afterSweep._5) === ((afterReplay._1, afterReplay._2, afterReplay._3,
      afterReplay._4, afterReplay._5)),
      "compaction sweep changed served values")
    assert(afterSweep._6.isEmpty, "sweep left tombstones behind")
    def batchDirs(d: String): Set[String] = {
      val f = new java.io.File(d)
      if (!f.exists) Set.empty
      else f.listFiles().filter(_.getName.startsWith("batch_id="))
        .map(_.getName).toSet
    }
    assert(batchDirs(s"$gDir/edges") === Set("batch_id=-1"))
    assert(batchDirs(s"$gDir/vectors") === Set("batch_id=-1"))
    assert(batchDirs(s"$bDir/index") === Set("batch_id=-1"))
    assert(batchDirs(vDir) === Set("batch_id=-1"))
    assert(batchDirs(s"$iDir/postings") === Set("batch_id=-1"))
    assert(!new java.io.File(s"$gDir/tombstones").exists, "graph tombstones survived")
    assert(!new java.io.File(s"$vDir/_tombstones").exists, "ivfpq tombstones survived")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
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

  // VERDICT r7: the MemoryStream parity below proves the FOLD; this
  // proves the DEPLOYMENT SHAPE — log segments landing as parquet files
  // in a watched directory, discovered incrementally, with the
  // flatMapGroupsWithState store surviving a query RESTART from its
  // checkpoint. File-source offsets + state-store commit versions are
  // exactly the semantics a MemoryStream cannot exercise: the fold must
  // be exactly-once across process generations, not just across
  // micro-batches of one query.
  test("compactLog from a file-source log directory: incremental segments + checkpoint restart") {
    import graft.streaming.EventStreams
    import EventStreams.{LogRecord, StateChange}
    val logDf = LogQueries.syntheticLog(spark, sf)
    val records = logDf.select($"log_index", $"op", $"id", $"shard_id", $"embedding")
      .as[(Long, String, Long, String, Seq[Float])].collect()
      .sortBy(_._1)
      .map { case (i, op, id, sh, emb) => LogRecord(i, op, id, sh, emb) }
    val segs = records.grouped(records.length / 4 + 1).toSeq // 4 log segments
    val watch = Files.createTempDirectory("graft-logseg").toString
    val ckpt = Files.createTempDirectory("graft-logckpt").toString
    val outDir = Files.createTempDirectory("graft-logout").toString
    def writeSeg(s: Seq[LogRecord]): Unit =
      s.toDS().coalesce(1).write.mode("append").parquet(watch)
    // parquet sink, not memory: the memory sink is not fault-tolerant
    // and refuses checkpoint recovery — a durable sink is the point of
    // this test (and the deployment shape: change log → parquet)
    def startQuery() = EventStreams.compactLog(
        spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[LogRecord].schema)
          .option("maxFilesPerTrigger", "1") // one micro-batch per segment
          .parquet(watch).as[LogRecord])
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    def emitted(): Seq[StateChange] =
      spark.read.parquet(outDir).as[StateChange].collect().toSeq

    // generation 1: segments arrive while the query runs
    writeSeg(segs(0))
    val q1 = startQuery()
    val gen1 = try {
      q1.processAllAvailable()
      writeSeg(segs(1))
      q1.processAllAvailable()
      emitted()
    } finally q1.stop()
    // generation 2: two more segments land while no query runs; the
    // restart resumes from the checkpointed offsets + key state
    writeSeg(segs(2)); writeSeg(segs(3))
    val q2 = startQuery()
    val all = try {
      q2.processAllAvailable()
      emitted()
    } finally q2.stop()
    assert(gen1.nonEmpty && all.size > gen1.size) // both generations emitted
    // exactly-once across the restart: recovered state + committed
    // offsets mean no change row is ever emitted twice
    val keys = all.map(c => (c.shardId, c.id, c.logIndex))
    assert(keys.size === keys.toSet.size)
    // the combined change log folds to the batch replay — same winners,
    // same winning log_index
    val streamed = all
      .groupBy(c => (c.shardId, c.id)).values
      .map(_.maxBy(_.logIndex)).filter(_.present)
      .map(c => (c.shardId, c.id, c.logIndex)).toSet
    val batched = MutationLog.replay(logDf)
      .select($"shard_id", $"id", $"log_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batched)
  }

  // EventStreams' contract is that the SAME plan incrementalizes: this
  // runs the composed two-stateful-operator pipeline (dedupStream →
  // hourlyRollup) over the real events fixture, fed as ts-ordered
  // micro-batches, and asserts the streamed result equals the identical
  // plan executed as one batch.
  //
  // Determinism: the dedup key is HOUR-SCOPED (event_type : user bucket
  // : hour-truncated ts), so whichever duplicate survives — batch picks
  // arbitrarily, the stream keeps first-arrival — it lands in the same
  // (hour, event_type) window and the window COUNTS are
  // survivor-invariant. `revenue` is not (it depends on which row
  // survives), so the parity contract is (hour, event_type, n) only.
  test("streaming dedupStream→hourlyRollup over events fixture matches the batch plan") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    implicit val sqlCtx = spark.sqlContext

    def keyed(df: DataFrame): DataFrame =
      df.withColumn("text", concat_ws(":",
        $"event_type", $"user_id" % 2, date_trunc("hour", $"ts").cast("string")))
    def pipeline(df: DataFrame): DataFrame = // streaming form
      EventStreams.hourlyRollupOnWatermarked(
          EventStreams.dedupStream(keyed(df), "ts", "text", "2 hours"))
        .select($"hour", $"event_type", $"n")
    def pipelineBatch(df: DataFrame): DataFrame =
      EventStreams.hourlyRollupOnWatermarked(EventStreams.dedupBatch(keyed(df)))
        .select($"hour", $"event_type", $"n")

    val rows = Tables.events(spark, sf)
      .select($"ts", $"event_type", $"user_id", $"value").as[Ev]
      .collect().sortBy(_.ts.getTime) // in-order arrival: no late drops
    val mem = MemoryStream[Ev]
    val out = s"graft_parity_out_${System.nanoTime()}"
    val q = pipeline(mem.toDF()).writeStream.outputMode("append")
      .format("memory").queryName(out).start()
    try {
      rows.grouped(300).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable() // one micro-batch per chunk
      }
      // sentinel far past the fixture: advances the watermark so every
      // real window finalizes (its own window never does → not emitted)
      mem.addData(Ev(new java.sql.Timestamp(
        rows.last.ts.getTime + 8 * 3600_000L), "sentinel", -1L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table(out).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batched = pipelineBatch(rows.toSeq.toDF()).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batched)
      // the dedup is not vacuous: duplicates were actually dropped
      val kept = streamed.toSeq.map(_._3).sum
      assert(kept < rows.length, s"dedup dropped nothing (kept=$kept)")
      assert(kept > 0)
    } finally q.stop()
  }

  // compactLog's contract is "the incremental MutationLog.replay": fold
  // the fixture log through the stream in log_index-ordered micro-batches
  // and assert the accumulated state (last emitted change per key, present
  // only) equals the batch replay fold — same winners, same winning
  // log_index, including the cross-shard re-upsert quirk (the old shard's
  // entry stays live under its own (shard_id, id) key).
  test("compactLog stream state converges to MutationLog.replay over the fixture log") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import EventStreams.{LogRecord, StateChange}
    implicit val sqlCtx = spark.sqlContext

    val logDf = LogQueries.syntheticLog(spark, sf)
    val records = logDf.select($"log_index", $"op", $"id", $"shard_id", $"embedding")
      .as[(Long, String, Long, String, Seq[Float])].collect()
      .sortBy(_._1)
      .map { case (i, op, id, sh, emb) => LogRecord(i, op, id, sh, emb) }
    val mem = MemoryStream[LogRecord]
    val out = s"graft_compact_parity_${System.nanoTime()}"
    val q = EventStreams.compactLog(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName(out).start()
    try {
      records.grouped(250).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table(out).as[StateChange].collect()
        .groupBy(c => (c.shardId, c.id)).values
        .map(_.maxBy(_.logIndex)).filter(_.present)
        .map(c => (c.shardId, c.id, c.logIndex)).toSet
      val batched = MutationLog.replay(logDf)
        .select($"shard_id", $"id", $"log_index").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batched)
      assert(streamed.nonEmpty)
      // the quirk is live in the fixture: some id exists in two shards
      val multiShard = streamed.groupBy(_._2).exists(_._2.size > 1)
      assert(multiShard, "expected at least one cross-shard duplicate id")
    } finally q.stop()
  }

  test("compact: N micro-batches of streaming appends → bounded files, identical probes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Pq
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-compact")
    val cents = Seq(0L -> Array(0f, 0f), 1L -> Array(10f, 10f))
    val corpus = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val m2 = Pq.train(corpus, m = 2, ks = 2)
    val mem = MemoryStream[(String, Long, Seq[Float])]
    val q = VectorStore.appendStreamIvfPq(
      mem.toDF().toDF("op", "vec_id", "embedding"), cents, m2,
      s"$dir/store", s"$dir/ckpt")
    try {
      // 6 micro-batches, each landing a file set in both cells
      (0 until 6).foreach { b =>
        mem.addData(
          ("UPSERT", b * 2L + 10, Seq(0.1f + b, 0.2f)),
          ("UPSERT", b * 2L + 11, Seq(9.5f, 9.5f - b)))
        q.processAllAvailable()
      }
    } finally q.stop()
    def cellFiles(cell: Int): Int =
      new java.io.File(s"$dir/store/cell=$cell").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(cellFiles(0) >= 6 && cellFiles(1) >= 6, "appends should accumulate files")
    val before = spark.read.parquet(s"$dir/store").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getSeq[Int](r.fieldIndex("codes")))).sortBy(_._1).toSeq
    val report = VectorStore.compact(spark, s"$dir/store", maxFilesPerCell = 2)
    assert(report.map(_._1).toSet === Set("cell=0", "cell=1"))
    assert(report.forall { case (_, b, a) => b >= 6 && a == 1 })
    assert(cellFiles(0) === 1 && cellFiles(1) === 1)
    assert(!new java.io.File(s"$dir/store/_spark_metadata").exists,
      "the streaming sink log must be retired with the files it indexes")
    val after = spark.read.parquet(s"$dir/store").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getSeq[Int](r.fieldIndex("codes")))).sortBy(_._1).toSeq
    assert(after === before, "compaction must not change a single value")
    // the probe path still prunes to one partition directory and ranks
    // identically over the compacted 8-byte codes
    val probe = Pq.ivfAdcTopK(
      spark.read.parquet(s"$dir/store"), cents, m2,
      Array(0.1f, 0.2f), k = 3, nprobe = 1)
    assert(probe.collect().map(_.getLong(0)).nonEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("streamed graph-index maintenance: foreachBatch inserts ≡ sequential insertBatch") {
    // The graph sibling of appendStreamIvfPq (VERDICT r9 #3): a vector
    // stream folds into the search graph one micro-batch at a time via
    // KnnGraph.insertBatch — identical state to calling the batch
    // operator on the same splits (foreachBatch runs batch semantics
    // inside), so newly streamed vectors are walk-reachable the moment
    // their batch commits.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Ann, KnnGraph, Pq}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val base = e.filter($"vec_id" % 7 < 5)
    val streamedRows = e.filter($"vec_id" % 7 >= 5)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cents = Ann.collectCentroids(Ann.seedCentroids(base, 8))
    def seedsFor(b: org.apache.spark.sql.DataFrame) =
      b.select($"vec_id", $"embedding").collect().toSeq.flatMap { r =>
        val qv = r.getSeq[Float](1).toArray
        cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
          .sorted.take(2).map { case (_, cid) => (r.getLong(0), cid) }
      }.toDF("qid", "cand")
    val g0 = KnnGraph.buildSearchGraph(base, m = 4, ringM = 2, rounds = 2)
      .coalesce(1).localCheckpoint(true)
    // streaming fold
    var corpusS = base
    var gS = g0
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        if (b.count() > 0) {
          gS = KnnGraph.insertBatch(corpusS, gS, b, seedsFor(b), m = 4)
            .coalesce(1).localCheckpoint(true)
          corpusS = corpusS.unionByName(b).localCheckpoint(true)
        }
      }
      .outputMode("update").start()
    try {
      streamedRows.grouped(math.max(1, streamedRows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // batch fold over the identical splits
    var corpusB = base
    var gB = g0
    streamedRows.grouped(math.max(1, streamedRows.length / 3 + 1)).foreach { chunk =>
      val b = chunk.toSeq.toDF("vec_id", "embedding")
      gB = KnnGraph.insertBatch(corpusB, gB, b, seedsFor(b), m = 4)
        .coalesce(1).localCheckpoint(true)
      corpusB = corpusB.unionByName(b)
    }
    val got = gS.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = gB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected, "streamed graph state diverged from the batch fold")
    assert(streamedRows.map(_._1).toSet.subsetOf(got.map(_._1)),
      "every streamed vector must have forward edges")
  }
}
