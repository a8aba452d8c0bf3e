package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, KnnGraph}
import graft.sources.Tables

/** Scratch experiment (round 9): graph-ANN beam search vs IVF probing at
  * comparable candidate work, on the sf0.01 panel. Tunes (graph degree,
  * NN-Descent rounds, beam, hops). */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // this harness MEASURES build cost — builds must actually run
    graft.util.IndexCache.enabled = false
    import spark.implicits._
    if (args.headOption.contains("insert")) { insertProfile(spark); spark.stop(); return }
    if (args.headOption.contains("hier")) { hierProfile(spark); spark.stop(); return }
    if (args.headOption.contains("erosion")) { erosionProfile(spark); spark.stop(); return }
    if (args.headOption.contains("adc")) { adcProfile(spark); spark.stop(); return }
    if (args.headOption.contains("mixed")) { mixedProfile(spark); spark.stop(); return }
    if (args.headOption.contains("deleteheavy")) { deleteHeavyProfile(spark); spark.stop(); return }
    if (args.headOption.contains("scale")) {
      // optional replica list: `scale 100` → rep=100 only (the r17
      // 100× serve row); default 1,10 (the r15 rows)
      val reps = args.drop(1).headOption
        .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(1, 10))
      scaleProfile(spark, reps); spark.stop(); return
    }
    if (args.headOption.contains("serve")) { serveProfile(spark); spark.stop(); return }
    val dir = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, dir)
    val panelIds = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)
    val qs = e.filter($"vec_id".isin(panelIds: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
    import graft.expressions.BottomK.bottomK
    def top10(scored: org.apache.spark.sql.DataFrame) = scored
      .groupBy($"qid").agg(bottomK($"score", $"vec_id".cast("long"), 10).as("t"))
      .select($"qid", explode($"t").as("h")).select($"qid", $"h.id".as("vec_id"))
    val exact10 = top10(e.crossJoin(broadcast(qs)).select($"qid", $"vec_id",
      graft.functions.VectorFunctions.l2sq($"embedding", $"qv").as("score")))
      .persist()
    exact10.count()

    // IVF baseline: seed cells 8, nprobe 2 (the ann_ivf configuration)
    val cents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val centDf = Ann.seedCentroids(e, 8)
    val ivf10 = Ann.search(e, centDf, qs.select($"qid".as("query_id"), $"qv".as("qvec")),
        k = 10, nprobe = 2)
      .select($"query_id".as("qid"), $"vec_id")
    val ivfHits = ivf10.join(exact10, Seq("qid", "vec_id")).count()
    val cellSizes = Ann.assign(e, centDf).groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"ivf nprobe=2: hits=$ivfHits  (cells=$cellSizes)")

    // graph variants
    val cfg = if (args.nonEmpty) args(0).split(",").map(_.toInt) else Array(6, 2, 8, 3, 2)
    for (m <- Seq(cfg(0)); rounds <- Seq(cfg(1)); beam <- Seq(cfg(2)); hops <- Seq(cfg(3)); nseed <- Seq(cfg(4))) {
      val g = KnnGraph.buildSearchGraph(e, m = m, ringM = 2, rounds = rounds).persist()
      g.count()
      val seedPairs = qs.collect().flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray
        cents.map { case (cid, c) => (graft.operators.Pq.l2sqLocal(qv, c), cid) }
          .sorted.take(nseed).map { case (_, cid) => (qid, cid) }
      }.toSeq
      val seeds = seedPairs.toDF("qid", "cand")
      val got = KnnGraph.beamSearch(e, g, qs, seeds, beam = beam, hops = hops, k = 10)
        .select($"qid", $"vec_id")
      val hits = got.join(exact10, Seq("qid", "vec_id")).count()
      // ACTUAL distinct distance evaluations: driver replay of the walk
      val adj = g.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val embById = e.select($"vec_id", $"embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val evals = qs.collect().map { r =>
        val qv = r.getSeq[Float](1).toArray
        val qid = r.getLong(0)
        var seen = seedPairs.filter(_._1 == qid).map(_._2).toSet
        var beamSet = seen.toSeq.sortBy(c => (graft.operators.Pq.l2sqLocal(qv, embById(c)), c)).take(beam)
        (1 to hops).foreach { _ =>
          val pool = beamSet.toSet ++ beamSet.flatMap(c => adj.getOrElse(c, Set.empty))
          seen = seen ++ pool
          beamSet = pool.toSeq.sortBy(c => (graft.operators.Pq.l2sqLocal(qv, embById(c)), c)).take(beam)
        }
        seen.size
      }
      val work = evals.sum / evals.length
      println(f"graph m=$m rounds=$rounds beam=$beam%2d hops=$hops seeds=$nseed: hits=$hits%3d  (~$work distinct evals/query)")
      g.unpersist(false)
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      qs.persist(); exact10.persist(); qs.count(); exact10.count()
    }
    spark.stop()
  }

  /** Round-10 evidence rows: hierarchical vs flat walk — recall and
    * DISTINCT distance evaluations (driver replay of both walks) on
    * the 10-query panel, at sf0.01 and sf0.1. The hierarchy's claim:
    * equal-or-better recall at fewer evals, with the layer-0 hop need
    * flat while N grows (the routing layers absorb the crossing). */
  private def hierProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
      val n = e.count()
      val panel = (0 until 10).map(i => (i * (n / 10) + i).toLong)
      val qs = e.filter($"vec_id".isin(panel: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
      import graft.expressions.BottomK.bottomK
      val exact10 = e.crossJoin(broadcast(qs)).select($"qid", $"vec_id",
          graft.functions.VectorFunctions.l2sq($"embedding", $"qv").as("score"))
        .groupBy($"qid").agg(bottomK($"score", $"vec_id".cast("long"), 10).as("t"))
        .select($"qid", explode($"t").as("h")).select($"qid", $"h.id".as("vec_id"))
        .persist()
      exact10.count()
      val embById = e.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val qvById = qs.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      def adjOf(g: org.apache.spark.sql.DataFrame) =
        g.collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def replayEvals(adj: Map[Long, Set[Long]], qid: Long,
          seeds: Set[Long], beam: Int, hops: Int): (Set[Long], Seq[Long]) = {
        val qv = qvById(qid)
        def rank(c: Long) = (Pq.l2sqLocal(qv, embById(c)), c)
        var seen = seeds
        var b = seeds.toSeq.sortBy(rank).take(beam)
        (1 to hops).foreach { _ =>
          val pool = b.toSet ++ b.flatMap(c => adj.getOrElse(c, Set.empty))
          seen ++= pool
          b = pool.toSeq.sortBy(rank).take(beam)
        }
        (seen, b)
      }
      // flat baseline: IVF 2-cell seeds, the ann_graph config
      val flat = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 3).persist()
      val flatAdj = adjOf(flat)
      val cents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
      def ivfSeeds(qid: Long): Set[Long] =
        cents.map { case (cid, c) => (Pq.l2sqLocal(qvById(qid), c), cid) }
          .sorted.take(2).map(_._2).toSet
      for (hops <- Seq(2, 3, 4)) {
        val (hits, evals) = panel.map { qid =>
          val (seen, b) = replayEvals(flatAdj, qid, ivfSeeds(qid), 12, hops)
          val top = b.toSeq.sortBy(c => (Pq.l2sqLocal(qvById(qid), embById(c)), c)).take(10)
          val ex = exact10.filter($"qid" === qid).collect().map(_.getLong(1)).toSet
          (top.count(ex), seen.size)
        }.unzip
        println(f"N=$n%5d flat  hops=$hops: hits=${hits.sum}%3d/100  evals/q=${evals.sum / 10}%4d")
      }
      // hierarchy: 1 upper layer (16x smaller), greedy descent entry
      val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 2,
        maxLevel = 1)
      val l1 = layers(1).persist(); val l0 = layers(0).persist()
      val l1Adj = adjOf(l1); val l0Adj = adjOf(l0)
      val l1Nodes = e.filter(KnnGraph.levelCol($"vec_id") >= 1)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val entry = l1Nodes.toSeq.sortBy(id =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map(b => f"${b & 0xff}%02x").mkString, id)).head
      for (hops0 <- Seq(2, 3, 4); ub <- Seq(2, 4); s0 <- Seq(1, 4)) {
        val (hits, evals) = panel.map { qid =>
          val (seen1, b1) = replayEvals(l1Adj, qid, Set(entry), ub, 6)
          val seed0 = b1.take(s0).toSet
          val (seen0, b0) = replayEvals(l0Adj, qid, seed0, 12, hops0)
          val top = b0.toSeq.sortBy(c => (Pq.l2sqLocal(qvById(qid), embById(c)), c)).take(10)
          val ex = exact10.filter($"qid" === qid).collect().map(_.getLong(1)).toSet
          (top.count(ex), (seen1 ++ seen0).size)
        }.unzip
        println(f"N=$n%5d hier  l0hops=$hops0 ub=$ub s0=$s0 (layer1=${l1Nodes.size}%4d): " +
          f"hits=${hits.sum}%3d/100  evals/q=${evals.sum / 10}%4d")
      }
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
  }

  /** Round-10 evidence row: per-batch insert work vs corpus size. A
    * FIXED 50-vector batch inserts into graphs over growing corpora;
    * per-batch distance evaluations (batch·hops·beam·(deg+1) routing +
    * batch² intra + touched·maxDeg repair) and the touched-node count
    * must stay flat while N grows — the o(N) incremental-maintenance
    * claim of KnnGraph.insertBatch. */
  /** Round-11 evidence row (VERDICT r10 #7): does sustained insertBatch
    * ingest erode the graph? Base on the first 300 vectors, then 20
    * sequential 10-vector batches (corpus ends 2.7× the base). At
    * checkpoints: panel recall of the incrementally grown graph vs a
    * from-scratch rebuild on the SAME corpus, survival of the base's
    * ring long links, and at the end the effect of one
    * KnnGraph.redescend maintenance round.
    *
    * Batches land through GraphStore (writeBatch delta → read), which
    * is both the production ingest shape AND load-bearing here: a pure
    * in-memory fold g → insertBatch → localCheckpoint → g stalls after
    * ~12 generations, because LogicalRDD carries the checkpointed
    * plan's ESTIMATED sizeInBytes forward and the repair tree's nested
    * joins multiply it each round (SizeInBytesOnlyStatsPlanVisitor
    * takes the product over join children) — the estimate's bit-length
    * doubles per generation until stats arithmetic itself runs for
    * minutes (observed: batch ~14 stuck in BigInt Toom–Cook inside
    * Dataset.checkpoint). A store roundtrip re-grounds stats in real
    * file sizes every batch; this is documented on insertBatch. */
  private def erosionProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    val all = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", $"embedding").persist()
    val base = all.filter($"vec_id" < 300)
    val store = java.nio.file.Files.createTempDirectory("graft-erosion").toString
    val g0 = KnnGraph.buildSearchGraph(base, m = 6, ringM = 2, rounds = 3)
    graft.sources.GraphStore.write(Seq(g0), store, buckets = 8)
    graft.sources.GraphStore.writeCorpus(base, store)
    var g = graft.sources.GraphStore.read(spark, store).persist()
    g.count()
    val baseRing = KnnGraph.ringInit(base, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Ann.collectCentroids(Ann.seedCentroids(base, 8))
    val panelIds = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)
    val qRows = all.filter($"vec_id".isin(panelIds: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qs = qRows.map { case (id, _) => id }.toSeq
      .toDF("qid").join(all.select($"vec_id".as("qid"), $"embedding".as("qv")), "qid")
    val seeds = qRows.flatMap { case (qid, qv) =>
      cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
        .sorted.take(2).map { case (_, cid) => (qid, cid) }
    }.toSeq.toDF("qid", "cand")
    def recallOf(graph: org.apache.spark.sql.DataFrame, cap: Long): Long = {
      val corpusRows = all.filter($"vec_id" < cap)
        .select($"vec_id", $"embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val exact10 = qRows.flatMap { case (qid, qv) =>
        corpusRows.map { case (id, v) => (Pq.l2sqLocal(qv, v), id) }
          .sortBy(identity).take(10).map { case (_, id) => (qid, id) }
      }.toSet
      KnnGraph.beamSearch(all.filter($"vec_id" < cap), graph, qs, seeds,
          beam = 12, hops = 4, k = 10)
        .select($"qid", $"vec_id").collect()
        .count(r => exact10((r.getLong(0), r.getLong(1))))
    }
    (0 until 20).foreach { i =>
      val cap = 310L + 10 * i
      val corpus = all.filter($"vec_id" < cap - 10)
      val batch = all.filter($"vec_id" >= cap - 10 && $"vec_id" < cap)
      val bseeds = batch.select($"vec_id", $"embedding").collect().toSeq
        .flatMap { r =>
          val qv = r.getSeq[Float](1).toArray
          cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
            .sorted.take(2).map { case (_, cid) => (r.getLong(0), cid) }
        }.toDF("qid", "cand")
      val delta = KnnGraph.insertBatchDelta(corpus, g, batch, bseeds, m = 6,
        beam = 12, hops = 4, maxDegree = 8)
      graft.sources.GraphStore.writeBatch(delta, store, batchId = i)
      graft.sources.GraphStore.writeCorpusBatch(batch, store, batchId = i,
        buckets = 8)
      g.unpersist(false)
      g = graft.sources.GraphStore.read(spark, store).persist()
      g.count()
      // mid-soak compaction — the maintenance cadence the store
      // documents (also keeps the 20-generation resolution cheap)
      if (i == 9) {
        graft.sources.GraphStore.compact(spark, store)
        g.unpersist(false)
        g = graft.sources.GraphStore.read(spark, store).persist()
        g.count()
      }
      if (i % 5 == 4) {
        val rebuilt = KnnGraph
          .buildSearchGraph(all.filter($"vec_id" < cap), m = 6, ringM = 2,
            rounds = 3).persist()
        val rInc = recallOf(g, cap)
        val rReb = recallOf(rebuilt, cap)
        val ringLeft = g.collect().map(r => (r.getLong(0), r.getLong(1)))
          .count(baseRing)
        println(f"batches=${i + 1}%2d N=$cap%4d: recall inc=$rInc%3d " +
          f"rebuild=$rReb%3d ringSurvival=$ringLeft%3d/${baseRing.size}")
        rebuilt.unpersist(false)
      }
      if (i == 19) {
        // the composed STORE maintenance op (compact ∘ redescend) — the
        // production form of the in-memory redescend this row used to
        // measure; recall is read back from the maintained store
        graft.sources.GraphStore.maintain(spark, store, m = 6, ringM = 2)
        val rd = graft.sources.GraphStore.read(spark, store).persist()
        rd.count()
        println(f"after store maintain (compact o redescend): " +
          f"recall=${recallOf(rd, cap)}%3d")
        rd.unpersist(false)
      }
    }
    graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }

  /** Round-14 evidence row (VERDICT r13 next #5): the erosion soak
    * under the reference's REAL workload shape — 20 batches of
    * interleaved fresh inserts + upserts-of-existing + deletes +
    * revives fold through GraphStore.applyMutationBatch (the
    * raft_state.cc:416-459 apply loop), with `maintain` (compact ∘
    * redescend + purge) on a cadence. At each checkpoint: served
    * panel recall vs exact top-10 over the LIVE corpus (a driver
    * mirror of the mutation history), before AND after each purge —
    * the evidence that tombstone+repair+redescend holds navigability
    * under mixed mutations, not just insert-only growth. */
  private def mixedProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.{MutationLog, Pq}
    import graft.sources.GraphStore
    val all = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", $"embedding").persist()
    val embById = all.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val store = java.nio.file.Files.createTempDirectory("graft-mixed").toString
    val base = all.filter($"vec_id" < 300)
    val layers = KnnGraph.buildHierGraph(base, m = 6, ringM = 2,
      rounds = 2, maxLevel = 1)
    GraphStore.write(layers, store, buckets = 8)
    GraphStore.writeCorpus(base, store)
    // driver mirror of the live state (id -> embedding)
    val live = scala.collection.mutable.Map[Long, Array[Float]](
      (0L until 300L).map(id => id -> embById(id)): _*)
    val deletedEver = scala.collection.mutable.ArrayBuffer[Long]()
    def recall(tag: String): Unit = {
      // correctness gate first: the store corpus must BE the mutation
      // history's replay (the driver mirror) — a recall number over a
      // diverged corpus would measure a bug, not erosion
      val got = GraphStore.readCorpus(spark, store).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet
      val want = live.toSeq.map { case (id, v) => (id, v.toSeq) }.toSet
      require(got == want,
        s"store corpus diverged from the mutation mirror at $tag: " +
          s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      val panel = live.keys.toSeq.sorted.grouped(live.size / 10 + 1)
        .map(_.head).take(10).toSeq
      val qs = panel.map(id => (id, live(id).toSeq)).toDF("qid", "qv")
      val exact = panel.flatMap { qid =>
        live.toSeq.map { case (id, v) => (Pq.l2sqLocal(live(qid), v), id) }
          .sortBy(identity).take(10).map { case (_, id) => (qid, id) }
      }.toSet
      val hits = GraphStore.hierSearchPointLookup(spark, store, qs,
          beam = 12, hops = 4, k = 10)
        .select($"qid", $"vec_id").collect()
        .count(r => exact((r.getLong(0), r.getLong(1))))
      println(f"$tag%-34s N_live=${live.size}%3d recall=$hits%3d/100")
    }
    (0 until 20).foreach { i =>
      var li = 100L * i
      val muts = scala.collection.mutable.ArrayBuffer[
        (Long, String, Long, Seq[Float])]()
      def emit(op: String, id: Long, emb: Seq[Float]): Unit = {
        muts += ((li, op, id, emb)); li += 1
      }
      val usedThisBatch = scala.collection.mutable.Set[Long]()
      // 10 fresh inserts (ids 300..499 across the 20 batches)
      (0 until 10).foreach { j =>
        val id = 300L + 10 * i + j
        emit(MutationLog.Upsert, id, embById(id).toSeq)
        live(id) = embById(id); usedThisBatch += id
      }
      // 3 upserts-of-existing: live ids MOVED to the midpoint of two
      // corpus vectors — in-distribution but distinct from every
      // existing embedding (re-using a corpus vector verbatim creates
      // exact-duplicate ties that depress measured recall as churn
      // accumulates, an artifact of the fixture, not erosion)
      def midpoint(a: Long, b: Long): Array[Float] = {
        val x = embById(a); val y = embById(b)
        x.indices.map(d => ((x(d).toDouble + y(d).toDouble) / 2).toFloat).toArray
      }
      (0 until 3).foreach { j =>
        val cand = live.keys.toSeq.sorted
        val id = cand((i * 7 + j * 31) % cand.size)
        if (!usedThisBatch(id)) {
          val nv = midpoint((id + 50 + i) % 500, (id + 131 + 7 * i) % 500)
          emit(MutationLog.Upsert, id, nv.toSeq)
          live(id) = nv; usedThisBatch += id
        }
      }
      // 1 revive: the oldest not-yet-revived deleted id
      deletedEver.headOption.foreach { id =>
        if (!usedThisBatch(id)) {
          deletedEver.remove(0)
          val nv = midpoint((id + 200) % 500, (id + 57) % 500)
          emit(MutationLog.Upsert, id, nv.toSeq)
          live(id) = nv; usedThisBatch += id
        }
      }
      // 2 deletes of live ids not touched this batch
      val delCand = live.keys.toSeq.sorted
        .filterNot(usedThisBatch).take(200)
      (0 until 2).foreach { j =>
        if (delCand.size > j * 40) {
          val id = delCand((i * 13 + j * 40) % delCand.size)
          if (live.contains(id) && !usedThisBatch(id)) {
            emit(MutationLog.Delete, id, Seq.empty[Float])
            live.remove(id); deletedEver += id; usedThisBatch += id
          }
        }
      }
      GraphStore.applyMutationBatch(
        muts.toSeq.toDF("log_index", "op", "id", "embedding"),
        store, i.toLong, m = 6, beam = 12, hops = 4, maxDegree = 8)
      if (i % 5 == 4) recall(f"batches=${i + 1}%2d (pre-maintain)")
      if (i == 6 || i == 13 || i == 19) {
        GraphStore.maintain(spark, store, m = 6, ringM = 2)
        recall(f"batches=${i + 1}%2d after maintain m=6 (purged)")
      }
      if (i == 19) {
        // degree-parity lever: the grown graph repairs at maxDegree=8,
        // redescend at m=6 prunes to 6 — re-maintain at m=8 shows the
        // recall recoverable by matching the serving degree
        GraphStore.maintain(spark, store, m = 8, ringM = 2)
        recall(f"batches=${i + 1}%2d after maintain m=8")
      }
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }

  /** Round-14 evidence row (VERDICT r13 next #4 / wrong #2): the
    * dead-set plan-size guard under a delete-HEAVY window — 20% of a
    * 32k-vector replicated corpus tombstoned between compactions.
    * Measures the served walk's wall and physical-plan size on the
    * isin-literal path vs the broadcast-anti-join path (forced via
    * -Dgraft.deadIsinMax), value equality between the two, and the
    * post-compact (purged) serve as the baseline. */
  private def deleteHeavyProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.sources.GraphStore
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    val rep = 16
    val e = (0 until rep).map { i =>
      embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
    }.reduce(_ unionByName _).persist()
    val n = e.count()
    val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 2,
      maxLevel = 1).map(_.persist())
    layers.foreach(_.count())
    val store = java.nio.file.Files.createTempDirectory("graft-delheavy").toString
    try {
      GraphStore.write(layers, store, buckets = 32)
      GraphStore.writeCorpus(e, store)
      layers.foreach(_.unpersist(false))
      // 20% tombstoned in one window (every 5th id), panel excluded
      val panelIds = Seq(0L, 42L, 100L, 137L, 300L, 1000042L, 2000100L,
        3000300L, 5000042L, 9000100L)
      val dels = e.select($"vec_id").filter($"vec_id" % 5 === 1)
        .filter(!$"vec_id".isin(panelIds: _*))
      GraphStore.deleteBatch(dels, store, 0L)
      val nDead = dels.count()
      println(s"N=$n dead=$nDead (${100 * nDead / n}%) buckets=32")
      val qs = e.filter($"vec_id".isin(panelIds: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
      qs.count()
      def serve() = GraphStore.hierSearchPointLookup(spark, store, qs,
        beam = 12, hops = 3, k = 10)
      def run(tag: String): Set[(Long, Long)] = {
        // plan-size evidence from the liveness-filtered edge read (the
        // fragment every hop replicates): literal IN lists embed the
        // dead set, the anti-join plans O(1) operators
        val planLen = GraphStore.read(spark, store)
          .queryExecution.executedPlan.toString.length
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          serve().select($"qid", $"vec_id").collect()
          (System.nanoTime() - t0) / 1e9
        }
        val res = serve().select($"qid", $"vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"$tag%-28s walls=${walls.map(w => f"$w%5.2f").mkString(" ")} " +
          f"planChars=$planLen%8d")
        graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
        qs.persist(); qs.count()
        res
      }
      val lit0 = run("isin-literal (default)")
      sys.props("graft.deadIsinMax") = "0"
      val anti = try run("broadcast-anti-join (forced)")
        finally sys.props.remove("graft.deadIsinMax")
      require(anti == lit0, "guard paths diverged!")
      GraphStore.compact(spark, store)
      val purged = run("post-compact (purged)")
      require(purged == lit0, "purge changed served values!")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(store))
  }

  private def insertProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    for ((dir, cap) <- Seq(("/root/testdata/sf0.01", 450),
        ("/root/testdata/sf0.1", 950), ("/root/testdata/sf0.1", 1950))) {
      val all = Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding")
        .filter($"vec_id" < cap + 50)
      val batch = all.filter($"vec_id" >= cap).persist()
      val base = all.filter($"vec_id" < cap).persist()
      val n = base.count(); batch.count()
      val g = KnnGraph.buildSearchGraph(base, m = 6, ringM = 2, rounds = 2)
        .persist()
      val degAvg = g.count().toDouble / n
      val cents = Ann.collectCentroids(Ann.seedCentroids(base, 8))
      val seeds = batch.select($"vec_id", $"embedding").collect().toSeq.flatMap { r =>
        val qv = r.getSeq[Float](1).toArray
        cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
          .sorted.take(2).map { case (_, cid) => (r.getLong(0), cid) }
      }.toDF("qid", "cand")
      val t0 = System.nanoTime()
      val g2 = KnnGraph.insertBatch(base, g, batch, seeds, m = 6,
        beam = 12, hops = 4, maxDegree = 8)
      val edgesAfter = g2.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // touched = existing nodes whose edge lists changed
      val before = g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val after = g2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val newIds = batch.select($"vec_id").collect().map(_.getLong(0)).toSet
      val touched = (((before diff after) ++ (after diff before)).map(_._1) -- newIds).size
      val evals = 50 * 4 * 12 * (degAvg + 1) + 50 * 50 + touched * 8
      println(f"N=$n%5d batch=50: insert wall=$wall%5.1fs touched=$touched%3d " +
        f"deg=$degAvg%4.1f edges=$edgesAfter%6d ~evals/batch=${evals.round}%6d " +
        f"(evals/N=${evals / n}%5.1f)")
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
    }
  }

  /** Round-15 evidence (VERDICT r14 next #5): serve-scale rows — the
    * driver-resident walk's per-serve JOB COUNT and dispatch wall must
    * be FLAT in corpus size (hop work is beam×degree-bounded, value
    * fetches are bucket-pruned point lookups; only BUILD cost grows
    * with N). 1× vs 10× replicated sf0.1 corpus (ids offset, vectors
    * shifted per replica — the ProfileScale convention, constant local
    * density), hier store built once per scale, then 3 measured passes
    * each of the exact hier serve and the ADC hier serve with
    * per-pass wall + DispatchMeter jobs/dispatch deltas. */
  private def scaleProfile(spark: SparkSession, repList: Seq[Int]): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    import graft.sources.GraphStore
    val dir = "/root/testdata/sf0.1"
    graft.util.DispatchMeter.register(spark.sparkContext)
    val embBase = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val panelIds = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)
    repList.foreach { rep =>
      val e = (0 until rep).map { i =>
        embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
          transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
      }.reduce(_ unionByName _).persist()
      val n = e.count()
      val qs = e.filter($"vec_id".isin(panelIds: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
      qs.count()
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-scaleprof-$rep").toString
      try {
        val t0 = System.nanoTime()
        val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2,
          rounds = 3, maxLevel = 1).map(_.persist())
        layers.foreach(_.count())
        val m8 = Pq.trainRefined(e, m = 8, ks = 16, iters = 2)
        GraphStore.write(layers, store, buckets = 32)
        GraphStore.writeCorpus(e, store)
        GraphStore.writeCodes(Pq.encode(e, m8), store)
        layers.foreach(_.unpersist(false))
        val buildWall = (System.nanoTime() - t0) / 1e9
        println(f"rep=$rep%2d N=$n%6d build+persist=$buildWall%7.1f s")
        def serve(tag: String)(body: => org.apache.spark.sql.DataFrame): Unit =
          (1 to 3).foreach { p =>
            val j0 = graft.util.DispatchMeter.jobs
            val d0 = graft.util.DispatchMeter.millis
            val t1 = System.nanoTime()
            val rows = body.collect().length
            val wall = (System.nanoTime() - t1) / 1e9
            println(f"rep=$rep%2d $tag%-10s pass=$p wall=$wall%6.2f s " +
              f"jobs=${graft.util.DispatchMeter.jobs - j0}%3d " +
              f"dispatch=${(graft.util.DispatchMeter.millis - d0) / 1e3}%6.3f s " +
              f"rows=$rows")
            graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
          }
        serve("hier-exact") { GraphStore.hierSearchPointLookup(spark,
          store, qs, beam = 12, hops = 3, k = 10) }
        serve("hier-adc") { GraphStore.hierSearchPointLookupAdc(spark,
          store, qs, m8, beam = 12, hops = 3, k = 10) }
      } finally {
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(store))
        e.unpersist(false)
        qs.unpersist(false)
        ()
      }
    }
  }

  /** Round-16 evidence (VERDICT r15 next #5): the driver-walk batch-width
    * crossover. `graft.driverWalkMaxQueries` (default 1024) decides when
    * a query batch stops being served by the driver-resident walk and
    * falls back to the distributed walk — this measures BOTH forms at
    * widths 1 / 32 / 256 / 1024 on the scaleProfile store (rep=10,
    * N=20k) so the cap's position relative to the measured crossover is
    * a number, not an assertion. Driver-walk cost grows with width
    * (frontier ids per pruned lookup scale with queries×beam; above the
    * 1024-id literal-IN guard each lookup becomes a broadcast semi);
    * the distributed walk pays a near-width-independent number of
    * checkpointed rerank rounds. */
  private def serveProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    import graft.sources.GraphStore
    val dir = "/root/testdata/sf0.1"
    graft.util.DispatchMeter.register(spark.sparkContext)
    val embBase = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val rep = 10
    val e = (0 until rep).map { i =>
      embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
    }.reduce(_ unionByName _).persist()
    val n = e.count()
    val store = java.nio.file.Files
      .createTempDirectory("graft-serveprof").toString
    try {
      val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2,
        rounds = 3, maxLevel = 1).map(_.persist())
      layers.foreach(_.count())
      GraphStore.write(layers, store, buckets = 32)
      GraphStore.writeCorpus(e, store)
      layers.foreach(_.unpersist(false))
      println(s"N=$n buckets=32 store=$store")
      Seq(1, 32, 256, 1024).foreach { width =>
        // deterministic qid panel: every ~N/width-th id, offset so
        // width=1 is not always the entry point's own bucket
        val qs = e.orderBy($"vec_id").limit(width)
          .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
        qs.count()
        def serve(tag: String)(body: => org.apache.spark.sql.DataFrame): Unit =
          (1 to 3).foreach { p =>
            val j0 = graft.util.DispatchMeter.jobs
            val d0 = graft.util.DispatchMeter.millis
            val t1 = System.nanoTime()
            val rows = body.count()
            val wall = (System.nanoTime() - t1) / 1e9
            println(f"width=$width%5d $tag%-12s pass=$p wall=$wall%7.2f s " +
              f"(${wall / width * 1000}%8.2f ms/q) " +
              f"jobs=${graft.util.DispatchMeter.jobs - j0}%4d " +
              f"dispatch=${(graft.util.DispatchMeter.millis - d0) / 1e3}%6.3f s " +
              f"rows=$rows")
            graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
          }
        serve("driver") { GraphStore.hierSearchPointLookup(spark,
          store, qs, beam = 12, hops = 3, k = 10) }
        serve("distributed") { GraphStore.hierSearchPointLookupDistributed(
          spark, store, qs, beam = 12, hops = 3, k = 10,
          upperBeam = 4, upperHops = 6, handoff = 4,
          idCol = "vec_id", embCol = "embedding") }
        qs.unpersist(false)
        ()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
      e.unpersist(false)
      ()
    }
  }

  /** Round-12 evidence: exact vs ADC store serving on a replicated
    * sf0.1 corpus (16× = 32k vectors; ids offset, vectors shifted per
    * replica — the ProfileScale convention, so local density is
    * constant and bucket files hold ~1000 rows, a data-to-footer ratio
    * closer to a production layout than the 2k-row base table where
    * parquet footers swamp row width). Measures wall, FS bytes read,
    * and exact-top-10 recall for the persisted hier walk: exact scorer
    * vs ADC at matched beam, ADC with a wider beam (the DiskANN
    * recall-recovery lever), and ADC with a finer m=16 quantizer. */
  private def adcProfile(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Pq
    import graft.sources.GraphStore
    import scala.jdk.CollectionConverters._
    def fsBytes(): Long =
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file").map(_.getBytesRead).sum
    val dir = "/root/testdata/sf0.1"
    val embBase = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val rep = 16
    val e = (0 until rep).map { i =>
      embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
    }.reduce(_ unionByName _).persist()
    val n = e.count()
    val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 3,
      maxLevel = 1).map(_.persist())
    layers.foreach(_.count())
    val panelIds = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)
    val qs = e.filter($"vec_id".isin(panelIds: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv")).persist()
    qs.count()
    import graft.expressions.BottomK.bottomK
    val exact10 = e.crossJoin(broadcast(qs))
      .select($"qid", $"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", $"qv").as("score"))
      .groupBy($"qid").agg(bottomK($"score", $"vec_id".cast("long"), 10).as("t"))
      .select($"qid", explode($"t").as("h"))
      .select($"qid", $"h.id".as("vec_id")).persist()
    exact10.count()
    val m8 = Pq.trainRefined(e, m = 8, ks = 16, iters = 2)
    val m16 = Pq.trainRefined(e, m = 16, ks = 16, iters = 2)
    val store = java.nio.file.Files.createTempDirectory("graft-adcprof").toString
    try {
      GraphStore.write(layers, store, buckets = 32)
      GraphStore.writeCorpus(e, store)
      layers.foreach(_.unpersist(false))
      println(s"N=$n buckets=32 (~${n / 32} rows/bucket)")
      def run(tag: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
        val b0 = fsBytes(); val t0 = System.nanoTime()
        val res = body.select($"qid", $"vec_id").persist()
        res.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val bytes = fsBytes() - b0
        val hits = res.join(exact10, Seq("qid", "vec_id")).count()
        println(f"$tag%-14s wall=$wall%6.2f s  bytes=${bytes / 1024}%8d KiB  hits=$hits%3d/100")
        res.unpersist(false)
        graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      }
      GraphStore.writeCodes(Pq.encode(e, m8), store)
      // pass 1 warms the page cache/footers; compare within-pass pairs
      (1 to 2).foreach { p =>
        run(s"exact-b12-p$p") { GraphStore.hierSearchPointLookup(spark,
          store, qs, beam = 12, hops = 3, k = 10) }
        run(s"adc8-b12-p$p") { GraphStore.hierSearchPointLookupAdc(spark,
          store, qs, m8, beam = 12, hops = 3, k = 10) }
      }
      run("adc8-b24") { GraphStore.hierSearchPointLookupAdc(spark, store,
        qs, m8, beam = 24, hops = 4, k = 10) }
      GraphStore.writeCodes(Pq.encode(e, m16), store)
      run("adc16-b12") { GraphStore.hierSearchPointLookupAdc(spark, store,
        qs, m16, beam = 12, hops = 3, k = 10) }
      run("adc16-b24") { GraphStore.hierSearchPointLookupAdc(spark, store,
        qs, m16, beam = 24, hops = 4, k = 10) }
      run("exact-b24") { GraphStore.hierSearchPointLookup(spark, store,
        qs, beam = 24, hops = 4, k = 10) }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(store))
  }
}
