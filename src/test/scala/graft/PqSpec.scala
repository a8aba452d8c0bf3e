package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq
import graft.sources.Tables

/** Product quantization: training is deterministic and driver-bounded,
  * encoding is an in-range row-local projection, ADC scores are exact
  * integer sums matching a driver-side replay, and the approximate
  * ranking recalls a usable share of the exact top-k. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val model = Pq.train(e, m = 8, ks = 16)
  private lazy val query: Array[Float] =
    e.filter($"vec_id" === 0L).select($"embedding").head.getSeq[Float](0).toArray

  test("train: model shape is (m × ks) with subDim = dim/m, independent of run") {
    assert(model.m === 8 && model.subDim === 8 && model.ks === 16)
    assert(model.codebooks.size === 8)
    assert(model.codebooks.forall(_.size === 16))
    assert(model.codebooks.forall(_.forall(_.length === 8)))
    val again = Pq.train(e, m = 8, ks = 16)
    assert(model.codebooks.flatten.map(_.toSeq) ===
      again.codebooks.flatten.map(_.toSeq))
  }

  test("encode: every code in [0, ks); sampled rows sit at distance 0 from their code") {
    val enc = Pq.encode(e, model)
    val codes = enc.select($"codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size === model.m))
    assert(codes.forall(_.forall(j => j >= 0 && j < model.ks)))
    // a vector the codebook was trained on quantizes losslessly: its
    // chosen sub-centroid is (at worst a tie with) an exact copy
    val encodedById = Pq.encode(e, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val byId = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // recover the ids of the sample rows: re-run the training ranking
    val sampleIds = e.orderBy(md5($"vec_id".cast("string")), $"vec_id", $"embedding")
      .limit(16).select($"vec_id").collect().map(_.getLong(0))
    sampleIds.foreach { id =>
      val emb = byId(id)
      encodedById(id).zipWithIndex.foreach { case (code, s) =>
        val sub = java.util.Arrays.copyOfRange(emb, s * 8, (s + 1) * 8)
        assert(Pq.l2sqLocal(sub, model.codebooks(s)(code)) === 0.0,
          s"sample row $id, subspace $s: non-zero distance to its own code")
      }
    }
  }

  test("adc: engine scores equal the driver-side LUT replay exactly") {
    val lutQ = Pq.lut(model, query)
    val got = Pq.adcTopK(Pq.encode(e, model), model, query, k = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Pq.encode(e, model).collect().map { r =>
      val codes = r.getSeq[Int](1)
      r.getLong(0) -> (0 until model.m).map(s => lutQ(s)(codes(s))).sum
    }.toMap
    assert(got === expected.view.filterKeys(got.contains).toMap)
    assert(got.size === math.min(1000, expected.size))
  }

  test("adc ranking: the query's own vector wins; overlap with exact top-10; deterministic") {
    val pq10 = Pq.adcTopK(Pq.encode(e, model), model, query, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val exact10 = e.select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", lit(query)).as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    // query IS corpus vector 0: its ADC score is pure quantization error,
    // far below any other random 64-dim vector's true distance
    assert(pq10.head === 0L, s"query's own vector not ranked first: $pq10")
    // uniform random data is PQ's worst case (all pairwise distances
    // concentrate); still must beat chance (10/500)
    val overlap = pq10.count(exact10)
    assert(overlap >= 1, s"recall@10 was $overlap/10 — PQ ranking degenerate")
    val again = Pq.adcTopK(Pq.encode(e, model), model, query, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(pq10 === again)
  }

  test("clustered data: ADC retrieves the right cluster; rerank recovers the exact top-10") {
    // 12 well-separated centers × ~42 members, tight noise — the shape
    // real embedding corpora have (and the regime PQ is designed for).
    // Members of one tight cluster share codes (identical ADC), so pure
    // ADC cannot order WITHIN a cluster — the correct claims are that it
    // prunes to the right cluster and that the exact re-rank of a
    // shortlist finishes the job.
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(12)(Array.fill(64)(rnd.nextFloat() * 10f))
    val rows = (0 until 500).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val m2 = Pq.train(corpus, m = 8, ks = 32)
    val q2 = rows(7)._2.map(_.toFloat).toArray
    val enc = Pq.encode(corpus, m2)
    val pq10 = Pq.adcTopK(enc, m2, q2, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(pq10.forall(_ % 12 === 7L), s"ADC left the query's cluster: $pq10")
    val exact10 = corpus.select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"embedding", lit(q2)).as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSeq
    // shortlist 50 > cluster population ~42, so the exact top-10 (all
    // in-cluster) are inside the shortlist and the re-rank is exact
    val reranked = Pq.adcTopKRerank(enc, corpus, m2, q2, r = 50, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(reranked === exact10)
  }

  test("encode + adc plan is row-local: no exchange, no join — the scan reads only codes") {
    val scored = Pq.encode(e, model)
      .select($"vec_id", Pq.adcCol($"codes", Pq.lut(model, query)).as("adc"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("ivf-pq: nprobe=K degenerates to plain ADC; fewer probes scan a subset") {
    val cents = graft.operators.Ann.collectCentroids(
      graft.operators.Ann.seedCentroids(e, 8))
    val ivf = Pq.encodeIvf(e, cents, model)
    val all = Pq.ivfAdcTopK(ivf, cents, model, query, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = Pq.adcTopK(Pq.encode(e, model), model, query, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all === plain)
    val probed = Pq.ivfAdcTopK(ivf, cents, model, query, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // probed results are a (possibly lossy) subset-ranking of the full
    // ADC scores: every returned (id, adc) must carry its true ADC score
    val fullScores = Pq.encode(e, model)
      .select($"vec_id", Pq.adcCol($"codes", Pq.lut(model, query)).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probed.foreach { case (id, adc) => assert(fullScores(id) === adc) }
  }

  test("ivf-pq store: cell-partitioned codes, probing is partition pruning over 8-byte rows") {
    val cents = graft.operators.Ann.collectCentroids(
      graft.operators.Ann.seedCentroids(e, 8))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      Pq.encodeIvf(e, cents, model).write.mode("overwrite")
        .partitionBy("cell").parquet(dir)
      val stored = spark.read.parquet(dir)
      // the store carries NO embedding column — the scan reads codes only
      assert(stored.columns.toSet === Set("vec_id", "codes", "cell"))
      val probedCells = cents
        .map { case (cellId, c) => (Pq.l2sqLocal(query, c), cellId) }
        .sorted.take(2).map(_._2)
      val probed = stored.filter($"cell".isin(probedCells: _*))
      val scan = probed.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"), scan)
      // search over the pruned store matches the in-memory operator
      val fromStore = probed
        .select($"vec_id", Pq.adcCol($"codes", Pq.lut(model, query)).as("adc"))
        .orderBy($"adc", $"vec_id").limit(10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val inMemory = Pq.ivfAdcTopK(Pq.encodeIvf(e, cents, model), cents, model,
          query, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fromStore === inMemory)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("streaming ingest: appendStreamIvfPq encodes upserts into the partitioned code store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-stream")
    val cents = Seq(0L -> Array(0f, 0f), 1L -> Array(10f, 10f))
    // 2-dim corpus, m=2/ks=2 model trained on a tiny static frame
    val corpus = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val m2 = Pq.train(corpus, m = 2, ks = 2)
    val mem = MemoryStream[(String, Long, Seq[Float])]
    val q = graft.sources.VectorStore.appendStreamIvfPq(
      mem.toDF().toDF("op", "vec_id", "embedding"), cents, m2,
      s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData(
        ("UPSERT", 1L, Seq(0.1f, 0.2f)),
        ("UPSERT", 2L, Seq(9.5f, 9.5f)),
        ("DELETE", 3L, Seq(0f, 0f)))
      q.processAllAvailable()
      val stored = spark.read.parquet(s"$dir/store")
      assert(stored.columns.toSet === Set("vec_id", "codes", "cell"))
      // streamed codes == batch encodeCol of the same rows
      val batch = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(9.5f, 9.5f)))
        .toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      val expected = Pq.encode(batch, m2).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val got = stored.collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](stored.columns.indexOf("codes"))).toMap
      assert(got === expected)
      assert(new java.io.File(s"$dir/store/cell=0").exists)
      assert(new java.io.File(s"$dir/store/cell=1").exists)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("trainRefined: deterministic across runs; Lloyd steps strictly reduce distortion here") {
    val m2 = Pq.trainRefined(e, m = 8, ks = 16, iters = 2)
    val again = Pq.trainRefined(e, m = 8, ks = 16, iters = 2)
    assert(m2.codebooks.flatten.map(_.toSeq) ===
      again.codebooks.flatten.map(_.toSeq))
    assert(m2.m === 8 && m2.subDim === 8 && m2.ks === 16)
    def distortion(mod: Pq.PqModel): Long =
      e.agg(sum(Pq.distortionCol($"embedding", mod))).head.getLong(0)
    val d0 = distortion(model)
    val d2 = distortion(m2)
    // Lloyd is non-increasing in exactly this objective; on real data
    // the first steps are strictly better (the refine-gain guarantee)
    assert(d2 < d0, s"refined distortion $d2 !< sample distortion $d0")
    // zero iterations degenerates to the raw sample codebook
    val m0 = Pq.trainRefined(e, m = 8, ks = 16, iters = 0)
    assert(m0.codebooks.flatten.map(_.toSeq) ===
      model.codebooks.flatten.map(_.toSeq))
  }

  test("adcBatchCol equals the LUT path for every (vector, query) pair") {
    val m2 = Pq.trainRefined(e, m = 8, ks = 16, iters = 2)
    val qs = e.filter($"vec_id".isin(0L, 5L, 9L))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Pq.encode(e, m2).crossJoin(broadcast(qs))
      .select($"qid", $"vec_id", Pq.adcBatchCol($"codes", $"qv", m2).as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val queries = qs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val codesById = Pq.encode(e, m2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    queries.foreach { case (qid, qv) =>
      val lutQ = Pq.lut(m2, qv)
      codesById.foreach { case (id, codes) =>
        val want = (0 until m2.m).map(s => lutQ(s)(codes(s))).sum
        assert(got((qid, id)) === want, s"qid=$qid id=$id")
      }
    }
  }

  test("residual IVF-PQ: residuals are exact float math; search equals a driver replay") {
    val cents = Seq(0L, 1L, 2L, 3L).map { c =>
      c -> e.filter($"vec_id" === c).select($"embedding")
        .head.getSeq[Float](0).toArray
    }
    val mRes = Pq.trainResidual(e, cents, m = 8, ks = 16, iters = 1)
    val enc = Pq.encodeIvfResidual(e, cents, mRes)
    val got = Pq.ivfAdcTopKResidual(enc, cents, mRes, query, k = 5, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // driver replay: assign each vector (nearest of 4 cells, ties to the
    // lower cell), residual-encode, ADC against the query's per-cell
    // residual LUT, keep the 2 probed cells, ascending (adc, id)
    val byId = e.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cellOf(v: Array[Float]): Long =
      cents.map { case (c, ce) => (Pq.l2sqLocal(v, ce), c) }.min._2
    val probed = cents.map { case (c, ce) => (Pq.l2sqLocal(query, ce), c) }
      .sorted.take(2).map(_._2).toSet
    val codesById = enc.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2))).toMap
    val centMap = cents.toMap
    val want = byId.toSeq.flatMap { case (id, v) =>
      val cell = cellOf(v)
      if (!probed.contains(cell)) None else {
        val qres = Array.tabulate(query.length)(d =>
          (query(d).toDouble - centMap(cell)(d).toDouble).toFloat)
        val lutQ = Pq.lut(mRes, qres)
        val (encCell, codes) = codesById(id)
        assert(encCell === cell, s"cell mismatch for $id")
        Some(id -> (0 until mRes.m).map(s => lutQ(s)(codes(s))).sum)
      }
    }.sortBy { case (id, adc) => (adc, id) }.take(5)
    assert(got.toSeq === want)
  }

  test("native PQ kernels equal their inline executable specs (codegen and interpreted)") {
    // the three loop kernels vs the m×ks struct-least trees they
    // replace, over the real corpus — both engine paths
    def parity(): Unit = {
      val rows = e.select($"vec_id",
          Pq.encodeCol($"embedding", model).as("k_codes"),
          Pq.encodeColInline($"embedding", model).as("s_codes"),
          Pq.distortionCol($"embedding", model).as("k_dist"),
          Pq.distortionColInline($"embedding", model).as("s_dist"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"codes diverge for ${r.getLong(0)}")
        assert(r.getLong(3) === r.getLong(4), s"distortion diverges for ${r.getLong(0)}")
      }
      val adc = Pq.encode(e, model)
        .select($"vec_id", lit(query).cast("array<float>").as("qv"), $"codes")
        .select($"vec_id",
          Pq.adcBatchCol($"codes", $"qv", model).as("k_adc"),
          Pq.adcBatchColInline($"codes", $"qv", model).as("s_adc"))
        .collect()
      adc.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"adc diverges for ${r.getLong(0)}"))
    }
    parity()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try parity() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // structurally identical kernels compare equal (Seq-held codebooks,
    // the SignLshBucket convention) so CSE/canonicalization dedupe them
    locally {
      val child = org.apache.spark.sql.graftbridge.ColumnBridge.expression($"embedding")
      val cb1 = model.codebooks.map(_.map(_.toSeq))
      val cb2 = model.codebooks.map(_.map(_.map(identity).toSeq)) // distinct instances
      val k1 = graft.expressions.PqEncode(child, cb1)
      val k2 = graft.expressions.PqEncode(child, cb2)
      assert(k1 === k2 && k1.semanticEquals(k2))
    }
    // kernel edges: null input and wrong-width input are NULL rows
    val edges = Seq((1L, None: Option[Seq[Float]]), (2L, Some(Seq(1f, 2f))))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .select(Pq.encodeCol($"embedding", model).as("c"),
        Pq.distortionCol($"embedding", model).as("d"))
      .collect()
    edges.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("l2sqLocal mirrors the engine kernel bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(20)((Array.fill(8)(rnd.nextFloat()), Array.fill(8)(rnd.nextFloat())))
    val engine = pairs.toDF("a", "b")
      .select(graft.functions.VectorFunctions.l2sq($"a", $"b"))
      .collect().map(_.getDouble(0))
    pairs.zip(engine).foreach { case ((a, b), d) =>
      assert(java.lang.Double.doubleToLongBits(Pq.l2sqLocal(a, b)) ===
        java.lang.Double.doubleToLongBits(d))
    }
  }
}
