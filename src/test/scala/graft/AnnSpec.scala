package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Knn}
import graft.sources.Tables

/** IVF correctness: assignment is a partition of the table; search recall
  * against the exact brute-force baseline is high at nprobe=2 on the
  * testdata (and exactly 1.0 at nprobe=K). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val centroids = Ann.seedCentroids(e, 8)

  test("assignment covers every vector exactly once") {
    val assigned = Ann.assign(e, centroids)
    assert(assigned.count() === e.count())
    assert(assigned.select("vec_id").distinct().count() === e.count())
  }

  test("nprobe = K degenerates to exact search") {
    val q = e.filter($"vec_id" === 42)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val ivf = Ann.search(e, centroids, q, k = 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.batchTopK(e, q, k = 10)
      .orderBy($"rank").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivf === exact)
  }

  test("nprobe=2 recall@10 is reasonable on testdata") {
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val ivf = Ann.search(e, centroids, q, k = 10, nprobe = 2)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = Knn.batchTopK(e, q, k = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      ivf.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg > 0.3, s"avg recall@10 nprobe=2 was $avg") // random data: cells ~uniform
  }

  test("assign is row-local: no exchange, no join, no window in the plan") {
    val plan = Ann.assign(e, centroids).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("search plan: BottomK partial agg, no per-query window, single broadcast join") {
    val q = e.filter($"vec_id" === 42)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val plan = Ann.search(e, centroids, q, k = 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.toLowerCase.contains("bottomk"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("lsh: hyperplanes deterministic; near-identical vectors share a bucket") {
    val p1 = Ann.hyperplanes(8, 64)
    val p2 = Ann.hyperplanes(8, 64)
    assert(p1 === p2)
    assert(p1.flatten.forall(v => v >= -1.0 && v < 1.0))
    import spark.implicits._
    val base = Seq.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val twin = base.updated(0, base.head + 1e-6f)
    val far = base.map(v => -v)
    val got = Seq((1L, base), (2L, twin), (3L, far)).toDF("vec_id", "embedding")
    val buckets = Ann.withLshBucket(got, planes = 8)
      .select("vec_id", "lsh_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) === buckets(2L)) // near-identical → same bucket
    assert(buckets(1L) !== buckets(3L)) // antipodal → all bits flip
    assert((buckets(1L) ^ buckets(3L)) === 255L)
  }

  test("lsh: native kernel ≡ literal-fold spec (random vectors, edge cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0L until 150L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))) :+
      (900L, Seq.fill(64)(0f)) :+                  // all-zero: every dot = +0 → all bits
      (903L, Seq.fill(64)(Float.NaN)) :+           // NaN dots: Spark's >= says bit SET
      (904L, null.asInstanceOf[Seq[Float]])        // null array: fold yields 0L, not null
    val df = rows.toDF("vec_id", "embedding")
    for (planes <- Seq(8, 16, 62)) {
      val hp = Ann.hyperplanes(planes, 64)
      val got = df.select($"vec_id",
          Ann.lshBucket($"embedding", hp).as("k"),
          Ann.lshBucketFold($"embedding", hp).as("s"))
        .collect()
      got.foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2),
          s"planes=$planes vec=${r.getLong(0)} nulled a bucket")
        assert(r.getLong(1) === r.getLong(2),
          s"planes=$planes vec=${r.getLong(0)}")
      }
      val byId = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byId(903L) === (1L << planes) - 1) // NaN ≥ 0 in SQL: all bits
      assert(byId(904L) === 0L)                 // null array: bucket 0
    }
    // structural equality (ADVICE r6): two kernels over equal matrices
    // canonicalize equal, so CSE/canonicalization dedups repeated columns
    locally {
      val hp = Ann.hyperplanes(8, 64)
      val child = org.apache.spark.sql.graftbridge.ColumnBridge.expression($"embedding")
      val k1 = graft.expressions.SignLshBucket(child, hp)
      // a deep-copied matrix: distinct Seq instances, equal contents
      val k2 = graft.expressions.SignLshBucket(child, hp.map(_.map(identity)))
      assert(k1 === k2)
      assert(k1.semanticEquals(k2))
    }
    // kernel-only edges: an array shorter than the plane dimension is a
    // bucket-0 row (the fold spec throws under ANSI, tolerates under
    // non-ANSI — the kernel picks the lenient behavior either way)
    val short = Seq((901L, Seq.empty[Float]), (902L, Seq.fill(3)(1f)))
      .toDF("vec_id", "embedding")
      .select(Ann.lshBucket($"embedding", Ann.hyperplanes(8, 64)).as("k"))
      .collect().map(_.getLong(0))
    assert(short.toSeq === Seq(0L, 0L))
    // interpreted eval parity (codegen off) on the same frame
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val hp = Ann.hyperplanes(8, 64)
      val interp = df.select($"vec_id", Ann.lshBucket($"embedding", hp).as("k"),
          Ann.lshBucketFold($"embedding", hp).as("s")).collect()
      interp.foreach(r => assert(r.getLong(1) === r.getLong(2)))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("refine produces K centroids of the right dimension") {
    val refined = Ann.refine(e, centroids)
    assert(refined.count() === 8)
    assert(refined.select(size($"centroid")).head().getInt(0) === 64)
  }

  test("IVF store: probing a cell-partitioned table is partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      Ann.withCells(e, centroids).write.mode("overwrite")
        .partitionBy("cell").parquet(dir)
      val stored = spark.read.parquet(dir)
      val probed = stored.filter($"cell".isin(1L, 3L))
      val scan = probed.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"), scan)
      // the probe really reads only the probed cells' files
      // partition columns are type-inferred (int) from directory names
      val cells = probed.select($"cell".cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(cells.subsetOf(Set(1L, 3L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fold path ≡ inline path for nearestCell and probeCells (same K)") {
    val cents = Ann.collectCentroids(centroids) // K=8
    val both = e.limit(100).select(
      Ann.nearestCellInline($"embedding", cents).as("inline"),
      Ann.nearestCellFold($"embedding", cents).as("fold"),
      Ann.probeCells($"embedding", cents, 3).as("probeInline"),
      transform(slice(array_sort(Ann.scoredCells($"embedding", cents)), 1, 3),
        s => s.getField("cell")).as("probeFold")).collect()
    both.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
  }

  test("K=4096, dim=64: broadcast probe kernel compiles, plans O(1), " +
      "matches driver argmin AND the literal-fold spec") {
    // 4096 deterministic centroids — production cell count; nearestCell/
    // probeCells route through the Broadcast-backed kernel here
    val cents = Seq.tabulate(4096) { k =>
      (k.toLong, Array.tabulate(64)(d => (math.sin(k * 64 + d) * 10).toFloat))
    }
    val sample = e.limit(20)
    val got = sample.select($"vec_id",
        Ann.nearestCell($"embedding", cents).as("cell"),
        Ann.probeCells($"embedding", cents, 4).as("probed"),
        Ann.nearestCellFold($"embedding", cents).as("foldCell"),
        transform(slice(array_sort(Ann.scoredCells($"embedding", cents)), 1, 4),
          s => s.getField("cell")).as("foldProbed"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2),
        r.getLong(3), r.getSeq[Long](4))).toList
    // driver-side expected argmin with (dist, cell) tie-break
    val vecs = sample.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    got.foreach { case (id, cell, probed, foldCell, foldProbed) =>
      val ranked = cents.map { case (cid, c) => (d2(vecs(id), c), cid) }.sorted
      assert(cell === ranked.head._2)
      assert(probed.toList === ranked.take(4).map(_._2))
      // broadcast kernel ≡ literal-fold executable spec
      assert(cell === foldCell)
      assert(probed.toList === foldProbed.toList)
    }
  }

  test("rpProject column ≡ rpProjectLocal driver mirror; planes are ±1") {
    val planes = Ann.rpPlanes(16, 64)
    assert(planes.size === 16 && planes.forall(_.length === 64))
    assert(planes.flatten.forall(v => v == 1f || v == -1f))
    // same matrix every call (pure function of the md5 derivation)
    assert(Ann.rpPlanes(16, 64).map(_.toSeq) === planes.map(_.toSeq))
    val rows = e.limit(5).select($"vec_id", $"embedding",
        Ann.rpProject($"embedding", planes).as("pv"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1).toArray
      assert(r.getSeq[Float](2).toArray.toSeq ===
        Ann.rpProjectLocal(emb, planes).toSeq)
    }
  }

  test("rpSearch finds a planted near-identical neighbor first") {
    // proj is linear: proj(q + eps) − proj(q) = proj(eps), so a tiny
    // perturbation stays nearest in the projected space and survives
    // the shortlist regardless of how the other vectors project
    val q = Array.tabulate(64)(i => (math.sin(i + 1) * 2).toFloat)
    val near = q.clone(); near(0) = near(0) + 1e-3f
    val far = (1 to 40).map(s =>
      (100L + s, Array.tabulate(64)(i => (math.cos(s * 64 + i) * 10).toFloat)))
    val vecs = ((1L, near) +: far).toDF("vec_id", "embedding")
    val got = Ann.rpSearch(vecs, q, outDim = 16, r = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 === 1L)
    assert(got.head._2 < 1e-5)
  }
}
