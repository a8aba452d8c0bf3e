package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions._

@HeavyTest
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "THE   quick Brown fox"),          // exact dup after normalization
    (3L, "the quick brown fox jumps"),      // near dup (token jaccard 4/5)
    (4L, "completely different content here"),
    (5L, "the quick brown fox")             // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized variants, keeps min id") {
    val got = Dedup.exact(docs).collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byId(1L) === 3) // docs 1, 2, 5
    assert(byId(3L) === 1)
    assert(byId(4L) === 1)
  }

  test("minhash LSH finds exact and near dups above threshold") {
    // bands=6 (r=2): P(candidate | j=0.8) = 1-(1-0.64)^6 ≈ 0.998
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.7, bands = 6)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
    assert(pairs.contains((2L, 5L)))
    assert(pairs.contains((1L, 3L))) // jaccard 0.8
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signature of identical token sets is identical") {
    val sig = Dedup.withMinhash(docs, "text", 1, 12)
      .select($"doc_id", $"minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("simhash near-dups: identical token sets collide, distinct texts don't") {
    val got = Dedup.simhashNearDups(docs, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("fingerprintPairs: rare shared substrings pair up, boilerplate is filtered") {
    val boiler = "common boilerplate run shared by everyone here"
    val corpus = Seq(
      (1L, s"alpha UNIQUE-SHARED-SEGMENT-OF-TEXT omega $boiler"),
      (2L, s"beta UNIQUE-SHARED-SEGMENT-OF-TEXT gamma $boiler"),
      (3L, s"three $boiler"), (4L, s"four $boiler"), (5L, s"five $boiler"),
      (6L, s"six $boiler"), (7L, s"seven $boiler")
    ).toDF("doc_id", "text")
    // df cap 2: only fingerprints private to ≤2 docs count — the
    // boilerplate (df 7) contributes nothing
    val got = Dedup.fingerprintPairs(corpus, maxDf = 2, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got === Set((1L, 2L)))
  }

  test("embedding near-dups finds only close pairs within block") {
    val vecs = Seq(
      (1L, 0, Seq(0f, 0f)), (2L, 0, Seq(0.1f, 0f)),
      (3L, 0, Seq(5f, 5f)), (4L, 1, Seq(0.05f, 0f))  // close to 1 but other block
    ).toDF("vec_id", "label", "embedding")
    val got = Dedup.embeddingNearDups(vecs, col("label"), maxL2Sq = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("multi-probe embedding dedup is a strict superset of single-probe (testdata)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Dedup.embeddingNearDupsIvf(e, targetBlock = 64))
    val multi = pairs(Dedup.embeddingNearDupsIvfMultiProbe(e, targetBlock = 64, nprobe = 2))
    // probing MORE cells can only add shared-cell pairs, never lose one
    assert(single.subsetOf(multi))
    // non-vacuous: the fixture has boundary-straddling pairs recovered
    assert(multi.size > single.size,
      s"multi-probe found nothing new (single=${single.size})")
    // nprobe=1 through the multi-probe path ≡ the argmin path
    val mp1 = pairs(Dedup.embeddingNearDupsIvfMultiProbe(e, targetBlock = 64, nprobe = 1))
    assert(mp1 === single)
  }

  test("duplicate ids with different embeddings keep their own IVF assignment") {
    // the reference's cross-shard duplicate quirk: same id, two vectors —
    // each copy must block and pair independently (an id-keyed group
    // would drop one copy nondeterministically)
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (1L, Seq(5f, 5f)),
      (2L, Seq(0.1f, 0f)), (3L, Seq(5f, 5.1f))
    ).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // copy A of id 1 is near 2, copy B is near 3 — BOTH pairs must exist
    val single = pairs(Dedup.embeddingNearDupsIvf(vecs, targetBlock = 64, maxL2Sq = 1.0))
    assert(single === Set((1L, 2L), (1L, 3L)))
    val multi = pairs(Dedup.embeddingNearDupsIvfMultiProbe(
      vecs, targetBlock = 64, nprobe = 2, maxL2Sq = 1.0))
    assert(multi === Set((1L, 2L), (1L, 3L)))
  }

  test("minhashKeep ≡ keepList over expanded pairs (testdata)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaPairs = Dedup.keepList(docs,
        Dedup.minhashNearDups(docs, threshold = 0.8))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.minhashKeep(docs, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(direct === viaPairs)
  }

  test("connectedComponents collapses chains; singletons map to themselves") {
    val nodes = (1L to 7L).toDF("doc_id")
    // chain 1-2-3 (no 1-3 edge), clique 5-6; 4 and 7 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L)
    // default regime (driver union-find at this size)
    val got = Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // distributed loop regime forced
    spark.conf.set("graft.cc.driverUnionFindEdges", "0")
    try {
      val loop = Dedup.connectedComponents(nodes, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loop === expected)
    } finally spark.conf.unset("graft.cc.driverUnionFindEdges")
  }

  test("driver union-find ≡ distributed loop on a random pair graph") {
    val rnd = new scala.util.Random(42)
    val n = 400
    val nodes = (1L to n.toLong).toDF("doc_id")
    val edges = Seq.fill(500) {
      val a = rnd.nextInt(n).toLong + 1; val b = rnd.nextInt(n).toLong + 1
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val pairs = edges.toDF("id1", "id2")
    val viaDriver = Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("graft.cc.driverUnionFindEdges", "0")
    val viaLoop = try Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally spark.conf.unset("graft.cc.driverUnionFindEdges")
    assert(viaDriver === viaLoop)
    // sanity: labels are component minima (fixpoint under both steps)
    assert(viaDriver.forall { case (id, c) => c <= id })
  }

  test("on transitively-closed pair sets, CC roots ≡ keepList survivors") {
    val nodes = (1L to 6L).toDF("doc_id")
    // two complete cliques: {1,2,3} and {4,6}
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 6L)).toDF("id1", "id2")
    val roots = Dedup.connectedComponents(nodes, pairs)
      .filter($"doc_id" === $"component")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = Dedup.keepList(nodes, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(roots === survivors)
    assert(roots === Set(1L, 4L, 5L))
  }

  test("connectedComponents with reliable checkpoints (graft.cc.reliableCheckpoint)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    spark.conf.set("graft.cc.reliableCheckpoint", "true")
    // reliable checkpointing only exists on the distributed loop path
    spark.conf.set("graft.cc.driverUnionFindEdges", "0")
    try {
      val nodes = (1L to 7L).toDF("doc_id")
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
      val cc = Dedup.connectedComponents(nodes, pairs)
      val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
        5L -> 5L, 6L -> 5L, 7L -> 7L))
      // the rounds actually went through the reliable path: the FINAL
      // round's checkpoint files exist under the configured dir...
      def deepFiles(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(deepFiles) else Seq(f)
      assert(deepFiles(dir).nonEmpty)
      // ...and finished rounds' files were deleted as the loop advanced
      // (one rdd-N dir would otherwise pile up per round): the graph
      // needs ≥ 2 rounds (chain 1-2-3) plus the initial labels frame,
      // so without cleanup ≥ 3 rdd dirs would remain.
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        f.listFiles().toSeq.flatMap(c =>
          if (c.getName.startsWith("rdd-")) Seq(c) else rddDirs(c))
      assert(rddDirs(dir).size === 1,
        s"stale round checkpoint dirs: ${rddDirs(dir)}")
      // the returned frame stays readable after round cleanup
      assert(cc.count() === 7)
    } finally {
      spark.conf.unset("graft.cc.reliableCheckpoint")
      spark.conf.unset("graft.cc.driverUnionFindEdges")
      def rmRf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmRf)
        f.delete()
      }
      rmRf(dir)
    }
  }

  test("connectedComponents frees only its own round blocks") {
    val sc = spark.sparkContext
    // an unrelated checkpointed frame alive across the whole call — the
    // round cleanup must not touch it (the r4 ADVICE scenario: a global
    // persistent-RDD id diff unpersisted concurrent jobs' only copy)
    val bystander = Seq((1L, "x"), (2L, "y")).toDF("id", "v").localCheckpoint(true)
    val bystanderRows = bystander.collect().toSet
    val before = sc.getPersistentRDDs.keySet
    val nodes = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    // the round-block cleanup under test lives on the distributed loop
    spark.conf.set("graft.cc.driverUnionFindEdges", "0")
    try Dedup.connectedComponents(nodes, pairs).count()
    finally spark.conf.unset("graft.cc.driverUnionFindEdges")
    // every intermediate round was freed: at most the final round's
    // labels (1 RDD) survives beyond what existed before
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"leaked round checkpoints: $leaked")
    // the bystander's blocks are intact (unpersisting a localCheckpoint
    // destroys the only copy — a re-collect would throw)
    assert(bystander.collect().toSet === bystanderRows)
    sc.getPersistentRDDs.filter { case (id, _) => !before.contains(id) }
      .values.foreach(_.unpersist(false))
  }

  test("simhashComponents ≡ generic CC over the expanded pair set (testdata)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaReps = Dedup.simhashComponents(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = Dedup.connectedComponents(docs, Dedup.simhashNearDups(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReps === viaPairs)
    spark.catalog.clearCache()
  }

  test("JaccardSortedLongs ≡ JaccardLongs on sorted distinct inputs") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq(1L, 2L), Seq(5L, 6L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(4L), Seq(4L))
    ).toDF("a", "b").select(
      column(graft.expressions.JaccardSortedLongs(expression($"a"), expression($"b"))).as("m"),
      column(graft.expressions.JaccardLongs(expression($"a"), expression($"b"))).as("n"))
    df.collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("jaccard is symmetric and bounded") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
      .select(jaccard($"a", $"b").as("j1"), jaccard($"b", $"a").as("j2"))
    val r = df.head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("duplicatedSpans finds a planted shared substring at exact positions") {
    // 10-token boilerplate planted at token offset 5 of doc 1 and
    // offset 0 of doc 2; all other tokens globally unique
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val d1 = ((0 until 5).map(i => s"u$i") :+ boiler).mkString(" ") +
      " " + (0 until 5).map(i => s"v$i").mkString(" ")
    val d2 = boiler + " " + (0 until 6).map(i => s"w$i").mkString(" ")
    val d3 = (0 until 12).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, k = 4, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 4-gram starts inside the 10-token block: 7 per copy, adjacent →
    // one maximal span covering exactly the planted tokens
    assert(got === Set((1L, 5L, 14L, 10L), (2L, 0L, 9L, 10L)))
  }

  test("duplicatedSpans: within-doc repetition also marks spans; short docs skipped") {
    val rep = "p q r s p q r s"            // 4-gram "p q r s" occurs twice
    val df = Seq((1L, rep), (2L, "t u v")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, k = 4, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // starts 0 and 4 duplicated, non-adjacent run merging: starts {0,4}
    // are not consecutive → two spans [0,3] and [4,7]
    assert(got === Set((1L, 0L, 3L), (1L, 4L, 7L)))
    assert(!got.exists(_._1 == 2L))
  }

  test("incremental probe finds exactly the full pipeline's cross pairs") {
    // corpus 1-5, batch 11-14; batch doc 11 = exact dup of 1, 12 = near
    // dup of 3, 13 = unique, 14 = near dup of 4; 12~13 is a WITHIN-batch
    // relation the probe must NOT emit
    val corpus = docs
    val batch = Seq(
      (11L, "the quick brown fox"),
      (12L, "the quick brown fox jumps high"),
      (13L, "some fresh batch only material"),
      (14L, "completely different content here today")
    ).toDF("doc_id", "text")
    val t = 0.5
    val got = Dedup.incrementalNearDups(
        Dedup.minhashIndex(corpus, bands = 6),
        Dedup.minhashIndex(batch, bands = 6),
        numHashes = 12, bands = 6, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every emitted pair crosses sides and meets the threshold
    assert(got.forall { case (n, c, j) => n >= 11L && c <= 5L && j >= t })
    // differential: the full pipeline on corpus ∪ batch, restricted to
    // cross pairs (corpus ids < 10 < batch ids ⇒ id1 = corpus side)
    val full = Dedup.minhashNearDups(corpus.unionByName(batch),
        numHashes = 12, bands = 6, threshold = t)
      .filter($"id1" <= 5L && $"id2" >= 11L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(got.toSet === full)
    assert(got.toSet.contains((11L, 1L, 1.0)))
    assert(!got.exists { case (n, _, _) => n == 13L })
    spark.catalog.clearCache()
  }

  test("incremental probe: empty batch and empty corpus yield no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalNearDups(
      Dedup.minhashIndex(docs), Dedup.minhashIndex(empty)).count() === 0L)
    assert(Dedup.incrementalNearDups(
      Dedup.minhashIndex(empty), Dedup.minhashIndex(docs)).count() === 0L)
  }
}
