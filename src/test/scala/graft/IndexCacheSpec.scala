package graft

import org.apache.spark.sql.functions._
import graft.operators.KnnGraph
import graft.sources.Tables
import graft.util.IndexCache

/** The session index manager: identical deterministic builds share one
  * materialization (the reference's one-loaded-shard-many-queries
  * serving shape, vector_shard.cc:34-43), distinct inputs or params
  * never collide, and the cached frame is value-identical to a fresh
  * build. */
class IndexCacheSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sf)

  private def edges(df: org.apache.spark.sql.DataFrame) =
    df.select($"vec_id", $"nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("identical build requests share one materialization, value-identical to uncached") {
    IndexCache.clear()
    val m0 = IndexCache.misses
    val g1 = KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 2)
    val g2 = KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 2)
    assert(IndexCache.misses === m0 + 1, "second identical build must be a cache hit")
    val fresh = KnnGraph.buildSearchGraphUncached(e, m = 4, ringM = 2,
      rounds = 2, targetBlock = 64, idCol = "vec_id", embCol = "embedding")
    assert(edges(g1) === edges(fresh), "cached build drifted from a fresh build")
    assert(edges(g2) === edges(g1))
  }

  test("projection keying: a carried extra column does not defeat sharing; different subsets/params do") {
    IndexCache.clear()
    val m0 = IndexCache.misses
    KnnGraph.buildSearchGraph(e.select($"vec_id", $"embedding"), m = 4,
      ringM = 2, rounds = 1)
    // same rows, extra label column carried: same (id, embedding) plan
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 1, "projection keying must share across carried columns")
    // a different id-subset is a different index
    KnnGraph.buildSearchGraph(e.filter($"vec_id" % 2 === 0), m = 4,
      ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 2)
    // different params are a different index
    KnnGraph.buildSearchGraph(e, m = 5, ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 3)
  }

  test("hier layers ride the same cache: layer 0 of buildHierGraph == the flat build") {
    IndexCache.clear()
    val m0 = IndexCache.misses
    val flat = KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 2)
    val layers = KnnGraph.buildHierGraph(e, m = 4, ringM = 2, rounds = 2,
      maxLevel = 1)
    // layer 0 is the identical request — only layer 1's build misses
    assert(IndexCache.misses === m0 + 2)
    assert(edges(layers.head) === edges(flat))
  }

  test("literal payloads reach the key: trainings over differently-rotated frames never share") {
    IndexCache.clear()
    import graft.operators.{Opq, Pq}
    val dim = e.select($"embedding").head.getSeq[Float](0).length
    val ident = (0 until dim).map(i =>
      Array.tabulate(dim)(j => if (i == j) 1.0f else 0.0f)).toSeq
    val perm = (0 until dim).map(i =>
      Array.tabulate(dim)(j => if ((i + 1) % dim == j) 1.0f else 0.0f)).toSeq
    val m0 = IndexCache.misses
    val a = Pq.train(Opq.rotate(e, ident), m = 4, ks = 4)
    val b = Pq.train(Opq.rotate(e, perm), m = 4, ks = 4)
    assert(IndexCache.misses === m0 + 2,
      "two rotations differing only in literal content must key separately")
    assert(a.codebooks !== b.codebooks)
  }

  test("self-heal: a blanket unpersist degrades the next hit to a rebuild, never a dead-checkpoint read") {
    // the r11 red-suite failure mode: a harness sweeping
    // getPersistentRDDs between queries killed a live pin and the next
    // cache hit died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. The cache
    // must detect the dead pin and rebuild.
    IndexCache.clear()
    val m0 = IndexCache.misses
    val g1 = KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    val ref = edges(g1)
    assert(IndexCache.misses === m0 + 1)
    // the hostile sweep (deliberately NOT the pin-preserving helper)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val g2 = KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 2, "dead pin must rebuild, not serve")
    assert(edges(g2) === ref, "healed build drifted")
    // and the healed entry serves hits again
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 2)
  }

  test("pin-preserving sweep keeps live entries serving") {
    IndexCache.clear()
    val m0 = IndexCache.misses
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    IndexCache.unpersistAllExcept(spark.sparkContext)
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    assert(IndexCache.misses === m0 + 1,
      "the scoped sweep must not evict the live pin")
  }

  test("build wall time is accounted per miss") {
    IndexCache.clear()
    val b0 = IndexCache.buildNanos
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    val afterMiss = IndexCache.buildNanos
    assert(afterMiss > b0, "a miss must add build nanos")
    KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
    assert(IndexCache.buildNanos === afterMiss, "a hit must add none")
  }

  test("disabled cache builds per call") {
    IndexCache.clear()
    IndexCache.enabled = false
    try {
      val m0 = IndexCache.misses
      KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
      KnnGraph.buildSearchGraph(e, m = 4, ringM = 2, rounds = 1)
      assert(IndexCache.misses === m0, "disabled cache must not record entries")
    } finally IndexCache.enabled = true
  }

  test("persisted store: a NEW session's identical build is served as a read; keys isolate inputs/params; local leaves skip the layer") {
    IndexCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-idxstore").toString
    sys.props("graft.indexStoreDir") = dir
    sys.props("graft.indexStoreMinBuildSec") = "0.0" // write everything
    try {
      val input = Tables.documents(spark, sf).select($"doc_id", $"lang")
      var builds = 0
      def plan(df: org.apache.spark.sql.DataFrame) = {
        builds += 1
        df.groupBy(col("lang")).agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("s"))
      }
      val w0 = IndexCache.storeWrites
      val r0 = IndexCache.storeReads
      val a = IndexCache.frame(input, Seq("spec-store"))(plan(input))
      val aRows = a.collect().toSet
      assert(builds === 1)
      assert(IndexCache.storeWrites === w0 + 1, "build must write through")
      // a NEW session: the in-memory key (session UUID) misses, the
      // content-addressed artifact hits — the build becomes a read
      val s2 = spark.newSession()
      val input2 = Tables.documents(s2, sf).select(col("doc_id"), col("lang"))
      val b = IndexCache.frame(input2, Seq("spec-store"))(plan(input2))
      assert(builds === 1, "second session must be served from the store")
      assert(IndexCache.storeReads === r0 + 1)
      assert(b.collect().toSet === aRows, "store read drifted from the build")
      // different params → different artifact → a real build
      IndexCache.frame(input2, Seq("spec-store-other"))(plan(input2))
      assert(builds === 2)
      // a LocalRelation leaf has no safe content signature: the layer
      // must skip it (build runs, nothing written)
      val w1 = IndexCache.storeWrites
      val local = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "lang")
      IndexCache.frame(local, Seq("spec-store-local"))(plan(local))
      assert(builds === 3)
      assert(IndexCache.storeWrites === w1, "local-leaf plans must not persist")
    } finally {
      sys.props.remove("graft.indexStoreDir")
      sys.props.remove("graft.indexStoreMinBuildSec")
      IndexCache.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
