package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Scale-up smoke: replicate the sf0.1 documents table k× with a
  * replica-unique suffix on EVERY token, so each replica is a disjoint
  * vocabulary shard carrying the original's internal duplicate
  * structure — duplicate density stays constant while volume grows k×
  * (the realistic corpus-growth model; suffixing whole docs instead
  * would densify the near-dup graph quadratically). Run manually via
  * `Test/runMain graft.ProfileScale`. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("minhash100")) { minhash100(spark); spark.stop(); return }
    import spark.implicits._
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    val n = base.count()
    def replicate(k: Int) = (0 until k).map { i =>
      base.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", "$1" + s"x$i").as("text"))
    }.reduce(_ unionByName _)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
      spark.catalog.clearCache()
    }
    Seq(1, 3, 10).foreach { k =>
      val docs = replicate(k)
      println(s"PROF scale=$k docs=${n * k}")
      time(s"minhash-x$k")(
        graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8).count())
      time(s"keep-x$k")(
        graft.operators.Dedup.minhashKeep(docs, threshold = 0.8).count())
      time(s"cc-x$k")(
        graft.operators.Dedup.simhashComponents(docs).count())
      time(s"fp-x$k")(
        graft.operators.Dedup.fingerprintPairs(docs).count())
    }
    // EMBEDDING IVF-CELL BLOCKING: replicate the embeddings table k×
    // (ids offset, vectors shifted by a per-replica constant so
    // replicas occupy disjoint regions — corpus grows, local density
    // constant). The claim under test: cell count ⌈N/64⌉ scales with N,
    // so the MAX block population stays ≈ targetBlock regardless of
    // corpus size — the within-block pair join never goes quadratic
    // (the old label blocking put N/10 vectors in every block).
    locally {
      val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
        .select($"vec_id", $"embedding")
      val en = embBase.count()
      def repEmb(k: Int) = (0 until k).map { i =>
        embBase.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
          transform($"embedding", x => x + lit(i * 10.0f)).as("embedding"))
      }.reduce(_ unionByName _)
      // Two-level build (r7): the claim under test is now TWO-sided —
      // (a) max fine-block population stays ≈ targetBlock while N×10,
      // and (b) DRIVER TRAFFIC (collected coarse seeds) stays bounded:
      // Kc = min(cap, ⌈√⌈N/64⌉⌉) — with the cap pinned at the ×1 Kc,
      // driver rows are CONSTANT across the 10× scale-up while blocks
      // stay bounded (the old single-level build collected ⌈N/64⌉ =
      // O(N) rows). Run uncapped too for the √-growth default.
      val capAtX1 = math.ceil(math.sqrt(
        math.max(1L, (en + 63) / 64).toDouble)).toInt
      Seq(1, 3, 10).foreach { k =>
        val vecs = repEmb(k)
        val nn = en * k
        Seq(("uncapped", 65536), ("capped", capAtX1)).foreach {
          case (label, cap) =>
            val (kc, assigned) = graft.operators.Dedup.ivfTwoLevelBlocks(
              vecs, targetBlock = 64, coarseKMax = cap)
            val pop = assigned
              .groupBy($"blk").agg(count(lit(1)).as("pop"))
              .agg(max($"pop").as("mx"), avg($"pop").as("av")).head()
            println(s"PROF emb-ivf-x$k[$label]: N=$nn driverRows=$kc " +
              s"maxBlock=${pop.getLong(0)} avgBlock=${pop.getDouble(1)}")
        }
        time(s"emb-ivf-x$k")(
          graft.operators.Dedup.embeddingNearDupsIvf(vecs, targetBlock = 64)
            .count())
      }
    }
    // ADVERSARIAL CC: a single path graph (worst case for label
    // propagation — diameter = node count). Pointer jumping doubles the
    // spread distance per round, so rounds should grow ~log2(n), not n;
    // GRAFT_CC_DEBUG=1 prints the round count to verify. Forces the
    // distributed loop — the chains fit the driver union-find regime,
    // but the loop is what this case is evidence for.
    spark.conf.set("graft.cc.driverUnionFindEdges", "0")
    Seq(1000, 10000, 100000).foreach { chain =>
      val nodes = spark.range(0, chain).select($"id".as("doc_id"))
      val pairs = spark.range(0, chain - 1)
        .select($"id".as("id1"), ($"id" + 1).as("id2"))
      time(s"cc-chain-$chain")(
        graft.operators.Dedup.connectedComponents(nodes, pairs)
          .filter($"component" === 0L).count())
    }
    spark.conf.unset("graft.cc.driverUnionFindEdges")
    spark.stop()
  }

  /** Round-18 evidence (VERDICT r17 next #5): the 100× MinHash row —
    * the production-critical banding path under a Heaps-law corpus
    * (the ProfileContain `heaps100` generator: tail vocabulary ∝ N,
    * fixed 64-token boilerplate head — real corpora grow vocabulary
    * with size; a frozen vocabulary makes ANY exact LSH table
    * quadratic, the already-measured containment result). The rows
    * pin: (a) banded candidate volume per doc stays FLAT as N grows
    * 1× → 10× → 100× (the (band, bucket) equi-join is postings-bound,
    * linear-ish in N — never pair-quadratic), and (b) signature-build
    * wall grows ~linearly in N (it is one scan + per-row hashing).
    * Session memo DISABLED — this harness measures true build cost. */
  private def minhash100(spark: SparkSession): Unit = {
    import org.apache.spark.storage.StorageLevel
    import graft.operators.Dedup
    // headTenths = how many positions in 10 draw from the FIXED
    // 64-token boilerplate head (the frozen-vocab component): 3 = the
    // heaps100 mixed corpus; 0 = pure Heaps tail. The pair separates
    // the two regimes: a fixed head concentrates each family's minimum
    // hash onto few values (band buckets collapse onto the head vocab,
    // bucket sizes ∝ N — the containment-row result that a FROZEN
    // vocabulary is quadratic for ANY exact filter), while a
    // vocabulary growing with N keeps buckets selective.
    def synth(n: Long, headTenths: Int) = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(40)), i => {
        val h = abs(hash(col("id") * 97 + i * 131))
        concat(lit("tok"),
          when(pmod(abs(hash(col("id") * 31 + i)), lit(10)) < headTenths,
            pmod(h, lit(64)))
          .otherwise(pmod(h, lit(n)) + 64))
      })).as("text"))
    for (headTenths <- Seq(3, 0); n <- Seq(20000L, 200000L, 2000000L)) {
      val docs = synth(n, headTenths).persist(StorageLevel.MEMORY_AND_DISK)
      docs.count()
      graft.util.IndexCache.enabled = false
      try {
        // signature build: shingle-hash pass + all 12 families
        val t0 = System.nanoTime()
        val sig = docs.select(col("doc_id").as("id"),
            transform(array_distinct(tokens(col("text"))),
              s => hash32(s)).as("hs"))
          .select(col("id"), minhashFamilies(col("hs"), 12).as("minhash_sig"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val rows = sig.count()
        val sigWall = (System.nanoTime() - t0) / 1e9
        // banded candidate volume: raw (band, bucket) collisions = the
        // equi-join's true output, and its distinct form (the index)
        val candRaw = Dedup.lshCandidates(sig, "id", 4, 3, dedupe = false).count()
        val candD = Dedup.lshCandidates(sig, "id", 4, 3, dedupe = true).count()
        // the full pipeline end-to-end at this scale (build + serve)
        val t1 = System.nanoTime()
        val out = Dedup.minhashNearDups(docs, threshold = 0.8).count()
        val pipeWall = (System.nanoTime() - t1) / 1e9
        val nsq = rows * (rows - 1) / 2
        print(s"head=${headTenths}/10 ")
        println(f"N=$n%8d sig_wall=$sigWall%7.1f s cand_raw=$candRaw%12d " +
          f"cand_distinct=$candD%12d perDoc=${candRaw.toDouble / n}%8.2f " +
          f"N^2/2=$nsq%17d ratio=${candRaw.toDouble / nsq}%10.8f " +
          f"out=$out%8d pipe_wall=$pipeWall%7.1f s")
        sig.unpersist(false)
      } finally graft.util.IndexCache.enabled = true
      docs.unpersist(false)
      spark.catalog.clearCache()
      graft.util.IndexCache.unpersistAllExcept(spark.sparkContext)
      ()
    }
  }
}
