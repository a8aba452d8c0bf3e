package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Randomized differential test: the distributed minhash pipeline
  * (rep collapse, fingerprint grouping, banding, two-stage verify,
  * membership-map expansion) against a direct driver-side
  * implementation of the SAME algorithm definition (per-doc signatures,
  * band buckets, est prefilter, exact jaccard) — the definition the
  * DuckDB oracle states. Any divergence in the pipeline's rewrites
  * (collapse/expansion/fingerprinting) shows up as a set difference. */
@HeavyTest
class DedupDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side mirror of the algorithm definition (no rep collapse). */
  private def naive(docs: Seq[(Long, String)], numHashes: Int, bands: Int,
      threshold: Double): Map[(Long, Long), Double] = {
    val r = numHashes / bands
    val estFloor = math.max(0.0, threshold - 0.15)
    def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
    val byDoc = docs.map { case (id, text) =>
      val hs = norm(text).split(" ", -1).toSeq.distinct.map(hash32)
      val sig = (0 until numHashes).map(j => hs.map(h => (h * (2L * j + 1) + (j.toLong * j + 7)) % P).min)
      val buckets = (0 until bands).map(b => (b, sig.slice(b * r, b * r + r).mkString(":")))
      (id, hs.distinct.toSet, sig, buckets.toSet)
    }
    val pairs = for {
      (id1, h1, s1, b1) <- byDoc
      (id2, h2, s2, b2) <- byDoc
      if id1 < id2 && (b1 & b2).nonEmpty
      est = s1.zip(s2).count { case (x, y) => x == y }.toDouble / numHashes
      if est >= estFloor
      inter = (h1 & h2).size.toDouble
      j = inter / (h1.size + h2.size - inter)
      if j >= threshold
    } yield (id1, id2) -> j
    pairs.toMap
  }

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(1000L + i)))

  /** Driver-side mirror with char n-gram shingles (ASCII corpus, so
    * UTF-16/codepoint slicing differences cannot bite). */
  private def naiveNgram(docs: Seq[(Long, String)], n: Int, numHashes: Int,
      bands: Int, threshold: Double): Map[(Long, Long), Double] = {
    val r = numHashes / bands
    val estFloor = math.max(0.0, threshold - 0.15)
    val byDoc = docs.map { case (id, text) =>
      val grams = if (text.length < n) Seq.empty[String]
        else (0 to text.length - n).map(i => text.substring(i, i + n))
      val hs = grams.distinct.map(hash32)
      val sig = (0 until numHashes).map(j =>
        if (hs.isEmpty) null
        else hs.map(h => (h * (2L * j + 1) + (j.toLong * j + 7)) % P).min)
      val buckets = (0 until bands).map(b => (b, sig.slice(b * r, b * r + r).mkString(":")))
      (id, hs.distinct.toSet, sig, buckets.toSet)
    }
    val pairs = for {
      (id1, h1, s1, b1) <- byDoc
      (id2, h2, s2, b2) <- byDoc
      if id1 < id2 && (b1 & b2).nonEmpty
      est = s1.zip(s2).count { case (x, y) => x != null && x == y }.toDouble / numHashes
      if est >= estFloor
      denom = h1.size + h2.size - (h1 & h2).size
      j = if (denom == 0) 0.0 else (h1 & h2).size.toDouble / denom
      if j >= threshold
    } yield (id1, id2) -> j
    pairs.toMap
  }

  test("ngram pipeline (fused kernel) ≡ naive char-4-gram algorithm") {
    import graft.functions.TextFunctions.ngramHashes
    val alphabet = "abcdef "
    val docGen = for {
      n <- Gen.choose(0, 30)
      cs <- Gen.listOfN(n, Gen.oneOf(alphabet.toSeq))
    } yield cs.mkString
    val corpusGen = for {
      n <- Gen.choose(2, 10)
      texts <- Gen.listOfN(n, docGen)
    } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

    samples(corpusGen, 6).foreach { corpus =>
      val expected = naiveNgram(corpus, n = 4, numHashes = 48, bands = 16, threshold = 0.55)
      val got = Dedup.minhashNearDups(
          corpus.toDF("doc_id", "text"), threshold = 0.55, numHashes = 48, bands = 16,
          hashedShingler = c => ngramHashes(c, 4))
        .collect()
        .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
      spark.catalog.clearCache()
      assert(got.keySet === expected.keySet, s"corpus=$corpus")
      got.foreach { case (k, j) =>
        assert(math.abs(j - expected(k)) < 1e-9, s"jaccard mismatch at $k corpus=$corpus")
      }
      // distinct placement is a pure cost-model switch — identical rows
      val late = Dedup.minhashNearDups(
          corpus.toDF("doc_id", "text"), threshold = 0.55, numHashes = 48, bands = 16,
          hashedShingler = c => ngramHashes(c, 4), earlyCandidateDistinct = false)
        .collect()
        .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
      spark.catalog.clearCache()
      assert(late === got, s"earlyCandidateDistinct divergence corpus=$corpus")
    }
  }

  private def hash56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(7)
      .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  private def simhash56(text: String): Long = {
    def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
    val hs = norm(text).split(" ", -1).toSeq.distinct.map(hash56)
    (0 until 56).map { j =>
      if (2 * hs.count(h => ((h >> j) & 1) == 1) > hs.size) 1L << j else 0L
    }.sum
  }

  /** Driver-side GROUND TRUTH: full quadratic hamming join, NO blocking.
    * The pipeline's pigeonhole multi-band candidates must equal this
    * exactly — this is the recall guarantee under test, not a mirror of
    * the engine's blocking scheme. */
  private def naiveSimhash(docs: Seq[(Long, String)],
      maxHamming: Int): Set[(Long, Long, Long)] = {
    val byDoc = docs.map { case (id, text) => (id, simhash56(text)) }
    (for {
      (id1, s1) <- byDoc
      (id2, s2) <- byDoc
      if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2).toLong
      if h <= maxHamming
    } yield (id1, id2, h)).toSet
  }

  test("simhash pipeline ≡ unblocked quadratic ground truth on random corpora") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = for {
      n <- Gen.choose(0, 8)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(2, 12)
      texts <- Gen.listOfN(n, docGen)
    } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

    samples(corpusGen, 6).foreach { corpus =>
      val expected = naiveSimhash(corpus, maxHamming = 6)
      val got = Dedup.simhashNearDups(corpus.toDF("doc_id", "text"), maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      assert(got === expected, s"corpus=$corpus")
    }
  }

  test("simhash finds pairs whose differing bits are ALL in the top byte " +
      "(prefix blocking provably missed these)") {
    // Search deterministic single-token-substitution corpora for a pair
    // whose simhashes differ ONLY inside the top 8 bits (band 6 of 7).
    // Top-8-bit prefix blocking can never emit such a pair as a
    // candidate; pigeonhole banding must find it via one of the 6
    // agreeing low bands.
    val vocab = (0 until 40).map(i => s"w$i")
    val found = (for {
      base <- 0 until 40
      swap <- 0 until 40
      textA = (0 until 10).map(k => vocab((base + k) % 40)).mkString(" ")
      textB = (0 until 10).map(k =>
        if (k == 3) vocab(swap) else vocab((base + k) % 40)).mkString(" ")
      if textA != textB
      diff = simhash56(textA) ^ simhash56(textB)
      if diff != 0 && (diff >> 48) != 0 && (diff & ((1L << 48) - 1)) == 0 &&
        java.lang.Long.bitCount(diff) <= 6
    } yield (textA, textB)).headOption
    assert(found.isDefined,
      "search space produced no top-byte-only near pair; widen the search")
    val (ta, tb) = found.get
    val corpus = Seq((1L, ta), (2L, tb), (3L, "unrelated filler words entirely"))
    val got = Dedup.simhashNearDups(corpus.toDF("doc_id", "text"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got.contains((1L, 2L)),
      s"missed the engineered top-byte pair: a='$ta' b='$tb'")
  }

  /** Driver-side mirror of winnowing (hash32 of char k-grams in
    * position order, sliding-window minima, distinct). */
  private def naiveWinnow(text: String, k: Int, w: Int): Set[Long] = {
    if (text.length < k) return Set.empty
    val hs = (0 to text.length - k).map(i => hash32(text.substring(i, i + k)))
    val windows = math.max(hs.length - w + 1, 1)
    (0 until windows).map(i => hs.slice(i, i + w).min).toSet
  }

  test("fingerprintPairs ≡ naive winnow + df-cap + pair count on random corpora") {
    val alpha = "abcd "
    val gen = for {
      n <- Gen.choose(2, 10)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 40)
        cs <- Gen.listOfN(len, Gen.oneOf(alpha.toSeq))
      } yield cs.mkString)
    } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
    samples(gen, 6).foreach { corpus =>
      val k = 5; val w = 4; val maxDf = 3; val minShared = 2
      val fps = corpus.map { case (id, t) => id -> naiveWinnow(t, k, w) }.toMap
      val df = fps.values.flatten.groupBy(identity).map { case (fp, o) => fp -> o.size }
      val rare = df.collect { case (fp, c) if c <= maxDf => fp }.toSet
      val expected = (for {
        (id1, f1) <- fps; (id2, f2) <- fps
        if id1 < id2
        shared = (f1 & f2 & rare).size
        if shared >= minShared
      } yield (id1, id2, shared.toLong)).toSet
      val got = Dedup.fingerprintPairs(corpus.toDF("doc_id", "text"),
          k = k, w = w, maxDf = maxDf, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      assert(got === expected, s"corpus=$corpus")
    }
  }

  test("keep and connectedComponents ≡ naive forms on random corpora") {
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val docGen = for {
      n <- Gen.choose(0, 6)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(2, 10)
      texts <- Gen.listOfN(n, docGen)
    } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

    samples(corpusGen, 6).foreach { corpus =>
      val ids = corpus.map(_._1)
      // naive keep: drop every id on the id2 side of a naive minhash pair
      val mh = naive(corpus, numHashes = 12, bands = 4, threshold = 0.7)
      val expectedKeep = ids.toSet -- mh.keySet.map(_._2)
      val gotKeep = Dedup.minhashKeep(corpus.toDF("doc_id", "text"), threshold = 0.7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      spark.catalog.clearCache()
      assert(gotKeep === expectedKeep, s"keep corpus=$corpus")
      // naive CC over simhash pairs: iterate min-label to fixpoint
      val edges = naiveSimhash(corpus, 6).map(p => (p._1, p._2))
      var label = ids.map(i => i -> i).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m || label(b) != m) {
            label += a -> m; label += b -> m; changed = true
          }
        }
      }
      val gotCc = Dedup.simhashComponents(corpus.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.catalog.clearCache()
      assert(gotCc === label, s"cc corpus=$corpus")
    }
  }

  test("pipeline ≡ naive per-doc algorithm on random small corpora") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = for {
      n <- Gen.choose(0, 10)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(2, 12)
      texts <- Gen.listOfN(n, docGen)
    } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

    samples(corpusGen, 8).foreach { corpus =>
      val expected = naive(corpus, numHashes = 12, bands = 4, threshold = 0.7)
      val got = Dedup.minhashNearDups(
          corpus.toDF("doc_id", "text"), threshold = 0.7, numHashes = 12, bands = 4)
        .collect()
        .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
      spark.catalog.clearCache()
      assert(got.keySet === expected.keySet, s"corpus=$corpus")
      got.foreach { case (k, j) =>
        assert(math.abs(j - expected(k)) < 1e-9, s"jaccard mismatch at $k corpus=$corpus")
      }
    }
  }
}
