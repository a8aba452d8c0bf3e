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
