package graft

import org.apache.spark.sql.functions._
import graft.operators.Bq

/** Binary quantization: the engine's HOF bit packing is bit-identical
  * to the driver mirror (incl. the sign bit and the zero→0 rule),
  * Hamming matches a driver popcount, and the rerank pipeline returns
  * exact distances for shortlist members only. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  test("signBitsCol ≡ signBitsLocal on random vectors (bit 63, zeros, negatives)") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 64L).map { i =>
      val v = Array.tabulate(64) { d =>
        // force exercised edges: exact zeros, sign flips, bit 63 set
        if (d == 63 && i % 2 == 0) 1f
        else if ((d + i) % 7 == 0) 0f
        else rnd.nextFloat() - 0.5f
      }
      (i, v.toSeq)
    }
    val got = rows.toDF("vec_id", "embedding")
      .select($"vec_id", Bq.signBitsCol("embedding", 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, v) =>
      assert(got(i) === Bq.signBitsLocal(v.toArray), s"row $i")
    }
    // zeros never set a bit
    val zeroSig = Seq((99L, Seq.fill(64)(0f))).toDF("vec_id", "embedding")
      .select(Bq.signBitsCol("embedding", 64)).head.getLong(0)
    assert(zeroSig === 0L)
    // an over-length array packs ONLY its first dim components — the
    // tail must not wrap mod 64 and collide with low bits
    val long70 = (Seq.fill(64)(-1f) ++ Seq.fill(6)(1f))
    val sig70 = Seq((98L, long70)).toDF("vec_id", "embedding")
      .select(Bq.signBitsCol("embedding", 64)).head.getLong(0)
    assert(sig70 === 0L)
  }

  test("mihTopK: pigeonhole — every vector within Hamming 3 is a candidate") {
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 200L).map(i => (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(7)._2.toArray
    val qs = Bq.signBitsLocal(q)
    val enc = Bq.encode(df, 64)
    for (chunkBits <- Seq(8, 16)) {
      val radius = 64 / chunkBits - 1
      val got = Bq.mihTopK(enc, qs, 200, chunkBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val sigs = vecs.map { case (i, v) => i -> Bq.signBitsLocal(v.toArray) }
      // completeness: within the pigeonhole radius ⇒ candidate, always
      sigs.foreach { case (i, s) =>
        val h = java.lang.Long.bitCount(s ^ qs).toLong
        if (h <= radius) assert(got.get(i).contains(h),
          s"radius-$radius vector $i missed at chunkBits=$chunkBits")
      }
      // soundness: every candidate genuinely shares a substring
      val mask = (1L << chunkBits) - 1L
      got.keys.foreach { i =>
        val s = sigs.toMap.apply(i)
        val shares = (0 until 64 / chunkBits).exists(j =>
          ((s >>> (chunkBits * j)) & mask) === ((qs >>> (chunkBits * j)) & mask))
        assert(shares, s"candidate $i shares no substring at chunkBits=$chunkBits")
      }
      // the self-match is found at distance 0
      assert(got(7L) === 0L)
    }
  }

  test("mihBatchTopK ≡ per-query mihTopK on every query") {
    val rnd = new scala.util.Random(37)
    val vecs = (0L until 180L).map(i => (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val enc = Bq.encode(df, 64)
    val q = Bq.encode(df.filter($"vec_id" < 5), 64)
      .select($"vec_id".as("query_id"), $"sig".as("qsig"))
    val batch = Bq.mihBatchTopK(enc, q, k = 4, chunkBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4)).toSeq
    val single = (0L until 5L).flatMap { qid =>
      val qs = Bq.signBitsLocal(vecs(qid.toInt)._2.toArray)
      Bq.mihTopK(enc, qs, 4, chunkBits = 8).collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getLong(1), i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(batch === single)
  }

  test("signWordsCol ≡ signWordsLocal at dims 65/128/192 incl. every word's sign bit") {
    val rnd = new scala.util.Random(41)
    for (dim <- Seq(65, 128, 192)) {
      val rows = (0L until 48L).map { i =>
        val v = Array.tabulate(dim) { d =>
          // exercise: exact zeros, sign flips, and bit 63 of EVERY word
          if (d % 64 == 63 && (i + d / 64) % 2 == 0) 1f
          else if ((d + i) % 7 == 0) 0f
          else rnd.nextFloat() - 0.5f
        }
        (i, v.toSeq)
      }
      val got = rows.toDF("vec_id", "embedding")
        .select($"vec_id", Bq.signWordsCol($"embedding", dim).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      rows.foreach { case (i, v) =>
        assert(got(i) === Bq.signWordsLocal(v.toArray).toSeq, s"dim=$dim row $i")
        assert(got(i).length === Bq.words(dim))
      }
    }
    // dim=64 through the wide encoder == the single-word fast path
    val v64 = (0L until 16L).map(i =>
      (i, Seq.tabulate(64)(d => (d + i).toFloat % 5 - 2.2f)))
    val both = v64.toDF("vec_id", "embedding")
      .select($"vec_id", Bq.signBitsCol("embedding", 64).as("one"),
        Bq.signWordsCol($"embedding", 64).as("wide"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](2) === Seq(r.getLong(1)))
    }
    // over-length array packs only the first dim components per word
    val long200 = Seq.fill(192)(-1f) ++ Seq.fill(8)(1f)
    val sig192 = Seq((1L, long200)).toDF("vec_id", "embedding")
      .select(Bq.signWordsCol($"embedding", 192)).head.getSeq[Long](0)
    assert(sig192 === Seq(0L, 0L, 0L))
  }

  test("wide Hamming + MIH: parity with driver popcount; pigeonhole at 192 dims") {
    val rnd = new scala.util.Random(43)
    val dim = 192
    val vecs = (0L until 160L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(9)._2.toArray
    val qs = Bq.signWordsLocal(q)
    val enc = Bq.encodeWide(df, dim)
    def hamLocal(s: Array[Long]): Long =
      s.zip(qs).map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
    val sigs = vecs.map { case (i, v) => i -> Bq.signWordsLocal(v.toArray) }
    // hammingTopKWide ≡ driver ranking
    val got = Bq.hammingTopKWide(enc, qs, 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = sigs.map { case (i, s) => (i, hamLocal(s)) }
      .sortBy { case (i, h) => (h, i) }.take(9)
    assert(got === expected)
    // mihTopKWide: completeness to the widened pigeonhole radius
    for (chunkBits <- Seq(8, 16)) {
      val nChunks = qs.length * 64 / chunkBits
      val radius = nChunks - 1
      val cand = Bq.mihTopKWide(enc, qs, 160, chunkBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      sigs.foreach { case (i, s) =>
        val h = hamLocal(s)
        if (h <= radius) assert(cand.get(i).contains(h),
          s"radius-$radius vector $i missed at chunkBits=$chunkBits")
      }
      // soundness: every candidate shares a substring (within one word)
      val mask = (1L << chunkBits) - 1L
      val perWord = 64 / chunkBits
      cand.keys.foreach { i =>
        val s = sigs.toMap.apply(i)
        val shares = (0 until nChunks).exists { j =>
          val w = j / perWord; val off = chunkBits * (j % perWord)
          ((s(w) >>> off) & mask) === ((qs(w) >>> off) & mask)
        }
        assert(shares, s"candidate $i shares no substring at chunkBits=$chunkBits")
      }
      assert(cand(9L) === 0L) // self-match at distance 0
    }
    // rerank: k exact rows from the wide shortlist, self first
    val short = Bq.hammingTopKWide(enc, qs, 20).collect().map(_.getLong(0)).toSet
    val rr = Bq.hammingTopKRerankWide(enc, df, q, r = 20, k = 5).collect()
    assert(rr.length === 5)
    assert(rr.map(_.getLong(0)).forall(short))
    assert(rr.head.getLong(0) === 9L && rr.head.getDouble(1) === 0.0)
  }

  test("signWordsLocal roundtrip property: bit (d%64) of word (d/64) == v(d) > 0, any dim") {
    val rnd = new scala.util.Random(71)
    for (_ <- 0 until 30) {
      val dim = 1 + rnd.nextInt(300)
      val v = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      // sprinkle exact zeros and negative zeros
      v(rnd.nextInt(dim)) = 0f
      if (dim > 1) v(rnd.nextInt(dim)) = -0f
      val sig = Bq.signWordsLocal(v)
      assert(sig.length === Bq.words(dim))
      for (d <- 0 until dim) {
        val bit = (sig(d / 64) >>> (d % 64)) & 1L
        assert((bit == 1L) === (v(d) > 0f), s"dim=$dim d=$d v=${v(d)}")
      }
      // no bits beyond dim
      for (d <- dim until sig.length * 64) {
        assert(((sig(d / 64) >>> (d % 64)) & 1L) === 0L, s"ghost bit $d")
      }
    }
  }

  test("mihBatchTopKWide ≡ per-query mihTopKWide on every query (192 dims)") {
    val rnd = new scala.util.Random(47)
    val dim = 192
    val vecs = (0L until 140L).map(i => (i, Seq.fill(dim)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val enc = Bq.encodeWide(df, dim)
    val q = Bq.encodeWide(df.filter($"vec_id" < 5), dim)
      .select($"vec_id".as("query_id"), $"sig".as("qsig"))
    val batch = Bq.mihBatchTopKWide(enc, q, k = 4, nWords = 3, chunkBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4)).toSeq
    val single = (0L until 5L).flatMap { qid =>
      val qs = Bq.signWordsLocal(vecs(qid.toInt)._2.toArray)
      Bq.mihTopKWide(enc, qs, 4, chunkBits = 8).collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getLong(1), i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(batch === single)
  }

  test("hammingTopK ≡ driver XOR+popcount ranking; rerank ⊆ shortlist, exact") {
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 150L).map(i => (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(5)._2.toArray
    val qs = Bq.signBitsLocal(q)
    val enc = Bq.encode(df, 64)
    val got = Bq.hammingTopK(enc, qs, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = vecs
      .map { case (i, v) =>
        (i, java.lang.Long.bitCount(Bq.signBitsLocal(v.toArray) ^ qs).toLong)
      }
      .sortBy { case (i, h) => (h, i) }.take(7)
    assert(got === expected)
    // rerank returns k exact-distance rows drawn from the r-shortlist
    val short = Bq.hammingTopK(enc, qs, 20).collect().map(_.getLong(0)).toSet
    val rr = Bq.hammingTopKRerank(enc, df, q, r = 20, k = 5).collect()
    assert(rr.length === 5)
    assert(rr.map(_.getLong(0)).forall(short))
    assert(rr.head.getLong(0) === 5L && rr.head.getDouble(1) === 0.0) // self
  }
}
