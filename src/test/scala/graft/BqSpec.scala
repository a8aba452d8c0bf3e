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
