package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Binary (1-bit / sign) quantization — the third point on the
  * compression curve next to [[Sq]] (4×) and [[Pq]] (32×): one bit per
  * dimension, 32× smaller than float32 and the CHEAPEST distance of
  * all — Hamming via XOR + popcount, two machine ops per 64 dims.
  * Public design: Charikar's sign random projections (STOC 2002) are
  * its LSH pedigree; as a storage format it is today's "binary
  * embedding" practice (sign-bit Matryoshka/embedding truncation serves
  * shortlists from 1-bit codes and re-ranks few candidates with full
  * floats). Reference context: the reference scans full float32 via
  * `faiss::IndexFlatL2` (`src/index/vector_shard.cc:41-42`); FAISS's
  * own `IndexBinaryFlat` is this exact upgrade.
  *
  * Spark-first shape, all row-local:
  *  - ENCODE: bit d = (emb[d] > 0), packed into ONE BIGINT per vector
  *    for dim ≤ 64 (wider vectors take ⌈dim/64⌉ words; the testdata is
  *    dim 64 so one word covers it). Evaluated inside the scan
  *    projection via transform/aggregate HOFs — powers of two are
  *    disjoint, so the fold's `+` IS bitwise OR and the result is
  *    summation-order-free. NO training step and NO model state at all
  *    — the one quantizer that needs no codebook.
  *  - SEARCH: Hamming distance `bit_count(sig XOR qsig)` — exact
  *    integer arithmetic on both engines, ties to the lower id;
  *    `orderBy().limit(k)` plans TakeOrderedAndProject (per-partition
  *    heaps, no global sort). The scan touches 8 bytes per vector.
  *  - RERANK: Hamming shortlist of r, exact float L2 on just those r
  *    rows (broadcast shortlist join — the [[Pq.adcTopKRerank]] /
  *    [[Sq]] serving shape).
  */
object Bq {

  /** Number of 64-bit words a dim-wide signature packs into. */
  def words(dim: Int): Int = (dim + 63) / 64

  /** One packed word from an already-sliced (≤ 64-element) float array:
    * bit i set iff x(i) > 0. Powers of two are disjoint, so the fold's
    * `+` IS bitwise OR — summation-order-free. Built with the Column
    * DSL (no SQL-string splicing — ADVICE r9: an expr-interpolated
    * column name broke on names needing backticks). */
  private def packWord(sliced: Column): Column =
    aggregate(
      transform(sliced, (x, i) =>
        when(x > lit(0f), call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)

  /** Row-local packed sign signature: bit d set iff emb[d] > 0
    * (strictly — zeros code to 0 on both engines). dim ≤ 64 → one
    * 64-bit word; bit 63 wraps to the sign bit of the long, which XOR +
    * popcount treat as just another bit. Packs exactly the FIRST `dim`
    * components via an explicit slice — without it, an over-length
    * array would shift past 63 and silently collide bits (Spark masks
    * the shift amount mod 64) instead of erroring. Wider vectors:
    * [[signWordsCol]]. */
  def signBitsCol(embCol: String, dim: Int): Column = {
    require(dim >= 1 && dim <= 64,
      s"dim $dim not in 1..64 — wider vectors use signWordsCol")
    packWord(slice(col(embCol), 1, dim))
  }

  /** Multi-word sign signature for ANY dim: ARRAY<BIGINT> of ⌈dim/64⌉
    * words, word w packing dims [64w, 64w+63] with the identical
    * per-word bit rule as [[signBitsCol]] (bit 63 of EVERY word is that
    * word's long sign bit). The reference's own sample cluster is
    * 768-dim (`config/node1.textproto:13`) — 12 words — which the
    * single-word fast path rejects; this is the general encoder.
    * Row-local, summation-order-free per word. */
  def signWordsCol(embCol: Column, dim: Int): Column = {
    require(dim >= 1, s"dim $dim must be positive")
    val n = words(dim)
    transform(sequence(lit(0), lit(n - 1)), w =>
      packWord(slice(embCol, w * lit(64) + lit(1),
        least(lit(64), lit(dim) - w * lit(64)))))
  }

  /** Driver-side mirror of [[signWordsCol]] for encoding the query. */
  def signWordsLocal(v: Array[Float]): Array[Long] = {
    require(v.length >= 1, "empty vector")
    val out = new Array[Long](words(v.length))
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i / 64) |= (1L << (i % 64))
      i += 1
    }
    out
  }

  /** Driver-side mirror of [[signBitsCol]] for encoding the query. */
  def signBitsLocal(v: Array[Float]): Long = {
    require(v.length >= 1 && v.length <= 64, s"dim ${v.length} not in 1..64")
    var sig = 0L
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Vectors → (id, sig): the 8-bytes-per-vector binary index. At
    * 100 TB this is the table you persist — a 4 TB scan instead of a
    * 100 TB one, with the float vectors archived for rerank-only
    * access. */
  def encode(vectors: DataFrame, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), signBitsCol(embCol, dim).as("sig"))

  /** Vectors → (id, sig ARRAY<BIGINT>): the wide-dim binary index —
    * ⌈dim/64⌉ × 8 bytes per vector (768-dim → 96 bytes, still 32×
    * under float32). */
  def encodeWide(vectors: DataFrame, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), signWordsCol(col(embCol), dim).as("sig"))

  /** Row-local Hamming distance to a driver-encoded query signature. */
  def hammingCol(sig: Column, querySig: Long): Column =
    bit_count(sig.bitwiseXOR(lit(querySig))).cast("long")

  /** Multi-word Hamming: Σ over words of popcount(XOR) — exact integer
    * arithmetic, order-free (each term is an independent non-negative
    * int), so both engines agree for any word count. */
  def hammingWordsCol(sig: Column, querySig: Array[Long]): Column =
    aggregate(
      zip_with(sig, lit(querySig), (a, b) =>
        bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Wide-signature Hamming top-k: ascending (hamming, id). The scan
    * touches ⌈dim/64⌉ longs per vector; TakeOrderedAndProject heaps as
    * in [[hammingTopK]]. */
  def hammingTopKWide(encoded: DataFrame, querySig: Array[Long], k: Int,
      idCol: String = "vec_id"): DataFrame =
    encoded
      .select(col(idCol), hammingWordsCol(col("sig"), querySig).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(k)

  /** Hamming top-k over an encoded corpus: (id, hamming) ascending by
    * (hamming, id). */
  def hammingTopK(encoded: DataFrame, querySig: Long, k: Int,
      idCol: String = "vec_id"): DataFrame =
    encoded.select(col(idCol), hammingCol(col("sig"), querySig).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(k)

  /** Multi-index Hamming probe (Norouzi/Punjani/Fleet, "Fast Search in
    * Hamming Space with Multi-Index Hashing", CVPR 2012): the 64-bit
    * signature splits into `64/chunkBits` disjoint substrings; a vector
    * is a CANDIDATE iff at least one substring equals the query's. By
    * pigeonhole, every vector within Hamming distance `64/chunkBits − 1`
    * shares an untouched substring — full recall to that radius BY
    * CONSTRUCTION — and only candidates ever get a full Hamming
    * evaluation. This is the scan-free scale path: [[hammingTopK]]
    * still reads every signature (8 bytes × N — fine per-node, still
    * O(N) at 100 TB), while a store partitioned by (substring j, value)
    * turns each probe into a point lookup; here the equality filters
    * push into the scan. The same pigeonhole move as Dedup's 7×8-bit
    * SimHash bands, at serving granularity. `chunkBits` is the
    * selectivity knob MIH tunes to corpus density (Norouzi §3: chunks
    * ≈ 64/log₂N): narrower substrings → more probes, wider guaranteed
    * radius, denser candidates.
    *
    * Chunk extraction is fill-insensitive: `(sig >> b·j) & mask` reads
    * the substring identically under arithmetic or logical shift, so
    * both engines agree even on negative (bit-63-set) sigs. Duplicate
    * candidate rows from multiple matching substrings collapse by id
    * (max(sig) — ids are unique per the store contract, max just keeps
    * the collapse deterministic). */
  def mihTopK(encoded: DataFrame, querySig: Long, k: Int,
      chunkBits: Int = 8, idCol: String = "vec_id"): DataFrame = {
    require(chunkBits >= 1 && chunkBits <= 32 && 64 % chunkBits == 0,
      s"chunkBits $chunkBits must divide 64 and be <= 32")
    val mask = (1L << chunkBits) - 1L
    // ONE scan with the substring disjunction in the row filter — on
    // the one-row-per-vector encoded frame this strictly beats a
    // union of per-substring passes (8 scans + a dedup aggregate, the
    // first-cut plan); the union-of-probes shape belongs to a
    // (substring, value)-REPLICATED index table, which is what
    // [[mihBatchTopK]]'s exploded join builds on the fly.
    val anyChunk = (0 until 64 / chunkBits).map { j =>
      val qChunk = (querySig >>> (chunkBits * j)) & mask
      shiftright(col("sig"), chunkBits * j).bitwiseAND(lit(mask)) === lit(qChunk)
    }.reduce(_ || _)
    encoded.filter(anyChunk)
      .select(col(idCol), hammingCol(col("sig"), querySig).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(k)
  }

  /** Multi-index Hamming probing over WIDE (multi-word) signatures.
    * Substring j of `chunkBits` bits lives entirely inside word
    * ⌊j·chunkBits/64⌋ (chunkBits divides 64, so chunks never straddle a
    * word boundary); total substrings = words·64/chunkBits, pigeonhole
    * radius = substrings − 1 — WIDER guaranteed radius than the
    * single-word index at the same chunkBits, because more disjoint
    * substrings must all be hit before a near neighbor can hide. Same
    * single-scan disjunction shape as [[mihTopK]]; per-chunk extraction
    * `(word >> off) & mask` is shift-fill-insensitive. */
  def mihTopKWide(encoded: DataFrame, querySig: Array[Long], k: Int,
      chunkBits: Int = 8, idCol: String = "vec_id"): DataFrame = {
    require(chunkBits >= 1 && chunkBits <= 32 && 64 % chunkBits == 0,
      s"chunkBits $chunkBits must divide 64 and be <= 32")
    val mask = (1L << chunkBits) - 1L
    val perWord = 64 / chunkBits
    val anyChunk = (0 until querySig.length * perWord).map { j =>
      val w = j / perWord
      val off = chunkBits * (j % perWord)
      val qChunk = (querySig(w) >>> off) & mask
      shiftright(element_at(col("sig"), w + 1), off)
        .bitwiseAND(lit(mask)) === lit(qChunk)
    }.reduce(_ || _)
    encoded.filter(anyChunk)
      .select(col(idCol), hammingWordsCol(col("sig"), querySig).as("hamming"))
      .orderBy(col("hamming"), col(idCol)).limit(k)
  }

  /** Batch multi-index Hamming: one pass for a query SET. The per-query
    * filter chain of [[mihTopK]] is the single-query form; for a batch,
    * the substring match becomes an EQUI-JOIN — corpus substrings
    * (id, j, chunk) against broadcast query substrings (qid, j, chunk)
    * — so candidates for EVERY query come out of one join of the
    * encoded store (the `knn_batch` shape: the corpus never shuffles,
    * per-query top-k via the BottomK map-side heap). On a store
    * bucketed by (j, chunk) the join is also co-located. Candidate
    * (qid, id) duplicates from multiple matching substrings collapse
    * before scoring. */
  def mihBatchTopK(encoded: DataFrame, queries: DataFrame, k: Int,
      chunkBits: Int = 8, idCol: String = "vec_id",
      queryIdCol: String = "query_id", querySigCol: String = "qsig"): DataFrame = {
    require(chunkBits >= 1 && chunkBits <= 32 && 64 % chunkBits == 0,
      s"chunkBits $chunkBits must divide 64 and be <= 32")
    require(k > 0, "k must be positive")
    val mask = (1L << chunkBits) - 1L
    def chunksOf(sig: org.apache.spark.sql.Column) =
      array((0 until 64 / chunkBits).map(j =>
        struct(lit(j).as("j"),
          shiftright(sig, chunkBits * j).bitwiseAND(lit(mask)).as("chunk"))): _*)
    val idx = encoded
      .select(col(idCol), col("sig"), explode(chunksOf(col("sig"))).as("c"))
      .select(col(idCol), col("sig"), col("c.j").as("j"), col("c.chunk").as("chunk"))
    val probes = queries
      .select(col(queryIdCol), col(querySigCol),
        explode(chunksOf(col(querySigCol))).as("c"))
      .select(col(queryIdCol), col(querySigCol),
        col("c.j").as("j"), col("c.chunk").as("chunk"))
    val cand = idx.join(broadcast(probes), Seq("j", "chunk"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(max(col("sig")).as("sig"), max(col(querySigCol)).as("qs"))
    cand
      .select(col(queryIdCol), col(idCol),
        bit_count(col("sig").bitwiseXOR(col("qs"))).cast("long").as("hamming"))
      .groupBy(col(queryIdCol))
      .agg(graft.expressions.BottomK.bottomK(
        col("hamming").cast("double"), col(idCol).cast("long"), k).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol),
        col("col.id").as(idCol),
        col("col.distance").cast("long").as("hamming"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Batch MIH over WIDE signatures: the [[mihBatchTopK]] equi-join
    * shape at any dim — corpus substrings (id, j, chunk) sliced across
    * words against broadcast query substrings, candidates collapsed
    * per (query, id), wide Hamming scored via [[hammingWordsCol]]'s
    * per-word popcount sum, per-query top-k through BottomK map-side
    * heaps. The corpus never shuffles. */
  def mihBatchTopKWide(encoded: DataFrame, queries: DataFrame, k: Int,
      nWords: Int, chunkBits: Int = 8, idCol: String = "vec_id",
      queryIdCol: String = "query_id", querySigCol: String = "qsig"): DataFrame = {
    require(chunkBits >= 1 && chunkBits <= 32 && 64 % chunkBits == 0,
      s"chunkBits $chunkBits must divide 64 and be <= 32")
    require(k > 0 && nWords >= 1, "k and nWords must be positive")
    val mask = (1L << chunkBits) - 1L
    val perWord = 64 / chunkBits
    def chunksOf(sig: Column) =
      array((0 until nWords * perWord).map { j =>
        val w = j / perWord; val off = chunkBits * (j % perWord)
        struct(lit(j).as("j"),
          shiftright(element_at(sig, w + 1), off)
            .bitwiseAND(lit(mask)).as("chunk"))
      }: _*)
    val idx = encoded
      .select(col(idCol), col("sig"), explode(chunksOf(col("sig"))).as("c"))
      .select(col(idCol), col("sig"), col("c.j").as("j"), col("c.chunk").as("chunk"))
    val probes = queries
      .select(col(queryIdCol), col(querySigCol),
        explode(chunksOf(col(querySigCol))).as("c"))
      .select(col(queryIdCol), col(querySigCol),
        col("c.j").as("j"), col("c.chunk").as("chunk"))
    val cand = idx.join(broadcast(probes), Seq("j", "chunk"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(first(col("sig")).as("sig"), first(col(querySigCol)).as("qs"))
    cand
      .select(col(queryIdCol), col(idCol),
        aggregate(
          zip_with(col("sig"), col("qs"), (a, b) =>
            bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hamming"))
      .groupBy(col(queryIdCol))
      .agg(graft.expressions.BottomK.bottomK(
        col("hamming").cast("double"), col(idCol).cast("long"), k).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol),
        col("col.id").as(idCol),
        col("col.distance").cast("long").as("hamming"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Hamming shortlist → exact re-rank: shortlist `r` by the 8-byte
    * signatures, true float distances for just those r rows. The r-row
    * shortlist broadcasts; the vectors table never shuffles. */
  def hammingTopKRerank(encoded: DataFrame, vectors: DataFrame,
      query: Array[Float], r: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(r >= k, s"shortlist r=$r must be >= k=$k")
    val shortlist = hammingTopK(encoded, signBitsLocal(query), r, idCol)
      .select(col(idCol))
    vectors.join(broadcast(shortlist), idCol)
      .select(col(idCol), l2sq(col(embCol), lit(query)).as("distance"))
      .orderBy(col("distance"), col(idCol)).limit(k)
  }

  /** Wide-signature shortlist → exact re-rank (the [[hammingTopKRerank]]
    * serving shape at any dim): shortlist r on the packed words, float
    * L2 on just those r rows via a broadcast join. */
  def hammingTopKRerankWide(encoded: DataFrame, vectors: DataFrame,
      query: Array[Float], r: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(r >= k, s"shortlist r=$r must be >= k=$k")
    val shortlist = hammingTopKWide(encoded, signWordsLocal(query), r, idCol)
      .select(col(idCol))
    vectors.join(broadcast(shortlist), idCol)
      .select(col(idCol), l2sq(col(embCol), lit(query)).as("distance"))
      .orderBy(col("distance"), col(idCol)).limit(k)
  }
}
