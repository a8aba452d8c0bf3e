package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Product quantization (PQ) — the memory-compression scale path the
  * reference reaches through FAISS (`faiss::IndexPQ` /
  * `faiss::IndexIVFPQ`; our reference wraps only the flat index,
  * `src/index/vector_shard.cc:41-42`, so PQ is the upgrade a user of it
  * would reach for first). Public design: Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011.
  *
  * The embedding space is split into `m` subspaces of `dim/m`
  * components; each subspace gets its own `ks`-entry codebook, and a
  * vector is stored as its `m` nearest sub-codes — at dim 64/float32
  * that is 256 bytes → 8 bytes per vector (32×), which is the
  * difference between an in-memory scan and a disk-bound one at 100 TB.
  *
  * Spark-first shape, all row-local (ZERO shuffle end to end):
  *  - TRAIN: the codebook is `ks` md5-spread sample rows
  *    ([[Ann.spreadCentroids]] seeding — FAISS likewise trains on a
  *    sample, just non-deterministically), sliced per subspace. Size
  *    m×ks — driver-sized BY CONSTRUCTION, independent of N.
  *  - ENCODE: per-subspace argmin over the literal codebook, evaluated
  *    inside the scan projection (the materialization point: at scale
  *    the codes column is written out and the float vectors archived).
  *  - SEARCH (ADC, asymmetric distance computation): the query is NOT
  *    encoded; a per-query lookup table lut[s][j] = l2sq(q_s, cb[s][j])
  *    is built once (m×ks entries) and a vector's distance is the sum
  *    of its m table hits — the scan touches ONLY the 8-byte codes.
  *    LUT entries are quantized to integers (×1e6, half-up) so the
  *    per-vector sum is exact integer arithmetic: summation-order-free
  *    across engines AND partitions — the same move FAISS's fast-scan
  *    kernels make (8-bit quantized LUTs, André et al., "Cache
  *    locality is not enough", VLDB 2015), taken further for oracle
  *    exactness.
  */
object Pq {

  /** Trained PQ model: `codebooks(s)(j)` = the j-th sub-centroid of
    * subspace s (each of length `subDim`). Driver-sized (m×ks). */
  case class PqModel(m: Int, subDim: Int, ks: Int,
      codebooks: Seq[Seq[Array[Float]]]) {
    def dim: Int = m * subDim
  }

  /** Exact mirror of the [[graft.expressions.L2SquaredDistance]] fold
    * (elements widened to double, (x−y)² accumulated left-to-right) for
    * driver-side LUT construction — bit-identical to what the engine
    * (and the DuckDB oracle's `duckL2sq`) computes on the same floats. */
  private[graft] def l2sqLocal(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, "dimension mismatch")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** Train a PQ model: the `ks` sample rows ranked first by
    * (md5(id), id, embedding) — the [[Ann.spreadCentroids]] seeding, so
    * the oracle reproduces the exact sample in SQL — sliced into `m`
    * sub-vectors each. One TakeOrdered job collects ks rows (constant,
    * never O(N)); the driver re-sorts by the same key so code indices
    * are independent of result-return order. */
  def train(vectors: DataFrame, m: Int, ks: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): PqModel = {
    require(m > 0 && ks > 0, "m and ks must be positive")
    // Trained models are pure functions of (projected input, params) —
    // the session index manager memoizes them the way the reference
    // serves every query from one trained/loaded index rather than
    // retraining per request (vector_shard.cc:34-43). Determinism is
    // the already-gated contract (cpu32-vs-cpu4 bit-identical dumps).
    graft.util.IndexCache.value(vectors.select(col(idCol), col(embCol)),
        Seq("pqTrain", m, ks, idCol, embCol)) {
      trainBody(vectors, m, ks, idCol, embCol)
    }
  }

  private def trainBody(vectors: DataFrame, m: Int, ks: Int,
      idCol: String, embCol: String): PqModel = {
    val sample = vectors
      .orderBy(md5(col(idCol).cast("string")), col(idCol), col(embCol))
      .limit(ks)
      .select(col(idCol).cast("long"), col(embCol))
      .collect()
      .map { r =>
        val emb = r.getSeq[Any](1).map {
          case f: Float => f
          case d: Double => d.toFloat
          case x => x.toString.toFloat
        }.toArray
        (r.getLong(0), emb)
      }
      .sortBy { case (id, emb) => (md5Hex(id.toString), id, emb.toSeq) }(
        Ordering.Tuple3(Ordering.String, Ordering.Long,
          scala.math.Ordering.Implicits.seqOrdering[Seq, Float]))
    require(sample.nonEmpty, "cannot train on an empty corpus")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = (0 until m).map { s =>
      sample.toSeq.map { case (_, emb) =>
        java.util.Arrays.copyOfRange(emb, s * subDim, (s + 1) * subDim)
      }
    }
    PqModel(m, subDim, sample.length, codebooks)
  }

  /** Lloyd-refined PQ training — FAISS `IndexPQ`'s k-means per subspace
    * (Jégou 2011 §IV), under the oracle-stable quantization protocol of
    * [[Ann.refine]]/`ann_refined`: each iteration assigns every vector's
    * subspace slice to its nearest sub-centroid (row-local argmin — the
    * same expression [[encodeCol]] compiles), takes per-(subspace, code,
    * component) means (ONE distributed aggregation whose group count is
    * m×ks×subDim — bounded by the model, never by N), and QUANTIZES each
    * mean to round(·, 6) → float so both engines hand the next iteration
    * bit-identical codebooks (double mean summation-order sensitivity
    * ~1e-13 ≪ the 1e-6 grid). Codes with no assigned vectors keep their
    * previous centroid (the k-means empty-cluster rule both engines
    * replay). Driver traffic per iteration is the m×ks×subDim mean table
    * — model-sized by construction. */
  def trainRefined(vectors: DataFrame, m: Int, ks: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): PqModel = {
    require(iters >= 0, "iters must be >= 0")
    // memoized whole (see train): four suite queries request the
    // identical (corpus, 8, 16, 2) training
    graft.util.IndexCache.value(vectors.select(col(idCol), col(embCol)),
        Seq("pqTrainRefined", m, ks, iters, idCol, embCol)) {
      var model = train(vectors, m, ks, idCol, embCol)
      (1 to iters).foreach { _ => model = refineStep(vectors, model, embCol) }
      model
    }
  }

  /** One Lloyd step over all m subspaces in one aggregation: codes are
    * materialized in their own projection (never inside the generator —
    * the recurring per-output-row re-evaluation trap), components
    * posexploded once, grouped on (subspace, code, component). */
  private def refineStep(vectors: DataFrame, model: PqModel,
      embCol: String): PqModel = {
    val sd = model.subDim
    val comp = vectors
      .select(col(embCol).as("__e"), encodeCol(col(embCol), model).as("__codes"))
      .select(col("__codes"), posexplode(col("__e")).as(Seq("p0", "v")))
    val means = comp
      .select(expr(s"p0 div $sd").cast("int").as("s"),
        element_at(col("__codes"), (expr(s"p0 div $sd") + 1).cast("int")).as("j"),
        expr(s"p0 % $sd").cast("int").as("sp"),
        col("v"))
      .groupBy(col("s"), col("j"), col("sp"))
      .agg(round(avg(col("v").cast("double")), 6).cast("float").as("mq"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getFloat(3))
      .toMap
    val refined = (0 until model.m).map { s =>
      (0 until model.ks).map { j =>
        if (means.contains((s, j, 0)))
          Array.tabulate(sd)(sp => means((s, j, sp)))
        else model.codebooks(s)(j)
      }
    }
    PqModel(model.m, sd, model.ks, refined)
  }

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def unwrap(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def cbSeq(model: PqModel): Seq[Seq[Seq[Float]]] =
    model.codebooks.map(_.map(_.toSeq))

  /** Row-local ×1e6-integer quantization error of a vector against its
    * own nearest sub-codes: Σ_s round(min_j l2sq(slice_s, cb[s][j]) ×
    * 1e6) — the k-means objective as an EXACT integer, so the corpus sum
    * is summation-order-free on both engines. The honesty metric a
    * codebook upgrade must strictly improve (Lloyd steps are
    * non-increasing in exactly this quantity). Backed by the native
    * [[graft.expressions.PqDistortion]] loop kernel — the inline tree
    * (m×ks struct/least nodes compiled per job; measured 2 MiB task
    * binaries and seconds of data-independent driver overhead) stays
    * below as the executable spec PqSpec asserts equality against. */
  def distortionCol(emb: Column, model: PqModel): Column =
    bridge(graft.expressions.PqDistortion(unwrap(emb), cbSeq(model)))

  /** Inline-expression executable spec of [[distortionCol]]. */
  def distortionColInline(emb: Column, model: PqModel): Column =
    (0 until model.m).map { s =>
      val scored = model.codebooks(s).zipWithIndex.map { case (c, j) =>
        struct(l2sq(slice(emb, s * model.subDim + 1, model.subDim), lit(c)).as("dist"),
          lit(j).as("code"))
      }
      val best = if (scored.size == 1) scored.head else least(scored: _*)
      round(best.getField("dist") * lit(1e6)).cast("long")
    }.reduce(_ + _)

  /** Row-local PQ code array: element s = argmin_j of
    * l2sq(slice_s(emb), codebooks(s)(j)), ties to the lower code.
    * Backed by the native [[graft.expressions.PqEncode]] loop kernel
    * (one node, codebook as a referenced float[][][]); the inline
    * struct-`least` tree below is the executable spec. */
  def encodeCol(emb: Column, model: PqModel): Column =
    bridge(graft.expressions.PqEncode(unwrap(emb), cbSeq(model)))

  /** Inline-expression executable spec of [[encodeCol]]: lexicographic
    * struct `least` IS the (distance, code) argmin, the
    * [[Ann.nearestCellInline]] pattern per subspace. m×ks inline struct
    * nodes — bounded by the model, never by the corpus. */
  def encodeColInline(emb: Column, model: PqModel): Column =
    array((0 until model.m).map { s =>
      val scored = model.codebooks(s).zipWithIndex.map { case (c, j) =>
        struct(l2sq(slice(emb, s * model.subDim + 1, model.subDim), lit(c)).as("dist"),
          lit(j).as("code"))
      }
      val best = if (scored.size == 1) scored.head else least(scored: _*)
      best.getField("code")
    }: _*)

  /** Row-local PQ reconstruction from a codes array — FAISS `decode`:
    * the concatenation of each subspace's assigned sub-centroid. The
    * codebook rides as m array literals; two lookups per subspace. */
  def decodeCol(codes: Column, model: PqModel): Column =
    concat((0 until model.m).map { s =>
      element_at(typedlit(model.codebooks(s).map(_.toSeq)),
        (element_at(codes, s + 1) + 1).cast("int"))
    }: _*)

  /** Vectors → (id, codes): the compressed index. At 100 TB this is the
    * table you persist (8 bytes/vector at m=8); the embedding column
    * never needs to be read again on the search path. */
  def encode(vectors: DataFrame, model: PqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), encodeCol(col(embCol), model).as("codes"))

  /** Integer-quantized ADC lookup table for one query:
    * lut(s)(j) = round(l2sq(q_s, cb[s][j]) × 1e6) as Long, half-up on
    * the true decimal value (BigDecimal — `math.round`'s floor(x+0.5)
    * drifts on FP edges; DuckDB's `round` is half-away-from-zero on the
    * same doubles, identical for the non-negative distances here). */
  def lut(model: PqModel, query: Array[Float]): Seq[Seq[Long]] = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    (0 until model.m).map { s =>
      val qs = java.util.Arrays.copyOfRange(query, s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map { c =>
        BigDecimal(l2sqLocal(qs, c) * 1e6)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
  }

  /** Row-local ADC score of a codes array against a query LUT: the sum
    * of m integer table hits — exact, order-free, and reads nothing but
    * the codes. The LUT rides as m tiny array literals. */
  def adcCol(codes: Column, lutQ: Seq[Seq[Long]]): Column =
    (0 until lutQ.size).map { s =>
      element_at(lit(lutQ(s).toArray), element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  /** Engine-side ADC against a query COLUMN (not a driver-built LUT):
    * per subspace, the fold-ordered l2sq from the query's slice to the
    * corpus row's ASSIGNED sub-centroid (two array lookups into the
    * codebook literal), ×1e6 integer-quantized and summed — the batch
    * form of [[adcCol]] for scoring a broadcast query SET in one pass
    * (the `knn_batch` shape: corpus never shuffles, per-query top-k via
    * BottomK map-side heaps). Value-identical to the LUT path on the
    * same (codes, query). Backed by the native
    * [[graft.expressions.PqAdcBatch]] loop kernel; the inline tree below
    * is the executable spec. */
  def adcBatchCol(codes: Column, qvec: Column, model: PqModel): Column =
    bridge(graft.expressions.PqAdcBatch(unwrap(codes), unwrap(qvec), cbSeq(model)))

  /** Inline-expression executable spec of [[adcBatchCol]]. */
  def adcBatchColInline(codes: Column, qvec: Column, model: PqModel): Column =
    (0 until model.m).map { s =>
      val cbLit = typedlit(model.codebooks(s).map(_.toSeq))
      round(l2sq(slice(qvec, s * model.subDim + 1, model.subDim),
        element_at(cbLit, (element_at(codes, s + 1) + 1).cast("int"))) * lit(1e6))
        .cast("long")
    }.reduce(_ + _)

  /** ADC top-k over an encoded corpus: (id, adc) ascending by
    * (adc, id). `orderBy().limit()` plans TakeOrderedAndProject — per-
    * partition k-heaps, tiny driver merge, never a global sort. `adc`
    * is the ×1e6-scaled integer distance (exact); divide by 1e6 for the
    * approximate squared L2. */
  def adcTopK(encoded: DataFrame, model: PqModel, query: Array[Float], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val scored = encoded.select(col(idCol),
      adcCol(col("codes"), lut(model, query)).as("adc"))
    scored.orderBy(col("adc"), col(idCol)).limit(k)
  }

  /** ADC shortlist → exact re-rank: the standard PQ serving pipeline
    * (shortlist `r` by compressed codes, then true distances for just
    * those r rows — FAISS's IVFADC + refine). Vectors inside a tight
    * cluster share codes, so pure ADC cannot order WITHIN the cluster;
    * the re-rank finishes the job while still touching only r full
    * vectors. The r-row shortlist carries the broadcast hint — the
    * corpus side of the join never shuffles. */
  def adcTopKRerank(encoded: DataFrame, vectors: DataFrame, model: PqModel,
      query: Array[Float], r: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(r >= k, s"shortlist r=$r must be >= k=$k")
    val shortlist = adcTopK(encoded, model, query, r, idCol).select(col(idCol))
    vectors.join(broadcast(shortlist), idCol)
      .select(col(idCol), l2sq(col(embCol), lit(query)).as("distance"))
      .orderBy(col("distance"), col(idCol)).limit(k)
  }

  /** Vectors → (id, cell, codes): the IVF-PQ index — each vector keyed
    * by its IVF cell AND compressed to PQ codes. Persist partitioned by
    * `cell`: probing prunes partitions (reads nprobe/K of the files)
    * and what it reads is 8-byte codes, not 256-byte floats — the two
    * multiplicative wins of `faiss::IndexIVFPQ`, as storage layout.
    * This RAW-vector form codes the full embedding against a global
    * codebook; [[encodeIvfResidual]] is the residual upgrade. */
  def encodeIvf(vectors: DataFrame, centroids: Seq[(Long, Array[Float])],
      model: PqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), Ann.nearestCell(col(embCol), centroids).as("cell"),
      encodeCol(col(embCol), model).as("codes"))

  /** Row-local residual `emb − centroid(cell)` as ARRAY<FLOAT>: each
    * component is the EXACT double difference of two floats, cast back
    * to float — bit-identical on any engine (and what a residual store
    * persists). The centroid rides as one map literal (driver-sized by
    * definition). */
  def residualCol(emb: Column, cell: Column,
      centroids: Seq[(Long, Array[Float])]): Column = {
    val centMap = typedlit(centroids.map { case (k, v) => k -> v.toSeq }.toMap)
    zip_with(emb, element_at(centMap, cell), (x, y) =>
      (x.cast("double") - y.cast("double")).cast("float"))
  }

  /** (id, cell, resid): every vector's IVF cell and its residual — the
    * frame residual training/encoding run over. Cell assignment and the
    * subtraction are both row-local (zero shuffle). */
  private def residualFrame(vectors: DataFrame,
      centroids: Seq[(Long, Array[Float])],
      idCol: String, embCol: String): DataFrame =
    vectors
      .select(col(idCol), Ann.nearestCell(col(embCol), centroids).as("cell"),
        col(embCol))
      .withColumn("__resid", residualCol(col(embCol), col("cell"), centroids))

  /** Train a (Lloyd-refined) PQ codebook on RESIDUALS — the
    * `faiss::IndexIVFPQ` design (Jégou 2011 §IV-B): residuals of a
    * well-spread corpus concentrate near the origin regardless of which
    * cell they came from, so one m×ks codebook spends its codes on the
    * local displacement, not on re-describing the coarse geometry the
    * cell id already encodes — that is where the recall-per-byte gain
    * comes from at equal code bytes. */
  def trainResidual(vectors: DataFrame, centroids: Seq[(Long, Array[Float])],
      m: Int, ks: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): PqModel =
    trainRefined(
      residualFrame(vectors, centroids, idCol, embCol)
        .select(col(idCol), col("__resid").as(embCol)),
      m, ks, iters, idCol, embCol)

  /** Vectors → (id, cell, codes) with codes over the RESIDUAL (vector −
    * cell centroid) — the `faiss::IndexIVFPQ` index layout. Same
    * storage/pruning wins as [[encodeIvf]]; the codes just carry far
    * more information per byte. */
  def encodeIvfResidual(vectors: DataFrame,
      centroids: Seq[(Long, Array[Float])], model: PqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    residualFrame(vectors, centroids, idCol, embCol)
      .select(col(idCol), col("cell"), encodeCol(col("__resid"), model).as("codes"))

  /** Driver-side float residual of the query against one centroid (the
    * same exact-double-diff → float cast as [[residualCol]]). */
  private def queryResidual(query: Array[Float], cent: Array[Float]): Array[Float] =
    Array.tabulate(query.length)(d => (query(d).toDouble - cent(d).toDouble).toFloat)

  /** Residual IVF-PQ search: rank cells by centroid distance
    * (driver-side over the driver-sized centroid table), then ONE scan
    * of the `nprobe` probed cells' codes with a per-cell ADC: each
    * probed cell gets its own LUT built against the QUERY'S RESIDUAL in
    * that cell (q − centroid(cell)) — the `faiss::IndexIVFPQ` ADC — and
    * the scan picks the branch by the row's cell (a when-chain of
    * nprobe integer sums, still fully codegen'd and row-local). On a
    * cell-partitioned store the isin filter is partition pruning. */
  def ivfAdcTopKResidual(encodedIvf: DataFrame,
      centroids: Seq[(Long, Array[Float])],
      model: PqModel, query: Array[Float], k: Int, nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val byCell = centroids.toMap
    val probed = centroids
      .map { case (cellId, c) => (l2sqLocal(query, c), cellId) }
      .sorted.take(nprobe).map(_._2)
    val luts = probed.map(cid => cid -> lut(model, queryResidual(query, byCell(cid))))
    val adcCase = luts.tail.foldLeft(
      when(col("cell") === lit(luts.head._1), adcCol(col("codes"), luts.head._2))) {
      case (acc, (cid, l)) => acc.when(col("cell") === lit(cid), adcCol(col("codes"), l))
    }
    encodedIvf
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol), adcCase.as("adc"))
      .orderBy(col("adc"), col(idCol)).limit(k)
  }

  /** IVF-PQ search: rank cells by centroid distance (driver-side — the
    * centroid table is driver-sized by definition, and [[l2sqLocal]] is
    * the engine fold), scan the `nprobe` nearest cells' CODES, ADC
    * top-k within them. On a cell-partitioned store the filter is
    * partition pruning. */
  def ivfAdcTopK(encodedIvf: DataFrame, centroids: Seq[(Long, Array[Float])],
      model: PqModel, query: Array[Float], k: Int, nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val probed = centroids
      .map { case (cellId, c) => (l2sqLocal(query, c), cellId) }
      .sorted.take(nprobe).map(_._2)
    val scored = encodedIvf
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol), adcCol(col("codes"), lut(model, query)).as("adc"))
    scored.orderBy(col("adc"), col(idCol)).limit(k)
  }
}
