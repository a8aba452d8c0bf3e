package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Scalar quantization (SQ8) — the OTHER compression path FAISS offers
  * next to PQ (`faiss::IndexScalarQuantizer`, QT_8bit): each dimension
  * is independently affine-mapped to an 8-bit code against per-dimension
  * [min, max] bounds learned from the corpus. 4× smaller than float32
  * with near-exact ranking — the standard first step before PQ's 32×.
  * Reference context: the reference wraps only the flat FAISS index
  * (`src/index/vector_shard.cc:41-42`); SQ8 is the drop-in upgrade that
  * keeps its exact-scan shape while quartering the bytes scanned.
  *
  * Spark-first shape:
  *  - TRAIN: per-dimension min/max — ONE aggregation whose key space is
  *    the dimension count (64–4096), with map-side partial min/max, so
  *    the shuffle is 32 partitions × dim rows regardless of N; the
  *    collect is dim rows (bounded by the model, never by the corpus).
  *  - ENCODE: row-local `transform` against two dim-length array
  *    literals — evaluated in the scan projection, no shuffle.
  *  - SEARCH: the query is encoded with the same formula driver-side;
  *    the distance is Σ_d (code_d − qcode_d)² — EXACT integer
  *    arithmetic (≤ 255²·dim ≈ 4.2e6 at dim 64), summation-order-free
  *    across engines and partitions, like [[Pq]]'s integer-quantized
  *    LUT. top-k plans TakeOrderedAndProject (per-partition heaps).
  *
  * Determinism: the code formula is pure elementwise IEEE-double
  * arithmetic on exactly-promoted float inputs — `floor(x + 0.5)` with
  * identical operation order in the engine, the driver-side query
  * encode, and the DuckDB oracle, so all three produce identical codes
  * bit-for-bit (no summation anywhere before the integer stage).
  */
object Sq {

  /** Per-dimension quantization bounds, as trained (floats — the exact
    * column values; promotion to double in the code formula is exact). */
  case class SqModel(mins: Array[Float], maxs: Array[Float]) {
    def dim: Int = mins.length
  }

  /** Per-dimension [min, max] over the corpus. One partial-aggregated
    * shuffle keyed on the dimension index; collects `dim` rows. */
  def train(vectors: DataFrame, embCol: String = "embedding"): SqModel = {
    val mm = vectors
      .select(posexplode(col(embCol)).as(Seq("d", "v")))
      .groupBy("d")
      .agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("d")
      .collect()
    SqModel(
      mm.map(_.getAs[Float]("mn")),
      mm.map(_.getAs[Float]("mx")))
  }

  /** The shared affine code formula (documented so the three replicas —
    * engine column, driver encode, DuckDB oracle — stay in sync):
    * `clamp_{0..255}(floor((v − mn) · 255 / (mx − mn) + 0.5))`, with a
    * degenerate `mx == mn` dimension coding to 0. */
  private def codeFormula(v: Double, mn: Double, mx: Double): Int =
    if (mx == mn) 0
    else math.min(255, math.max(0,
      math.floor((v - mn) * 255.0 / (mx - mn) + 0.5).toInt))

  /** Row-local SQ8 code array for an embedding column. The model rides
    * as two dim-length literal arrays; everything stays inside the scan
    * projection (whole-stage codegen'd `transform`). */
  def encodeCol(emb: Column, model: SqModel): Column = {
    val mins = lit(model.mins.map(_.toDouble))
    val maxs = lit(model.maxs.map(_.toDouble))
    transform(emb, (v, i) => {
      val mn = element_at(mins, (i + 1).cast("int"))
      val mx = element_at(maxs, (i + 1).cast("int"))
      when(mx === mn, lit(0)).otherwise(
        least(lit(255), greatest(lit(0),
          floor((v.cast("double") - mn) * lit(255.0) / (mx - mn) + lit(0.5))
            .cast("int"))))
    })
  }

  /** Vectors → (id, codes): the 1-byte-per-dimension index. At scale
    * this is the persisted table; the float vectors are archival. */
  def encode(vectors: DataFrame, model: SqModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), encodeCol(col(embCol), model).as("codes"))

  /** Driver-side encode of one query vector — same formula, same IEEE
    * operation order as [[encodeCol]]. */
  def encodeLocal(model: SqModel, query: Array[Float]): Array[Int] = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    Array.tabulate(query.length) { d =>
      codeFormula(query(d).toDouble, model.mins(d).toDouble, model.maxs(d).toDouble)
    }
  }

  /** Row-local integer SQ distance of a codes column against a query
    * code array: Σ_d (c_d − q_d)², accumulated as long — exact. */
  def sqDistCol(codes: Column, qcodes: Array[Int]): Column =
    aggregate(
      zip_with(codes, lit(qcodes), (a, b) => (a - b).cast("long") * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** SQ top-k: (id, dq) ascending by (dq, id); `dq` is the exact
    * integer quantized squared distance. Plans TakeOrderedAndProject
    * over the codes scan — nothing but 1-byte codes is read. */
  def sqTopK(encoded: DataFrame, model: SqModel, query: Array[Float], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val scored = encoded.select(col(idCol),
      sqDistCol(col("codes"), encodeLocal(model, query)).as("dq"))
    scored.orderBy(col("dq"), col(idCol)).limit(k)
  }

  /** Two-stage serving: SQ shortlist of `r` by integer distance, exact
    * L2 re-rank of just those rows to the final k — the [[Pq
    * .adcTopKRerank]] shape with a 4×-compressed first stage. The
    * shortlist join is broadcast-sized (r rows) so the vector table is
    * touched once, filtered by a broadcast semi-join — no shuffle. */
  def sqTopKRerank(encoded: DataFrame, vectors: DataFrame, model: SqModel,
      query: Array[Float], r: Int, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val shortlist = sqTopK(encoded, model, query, r, idCol).select(col(idCol))
    vectors
      .join(broadcast(shortlist), idCol)
      .select(col(idCol), l2sq(col(embCol), lit(query)).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
