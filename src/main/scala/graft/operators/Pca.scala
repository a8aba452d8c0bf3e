package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions

/** Top principal direction of an embedding corpus by power iteration —
  * the X·(Xᵀv)-free form: each iteration computes y_r = ⟨x_r, v⟩
  * row-locally, accumulates w = Σ_r y_r·x_r keyed on DIMENSION, and
  * normalizes. (PCA on the uncentered second moment, i.e. the top
  * singular direction; centering is a pre-pass at the caller's option.)
  *
  * Scale shape (the reason this form and not a covariance matrix):
  *  - the d×d covariance is never materialized — per iteration the
  *    corpus is scanned once, emitting (dim, q) terms that partial-
  *    aggregate map-side into d cells; the only shuffle is d-bounded.
  *  - v is d floats — config-bounded, so the per-iteration driver
  *    round-trip (collect d rows, ship back as a literal) is the same
  *    driver-sized class as a query vector or the SQ8 dim table.
  *  - determinism at any parallelism: the ACROSS-ROW float sum is the
  *    one order-dependent reduction, so each term is ×1e4-quantized to
  *    an integer BEFORE the sum (the PageRank/Bm25 move); the norm is
  *    recomposed from an exact Σwq² in DECIMAL(38,0); v re-enters each
  *    iteration rounded to a 6-dp decimal CAST TO FLOAT (the
  *    `ann_refined` stabilization), so the row-local dot reads
  *    identical float bits in engine and oracle.
  */
object Pca {

  /** (dim ∈ 1..d, pc1, lambda): the unit top principal direction after
    * `iters` power iterations from the uniform start v₀ = 1/√d, with
    * the final Rayleigh-style norm as the eigenvalue estimate (constant
    * across rows). Sign follows v₀'s alignment — deterministic. */
  def pc1(vectors: DataFrame, dim: Int, iters: Int = 3,
      embCol: String = "embedding"): DataFrame = {
    require(iters >= 1 && dim >= 1, "need iters >= 1 and dim >= 1")
    var vf: Array[Float] = {
      val v0q = math.round(1e6 / math.sqrt(dim.toDouble))
      Array.fill(dim)((v0q.toDouble / 1e6).toFloat)
    }
    var result: DataFrame = null
    for (t <- 1 to iters) {
      val withY = vectors.select(col(embCol).as("e"),
        VectorFunctions.dot(col(embCol), lit(vf)).as("y"))
      val terms = withY.select(col("y"), posexplode(col("e")))
        .select(col("pos").as("i"),
          round(col("y") * col("col").cast("double") * lit(1e4))
            .cast("long").as("q"))
      val w = terms.groupBy(col("i")).agg(sum(col("q")).as("wq"))
      val normRow = w.agg(sqrt(
          sum(col("wq").cast(DecimalType(38, 0)) * col("wq")).cast("double"))
          .as("s"))
        .select((col("s") / lit(1e4)).as("norm"))
      val vframe = w.crossJoin(broadcast(normRow))
        .select(col("i"),
          round(col("wq") / lit(1e4) / col("norm") * lit(1e6))
            .cast("long").as("vq"),
          col("norm"))
      if (t == iters)
        result = vframe.select(
          (col("i") + 1).cast("int").as("dim"),
          (col("vq").cast("double") / lit(1e6)).as("pc1"),
          (round(col("norm") * lit(1e3)).cast("long").cast("double") / lit(1e3))
            .as("lambda"))
      else
        vf = vframe.select(col("i"), col("vq")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
          .map { case (_, q) => (q.toDouble / 1e6).toFloat }
    }
    result
  }
}
