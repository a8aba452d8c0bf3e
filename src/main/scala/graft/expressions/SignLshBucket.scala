package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-LSH bucket of an ARRAY<FLOAT> embedding against a plan-time
  * hyperplane matrix, in ONE pass: bit p of the result is set iff
  * dot(planes(p), x) ≥ 0 — exactly `Ann.lshBucketFold`, which stays as
  * the executable spec (equality asserted in AnnSpec).
  *
  * Why native: the fold form expands to planes × dim literal expression
  * nodes (1,024 at the test 16×64; 8,192 at a production 128-plane
  * sketch) — plan size, codegen constant pool, and per-task plan
  * serialization all scale with the matrix. This kernel is two nested
  * loops over a single referenced `double[][]`, inside whole-stage
  * codegen, with the same left-fold double accumulation per plane so
  * buckets are bit-identical to the spec (and to the DuckDB oracle that
  * replays the fold).
  *
  * Edges (each mirrors the fold spec — ADVICE r6):
  *  - a NULL array is bucket 0, never NULL: the fold's per-plane
  *    `when(null ≥ 0, bit).otherwise(0)` contributes 0 for every plane,
  *    so this expression is non-nullable and evals 0L on null input;
  *  - any null ELEMENT nulls every plane's dot in the fold form, so no
  *    bit is set — this kernel returns 0 the same way;
  *  - a NaN dot sets the bit: Spark SQL ordering places NaN above every
  *    number, so the fold's `dotP >= 0` is TRUE for NaN — the kernel
  *    tests `!(acc < 0)` (Java `NaN < 0` is false) for the same bit;
  *  - an array SHORTER than the plane dimension is bucket 0 here; the
  *    fold form's `element_at` tolerates that only under non-ANSI
  *    (null → bit unset) and throws under ANSI (the Spark 4 default) —
  *    the kernel picks the lenient behavior unconditionally. Both forms
  *    are only applied to full-width embedding columns in practice.
  *
  * Planes are held as `Seq[Seq[Double]]` so structurally identical
  * kernels compare equal (case-class equality on arrays is by
  * reference) — Catalyst canonicalization and common-subexpression
  * elimination then deduplicate repeated lshBucket columns instead of
  * recomputing them. */
case class SignLshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val dim = if (nPlanes == 0) 0 else planes.head.size
  require(nPlanes > 0 && nPlanes <= 62, s"planes must be in [1, 62], got $nPlanes")
  require(planes.forall(_.size == dim), "ragged hyperplane matrix")

  // the hot-loop form of the matrix, shipped once per task as a
  // referenced object (never serialized into equality/canonicalization)
  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = false // null array → 0L (fold parity)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh expects array<float>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L // fold-spec parity: every plane's bit is 0
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() < dim) return 0L // OOB element_at parity
    var d = 0
    while (d < dim) { // a null element poisons every plane's dot
      if (x.isNullAt(d)) return 0L
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      val w = mat(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { // same left-fold order as the spec
        acc += w(i) * x.getFloat(i).toDouble
        i += 1
      }
      if (!(acc < 0)) out |= 1L << p // NaN ⇒ bit set, like Spark's >=
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planes", mat, "double[][]")
    val childGen = child.genCode(ctx)
    val p = ctx.freshName("p"); val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
    val w = ctx.freshName("w"); val ok = ctx.freshName("ok")
    val resultCode =
      code"""
        |${childGen.code}
        |long $out = 0L;
        |if (!${childGen.isNull}) {
        |  boolean $ok = ${childGen.value}.numElements() >= $dim;
        |  for (int $d = 0; $ok && $d < $dim; $d++) {
        |    if (${childGen.value}.isNullAt($d)) $ok = false;
        |  }
        |  if ($ok) {
        |    for (int $p = 0; $p < $nPlanes; $p++) {
        |      final double[] $w = $matRef[$p];
        |      double $acc = 0.0;
        |      for (int $i = 0; $i < $dim; $i++) {
        |        $acc += $w[$i] * (double) ${childGen.value}.getFloat($i);
        |      }
        |      if (!($acc < 0)) $out |= 1L << $p;
        |    }
        |  }
        |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral,
      value = JavaCode.variable(out, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}
