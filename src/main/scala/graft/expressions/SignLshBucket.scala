package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * Edges: any null element nulls every plane's dot in the fold form, so
  * no bit is set — this kernel returns 0 the same way. An array SHORTER
  * than the plane dimension is bucket 0 here; the fold form's
  * `element_at` tolerates that only under non-ANSI (null → bit unset)
  * and throws under ANSI (the Spark 4 default) — the kernel picks the
  * lenient behavior unconditionally. Both forms are only applied to
  * full-width embedding columns in practice. */
case class SignLshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val dim = if (nPlanes == 0) 0 else planes(0).length
  require(nPlanes > 0 && nPlanes <= 62, s"planes must be in [1, 62], got $nPlanes")
  require(planes.forall(_.length == dim), "ragged hyperplane matrix")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh expects array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() < dim) return 0L // OOB element_at parity
    var d = 0
    while (d < dim) { // a null element poisons every plane's dot
      if (x.isNullAt(d)) return 0L
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      val w = planes(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { // same left-fold order as the spec
        acc += w(i) * x.getFloat(i).toDouble
        i += 1
      }
      if (acc >= 0) out |= 1L << p
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val w = ctx.freshName("w"); val ok = ctx.freshName("ok")
      s"""
         |long $out = 0L;
         |boolean $ok = $x.numElements() >= $dim;
         |for (int $d = 0; $ok && $d < $dim; $d++) {
         |  if ($x.isNullAt($d)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    final double[] $w = $mat[$p];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $w[$i] * (double) $x.getFloat($i);
         |    }
         |    if ($acc >= 0) $out |= 1L << $p;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}
