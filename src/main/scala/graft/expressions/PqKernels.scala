package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native product-quantization kernels — the loop forms of the inline
  * `Pq.encodeColInline` / `distortionColInline` / `adcBatchColInline`
  * expression trees (which stay as the executable specs, equality
  * asserted in PqSpec).
  *
  * Why native (the [[SignLshBucket]] rationale at larger magnitude): the
  * inline argmin per subspace is a `least` over ks (distance, code)
  * structs, each distance an l2sq over a slice — m×ks struct/least/l2sq
  * nodes per column (128 at the test m=8 × ks=16; thousands at a
  * production m=16 × ks=256). Lloyd training, encoding, distortion and
  * batch-ADC all compile that tree per JOB, so plan analysis, codegen,
  * and per-task plan serialization (measured: 2.1 MiB task binaries,
  * ~8 s of fixed driver overhead per PQ query at sf0.01 — data-
  * independent, i.e. pure overhead at 100 TB too) scale with the model.
  * Each kernel here is one expression node holding the codebook as a
  * referenced `float[][][]`: nested primitive loops inside whole-stage
  * codegen, plans back to bytes.
  *
  * Value parity with the inline specs, exactly:
  *  - per-subspace distance: elements widened to double, (x−y)²
  *    accumulated left-to-right over the slice — the
  *    [[L2SquaredDistance]] fold both engines replay;
  *  - argmin tie → LOWER code: ascending-j scan keeping strictly
  *    smaller distances IS the lexicographic (distance, code) `least`;
  *  - quantization: round(d × 1e6) exactly as Spark's `round` on
  *    DoubleType (scala BigDecimal HALF_UP on the decimal string
  *    value), then the integral double cast to long.
  *
  * Codebooks are held as `Seq[Seq[Seq[Float]]]` so structurally
  * identical kernels compare equal (array case-class equality is by
  * reference) and Catalyst CSE/canonicalization deduplicate repeated
  * columns — the [[SignLshBucket]] convention.
  *
  * Edges: these kernels return NULL on a null input, a null element, or
  * a length mismatch against m×subDim. The inline specs are only ever
  * applied to full-width non-null embedding columns (where the forms
  * agree); on the never-exercised malformed inputs the inline trees
  * degrade into struct-with-null-field comparisons instead.
  */
object PqKernels {

  /** Spark `round(x × 1e6) cast long` on a non-negative finite double —
    * scala BigDecimal(double) carries the decimal string value, HALF_UP,
    * back through an integral double (the exact RoundBase path), then
    * the double→long cast. Shared by interpreted eval and codegen. */
  def roundQ(d: Double): Long = {
    val x = d * 1e6
    if (x.isNaN || x.isInfinite) x.toLong
    else scala.math.BigDecimal(x)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble.toLong
  }

  /** Left-fold squared L2 between `x[off .. off+len)` and `c[0 .. len)`. */
  def sliceL2sq(x: ArrayData, off: Int, c: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      val d = x.getFloat(off + i).toDouble - c(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  private[expressions] def toMat(cb: Seq[Seq[Seq[Float]]]): Array[Array[Array[Float]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  private[expressions] def checkEmb(dt: DataType, what: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$what expects array<float>, got ${other.catalogString}")
    }
}

/** PQ code array of an embedding: element s = argmin_j over the
  * referenced codebook's subspace s (ties → lower j). One node in place
  * of m×ks struct-least trees; see [[PqKernels]]. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val ks = if (m == 0) 0 else codebooks.head.length
  private val subDim = if (ks == 0) 0 else codebooks.head.head.length
  require(m > 0 && ks > 0 && subDim > 0, "empty codebook")
  require(codebooks.forall(s => s.length == ks && s.forall(_.length == subDim)),
    "ragged codebook")

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    PqKernels.toMat(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null/malformed input → null
  override def checkInputDataTypes(): TypeCheckResult =
    PqKernels.checkEmb(child.dataType, "pq_encode")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < ks) {
        val d = PqKernels.sliceL2sq(x, s * subDim, cb(s)(j))
        if (d < bestD) { bestD = d; bestJ = j } // tie keeps lower j
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val bestD = ctx.freshName("bestD"); val bestJ = ctx.freshName("bestJ")
      val codes = ctx.freshName("codes"); val c = ctx.freshName("c")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; !${ev.isNull} && $i < ${m * subDim}; $i++) {
         |    if ($x.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    final int[] $codes = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      double $bestD = Double.POSITIVE_INFINITY;
         |      int $bestJ = 0;
         |      for (int $j = 0; $j < $ks; $j++) {
         |        final float[] $c = $cbRef[$s][$j];
         |        double $acc = 0.0;
         |        for (int $k = 0; $k < $subDim; $k++) {
         |          final double $d =
         |            (double) $x.getFloat($s * $subDim + $k) - (double) $c[$k];
         |          $acc += $d * $d;
         |        }
         |        if ($acc < $bestD) { $bestD = $acc; $bestJ = $j; }
         |      }
         |      $codes[$s] = $bestJ;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |      .UnsafeArrayData.fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ×1e6-integer PQ quantization error of an embedding against its own
  * nearest sub-codes: Σ_s round(min_j l2sq(slice_s, cb[s][j]) × 1e6) —
  * the k-means objective as an exact long. Loop form of the inline
  * distortion tree; see [[PqKernels]]. */
case class PqDistortion(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val ks = if (m == 0) 0 else codebooks.head.length
  private val subDim = if (ks == 0) 0 else codebooks.head.head.length
  require(m > 0 && ks > 0 && subDim > 0, "empty codebook")
  require(codebooks.forall(s => s.length == ks && s.forall(_.length == subDim)),
    "ragged codebook")

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    PqKernels.toMat(codebooks)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    PqKernels.checkEmb(child.dataType, "pq_distortion")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var total = 0L
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ks) {
        val d = PqKernels.sliceL2sq(x, s * subDim, cb(s)(j))
        if (d < bestD) bestD = d
        j += 1
      }
      total += PqKernels.roundQ(bestD)
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val bestD = ctx.freshName("bestD"); val total = ctx.freshName("total")
      val c = ctx.freshName("c")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; !${ev.isNull} && $i < ${m * subDim}; $i++) {
         |    if ($x.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    long $total = 0L;
         |    for (int $s = 0; $s < $m; $s++) {
         |      double $bestD = Double.POSITIVE_INFINITY;
         |      for (int $j = 0; $j < $ks; $j++) {
         |        final float[] $c = $cbRef[$s][$j];
         |        double $acc = 0.0;
         |        for (int $k = 0; $k < $subDim; $k++) {
         |          final double $d =
         |            (double) $x.getFloat($s * $subDim + $k) - (double) $c[$k];
         |          $acc += $d * $d;
         |        }
         |        if ($acc < $bestD) $bestD = $acc;
         |      }
         |      $total += graft.expressions.PqKernels.roundQ($bestD);
         |    }
         |    ${ev.value} = $total;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistortion =
    copy(child = newChild)
}

/** Engine-side batch ADC: Σ_s round(l2sq(query slice_s, cb[s][codes[s]])
  * × 1e6) as an exact long — scores a codes array against a query COLUMN
  * (the `knn_batch` shape) without a driver LUT. Loop form of the inline
  * batch-ADC tree; see [[PqKernels]]. */
case class PqAdcBatch(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Float]]]) extends BinaryExpression {

  private val m = codebooks.length
  private val ks = if (m == 0) 0 else codebooks.head.length
  private val subDim = if (ks == 0) 0 else codebooks.head.head.length
  require(m > 0 && ks > 0 && subDim > 0, "empty codebook")
  require(codebooks.forall(s => s.length == ks && s.forall(_.length == subDim)),
    "ragged codebook")

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    PqKernels.toMat(codebooks)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(IntegerType, _) => PqKernels.checkEmb(right.dataType, "pq_adc")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int> codes, array<float> query), got " +
        s"${other.catalogString} codes")
  }

  override def nullSafeEval(codesV: Any, qV: Any): Any = {
    val codes = codesV.asInstanceOf[ArrayData]
    val q = qV.asInstanceOf[ArrayData]
    if (codes.numElements() != m || q.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) {
      if (q.isNullAt(i)) return null
      i += 1
    }
    var total = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val j = codes.getInt(s)
      if (j < 0 || j >= ks) return null
      total += PqKernels.roundQ(PqKernels.sliceL2sq(q, s * subDim, cb(s)(j)))
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val total = ctx.freshName("total"); val c = ctx.freshName("c")
      s"""
         |if ($codes.numElements() != $m || $q.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; !${ev.isNull} && $i < ${m * subDim}; $i++) {
         |    if ($q.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |  long $total = 0L;
         |  for (int $s = 0; !${ev.isNull} && $s < $m; $s++) {
         |    if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    final int $j = $codes.getInt($s);
         |    if ($j < 0 || $j >= $ks) { ${ev.isNull} = true; break; }
         |    final float[] $c = $cbRef[$s][$j];
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $subDim; $k++) {
         |      final double $d =
         |        (double) $q.getFloat($s * $subDim + $k) - (double) $c[$k];
         |      $acc += $d * $d;
         |    }
         |    $total += graft.expressions.PqKernels.roundQ($acc);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $total; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcBatch =
    copy(left = newLeft, right = newRight)
}
