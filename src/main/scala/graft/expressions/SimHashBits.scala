package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bits`-wide SimHash of an ARRAY<BIGINT> of token hashes in ONE pass:
  * bit j of the result is set iff a strict majority of inputs has bit j
  * set — exactly `TextFunctions.simhashBitsFromHashes`, which stays as
  * the executable spec (equality asserted in TextFunctionsSpec).
  *
  * Why native: the HOF form runs one nested aggregate over the whole
  * hash array per bit position — `bits` interpreted lambda passes per
  * document. This kernel is one loop with `bits` integer counters inside
  * whole-stage codegen.
  *
  * Width is a plan-time literal (32 for the classic sketch, 56 for the
  * banded dedup sketch — 7×8-bit pigeonhole bands, exact in a signed
  * BIGINT on both engines).
  *
  * Edge parity with the HOF form: empty input → 0 (no majority for any
  * bit); a null element poisons every per-bit sum in the HOF form so no
  * bit is set → 0 here as well (unreachable with hash32/hash56 inputs). */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return 0L // HOF parity: null poisons every bit sum
      val h = x.getLong(i)
      var j = 0
      while (j < bits) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (2 * counts(j) > n) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val counts = ctx.freshName("counts"); val out = ctx.freshName("out")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |final int $n = $x.numElements();
         |final int[] $counts = new int[$bits];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n && !$poisoned; $i++) {
         |  if ($x.isNullAt($i)) { $poisoned = true; break; }
         |  final long $h = $x.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $counts[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |long $out = 0L;
         |if (!$poisoned) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if (2 * $counts[$j] > $n) $out |= 1L << $j;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
