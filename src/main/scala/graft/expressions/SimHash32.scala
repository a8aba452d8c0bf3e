package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash of an ARRAY<BIGINT> of 32-bit token hashes in ONE
  * pass: bit j of the result is set iff a strict majority of inputs has
  * bit j set — exactly `TextFunctions.simhash32FromHashes`, which stays
  * as the executable spec (equality asserted in TextFunctionsSpec).
  *
  * Why native: the HOF form is an aggregate over 32 bit positions, each
  * running a nested aggregate over the whole hash array with floating
  * `floor(h/2^j)` arithmetic — 32 interpreted lambda passes per
  * document. This kernel is one loop with 32 integer counters inside
  * whole-stage codegen.
  *
  * Edge parity with the HOF form: empty input → 0 (no majority for any
  * bit); a null element poisons every per-bit sum in the HOF form so no
  * bit is set → 0 here as well (unreachable with hash32 inputs). */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return 0L // HOF parity: null poisons every bit sum
      val h = x.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
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
         |final int[] $counts = new int[32];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n && !$poisoned; $i++) {
         |  if ($x.isNullAt($i)) { $poisoned = true; break; }
         |  final long $h = $x.getLong($i);
         |  for (int $j = 0; $j < 32; $j++) {
         |    $counts[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |long $out = 0L;
         |if (!$poisoned) {
         |  for (int $j = 0; $j < 32; $j++) {
         |    if (2 * $counts[$j] > $n) $out |= 1L << $j;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
