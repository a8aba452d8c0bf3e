package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ×1e6-quantized character-unigram Shannon entropy of a string —
  * value-identical to the HOF kernel
  * `TextFunctions.charEntropyQ(charsOf(s))` (the executable spec,
  * differential-tested): per DISTINCT code point c,
  * round(−(p_c·ln p_c)·1e6) with p_c = cnt/len as the same
  * double-division tree, summed as an exact long. The HOF form walks
  * the char array once per distinct char through interpreted lambdas
  * (O(distinct·len) lambda calls — ~6 s for sf0.1's 2.7 M chars); this
  * kernel is one code-point pass plus a count map, inside codegen. */
case class CharEntropyQ(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_q expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropyQ.entropyQ(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.CharEntropyQ.entropyQ($x);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyQ =
    copy(child = newChild)
}

object CharEntropyQ {
  /** One pass for counts (code points — `substring` semantics), then
    * one term per distinct char: p = (double) cnt / (double) n (the
    * HOF's cast-then-divide), Math.log (Catalyst's Log), HALF_UP round
    * via BigDecimal.valueOf (Catalyst Round on DoubleType). */
  def entropyQ(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      val p = cnt.toDouble / n.toDouble
      val term = -(p * java.lang.Math.log(p)) * 1e6
      sum += java.math.BigDecimal.valueOf(term)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    sum
  }
}
