package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 56-bit hash of a string: the first 7 md5 digest bytes as an
  * unsigned big-endian integer — value-identical to
  * `conv(substring(md5(s), 1, 14), 16, 10)` (executable spec in
  * TextFunctions.hash56Hof) without materializing the hex string.
  *
  * 56 bits, not 64, so the value — and the oracle's nibble-fold that
  * recomputes it — stays exact inside a signed 64-bit BIGINT on both
  * engines. Feeds the wide SimHash sketch whose 7 disjoint 8-bit bands
  * give pigeonhole-guaranteed recall at hamming ≤ 6
  * (see Dedup.simhashNearDups). */
case class Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash56 expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.hash56(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.NgramHashes.hash56($x);")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)
}
