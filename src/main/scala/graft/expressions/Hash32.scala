package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 32-bit hash of a string: the first 4 md5 digest bytes as an
  * unsigned big-endian integer — value-identical to
  * `conv(substring(md5(s), 1, 8), 16, 10)` (the executable spec kept in
  * TextFunctions.hash32Hof, value-pinned in TextFunctionsSpec) without
  * materializing the 32-char hex string and parsing it back. Runs once
  * per token/shingle across every dedup pipeline. */
case class Hash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash32 expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.NgramHashes.hash32($x);")

  override protected def withNewChildInternal(newChild: Expression): Hash32 =
    copy(child = newChild)
}
