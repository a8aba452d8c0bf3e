package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity of two ARRAY<BIGINT> columns whose elements are
  * DISTINCT (hashed shingle sets): |a∩b| / (|a|+|b|-|a∩b|).
  *
  * The exact-verify kernel of the dedup pipelines — runs once per
  * surviving LSH candidate pair. Shingle sets are small (tens to low
  * hundreds), so a primitive nested-loop count beats building a hash set
  * per row (no boxing, no allocation); value-identical to
  * `size(array_intersect(a,b)) / (size(a)+size(b)-inter)` on distinct
  * NON-EMPTY inputs, which remains the executable spec in tests. One
  * deliberate divergence: on two empty arrays the SQL form yields NULL
  * (0/0) while this kernel returns 0.0 — a "no shingles in common"
  * convention chosen so the dedup verify stage never manufactures a
  * null similarity. Unreachable with current tokenization (empty text
  * still produces one empty-string token), but the convention is part
  * of the contract. */
case class JaccardLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_longs expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 && m == 0) return 0.0
    var inter = 0
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      var j = 0
      var found = false
      while (j < m && !found) { found = y.getLong(j) == v; j += 1 }
      if (found) inter += 1
      i += 1
    }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val v = ctx.freshName("v"); val inter = ctx.freshName("inter")
      val found = ctx.freshName("found")
      s"""
         |final int $n = $x.numElements();
         |final int $m = $y.numElements();
         |int $inter = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $v = $x.getLong($i);
         |  boolean $found = false;
         |  for (int $j = 0; $j < $m && !$found; $j++) {
         |    $found = $y.getLong($j) == $v;
         |  }
         |  if ($found) $inter++;
         |}
         |${ev.value} = ($n == 0 && $m == 0) ? 0.0
         |  : (double) $inter / ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongs =
    copy(left = newLeft, right = newRight)
}
