package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact |a ∩ b| of two SORTED-ASCENDING DISTINCT ARRAY<BIGINT>
  * columns via merge-intersection — the count-only sibling of
  * [[JaccardSortedLongs]], for callers that need the INTEGER overlap
  * (the exact set-similarity joins report `n_inter`/`n_union` in
  * integers, no float anywhere).
  *
  * Why it exists (r20, guide §"per-task work"): the setjoin verify
  * stage computed `size(array_intersect(hs1, hs2))` per candidate
  * pair — Spark's ArrayIntersect builds a hash set AND materializes
  * the intersection array per row, only for `size` to throw it away.
  * At the exact join's candidate volume (the suite's largest CPU
  * burner: 22-34 cpu-s at sf0.1) the per-pair allocations dominate.
  * The merge count allocates nothing and runs O(|a|+|b|); the sort is
  * amortized once per SET in the signature frame, not per pair.
  *
  * Value-identical to `size(array_intersect(a, b))` on sorted distinct
  * inputs (SetJoinSpec pins the equivalence). Precondition (unchecked,
  * for speed): both arrays sorted ascending, elements distinct and
  * non-null. */
case class IntersectCountSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted_longs expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var inter = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val inter = ctx.freshName("inter")
      s"""
         |final int $n = $x.numElements();
         |final int $m = $y.numElements();
         |long $inter = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  final long $u = $x.getLong($i);
         |  final long $v = $y.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSortedLongs =
    copy(left = newLeft, right = newRight)
}
