package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash family minima of an ARRAY<BIGINT> of 32-bit
  * shingle hashes in ONE pass: family j is min over
  * `(h·(2j+1) + (j²+7)) mod (2^31−1)` — exactly the hash family of
  * `TextFunctions.minhashNumeric`, which remains the executable spec
  * (equality asserted in TextFunctionsSpec).
  *
  * Why native: the HOF form is H separate `transform`+`array_min` passes,
  * each allocating an intermediate array and paying per-element lambda
  * dispatch — for char-4-gram dedup that is 48 families × ~2000 shingles
  * per doc, the single hottest loop of the ngram pipeline. This kernel is
  * one allocation (the H-long result) and H×|hs| fused long ops inside
  * whole-stage codegen.
  *
  * Precondition: elements are 32-bit hashes (`hash32` outputs, < 2^32),
  * so h·(2H−1) stays far below Long.MaxValue — no overflow for any sane H.
  * Null elements are skipped (array_min parity); if no non-null element
  * exists the result is an array of H nulls (array_min of empty = null).
  */
case class MinHashFamilies(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_families expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        any = true
        val h = x.getLong(i)
        var j = 0
        while (j < numHashes) {
          val v = (h * (2L * j + 1) + (j.toLong * j + 7)) % 2147483647L
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $n = $x.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) continue;
         |  $any = true;
         |  final long $h = $x.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    final long $v = ($h * (2L * $j + 1) + ((long) $j * $j + 7)) % 2147483647L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = $any ? new $gad($mins) : new $gad(new Object[$numHashes]);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashFamilies =
    copy(child = newChild)
}
