package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Order-independent set fingerprint of an ARRAY<BIGINT> or
  * ARRAY<STRING> column in ONE pass: two independent xxhash64 streams
  * XOR-folded plus the set size, value-identical to
  * `TextFunctions.setFingerprintHof` (the builtin-composed executable
  * spec, equality asserted in TextFunctionsSpec).
  *
  * Why native: the HOF form runs two `aggregate()` higher-order
  * functions per row — higher-order functions are CodegenFallback, so
  * besides the per-element lambda interpretation they split the
  * whole-stage-codegen span of the projection that computes them (the
  * shingle/tokenize projection at the head of every dedup pipeline).
  * This kernel is one fused loop inside codegen.
  *
  * Element hashes replicate the builtin exactly via XxHash64Function:
  * f1 ⊕= xxh64(e, seed=42); f2 ⊕= xxh64(e, seed=xxh64(0x9e3779b9, 42))
  * (the two-argument `xxhash64(lit, e)` chains seeds). A null element
  * contributes the stream's seed, mirroring the builtin's null-skip. */
case class SetFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SetFingerprint.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"set_fingerprint expects array<bigint> or array<string>, got ${other.catalogString}")
  }

  // lazy: touching child.dataType in the constructor fires on the
  // unresolved copy Catalyst makes during analysis
  private lazy val isString = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SetFingerprint.compute(input.asInstanceOf[ArrayData], isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.SetFingerprint.compute($x, $isString);")

  override protected def withNewChildInternal(newChild: Expression): SetFingerprint =
    copy(child = newChild)
}

object SetFingerprint {

  val schema: StructType = StructType(Seq(
    StructField("f1", LongType, nullable = false),
    StructField("f2", LongType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  private val Seed1 = 42L
  /** seed of the second stream: xxh64 of the constant 0x9e3779b9 under
    * the default seed — exactly what `xxhash64(lit(0x9e3779b9L), e)`
    * folds before hashing `e`. */
  private val Seed2 = XxHash64Function.hash(0x9e3779b9L, LongType, Seed1)

  def compute(a: ArrayData, isString: Boolean): InternalRow = {
    val n = a.numElements()
    var f1 = 0L
    var f2 = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        // builtin parity: a null child leaves the running hash = seed
        f1 ^= Seed1
        f2 ^= Seed2
      } else if (isString) {
        val s = a.getUTF8String(i)
        f1 ^= XxHash64Function.hash(s, StringType, Seed1)
        f2 ^= XxHash64Function.hash(s, StringType, Seed2)
      } else {
        val l = a.getLong(i)
        f1 ^= XxHash64Function.hash(l, LongType, Seed1)
        f2 ^= XxHash64Function.hash(l, LongType, Seed2)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](f1, f2, n))
  }
}
