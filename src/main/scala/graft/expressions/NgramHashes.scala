package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT hash32 values of all character `n`-grams of a string, fused
  * into one pass: value-identical (as a SET) to
  * `transform(array_distinct(charShingles(c, n)), hash32)` — the
  * executable spec this is tested against — but never materializes the
  * shingle strings as an array, never runs a string-level distinct, and
  * computes each md5 exactly once.
  *
  * Set-vs-multiset note: the spec form dedups STRINGS then hashes (a
  * hash32 collision between distinct grams would leave a duplicate long);
  * this kernel dedups the LONGS. Every downstream consumer is set-
  * semantic on the longs (family minima, array_distinct before jaccard,
  * XOR fingerprint), so the pipelines are value-identical either way.
  *
  * Substring semantics match Spark's `substring` (code points, via
  * UTF8String.substringSQL) — the oracle's slicing agrees on this
  * corpus, already value-checked. Strings shorter than n yield an empty
  * array (charShingles parity). */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.NgramHashes.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash32 of a UTF8String: first 4 md5 digest bytes as an unsigned
    * 32-bit big-endian integer — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)`. */
  def hash32(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** hash56 of a UTF8String: first 7 md5 digest bytes as an unsigned
    * 56-bit big-endian integer — identical to
    * `conv(substring(md5(s), 1, 14), 16, 10)`. 56 bits (not 64) so the
    * value and every integer fold over it stay exact in a SIGNED 64-bit
    * BIGINT on both engines (the DuckDB oracle replicates the fold). */
  def hash56(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
  }

  /** Shared kernel for interpreted eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 1
    while (i <= len - n + 1) {
      // substringSQL is 1-based and code-point-aware — exact parity with
      // the builtin substring charShingles uses
      seen.add(hash32(s.substringSQL(i, n)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
