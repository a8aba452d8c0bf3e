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

  /** Start byte offset of every code point of `s`, plus the end offset —
    * one linear walk, so every gram afterwards is a direct (off, len)
    * slice. `substringSQL(i, n)` per gram re-scans the bytes from the
    * START to find position i (UTF-8 is variable-width) — O(len²) byte
    * walking plus a UTF8String + byte[] allocation per gram; this was
    * the measured bottleneck of the char-gram hash pass. Code-point
    * boundaries are exactly what substringSQL counts, so slice semantics
    * are identical. */
  def cpOffsets(b: Array[Byte]): Array[Int] = {
    // count first
    var n = 0; var i = 0
    while (i < b.length) { i += UTF8String.numBytesForFirstByte(b(i)); n += 1 }
    val off = new Array[Int](n + 1)
    i = 0; var c = 0
    while (i < b.length) {
      off(c) = i; c += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    off(n) = b.length
    off
  }

  /** md5-prefix hash32 of a byte slice — identical to [[hash32]] on the
    * UTF8String covering the same bytes. */
  def hash32Bytes(b: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Shared kernel for interpreted eval and codegen. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val off = cpOffsets(b)
    val len = off.length - 1 // numChars
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      seen.add(hash32Bytes(b, off(i), off(i + n) - off(i)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
