package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints in ONE pass: hash32 of every char
  * `k`-gram in position order, then the DISTINCT minima of each sliding
  * window of `w` consecutive hashes (first-occurrence order) — value-
  * identical to `TextFunctions.winnowFingerprintsHof`, the
  * builtin-composed executable spec this is tested against.
  *
  * Why native — and why this is not an optimization nicety: in the HOF
  * form `transform(sequence(1, n-w+1), i -> array_min(slice(hs, i, w)))`
  * the non-lambda subtree `hs` (the full md5 pass over the document) is
  * re-evaluated on EVERY lambda invocation, i.e. once per window — the
  * spec form is O(len²) md5 calls per document. This kernel hashes each
  * gram exactly once and takes window minima with a monotonic deque:
  * O(len) md5 calls, O(len) window work, no intermediate string array.
  *
  * Winnowing guarantee (same as the spec): any shared substring of
  * length ≥ k+w−1 between two documents yields a shared fingerprint.
  * Texts with fewer than `w` grams contribute their global minimum (one
  * truncated window); texts shorter than `k` fingerprint to the empty
  * set. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")
  require(w > 0, "w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.WinnowFingerprints.compute($x, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Shared kernel for interpreted eval and codegen. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val off = NgramHashes.cpOffsets(b)
    val len = off.length - 1 // numChars
    if (len < k) return new GenericArrayData(Array.emptyLongArray)
    val n = len - k + 1
    // position-ordered gram hashes over direct byte slices (code-point
    // boundaries — exact parity with the builtin substring charShingles
    // uses; see NgramHashes.cpOffsets)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = NgramHashes.hash32Bytes(b, off(i), off(i + k) - off(i))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // monotonic deque of indices with strictly increasing hash values;
    // on ties the later index survives — emitted VALUES are unaffected,
    // and array_min in the spec is value-only, so parity holds.
    val dq = new Array[Int](n)
    var head = 0; var tail = 0
    var j = 0
    while (j < n) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      while (dq(head) <= j - w) head += 1
      // window [j-w+1, j] complete once j ≥ w-1 (first-occurrence order)
      if (j >= w - 1) seen.add(hs(dq(head)))
      j += 1
    }
    // fewer than w grams: the spec's single truncated window = global min
    if (n < w) seen.add(hs(dq(head)))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
