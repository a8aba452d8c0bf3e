package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CharEntropyQ, DotProduct, Hash56, JaccardLongs, JaccardSortedLongs, L2SquaredDistance, MinHashFamilies, NgramHashes, SignLshBucket, SignatureAgreement, SimHashBits, WinnowFingerprints}

/** SQL surface for the native vector expressions.
  *
  * Either install at session build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  * or register into a live session with `GraftExtensions.register(spark)`.
  * Afterwards `SELECT l2sq(a.embedding, b.embedding)` works in SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("l2sq",
      info("l2sq", "l2sq(a, b) - squared L2 distance of two float arrays"),
      (exprs: Seq[Expression]) => L2SquaredDistance(exprs(0), exprs(1))),
    ("dot_f32",
      info("dot_f32", "dot_f32(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("sig_agreement",
      info("sig_agreement", "sig_agreement(a, b) - count of agreeing positions in two bigint arrays"),
      (exprs: Seq[Expression]) => SignatureAgreement(exprs(0), exprs(1))),
    ("jaccard_longs",
      info("jaccard_longs", "jaccard_longs(a, b) - jaccard similarity of two distinct bigint arrays"),
      (exprs: Seq[Expression]) => JaccardLongs(exprs(0), exprs(1))),
    ("jaccard_sorted",
      info("jaccard_sorted", "jaccard_sorted(a, b) - jaccard of two SORTED distinct bigint arrays (merge-intersection)"),
      (exprs: Seq[Expression]) => JaccardSortedLongs(exprs(0), exprs(1))),
    ("minhash_families",
      info("minhash_families", "minhash_families(hashes, H) - all H MinHash family minima of a 32-bit hash array"),
      (exprs: Seq[Expression]) => MinHashFamilies(exprs(0), foldableInt(exprs(1), "minhash_families(H)"))),
    ("ngram_hashes",
      info("ngram_hashes", "ngram_hashes(text, n) - distinct hash32 values of all char n-grams"),
      (exprs: Seq[Expression]) => NgramHashes(exprs(0), foldableInt(exprs(1), "ngram_hashes(n)"))),
    ("simhash32",
      info("simhash32", "simhash32(hashes) - 32-bit per-bit-majority SimHash of a 32-bit hash array"),
      (exprs: Seq[Expression]) => SimHashBits(exprs(0), 32)),
    ("simhash_bits",
      info("simhash_bits", "simhash_bits(hashes, bits) - bits-wide per-bit-majority SimHash of a hash array"),
      (exprs: Seq[Expression]) => SimHashBits(exprs(0), foldableInt(exprs(1), "simhash_bits(bits)"))),
    ("hash56",
      info("hash56", "hash56(s) - first 14 md5 nibbles as an unsigned 56-bit integer"),
      (exprs: Seq[Expression]) => Hash56(exprs(0))),
    ("winnow_fps",
      info("winnow_fps", "winnow_fps(text, k, w) - distinct winnowed minima of char k-gram hash32s over windows of w"),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs(0),
        foldableInt(exprs(1), "winnow_fps(k)"), foldableInt(exprs(2), "winnow_fps(w)"))),
    ("char_entropy_q",
      info("char_entropy_q", "char_entropy_q(s) - x1e6-quantized char-unigram Shannon entropy of a string"),
      (exprs: Seq[Expression]) => CharEntropyQ(exprs(0))),
    ("sign_lsh",
      info("sign_lsh", "sign_lsh(emb, planes, dim) - sign-LSH bucket of a float array against the deterministic md5-derived hyperplane matrix (Ann.hyperplanes)"),
      (exprs: Seq[Expression]) => SignLshBucket(exprs(0),
        graft.operators.Ann.hyperplanes(
          foldableInt(exprs(1), "sign_lsh(planes)"),
          foldableInt(exprs(2), "sign_lsh(dim)")))))

  private def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval().asInstanceOf[Number].intValue
  }

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
