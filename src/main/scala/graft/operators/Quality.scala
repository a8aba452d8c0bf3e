package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions._

/** Batch entry points for row-local quality kernels. */
object Quality {

  /** Char-unigram entropy per document via the native codegen kernel
    * ([[graft.expressions.CharEntropyQ]]) — one code-point pass per
    * row, zero shuffle, nothing to prune or persist. Value-identical to
    * the HOF executable spec `charEntropyQ(charsOf(norm))`
    * (differential-tested in TextFunctionsSpec); that interpreted form
    * costs O(distinct·len) lambda calls per row (~6 s at sf0.1 when the
    * score actually feeds downstream computation), this one is
    * negligible. */
  def charEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), normText(col(textCol)).as("norm"))
      .select(col(idCol), charEntropyNative(col("norm")).as("entropy_q"))

  /** Gopher-style repetition fractions (top-bigram occurrence share,
    * duplicated-trigram share) as a RELATIONAL pipeline — value-
    * identical to the nested-HOF form (top count and once-count are
    * exact integers; the final fraction is the same cast-divide-round
    * tree), but explode → count-per-gram → max/once-count instead of an
    * O(distinct·len) interpreted scan per row (forced compute at sf0.1:
    * 8.8 s HOF → ~1 s; Bench's count() had pruned the HOF cost, Verify
    * always paid it). The shingled frame is persisted before the
    * generators (the established explode trap); callers own cleanup.
    * Returns (idCol, n_tok, top2_frac, dup3_frac). */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("tok"))
      .select(col(idCol), col("tok"),
        wordShingles(col("tok"), 2).as("sh2"),
        wordShingles(col("tok"), 3).as("sh3"))
      .select(col(idCol), size(col("tok")).cast("long").as("n_tok"),
        size(col("sh2")).as("n2"), size(col("sh3")).as("n3"),
        col("sh2"), col("sh3"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val top2 = base.select(col(idCol), explode(col("sh2")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_c"))
    val once = base.select(col(idCol), explode(col("sh3")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") === 1)
      .groupBy(col(idCol)).agg(count(lit(1)).as("once_c"))
    base.select(col(idCol), col("n_tok"), col("n2"), col("n3"))
      .join(top2, Seq(idCol), "left")
      .join(once, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        round(coalesce(col("top_c"), lit(0L)).cast("double") /
          greatest(col("n2"), lit(1)), 6).as("top2_frac"),
        round((col("n3") - coalesce(col("once_c"), lit(0L))).cast("double") /
          greatest(col("n3"), lit(1)), 6).as("dup3_frac"))
  }
}
