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
}
