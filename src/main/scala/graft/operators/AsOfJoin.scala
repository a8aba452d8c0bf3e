package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row whose timestamp
  * is ≤ (or <) the left timestamp, per key.
  *
  * Spark has no built-in as-of join; the naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + window-max) explodes to the full
  * per-key cross product before pruning. This implementation uses the
  * union trick instead: tag both sides, sort per key by (ts, side),
  * propagate the last right payload forward with `last(ignoreNulls)` —
  * ONE shuffle on the key, O(n log n) per key, no cross product. This is
  * the plan that survives 100 TB; it is also how the batch form of
  * streaming stream-stream joins behaves.
  *
  * Output: all left rows + `rightCols` (null where no right row precedes).
  */
object AsOfJoin {

  /**
    * @param left      left table
    * @param right     right table
    * @param keyCols   equi-key column names present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right payload columns to carry (renamed as given)
    * @param strict    true → right.ts strictly before left.ts
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload travels as ONE struct column so every carried value comes
    // from the SAME right row — per-column last(ignoreNulls) would fill
    // a legitimately-null payload column from an older row.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    // side marker: right rows are 0, left rows 1. Inclusive mode orders
    // right-before-left at equal ts (right visible at its own
    // timestamp); strict mode orders left-before-right (__side.desc) and
    // looks back one row, hiding same-ts right rows.
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++
        Seq(lit(null).cast(payloadType).as("__r"),
          col("__ts"), col("__side"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        .zip(leftCols).map { case (n, name) =>
          if (keyCols.contains(name)) col(name) else n.as(name)
        } ++
        Seq(struct(rightCols.map(col): _*).as("__r"),
          col("__ts"), col("__side"))): _*)
    val unioned = l.unionByName(r)
    // strict: the window must not see a right row at the same ts —
    // order right rows AFTER left rows at equal ts and look back 1 row.
    // The payload struct itself is the tertiary sort key: among right
    // rows sharing (key, ts) the winner is deterministic (largest
    // payload by field-wise struct ordering) instead of scan-order.
    val ordered =
      if (strict)
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ts"), col("__side").desc, col("__r"))
          .rowsBetween(Window.unboundedPreceding, -1)
      else
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ts"), col("__side"), col("__r"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(ordered))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col("__last").getField(c).as(c))): _*)
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`): for
    * every left row, the EARLIEST right row whose timestamp is ≥ (or >)
    * the left timestamp, per key — the mirror of [[joinAsOf]] through
    * the same union trick, with `first(ignoreNulls)` over the FOLLOWING
    * frame instead of `last` over the preceding one. Same single
    * shuffle on the key, no cross product.
    *
    * Side ordering at equal ts decides visibility: inclusive mode sorts
    * left rows BEFORE right ones (a right row at the left's own
    * timestamp is inside the following frame); strict mode sorts right
    * rows first, pushing same-ts right rows out of the frame. Among
    * right rows sharing (key, ts) the payload struct is the tertiary
    * sort key, so the winner is the smallest payload — deterministic,
    * not scan-order. */
  def joinAsOfForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val (leftSide, rightSide) = if (strict) (1, 0) else (0, 1)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .select((leftCols.map(col) ++
        Seq(lit(null).cast(payloadType).as("__r"),
          col("__ts"), col("__side"))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rightSide))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        .zip(leftCols).map { case (n, name) =>
          if (keyCols.contains(name)) col(name) else n.as(name)
        } ++
        Seq(struct(rightCols.map(col): _*).as("__r"),
          col("__ts"), col("__side"))): _*)
    val ordered = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__next", first(col("__r"), ignoreNulls = true).over(ordered))
      .filter(col("__side") === lit(leftSide))
      .select((leftCols.map(col) ++
        rightCols.map(c => col("__next").getField(c).as(c))): _*)
  }
}
