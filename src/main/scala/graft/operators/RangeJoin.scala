package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: match rows where a point value falls
  * inside [lo, hi] — WITHOUT an equality key.
  *
  * Naively this is a cartesian / broadcast-nested-loop join (every point
  * against every interval). The scale form maps both sides onto coarse
  * BANDS of width `band`: a point lives in exactly one band; an interval
  * explodes to every band it touches. The join becomes EQUI on the band
  * — Catalyst shuffles (or broadcasts) on the band key and the residual
  * `lo ≤ v ≤ hi` predicate filters within bands. Each true match is
  * produced exactly once (the point's single band is covered by the
  * interval), so no post-join distinct is needed.
  *
  * Band width tunes duplication vs selectivity: intervals explode to
  * ~(hi−lo)/band + 1 rows; points never duplicate. Pick band ≈ typical
  * interval length. */
object RangeJoin {

  def banded(
      points: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      band: Double): DataFrame = {
    def bandOf(c: Column): Column = floor(c.cast("double") / band).cast("long")
    val lb = points.withColumn("__band", bandOf(col(valueCol)))
    val rb = intervals.withColumn("__band",
      explode(sequence(bandOf(col(loCol)), bandOf(col(hiCol)))))
    lb.join(rb, Seq("__band"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__band")
  }
}
