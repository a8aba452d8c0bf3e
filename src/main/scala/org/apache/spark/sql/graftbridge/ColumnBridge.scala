package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so this
  * lives in an org.apache.spark.sql subpackage — the standard pattern for
  * Spark extension libraries shipping custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-root a DataFrame's logical plan onto another session of the SAME
    * SparkContext (e.g. a `newSession()` clone carrying different
    * runtime confs). Cached data is unaffected — the CacheManager lives
    * in SharedState, so persisted plans keep matching across sessions. */
  def withSession(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)
}
