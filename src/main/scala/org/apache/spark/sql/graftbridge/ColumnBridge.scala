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
    * SparkContext (e.g. a clone carrying different runtime confs). The
    * ANALYZED plan is re-rooted, not the raw logical one: temp views and
    * session-registered UDFs are already resolved/inlined there, so a
    * frame built over caller session state survives the move even when
    * the target session lacks that state. Cached data is unaffected —
    * the CacheManager lives in SharedState, so persisted plans keep
    * matching across sessions. */
  def withSession(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)

  /** A full session clone (same SparkContext, COPIED session state:
    * current runtime confs, temp views, registered UDFs) — unlike
    * `newSession()`, which starts from initial options and silently
    * resets caller confs (ANSI mode, timezone, case sensitivity) for
    * anything run on the clone. For loop regimes that override a conf
    * or two but must otherwise behave exactly like the caller. */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
