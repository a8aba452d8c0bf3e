package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries: each entry pairs a Spark
  * DataFrame program with (where SQL-expressible) an equivalent DuckDB
  * oracle query over the same parquet tables.
  *
  * Conventions enforced across every pack (driver hash-compare parity):
  *  - identical column names AND types on both sides (BIGINT/LongType for
  *    integer outputs, DOUBLE for floats);
  *  - a deterministic total ORDER BY terminates every query;
  *  - money/double aggregation goes through exact DECIMAL arithmetic
  *    (2-decimal source data → decimal cast is exact), cast to DOUBLE at
  *    the very end; vector distances use a fixed left-fold order and are
  *    rounded to 4 decimals.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Shared DuckDB SQL fragments used by multiple packs' oracles. One
  * definition per hash family — four packs replay `hash32`, and a
  * drifted copy would silently break oracle parity for the stale pack. */
object DuckSql {

  /** hash32: first 8 md5 nibbles as integer (exact fold) — mirrors
    * graft.functions.TextFunctions.hash32 / expressions.Hash32. */
  def dHash32(s: String): String =
    s"CAST(list_sum(list_transform(range(1,9), i -> " +
      s"(strpos('0123456789abcdef', md5($s)[i:i]) - 1) * 16^(8-i))) AS BIGINT)"
}
