package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * SHUFFLE partitions, which covers most cases; salting is the explicit
  * fallback when one join KEY itself is pathological (a single key larger
  * than an executor — the "null key" / "default value" problem at 100 TB)
  * or when AQE is unavailable (e.g. inside a cached plan).
  *
  * Mechanics: the skewed (large) side gets a random-but-deterministic
  * salt in [0, buckets); the small side is replicated `buckets` times;
  * the join key becomes (key, salt). Each hot key now spreads over
  * `buckets` tasks. Determinism: the salt is a hash of the large side's
  * whole row id column, not rand(), so retries/recomputation see the
  * same assignment (rand() in a shuffle input is a correctness bug on
  * task retry).
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salted `buckets` ways.
    * `saltBy` must be a deterministic per-row column of the large side
    * (an id); DO NOT pass rand(). */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      buckets: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Salted groupBy-count for a skewed grouping key: partial aggregate on
    * (key, salt), then final aggregate on key. Two small shuffles instead
    * of one giant hot partition. (Spark's hash aggregate already does
    * partial/final; explicit salting matters for high-cardinality
    * payloads like collect_list where map-side combine cannot shrink the
    * hot key.) */
  def saltedCollectList(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltBy: Column,
      buckets: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as(s"${valueCol}_list"))
}
