package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.BottomK.bottomK
import graft.functions.TextFunctions.{hash32, hash56}

/** Mergeable cardinality sketches. The production alternative to
  * `count(DISTINCT x)` at 100 TB is a SKETCH — bounded state per group,
  * map-side partial aggregation, one tiny merge instead of a full
  * distinct shuffle. Spark's builtin `approx_count_distinct` is HLL++,
  * whose estimate depends on implementation internals no other engine
  * reproduces — unusable under a value-equality oracle. KMV (k-minimum
  * values, Bar-Yossef et al. 2002) is the deterministic classic: keep
  * the k smallest values of a uniform hash; with U = 2³² the estimate
  * (k−1)·U / h₍ₖ₎ is an exact function of integers, reproducible
  * bit-for-bit in any engine that shares the hash.
  */
object Sketch {

  /** Per-group exact distinct count AND the KMV estimate of it, side by
    * side (the estimate's honesty is part of the output, like
    * `ann_*_recall`). Input is a (group, value) frame; `n_exact` counts
    * distinct values, `kmv_est` is the k-minimum-values estimate from
    * hash32(value) — groups with fewer than k distinct values fall back
    * to the exact count (their sketch holds every hash).
    *
    * Scale shape: the distinct collapse is one shuffle on
    * (group, value) — the same shuffle exact counting needs — and the
    * sketch rides it as a [[graft.expressions.BottomK]] partial
    * aggregate (k-bounded heaps merged map-side). In the PURE-sketch
    * deployment (accepting the estimate without `n_exact`) the distinct
    * collapse is dropped entirely and BottomK runs straight on the raw
    * stream — duplicate hashes cannot displace distinct ones from a KMV
    * sketch that dedups, and even this non-deduping heap is exact-equal
    * as long as group cardinality ≥ k keeps duplicates out of the
    * bottom window; the oracle query keeps the distinct-first form so
    * both engines see identical multisets. */
  def kmvDistinct(pairs: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    val est = round(
      lit((k - 1).toLong * 4294967296L) / element_at(col("sk"), k).getField("id"), 4)
    pairs
      .select(col(groupCol), col(valueCol)).distinct()
      .select(col(groupCol), hash32(col(valueCol)).as("h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_exact"),
        bottomK(col("h").cast("double"), col("h"), k).as("sk"))
      .select(col(groupCol), col("n_exact"),
        when(col("n_exact") < k, col("n_exact").cast("double"))
          .otherwise(est).as("kmv_est"))
  }

  /** HyperLogLog register sketch (Flajolet/Fusy/Gandouet/Meunier 2007)
    * in a fully DETERMINISTIC form — the constant-state sibling of
    * [[kmvDistinct]]: 64 registers per group regardless of cardinality,
    * merged by MAX (so map-side partial aggregation collapses each
    * task's slice to ≤ 64 rows per group before the shuffle — the
    * mergeability HLL is famous for, and why it beats KMV's k values
    * when groups are huge).
    *
    * All register math is exact integers over the portable hash56:
    * register = h & 63, rank = leading zeros of the remaining 50-bit
    * field + 1 (= 51 − bitlen(h >> 6), computed as the length of the
    * binary string — no float log anywhere), harmonic denominator kept
    * as the EXACT long Σ 2^(51 − M_j) (empty registers contribute
    * 2^51). The only float op is the final single division
    * 709·2^63 / 1000·harm_q — one IEEE-exact-rounded op on exactly
    * representable inputs, bit-identical in any engine. Spark's builtin
    * `approx_count_distinct` is HLL++ with implementation-defined
    * internals — unusable under a value-equality oracle, which is why
    * this sketch exists (same reason as KMV).
    *
    * Returns (group, regs_used, harm_q, est_hll, n_exact): the raw
    * estimate next to the exact truth, honesty-metric style. The
    * low-range linear-counting correction is deliberately omitted — it
    * needs ln(), which libm does not guarantee bit-identical across
    * engines; below ~2.5·m use [[kmvDistinct]] or the exact count the
    * output already carries. */
  /** Raw HLL register table (group, idx, mr) with NO distinct collapse:
    * max is idempotent, so duplicate values cannot move a register —
    * the registers (hence the estimate) equal the distinct-input form.
    * This is the shape a STREAM aggregates (complete/update mode, ≤ 64
    * state rows per group forever — parity-tested in SketchSpec); it is
    * also the mergeable artifact two corpora union by taking per-(group,
    * idx) max. */
  def hllRegisters(pairs: DataFrame, groupCol: String, valueCol: String): DataFrame =
    pairs
      .select(col(groupCol), hash56(col(valueCol)).as("h"))
      .select(col(groupCol),
        col("h").bitwiseAND(lit(63L)).as("idx"),
        shiftright(col("h"), 6).as("rest"))
      .select(col(groupCol), col("idx"),
        when(col("rest") === 0L, lit(51))
          .otherwise(lit(51) - length(bin(col("rest")))).as("rank"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rank")).as("mr"))

  def hllDistinct(pairs: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val regs = pairs
      .select(col(groupCol), col(valueCol)).distinct()
      .select(col(groupCol), hash56(col(valueCol)).as("h"))
      .select(col(groupCol),
        col("h").bitwiseAND(lit(63L)).as("idx"),
        shiftright(col("h"), 6).as("rest"))
      .select(col(groupCol), col("idx"),
        when(col("rest") === 0L, lit(51))
          .otherwise(lit(51) - length(bin(col("rest")))).as("rank"))
      .groupBy(col(groupCol), col("idx"))
      .agg(count(lit(1)).as("nv"), max(col("rank")).as("mr"))
    regs
      .groupBy(col(groupCol))
      .agg(sum(col("nv")).as("n_exact"),
        count(lit(1)).as("regs_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - mr AS INT))")).as("obs"))
      .select(col(groupCol), col("regs_used"),
        (col("obs") + (lit(64L) - col("regs_used")) * lit(2251799813685248L))
          .as("harm_q"),
        col("n_exact"))
      .select(col(groupCol), col("regs_used"), col("harm_q"),
        round(lit(709.0) * pow(lit(2.0), lit(63.0)) /
          col("harm_q").cast("double") / lit(1000.0), 2).as("est_hll"),
        col("n_exact"))
  }

  /** Count-min sketch (Cormode/Muthukrishnan 2005) of a value stream:
    * `d` hash rows × `w` buckets of exact integer counts — the bounded-
    * state frequency table that replaces a full `groupBy(value).count`
    * at 100 TB (d·w cells of state regardless of vocabulary size; cells
    * merge by addition, so partial aggregation collapses each task's
    * slice to ≤ d·w rows before the one tiny shuffle). Row r buckets a
    * value at `hash32("r:" ++ value) mod w`; everything is integer, so
    * the sketch is reproducible bit-for-bit in any engine sharing the
    * hash. Returns (r, b, c). */
  def cmsTable(values: DataFrame, valueCol: String,
      d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2, "cms needs d >= 1, w >= 2")
    values
      .select(explode(array((0 until d).map(lit(_)): _*)).as("r"), col(valueCol).as("v"))
      .select(col("r"),
        pmod(hash32(concat(col("r").cast("string"), lit(":"), col("v"))), lit(w)).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Point estimates from a [[cmsTable]]: for each probe value, the
    * minimum over the d rows of its bucket's count — an overestimate
    * (collisions only add), exact when no collision. `probes` is any
    * frame carrying the values to look up; the sketch (d·w rows) is
    * broadcast, so probing is shuffle-free up to the final per-value
    * min. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, valueCol: String,
      d: Int = 4, w: Int = 256): DataFrame =
    probes
      .select(col("*"), explode(array((0 until d).map(lit(_)): _*)).as("r"))
      .withColumn("b",
        pmod(hash32(concat(col("r").cast("string"), lit(":"), col(valueCol))), lit(w)))
      .join(broadcast(cms), Seq("r", "b"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("c")).as("cms_est"))
}
