package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — all record pairs within
  * Levenshtein distance `k`, without ever going quadratic in records.
  * The string-similarity sibling of the MinHash/SimHash dedup family
  * (those bound Jaccard/cosine; this bounds EDIT distance, the right
  * measure for typo-level near-dups in names, titles, and short fields).
  * Public design: the PassJoin partition scheme (Li, Deng, Wang, Feng,
  * "PassJoin: A Partition-based Method for Similarity Joins", PVLDB
  * 5(3), 2011) — the same pigeonhole idea the SimHash banding uses,
  * applied to substrings instead of bit planes.
  *
  * Scale shape, in order:
  *  1. COLLAPSE to distinct strings with multiplicities (one hash
  *     groupBy). Real corpora repeat values; every later stage is
  *     bounded by |distinct|, and record-pair counts come back at the
  *     end as multiplicity products. Worst case |distinct| = N and the
  *     algorithm is unchanged.
  *  2. INDEX: each distinct string s of length L is cut into k+1
  *     contiguous segments (even partition; segment i of length
  *     L/(k+1) + (1 if i < L mod (k+1))). Key = (segment text, i, L).
  *  3. PROBE: each distinct string t enumerates, for every source
  *     length L within ±k of |t| and every segment i, the substrings of
  *     t with segment i's length starting within ±k of segment i's
  *     start — ≤ (2k+1)²·(k+1) keys per string, a constant.
  *  4. One equi-join on the key, then EXACT `levenshtein` verification
  *     on candidates only.
  *
  * Completeness (the pigeonhole guarantee the oracle's quadratic replay
  * value-checks): ≤ k edits cannot touch all k+1 segments of s, so some
  * segment survives verbatim in t; the edits before it shift its start
  * by at most k positions, so the probe's ±k window generates exactly
  * that substring, and the pair is a candidate. Candidates are a
  * superset; the verify step makes the result exact — recall 1.0 BY
  * CONSTRUCTION (unlike MinHash banding, where recall is probabilistic
  * and measured by the honesty metrics).
  */
object SimJoin {

  /** Distinct values of `valueCol` with record multiplicities. */
  private def collapsed(records: DataFrame, valueCol: String): DataFrame =
    records.groupBy(col(valueCol).as("s")).agg(count(lit(1)).as("cnt"))

  /** Exact integer division of small non-negative ints (lengths). */
  private def idiv(a: Column, b: Int): Column =
    floor(a / lit(b)).cast("int")

  /** Segment length of segment `i` for source length `L` (even
    * partition, earlier segments take the remainder). */
  private def segLen(i: Column, L: Column, k: Int): Column =
    idiv(L, k + 1) + when(i < (L % (k + 1)), 1).otherwise(0)

  /** 0-based start of segment `i` for source length `L`. */
  private def segStart(i: Column, L: Column, k: Int): Column =
    i * idiv(L, k + 1) + least(i, L % (k + 1))

  /** Distinct UNORDERED string pairs (s < t lexicographically) within
    * edit distance `k`, with their exact distance: (s, t, dist).
    * Candidate generation is the PassJoin index/probe join above —
    * |distinct|-bounded, never quadratic. */
  def editPairs(strings: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val segIdx = explode(lit((0 to k).toArray)).as("i")
    // index side: (seg, i, L) per distinct string
    val idx = strings.select(col("s"), segIdx, length(col("s")).as("L"))
      .select(col("s"), col("i"), col("L"),
        col("s").substr(segStart(col("i"), col("L"), k) + 1,
          segLen(col("i"), col("L"), k)).as("seg"))
    // probe side: substrings of t at every compatible (L, i, ±k start)
    val probe = strings.select(col("s").as("t"))
      .select(col("t"), length(col("t")).as("lt"),
        segIdx, explode(lit((-k to k).toArray)).as("dL"))
      .select(col("t"), col("i"), (col("lt") + col("dL")).as("L"), col("lt"))
      .filter(col("L") >= 1)
      .select(col("t"), col("i"), col("L"), col("lt"),
        explode(lit((-k to k).toArray)).as("delta"))
      .select(col("t"), col("i"), col("L"), col("lt"),
        (segStart(col("i"), col("L"), k) + col("delta")).as("st"),
        segLen(col("i"), col("L"), k).as("sl"))
      .filter(col("st") >= 0 && col("st") + col("sl") <= col("lt"))
      .select(col("t"), col("i"), col("L"),
        col("t").substr(col("st") + 1, col("sl")).as("seg"))
    idx.join(probe, Seq("seg", "i", "L"))
      .filter(col("s") < col("t"))
      .select(col("s"), col("t")).distinct()
      .select(col("s"), col("t"), levenshtein(col("s"), col("t")).as("dist"))
      .filter(col("dist") <= k)
  }

  /** RECORD pair counts per exact edit distance 0..k over
    * `records(valueCol)`: (dist, pairs). Distance-0 pairs are the
    * C(cnt, 2) within-value pairs of the collapse; cross-value pairs
    * multiply the two multiplicities. Output is k+1 rows regardless of
    * N — the whole join is value-checked through the aggregate. */
  def editPairCounts(records: DataFrame, valueCol: String, k: Int): DataFrame = {
    val names = collapsed(records, valueCol)
    val exact = names.filter(col("cnt") > 1)
      .select(lit(0).as("dist"),
        (col("cnt") * (col("cnt") - 1) / 2).cast("long").as("p"))
    val cross = editPairs(names.select(col("s")), k)
      .join(names.select(col("s"), col("cnt").as("cs")), "s")
      .join(names.select(col("s").as("t"), col("cnt").as("ct")), "t")
      .select(col("dist"), (col("cs") * col("ct")).cast("long").as("p"))
    exact.unionAll(cross)
      .groupBy(col("dist")).agg(sum(col("p")).as("pairs"))
      .orderBy(col("dist"))
  }
}
