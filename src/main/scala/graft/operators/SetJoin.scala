package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join — all pairs with Jaccard ≥ t over
  * token SETS, recall 1.0 by construction. The deterministic complement
  * of the MinHash band join ([[Dedup]]): banding trades recall for
  * candidate volume (measured by the `dedup_minhash_recall` honesty
  * metrics); prefix filtering guarantees completeness outright, at the
  * cost of candidate volume that grows with (1 − t). Public design:
  * Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search", WWW
  * 2007 (the prefix-filter principle PPJoin refines).
  *
  * The prefix-filter lemma: order the token universe totally (here by
  * ascending global frequency, rarest first, ties lexicographic — the
  * order that makes prefixes selective) and sort every set by it. If
  * |x ∩ y| ≥ o, then the first |x| − o + 1 tokens of x share a token
  * with the first |y| − o + 1 of y (fewer shared prefix tokens would
  * leave more than the allowed misses outside). Jaccard ≥ t implies
  * overlap o ≥ ⌈t·(|x|+|y|)/(1+t)⌉ ≥ ⌈t·|x|⌉, so exploding each set's
  * first |x| − ⌈t·|x|⌉ + 1 tokens and equi-joining on the token yields
  * every qualifying pair. Verification computes the EXACT intersection
  * on candidates only.
  *
  * Scale shape: the frequency table is one hash groupBy (vocab-bounded);
  * per-set ordering is a row-local sort after one vocab equi-join;
  * prefixes are ≤ (1−t)·|x| + 1 tokens per set; the candidate join is an
  * equi-join on the token (rare tokens by construction of the order);
  * nothing is ever quadratic in records. Jaccard is reported as the
  * EXACT ×1e6 integer `|∩|·10⁶ div |∪|` — no float anywhere.
  */
object SetJoin {

  /** ⌈a·num/den⌉ for non-negative int columns (exact small-int math). */
  private def ceilFrac(a: Column, num: Int, den: Int): Column =
    floor((a * num + (den - 1)) / lit(den)).cast("int")

  /** All unordered id pairs with Jaccard(tokSets) ≥ num/den:
    * (id1, id2, n_inter, n_union, jaccard_q). `sets` must be
    * (id, tk: array<string>) with DISTINCT tokens per row. */
  def jaccardPairs(sets: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0, 1]")
    val s = sets.select(col("id"), col("tk")).filter(size(col("tk")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = s.select(explode(col("tk")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    // rarest-first total order: sort by (global count, token)
    val ordered = s.select(col("id"), explode(col("tk")).as("t"))
      .join(freq, "t")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("cnt"), col("t")))).as("ct"))
      .select(col("id"), transform(col("ct"), x => x.getField("t")).as("ot"))
    val prefixLen = (size(col("ot")) - ceilFrac(size(col("ot")), num, den) + 1)
    val pref = ordered
      .select(col("id"), explode(slice(col("ot"), lit(1), prefixLen)).as("t"))
    val cand = pref.select(col("id").as("id1"), col("t"))
      .join(pref.select(col("id").as("id2"), col("t")), "t")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    cand
      .join(s.select(col("id").as("id1"), col("tk").as("tk1")), "id1")
      .join(s.select(col("id").as("id2"), col("tk").as("tk2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("tk1"), col("tk2"))).cast("long").as("n_inter"),
        (size(col("tk1")) + size(col("tk2"))).cast("long").as("n_both"))
      .select(col("id1"), col("id2"), col("n_inter"),
        (col("n_both") - col("n_inter")).as("n_union"))
      .withColumn("jaccard_q", expr("n_inter * 1000000L div n_union"))
      // threshold test in exact integers: J >= num/den <=> i*den >= u*num
      .filter(col("n_inter") * den >= col("n_union") * num)
      .select(col("id1"), col("id2"), col("n_inter"), col("n_union"),
        col("jaccard_q"))
  }
}
