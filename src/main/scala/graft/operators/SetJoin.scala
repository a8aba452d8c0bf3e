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
    * (id, tk: array<string>) with DISTINCT tokens per row — and tk
    * should be an attribute of a MATERIALIZED frame, not an inline
    * shingle expression (the recurring inlined-HOF trap: an expression
    * tree referenced inside a later lambda re-evaluates per element —
    * measured 10.8 s of re-tokenization at sf0.1 before the barrier).
    *
    * Set elements travel as hash56 LONGS from here on (verify ships
    * 8-byte elements, not strings; the oracle hashes identically, so
    * counts replay exactly — the dedup-pipeline convention). */
  def jaccardPairs(sets: DataFrame, num: Int, den: Int,
      positionalFilter: Boolean = true): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0, 1]")
    // hs SORTED ascending (r20): the verify stage's intersection runs
    // as a zero-allocation merge count over pre-sorted sets instead of
    // a per-pair hash-set build — the sort is paid once per SET here,
    // the merge per CANDIDATE PAIR below (the Dedup verify-kernel
    // convention, JaccardSortedLongs). Order of hs is observable
    // nowhere else: freq explodes it, the prefix rank orders by
    // (cnt, t), and the output carries only counts.
    val s = sets.select(col("id"), col("tk")).filter(size(col("tk")) > 0)
      .select(col("id"),
        array_sort(array_distinct(transform(col("tk"),
          t => graft.functions.TextFunctions.hash56(t)))).as("hs"))
      .select(col("id"), col("hs"), size(col("hs")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager materialization: five consumers (freq, ordered, prefix
    // sizes, both verify sides) include independent broadcast subtrees
    // that Spark runs as CONCURRENT jobs — against a lazy cache they
    // race and each recomputes the shingle+hash pass (the
    // minhashRepPairs convention; measured as five parallel ~0.4 s
    // scan stages of one 0.4 s input)
    s.count()
    // rarest-first total order: sort by (global count, hash).
    // Shape note (r17): a window-count over the exploded token stream
    // ("one explode") was measured and REJECTED — no wall win at sf0.1,
    // and count().over(partitionBy(t)) BUFFERS each token's whole group
    // in the window exec, so one ubiquitous token at corpus scale is an
    // executor-memory cliff. The groupBy form is combine-safe (partial
    // counts), shuffles only vocab-sized rows, and broadcasts back.
    val freq = s.select(explode(col("hs")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    // Prefix rows carry POSITION (0-based, in the global rare-first
    // order) and set size, so both the length filter and the PPJoin
    // positional filter run INSIDE the token join — candidate rows die
    // before the distinct shuffle, not after it (VERDICT r15 next #3).
    // ONE explode feeds the whole prefix build (VERDICT r16 next #4):
    // the per-set rank under the global (cnt, t) order comes from a
    // row_number window partitioned by the set id — skew-safe, a window
    // group is one document — so the ordered ARRAY never materializes
    // and the old collect_list reassembly + posexplode + second
    // broadcast join (set sizes) collapse into sort+rank+filter on the
    // already-joined token stream. (cnt, t) is a total order within a
    // set (tokens are distinct), so the rank — and the candidate set —
    // is deterministic.
    val prefixLen = (col("n") - ceilFrac(col("n"), num, den) + 1)
    val pref = s.select(col("id"), col("n"), explode(col("hs")).as("t"))
      .join(freq, "t")
      .withColumn("p", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("cnt"), col("t"))) - 1)
      .filter(col("p") < prefixLen)
      .select(col("id"), col("p"), col("t"), col("n"))
    // Shape note (r17): consuming the UNPROJECTED pref under dataset
    // aliases on both join sides (the Dedup exchange-reuse convention,
    // VERDICT r16 next #4) was measured and REJECTED here — the
    // self-joined live subtree did NOT stage-share (both pref exchanges
    // still materialized) and the aliased plan added four empty 32-task
    // stages: 2.7 vs 1.9 s on the stage profile. Exchange reuse pays
    // off for PINNED index frames (leaf plans); for this in-query
    // subtree the renamed-projection form below is the faster plan.
    val cand = pref
      .select(col("id").as("id1"), col("p").as("p1"), col("n").as("n1"), col("t"))
      .join(pref
        .select(col("id").as("id2"), col("p").as("p2"), col("n").as("n2"), col("t")),
        "t")
      .filter(col("id1") < col("id2"))
      // length filter: J >= t forces the sizes within a factor t of
      // each other (|x| >= t|y| exactly because i <= |x| and u >= |y|)
      // — exact integer test, prunes before any array ships
      .filter(col("n1") * den >= col("n2") * num &&
        col("n2") * den >= col("n1") * num)
      // PPJoin positional filter (Xiao/Wang/Lin/Yu, WWW 2008): both
      // sets are sorted by the SAME total order, so if x and y first
      // share a token at (1-based) positions i, j, every common token
      // lies in x[i..] ∩ y[j..] and overlap ≤ 1 + min(|x|−i, |y|−j).
      // Jaccard ≥ t needs overlap ≥ ⌈t(|x|+|y|)/(1+t)⌉; with t=num/den
      // the integer form is bound·(num+den) ≥ num·(|x|+|y|). A pair
      // survives if ANY of its matching prefix rows passes — the first
      // match carries the LARGEST bound, so a true pair always survives
      // through it (completeness; SetJoinSpec differential-pins this
      // against the prefix-only candidate set), while same-boilerplate
      // pairs whose match sits deep in both prefixes die here.
      .filter(if (positionalFilter)
          (lit(1) +
            least(col("n1") - col("p1") - 1, col("n2") - col("p2") - 1)) *
            (num + den) >= (col("n1") + col("n2")) * num
        else lit(true))
      .select(col("id1"), col("id2")).distinct()
    // EXPLICIT width for the verify stage (AQE-freeze rationale:
    // Tables.sessionWidth): candidate-pair rows are a few BYTES each but
    // each costs an array-merge verify — the AQE-coalesced single task
    // was the measured longest stage of the join (~0.8 s).
    graft.sources.Tables.spreadToWidth(cand)
      .join(s.select(col("id").as("id1"), col("hs").as("hs1")), "id1")
      .join(s.select(col("id").as("id2"), col("hs").as("hs2")), "id2")
      .select(col("id1"), col("id2"),
        // merge-intersection count over the pre-sorted sets — value-
        // identical to size(array_intersect(...)) on distinct inputs
        // (SetJoinSpec pins it), no per-pair hash set or array
        // materialization (r20, the verify stage was the join's CPU
        // floor: 22-34 cpu-s at sf0.1)
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.expressions.IntersectCountSortedLongs(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("hs1")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("hs2"))))
          .as("n_inter"),
        (size(col("hs1")) + size(col("hs2"))).cast("long").as("n_both"))
      .select(col("id1"), col("id2"), col("n_inter"),
        (col("n_both") - col("n_inter")).as("n_union"))
      .withColumn("jaccard_q", expr("n_inter * 1000000L div n_union"))
      // threshold test in exact integers: J >= num/den <=> i*den >= u*num
      .filter(col("n_inter") * den >= col("n_union") * num)
      .select(col("id1"), col("id2"), col("n_inter"), col("n_union"),
        col("jaccard_q"))
  }
}
