package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Benchmark decontamination — remove (or flag) training documents that
  * share word n-grams with an evaluation/benchmark set, the standard
  * guard against train/test contamination in LLM data pipelines (GPT-3
  * appendix C uses 13-gram overlap; Dolma/RedPajama ship the same shape
  * with n in 8–13). Not in the reference (a pure vector-search engine),
  * but a first-class operator for the 100 TB training-data use case
  * this engine targets.
  *
  * Spark-first shape, and why it scales:
  *  - n-grams are produced INSIDE the scan projection (`transform` over
  *    the token array — row-local, whole-stage codegen'd), distinct-ed
  *    per document before the explode so a pathological repeated-phrase
  *    document cannot amplify join input.
  *  - the eval side is DRIVER-KNOWN SMALL by nature (benchmark suites
  *    are MBs against a 100 TB corpus), so the contamination check is a
  *    BROADCAST hash join against the distinct eval-gram set: the
  *    training corpus NEVER shuffles — the only exchange in the plan is
  *    the per-doc hit count, keyed on already-matched (rare) rows.
  *  - `overlap` returns per-doc match counts (audit view); `keep`
  *    anti-joins the flagged ids — at scale you persist `keep`'s output
  *    as the cleaned corpus in the same pass that computed it.
  */
object Decontaminate {

  /** (id, gram): the DISTINCT word n-grams of each document, after the
    * library-standard normalization ([[TextFunctions.normText]]).
    * Documents shorter than n words emit nothing (explode of an empty
    * array).
    *
    * The token array is MATERIALIZED as its own projection before the
    * gram lambda touches it — inlining `tokens(text)` into the
    * `slice(...)` inside the transform re-derives the whole split per
    * gram (O(tokens²) per document; the SURVEY §2 round-7 convention,
    * observed 60 s → 0.12 s on `quality_repetition`). */
  def wordNgrams(docs: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(gramsOfTokens(col("toks"), n)).as("gram"))
  }

  /** Row-local distinct n-gram array over an ALREADY-MATERIALIZED token
    * array column (see [[wordNgrams]] for why it must not be an inline
    * `tokens(...)` expression). */
  def gramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** [[gramsOfTokens]] over a text column, for single-expression use in
    * tests; callers on a hot path should project the tokens first. */
  def ngramsCol(text: Column, n: Int): Column = gramsOfTokens(tokens(text), n)

  /** Per-document contamination audit: (id, n_overlap) for every
    * training document sharing at least one word n-gram with the eval
    * set. `n_overlap` counts DISTINCT shared grams (the per-doc gram
    * sets are distinct by construction). */
  def overlap(train: DataFrame, eval: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = broadcast(
      wordNgrams(eval, n, textCol, idCol).select(col("gram")).distinct())
    wordNgrams(train, n, textCol, idCol)
      .join(evalGrams, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** The cleaned corpus: training documents with ZERO eval n-gram
    * overlap. Broadcast anti-join on the (rare) flagged ids — the
    * corpus passes through without shuffling. */
  def keep(train: DataFrame, eval: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val flagged = overlap(train, eval, n, textCol, idCol).select(col(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** The distinct hash32 values of the eval set's word n-grams,
    * collected once — bounded by the BENCHMARK size (MBs against a
    * 100 TB corpus), never by training data. The handle a streaming
    * ingest pipeline builds at start-up and reuses per micro-batch. */
  def evalGramHashes(eval: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): Array[Long] =
    wordNgrams(eval, n, textCol, idCol)
      .select(graft.functions.TextFunctions.hash32(col("gram")).as("h"))
      .distinct()
      .collect().map(_.getLong(0)).sorted

  /** Streaming decontamination: keep only stream documents sharing NO
    * word n-gram with the eval set. The decision is fully ROW-LOCAL —
    * gram hashes are built in the projection and tested with
    * `arrays_overlap` against the eval-hash literal — so the filter is
    * stateless, watermark-free, and legal in any streaming output mode
    * (the shape that matters: ingest-time decontamination instead of a
    * post-hoc batch sweep). Matches [[keep]] on the same rows up to
    * hash32 collisions (2⁻³² per gram pair, which only ever DROPS an
    * extra doc — conservative in the safe direction). */
  def keepStream(stream: DataFrame, evalHashes: Array[Long], n: Int,
      textCol: String = "text"): DataFrame = {
    val gh = array_distinct(transform(
      gramsOfTokens(col("__toks"), n),
      g => graft.functions.TextFunctions.hash32(g)))
    stream
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__gh", gh)
      .filter(!arrays_overlap(col("__gh"), lit(evalHashes)))
      .drop("__toks", "__gh")
  }

  /** The `kh` Bloom positions of one gram: `hash32("s:gram") mod m` for
    * seed s in 1..kh (the standard k-hash family built from one base
    * hash by seed prefixing). Row-local; shared by the filter build and
    * the probe so both sides hash identically. */
  def bloomPositions(gram: Column, m: Int, kh: Int): Column =
    transform(sequence(lit(1), lit(kh)), s => pmod(
      graft.functions.TextFunctions.hash32(
        concat_ws(":", s.cast("string"), gram)),
      lit(m.toLong)))

  /** Bloom-filter contamination audit — the FIXED-STATE variant of
    * [[overlap]]. The exact check broadcasts the full eval gram SET,
    * which grows with the benchmark suite; the Bloom form compresses it
    * to an `m`-bit filter — state bounded by CONFIG, not by data — at
    * the price of false positives, which for decontamination only ever
    * over-drop (the conservative direction; same argument as
    * [[keepStream]]'s hash collisions).
    *
    * Spark-first shape, and why it scales:
    *  - the filter is built from the (benchmark-sized) eval side: kh
    *    positions per distinct gram, distinct-ed, packed into a DENSE
    *    ⌈m/64⌉-word bitset folded to ONE row (m bits ≈ m/8 bytes —
    *    constant). That row and the exact-set row reach the corpus as
    *    single-row broadcasts (BroadcastNestedLoopJoin on one row — the
    *    scalar-broadcast pattern of `dsir_weights`).
    *  - the probe is FULLY ROW-LOCAL and O(1) PER HASH: each document's
    *    distinct gram array is tested gram-by-gram with `forall` over
    *    the kh positions, each an indexed `element_at` word fetch + bit
    *    AND (Spark's own runtime bloom-join pushdown shape). The first
    *    cut kept the positions as a sorted array and probed with
    *    `array_contains` — a LINEAR scan of ~m entries per hash that
    *    cost 82 s at sf0.1 (1.2e10 comparisons); the bitset probe is
    *    the same values at ~m/64th the work. The training corpus is
    *    scanned once and NEVER shuffles — the plan above the scan is
    *    project → filter, no exchange.
    *  - the oracle is UNCHANGED by the encoding: bit-set-in-word ≡
    *    position-in-set, so DuckDB still replays the position family
    *    and set membership directly.
    *
    * Output: one row per contaminated-or-flagged training doc —
    * (id, n_grams, n_bloom, n_exact) with n_grams the distinct-gram
    * count, n_bloom the grams the filter flags, n_exact the grams truly
    * shared with the eval set. `n_bloom ≥ n_exact` always (no false
    * negatives — every true gram's positions are in the filter by
    * construction); the gap is the false-positive honesty metric, like
    * `kmv_est` vs `n_exact` and `ann_*_recall`. */
  private val pow2: Array[Long] = Array.tabulate(64)(i => 1L << i)

  /** Bit test against the dense word array: O(1) — one indexed word
    * fetch, one AND. `p` must be in [0, 64·|words|). */
  private def bitTest(words: Column, p: Column): Column = {
    val w = floor(p.cast("double") / lit(64.0)).cast("int")
    val b = pmod(p, lit(64L)).cast("int")
    element_at(words, w + lit(1))
      .bitwiseAND(element_at(lit(pow2), b + lit(1))) =!= lit(0L)
  }

  def bloomAudit(train: DataFrame, eval: DataFrame, n: Int, m: Int, kh: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(m >= 2 && kh >= 1, "need m >= 2 and kh >= 1")
    val nwords = (m + 63) / 64
    val evalGrams = wordNgrams(eval, n, textCol, idCol)
      .select(col("gram")).distinct()
    // positions → (word index, bit contribution) → OR-fold per word →
    // one row holding the dense ⌈m/64⌉-long bitset (absent words = 0)
    val bloom = broadcast(
      evalGrams.select(explode(bloomPositions(col("gram"), m, kh)).as("pos"))
        .distinct()
        .select(floor(col("pos").cast("double") / lit(64.0)).cast("long").as("w"),
          element_at(lit(pow2),
            (pmod(col("pos"), lit(64L)) + lit(1)).cast("int")).as("contrib"))
        .groupBy(col("w")).agg(expr("bit_or(contrib)").as("word"))
        .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("mp"))
        .select(transform(sequence(lit(0), lit(nwords - 1)),
          i => coalesce(element_at(col("mp"), i.cast("long")), lit(0L))).as("bloom")))
    // exact hits via the [[overlap]] broadcast join — NOT a per-row
    // array_intersect against a broadcast gram array: Spark rebuilds
    // the intersect hash set per ROW, which cost 12 s of forced compute
    // at sf0.1 (~5000 rows × a 6000-gram set). The overlap counts are
    // contamination-bounded, so they come back as a broadcast left
    // join; the corpus still never shuffles.
    val exact = overlap(train, eval, n, textCol, idCol)
      .withColumnRenamed("n_overlap", "n_exact")
    // spreadIfNarrow: ONLY when the train scan under-splits (a
    // one-row-group file is a single task) — the probe leg's tokenize +
    // k-hash bloom tests are the compute, and they ran serial on the
    // sf corpus. At production split counts this is a no-op and the
    // zero-shuffle claim above holds verbatim.
    graft.sources.Tables.spreadIfNarrow(
        train.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), gramsOfTokens(col("toks"), n).as("gs"))
      .crossJoin(bloom)
      .select(col(idCol),
        size(col("gs")).cast("long").as("n_grams"),
        size(filter(col("gs"), g =>
          forall(bloomPositions(g, m, kh),
            p => bitTest(col("bloom"), p)))).cast("long").as("n_bloom"))
      .filter(col("n_bloom") > 0)
      .join(broadcast(exact), Seq(idCol), "left")
      .select(col(idCol), col("n_grams"), col("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
  }
}
