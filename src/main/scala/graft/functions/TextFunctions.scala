package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-pipeline operators (north star:
  * dedup, quality scoring, language ID, fingerprinting).
  *
  * Everything here is a composition of codegen'd builtin expressions
  * (regexp/array/higher-order functions) — no UDFs, so whole-stage
  * codegen spans the full pipeline and the same logic is expressible in
  * the DuckDB oracle for value-level verification.
  *
  * Cross-engine determinism notes:
  *  - md5 hex (lowercase) is identical in Spark and DuckDB — it is the
  *    portable hash everywhere below (the reference's FNV-1a64,
  *    `src/cache/query_cache.cc:76-87`, is replaced rather than copied).
  *  - `hash32` folds the first 8 md5 nibbles into a long: all arithmetic
  *    is exact in double (< 2^32), so both engines agree bit-for-bit.
  */
object TextFunctions {

  /** Lowercase, collapse whitespace runs, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct tokens (first-occurrence order; only set semantics used). */
  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Word n-gram shingles over a token-array column (empty when the
    * input is shorter than n — Spark's `sequence(1, 0)` would count DOWN). */
  def wordShingles(tok: Column, n: Int): Column =
    when(size(tok) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tok) - (n - 1)),
        i => concat_ws(" ", slice(tok, i, lit(n)))))

  /** Character n-gram shingles of a string column. */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(c) - (n - 1)),
        i => substring(c, lit(i), lit(n))))

  /** MinHash signature: H independent hash families, family j being
    * md5("j:" ++ shingle); the signature element is the lexicographic min
    * hex digest. String-min is as valid as numeric-min for the MinHash
    * estimator and portable across engines. (H md5 calls per shingle —
    * prefer `minhashNumeric` over precomputed hash32s in hot paths.) */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingles, s => md5(concat(lit(s"$j:"), s))))
    }: _*)

  /** Numeric MinHash signature over PRECOMPUTED 32-bit shingle hashes:
    * family j is (a_j·h + b_j) mod p with a_j = 2j+1, b_j = j²+7,
    * p = 2^31-1. One md5 per shingle total; everything else is exact
    * BIGINT arithmetic (max a_j·h < 2^39), portable to the oracle. */
  def minhashNumeric(hashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(hashes,
        h => (h * lit(2L * j + 1) + lit(j.toLong * j + 7)) % lit(2147483647L)))
    }: _*)

  /** Native one-pass form of [[minhashNumeric]] (value-identical; the
    * codegen'd kernel computes all H family minima in a single loop —
    * see graft.expressions.MinHashFamilies for why this matters on
    * char-shingle inputs). */
  def minhashFamilies(hashes: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.MinHashFamilies(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashes),
        numHashes))

  /** DISTINCT hash32 values of all character n-grams in one native pass
    * — set-identical to `transform(array_distinct(charShingles(c, n)),
    * hash32)` without materializing shingle strings (the fused kernel
    * for char-level near-dup at scale; see
    * graft.expressions.NgramHashes). */
  def ngramHashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NgramHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), n))

  /** Order-independent fingerprint of a DISTINCT-element string-array
    * column — two independent xxhash64 streams XOR-folded plus the set
    * size (~128 bits: a cross-set collision needs a simultaneous
    * collision in both streams). Used as the internal dedup grouping key
    * for "identical shingle set": unlike md5(concat_ws(array_sort(sh)))
    * it needs no per-doc sort and no giant concat buffer, and XOR is
    * commutative so element order never matters. Internal only — never
    * oracle-visible (a rep collapse keyed on it is semantics-preserving
    * regardless of the key function). */
  def setFingerprint(arr: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.SetFingerprint(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr)))

  /** Builtin-composed spec form of [[setFingerprint]]. The aggregate()
    * HOFs are CodegenFallback — interpreted per element AND they split
    * the enclosing whole-stage-codegen span; spec/test use only. */
  def setFingerprintHof(arr: Column): Column =
    struct(
      aggregate(arr, lit(0L), (acc, s) => acc.bitwiseXOR(xxhash64(s))).as("f1"),
      aggregate(arr, lit(0L),
        (acc, s) => acc.bitwiseXOR(xxhash64(lit(0x9e3779b9L), s))).as("f2"),
      size(arr).as("n"))

  /** BPE-ish tokenizer pattern: space-prefixed letter runs, digit runs,
    * punctuation runs, whitespace runs — the GPT-2-style pre-tokenizer
    * shape without lookarounds, restricted to constructs Java regex and
    * RE2 (DuckDB) evaluate identically so the oracle can replicate it.
    * Whitespace is the EXPLICIT class [ \t\n\f\r], not \s: Java's \s
    * includes vertical tab U+000B while RE2's does not, so \s would
    * silently diverge on a document containing a VT. The oracle SQL
    * interpolates this constant — one definition, both engines. */
  val bpePattern: String =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\f\\r]+|[ \\t\\n\\f\\r]+"

  /** BPE-ish tokens of the RAW text (pre-tokenizer pieces). */
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(bpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Winnowing document fingerprint (rolling-hash selection): hash32 of
    * every char `k`-gram in POSITION order, then the minimum of each
    * sliding window of `w` consecutive hashes, distinct. Standard
    * winnowing guarantee: any match of length ≥ k+w−1 between two docs
    * shares a fingerprint. Texts shorter than k+w−1 contribute their
    * global minimum (one window); texts shorter than k fingerprint to
    * the empty set. Native one-pass kernel (monotonic-deque window min,
    * one md5 per gram); [[winnowFingerprintsHof]] is the builtin-composed
    * executable spec — O(len²) md5 calls, spec/test use only. */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k, w))

  /** Builtin-composed spec form of [[winnowFingerprints]]. WARNING: the
    * lambda body re-evaluates the whole `hs` subtree once per window —
    * quadratic in document length; never put this in a hot path. */
  def winnowFingerprintsHof(c: Column, k: Int, w: Int): Column = {
    val hs = transform(charShingles(c, k), (s: Column) => hash32(s))
    when(size(hs) === 0, array().cast("array<long>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
        i => array_min(slice(hs, i, lit(w))))))
  }

  /** Token-window chunks for training-data prep: fixed `chunkSize`-token
    * windows advancing by `chunkSize - overlap` tokens, as an
    * array-of-token-arrays. Chunk count = max(1, ⌈(ntok − overlap) /
    * stride⌉): every token lands in ≥ 1 chunk, the last chunk may run
    * short, a document shorter than one window is a single chunk.
    * Row-local (array HOFs inside the scan projection — no shuffle, no
    * UDF, the 100 TB shape); `posexplode` turns a document row into its
    * ordered chunk rows.
    *
    * `tok` must be a MATERIALIZED token-array column (project
    * `tokens(text)` first): expressions referenced inside an HOF lambda
    * are re-evaluated per element, so an inlined tokenizer would re-run
    * the full regexp normalization once per chunk — O(doc × chunks)
    * work per row (the recompute cliff recorded in SURVEY r7). */
  def chunkTokenArray(tok: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val n = greatest(
      ceil((size(tok) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    transform(sequence(lit(0), n - 1), i => slice(tok, i * stride + 1, lit(chunkSize)))
  }

  /** Convenience form of [[chunkTokenArray]] over raw text — fine for
    * interactive use on short documents, but it INLINES the tokenizer
    * into the chunk lambda (see the core form's warning): pipelines
    * must materialize `tokens(text)` as a column and use the array
    * form. */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int): Column =
    chunkTokenArray(tokens(text), chunkSize, overlap)

  /** Deterministic stratified-sampling predicate for training-data
    * mixing: keep a row iff the portable hash of (salt : id) falls
    * below its stratum's threshold out of `outOf` buckets; strata not
    * listed are kept whole. Row-local and reproducible across engines,
    * runs, and restarts (md5, no RNG state) — the sampling contract a
    * 100 TB mixing job needs: re-running any subset of partitions keeps
    * exactly the same rows, and the oracle can replay the decision. */
  def stratifiedKeep(stratum: Column, id: Column,
      thresholds: Map[String, Int], outOf: Int, salt: String): Column = {
    require(outOf > 0, "outOf must be positive")
    val bucket = pmod(hash32(concat(lit(s"$salt:"), id.cast("string"))), lit(outOf))
    thresholds.toSeq.sortBy(_._1).foldRight(lit(true)) {
      case ((name, keep), acc) => when(stratum === name, bucket < keep).otherwise(acc)
    }
  }

  /** Jaccard similarity of two DISTINCT-element array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Portable 32-bit hash: the first 8 nibbles of the md5 hex digest as
    * an integer (oracle: exact strpos/16^k fold — both land on the same
    * value < 2^32). Native kernel; [[hash32Hof]] is the builtin-composed
    * executable spec. */
  def hash32(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.Hash32(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  /** Builtin-composed form of [[hash32]] (hex substring + base parse). */
  def hash32Hof(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Portable 56-bit hash: the first 14 nibbles of the md5 hex digest.
    * 56 bits (not 64) so the value and the oracle's nibble-fold stay
    * exact in a SIGNED 64-bit BIGINT on both engines. Feeds the banded
    * SimHash dedup sketch. */
  def hash56(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.Hash56(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  /** Builtin-composed form of [[hash56]] (hex substring + base parse). */
  def hash56Hof(s: Column): Column =
    conv(substring(md5(s), 1, 14), 16, 10).cast("long")

  /** 32-bit SimHash from a precomputed token-hash array: per-bit majority
    * vote. Bit j of h is floor(h / 2^j) % 2 — exact in double for
    * h < 2^32, identical in the oracle. Callers should materialize the
    * hash array behind an exchange so the md5s are computed once, not
    * once per bit (see Dedup.simhashNearDups). */
  def simhash32FromHashes(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0.0),
      (acc, j) => acc + when(
        lit(2) * aggregate(hashes,
          lit(0L), (a, h) => a + floor(h / pow(lit(2.0), j)).cast("long") % 2) > size(hashes),
        pow(lit(2.0), j)).otherwise(lit(0.0))).cast("long")

  /** `bits`-wide SimHash from a precomputed token-hash array, built from
    * per-bit shift/mask builtins (exact at any width ≤ 62, unlike the
    * `floor(h / 2^j)` double form which loses bits past 2^53). The
    * executable spec for [[simhashNative]]; the bit loop unrolls at plan
    * build time. */
  def simhashBitsFromHashes(hashes: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(lit(2) * aggregate(hashes, lit(0L),
          (a, h) => a + shiftrightunsigned(h, j).bitwiseAND(lit(1L))) > size(hashes),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Native one-pass form of [[simhash32FromHashes]] /
    * [[simhashBitsFromHashes]] (value-identical; see
    * graft.expressions.SimHashBits — the HOF forms re-walk the hash
    * array once per bit). */
  def simhashNative(hashes: Column, bits: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.SimHashBits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashes), bits))

  def simhash32Native(hashes: Column): Column = simhashNative(hashes, 32)

  /** 32-bit SimHash over a token array (convenience form). */
  def simhash32(tok: Column): Column =
    simhash32FromHashes(transform(tok, (s: Column) => hash32(s)))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Stable content fingerprint of the normalized text. */
  def contentHash(c: Column): Column = md5(normText(c))

  /** Small per-language stopword lists for the n-gram/stopword language
    * heuristic. Deliberately tiny — a heuristic, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"))

  /** Fraction of distinct tokens that are stopwords of `lang`. */
  def stopwordRatio(tok: Column, lang: String): Column = {
    val sw = stopwords(lang)
    size(array_intersect(tok, array(sw.map(lit): _*))).cast("double") /
      greatest(size(tok), lit(1)).cast("double")
  }

  /** CJK-presence flag (the zh detector in the heuristic). */
  def hasCjk(c: Column): Column = c.rlike("[\\u4e00-\\u9fff]")

  /** Best-scoring language among the stopword lists, 'zh' on CJK text,
    * 'und' when nothing matches. */
  def langIdHeuristic(text: Column): Column = {
    val tok = array_distinct(split(trim(regexp_replace(lower(text), "\\s+", " ")), " "))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (l, _) =>
      struct(stopwordRatio(tok, l).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(hasCjk(text), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Character array of a string column: 1-based substring per
    * position. Callers MUST pass a MATERIALIZED (projected) string
    * column and should project the RESULT before lambdas reference it
    * repeatedly (the round-7 inline-HOF recompute trap). */
  def charsOf(s: Column): Column =
    when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)), i => substring(s, i, lit(1))))

  /** Character-unigram Shannon entropy (nats), ×1e6 integer-quantized
    * PER TERM before the sum — Σ_c round(−(p_c·ln p_c)·1e6) as a LONG —
    * so the cross-engine compare is exact integer math (the BM25 move;
    * each term is a deterministic double function of two integers).
    * Low entropy flags repetitive/garbage text, high entropy flags
    * random noise — the cheap perplexity proxy in quality pipelines.
    * Row-local: no shuffle, O(distinct-chars × len) per row. `chars`
    * must be a MATERIALIZED array column ([[charsOf]] + projection). */
  def charEntropyQ(chars: Column): Column = {
    val n = size(chars)
    when(n === 0, lit(0L)).otherwise(
      aggregate(
        transform(array_distinct(chars), c => {
          val p = size(filter(chars, x => x === c)).cast("double") / n
          round(-(p * log(p)) * 1e6).cast("long")
        }),
        lit(0L), (acc, x) => acc + x))
  }

  /** Native codegen form of [[charEntropyQ]] over the normalized STRING
    * (no char-array materialization; one code-point pass per row).
    * Value-identical — differential-tested in TextFunctionsSpec. */
  def charEntropyNative(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.CharEntropyQ(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  /** Quality score in [0,1]: blend of length, type-token ratio, and
    * alpha-character ratio — the standard cheap pre-filter shape for
    * training-data pipelines. */
  def qualityScore(text: Column): Column = {
    val tok = tokens(text)
    val lenScore = least(length(normText(text)).cast("double") / 200.0, lit(1.0))
    val ttr = size(array_distinct(tok)).cast("double") / greatest(size(tok), lit(1))
    val alphaRatio = (length(regexp_replace(normText(text), "[^a-z ]", "")).cast("double")
      / greatest(length(normText(text)), lit(1)))
    round((lenScore + ttr + alphaRatio) / 3.0, 6)
  }
}
