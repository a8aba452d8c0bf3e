package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** LLM-training-data pipeline operators over `documents` (north star):
  * exact dedup, MinHash+LSH near-dup, SimHash near-dup, char-ngram
  * Jaccard, text statistics / quality scoring, language profiling, and
  * corpus term frequencies. Every query is value-checked against DuckDB
  * running the SAME algorithm (portable md5-based hashing throughout).
  */
object TextQueries extends QueryPack {

  // ---- shared DuckDB fragments (mirror graft.functions.TextFunctions) ----

  /** normalized text */
  private[queries] val dNorm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  /** distinct whitespace tokens of normalized text */
  private val dTok = s"list_distinct(string_split($dNorm, ' '))"
  /** exact jaccard of two distinct-lists */
  private def dJac(a: String, b: String): String =
    s"(len(list_filter($a, x -> list_contains($b, x))) * 1.0 / " +
      s"(len($a) + len($b) - len(list_filter($a, x -> list_contains($b, x)))))"
  import graft.queries.DuckSql.dHash32

  /** hash56: first 14 md5 nibbles as integer. The fold stays in BIGINT —
    * a double-arithmetic sum would round past 2^53. */
  private def dHash56(s: String): String =
    s"CAST(list_sum(list_transform(range(1,15), i -> " +
      s"CAST(strpos('0123456789abcdef', md5($s)[i:i]) - 1 AS BIGINT) * " +
      s"CAST(16^(14-i) AS BIGINT))) AS BIGINT)"

  /** One unrolled BPE round (mirrors Bpe.pairCounts/applyMerge): from
    * vocabulary CTE `vin(w, cnt, syms)`, produce `b$i` (the argmax
    * merge) and `v$i` (the merged vocabulary). Greedy non-overlapping
    * application via match islands + offset parity — the Bpe scaladoc
    * argument. v/b are MATERIALIZED: each feeds two consumers and
    * DuckDB 1.0 re-inlines plain CTEs per reference (r9 lesson). */
  private def dBpeRound(i: Int, vin: String): String =
    s"""p$i AS (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT syms[j] AS a, syms[j + 1] AS b, cnt FROM (
       |      SELECT w, cnt, syms, unnest(range(1, len(syms))) AS j FROM $vin))
       |  GROUP BY a, b
       |), b$i AS MATERIALIZED (
       |  SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1
       |), x$i AS (
       |  SELECT w, cnt, syms, unnest(range(1, len(syms) + 1)) AS j FROM $vin
       |), e$i AS (
       |  SELECT x.w, x.cnt, x.j, x.syms[x.j] AS sym,
       |    (x.j < len(x.syms) AND x.syms[x.j] = bb.a
       |      AND x.syms[x.j + 1] = bb.b) AS ism,
       |    bb.b AS bsym
       |  FROM x$i x CROSS JOIN b$i bb
       |), k$i AS (
       |  SELECT w, cnt, j, sym, bsym,
       |    (ism AND (j - min(j) OVER (PARTITION BY w, ism, isl)) % 2 = 0)
       |      AS keepm
       |  FROM (SELECT *,
       |          j - row_number() OVER (PARTITION BY w, ism ORDER BY j) AS isl
       |        FROM e$i)
       |), v$i AS MATERIALIZED (
       |  SELECT w, cnt,
       |    list(CASE WHEN keepm THEN sym || bsym ELSE sym END ORDER BY j)
       |      AS syms
       |  FROM (SELECT *,
       |          lag(keepm, 1, FALSE) OVER (PARTITION BY w ORDER BY j) AS pk
       |        FROM k$i)
       |  WHERE NOT pk GROUP BY w, cnt
       |)""".stripMargin

  /** Bigram-LM CTE prefix (mirrors NgramLm.bigramNll): ends in
    * `d(doc_id, n_bigrams, nll_q)`. Shared by quality_bigram and
    * quality_band. */
  private val dBigramCtes: String =
    s"""t AS (
       |  SELECT doc_id, string_split($dNorm, ' ') AS tk FROM documents
       |), bg AS (
       |  SELECT doc_id, array_to_string(tk[si:si+1], ' ') AS g, tk[si] AS a
       |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS si
       |        FROM t WHERE len(tk) >= 2)
       |), c2 AS (
       |  SELECT g, a, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY g, a
       |), c1 AS (
       |  SELECT a, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY a
       |), v AS (
       |  SELECT CAST(count(DISTINCT tkn) AS BIGINT) AS vsz FROM (
       |    SELECT unnest(string_split($dNorm, ' ')) AS tkn FROM documents)
       |), w AS (
       |  SELECT c2.g,
       |    CAST(round(-ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + vsz AS DOUBLE))
       |      * 1e6) AS BIGINT) AS wq
       |  FROM c2 JOIN c1 USING (a) CROSS JOIN v
       |), d AS (
       |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(wq) AS BIGINT) AS nll_q
       |  FROM bg JOIN w USING (g) GROUP BY bg.doc_id
       |)""".stripMargin

  /** Numeric minhash LSH pipeline fragment (mirrors Dedup.minhashNearDups
    * hash family): shingle hash32s → H families (a_j·h+b_j mod p) →
    * r-row band buckets → candidate pairs → exact-jaccard verify. */
  private def dMinhashPipeline(shingleExpr: String, numHashes: Int, bands: Int,
      threshold: Double, source: String = "documents"): String = {
    val r = numHashes / bands
    val estFloor = math.max(0.0, threshold - 0.15)
    val bucket = (0 until r).map(k => s"CAST(sg[$r*b+${k + 1}] AS VARCHAR)")
      .mkString(" || ':' || ")
    s"""WITH t AS (
       |  SELECT doc_id, $shingleExpr AS sh FROM $source
       |), hsh AS (
       |  SELECT doc_id, list_transform(sh, s -> ${dHash32("s")}) AS hs FROM t
       |), sig AS (
       |  SELECT doc_id, list_distinct(hs) AS hsd, list_transform(range(0,$numHashes), j ->
       |    list_min(list_transform(hs, x -> (x * (2*j+1) + (j*j+7)) % 2147483647))) AS sg
       |  FROM hsh
       |), bands AS (
       |  SELECT doc_id, b, md5($bucket) AS bucket
       |  FROM sig, (SELECT unnest(range(0,$bands)) AS b) u
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
       |  FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket
       |                            AND a.doc_id < c.doc_id
       |), est AS (
       |  SELECT id1, id2, x.hsd AS h1, y.hsd AS h2,
       |    list_sum(list_transform(range(1,${numHashes + 1}), i ->
       |      CASE WHEN x.sg[i] = y.sg[i] THEN 1 ELSE 0 END)) * 1.0 / $numHashes AS est
       |  FROM cand JOIN sig x ON x.doc_id = id1 JOIN sig y ON y.doc_id = id2
       |)
       |SELECT id1, id2, round(${dJac("h1", "h2")}, 6) AS jaccard
       |FROM est
       |WHERE est >= $estFloor AND ${dJac("h1", "h2")} >= $threshold
       |ORDER BY id1, id2""".stripMargin
  }

  /** Incremental-probe ground truth: [[dMinhashPipeline]]'s pair set
    * restricted to (corpus = doc_id%10 < 8, batch = doc_id%10 >= 8)
    * cross pairs, keyed (new_id, corpus_id). Same family, bands, est
    * floor and exact verify — the probe operator must find exactly
    * these. */
  private def dIncrementalPipeline(shingleExpr: String, numHashes: Int,
      bands: Int, threshold: Double): String = {
    val r = numHashes / bands
    val estFloor = math.max(0.0, threshold - 0.15)
    val bucket = (0 until r).map(k => s"CAST(sg[$r*b+${k + 1}] AS VARCHAR)")
      .mkString(" || ':' || ")
    s"""WITH t AS (
       |  SELECT doc_id, $shingleExpr AS sh FROM documents
       |), hsh AS (
       |  SELECT doc_id, list_transform(sh, s -> ${dHash32("s")}) AS hs FROM t
       |), sig AS (
       |  SELECT doc_id, list_distinct(hs) AS hsd, list_transform(range(0,$numHashes), j ->
       |    list_min(list_transform(hs, x -> (x * (2*j+1) + (j*j+7)) % 2147483647))) AS sg
       |  FROM hsh
       |), bands AS (
       |  SELECT doc_id, b, md5($bucket) AS bucket
       |  FROM sig, (SELECT unnest(range(0,$bands)) AS b) u
       |), cand AS (
       |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
       |  FROM bands c JOIN bands n ON c.b = n.b AND c.bucket = n.bucket
       |  WHERE c.doc_id % 10 < 8 AND n.doc_id % 10 >= 8
       |), est AS (
       |  SELECT new_id, corpus_id, x.hsd AS h1, y.hsd AS h2,
       |    list_sum(list_transform(range(1,${numHashes + 1}), i ->
       |      CASE WHEN x.sg[i] = y.sg[i] THEN 1 ELSE 0 END)) * 1.0 / $numHashes AS est
       |  FROM cand JOIN sig x ON x.doc_id = corpus_id JOIN sig y ON y.doc_id = new_id
       |)
       |SELECT new_id, corpus_id, round(${dJac("h1", "h2")}, 6) AS jaccard
       |FROM est
       |WHERE est >= $estFloor AND ${dJac("h1", "h2")} >= $threshold
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  /** SimHash near-dup pairs — the FULL QUADRATIC ground truth, no
    * blocking. The engine's pigeonhole multi-band candidates
    * (Dedup.simhashNearDups) are provably recall-complete, so its output
    * must equal this exactly — the oracle no longer mirrors the blocking
    * scheme, it checks recall itself. 56-bit sketch; every fold stays in
    * BIGINT (integer `//` division, CAST 2^j — double arithmetic would
    * round past 2^53). No final ORDER BY — shared by the dedup_simhash
    * oracle and the dedup_cc recursive closure. */
  private val dSimhashPairs: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($dTok, s -> ${dHash56("s")}) AS hs
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(range(0,56), j ->
       |    CASE WHEN 2 * list_sum(list_transform(hs, h ->
       |           (h // CAST(2^j AS BIGINT)) % 2)) > len(hs)
       |         THEN CAST(2^j AS BIGINT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
       |  FROM t
       |)
       |SELECT a.doc_id AS id1, c.doc_id AS id2,
       |       CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.simhash, c.simhash)) <= 6""".stripMargin

  /** Sample-quadratic LSH ground truth shared by dedup_minhash_recall /
    * dedup_minhash_tradeoff: the deterministic 1/10 sample and its
    * PERSISTED set of exact-Jaccard >= 0.8 pairs over hash32'd distinct
    * token sets (int intersects keep the quadratic cheap; a collision
    * merges tokens identically in both engines). ONE definition so both
    * honesty metrics measure the same truth set. */
  private def lshTruth(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val sample = Tables.documents(s, dir).filter($"doc_id" % 10 === 0)
    val ts = sample.select($"doc_id",
      array_distinct(
        transform(array_distinct(tokens($"text")), t => hash32(t))).as("ts"))
    val pairs = ts.select($"doc_id".as("id1"), $"ts".as("t1"))
      .crossJoin(broadcast(ts.select($"doc_id".as("id2"), $"ts".as("t2"))))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2",
        size(array_intersect($"t1", $"t2")).cast("long").as("i"),
        size($"t1").cast("long").as("s1"), size($"t2").cast("long").as("s2"))
    val truth = pairs
      .filter($"i".cast("double") / ($"s1" + $"s2" - $"i").cast("double") >= 0.8)
      .select($"id1", $"id2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (sample, truth)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: hash-groupBy on the content digest (one shuffle on a
    // 16-byte key — the only thing that moves at 100 TB).
    "dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Dedup.exact(Tables.documents(s, dir))
        .select($"doc_id", $"content_hash", $"n_copies")
        .orderBy($"doc_id")
    }),

    // MinHash(12) + LSH(4 bands × 3) candidates + exact-jaccard verify.
    "dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashNearDups(Tables.documents(s, dir),
          shingleN = 1, numHashes = 12, bands = 4, threshold = 0.8)
        .select($"id1", $"id2", round($"jaccard", 6).as("jaccard"))
        .orderBy($"id1", $"id2")
    }),

    // Incremental ingest dedup: corpus (doc_id%10 < 8) indexed ONCE
    // (Dedup.minhashIndex — the persisted frame stands in for the
    // production on-disk index), new batch (doc_id%10 >= 8) PROBES it —
    // batch bands broadcast against the index scan, no corpus
    // self-join. Same hash family/bands/est-gate as dedup_minhash, so
    // the output equals the full pipeline's cross pairs (the oracle
    // computes exactly that restriction).
    "dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // the CORPUS index is the standing on-disk structure of the
      // ingest shape (minhashIndex scaladoc: built once per corpus,
      // probed by each arriving batch) — session-memoized like every
      // other deterministic index build, behind an explicit width (the
      // AQE-freeze lesson). The BATCH index is the arriving data: built
      // per pass, never memoized.
      val corpusPlan = Dedup.minhashIndex(docs.filter($"doc_id" % 10 < 8))
      // disabled-path fallback mirrors Dedup.repIndex (ADVICE r16):
      // incrementalNearDups consumes the corpus index twice (band table
      // + verify join), so with the session cache off it must still be
      // persisted + eagerly materialized or each pass rebuilds it twice.
      val corpus =
        if (graft.util.IndexCache.enabled)
          graft.util.IndexCache.frame(
            corpusPlan, Seq("minhash-corpus-index"))(
            Tables.spreadToWidth(corpusPlan))
        else {
          val c = corpusPlan.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          c.count()
          c
        }
      val batch = Dedup.minhashIndex(docs.filter($"doc_id" % 10 >= 8))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.incrementalNearDups(corpus, batch, numHashes = 12, bands = 4,
          threshold = 0.8)
        .select($"new_id", $"corpus_id", round($"jaccard", 6).as("jaccard"))
        .orderBy($"new_id", $"corpus_id")
    }),

    // SimHash(56-bit) near-dups: 7 disjoint 8-bit pigeonhole bands give
    // guaranteed recall at hamming ≤ 6 — the oracle is the full
    // quadratic self-join, NOT a mirror of the blocking.
    "dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashNearDups(Tables.documents(s, dir), maxHamming = 6)
        .orderBy($"id1", $"id2")
    }),

    // Char-4-gram near-dups via MinHash LSH (48 hashes, 16 bands × 3):
    // the scalable form — candidates come from an equi-join on band
    // buckets, never from a quadratic block compare. Recall at j=0.55 is
    // ~0.95 by the banding curve; the oracle replicates the identical
    // hash family, so the result is still value-checked.
    "dedup_ngram" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashNearDups(Tables.documents(s, dir),
          numHashes = 48, bands = 16, threshold = 0.55,
          hashedShingler = c => ngramHashes(c, 4),
          // est-selective profile: 4.5 M distinct candidates, ~250
          // survivors at sf0.1 — dedupe survivors, not candidates
          earlyCandidateDistinct = false)
        .select($"id1", $"id2", round($"jaccard", 6).as("jaccard"))
        .orderBy($"id1", $"id2")
    }),

    // Character-unigram entropy (the cheap perplexity proxy): ×1e6
    // integer-quantized per-char terms summed as exact longs — low
    // flags repetitive/garbage docs, high flags random noise. chars is
    // a MATERIALIZED column (round-7 inline-HOF trap).
    "quality_entropy" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Quality.charEntropy(Tables.documents(s, dir))
        .orderBy($"doc_id")
    }),

    // Cross-source leakage matrix (governance): how many duplicate doc
    // pairs straddle each pair of sources, keyed on the sorted
    // distinct-token SET fingerprint (the containment rep key — this
    // corpus's templated dups differ in token order/multiplicity, so
    // the exact content hash never straddles). Counted at the
    // (set-hash, source) level — c_a·c_b per cluster — so cluster
    // membership never expands quadratically (a 1 M-member boilerplate
    // cluster contributes ≤ sources² rows, not 10^12 pairs).
    "source_leakage" -> ((s, dir) => {
      import s.implicits._
      val g = Tables.documents(s, dir)
        .select($"source",
          md5(concat_ws(" ", array_sort(array_distinct(tokens($"text")))))
            .as("ch"))
        .groupBy($"ch", $"source").agg(count(lit(1)).as("c"))
      g.as("a").join(g.as("b"),
          col("a.ch") === col("b.ch") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
        .agg(sum(col("a.c") * col("b.c")).as("n_pairs"))
        .orderBy($"src1", $"src2")
    }),

    // Quality-aware dedup survivor: production pipelines keep the BEST
    // copy per near-dup group, not the lowest id. Components from the
    // simhash closure, ranked by char-entropy (desc, id tiebreak) —
    // one partition-local window per component.
    "dedup_keep_quality" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val comp = Dedup.simhashComponents(docs)
      val ent = graft.operators.Quality.charEntropy(docs)
      val w = Window.partitionBy($"component")
        .orderBy($"entropy_q".desc, $"doc_id")
      // explicit width before the window (Tables.sessionWidth
      // rationale): the joined frame is byte-light, so AQE coalesces
      // the window exchange to ~1 task. A user hash-repartition ON THE
      // WINDOW KEY satisfies the window's clustered distribution (no
      // second exchange) and is exempt from AQE coalescing.
      comp.join(ent, "doc_id")
        .repartition(Tables.sessionWidth(s), $"component")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy($"component")))
        .filter($"rn" === 1)
        .select($"component", $"doc_id".as("kept_id"), $"entropy_q",
          $"n_members")
        .orderBy($"component")
    }),

    // Containment (doc-in-doc) pairs: directional overlap
    // |A∩B| / min(|A|,|B|) over distinct-token hash sets — catches a
    // document quoting/embedding another even when symmetric Jaccard is
    // diluted. Same MinHash banding as dedup_minhash for candidates;
    // the oracle replays the identical pipeline.
    // Deterministic holdout split (train/val/test = 98/1/1): the split
    // is a pure function of the id hash, so it is reproducible across
    // runs, clusters, and engines — the standard leakage-safe practice
    // (never sample by position). Row-local, zero shuffle.
    "split_assign" -> ((s, dir) => {
      import s.implicits._
      val b = pmod(hash32($"doc_id".cast("string")), lit(100L))
      Tables.documents(s, dir)
        .select($"doc_id", b.as("bucket"),
          when(b < 98, "train").when(b === 98, "val").otherwise("test")
            .as("split"))
        .orderBy($"doc_id")
    }),

    // Vocabulary coverage (tokenizer prep): build the top-16 corpus
    // vocabulary (count desc, token asc — a total order, so the cut is
    // deterministic), then per-doc OOV occurrence rate against it.
    // Vocab is bounded by V, so it broadcasts; one exact division at
    // the end, ×1e6-quantized.
    "vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val tok = Tables.documents(s, dir)
        .select($"doc_id", explode(tokens($"text")).as("t"))
      val vocab = tok.groupBy($"t").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"t").limit(16)
        .select($"t", lit(1L).as("in_v"))
      tok.join(broadcast(vocab), Seq("t"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"in_v".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"doc_id", $"n_tokens", $"n_oov",
          round($"n_oov".cast("double") / $"n_tokens".cast("double") * lit(1e6))
            .cast("long").as("oov_q"))
        .orderBy($"doc_id")
    }),

    // KMV distinct-cardinality sketch (the deterministic stand-in for
    // HLL at 100 TB): per-source exact distinct bigram count next to
    // the k=64-minimum-values estimate — bounded-state BottomK partial
    // agg, estimate = 63·2³²/h₍₆₄₎ from exact integers. Shingled frame
    // persisted before the generator (the explode re-derivation trap).
    "distinct_kmv" -> ((s, dir) => {
      import s.implicits._
      // tokens materialized in their own projection: inlining them into
      // wordShingles' lambda re-splits the text per output gram
      // (observed 4.3 s of the query's 4.5 s at sf0.1; the round-7 HOF
      // convention, ProfileKmv attribution)
      val sh = Tables.documents(s, dir)
        .select($"source", tokens($"text").as("tk"))
        .select($"source", wordShingles($"tk", 2).as("gs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.Sketch.kmvDistinct(
          sh.select($"source", explode($"gs").as("g")), "source", "g", k = 64)
        .orderBy($"source")
    }),

    // BPE merge learning (Sennrich 2016) — tokenizer TRAINING as a
    // distributed operator: 3 rounds of {corpus-wide adjacent-pair
    // counts over the vocabulary → argmax merge → windowed greedy
    // application}. Each round's winner depends on every previous
    // round's application, so the 3-row merge table value-checks the
    // whole iterative loop. token_bpe remains the apply-side segmenter.
    "bpe_learn" -> ((s, dir) => {
      import s.implicits._
      val v = graft.operators.Bpe.vocab(
        Tables.documents(s, dir), tokens($"text"))
      graft.operators.Bpe.learnedMerges(s, v, rounds = 3)
        .orderBy($"round")
    }),

    // EXACT Jaccard similarity self-join (prefix filtering, WWW 2007)
    // over trigram sets — the recall-1.0-by-construction complement of
    // the banded MinHash join: rarest-first prefixes generate a
    // complete candidate set, exact intersection verifies, integer
    // threshold test, no float and no probability anywhere.
    "setjoin_jaccard" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.wordShingles
      // tokens materialized behind a barrier BEFORE the shingle lambda
      // (the recurring inlined-HOF trap: slice(tokensExpr) inside the
      // transform re-splits the text per shingle — 10.8 s of the
      // query's 21 s at sf0.1 before this persist). The repartition
      // spreads tokenize/shingle work past the few-split source (the
      // minhash keyed convention): without it the one-file corpus pins
      // the persisted frame — and every downstream scan of it — to ONE
      // task (measured: the whole join ran as ~750 ms single-task
      // stages, parallelism 3 on 32 cores)
      val tk = Tables.documents(s, dir)
        .repartition($"doc_id")
        .select($"doc_id", tokens($"text").as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sets = tk.select($"doc_id".as("id"),
        array_distinct(wordShingles($"tok", 3)).as("tk"))
      graft.operators.SetJoin.jaccardPairs(sets, num = 3, den = 5)
        .orderBy($"id1", $"id2")
    }),

    // The apply side of bpe_learn: the 20 most frequent words with
    // their subword segmentation after the three learned merges —
    // value-checks the merged VOCABULARY (bpe_learn checks the merge
    // choices; this checks what they did to every word).
    "bpe_segment" -> ((s, dir) => {
      import s.implicits._
      val v = graft.operators.Bpe.vocab(
        Tables.documents(s, dir), tokens($"text"))
      val (_, fin) = graft.operators.Bpe.learn(s, v, rounds = 3)
      fin.select($"w", $"cnt", concat_ws(" ", $"syms").as("pieces"))
        .orderBy($"cnt".desc, $"w").limit(20)
    }),

    // HyperLogLog distinct sketch (the CONSTANT-state sibling of
    // distinct_kmv): 64 max-merged integer registers per event type
    // over portable-hash56 ranks — no float log anywhere; the one
    // float op is the final exact-input division. Estimate lands
    // within HLL's ~13% band (m=64) of the exact count the output
    // carries alongside, honesty-metric style.
    "distinct_hll" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sketch.hllDistinct(
          Tables.events(s, dir).select($"event_type",
            $"event_id".cast("string").as("v")),
          "event_type", "v")
        .orderBy($"event_type")
    }),

    // The property that makes a sketch a 100 TB object, DEMONSTRATED:
    // HLL registers merge by max — per-event-type register tables
    // max-merged across groups equal the registers computed directly
    // over the whole corpus, register by register (max is associative/
    // commutative/idempotent, so ANY partitioning of the data merges to
    // the same 64 integers). This is why per-partition sketch state
    // needs no re-scan on combine.
    "distinct_hll_merge" -> ((s, dir) => {
      import s.implicits._
      val pairs = Tables.events(s, dir)
        .select($"event_type", $"event_id".cast("string").as("v"))
      val merged = graft.operators.Sketch.hllRegisters(pairs, "event_type", "v")
        .groupBy($"idx").agg(max($"mr").cast("long").as("mr_merged"))
      val direct = graft.operators.Sketch.hllRegisters(
          pairs.select(lit("all").as("g"), $"v"), "g", "v")
        .select($"idx", $"mr".cast("long").as("mr_direct"))
      merged.join(direct, "idx")
        .select($"idx", $"mr_merged", $"mr_direct",
          ($"mr_merged" === $"mr_direct").as("merged_equals_direct"))
        .orderBy($"idx")
    }),

    // Count-min sketch heavy-hitter counts: 4×256 integer cells (the
    // bounded-state frequency table vs a full vocab shuffle), probed
    // for the exact top-16 tokens — estimate ≥ exact by construction,
    // equal when the row is collision-free. All-integer, bit-exact.
    "cms_est" -> ((s, dir) => {
      import s.implicits._
      val tok = Tables.documents(s, dir).select(explode(tokens($"text")).as("t"))
      val exact = tok.groupBy($"t").agg(count(lit(1)).as("n_exact"))
        .orderBy($"n_exact".desc, $"t").limit(16)
      val cms = graft.operators.Sketch.cmsTable(tok, "t")
      graft.operators.Sketch.cmsEstimate(cms, exact, "t")
        .orderBy($"t")
    }),

    // Corpus-trained bigram LM NLL (the KenLM-style quality band):
    // Laplace-smoothed p(b|a), per-bigram terms ×1e6-quantized → exact
    // BIGINT doc sums. Low mean = repetitive template, high = garbage.
    "quality_bigram" -> ((s, dir) => {
      import s.implicits._
      graft.operators.NgramLm.bigramNll(Tables.documents(s, dir))
        .orderBy($"doc_id")
    }),

    // Percentile band filter on the bigram-LM score: drop the most
    // repetitive 10% AND the most garbage 10%, keep the middle band —
    // the two-sided CCNet-style cut. EXACT percentiles over the
    // quantized scores (the agg state is bounded by DISTINCT score
    // values, which quantization bounds — scale-safe where raw doubles
    // would not be); the band bounds broadcast as one row.
    "quality_band" -> ((s, dir) => {
      import s.implicits._
      // pinned via IndexCache (r20, VERDICT r19 next #9): `scored` feeds
      // TWO consumers (the percentile-bounds agg and the band filter)
      // and Spark reuses exchanges, not arbitrary common subtrees —
      // without the pin the entire bigram-LM score DAG (three shuffled
      // aggs + two joins) executes twice per pass. The r19 bare
      // .persist leaked one pinned copy per invocation in a long-lived
      // session; IndexCache owns the pin (one entry per (input, params),
      // liveness-checked, bounded), exactly like the dedup rep-index
      // frames — per-doc quality scores ARE a persistable index
      // artifact of the corpus (the quality-annotation column every
      // LLM-data pipeline materializes before filtering).
      val scored = graft.util.IndexCache.frame(
        Tables.documents(s, dir), Seq("qualityBandScored")) {
        graft.operators.NgramLm.bigramNll(Tables.documents(s, dir))
          .select($"doc_id", $"mean_nll_q")
      }
      val bounds = scored.agg(
        expr("percentile(mean_nll_q, 0.1)").as("lo"),
        expr("percentile(mean_nll_q, 0.9)").as("hi"))
      scored.crossJoin(broadcast(bounds))
        .filter($"mean_nll_q" >= $"lo" && $"mean_nll_q" <= $"hi")
        .select($"doc_id", $"mean_nll_q")
        .orderBy($"doc_id")
    }),

    // Domain-mixture weights (governance): per-source corpus shares →
    // temperature-scaled (α = 0.5, i.e. sqrt) sampling weights, the
    // multilingual-LM mixing scheme (XLM-R, arXiv:1911.02116 §3). The
    // sqrt terms are ×1e6-quantized BEFORE the normalizing sum so the
    // denominator is an exact BIGINT — no order-sensitive double fold.
    "domain_mix" -> ((s, dir) => {
      import s.implicits._
      // pinned via IndexCache (r20, VERDICT r19 next #9): `q` feeds both
      // the normalizing-sum agg and the final projection — without the
      // pin the corpus-wide tokenCount scan runs twice per pass (the
      // quality_band double-execution shape). The r19 bare .persist
      // leaked one pinned copy per invocation; IndexCache owns the pin
      // (the frame is one row per source — per-source corpus stats, a
      // governance artifact any pipeline persists).
      val q = graft.util.IndexCache.frame(
        Tables.documents(s, dir), Seq("domainMixStats")) {
        Tables.documents(s, dir)
          .select($"source", tokenCount($"text").as("nt"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"))
          .withColumn("wq",
            round(sqrt($"n_tokens".cast("double")) * lit(1e6)).cast("long"))
      }
      val tot = q.agg(sum($"wq").as("twq"))
      q.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"n_tokens",
          round($"wq".cast("double") / $"twq".cast("double") * lit(1e9))
            .cast("long").as("weight_q"))
        .orderBy($"source")
    }),

    // DSIR-style importance score of every doc against the lang='en'
    // target slice: hashed-unigram log-likelihood ratio, per-term
    // ×1e6-quantized → exact BIGINT doc sums (order-insensitive).
    "dsir_weights" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dsir.importanceWeights(
          Tables.documents(s, dir), isTarget = $"lang" === "en")
        .orderBy($"doc_id")
    }),

    // Sequence-packing manifest (concatenate-and-cut batch prep):
    // global token offset of every doc in id order and the 512-token
    // pack range it lands in. Distributed prefix scan — partition-local
    // windows + a bounded per-partition offset broadcast; all-BIGINT
    // arithmetic, so the compare is exact.
    "pack_manifest" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Packing.manifest(Tables.documents(s, dir), capacity = 512)
        .orderBy($"doc_id")
    }),

    // Curriculum ordering: round-robin interleave of per-source quality
    // rankings (score = quantized char entropy) — round r takes each
    // source's r-th best doc. The global position is ARITHMETIC (per-
    // source size table broadcast + re-agg), not a single-partition
    // window — see Packing.curriculumOrder; the window form is the
    // differential spec and the oracle.
    "curriculum_order" -> ((s, dir) => {
      import s.implicits._
      val scored = Tables.documents(s, dir)
        .select($"doc_id", $"source",
          charEntropyNative(normText($"text")).as("score"))
      graft.operators.Packing.curriculumOrder(scored, "score")
        .orderBy($"pos")
    }),

    // Duplicated-SPAN detection (substring-level dedup): maximal runs
    // of token 8-gram starts whose gram occurs ≥2× corpus-wide — the
    // positional-k-gram rendition of the suffix-array repeated-substring
    // pass. Span boundaries are exact at k-token resolution; the oracle
    // replays grams, frequency, and the island merge.
    "dedup_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.duplicatedSpans(Tables.documents(s, dir), k = 8, minCount = 2)
        .orderBy($"doc_id", $"span_start")
    }),

    // EXACT containment (VERDICT r14 next #2, upgraded past its own
    // ask): recall 1.0 by CONSTRUCTION, where banding is inherently
    // leaky at the Jaccard boundary (the r15 corpus carries 2.5 M true
    // pairs, much of it boundary-J boilerplate: measured sample recall
    // 88% for the 4×3-stratified config, 98–100% per-hash —
    // dedup_containment_recall/tradeoff keep those curves). Execution
    // is regime-gated on the GLOBAL vocabulary (result-identical,
    // ContainmentSpec pins all three): boilerplate-dense small-vocab
    // corpora (this one: 31 distinct tokens, true-pair mass ≈ a third
    // of all rep pairs — no filter can prune below output size) pack
    // token sets into longs and verify every pair via bit_count(a&b)
    // under a broadcast nested loop (19.4 → 2.8 s isolated at sf0.1);
    // large vocabularies take the prefix-filter candidate join — the
    // smaller set's rare-first prefix probed against full posting
    // lists (Bayardo WWW'07) — with array-intersection verify. The
    // oracle is plain ground truth, no banding or regime replay.
    "dedup_containment" -> ((s, dir) => {
      import s.implicits._
      Dedup.containmentPairsExact(Tables.documents(s, dir))
        .orderBy($"id1", $"id2")
    }),

    // CONTAINMENT recall honesty (the dedup_minhash_recall pattern, on
    // the same 1/10 sample): truth = ALL pairs with exact containment
    // |A∩B|/min ≥ 0.9 over hash32'd token sets (sample-bounded
    // quadratic); variants = the full containment pipeline under the
    // retired symmetric (4 bands × 3 rows) banding vs the shipped
    // per-hash (12 × 1) banding. Jaccard-calibrated bands lose
    // size-asymmetric high-containment pairs (C=0.9 at size ratio ρ ⇒
    // J ≥ 0.9/(1+ρ−0.9)); the r=1 form is calibrated for containment:
    // measured 54.7% → 100% recall here (64.5% → 99.8% at sf0.1).
    "dedup_containment_recall" -> ((s, dir) => {
      import s.implicits._
      val sample = Tables.documents(s, dir).filter($"doc_id" % 10 === 0)
      val ts = sample.select($"doc_id",
        array_distinct(
          transform(array_distinct(tokens($"text")), t => hash32(t))).as("ts"))
      val truth = ts.select($"doc_id".as("id1"), $"ts".as("t1"))
        .crossJoin(broadcast(ts.select($"doc_id".as("id2"), $"ts".as("t2"))))
        .filter($"id1" < $"id2")
        .filter(size(array_intersect($"t1", $"t2")).cast("double") /
          least(size($"t1"), size($"t2")).cast("double") >= 0.9)
        .select($"id1", $"id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one 12-hash prep + ONE tagged verify/expansion plan for both
      // banding configs (the per-variant flow ran containmentPairsBanded
      // twice — two preps, two pipelines, three broadcast-agg crossjoins
      // each: 58 jobs, 1.9 s of the 2.3 s wall was dispatch)
      val (withSig, memberMap) =
        Dedup.containmentPrep(sample, "text", "doc_id", 12)
      def sigs(ws: DataFrame) = ws.select($"rep".as("id"), $"minhash_sig")
      val variants = Seq(
        ("perhash_12x1", Dedup.lshCandidates(sigs(withSig), "id", 12, 1)),
        ("sym_4x3", Dedup.lshCandidates(sigs(withSig), "id", 4, 3)))
      val cands = variants
        .map { case (v, c) => c.select(lit(v).as("variant"), $"id1", $"id2") }
        .reduce(_ unionByName _)
      // defensive distinct (ADVICE r15): today's candidates come from
      // lshCandidates(dedupe=true) so found is already duplicate-free
      // (value-identical), but a future non-deduped variant must not
      // silently inflate n_found/n_hit through the counting joins below
      val found = Dedup.containmentFoundTagged(
          withSig, memberMap, cands, 0.9, variants.map(_._1))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val foundCounts = found.groupBy($"variant")
        .agg(count(lit(1)).as("n_found"))
      val hitCounts = found.join(truth, Seq("id1", "id2"))
        .groupBy($"variant").agg(count(lit(1)).as("n_hit"))
      variants.map(_._1).toDF("variant")
        .join(foundCounts, Seq("variant"), "left")
        .join(hitCounts, Seq("variant"), "left")
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select($"variant", $"n_true",
          coalesce($"n_found", lit(0L)).as("n_found"),
          coalesce($"n_hit", lit(0L)).as("n_hit"))
        .select($"variant", $"n_true", $"n_found", $"n_hit",
          when($"n_true" === 0L, lit(1000000L))
            .otherwise(expr("n_hit * 1000000L div n_true")).as("recall_q"))
        .orderBy($"variant")
    }),

    // The containment candidate-VOLUME knob, measured (VERDICT r9 #7):
    // r=1 banding bought ~100% recall — this row records what each
    // config COSTS (rep-level candidate pairs entering the exact
    // verify) next to what it recalls, including the shipped
    // LSH-Ensemble size-stratified config (same-stratum pairs — size
    // ratio < 2, Jaccard dilution bounded — through the tighter 4×3
    // Jaccard bands; cross-stratum pairs, the asymmetric cases r=1
    // exists for, keep the per-hash stream). The table a user reads
    // before picking recall vs candidate volume.
    "dedup_containment_tradeoff" -> ((s, dir) => {
      import s.implicits._
      val sample = Tables.documents(s, dir).filter($"doc_id" % 10 === 0)
      val ts = sample.select($"doc_id",
        array_distinct(
          transform(array_distinct(tokens($"text")), t => hash32(t))).as("ts"))
      val truth = ts.select($"doc_id".as("id1"), $"ts".as("t1"))
        .crossJoin(broadcast(ts.select($"doc_id".as("id2"), $"ts".as("t2"))))
        .filter($"id1" < $"id2")
        .filter(size(array_intersect($"t1", $"t2")).cast("double") /
          least(size($"t1"), size($"t2")).cast("double") >= 0.9)
        .select($"id1", $"id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (withSig, memberMap) =
        Dedup.containmentPrep(sample, "text", "doc_id", 12)
      def sigs(ws: DataFrame) = ws.select($"rep".as("id"), $"minhash_sig")
      // ONE tagged candidate union → ONE verify/expansion plan → ONE
      // count aggregation: the per-variant flow built three full
      // pipelines (persist + three broadcast-agg crossjoins each) and
      // was dispatch-bound — 86 jobs, 5.3 s of the 5.1 s wall was job
      // dispatch. Values are identical (same candidates, same verify
      // arithmetic, same count semantics); the oracle replays them.
      val variants = Seq(
        ("perhash_12x1", Dedup.lshCandidates(sigs(withSig), "id", 12, 1)),
        ("strat2_4x3", Dedup.containmentCandStratified(withSig, 12, 4, 3)),
        ("sym_4x3", Dedup.lshCandidates(sigs(withSig), "id", 4, 3)))
      val cands = variants
        .map { case (v, c) => c.select(lit(v).as("variant"), $"id1", $"id2") }
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val found = Dedup.containmentFoundTagged(
        withSig, memberMap, cands, 0.9, variants.map(_._1))
      val candCounts = cands.groupBy($"variant")
        .agg(count(lit(1)).as("n_cand"))
      val hitCounts = found.distinct()
        .join(truth, Seq("id1", "id2"))
        .groupBy($"variant").agg(count(lit(1)).as("n_hit"))
      variants.map(_._1).toDF("variant")
        .join(candCounts, Seq("variant"), "left")
        .join(hitCounts, Seq("variant"), "left")
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select($"variant", coalesce($"n_cand", lit(0L)).as("n_cand"),
          $"n_true", coalesce($"n_hit", lit(0L)).as("n_hit"))
        .select($"variant", $"n_cand", $"n_true", $"n_hit",
          when($"n_true" === 0L, lit(1000000L))
            .otherwise(expr("n_hit * 1000000L div n_true")).as("recall_q"))
        .orderBy($"variant")
    }),

    // Transitive dedup closure: connected components of the simhash
    // near-dup graph (hamming is NOT transitive, so A~B~C chains exist
    // that single-pass keepList cannot collapse). Every doc labeled with
    // the lowest id reachable through any chain.
    "dedup_cc" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashComponents(Tables.documents(s, dir)).orderBy($"doc_id")
    }),

    // Embedding near-dup pairs, exact within IVF cells: the cell count
    // scales with N (⌈N/64⌉), so block population stays ≈64 and total
    // pair work is linear in the corpus — the scale-safe blocking the
    // old fixed-cardinality label key was not. Cells come from the
    // TWO-LEVEL quantizer (driver-bounded coarse seeds, fine seeds
    // computed distributedly and joined — never collected); the oracle
    // replicates the identical two-level assignment.
    "dedup_embedding" -> ((s, dir) => {
      import s.implicits._
      Dedup.embeddingNearDupsIvf(Tables.embeddings(s, dir),
          targetBlock = 64, maxL2Sq = 1.45)
        .select($"id1", $"id2", round($"distance", 4).as("distance"))
        .orderBy($"id1", $"id2")
    }),

    // The recall knob on the blocking above: each vector probes its 2
    // nearest fine cells, so boundary-straddling pairs are found when
    // the two vectors share EITHER probed cell (a strict superset of
    // the single-probe pairs — asserted in DedupSpec).
    "dedup_embedding_mp" -> ((s, dir) => {
      import s.implicits._
      Dedup.embeddingNearDupsIvfMultiProbe(Tables.embeddings(s, dir),
          targetBlock = 64, nprobe = 2, maxL2Sq = 1.45)
        .select($"id1", $"id2", round($"distance", 4).as("distance"))
        .orderBy($"id1", $"id2")
    }),

    // The dedup decision: docs surviving word-set near-dedup (lowest id
    // of each duplicate chain wins; everything on an id2 side drops).
    "dedup_keep" -> ((s, dir) => {
      import s.implicits._
      // rep-level survivor computation — never materializes the member
      // pair cross products (equivalent to keepList over the full pairs;
      // the oracle states the naive pair form)
      Dedup.minhashKeep(Tables.documents(s, dir),
          shingleN = 1, numHashes = 12, bands = 4, threshold = 0.8)
        .select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Token-window chunking (training-data prep): 64-token windows with
    // 16-token overlap; one row per (doc, chunk) with a portable hash
    // of the chunk text — verifies chunk boundaries, counts, and
    // content exactly without dumping megabytes of text.
    "text_chunks" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        // tokens materialized BEFORE the chunk lambda references them
        // (the HOF-recompute convention — SURVEY r7)
        .select($"doc_id", tokens($"text").as("tok"))
        .select($"doc_id", posexplode(chunkTokenArray($"tok", 64, 16)))
        .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
          size($"col").cast("long").as("n_tok"),
          hash32(concat_ws(" ", $"col")).as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Deterministic stratified sampling (training-data mixing): keep
    // 1/2 of en, 1/4 of es, everything else whole — decided by the
    // portable hash, so the exact kept set is oracle-replayable.
    "sample_strata" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(stratifiedKeep($"lang", $"doc_id",
          Map("en" -> 4, "es" -> 2), outOf = 8, salt = "mix"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // LSH RECALL honesty metric (the dedup mirror of ann_recall): on a
    // deterministic 1/10 sample, ground truth = ALL pairs with exact
    // set-Jaccard >= 0.8 over hash32'd token sets (sample-bounded
    // quadratic via a broadcast nested-loop — the dedup_simhash
    // honesty-oracle pattern; int intersects keep the quadratic cheap,
    // and a hash collision can only merge tokens, 2^-32 per pair, same
    // in both engines), found = the production minhash pipeline at the
    // dedup_minhash config. Emits n_true / n_found / n_hit and the
    // integer recall — the un-audited side of the banding tradeoff
    // (precision is est-gate + exact-verify by construction).
    "dedup_minhash_recall" -> ((s, dir) => {
      import s.implicits._
      // truth and found each feed two consumers — persisted so the
      // sample-quadratic and the pipeline run ONCE (6.7 → ~2.5 s at
      // sf0.1 benched)
      val (sample, truth) = lshTruth(s, dir)
      val foundP = Dedup.minhashNearDups(sample,
          shingleN = 1, numHashes = 12, bands = 4, threshold = 0.8)
        .select($"id1", $"id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // n_true and n_hit from ONE left join over truth (found pairs are
      // unique, so count of matched rows ≡ the old semi-join count);
      // n_found is the only second consumer of the persisted pipeline
      truth.join(foundP.withColumn("f", lit(1)), Seq("id1", "id2"), "left")
        .agg(count(lit(1)).as("n_true"), count($"f").as("n_hit"))
        .crossJoin(broadcast(foundP.agg(count(lit(1)).as("n_found"))))
        .select($"n_true", $"n_found", $"n_hit",
          when($"n_true" === 0L, lit(1000000L))
            .otherwise(expr("n_hit * 1000000L div n_true")).as("recall_q"))
    }),

    // The banding KNOB measured: same truth set, three LSH configs —
    // (12,4) r=3 (the production default), (24,8) r=3 with more bands,
    // (12,6) r=2 — recall rises as r falls / bands rise, at more
    // candidate-join work. One row per config; the table a user reads
    // before picking the tradeoff.
    "dedup_minhash_tradeoff" -> ((s, dir) => {
      import s.implicits._
      // ONE truth materialization + ONE tagged pipeline for all three
      // configs: family j's hash depends only on j, so the 12-hash
      // signatures are prefix slices of the 24-hash one — one shingle
      // pass, one rep collapse, one est-gated verify (per-variant
      // slice estimates), one expansion (minhashFoundTagged). The
      // per-config flow ran three full pipelines and was
      // dispatch-bound: 83 jobs for a 500-doc sample.
      val (sample, truth) = lshTruth(s, dir)
      val configs = Seq((12, 4), (24, 8), (12, 6))
      val found = Dedup.minhashFoundTagged(sample, "text", "doc_id",
        shingleN = 1,
        configs.map { case (nh, nb) => (s"$nh/$nb", nh, nb) },
        threshold = 0.8)
      val hitCounts = found.distinct()
        .join(truth, Seq("id1", "id2"))
        .groupBy($"variant").agg(count(lit(1)).as("n_hit"))
      configs.map { case (nh, nb) => (s"$nh/$nb", nh.toLong, nb.toLong) }
        .toDF("variant", "num_hashes", "bands")
        .join(hitCounts, Seq("variant"), "left")
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select($"num_hashes", $"bands", $"n_true",
          coalesce($"n_hit", lit(0L)).as("n_hit"))
        .select($"num_hashes", $"bands", $"n_true", $"n_hit",
          when($"n_true" === 0L, lit(1000000L))
            .otherwise(expr("n_hit * 1000000L div n_true")).as("recall_q"))
        .orderBy($"num_hashes", $"bands")
    }),

    // PMI collocation extraction (word2vec/phrase-mining prep, Church &
    // Hanks 1990): pmi(a,b) = ln(p(ab)/(p(a)p(b))) over adjacent
    // bigrams, c_ab >= 5 noise floor, top-20 under a total order. All
    // counts are exact integers from two shuffles (bigram, unigram);
    // corpus totals broadcast as single rows; the one ln sees a double
    // ratio built from integers in a fixed association order,
    // ×1e6-quantized. Shingles persist before the generator (round-8
    // convention) and feed both explodes from one cache.
    "pmi_top" -> ((s, dir) => {
      import s.implicits._
      val shingled = Tables.documents(s, dir)
        .select(tokens($"text").as("tok"))
        .select(wordShingles($"tok", 2).as("sh"), $"tok")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grams = shingled.select(explode($"sh").as("g"))
      val toks = shingled.select(explode($"tok").as("t"))
      val c2 = grams.groupBy($"g").agg(count(lit(1)).as("c_ab"))
      val c1 = toks.groupBy($"t").agg(count(lit(1)).as("c"))
      val nb = grams.agg(count(lit(1)).as("n_bi"))
      val nu = toks.agg(count(lit(1)).as("n_uni"))
      c2.filter($"c_ab" >= 5)
        .withColumn("a", substring_index($"g", " ", 1))
        .withColumn("b", substring_index($"g", " ", -1))
        .join(c1.select($"t".as("a"), $"c".as("c_a")), Seq("a"))
        .join(c1.select($"t".as("b"), $"c".as("c_b")), Seq("b"))
        .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
        .select($"g", $"c_ab",
          round(log((($"c_ab".cast("double") * $"n_uni") * $"n_uni") /
            (($"n_bi".cast("double") * $"c_a") * $"c_b")) * lit(1e6))
            .cast("long").as("pmi_q"))
        .orderBy($"pmi_q".desc, $"g").limit(20)
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    // key = ln(u)/w with u = (hash32("wrs:"+id)+1)/2³² and w = n_chars
    // — the one-pass distributed reservoir (top-k by key plans
    // TakeOrderedAndProject: per-partition k-heaps, config-bounded
    // state). Both engines compute the key with identical double ops on
    // identical integer inputs, so the SELECTED SET is bit-determined;
    // the emitted key is ×1e9-quantized for the value compare.
    "sample_weighted" -> ((s, dir) => {
      import s.implicits._
      val u = (hash32(concat(lit("wrs:"), $"doc_id".cast("string")))
        .cast("double") + lit(1.0)) / lit(4294967296.0)
      val key = log(u) / $"n_chars".cast("double")
      Tables.documents(s, dir)
        .select($"doc_id", $"n_chars", key.as("k"))
        .orderBy($"k".desc, $"doc_id").limit(50)
        .select($"doc_id", $"n_chars",
          round($"k" * lit(1e9)).cast("long").as("key_q"))
        .orderBy($"doc_id")
    }),

    // Temperature-based language rebalancing (XLM-R α=0.5 resampling,
    // arXiv:1911.02116 §3) APPLIED: per-lang budgets k_l =
    // ⌊√c_l·K / Σ√c⌋ in exact integers (√ terms ×1e6-quantized before
    // the lang-bounded denominator sum), then the k_l docs with the
    // smallest (md5, id) rank per lang are kept — fully deterministic
    // thinning, the application step domain_mix only computed weights
    // for. Per-lang rank is a lang-partitioned window (the grouped_topk
    // shape).
    "lang_balance" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy($"lang").agg(count(lit(1)).as("c"))
        .select($"lang", $"c",
          round(sqrt($"c".cast("double")) * lit(1e6)).cast("long").as("sq"))
      val denom = counts.agg(sum($"sq").as("denom"))
      val budgets = counts.crossJoin(broadcast(denom))
        .select($"lang", $"c", expr("sq * 300L div denom").as("k_l"))
      val ranked = docs.select($"doc_id", $"lang",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"lang")
            .orderBy(md5($"doc_id".cast("string")), $"doc_id")).as("rn"))
      ranked.join(broadcast(budgets), "lang")
        .filter($"rn" <= $"k_l")
        .select($"doc_id", $"lang", $"k_l")
        .orderBy($"doc_id")
    }),

    // Repetition quality signals (the public Gopher-rule shape, Rae et
    // al. 2021, arXiv:2112.11446 §A1.1), both defined as true [0,1]
    // OCCURRENCE fractions over shingle positions:
    //  - top2_frac: fraction of bigram positions held by the most
    //    frequent bigram (a tokens-covered form would double-count
    //    overlapping runs — "a a a a" ⇒ 1.5);
    //  - dup3_frac: fraction of trigram occurrences belonging to a
    //    trigram that occurs more than once (ALL its occurrences count,
    //    the cited rule — an excess-only (n − distinct)/n form halves
    //    the signal on fully-duplicated text).
    // Row-local HOFs — per-row cost bounded by doc length
    // (distinct-shingles × n scan), never a join or shuffle.
    // Relational counters (Quality.repetitionStats): the nested-HOF
    // form cost 8.8 s of forced compute at sf0.1 that Bench's count()
    // pruned — see BASELINE round-8 session 3.
    "quality_repetition" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Quality.repetitionStats(Tables.documents(s, dir))
        .orderBy($"doc_id")
    }),

    // Per-document statistics + quality score.
    "text_stats" -> ((s, dir) => {
      import s.implicits._
      val tok = tokens($"text")
      Tables.documents(s, dir)
        .select($"doc_id",
          size(tok).cast("long").as("n_tokens"),
          size(array_distinct(tok)).cast("long").as("n_uniq"),
          round(size(array_distinct(tok)).cast("double") /
            greatest(size(tok), lit(1)), 6).as("ttr"),
          length(normText($"text")).cast("long").as("n_chars_norm"),
          qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    }),

    // Language profile: ground-truth lang vs per-language stopword-hit
    // ratios (the langid heuristic's feature vector, aggregated).
    "lang_profile" -> ((s, dir) => {
      import s.implicits._
      val tok = distinctTokens($"text")
      val enr = round(stopwordRatio(tok, "en"), 6)
      val esr = round(stopwordRatio(tok, "es"), 6)
      Tables.documents(s, dir)
        .select($"lang", $"doc_id", enr.as("enr"), esr.as("esr"),
          tokenCount($"text").as("ntok"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          (sum($"enr".cast(DecimalType(12, 6))).cast("double") / count(lit(1))).as("avg_en_ratio"),
          (sum($"esr".cast(DecimalType(12, 6))).cast("double") / count(lit(1))).as("avg_es_ratio"),
          (sum($"ntok").cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy($"lang")
    }),

    // Token counting: whitespace tokens vs BPE-ish regex pieces (both
    // engines run the identical RE2-safe pattern).
    "token_bpe" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", tokenCount($"text").as("n_ws"),
          bpeTokenCount($"text").as("n_bpe"))
        .orderBy($"doc_id")
    }),

    // Document fingerprinting: winnowed rolling-hash selection over char
    // 5-grams (window 4) — any shared substring of length ≥ 8 between
    // two docs guarantees a shared fingerprint. Registered in exploded
    // (doc_id, fp) form — scalar columns the driver can hash, and the
    // per-fingerprint join shape plagiarism detection actually uses.
    // The array form stays available via TextFunctions.winnowFingerprints.
    "doc_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .repartition($"doc_id") // spread the md5 work past the single input split
        .select($"doc_id", explode(winnowFingerprints($"text", 5, 4)).as("fp"))
        .orderBy($"doc_id", $"fp")
    }),

    // Corpus term frequency top-20 (explode → count → top-k).
    "token_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(explode(tokens($"text")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token")
        .limit(20)
    }),

    // The END-TO-END cleaning pipeline a training-data user runs:
    // near-dup survivor decision (exact dups are jaccard-1.0 pairs, so
    // minhashKeep subsumes exact dedup) composed with the quality gate
    // — one call, one plan, three operators fused by Catalyst.
    "pipeline_clean" -> ((s, dir) => {
      import s.implicits._
      val tok = tokens($"text")
      val ntok = size(tok).cast("long")
      val ndis = size(array_distinct(tok)).cast("long")
      val nstop = size(filter(tok, t => t === "the" || t === "a")).cast("long")
      Dedup.minhashKeep(Tables.documents(s, dir),
          shingleN = 1, numHashes = 12, bands = 4, threshold = 0.8)
        .select($"doc_id", ntok.as("n_tok"), ndis.as("n_distinct"),
          round(ndis.cast("double") / ntok, 6).as("ttr"),
          round(nstop.cast("double") / ntok, 6).as("stop_ratio"))
        .filter($"n_tok".between(20, 400) && $"ttr" >= 0.3 && $"stop_ratio" <= 0.2)
        .orderBy($"doc_id")
    }),

    // Plagiarism candidates: pairs sharing ≥ 3 RARE winnowing
    // fingerprints (df ≤ 20 — boilerplate fps are stop-fingerprints;
    // see Dedup.fingerprintPairs for why the cap is the scale design).
    "fp_overlap" -> ((s, dir) => {
      import s.implicits._
      Dedup.fingerprintPairs(Tables.documents(s, dir),
          k = 5, w = 4, maxDf = 20, minShared = 3)
        .orderBy($"id1", $"id2")
    }),

    // Vocabulary scrubbing (the PII-redaction shape on this corpus):
    // count and replace a sensitive-term list, report length deltas.
    // \b is an ASCII word boundary in BOTH Java regex and RE2.
    "text_scrub" -> ((s, dir) => {
      import s.implicits._
      val pat = TextQueries.scrubPattern
      Tables.documents(s, dir)
        .select($"doc_id",
          size(regexp_extract_all($"text", lit(pat), lit(0))).cast("long").as("n_hits"),
          length($"text").cast("long").as("len_raw"),
          length(regexp_replace($"text", pat, "<TERM>")).cast("long").as("len_scrubbed"))
        .orderBy($"doc_id")
    }),

    // Quality-filter keep decision: token count window, type-token
    // ratio, and tiny-stopword density — the survivors of a
    // training-data quality gate, with their metrics.
    "quality_keep" -> ((s, dir) => {
      import s.implicits._
      val tok = tokens($"text")
      val ntok = size(tok).cast("long")
      val ndis = size(array_distinct(tok)).cast("long")
      val nstop = size(filter(tok, t => t === "the" || t === "a")).cast("long")
      Tables.documents(s, dir)
        .select($"doc_id", ntok.as("n_tok"), ndis.as("n_distinct"),
          round(ndis.cast("double") / ntok, 6).as("ttr"),
          round(nstop.cast("double") / ntok, 6).as("stop_ratio"))
        .filter($"n_tok".between(20, 400) && $"ttr" >= 0.3 && $"stop_ratio" <= 0.2)
        .orderBy($"doc_id")
    })
  )

  /** Sensitive-term scrub pattern — shared verbatim with the oracle. */
  val scrubPattern: String = "\\b(customer|value|spark)\\b"

  private def dl2(a: String, b: String): String = VectorQueries.duckL2sq(a, b)

  /** Shared CTE prefix replaying `Dedup.ivfTwoLevelBlocks` in SQL:
    * md5-spread coarse seeds (Kc = ⌈√⌈N/64⌉⌉) → coarse argmin →
    * per-coarse-cell fine seeds → fine assignment keeping the `probeRn`
    * nearest cells per vector (1 = the single-probe argmin). */
  /** Two-level blocking replay, parameterized by the vector source CTE
    * and a CTE-name suffix so several blockings (e.g. per hierarchy
    * layer) can coexist in one oracle. */
  private[queries] def duckTwoLevelCtesFor(src: String, sfx: String,
      probeRn: Int = 1): String =
    s"""cseeds$sfx AS (
       |  SELECT vec_id AS ccell, embedding AS centroid FROM (
       |    SELECT vec_id, embedding, row_number()
       |      OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id, embedding) AS rn
       |    FROM $src
       |  ) WHERE rn <= (SELECT CAST(ceil(sqrt(ceil(count(*) / 64.0))) AS BIGINT)
       |                 FROM $src)
       |), coarse$sfx AS (
       |  SELECT vec_id, ccell, embedding FROM (
       |    SELECT e.vec_id, c.ccell, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dl2("e.embedding", "c.centroid")}, c.ccell) AS rn
       |    FROM $src e CROSS JOIN cseeds$sfx c
       |  ) WHERE rn = 1
       |), fseeds$sfx AS (
       |  SELECT ccell, vec_id AS fid, embedding AS centroid FROM (
       |    SELECT ccell, vec_id, embedding,
       |      row_number() OVER (PARTITION BY ccell
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id, embedding) AS rk,
       |      count(*) OVER (PARTITION BY ccell) AS cn
       |    FROM coarse$sfx
       |  ) WHERE rk <= ceil(cn / 64.0)
       |), assigned$sfx AS (
       |  SELECT vec_id, blk, embedding FROM (
       |    SELECT v.vec_id, f.fid AS blk, v.embedding,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dl2("v.embedding", "f.centroid")}, f.fid) AS rn
       |    FROM coarse$sfx v JOIN fseeds$sfx f USING (ccell)
       |  ) WHERE rn <= $probeRn
       |)""".stripMargin

  private[queries] def duckTwoLevelCtesProbed(probeRn: Int): String =
    duckTwoLevelCtesFor("embeddings", "", probeRn)

  private[queries] def duckTwoLevelCtes: String = duckTwoLevelCtesProbed(1)

  /** Shared oracle CTEs for the LSH honesty metrics: the 1/10 sample's
    * hashed distinct token sets, all ordered pairs, and the exact
    * >= 0.8 truth set — ONE definition so both oracles replay the same
    * truth the Spark-side lshTruth builds. Ends after `truth`. */
  private val dLshTruthCtes: String =
    s"""ts AS (
       |  SELECT doc_id, list_distinct(list_transform($dTok, t -> ${dHash32("t")})) AS ts
       |  FROM documents WHERE doc_id % 10 = 0
       |), p AS (
       |  SELECT a.doc_id AS id1, c.doc_id AS id2,
       |    CAST(len(list_filter(a.ts, x -> list_contains(c.ts, x))) AS BIGINT) AS i,
       |    CAST(len(a.ts) AS BIGINT) AS s1, CAST(len(c.ts) AS BIGINT) AS s2
       |  FROM ts a JOIN ts c ON a.doc_id < c.doc_id
       |), truth AS (
       |  SELECT id1, id2 FROM p
       |  WHERE CAST(i AS DOUBLE) / CAST(s1 + s2 - i AS DOUBLE) >= 0.8
       |)""".stripMargin

  def oracle: Map[String, String] = Map(

    "dedup_exact" ->
      s"""SELECT min(doc_id) AS doc_id, md5($dNorm) AS content_hash,
         |       count(*) AS n_copies
         |FROM documents
         |GROUP BY md5($dNorm)
         |ORDER BY doc_id""".stripMargin,

    "dedup_minhash" -> dMinhashPipeline(dTok, 12, 4, 0.8),

    // the full pipeline restricted to (corpus, batch) cross pairs —
    // exactly what probing the prebuilt index must find
    "dedup_incremental" -> dIncrementalPipeline(dTok, 12, 4, 0.8),

    "dedup_keep" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (
         |  SELECT id2 FROM (${dMinhashPipeline(dTok, 12, 4, 0.8)})
         |)
         |ORDER BY doc_id""".stripMargin,

    "dedup_simhash" -> s"$dSimhashPairs\nORDER BY id1, id2",

    // connected components of the simhash near-dup graph: transitive
    // closure by recursive CTE, component = min reachable id
    "dedup_cc" ->
      s"""WITH RECURSIVE prs AS (
         |  $dSimhashPairs
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM prs
         |  UNION ALL
         |  SELECT id2 AS a, id1 AS b FROM prs
         |), walk(id, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.anc
         |)
         |SELECT id AS doc_id, min(anc) AS component
         |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin,

    // mirrors charsOf + charEntropyQ: 1-based char slices, per-term
    // ×1e6 quantization before the integer sum — identical IEEE shape
    // (CAST/division/ln/negate/multiply order) to the Spark column
    "quality_entropy" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dNorm AS norm FROM documents
         |), c AS (
         |  SELECT doc_id, CASE WHEN len(norm) = 0 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(norm) + 1), i -> norm[i:i]) END AS chars
         |  FROM t
         |)
         |SELECT doc_id,
         |  CASE WHEN len(chars) = 0 THEN CAST(0 AS BIGINT) ELSE
         |    CAST(list_sum(list_transform(list_distinct(chars), ch ->
         |      CAST(round(-((CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)) *
         |        ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))) * 1e6) AS BIGINT)
         |    )) AS BIGINT) END AS entropy_q
         |FROM c ORDER BY doc_id""".stripMargin,

    // mirrors split_assign: same hash32-of-id-string bucket
    "split_assign" ->
      s"""SELECT doc_id,
         |  ${dHash32("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
         |  CASE WHEN ${dHash32("CAST(doc_id AS VARCHAR)")} % 100 < 98 THEN 'train'
         |       WHEN ${dHash32("CAST(doc_id AS VARCHAR)")} % 100 = 98 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors the vocab_coverage query: same (count desc, token asc)
    // vocabulary cut, LEFT-join OOV marking, one division then ×1e6
    "vocab_coverage" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($dNorm, ' ')) AS t FROM documents
         |), voc AS (
         |  SELECT t FROM (
         |    SELECT t, count(*) AS c FROM tok GROUP BY t
         |    ORDER BY c DESC, t LIMIT 16)
         |), d AS (
         |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN voc.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM tok LEFT JOIN voc ON tok.t = voc.t GROUP BY tok.doc_id
         |)
         |SELECT doc_id, n_tokens, n_oov,
         |  CAST(round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6)
         |    AS BIGINT) AS oov_q
         |FROM d ORDER BY doc_id""".stripMargin,

    // mirrors Sketch.kmvDistinct: distinct (source, bigram), hash32,
    // 64th-smallest hash per source, estimate 63·2³²/h₍₆₄₎ (exact
    // integers → one double division); < 64 distinct falls back exact
    "distinct_kmv" ->
      s"""WITH t AS (
         |  SELECT source, string_split($dNorm, ' ') AS tk FROM documents
         |), d AS (
         |  SELECT DISTINCT source, array_to_string(tk[si:si+1], ' ') AS g
         |  FROM (SELECT source, tk, unnest(range(1, len(tk))) AS si
         |        FROM t WHERE len(tk) >= 2)
         |), h AS (
         |  SELECT source, ${dHash32("g")} AS h FROM d
         |), r AS (
         |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM h
         |), agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
         |         max(CASE WHEN rn = 64 THEN h END) AS h64
         |  FROM r GROUP BY source
         |)
         |SELECT source, n_exact,
         |  CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
         |       ELSE round(270582939648 / h64, 4) END AS kmv_est
         |FROM agg ORDER BY source""".stripMargin,

    // mirrors Bpe.learnedMerges: char-split vocabulary, three unrolled
    // count/argmax/apply rounds (dBpeRound), merge table out
    "bpe_learn" ->
      s"""WITH v0 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         |    list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms
         |  FROM (SELECT unnest(string_split($dNorm, ' ')) AS w FROM documents)
         |  GROUP BY w
         |), ${dBpeRound(1, "v0")}, ${dBpeRound(2, "v1")}, ${dBpeRound(3, "v2")}
         |SELECT 1 AS round, a AS sym_a, b AS sym_b, c AS cnt FROM b1
         |UNION ALL
         |SELECT 2 AS round, a AS sym_a, b AS sym_b, c AS cnt FROM b2
         |UNION ALL
         |SELECT 3 AS round, a AS sym_a, b AS sym_b, c AS cnt FROM b3
         |ORDER BY round""".stripMargin,

    // quadratic truth for the prefix-filter join: every doc pair's
    // exact trigram-set intersection over hash56-encoded elements (the
    // engine ships 8-byte hashes, not strings; both sides hash
    // identically so counts replay exactly), threshold i*5 >= u*3
    "setjoin_jaccard" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, string_split($dNorm, ' ') AS t FROM documents
         |), g AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform(
         |    list_distinct(list_transform(range(1, len(t) - 1),
         |      j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])),
         |    z -> ${dHash56("z")})) AS s
         |  FROM tk WHERE len(t) >= 3
         |)
         |SELECT id1, id2, n_inter, n_union,
         |  n_inter * 1000000 // n_union AS jaccard_q
         |FROM (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    CAST(len(list_filter(a.s, x -> list_contains(b.s, x)))
         |      AS BIGINT) AS n_inter,
         |    CAST(len(a.s) + len(b.s)
         |      - len(list_filter(a.s, x -> list_contains(b.s, x)))
         |      AS BIGINT) AS n_union
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
         |WHERE n_inter * 5 >= n_union * 3
         |ORDER BY id1, id2""".stripMargin,

    // mirrors bpe_segment: the same three unrolled rounds, reading the
    // final merged vocabulary v3 instead of the merge table
    "bpe_segment" ->
      s"""WITH v0 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         |    list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms
         |  FROM (SELECT unnest(string_split($dNorm, ' ')) AS w FROM documents)
         |  GROUP BY w
         |), ${dBpeRound(1, "v0")}, ${dBpeRound(2, "v1")}, ${dBpeRound(3, "v2")}
         |SELECT w, cnt, array_to_string(syms, ' ') AS pieces
         |FROM v3 ORDER BY cnt DESC, w LIMIT 20""".stripMargin,

    // mirrors Sketch.hllDistinct: register = h & 63, rank = 51 −
    // bitlen(h >> 6) via binary-string length (rank 51 on a zero
    // field), per-register MAX, exact-long harmonic sum with empty
    // registers at 2^51, one final division on exactly representable
    // doubles (709·2^63 is a 10-bit mantissa)
    "distinct_hll" ->
      """WITH dv AS MATERIALIZED (
        |  SELECT DISTINCT event_type, CAST(event_id AS VARCHAR) AS v FROM events
        |), h AS MATERIALIZED (
        |  SELECT event_type, CAST(list_sum(list_transform(range(1,15), i ->
        |    CAST(strpos('0123456789abcdef', md5(v)[i:i]) - 1 AS BIGINT) *
        |    CAST(16^(14-i) AS BIGINT))) AS BIGINT) AS h
        |  FROM dv
        |), r AS (
        |  SELECT event_type, h & 63 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 51
        |         ELSE 51 - length(bin(h >> 6)) END AS rank
        |  FROM h
        |), m AS (
        |  SELECT event_type, idx, count(*) AS nv, max(rank) AS mr
        |  FROM r GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, CAST(sum(nv) AS BIGINT) AS n_exact,
        |    CAST(count(*) AS BIGINT) AS regs_used,
        |    CAST(sum(CAST(1 AS BIGINT) << (51 - mr)) AS BIGINT) AS obs
        |  FROM m GROUP BY 1
        |)
        |SELECT event_type, regs_used,
        |  obs + (64 - regs_used) * 2251799813685248 AS harm_q,
        |  round(CAST(709 AS DOUBLE) * power(CAST(2 AS DOUBLE), 63) /
        |    CAST(obs + (64 - regs_used) * 2251799813685248 AS DOUBLE) /
        |    CAST(1000 AS DOUBLE), 2) AS est_hll,
        |  n_exact
        |FROM g ORDER BY event_type""".stripMargin,

    // replays registers per type, max-merges across types, and compares
    // against the directly-computed corpus registers
    "distinct_hll_merge" ->
      """WITH h AS MATERIALIZED (
        |  SELECT event_type, CAST(list_sum(list_transform(range(1,15), i ->
        |    CAST(strpos('0123456789abcdef', md5(CAST(event_id AS VARCHAR))[i:i]) - 1 AS BIGINT) *
        |    CAST(16^(14-i) AS BIGINT))) AS BIGINT) AS h
        |  FROM events
        |), r AS (
        |  SELECT event_type, h & 63 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 51
        |         ELSE 51 - length(bin(h >> 6)) END AS rank
        |  FROM h
        |), pt AS (
        |  SELECT event_type, idx, max(rank) AS mr FROM r GROUP BY 1, 2
        |), merged AS (
        |  SELECT idx, CAST(max(mr) AS BIGINT) AS mr_merged FROM pt GROUP BY idx
        |), direct AS (
        |  SELECT idx, CAST(max(rank) AS BIGINT) AS mr_direct FROM r GROUP BY idx
        |)
        |SELECT idx, mr_merged, mr_direct,
        |       mr_merged = mr_direct AS merged_equals_direct
        |FROM merged JOIN direct USING (idx)
        |ORDER BY idx""".stripMargin,

    // mirrors Sketch.cmsTable/cmsEstimate: row-salted hash32 buckets,
    // exact integer cell counts, min over the 4 rows per probe
    "cms_est" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split($dNorm, ' ')) AS t FROM documents
         |), exact AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS n_exact FROM tok GROUP BY t
         |  ORDER BY n_exact DESC, t LIMIT 16
         |), cells AS (
         |  SELECT r, ${dHash32("CAST(r AS VARCHAR) || ':' || t")} % 256 AS b,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM tok, (SELECT unnest(range(0,4)) AS r) u
         |  GROUP BY 1, 2
         |), probes AS (
         |  SELECT e.t, e.n_exact, u.r,
         |    ${dHash32("CAST(u.r AS VARCHAR) || ':' || e.t")} % 256 AS b
         |  FROM exact e, (SELECT unnest(range(0,4)) AS r) u
         |)
         |SELECT p.t, p.n_exact, CAST(min(c.c) AS BIGINT) AS cms_est
         |FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
         |GROUP BY p.t, p.n_exact
         |ORDER BY p.t""".stripMargin,

    // mirrors NgramLm.bigramNll: space-joined bigrams, context = first
    // token, Laplace smoothing over the distinct-token vocabulary, the
    // SAME divide→ln→negate→×1e6→round tree, exact BIGINT doc sums
    "quality_bigram" ->
      s"""WITH $dBigramCtes
         |SELECT doc_id, n_bigrams, nll_q,
         |  CAST(round(CAST(nll_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         |    AS BIGINT) AS mean_nll_q
         |FROM d ORDER BY doc_id""".stripMargin,

    // mirrors quality_band: same bigram CTEs, quantile_cont ↔ Spark
    // exact percentile (the percentiles-query parity), band filter on
    // the quantized score
    "quality_band" ->
      s"""WITH $dBigramCtes, scored AS (
         |  SELECT doc_id,
         |    CAST(round(CAST(nll_q AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         |      AS BIGINT) AS mean_nll_q
         |  FROM d
         |), b AS (
         |  SELECT quantile_cont(mean_nll_q, 0.1) AS lo,
         |         quantile_cont(mean_nll_q, 0.9) AS hi
         |  FROM scored
         |)
         |SELECT doc_id, mean_nll_q FROM scored, b
         |WHERE mean_nll_q >= lo AND mean_nll_q <= hi
         |ORDER BY doc_id""".stripMargin,

    // mirrors the domain_mix query: sqrt quantized per source before
    // the BIGINT normalizing sum; single division → ×1e9 → round, the
    // identical IEEE tree
    "domain_mix" ->
      s"""WITH t AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split($dNorm, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source
         |), q AS (
         |  SELECT source, n_docs, n_tokens,
         |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS wq
         |  FROM t
         |)
         |SELECT source, n_docs, n_tokens,
         |  CAST(round(CAST(wq AS DOUBLE) /
         |    CAST((SELECT CAST(sum(wq) AS BIGINT) FROM q) AS DOUBLE) * 1e9)
         |    AS BIGINT) AS weight_q
         |FROM q ORDER BY source""".stripMargin,

    // mirrors Dsir.importanceWeights: hash32 % 4096 buckets, Laplace
    // smoothing, the SAME two-division-then-ratio-then-ln IEEE tree,
    // ×1e6 round per bucket, exact BIGINT doc sums
    "dsir_weights" ->
      s"""WITH tokx AS (
         |  SELECT doc_id, (lang = 'en') AS tgt,
         |         unnest(string_split($dNorm, ' ')) AS t
         |  FROM documents
         |), tb AS (
         |  SELECT doc_id, tgt, ${dHash32("t")} % 4096 AS b FROM tokx
         |), raw AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tb GROUP BY b
         |), tgtc AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tb WHERE tgt GROUP BY b
         |), tot AS (
         |  SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS tr,
         |         (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgtc) AS tt
         |), w AS (
         |  SELECT r.b,
         |    CAST(round(ln(
         |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE)) /
         |      (CAST(cr + 1 AS DOUBLE) / CAST(tr + 4096 AS DOUBLE))
         |    ) * 1e6) AS BIGINT) AS wq
         |  FROM raw r LEFT JOIN tgtc USING (b) CROSS JOIN tot
         |)
         |SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(wq) AS BIGINT) AS dsir_q
         |FROM tb JOIN w USING (b)
         |GROUP BY tb.doc_id ORDER BY tb.doc_id""".stripMargin,

    // mirrors Packing.manifest: one global running sum in doc_id order
    // (the oracle is single-node, so a plain ordered window replays the
    // engine's distributed prefix scan exactly — integer arithmetic end
    // to end)
    "pack_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split($dNorm, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end
         |  FROM t
         |)
         |SELECT doc_id, n_tokens, cum_end - n_tokens AS start_offset,
         |  (cum_end - n_tokens) // 512 AS pack_first,
         |  (cum_end - 1) // 512 AS pack_last,
         |  (cum_end - n_tokens) % 512 AS pack_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    // ground truth for the arithmetic global position: the plain
    // ordered-window form (single-node oracle, so a global row_number
    // is fine here); entropy fragment identical to quality_entropy
    "curriculum_order" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, $dNorm AS norm FROM documents
         |), c AS (
         |  SELECT doc_id, source, CASE WHEN len(norm) = 0 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(norm) + 1), i -> norm[i:i]) END AS chars
         |  FROM t
         |), ent AS (
         |  SELECT doc_id, source,
         |    CASE WHEN len(chars) = 0 THEN CAST(0 AS BIGINT) ELSE
         |      CAST(list_sum(list_transform(list_distinct(chars), ch ->
         |        CAST(round(-((CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)) *
         |          ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))) * 1e6) AS BIGINT)
         |      )) AS BIGINT) END AS score
         |  FROM c
         |), r AS (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS round_no
         |  FROM ent
         |)
         |SELECT doc_id, source, round_no,
         |  CAST(row_number() OVER (ORDER BY round_no, source) AS BIGINT) AS pos
         |FROM r ORDER BY pos""".stripMargin,

    // mirrors Dedup.duplicatedSpans: 1-based gram starts si ∈ [1, L-7]
    // (pos = si - 1), hash of the space-joined 8-token slice, count ≥ 2
    // gate, pos - row_number() island key. The unnest alias is `si`, NOT
    // `i` — dHash32's lambda variable is `i` and would shadow it.
    "dedup_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($dNorm, ' ') AS tk FROM documents
         |), p AS (
         |  SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS si
         |  FROM t WHERE len(tk) >= 8
         |), g AS (
         |  SELECT doc_id, CAST(si - 1 AS BIGINT) AS pos,
         |    ${dHash32("array_to_string(tk[si:si+7], ' ')")} AS h
         |  FROM p
         |), dupg AS (
         |  SELECT h FROM g GROUP BY h HAVING count(*) >= 2
         |), m AS (
         |  SELECT g.doc_id, g.pos FROM g JOIN dupg USING (h)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM m
         |)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
         |       max(pos) - min(pos) + 8 AS span_tokens
         |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,

    // mirrors the source_leakage query: (set-hash, source)
    // multiplicities, cross products per cluster, never per member pair
    "source_leakage" ->
      s"""WITH g AS (
         |  SELECT md5(array_to_string(list_sort(list_distinct(
         |           string_split($dNorm, ' '))), ' ')) AS ch,
         |         source, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY ch, source
         |)
         |SELECT a.source AS src1, b.source AS src2,
         |       CAST(sum(a.c * b.c) AS BIGINT) AS n_pairs
         |FROM g a JOIN g b ON a.ch = b.ch AND a.source < b.source
         |GROUP BY a.source, b.source ORDER BY src1, src2""".stripMargin,

    // mirrors dedup_keep_quality: the dedup_cc recursive walk for
    // components + the quality_entropy terms, survivor = row_number 1
    // under (entropy desc, id)
    "dedup_keep_quality" ->
      s"""WITH RECURSIVE prs AS (
         |  $dSimhashPairs
         |), und AS (
         |  SELECT id1 AS a, id2 AS b FROM prs
         |  UNION ALL
         |  SELECT id2 AS a, id1 AS b FROM prs
         |), walk(id, anc) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.anc
         |), comp AS (
         |  SELECT id AS doc_id, min(anc) AS component FROM walk GROUP BY id
         |), nrm AS (
         |  SELECT doc_id, $dNorm AS norm FROM documents
         |), ch AS (
         |  SELECT doc_id, CASE WHEN len(norm) = 0 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(norm) + 1), i -> norm[i:i]) END AS chars
         |  FROM nrm
         |), ent AS (
         |  SELECT doc_id,
         |    CASE WHEN len(chars) = 0 THEN CAST(0 AS BIGINT) ELSE
         |      CAST(list_sum(list_transform(list_distinct(chars), c ->
         |        CAST(round(-((CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars)) *
         |          ln(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / len(chars))) * 1e6) AS BIGINT)
         |      )) AS BIGINT) END AS entropy_q
         |  FROM ch
         |), r AS (
         |  SELECT c.component, c.doc_id, e.entropy_q,
         |    row_number() OVER (PARTITION BY c.component
         |      ORDER BY e.entropy_q DESC, c.doc_id) AS rn,
         |    CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_members
         |  FROM comp c JOIN ent e USING (doc_id)
         |)
         |SELECT component, doc_id AS kept_id, entropy_q, n_members
         |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,

    // mirrors Dedup.containmentPairs: same banding as dedup_minhash
    // (12 hashes, 4 bands × 3), containment verify on sorted distinct
    // hash sets. Division shape identical to the engine (double cast
    // before the divide), so the filter and the 6-dp round agree.
    // plain GROUND TRUTH: the engine's prefix-filtered form is exact
    // by construction, so the oracle brute-forces all pairs (sample
    // scale — sf0.01 is 500 docs)
    "dedup_containment" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dTok AS sh FROM documents
         |), hsh AS (
         |  SELECT doc_id, list_transform(sh, s -> ${dHash32("s")}) AS hs FROM t
         |), sig AS MATERIALIZED (
         |  SELECT doc_id, list_sort(list_distinct(hs)) AS hsd
         |  FROM hsh WHERE len(hs) > 0
         |), pairs AS (
         |  SELECT a.doc_id AS id1, c.doc_id AS id2,
         |    CAST(len(list_intersect(a.hsd, c.hsd)) AS DOUBLE) AS inter,
         |    CAST(least(len(a.hsd), len(c.hsd)) AS DOUBLE) AS mn
         |  FROM sig a JOIN sig c ON a.doc_id < c.doc_id
         |)
         |SELECT id1, id2, round(inter / mn, 6) AS containment
         |FROM pairs WHERE inter / mn >= 0.9
         |ORDER BY id1, id2""".stripMargin,

    // truth = sample-quadratic exact containment; variants = the full
    // banded pipeline under (12×1) and the retired (4×3); a candidate
    // pair in truth passes the exact verify by definition, so hits are
    // truth ∩ verified-candidates on both engines
    "dedup_containment_recall" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dTok AS sh FROM documents WHERE doc_id % 10 = 0
         |), hsh AS (
         |  SELECT doc_id, list_transform(sh, s -> ${dHash32("s")}) AS hs FROM t
         |), sig AS MATERIALIZED (
         |  SELECT doc_id, list_sort(list_distinct(hs)) AS hsd,
         |    list_transform(range(0,12), j ->
         |      list_min(list_transform(hs, x -> (x * (2*j+1) + (j*j+7)) % 2147483647))) AS sg
         |  FROM hsh WHERE len(hs) > 0
         |), truth AS MATERIALIZED (
         |  SELECT a.doc_id AS id1, c.doc_id AS id2
         |  FROM sig a JOIN sig c ON a.doc_id < c.doc_id
         |  WHERE len(list_intersect(a.hsd, c.hsd)) * 1.0
         |        / least(len(a.hsd), len(c.hsd)) >= 0.9
         |), b1 AS (
         |  SELECT doc_id, b, md5(CAST(sg[b+1] AS VARCHAR)) AS bucket
         |  FROM sig, (SELECT unnest(range(0,12)) AS b) u
         |), f1 AS MATERIALIZED (
         |  SELECT id1, id2 FROM (
         |    SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
         |    FROM b1 a JOIN b1 c ON a.b = c.b AND a.bucket = c.bucket
         |                        AND a.doc_id < c.doc_id
         |  ) JOIN sig x ON x.doc_id = id1 JOIN sig y ON y.doc_id = id2
         |  WHERE len(list_intersect(x.hsd, y.hsd)) * 1.0
         |        / least(len(x.hsd), len(y.hsd)) >= 0.9
         |), b3 AS (
         |  SELECT doc_id, b,
         |    md5(CAST(sg[3*b+1] AS VARCHAR) || ':' || CAST(sg[3*b+2] AS VARCHAR)
         |        || ':' || CAST(sg[3*b+3] AS VARCHAR)) AS bucket
         |  FROM sig, (SELECT unnest(range(0,4)) AS b) u
         |), f3 AS MATERIALIZED (
         |  SELECT id1, id2 FROM (
         |    SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
         |    FROM b3 a JOIN b3 c ON a.b = c.b AND a.bucket = c.bucket
         |                        AND a.doc_id < c.doc_id
         |  ) JOIN sig x ON x.doc_id = id1 JOIN sig y ON y.doc_id = id2
         |  WHERE len(list_intersect(x.hsd, y.hsd)) * 1.0
         |        / least(len(x.hsd), len(y.hsd)) >= 0.9
         |)
         |SELECT variant, n_true, n_found, n_hit,
         |  CASE WHEN n_true = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(n_hit * 1000000 // n_true AS BIGINT) END AS recall_q
         |FROM (
         |  SELECT 'perhash_12x1' AS variant,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM f1) AS n_found,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth JOIN f1 USING (id1, id2)) AS n_hit
         |  UNION ALL
         |  SELECT 'sym_4x3' AS variant,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM f3) AS n_found,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth JOIN f3 USING (id1, id2)) AS n_hit
         |)
         |ORDER BY variant""".stripMargin,

    // candidate-volume tradeoff: rep-level candidate counts (the cost
    // that enters the exact verify) + recall per banding config, incl.
    // the size-stratified one. Rep collapse replayed by grouping on the
    // sorted distinct hash set (identical sets share sg — list_min is
    // order/multiplicity-insensitive); stratum = length(bin(|set|))−1,
    // integer-exact in both engines. A candidate pair in truth passes
    // the exact verify by definition, so hits = truth ∩ expanded
    // candidates.
    "dedup_containment_tradeoff" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dTok AS sh FROM documents WHERE doc_id % 10 = 0
         |), hsh AS (
         |  SELECT doc_id, list_transform(sh, s -> ${dHash32("s")}) AS hs FROM t
         |), sig AS MATERIALIZED (
         |  SELECT doc_id, list_sort(list_distinct(hs)) AS hsd,
         |    list_transform(range(0,12), j ->
         |      list_min(list_transform(hs, x -> (x * (2*j+1) + (j*j+7)) % 2147483647))) AS sg
         |  FROM hsh WHERE len(hs) > 0
         |), truth AS MATERIALIZED (
         |  SELECT a.doc_id AS id1, c.doc_id AS id2
         |  FROM sig a JOIN sig c ON a.doc_id < c.doc_id
         |  WHERE len(list_intersect(a.hsd, c.hsd)) * 1.0
         |        / least(len(a.hsd), len(c.hsd)) >= 0.9
         |), repsig AS MATERIALIZED (
         |  SELECT hsd, min(doc_id) AS rep, arg_min(sg, doc_id) AS sg
         |  FROM sig GROUP BY hsd
         |), mm AS MATERIALIZED (
         |  SELECT s.doc_id, r.rep FROM sig s JOIN repsig r ON s.hsd = r.hsd
         |), rst AS (
         |  SELECT rep, length(bin(len(hsd))) - 1 AS st FROM repsig
         |), rb1 AS (
         |  SELECT rep, b, md5(CAST(sg[b+1] AS VARCHAR)) AS bucket
         |  FROM repsig, (SELECT unnest(range(0,12)) AS b) u
         |), rc1 AS MATERIALIZED (
         |  SELECT DISTINCT a.rep AS id1, c.rep AS id2
         |  FROM rb1 a JOIN rb1 c ON a.b = c.b AND a.bucket = c.bucket
         |                        AND a.rep < c.rep
         |), rb3 AS (
         |  SELECT rep, b,
         |    md5(CAST(sg[3*b+1] AS VARCHAR) || ':' || CAST(sg[3*b+2] AS VARCHAR)
         |        || ':' || CAST(sg[3*b+3] AS VARCHAR)) AS bucket
         |  FROM repsig, (SELECT unnest(range(0,4)) AS b) u
         |), rc3 AS MATERIALIZED (
         |  SELECT DISTINCT a.rep AS id1, c.rep AS id2
         |  FROM rb3 a JOIN rb3 c ON a.b = c.b AND a.bucket = c.bucket
         |                        AND a.rep < c.rep
         |), rcs AS MATERIALIZED (
         |  SELECT id1, id2 FROM rc3
         |  JOIN rst s1 ON s1.rep = id1 JOIN rst s2 ON s2.rep = id2
         |  WHERE s1.st = s2.st
         |  UNION
         |  SELECT id1, id2 FROM rc1
         |  JOIN rst s1 ON s1.rep = id1 JOIN rst s2 ON s2.rep = id2
         |  WHERE s1.st <> s2.st
         |), dup AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2
         |  FROM mm a JOIN mm b ON a.rep = b.rep AND a.doc_id < b.doc_id
         |), ex1 AS (
         |  SELECT DISTINCT least(ma.doc_id, mb.doc_id) AS id1,
         |                  greatest(ma.doc_id, mb.doc_id) AS id2
         |  FROM rc1 JOIN mm ma ON ma.rep = rc1.id1 JOIN mm mb ON mb.rep = rc1.id2
         |  UNION SELECT id1, id2 FROM dup
         |), ex3 AS (
         |  SELECT DISTINCT least(ma.doc_id, mb.doc_id) AS id1,
         |                  greatest(ma.doc_id, mb.doc_id) AS id2
         |  FROM rc3 JOIN mm ma ON ma.rep = rc3.id1 JOIN mm mb ON mb.rep = rc3.id2
         |  UNION SELECT id1, id2 FROM dup
         |), exs AS (
         |  SELECT DISTINCT least(ma.doc_id, mb.doc_id) AS id1,
         |                  greatest(ma.doc_id, mb.doc_id) AS id2
         |  FROM rcs JOIN mm ma ON ma.rep = rcs.id1 JOIN mm mb ON mb.rep = rcs.id2
         |  UNION SELECT id1, id2 FROM dup
         |)
         |SELECT variant, n_cand, n_true, n_hit,
         |  CASE WHEN n_true = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(n_hit * 1000000 // n_true AS BIGINT) END AS recall_q
         |FROM (
         |  SELECT 'perhash_12x1' AS variant,
         |    (SELECT CAST(count(*) AS BIGINT) FROM rc1) AS n_cand,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth JOIN ex1 USING (id1, id2)) AS n_hit
         |  UNION ALL
         |  SELECT 'strat2_4x3' AS variant,
         |    (SELECT CAST(count(*) AS BIGINT) FROM rcs) AS n_cand,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth JOIN exs USING (id1, id2)) AS n_hit
         |  UNION ALL
         |  SELECT 'sym_4x3' AS variant,
         |    (SELECT CAST(count(*) AS BIGINT) FROM rc3) AS n_cand,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth JOIN ex3 USING (id1, id2)) AS n_hit
         |)
         |ORDER BY variant""".stripMargin,

    "dedup_ngram" -> dMinhashPipeline(
      "list_distinct(list_transform(range(1, len(text) - 2), i -> text[i:i+3]))",
      48, 16, 0.55),

    // mirrors Dedup.embeddingNearDupsIvf: K = ceil(N/64) spread seed
    // centroids (first K by md5(vec_id) — portable uniform sample),
    // row-local argmin assignment with (distance, cell) tie-break,
    // exact L2 pairs within a cell
    // Two-level quantizer replay (Dedup.embeddingNearDupsIvf): coarse
    // Kc = ⌈√⌈N/64⌉⌉ md5-spread seeds → row-local coarse argmin → per-
    // coarse-cell fine seeds (first ⌈cellN/64⌉ by md5(id)) → fine
    // argmin joined on the coarse cell → exact pairs within fine blocks.
    "dedup_embedding" ->
      s"""WITH $duckTwoLevelCtes
         |SELECT a.vec_id AS id1, b.vec_id AS id2,
         |       round(${dl2("a.embedding", "b.embedding")}, 4) AS distance
         |FROM assigned a JOIN assigned b ON a.blk = b.blk AND a.vec_id < b.vec_id
         |WHERE ${dl2("a.embedding", "b.embedding")} < 1.45
         |ORDER BY id1, id2""".stripMargin,

    // Multi-probe replay (Dedup.embeddingNearDupsIvfMultiProbe): fine
    // assignment keeps the 2 nearest cells per vector; pairs sharing
    // several probed cells collapse through the min-distance group.
    "dedup_embedding_mp" ->
      s"""WITH ${duckTwoLevelCtesProbed(2)}
         |SELECT id1, id2, round(distance, 4) AS distance FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         min(${dl2("a.embedding", "b.embedding")}) AS distance
         |  FROM assigned a JOIN assigned b ON a.blk = b.blk AND a.vec_id < b.vec_id
         |  WHERE ${dl2("a.embedding", "b.embedding")} < 1.45
         |  GROUP BY a.vec_id, b.vec_id
         |)
         |ORDER BY id1, id2""".stripMargin,

    // stride 48 = 64 − 16; list_slice is inclusive-bounds and truncates
    // past the end exactly like Spark's slice(start, length)
    "text_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($dNorm, ' ') AS tok FROM documents
         |), n AS (
         |  SELECT doc_id, tok,
         |    greatest(CAST(ceil((len(tok) - 16) / 48.0) AS BIGINT), 1) AS nchunks
         |  FROM t
         |), c AS (
         |  SELECT doc_id, unnest(range(nchunks)) AS chunk_idx, tok FROM n
         |), sliced AS (
         |  SELECT doc_id, chunk_idx,
         |    list_slice(tok, chunk_idx * 48 + 1, chunk_idx * 48 + 64) AS chunk
         |  FROM c
         |)
         |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tok,
         |       ${dHash32("array_to_string(chunk, ' ')")} AS chunk_hash
         |FROM sliced
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "sample_strata" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang,
         |    ${dHash32("'mix:' || CAST(doc_id AS VARCHAR)")} % 8 AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, lang FROM b
         |WHERE CASE lang WHEN 'en' THEN bucket < 4
         |               WHEN 'es' THEN bucket < 2
         |               ELSE true END
         |ORDER BY doc_id""".stripMargin,

    // truth = sample-quadratic exact Jaccard; found = the full minhash
    // pipeline replayed on the same sample (nested-CTE subquery)
    "dedup_minhash_recall" ->
      s"""WITH $dLshTruthCtes, found AS (
         |  SELECT id1, id2 FROM (
         |    ${dMinhashPipeline(dTok, 12, 4, 0.8,
                "(SELECT * FROM documents WHERE doc_id % 10 = 0)")}
         |  )
         |), hit AS (
         |  SELECT truth.id1, truth.id2 FROM truth JOIN found USING (id1, id2)
         |)
         |SELECT CAST(t.c AS BIGINT) AS n_true, CAST(f.c AS BIGINT) AS n_found,
         |  CAST(h.c AS BIGINT) AS n_hit,
         |  CAST(CASE WHEN t.c = 0 THEN 1000000
         |            ELSE (h.c * 1000000) // t.c END AS BIGINT) AS recall_q
         |FROM (SELECT count(*) AS c FROM truth) t,
         |     (SELECT count(*) AS c FROM found) f,
         |     (SELECT count(*) AS c FROM hit) h""".stripMargin,

    "dedup_minhash_tradeoff" -> {
      val sampleSrc = "(SELECT * FROM documents WHERE doc_id % 10 = 0)"
      def cfgRow(nh: Int, nb: Int) =
        s"""SELECT CAST($nh AS BIGINT) AS num_hashes, CAST($nb AS BIGINT) AS bands,
           |  CAST(t.c AS BIGINT) AS n_true, CAST(h.c AS BIGINT) AS n_hit,
           |  CAST(CASE WHEN t.c = 0 THEN 1000000
           |            ELSE (h.c * 1000000) // t.c END AS BIGINT) AS recall_q
           |FROM (SELECT count(*) AS c FROM truth) t,
           |     (SELECT count(*) AS c FROM (
           |        SELECT truth.id1 FROM truth JOIN (
           |          SELECT id1, id2 FROM (
           |            ${dMinhashPipeline(dTok, nh, nb, 0.8, sampleSrc)}
           |          )
           |        ) f USING (id1, id2)
           |     )) h""".stripMargin
      s"""WITH $dLshTruthCtes
         |${cfgRow(12, 4)}
         |UNION ALL
         |${cfgRow(24, 8)}
         |UNION ALL
         |${cfgRow(12, 6)}
         |ORDER BY num_hashes, bands""".stripMargin
    },

    "pmi_top" ->
      s"""WITH t AS (
         |  SELECT string_split($dNorm, ' ') AS tk FROM documents
         |), sh AS (
         |  SELECT list_transform(range(1, len(tk)), i ->
         |    array_to_string(tk[i:i+1], ' ')) AS sh, tk
         |  FROM t
         |), g AS (
         |  SELECT unnest(sh) AS g FROM sh
         |), u AS (
         |  SELECT unnest(tk) AS t FROM sh
         |), c2 AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS c_ab FROM g GROUP BY g
         |), c1 AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY t
         |), nb AS (SELECT count(*) AS n_bi FROM g
         |), nu AS (SELECT count(*) AS n_uni FROM u)
         |SELECT c2.g, c2.c_ab,
         |  CAST(round(ln(((CAST(c2.c_ab AS DOUBLE) * nu.n_uni) * nu.n_uni) /
         |    ((CAST(nb.n_bi AS DOUBLE) * ca.c) * cb.c)) * 1e6) AS BIGINT) AS pmi_q
         |FROM c2
         |JOIN c1 ca ON ca.t = string_split(c2.g, ' ')[1]
         |JOIN c1 cb ON cb.t = string_split(c2.g, ' ')[-1]
         |CROSS JOIN nb CROSS JOIN nu
         |WHERE c2.c_ab >= 5
         |ORDER BY pmi_q DESC, g LIMIT 20""".stripMargin,

    "sample_weighted" ->
      s"""WITH k AS (
         |  SELECT doc_id, n_chars,
         |    ln(CAST(${dHash32("'wrs:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
         |       / 4294967296e0) / CAST(n_chars AS DOUBLE) AS k
         |  FROM documents
         |)
         |SELECT doc_id, n_chars, CAST(round(k * 1e9) AS BIGINT) AS key_q
         |FROM (SELECT * FROM k ORDER BY k DESC, doc_id LIMIT 50)
         |ORDER BY doc_id""".stripMargin,

    "lang_balance" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS c,
         |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS sq
         |  FROM documents GROUP BY lang
         |), d AS (
         |  SELECT sum(sq) AS denom FROM c
         |), b AS (
         |  SELECT lang, (sq * 300) // denom AS k_l FROM c CROSS JOIN d
         |), r AS (
         |  SELECT doc_id, lang, row_number() OVER (
         |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang, CAST(b.k_l AS BIGINT) AS k_l
         |FROM r JOIN b USING (lang)
         |WHERE r.rn <= b.k_l
         |ORDER BY r.doc_id""".stripMargin,

    // word shingles mirror wordShingles exactly: space-joined slices;
    // range(1, n) is empty when n <= 1, matching the short-doc guard
    "quality_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($dNorm, ' ') AS tok FROM documents
         |), sh AS (
         |  SELECT doc_id, len(tok) AS ntok,
         |    list_transform(range(1, len(tok)), i ->
         |      array_to_string(list_slice(tok, i, i+1), ' ')) AS sh2,
         |    list_transform(range(1, len(tok)-1), i ->
         |      array_to_string(list_slice(tok, i, i+2), ' ')) AS sh3
         |  FROM t
         |)
         |SELECT doc_id, CAST(ntok AS BIGINT) AS n_tok,
         |  round(coalesce(list_max(list_transform(list_distinct(sh2),
         |      d -> len(list_filter(sh2, x -> x = d)))), 0) * 1.0
         |    / greatest(len(sh2), 1), 6) AS top2_frac,
         |  round((len(sh3) - len(list_filter(list_distinct(sh3),
         |      d -> len(list_filter(sh3, x -> x = d)) = 1))) * 1.0
         |    / greatest(len(sh3), 1), 6) AS dup3_frac
         |FROM sh ORDER BY doc_id""".stripMargin,

    "text_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dNorm AS norm,
         |         string_split($dNorm, ' ') AS tok,
         |         $dTok AS dtok
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(tok) AS BIGINT) AS n_tokens,
         |  CAST(len(dtok) AS BIGINT) AS n_uniq,
         |  round(len(dtok) * 1.0 / greatest(len(tok), 1), 6) AS ttr,
         |  CAST(len(norm) AS BIGINT) AS n_chars_norm,
         |  round((least(len(norm) / 200.0, 1.0)
         |       + len(dtok) * 1.0 / greatest(len(tok), 1)
         |       + len(regexp_replace(norm, '[^a-z ]', '', 'g')) * 1.0
         |         / greatest(len(norm), 1)) / 3.0, 6) AS quality
         |FROM t
         |ORDER BY doc_id""".stripMargin,

    "lang_profile" -> {
      val en = stopwords("en").mkString("'", "','", "'")
      val es = stopwords("es").mkString("'", "','", "'")
      s"""WITH t AS (
         |  SELECT lang, $dTok AS tok,
         |         CAST(len(string_split($dNorm, ' ')) AS BIGINT) AS ntok
         |  FROM documents
         |), r AS (
         |  SELECT lang, ntok,
         |    round(len(list_filter(tok, x -> x IN ($en))) * 1.0
         |          / greatest(len(tok), 1), 6) AS enr,
         |    round(len(list_filter(tok, x -> x IN ($es))) * 1.0
         |          / greatest(len(tok), 1), 6) AS esr
         |  FROM t
         |)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CAST(enr AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS avg_en_ratio,
         |  CAST(sum(CAST(esr AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS avg_es_ratio,
         |  CAST(sum(ntok) AS DOUBLE) / count(*) AS avg_tokens
         |FROM r
         |GROUP BY lang
         |ORDER BY lang""".stripMargin
    },

    "token_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split($dNorm, ' ')) AS BIGINT) AS n_ws,
         |  CAST(len(regexp_extract_all(text,
         |    '$bpePattern')) AS BIGINT) AS n_bpe
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(1, greatest(len(text) - 4, 0) + 1), i -> text[i:i+4]),
         |    s -> ${dHash32("s")}) AS hs
         |  FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         |         ELSE list_distinct(
         |           list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
         |             i -> list_min(hs[i:i+3])))
         |    END AS fps
         |  FROM t
         |)
         |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp
         |FROM f
         |ORDER BY doc_id, fp""".stripMargin,

    "token_topk" ->
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest(string_split($dNorm, ' ')) AS token FROM documents)
         |GROUP BY token
         |ORDER BY n DESC, token
         |LIMIT 20""".stripMargin,

    "fp_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(1, greatest(len(text) - 4, 0) + 1), i -> text[i:i+4]),
         |    s -> ${dHash32("s")}) AS hs
         |  FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         |         ELSE list_distinct(
         |           list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
         |             i -> list_min(hs[i:i+3])))
         |    END) AS fp
         |  FROM t
         |), d AS (
         |  SELECT fp FROM f GROUP BY fp HAVING count(*) <= 20
         |), fr AS (
         |  SELECT f.doc_id, f.fp FROM f JOIN d USING (fp)
         |)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY id1, id2""".stripMargin,

    "text_scrub" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$scrubPattern')) AS BIGINT) AS n_hits,
         |  CAST(length(text) AS BIGINT) AS len_raw,
         |  CAST(length(regexp_replace(text, '$scrubPattern', '<TERM>', 'g')) AS BIGINT)
         |    AS len_scrubbed
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    "pipeline_clean" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($dNorm, ' ') AS tok FROM documents
         |  WHERE doc_id NOT IN (
         |    SELECT id2 FROM (${dMinhashPipeline(dTok, 12, 4, 0.8)})
         |  )
         |), m AS (
         |  SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct,
         |    CAST(len(list_filter(tok, x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
         |  FROM t
         |), r AS (
         |  SELECT doc_id, n_tok, n_distinct,
         |    round(n_distinct * 1.0 / n_tok, 6) AS ttr,
         |    round(n_stop * 1.0 / n_tok, 6) AS stop_ratio
         |  FROM m
         |)
         |SELECT doc_id, n_tok, n_distinct, ttr, stop_ratio
         |FROM r
         |WHERE n_tok BETWEEN 20 AND 400 AND ttr >= 0.3 AND stop_ratio <= 0.2
         |ORDER BY doc_id""".stripMargin,

    "quality_keep" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($dNorm, ' ') AS tok FROM documents
         |), m AS (
         |  SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct,
         |    CAST(len(list_filter(tok, x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
         |  FROM t
         |), r AS (
         |  SELECT doc_id, n_tok, n_distinct,
         |    round(n_distinct * 1.0 / n_tok, 6) AS ttr,
         |    round(n_stop * 1.0 / n_tok, 6) AS stop_ratio
         |  FROM m
         |)
         |SELECT doc_id, n_tok, n_distinct, ttr, stop_ratio
         |FROM r
         |WHERE n_tok BETWEEN 20 AND 400 AND ttr >= 0.3 AND stop_ratio <= 0.2
         |ORDER BY doc_id""".stripMargin
  )
}
