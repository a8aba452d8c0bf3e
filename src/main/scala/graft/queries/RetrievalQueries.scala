package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bm25
import graft.sources.Tables
import graft.queries.TextQueries.dNorm

/** Lexical ranked retrieval over the documents corpus — the search-side
  * capability a training-data pipeline pairs with the vector path
  * (corpus search, relevance filtering, hybrid retrieval). The oracle
  * replays the full BM25 computation, so tokenization, tf/df/length
  * statistics, the ln-idf arithmetic, and the ×1e6 integer score
  * quantization are all value-checked end to end. */
object RetrievalQueries extends QueryPack {

  private[queries] val terms = Seq("spark", "merge", "customer")
  private val termsSql = terms.map(t => s"'$t'").mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-15 for a three-term query. Scores are ×1e6-scaled
    // integers: each per-term score is a deterministic double function
    // of integer statistics (tf, df, N, dl, Σdl), quantized BEFORE the
    // per-document sum, so the total is exact integer math in both
    // engines (no float summation order anywhere).
    "bm25_topk" -> ((s, dir) =>
      Bm25.topK(Tables.documents(s, dir), terms, k = 15)),

    // BM25 served from the persisted inverted index AFTER a mutation-log
    // fold (VERDICT r13 next #2: the reference's apply loop,
    // raft_state.cc:416-459, lands every committed upsert/delete in THE
    // served index — this query oracle-checks that path for the lexical
    // family): the store builds over `documents`, one mutation batch
    // applies two upserts-of-existing (new text), one brand-new doc, and
    // two deletes through IndexStore.applyMutationBatch (upsert =
    // delete-then-insert slots, vector_shard.cc:46-57), and the serve is
    // bm25TopK from the mutated postings + netted (n, sumdl) constants.
    // The oracle scores the replayed corpus directly — postings
    // duplication, a stale dl, or an un-netted constant all shift every
    // score. Build + fold are memoized per session (write-once /
    // serve-many; attribution via build_warm_s / store_write_warm_s).
    "bm25_log" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.MutationLog
      import graft.sources.IndexStore
      val docs = Tables.documents(s, dir)
      val path = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_bm25_log_" + java.security.MessageDigest
          .getInstance("MD5").digest(dir.getBytes("UTF-8"))
          .take(6).map(b => f"${b & 0xff}%02x").mkString).getAbsolutePath
      graft.util.IndexCache.value(docs.select($"doc_id"),
          Seq("bm25LogBuild", path)) {
        // cross-session restart semantics: reopen the persisted store,
        // rebuild only on input/code change (graft.util.StoreOnce)
        graft.util.StoreOnce.ensure(path,
          "bm25_log|" + graft.util.StoreOnce.inputSig(docs)) {
        IndexStore.write(docs, path, buckets = 64)
        def textOf(id: Long) = docs.filter($"doc_id" === id)
          .select($"text").head.getString(0)
        val batch = Seq(
          (1L, MutationLog.Upsert, 1L, textOf(2L)),
          (2L, MutationLog.Upsert, 3L, textOf(4L)),
          (3L, MutationLog.Upsert, 900001L, textOf(6L)),
          (4L, MutationLog.Delete, 5L, null),
          (5L, MutationLog.Delete, 8L, null)
        ).toDF("log_index", "op", "doc_id", "text")
        IndexStore.applyMutationBatch(batch, path, 0L)
        }
        ()
      }
      IndexStore.bm25TopK(s, path, terms, k = 15)
    }),

    // Pseudo-relevance feedback (RM3-lite, Lavrenko/Croft relevance
    // models): BM25 top-10 seeds a feedback set; its non-query terms
    // are weighted tfsum·idf (×1e6-quantized — integer inputs, one ln,
    // total order (w desc, term)); the top-5 expansion terms join the
    // query and the corpus is re-scored. Scale shape: the feedback set
    // is API-bounded (10 docs), its vocabulary broadcast back to filter
    // the corpus term explode (the corpus only ever shuffles matched
    // (doc, term) rows — same as bm25_topk); the ≤5-term expansion is a
    // driver list like the MMR shortlist, bounded by CONFIG. Both
    // scoring passes are the oracle-verified Bm25 operator.
    "bm25_prf" -> ((s, dir) => {
      import s.implicits._
      // (spreadIfNarrow measured WORSE here: the term filter lands
      // right after tokenize, so the narrow scans are cheap and the
      // per-consumer raw-text shuffle costs more than it saves)
      val docs = Tables.documents(s, dir)
      val seed = Bm25.topK(docs, terms, k = 10).select($"doc_id")
      // fb feeds TWO consumers (cdf's broadcast filter and the weight
      // join) — persisted so the seed top-10 pass and the feedback
      // tokenize/aggregate run once, not twice (Spark reuses exchanges,
      // not arbitrary common subtrees)
      val fb = docs.join(broadcast(seed), "doc_id")
        .select(graft.functions.TextFunctions.tokens($"text").as("t"))
        .select(explode($"t").as("term"))
        .filter(!$"term".isin(terms: _*))
        .groupBy($"term").agg(count(lit(1)).as("tfsum"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cdf = docs
        .select(graft.functions.TextFunctions.distinctTokens($"text").as("dt"))
        .select(explode($"dt").as("term"))
        .join(broadcast(fb.select($"term")), "term")
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n"))
      val expansion = fb.join(cdf, "term").crossJoin(broadcast(stats))
        .select($"term", round($"tfsum" *
          log(lit(1.0) + (($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))) *
          lit(1e6)).cast("long").as("w"))
        .orderBy($"w".desc, $"term").limit(5)
        .select($"term").as[String].collect().toSeq
      Bm25.topK(docs, terms ++ expansion, k = 15)
    }),

    // TF-IDF cosine top-15 — the vector-space complement to BM25: true
    // cosine needs every doc's norm over its FULL term vector, so this
    // exercises the corpus-wide inverted-index build (one posting-list
    // shuffle; df and norms derived from the same persisted frame).
    // Norms/dots are ×1e6-quantized integer sums (no float summation
    // order); the oracle replays the identical expression tree.
    "tfidf_topk" -> ((s, dir) =>
      graft.operators.Tfidf.topK(Tables.documents(s, dir), terms, k = 15)
        .select(col("doc_id"), round(col("score"), 6).as("score"))),

    // Hybrid retrieval, reciprocal-rank fusion (Cormack/Clarke/Büttcher
    // 2009): rrf = Σ 1/(60 + rank) over the lexical (BM25) and vector
    // (exact L2, query vec 0) rankings — the standard public recipe for
    // fusing incomparable score scales. Ranks are integers from total
    // orders, the two fused terms are summed in a fixed order, and the
    // result rounds to 6 dp, so the hash compare is stable.
    "hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val q = e.filter($"vec_id" === 0L).select($"embedding")
        .head.getSeq[Float](0).toArray
      val lex = Bm25.topK(docs, terms, k = 50)
        .select($"doc_id", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"score".desc, $"doc_id")).as("lrank"))
      val vec = e.select($"vec_id".as("doc_id"),
          graft.functions.VectorFunctions.l2sq($"embedding", lit(q)).as("d"))
        .orderBy($"d", $"doc_id").limit(50)
        .select($"doc_id", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"d", $"doc_id")).as("vrank"))
      lex.join(vec, Seq("doc_id"), "outer")
        .select($"doc_id",
          (when($"lrank".isNotNull, lit(1.0) / (lit(60) + $"lrank")).otherwise(lit(0.0)) +
           when($"vrank".isNotNull, lit(1.0) / (lit(60) + $"vrank")).otherwise(lit(0.0)))
            .as("rrf_raw"))
        .select($"doc_id", round($"rrf_raw", 6).as("rrf"))
        .orderBy($"rrf".desc, $"doc_id").limit(20)
    }),

    // MMR diversified top-5 over a 20-candidate exact shortlist
    // (λ=0.7, query vec 0). The oracle replays the greedy selection as
    // a chained-CTE argmax per step on the SAME ×1e6 integer-quantized
    // marginal scores, so the selection order (not just membership) is
    // value-checked.
    "mmr_rerank" -> ((s, dir) =>
      graft.operators.Mmr.rerank(s, Tables.embeddings(s, dir),
        RetrievalQueries.mmrQuery(s, dir), r = 20, k = 5, lambda = 0.7)),

    // Phrase retrieval over a POSITIONAL index: corpus statistics pick
    // the most frequent trigram (shingle counts, ties lexicographic),
    // then retrieval runs the inverted-index way — postings of the
    // three terms FILTERED FIRST (at 100 TB you join three short
    // posting lists, never re-shingle the corpus), aligned by
    // position-arithmetic equi-joins. Per matching doc: occurrence
    // count and first 0-based position.
    "phrase_match" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.{tokens, wordShingles}
      val tk = Tables.documents(s, dir).select($"doc_id", tokens($"text").as("tk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = tk.select(explode(wordShingles($"tk", 3)).as("ph"))
        .groupBy($"ph").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"ph").limit(1)
      val t3 = top.select(split($"ph", " ").as("ws"))
        .select(element_at($"ws", 1).as("w1"), element_at($"ws", 2).as("w2"),
          element_at($"ws", 3).as("w3"))
      val idx = tk.select($"doc_id", posexplode($"tk").as(Seq("pos", "term")))
      val p1 = idx.join(broadcast(t3), $"term" === $"w1")
        .select($"doc_id", $"pos")
      val p2 = idx.join(broadcast(t3), $"term" === $"w2")
        .select($"doc_id", ($"pos" - 1).as("pos"))
      val p3 = idx.join(broadcast(t3), $"term" === $"w3")
        .select($"doc_id", ($"pos" - 2).as("pos"))
      p1.join(p2, Seq("doc_id", "pos")).join(p3, Seq("doc_id", "pos"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_occ"), min($"pos").cast("long").as("first_pos"))
        .orderBy($"doc_id")
    })
  )

  /** Query vector 0 — shared by the Spark path and oracle builders. */
  private def mmrQuery(s: SparkSession, dir: String): Array[Float] = {
    import s.implicits._
    Tables.embeddings(s, dir).filter($"vec_id" === 0L)
      .select($"embedding").head.getSeq[Float](0).toArray
  }

  import graft.queries.VectorQueries.{duckDot, duckL2sq}

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  /** The MMR oracle: cand = exact top-20 with cosine relevance, sims =
    * pairwise candidate cosines, then one (argmax, selected-set) CTE
    * pair per greedy step. λ is written `7e-1` and the diversity weight
    * `(1e0 - 7e-1)` so both engines compute the IDENTICAL doubles
    * (1 − 0.7 ≠ 0.3 in IEEE). */
  private def mmrOracle(k: Int): String = {
    val lam = "7e-1"
    val pen = s"(1e0 - $lam)"
    val head =
      s"""WITH q AS (
         |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
         |), cand AS (
         |  SELECT e.vec_id, e.embedding,
         |         ${duckCos("q.qv", "e.embedding")} AS rel
         |  FROM embeddings e CROSS JOIN q
         |  ORDER BY ${duckL2sq("e.embedding", "q.qv")}, e.vec_id LIMIT 20
         |), sims AS (
         |  SELECT a.vec_id AS ca, b.vec_id AS cb,
         |         ${duckCos("a.embedding", "b.embedding")} AS sim
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
         |), p1 AS (
         |  SELECT vec_id, CAST(round(($lam * rel - $pen * 0e0) * 1e6) AS BIGINT) AS score_q
         |  FROM cand ORDER BY score_q DESC, vec_id LIMIT 1
         |), s1 AS (SELECT vec_id FROM p1)""".stripMargin
    val steps = (2 to k).map { n =>
      s""", p$n AS (
         |  SELECT c.vec_id, CAST(round(($lam * c.rel - $pen * (
         |      SELECT max(sim) FROM sims
         |      WHERE ca = c.vec_id AND cb IN (SELECT vec_id FROM s${n - 1})
         |    )) * 1e6) AS BIGINT) AS score_q
         |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s${n - 1})
         |  ORDER BY score_q DESC, c.vec_id LIMIT 1
         |), s$n AS (
         |  SELECT vec_id FROM s${n - 1} UNION ALL SELECT vec_id FROM p$n
         |)""".stripMargin
    }.mkString
    val branches = (1 to k).map { n =>
      if (n == 1) s"SELECT CAST(1 AS INT) AS rank, vec_id, score_q FROM p1"
      else s"SELECT $n, vec_id, score_q FROM p$n"
    }.mkString("\n  UNION ALL ")
    s"$head$steps\nSELECT rank, vec_id, score_q FROM (\n  $branches\n) ORDER BY rank"
  }

  /** The full BM25 oracle chain over document source CTE/table `src`
    * (tokenize → tf/df → corpus constants → ×1e6 per-term quantization
    * → integer sum, top-15) — shared by the inline query and the
    * mutation-fold serving query, which scores a REPLAYED corpus. */
  /** BM25 ranking as a reusable CTE chain over any doc source: ends in
    * `${p}lex(doc_id, lrank)` — rank over the top-k by (score DESC,
    * doc_id). The hybrid fusion oracles compose this with a vector
    * ranking. */
  private[queries] def bm25RankCtes(p: String, src: String, k: Int): String =
    s"""${p}tok AS (
       |  SELECT doc_id, len(string_split($dNorm, ' ')) AS dl,
       |         unnest(string_split($dNorm, ' ')) AS term
       |  FROM $src
       |), ${p}f AS (
       |  SELECT doc_id, term, dl, count(*) AS tf
       |  FROM ${p}tok WHERE term IN ($termsSql)
       |  GROUP BY doc_id, term, dl
       |), ${p}dfreq AS (
       |  SELECT term, count(*) AS df FROM ${p}f GROUP BY term
       |), ${p}stats AS (
       |  SELECT count(*) AS n, sum(len(string_split($dNorm, ' '))) AS sumdl
       |  FROM $src
       |), ${p}terms AS (
       |  SELECT f.doc_id, CAST(round(
       |    ln(1e0 + ((s.n - d.df + 5e-1) / (d.df + 5e-1))) *
       |    ((f.tf * 2.2e0) / (f.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * (f.dl / (s.sumdl / s.n))))) *
       |    1e6) AS BIGINT) AS ts
       |  FROM ${p}f f JOIN ${p}dfreq d USING (term) CROSS JOIN ${p}stats s
       |), ${p}lexb AS (
       |  SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score
       |  FROM ${p}terms GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT $k
       |), ${p}lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
       |  FROM ${p}lexb
       |)""".stripMargin

  private def bm25OracleSql(src: String): String =
    s"""tok AS (
       |  SELECT doc_id, len(string_split($dNorm, ' ')) AS dl,
       |         unnest(string_split($dNorm, ' ')) AS term
       |  FROM $src
       |), f AS (
       |  SELECT doc_id, term, dl, count(*) AS tf
       |  FROM tok WHERE term IN ($termsSql)
       |  GROUP BY doc_id, term, dl
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM f GROUP BY term
       |), stats AS (
       |  SELECT count(*) AS n, sum(len(string_split($dNorm, ' '))) AS sumdl
       |  FROM $src
       |), terms AS (
       |  SELECT f.doc_id, CAST(round(
       |    ln(1e0 + ((s.n - d.df + 5e-1) / (d.df + 5e-1))) *
       |    ((f.tf * 2.2e0) / (f.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * (f.dl / (s.sumdl / s.n))))) *
       |    1e6) AS BIGINT) AS ts
       |  FROM f JOIN dfreq d USING (term) CROSS JOIN stats s
       |)
       |SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score
       |FROM terms GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin

  def oracle: Map[String, String] = Map(

    "bm25_topk" -> s"WITH ${bm25OracleSql("documents")}",

    // the mutation-log replay, then the IDENTICAL BM25 chain over the
    // mutated corpus: upserted docs carry their new text, the new doc
    // joins, deleted docs drop — exactly what the store's fold must
    // serve (postings from the winning slots, constants netted)
    "bm25_log" ->
      s"""WITH docs2 AS MATERIALIZED (
         |  SELECT doc_id,
         |    CASE WHEN doc_id = 1 THEN (SELECT text FROM documents WHERE doc_id = 2)
         |         WHEN doc_id = 3 THEN (SELECT text FROM documents WHERE doc_id = 4)
         |         ELSE text END AS text
         |  FROM documents WHERE doc_id NOT IN (5, 8)
         |  UNION ALL
         |  SELECT 900001, (SELECT text FROM documents WHERE doc_id = 6)
         |),
         |${bm25OracleSql("docs2")}""".stripMargin,

    // Replays both scoring passes plus the expansion selection: seed
    // top-10, feedback tf, candidate df, tfsum·idf ×1e6 weights, top-5
    // (w desc, term) cut, union with the query, re-score, top-15.
    "bm25_prf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, len(string_split($dNorm, ' ')) AS dl,
         |         unnest(string_split($dNorm, ' ')) AS term
         |  FROM documents
         |), stats AS (
         |  SELECT count(*) AS n, sum(len(string_split($dNorm, ' '))) AS sumdl
         |  FROM documents
         |), f0 AS (
         |  SELECT doc_id, term, dl, count(*) AS tf
         |  FROM tok WHERE term IN ($termsSql)
         |  GROUP BY doc_id, term, dl
         |), d0 AS (
         |  SELECT term, count(*) AS df FROM f0 GROUP BY term
         |), t0 AS (
         |  SELECT f0.doc_id, CAST(round(
         |    ln(1e0 + ((s.n - d.df + 5e-1) / (d.df + 5e-1))) *
         |    ((f0.tf * 2.2e0) / (f0.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * (f0.dl / (s.sumdl / s.n))))) *
         |    1e6) AS BIGINT) AS ts
         |  FROM f0 JOIN d0 d USING (term) CROSS JOIN stats s
         |), seed AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score
         |    FROM t0 GROUP BY doc_id)
         |  ORDER BY score DESC, doc_id LIMIT 10
         |), fb AS (
         |  SELECT term, count(*) AS tfsum FROM tok JOIN seed USING (doc_id)
         |  WHERE term NOT IN ($termsSql) GROUP BY term
         |), cdf AS (
         |  SELECT tok.term, count(DISTINCT tok.doc_id) AS df
         |  FROM tok JOIN fb USING (term) GROUP BY tok.term
         |), wexp AS (
         |  SELECT fb.term, CAST(round(fb.tfsum *
         |    ln(1e0 + ((s.n - c.df + 5e-1) / (c.df + 5e-1))) * 1e6) AS BIGINT) AS w
         |  FROM fb JOIN cdf c USING (term) CROSS JOIN stats s
         |), qx AS (
         |  SELECT term FROM (SELECT term, w FROM wexp ORDER BY w DESC, term LIMIT 5)
         |  UNION SELECT unnest([$termsSql]) AS term
         |), f AS (
         |  SELECT doc_id, term, dl, count(*) AS tf
         |  FROM tok WHERE term IN (SELECT term FROM qx)
         |  GROUP BY doc_id, term, dl
         |), dfr AS (
         |  SELECT term, count(*) AS df FROM f GROUP BY term
         |), t1 AS (
         |  SELECT f.doc_id, CAST(round(
         |    ln(1e0 + ((s.n - d.df + 5e-1) / (d.df + 5e-1))) *
         |    ((f.tf * 2.2e0) / (f.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * (f.dl / (s.sumdl / s.n))))) *
         |    1e6) AS BIGINT) AS ts
         |  FROM f JOIN dfr d USING (term) CROSS JOIN stats s
         |)
         |SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score
         |FROM t1 GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    "tfidf_topk" -> {
      val idf = "(ln((1e0 + s.n) / (1e0 + d.df)) + 1e0)"
      val qidf = "(ln((1e0 + s.n) / (1e0 + coalesce(d.df, 0))) + 1e0)"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($dNorm, ' ')) AS term
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY doc_id, term
         |), dfreq AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM f GROUP BY term
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
         |), wt AS (
         |  SELECT f.doc_id, f.term,
         |    CAST(round(((f.tf * $idf) * (f.tf * $idf)) * 1e6) AS BIGINT) AS d2,
         |    CAST(round(((f.tf * $idf) * $idf) * 1e6) AS BIGINT) AS dq
         |  FROM f JOIN dfreq d USING (term) CROSS JOIN stats s
         |), norms AS (
         |  SELECT doc_id, CAST(sum(d2) AS BIGINT) AS normsq FROM wt GROUP BY doc_id
         |), dots AS (
         |  SELECT doc_id, CAST(sum(dq) AS BIGINT) AS dotq
         |  FROM wt WHERE term IN ($termsSql) GROUP BY doc_id
         |), qn AS (
         |  SELECT CAST(sum(CAST(round(($qidf * $qidf) * 1e6) AS BIGINT)) AS BIGINT) AS qnormsq
         |  FROM (SELECT unnest([$termsSql]) AS term) t
         |  LEFT JOIN dfreq d USING (term) CROSS JOIN stats s
         |)
         |SELECT doc_id, score FROM (
         |  SELECT dots.doc_id,
         |    round((dotq / 1e6) / (sqrt(normsq / 1e6) * sqrt(qn.qnormsq / 1e6)), 6) AS score,
         |    row_number() OVER (ORDER BY
         |      (dotq / 1e6) / (sqrt(normsq / 1e6) * sqrt(qn.qnormsq / 1e6)) DESC,
         |      dots.doc_id) AS rn
         |  FROM dots JOIN norms USING (doc_id) CROSS JOIN qn
         |) WHERE rn <= 15
         |ORDER BY score DESC, doc_id""".stripMargin
    },

    "hybrid_rrf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, len(string_split($dNorm, ' ')) AS dl,
         |         unnest(string_split($dNorm, ' ')) AS term
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, term, dl, count(*) AS tf
         |  FROM tok WHERE term IN ($termsSql)
         |  GROUP BY doc_id, term, dl
         |), dfreq AS (
         |  SELECT term, count(*) AS df FROM f GROUP BY term
         |), stats AS (
         |  SELECT count(*) AS n, sum(len(string_split($dNorm, ' '))) AS sumdl
         |  FROM documents
         |), terms AS (
         |  SELECT f.doc_id, CAST(round(
         |    ln(1e0 + ((s.n - d.df + 5e-1) / (d.df + 5e-1))) *
         |    ((f.tf * 2.2e0) / (f.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * (f.dl / (s.sumdl / s.n))))) *
         |    1e6) AS BIGINT) AS ts
         |  FROM f JOIN dfreq d USING (term) CROSS JOIN stats s
         |), bm AS (
         |  SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score
         |  FROM terms GROUP BY doc_id
         |  ORDER BY score DESC, doc_id LIMIT 50
         |), lex AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
         |  FROM bm
         |), q AS (
         |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
         |), vtop AS (
         |  SELECT e.vec_id AS doc_id,
         |         ${VectorQueries.duckL2sq("e.embedding", "q.qv")} AS d
         |  FROM embeddings e CROSS JOIN q
         |  ORDER BY d, doc_id LIMIT 50
         |), vec AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY d, doc_id) AS vrank
         |  FROM vtop
         |)
         |SELECT doc_id,
         |  round(coalesce(1e0 / (60 + l.lrank), 0e0) +
         |        coalesce(1e0 / (60 + v.vrank), 0e0), 6) AS rrf
         |FROM lex l FULL OUTER JOIN vec v USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    "mmr_rerank" -> mmrOracle(k = 5),

    // mirrors phrase_match: trigram stats pick the phrase, occurrence
    // positions come from the same adjacency arithmetic (j 1-based
    // here, first_pos reported 0-based like Spark's posexplode)
    "phrase_match" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, string_split($dNorm, ' ') AS t FROM documents
         |), tri AS MATERIALIZED (
         |  SELECT doc_id, j, t[j] || ' ' || t[j+1] || ' ' || t[j+2] AS ph
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS j
         |        FROM tk WHERE len(t) >= 3)
         |), top AS MATERIALIZED (
         |  SELECT ph FROM tri GROUP BY ph ORDER BY count(*) DESC, ph LIMIT 1
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ,
         |  CAST(min(j) - 1 AS BIGINT) AS first_pos
         |FROM tri JOIN top USING (ph)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
