package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Decontaminate
import graft.sources.Tables
import graft.queries.TextQueries.dNorm

/** Benchmark decontamination over the documents corpus: a deterministic
  * slice (doc_id % 41 == 0) plays the held-out eval set; the rest is
  * the training corpus. The oracle replays normalization, word n-gram
  * extraction, per-doc distinct-ing, and the overlap join end to end,
  * so the whole contamination check is value-verified.
  *
  * n = 3 here: the synthetic docs are short templated sentences, and 3
  * is the smallest n with non-trivial cross-doc phrase overlap (n >= 5
  * finds zero on this corpus); production pipelines use the same
  * operator with n in 8–13 (GPT-3 appendix C).
  */
object DecontamQueries extends QueryPack {

  private val N = 3
  // Bloom config for decontam_bloom: 16 Kbit × 3 hashes ≈ 27 bits per
  // eval gram at sf0.01 (~600 grams) — per-gram FP ≈ 0.1%, so a handful
  // of docs are flagged purely by false positives and the
  // n_bloom/n_exact honesty gap is exercised, not just asserted.
  // Production sizing is the same rule (≈10+ bits per benchmark gram):
  // the filter stays KBs–MBs while the exact gram set grows with the
  // suite.
  private val M = 16384
  private val KH = 3

  import graft.queries.DuckSql.dHash32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Audit view: every contaminated training doc with its count of
    // distinct eval-shared 3-grams. Integer output — hash-exact.
    "decontam_overlap" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      Decontaminate.overlap(
          docs.filter($"doc_id" % 41 =!= 0),
          docs.filter($"doc_id" % 41 === 0), n = N)
        .orderBy($"doc_id")
    }),

    // The cleaned corpus (ids + audit columns): training docs with zero
    // eval overlap — what a pipeline persists as the decontaminated set.
    "decontam_keep" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      Decontaminate.keep(
          docs.filter($"doc_id" % 41 =!= 0),
          docs.filter($"doc_id" % 41 === 0), n = N)
        .select($"doc_id", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Bounded-state contamination audit: an m-bit Bloom filter of the
    // eval grams replaces the full gram set; n_bloom >= n_exact per doc,
    // the gap = false positives (config-bounded state, conservative
    // errors). The corpus side is scan → project → filter — zero
    // shuffle.
    "decontam_bloom" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      Decontaminate.bloomAudit(
          docs.filter($"doc_id" % 41 =!= 0),
          docs.filter($"doc_id" % 41 === 0), n = N, m = M, kh = KH)
        .orderBy($"doc_id")
    })
  )

  /** Shared gram CTEs: normalized tokens → per-doc DISTINCT 3-gram
    * list → eval gram set / training gram pairs. Mirrors
    * [[Decontaminate.ngramsCol]] exactly (same normalization as the
    * Spark side's TextFunctions.normText). */
  private val gramCtes =
    s"""tok AS (
       |  SELECT doc_id, string_split($dNorm, ' ') AS t FROM documents
       |), g AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= $N
       |      THEN list_transform(range(1, len(t) - ${N - 2}),
       |                          i -> array_to_string(t[i:i+${N - 1}], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END) AS gs
       |  FROM tok
       |), ev AS (
       |  SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 41 = 0
       |), tr AS (
       |  SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 41 <> 0
       |)""".stripMargin

  def oracle: Map[String, String] = Map(

    "decontam_overlap" ->
      s"""WITH $gramCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM tr JOIN ev USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "decontam_keep" ->
      s"""WITH $gramCtes,
         |flagged AS (
         |  SELECT DISTINCT doc_id FROM tr JOIN ev USING (gram)
         |)
         |SELECT doc_id, source, n_chars FROM documents
         |WHERE doc_id % 41 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
         |ORDER BY doc_id""".stripMargin,

    // Replays the seed-prefixed position family ("s:gram" → hash32 mod
    // M), the distinct filter build, and the all-kh-positions probe.
    "decontam_bloom" ->
      s"""WITH $gramCtes,
         |bloom AS (
         |  SELECT DISTINCT
         |    ${dHash32("CAST(s AS VARCHAR) || ':' || gram")} % $M AS pos
         |  FROM ev CROSS JOIN range(1, ${KH + 1}) r(s)
         |), trs AS (
         |  SELECT doc_id, gram,
         |    ${dHash32("CAST(s AS VARCHAR) || ':' || gram")} % $M AS pos
         |  FROM tr CROSS JOIN range(1, ${KH + 1}) r(s)
         |), hit AS (
         |  SELECT doc_id, gram FROM trs JOIN bloom USING (pos)
         |  GROUP BY doc_id, gram HAVING count(*) = $KH
         |), ex AS (
         |  SELECT doc_id, gram FROM tr JOIN ev USING (gram)
         |), base AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM tr
         |  GROUP BY doc_id
         |)
         |SELECT base.doc_id, base.n_grams,
         |  CAST(coalesce(hb.c, 0) AS BIGINT) AS n_bloom,
         |  CAST(coalesce(he.c, 0) AS BIGINT) AS n_exact
         |FROM base
         |LEFT JOIN (SELECT doc_id, count(*) AS c FROM hit GROUP BY doc_id) hb
         |  USING (doc_id)
         |LEFT JOIN (SELECT doc_id, count(*) AS c FROM ex GROUP BY doc_id) he
         |  USING (doc_id)
         |WHERE coalesce(hb.c, 0) > 0
         |ORDER BY doc_id""".stripMargin
  )
}
