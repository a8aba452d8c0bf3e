package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Oracle-checked multimodal plumbing (north star): media rows are
  * synthesized DETERMINISTICALLY from `documents` (bytes = UTF-8 text,
  * kind from doc_id mod 3, duration from n_chars), then run through the
  * REAL Spark-side machinery — the per-partition batched decode
  * (mapPartitions, the integration shape for an actual codec), the
  * frame-sampling explode, and the md5-derived featurize stub feeding a
  * full IVF search — so DuckDB can verify values end to end:
  * `multimodal_stats` checks the SQL-expressible stub surface (byte
  * lengths, frame counts/timestamps) and `multimodal_ann` replays the
  * featurize→centroid→probe→top-k chain exactly. Only the
  * decode-metadata stub dims that a real codec would replace (width /
  * sample-rate style fields) stay Spark-side, unit-tested in
  * MultimodalSpec. */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("n_chars") * 40).cast("long").as("duration_ms"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-kind stats through the partitioned decode (mapPartitions) and
    // the frame-sampling explode. The binary column is dropped before
    // the explode — frames multiply rows, never bytes.
    "multimodal_stats" -> ((s, dir) => {
      import s.implicits._
      val m = media(s, dir)
      val decoded = Multimodal.decodePartitioned(m)
        .groupBy($"kind")
        .agg(count(lit(1)).as("n_media"),
          sum($"byte_len").as("total_bytes"),
          max($"byte_len").as("max_bytes"))
      val frames = Multimodal.sampleFrames(m, everyMs = 1000L)
        .groupBy($"kind")
        .agg(count(lit(1)).as("n_frames"),
          sum($"frame_ts_ms").as("sum_frame_ts"))
      decoded.join(frames, "kind")
        .select($"kind", $"n_media", $"total_bytes", $"max_bytes",
          $"n_frames", $"sum_frame_ts")
        .orderBy($"kind")
    }),

    // The embedding-pipeline shape end to end: media bytes → featurize
    // stub (md5-derived ARRAY<FLOAT>, oracle-recomputable) → IVF search
    // (seed centroids, nprobe-cell probing, BottomK per-query top-k).
    // The oracle replays the identical algorithm from the text column.
    "multimodal_ann" -> ((s, dir) => {
      import s.implicits._
      val feats = Multimodal.featurizeStub(media(s, dir), dim = 8)
        .select($"media_id".as("vec_id"), $"features".as("embedding"))
      val centroids = graft.operators.Ann.seedCentroids(feats, 4)
      val q = feats.filter($"vec_id".isin(50L, 250L))
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      graft.operators.Ann.search(feats, centroids, q, k = 10, nprobe = 2)
        .select($"query_id", $"vec_id",
          round($"distance", 6).as("distance"), $"rank")
        .orderBy($"query_id", $"rank")
    }))

  def oracle: Map[String, String] = Map(

    // Frame counts in closed form: a video row samples
    // greatest(trunc(duration/1000), 1) frames at 0,1000,2000,… ms, so
    // the timestamp sum is 1000·n(n−1)/2; non-video rows contribute one
    // frame at ts 0.
    "multimodal_stats" ->
      """WITH m AS (
        |  SELECT CASE CAST(doc_id % 3 AS INT)
        |           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |         octet_length(encode(text)) AS byte_len,
        |         n_chars * 40 AS duration_ms
        |  FROM documents
        |), f AS (
        |  SELECT kind, byte_len,
        |         CASE WHEN kind = 'video'
        |              THEN greatest(CAST(trunc(duration_ms / 1000.0) AS BIGINT), 1)
        |              ELSE 1 END AS nf
        |  FROM m
        |)
        |SELECT kind,
        |  count(*) AS n_media,
        |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |  CAST(max(byte_len) AS BIGINT) AS max_bytes,
        |  CAST(sum(nf) AS BIGINT) AS n_frames,
        |  CAST(sum(1000 * nf * (nf - 1) / 2) AS BIGINT) AS sum_frame_ts
        |FROM f
        |GROUP BY kind
        |ORDER BY kind""".stripMargin,

    // Replays featurizeStub + IVF search exactly: feature j of a media
    // row is hash32(bytes || ':' || j) % 1000 / 1000 as REAL (bytes =
    // UTF-8 of text, so md5 sees identical input), centroids are the 4
    // lowest ids, assignment/probing break distance ties by cell id,
    // top-10 per query by (distance, vec_id).
    "multimodal_ann" -> {
      def h32(s: String): String =
        s"CAST(list_sum(list_transform(range(1,9), i -> " +
          s"(strpos('0123456789abcdef', md5($s)[i:i]) - 1) * 16^(8-i))) AS BIGINT)"
      val l2 = VectorQueries.duckL2sq _
      s"""WITH feats AS (
         |  SELECT doc_id AS vec_id,
         |    list_transform(range(1,9), j -> CAST(CAST(
         |      ${h32("text || ':' || CAST(j AS VARCHAR)")} % 1000
         |      AS DOUBLE) / 1000 AS REAL)) AS embedding
         |  FROM documents
         |), cents AS (
         |  SELECT vec_id AS cell, embedding AS centroid FROM feats WHERE vec_id < 4
         |), assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT f.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY f.vec_id
         |        ORDER BY ${l2("f.embedding", "c.centroid")}, c.cell) AS rn
         |    FROM feats f CROSS JOIN cents c
         |  ) WHERE rn = 1
         |), queries AS (
         |  SELECT vec_id AS query_id, embedding AS qvec FROM feats
         |  WHERE vec_id IN (50, 250)
         |), probed AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.query_id, q.qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${l2("q.qvec", "c.centroid")}, c.cell) AS crn
         |    FROM queries q CROSS JOIN cents c
         |  ) WHERE crn <= 2
         |), scored AS (
         |  SELECT p.query_id, f.vec_id,
         |    ${l2("f.embedding", "p.qvec")} AS dist_raw,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY ${l2("f.embedding", "p.qvec")}, f.vec_id) AS rank
         |  FROM probed p
         |  JOIN assigned a ON a.cell = p.cell
         |  JOIN feats f ON f.vec_id = a.vec_id
         |)
         |SELECT query_id, vec_id, round(dist_raw, 6) AS distance,
         |       CAST(rank AS BIGINT) AS rank
         |FROM scored WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    })
}
