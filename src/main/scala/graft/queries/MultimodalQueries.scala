package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Oracle-checked multimodal plumbing (north star): media rows are
  * synthesized DETERMINISTICALLY from `documents` (bytes = UTF-8 text,
  * kind from doc_id mod 3, duration from n_chars), then run through the
  * REAL Spark-side machinery — the per-partition batched decode
  * (mapPartitions, the integration shape for an actual codec) and the
  * frame-sampling explode — and aggregated on the SQL-expressible stub
  * surface (byte lengths, frame counts/timestamps) so DuckDB can verify
  * values end to end. The crc/xxhash-derived stub dims stay Spark-side
  * (unit-tested in MultimodalSpec); they are not part of the oracle
  * contract. */
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
        |ORDER BY kind""".stripMargin)
}
