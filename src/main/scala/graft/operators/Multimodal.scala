package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata (north star requirement).
  *
  * The Spark-side machinery — schema, partitioning, batch shape, frame
  * explosion, feature columns — is real and tested. The actual media
  * decode is STUBBED behind `decodeStub` (deterministic fake: no media
  * codecs exist in this environment); swapping in a real decoder means
  * replacing that one function (e.g. with a mapPartitions over a JNI
  * codec, batching per partition), with every downstream operator
  * unchanged.
  *
  * Scale notes: binary payloads dominate row size, so operators here
  *  - never shuffle the bytes when only metadata is needed (metadata
  *    projections prune the binary column at the parquet scan);
  *  - key all joins/groupBys on `media_id`, letting AQE handle skew from
  *    heterogeneous blob sizes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),    // typed metadata, nullable
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Deterministic fake decode: "dimensions" and a checksum derived from
    * the payload alone. Stands in for a real codec (`???` territory —
    * clearly marked stub). */
  def decodeStub(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", length(col("bytes")).cast("long"))
      .withColumn("checksum", crc32(col("bytes")))
      .withColumn("dec_width", (abs(crc32(col("bytes"))) % 1920 + 1).cast("int"))
      .withColumn("dec_height", (abs(xxhash64(col("bytes"))) % 1080 + 1).cast("int"))

  /** "Feature extraction": a fixed-width float vector from the payload —
    * the deterministic stand-in for an embedding model. Output shape is
    * the real contract: ARRAY<FLOAT> of `dim`, non-null. Feature j is an
    * md5-prefix hash of (bytes ‖ ":j") scaled to [0, 1) — md5 rather
    * than xxhash so an oracle engine can recompute the exact vector and
    * value-check pipelines built on top (see the multimodal_ann query).
    */
  def featurizeStub(media: DataFrame, dim: Int = 8): DataFrame =
    media.withColumn("features",
      transform(sequence(lit(1), lit(dim)), i =>
        ((conv(substring(md5(concat(col("bytes"),
            encode(concat(lit(":"), i.cast("string")), "UTF-8"))), 1, 8), 16, 10)
          .cast("long") % 1000).cast("double") / 1000d).cast("float")))

  /** Frame sampling for video rows: one output row per sampled frame
    * index (every `everyMs` of duration). Non-video rows pass through
    * with frame_idx = 0. The explode multiplies rows, not bytes — the
    * binary column is dropped before the explode. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val nFrames = when(col("kind") === "video",
      greatest((col("duration_ms") / everyMs).cast("int"), lit(1)))
      .otherwise(lit(1))
    media
      .select(col("media_id"), col("kind"), col("duration_ms"))
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
  }

  /** Decoded-media record for the partitioned decode path. */
  final case class DecodedMedia(media_id: Long, kind: String,
      byte_len: Long, dec_width: Int, dec_height: Int)

  /** Per-partition batched decode — the integration shape for a REAL
    * codec (JNI/native library): the decoder is initialized once per
    * partition (expensive setup amortized over the partition's rows) and
    * streamed over the rows without materializing the partition. This is
    * the deliberate `mapPartitions` last-resort tier (SURVEY.md §2
    * preference order) — appropriate here because a codec is imperative
    * per-row work no Catalyst expression can express. The decode itself
    * is STUBBED (deterministic function of the bytes); swap the body of
    * `decodeOne` for the real codec call. */
  def decodePartitioned(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // stand-in for expensive per-partition codec initialization
        val codec = new java.util.zip.CRC32()
        def decodeOne(bytes: Array[Byte]): (Long, Int, Int) = {
          codec.reset(); codec.update(bytes)
          val c = codec.getValue
          (bytes.length.toLong, (c % 1920 + 1).toInt, ((c >> 11) % 1080 + 1).toInt)
        }
        rows.map { case (id, kind, bytes) =>
          val (len, w, h) = decodeOne(bytes)
          DecodedMedia(id, kind, len, w, h)
        }
      }
      .toDF()
  }

  /** Resize plumbing: records target dims + scale factors from the
    * stub-decoded dims; a real implementation would transform `bytes`. */
  def resizePlan(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame =
    decoded
      .withColumn("target_w", lit(targetW))
      .withColumn("target_h", lit(targetH))
      .withColumn("scale_x", col("target_w").cast("double") / col("dec_width"))
      .withColumn("scale_y", col("target_h").cast("double") / col("dec_height"))
}
