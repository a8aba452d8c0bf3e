package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The decode is a stub; what's tested is the REAL contract — schema,
  * batch shape, determinism, binary-column pruning behavior. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "fake-image-bytes-1".getBytes, 640, 480, null),
      Row(2L, "image", "fake-image-bytes-2".getBytes, 1280, 720, null),
      Row(3L, "video", "fake-video-bytes".getBytes, 1920, 1080, 3500L),
      Row(4L, "audio", "fake-audio-bytes".getBytes, null, null, 60000L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.get(0), r.get(1), r.get(2),
        r.get(3), r.get(4), r.get(5)))),
      Multimodal.mediaSchema)
  }

  test("decodeStub is deterministic and adds typed columns") {
    val a = Multimodal.decodeStub(media).select("media_id", "checksum", "dec_width").collect()
    val b = Multimodal.decodeStub(media).select("media_id", "checksum", "dec_width").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val widths = a.map(_.getInt(2))
    assert(widths.forall(w => w >= 1 && w <= 1920))
  }

  test("featurizeStub emits fixed-width non-null float vectors") {
    val got = Multimodal.featurizeStub(media, dim = 8)
      .select($"media_id", $"features").collect()
    assert(got.length === 4)
    got.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length === 8)
      assert(f.forall(v => v >= 0f && v < 1f))
    }
    // distinct payloads → distinct features
    val f1 = got.find(_.getLong(0) == 1L).get.getSeq[Float](1)
    val f2 = got.find(_.getLong(0) == 2L).get.getSeq[Float](1)
    assert(f1 !== f2)
  }

  test("sampleFrames explodes video rows only, drops the binary column") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    assert(!frames.columns.contains("bytes")) // bytes never multiplied
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(3L) === 3) // 3500ms → 3 frames
    assert(byId(1L) === 1 && byId(4L) === 1)
    val fts = frames.filter($"media_id" === 3).select("frame_ts_ms")
      .collect().map(_.getLong(0)).sorted
    assert(fts.sameElements(Array(0L, 1000L, 2000L)))
  }

  test("resizePlan computes scale factors from decoded dims") {
    val planned = Multimodal.resizePlan(Multimodal.decodeStub(media), 224, 224)
    val r = planned.filter($"media_id" === 1).head()
    assert(r.getAs[Int]("target_w") === 224)
    val sx = r.getAs[Double]("scale_x")
    assert(sx > 0 && sx === 224.0 / r.getAs[Int]("dec_width"))
  }

  test("decodePartitioned: per-partition codec, deterministic across partitionings") {
    val once = Multimodal.decodePartitioned(media)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    val repart = Multimodal.decodePartitioned(media.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    assert(once.sameElements(repart))
    assert(once.length === 4)
    assert(once.forall { case (_, len, w) => len > 0 && w >= 1 && w <= 1920 })
  }

  test("metadata projection prunes the binary column from the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(tmp)
    val meta = spark.read.parquet(tmp).select("media_id", "kind", "duration_ms")
    val scan = meta.queryExecution.executedPlan.toString
    assert(!scan.contains("bytes"), s"binary column not pruned:\n$scan")
  }
}
