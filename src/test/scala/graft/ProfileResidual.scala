package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Pq}
import graft.sources.Tables

/** Scratch experiment (round 9): does residual IVF-PQ beat raw-vector
  * IVF-PQ on this corpus, and how much does the coarse quantizer's
  * quality matter? Compares panel hits + corpus distortion for
  * raw/residual codebooks over seed vs Lloyd-refined coarse cells. */
object ProfileResidual {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, dir)
    val panelIds = Seq(0L, 42L, 100L, 137L, 200L, 251L, 300L, 375L, 400L, 489L)

    val seedCents = Ann.collectCentroids(Ann.seedCentroids(e, 8))
    val r1 = Ann.refine(e, Ann.seedCentroids(e, 8))
      .select($"cell", transform($"centroid", m => round(m, 6)).as("centroid"))
    val r2 = Ann.refine(e, r1)
      .select($"cell", transform($"centroid", m => round(m, 6)).as("centroid"))
    val refCents = Ann.collectCentroids(r2)

    val qs = e.filter($"vec_id".isin(panelIds: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    import graft.expressions.BottomK.bottomK
    def top10(scored: org.apache.spark.sql.DataFrame) = scored
      .groupBy($"qid").agg(bottomK($"score", $"vec_id".cast("long"), 10).as("t"))
      .select($"qid", explode($"t").as("h")).select($"qid", $"h.id".as("vec_id"))
    val exact10 = top10(e.crossJoin(broadcast(qs)).select($"qid", $"vec_id",
      graft.functions.VectorFunctions.l2sq($"embedding", $"qv").as("score")))
      .persist()
    exact10.count()

    def probeQ(cents: Seq[(Long, Array[Float])]) = {
      val pairs = e.filter($"vec_id".isin(panelIds: _*))
        .select($"vec_id", $"embedding").collect().toSeq
        .flatMap { r =>
          val qv = r.getSeq[Float](1).toArray
          cents.map { case (cid, c) => (Pq.l2sqLocal(qv, c), cid) }
            .sorted.take(2).map { case (_, cid) => (r.getLong(0), cid) }
        }
      pairs.toDF("qid", "cell").join(qs, "qid")
    }

    def report(name: String, cents: Seq[(Long, Array[Float])],
        residual: Boolean, iters: Int): Unit = {
      val (enc, model, distDf) = if (residual) {
        val m = Pq.trainResidual(e, cents, 8, 16, iters)
        (Pq.encodeIvfResidual(e, cents, m), m,
          e.select(Pq.residualCol($"embedding",
            Ann.nearestCell($"embedding", cents), cents).as("r"))
            .agg(sum(Pq.distortionCol($"r", m))))
      } else {
        val m = Pq.trainRefined(e, 8, 16, iters)
        (Pq.encodeIvf(e, cents, m), m,
          e.agg(sum(Pq.distortionCol($"embedding", m))))
      }
      val scored = enc.join(broadcast(probeQ(cents)), "cell")
        .select($"qid", $"vec_id", (if (residual)
          Pq.adcBatchCol($"codes", Pq.residualCol($"qv", $"cell", cents), model)
        else Pq.adcBatchCol($"codes", $"qv", model)).cast("double").as("score"))
      val hits = top10(scored).join(exact10, Seq("qid", "vec_id")).count()
      val exactProbed = top10(enc.join(broadcast(probeQ(cents)), "cell")
        .join(e.select($"vec_id", $"embedding"), "vec_id")
        .select($"qid", $"vec_id",
          graft.functions.VectorFunctions.l2sq($"embedding", $"qv").as("score")))
      val hitsP = top10(scored).join(exactProbed, Seq("qid", "vec_id")).count()
      val dist = distDf.head.getLong(0)
      println(f"$name%-28s hits=$hits%3d hitsProbed=$hitsP%3d distortion=$dist%12d")
    }

    report("raw  + seed cells  (it2)", seedCents, residual = false, 2)
    report("res  + seed cells  (it2)", seedCents, residual = true, 2)
    report("raw  + lloyd cells (it2)", refCents, residual = false, 2)
    report("res  + lloyd cells (it2)", refCents, residual = true, 2)
    report("res  + lloyd cells (it4)", refCents, residual = true, 4)
    report("res  + seed cells  (it4)", seedCents, residual = true, 4)
    report("raw  + lloyd cells (it4)", refCents, residual = false, 4)
    report("raw  + seed cells  (it4)", seedCents, residual = false, 4)
    report("res  + lloyd cells (it6)", refCents, residual = true, 6)
    spark.stop()
  }
}
