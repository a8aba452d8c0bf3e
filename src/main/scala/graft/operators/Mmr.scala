package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — diversify a top-k answer so near-duplicate hits don't crowd
  * it: greedily pick argmax_c [ λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s) ]
  * over the not-yet-selected candidates. The standard post-retrieval
  * diversification every production vector-search serving layer offers;
  * the reference's flat-FAISS pipeline returns raw top-k
  * (`src/index/vector_shard.cc`), so this is the serving-quality upgrade
  * on top.
  *
  * Spark-first split, and the scale argument:
  *  - STAGE 1 (distributed, the expensive part): exact top-`r` shortlist
  *    by L2 — TakeOrderedAndProject per-partition heaps over N vectors.
  *  - STAGE 2 (driver, O(k·r) over r rows): the greedy MMR loop is
  *    inherently sequential (step i depends on the selected set of step
  *    i−1) and r is an API-edge constant (20–200), so it runs where the
  *    reference's re-rankers run too: on the r-row result, never the
  *    corpus — the [[SearchService]] ≤k hit-list bound, documented and
  *    deliberate.
  *
  * Cross-engine determinism: relevance and pairwise similarities are
  * cosines computed with the library's exact left-fold dot (mirrored by
  * the DuckDB oracle's `duckDot`), and every greedy comparison happens
  * on ×1e6 half-up INTEGER-quantized scores with an id tiebreak — the
  * [[Pq]] LUT move — so selection order is bit-reproducible across
  * engines, parallelism levels, and platforms.
  */
object Mmr {

  /** Exact mirror of [[graft.expressions.DotProduct]]'s left fold. */
  private[graft] def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, "dimension mismatch")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Cosine with the same operation shape as
    * [[graft.functions.VectorFunctions.cosine]]: dot / (‖a‖ · ‖b‖). */
  private[graft] def cosLocal(a: Array[Float], b: Array[Float]): Double =
    dotLocal(a, b) / (math.sqrt(dotLocal(a, a)) * math.sqrt(dotLocal(b, b)))

  private def q6(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  /** MMR top-k: (rank, id, score_q) where `score_q` is the ×1e6
    * integer-quantized marginal score at selection time. `lambda`
    * weighs relevance against diversity (1.0 = plain top-k). */
  def rerank(spark: SparkSession, vectors: DataFrame, query: Array[Float],
      r: Int, k: Int, lambda: Double = 0.7,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k <= r, s"k=$k must be <= shortlist r=$r")
    val penaltyW = 1.0 - lambda
    // stage 1: distributed exact shortlist; ONE TakeOrdered job, r rows
    // to the driver (bounded by the API parameter, never by N)
    val cand: Array[(Long, Array[Float])] = vectors
      .select(col(idCol).cast("long"), col(embCol),
        l2sq(col(embCol), lit(query)).as("d"))
      .orderBy(col("d"), col(idCol))
      .limit(r)
      .collect()
      .map { row =>
        (row.getLong(0), row.getSeq[Float](1).toArray)
      }
    // stage 2 is DRIVER-RESIDENT compute (the greedy loop) — report it
    // through DriverMeter (the bench's `driver_s` bucket)
    graft.util.DriverMeter.time {
    val embById = cand.toMap
    val rel: Map[Long, Double] = cand.map { case (id, emb) =>
      id -> cosLocal(query, emb)
    }.toMap
    // stage 2: greedy selection on integer-quantized marginal scores
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val remaining = scala.collection.mutable.LinkedHashSet(cand.map(_._1): _*)
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.iterator.map { id =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map { case (_, sid, _) =>
            cosLocal(embById(id), embById(sid))
          }.max
        id -> q6(lambda * rel(id) - penaltyW * maxSim)
      }.toSeq
      val (bestId, bestScore) = scored.minBy { case (id, s) => (-s, id) }
      selected += ((rank, bestId, bestScore))
      remaining.remove(bestId)
      rank += 1
    }
    import spark.implicits._
    selected.toSeq.toDF("rank", idCol, "score_q")
    } // DriverMeter.time
  }
}
