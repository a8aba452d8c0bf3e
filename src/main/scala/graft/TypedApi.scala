package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.operators.Knn

/** Thin typed surface over the core operators (SURVEY.md §1.1: the
  * reference's data model as case classes). The DataFrame API remains
  * the primary engine surface; these wrappers give compile-time field
  * checks at the API edge. */
object TypedApi {

  /** `(id, vector, shard)` — proto/search.proto:45-49's UpsertRequest. */
  final case class VectorPoint(id: Long, embedding: Seq[Float], shardId: String)

  /** `(id, distance, shard)` — proto/search.proto:27-31's ScoredPoint.
    * distance is SQUARED L2 (FAISS parity). */
  final case class ScoredPoint(id: Long, distance: Double, shardId: String)

  /** Mutation-log record — proto/mutation.proto:7-14. */
  final case class Mutation(logIndex: Long, op: String, id: Long,
      shardId: String, embedding: Seq[Float])

  /** Exact top-k over a typed vector set; deterministic (distance, id)
    * order; the shard travels with the hit (reference ScoredPoint shape).
    * Plans as TakeOrderedAndProject like the untyped path. */
  def knn(points: Dataset[VectorPoint], query: Seq[Float], k: Int)
      (implicit spark: SparkSession): Dataset[ScoredPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.l2sq
    points.toDF()
      .select($"id", l2sq($"embedding", lit(query.toArray)).as("distance"), $"shardId")
      .orderBy($"distance", $"id")
      .limit(math.max(k, 0))
      .as[ScoredPoint]
  }
}
