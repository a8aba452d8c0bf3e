package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search — the scale path past the
  * reference's exact-only scan (`faiss::IndexFlatL2`,
  * `src/index/vector_shard.cc:41-42`).
  *
  * IVF (inverted-file) layout, Spark-first:
  *  - BUILD: pick K centroids (deterministic seed rows, optionally
  *    refined by Lloyd iterations — each iteration is one groupBy), then
  *    assign every vector to its nearest centroid. The assignment is a
  *    broadcast join (centroids are tiny) + per-vector argmin window —
  *    no shuffle of the vector table.
  *  - STORE: partition the table by `cell`. At 100 TB each cell is a
  *    parquet partition; probing = partition pruning, i.e. the scan
  *    reads nprobe/K of the data — same pruning Catalyst already does
  *    for `shard_id`.
  *  - SEARCH: rank cells by centroid distance, scan the nprobe nearest
  *    cells exactly, top-k. Recall < 1 by design; brute force (Knn) is
  *    the recall-1.0 baseline.
  */
object Ann {

  /** Deterministic centroid seeds: the first `k` vectors by id.
    * (Zero-iteration k-means; `refine` runs Lloyd steps.) */
  def seedCentroids(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cell"), col(embCol).as("centroid"))

  /** One Lloyd refinement step: mean of assigned vectors per cell.
    * (Float means are order-sensitive — refined centroids are for
    * performance experiments, not oracle-checked queries.) */
  def refine(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val assigned = assign(vectors, centroids, idCol, embCol)
      .join(vectors, idCol)
    val dim = org.apache.spark.sql.functions.size(col(embCol))
    assigned.groupBy(col("cell"))
      .agg(array_agg(col(embCol)).as("members"))
      .select(col("cell"),
        expr(s"transform(sequence(1, size(members[0])), " +
          s"i -> aggregate(members, 0.0D, (acc, m) -> acc + m[i-1]) / size(members))")
          .as("centroid"))
  }

  /** Assign each vector to its nearest centroid (broadcast + argmin). */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .select(col(idCol), col("cell"),
        l2sq(col(embCol), col("centroid")).as("cdist"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cell"))
  }

  /** IVF search: probe the `nprobe` cells whose centroids are nearest to
    * the query, exact top-k within them. `queries` = (query_id, qvec). */
  def search(
      vectors: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val assigned = assign(vectors, centroids, idCol, embCol)
      .join(vectors, idCol)
    // cells to probe per query
    val cw = Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))
    val probed = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("cell"),
        l2sq(col("qvec"), col("centroid")).as("cdist"))
      .withColumn("crn", row_number().over(cw))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    // exact scan restricted to probed cells
    val w = Window.partitionBy(col("query_id")).orderBy(col("distance"), col(idCol))
    probed.join(assigned, "cell")
      .select(col("query_id"), col(idCol),
        l2sq(col(embCol), col("qvec")).as("distance"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
