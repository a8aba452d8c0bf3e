package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane p,
    * component d is `hash32("p:d") / 2^31 - 1` ∈ [-1, 1) — derived from
    * md5 so the oracle can regenerate the identical matrix in SQL.
    * Computed once on the driver and embedded as a literal (the per-row
    * work is just `planes` dot products). */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until planes).map(p => (1 to dim).map(d =>
      hash32(s"$p:$d").toDouble / math.pow(2, 31) - 1.0))
  }

  /** Sign-LSH bucket id of an embedding: bit p set iff dot(w_p, x) ≥ 0.
    * Cosine-similar vectors agree on most signs → same/nearby buckets.
    * This is the hash-bucket scale path for cosine ANN (the IVF below is
    * the partition-pruning path); both trade recall for scan fraction. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.size
    planes.zipWithIndex.map { case (w, p) =>
      val dotP = (1 to dim).map(d =>
        lit(w(d - 1)) * element_at(emb, d).cast("double")).reduce(_ + _)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Attach sign-LSH buckets; vectors store/shuffle by `lsh_bucket`. */
  def withLshBucket(vectors: DataFrame, planes: Int = 16,
      embCol: String = "embedding", dim: Int = 64): DataFrame =
    vectors.withColumn("lsh_bucket", lshBucket(col(embCol), hyperplanes(planes, dim)))

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
