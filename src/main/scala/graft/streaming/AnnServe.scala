package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.BottomK.bottomK
import graft.functions.VectorFunctions.l2sq
import graft.operators.Ann

/** Online ANN serving — the reference's Search RPC loop
  * (`src/rpc/search_service_impl.cc:26-50`) re-expressed as ONE
  * Structured Streaming plan: a stream of query vectors served against
  * a static corpus snapshot.
  *
  * Shape, per micro-batch of arriving queries:
  *  - probe-cell ranking is ROW-LOCAL on the stream side
  *    ([[Ann.probeCells]] — the centroid table rides as a literal or
  *    torrent broadcast, never a join);
  *  - the candidate fetch is a stream-static EQUI-join on the IVF cell
  *    (the static side is re-read per batch; a cell-partitioned store
  *    makes that a pruned read of nprobe/K of the files);
  *  - the per-query top-k is the [[graft.expressions.BottomK]] partial
  *    aggregate. The static side is fully present in every batch, so a
  *    query's result is FINAL in the micro-batch it arrives — update
  *    mode emits each query's row exactly once.
  *
  * The result keeps the top-k as a sorted ARRAY column (explode after a
  * streaming aggregate is restricted; sinks/readers explode it freely).
  *
  * State: one k-bounded row per served query id, forever — the cost of
  * the single-plan form. An unbounded production stream should either
  * retire served ids at the sink or run fully stateless via
  * [[graft.operators.Ann.search]] inside `foreachBatch` (the same
  * per-batch plan without aggregate state). */
object AnnServe {

  def annServeStream(
      queryStream: DataFrame,
      vectors: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    require(k > 0, "k must be positive")
    val cents = Ann.collectCentroids(centroids)
    val shared = if (cents.size <= Ann.InlineCentroidMax) None
      else Some(Ann.broadcastCentroids(cents))
    val withCell = vectors.withColumn("cell",
      Ann.nearestCell(col(embCol), cents, shared))
    val probed = queryStream
      .select(col(queryIdCol), col(queryVecCol),
        explode(Ann.probeCells(col(queryVecCol), cents, nprobe, shared)).as("cell"))
    probed.join(withCell, "cell") // stream-static equi join
      .select(col(queryIdCol),
        l2sq(col(embCol), col(queryVecCol)).as("distance"),
        col(idCol))
      .groupBy(col(queryIdCol))
      .agg(bottomK(col("distance"), col(idCol).cast("long"), k).as("topk"))
  }

  /** Start an update-mode in-memory serving endpoint for [[annServeStream]]
    * under the reference's MICRO-BATCHING contract
    * (`BatchingConfig.max_batch_delay_ms`, `src/util/config.cc:44-47`,
    * default 2 ms): requests coalesce for up to the configured delay and
    * then execute as one batch. A processing-time trigger IS that
    * delay-based batcher — queries arriving within one trigger interval
    * share a single plan execution. (`preferred_batch_size` needs no
    * data-plane wiring: a Spark batch serves ANY width in one pass, so
    * there is no per-request loop to amortize — the config field the
    * reference holds but also never reads, `shard_manager.cc:14-15`.)
    * Read results from `spark.table(queryName)`; stop via the returned
    * handle. */
  def startServing(
      served: DataFrame,
      queryName: String,
      batching: graft.util.BatchingSettings = graft.util.BatchingSettings())
      : org.apache.spark.sql.streaming.StreamingQuery =
    served.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        batching.maxBatchDelayMs.toLong, java.util.concurrent.TimeUnit.MILLISECONDS))
      .format("memory")
      .queryName(queryName)
      .start()
}
