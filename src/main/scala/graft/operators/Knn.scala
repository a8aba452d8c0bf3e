package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2sq

/** Exact k-NN operators — the reference's flagship surface.
  *
  * Reference behavior reproduced:
  *  - brute-force squared-L2 scan per shard (`src/index/vector_shard.cc:72-94`)
  *  - multi-shard fan-out + top-k merge via `std::partial_sort`
  *    (`src/index/shard_manager.cc:46-51,129-145`)
  *  - batch search = independent parallel searches
  *    (`src/index/shard_manager.cc:61-78`)
  *  - k = 0 → empty result (`src/index/shard_manager.cc:31-36`)
  *
  * Spark-first design:
  *  - Single query: `orderBy(distance, id).limit(k)` — Catalyst plans
  *    `TakeOrderedAndProject`, which IS per-partition partial top-k with a
  *    bounded priority queue plus a driver merge: algorithmically identical
  *    to the reference's per-shard `search(k)` + `MergeTopK`, but
  *    distributed over N executors instead of OpenMP threads. At 100 TB
  *    the scan is embarrassingly parallel over parquet row groups; only
  *    `shards × k` rows ever cross the network.
  *  - Batch: the query set is DATA, not a loop. One cross join (query side
  *    broadcast — it is small by construction) + per-query window top-k
  *    services any batch width with a single pass over the vectors. No
  *    per-request job-launch overhead, unlike the reference's per-request
  *    OpenMP fan-out.
  *  - Tie-break: `(distance, id)` ascending — deterministic, stricter than
  *    the reference's arbitrary ties (SURVEY.md §5.1). Duplicate ids
  *    across shards are NOT deduped (reference quirk, preserved).
  */
object Knn {

  /** Top-k nearest neighbors of one query vector.
    *
    * @param vectors DataFrame with `idCol` and `embCol` (ARRAY<FLOAT>)
    * @param query   the query vector
    * @param k       neighbors to return (0 → empty, reference parity)
    */
  def topK(
      vectors: DataFrame,
      query: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val dist = l2sq(col(embCol), lit(query.toArray))
    vectors
      .select(col(idCol), dist.as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(math.max(k, 0))
  }

  /** Top-k with the query vectors supplied as a (small) DataFrame
    * `(query_id, qvec)`; one result row set per query id.
    *
    * The query side is broadcast: the vectors table never shuffles, and
    * the per-query top-k is the [[graft.expressions.BottomK]] partial
    * aggregate — each map task reduces its slice to a k-bounded heap, so
    * only `tasks × queries × k` rows reach the exchange and no task ever
    * sorts a full per-query partition (the window form would put ALL
    * scored rows of one query into one task — a full-corpus sort on a
    * single core at 100 TB). For very large query batches (beyond
    * broadcast threshold) the same plan degrades gracefully to a
    * shuffled join on no keys — use [[batchTopKChunked]], which does
    * the chunking so every sub-batch stays broadcast-sized.
    */
  def batchTopK(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    if (k <= 0) {
      // reference parity: k = 0 → empty (same schema as the k > 0 path)
      return batchTopKWindow(vectors, queries, 0, idCol, embCol,
        queryIdCol, queryVecCol)
    }
    vectors
      .crossJoin(broadcast(queries))
      .select(
        col(queryIdCol),
        l2sq(col(embCol), col(queryVecCol)).as("distance"),
        col(idCol))
      .groupBy(col(queryIdCol))
      .agg(graft.expressions.BottomK.bottomK(
        col("distance"), col(idCol).cast("long"), k).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol),
        col("col.id").as(idCol),
        col("col.distance").as("distance"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Group-scoped batch top-k — namespace/tenant isolation: each query
    * searches ONLY vectors sharing its `groupCol` value (the multi-
    * tenant form of the reference's per-collection sharding, where one
    * tenant's queries must never see another's vectors). The group key
    * replaces [[batchTopK]]'s cross join with a broadcast-hash EQUI
    * join, so the corpus still never shuffles AND rows of foreign
    * tenants are dropped at the join instead of scored-then-discarded;
    * per-query top-k stays the BottomK map-side heap.
    *
    * Empty-tenant contract (differs from [[batchTopK]], which echoes
    * every query): a query whose group has ZERO vectors produces NO
    * output rows — the inner equi-join drops it. Callers that need
    * every query echoed (e.g. to distinguish "no corpus" from "not
    * run") should left-join their query frame back against the
    * result's `queryIdCol`. */
  def groupedTopK(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      groupCol: String,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    require(k > 0, "k must be positive")
    vectors
      .join(broadcast(queries), groupCol)
      .select(
        col(queryIdCol),
        l2sq(col(embCol), col(queryVecCol)).as("distance"),
        col(idCol))
      .groupBy(col(queryIdCol))
      .agg(graft.expressions.BottomK.bottomK(
        col("distance"), col(idCol).cast("long"), k).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol),
        col("col.id").as(idCol),
        col("col.distance").as("distance"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** [[batchTopK]] for query batches of ARBITRARY width: splits the
    * batch into broadcast-sized chunks and unions the per-chunk plans,
    * so the vectors table NEVER shuffles no matter how wide the batch —
    * closing the scaladoc'd degradation above (a beyond-threshold batch
    * would silently plan a shuffled join on no keys). The reference's
    * `BatchSearch` amortizes arbitrary widths the same way — per-shard
    * sub-batches through a fixed-size scan
    * (`src/index/shard_manager.cc:61-78`).
    *
    * Chunk assignment is `pmod(xxhash64(query_id), chunks)` — computed
    * row-locally on the query side (no global sort/window over the
    * batch, which would funnel the whole batch through one task), and
    * each chunk's filter pushes into the query-side scan. Each chunk
    * costs one pass over the vectors; `maxChunk` trades passes against
    * broadcast size (default 65,536 queries ≈ 17 MB of 64-float
    * vectors — inside the production 64 MB threshold). Hash chunking
    * balances to ±O(√chunkSize) for distinct ids; exact output equality
    * with the unchunked form is property-tested at a forced tiny
    * `maxChunk`.
    *
    * The batch is evaluated ONCE: width discovery plus `chunks + 1`
    * plan references would otherwise re-run an expensive upstream
    * query-side plan per chunk, so unless the caller passes
    * `knownWidth` (they built the batch from a local collection and
    * know its size — e.g. [[SearchService.batchSearch]]), the queries
    * frame is `localCheckpoint`ed first and both the count and every
    * chunk filter read the materialized blocks. */
  def batchTopKChunked(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      maxChunk: Int = 65536,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec",
      knownWidth: Option[Long] = None): DataFrame = {
    require(maxChunk > 0, "maxChunk must be positive")
    val (batch, total) = knownWidth match {
      case Some(w) =>
        require(w >= 0, "knownWidth must be non-negative")
        (queries, w)
      case None =>
        val m = queries.localCheckpoint()
        (m, m.count())
    }
    val chunks = math.max(1L, (total + maxChunk - 1) / maxChunk.toLong).toInt
    if (chunks == 1)
      return batchTopK(vectors, batch, k, idCol, embCol, queryIdCol, queryVecCol)
    (0 until chunks).map { i =>
      val part = batch.filter(
        pmod(xxhash64(col(queryIdCol)), lit(chunks)) === lit(i))
      batchTopK(vectors, part, k, idCol, embCol, queryIdCol, queryVecCol)
    }.reduce(_ unionByName _)
  }

  /** Window-function form of [[batchTopK]] — the executable spec the
    * aggregate form is property-tested against (identical output), and
    * the k ≤ 0 fallback. Not the scale path: the per-query window sorts
    * every scored row of a query inside one task. */
  def batchTopKWindow(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    val scored = vectors
      .crossJoin(broadcast(queries))
      .select(
        col(queryIdCol),
        col(idCol).cast("long").as(idCol),
        l2sq(col(embCol), col(queryVecCol)).as("distance"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("distance"), col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("distance"), col("rank"))
  }

  /** Range (radius) search: every vector within `maxDistSq` squared-L2
    * of the query, ascending — FAISS's range_search counterpart to the
    * top-k scan. The predicate evaluates inside the scan stage, so at
    * scale only matching rows leave the executors (no global k-limit
    * coordination at all). */
  def rangeSearch(
      vectors: DataFrame,
      query: Seq[Float],
      maxDistSq: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val dist = l2sq(col(embCol), lit(query.toArray))
    vectors
      .select(col(idCol), dist.as("distance"))
      .filter(col("distance") <= maxDistSq)
      .orderBy(col("distance"), col(idCol))
  }

  /** Explicit duplicate-id resolution over k-NN output — the extension
    * the reference lacks: its shard merge concatenates per-shard hit
    * lists without deduplication (`src/index/shard_manager.cc:129-145`),
    * so an id present in several shards (a re-sharded upsert, an
    * overlapping backfill) appears once per shard. The core operators
    * here preserve that quirk (SURVEY §7 risk 4 — parity first); this
    * wrapper is the opt-in fix: keep each id's BEST hit (lowest
    * distance; `rank` tie-break keeps the merge-deterministic winner)
    * and re-rank the survivors densely per query.
    *
    * Scale shape: one window over (query, id) — the input is k-NN
    * OUTPUT, `queries × shards × k` rows, never the vector table, so
    * the partition sort is trivially small. Works on [[topK]] output
    * too (no query column): pass `queryIdCol = None`. */
  def dedupById(
      results: DataFrame,
      idCol: String = "vec_id",
      distCol: String = "distance",
      queryIdCol: Option[String] = Some("query_id")): DataFrame = {
    val queryParts = queryIdCol.map(col).toSeq
    val hasRank = results.columns.contains("rank")
    val pickCols = if (hasRank) Seq(col(distCol), col("rank")) else Seq(col(distCol))
    val pick = Window.partitionBy(queryParts :+ col(idCol): _*)
      .orderBy(pickCols :+ col(idCol): _*)
    val deduped = results
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .drop("__rn")
    if (!hasRank) deduped
    else {
      // survivors' ranks have holes where duplicates were dropped —
      // re-rank densely in the original merge order
      val rerank = Window.partitionBy(queryParts: _*)
        .orderBy(col(distCol), col(idCol))
      deduped.withColumn("rank", row_number().over(rerank).cast("long"))
    }
  }

  /** Filtered search: restrict the candidate set by an arbitrary
    * predicate before the scan. The filter is pushed into the parquet
    * scan by Catalyst (the reference has no equivalent — closest is its
    * per-shard routing, `src/index/shard_manager.cc:81-84`, which our
    * partition pruning subsumes). */
  def topKWhere(
      vectors: DataFrame,
      predicate: Column,
      query: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    topK(vectors.filter(predicate), query, k, idCol, embCol)
}
