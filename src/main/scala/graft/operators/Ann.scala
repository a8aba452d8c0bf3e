package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.BottomK.bottomK
import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search — the scale path past the
  * reference's exact-only scan (`faiss::IndexFlatL2`,
  * `src/index/vector_shard.cc:41-42`).
  *
  * IVF (inverted-file) layout, Spark-first:
  *  - BUILD: pick K centroids (deterministic seed rows, optionally
  *    refined by Lloyd iterations — each iteration is one groupBy), then
  *    assign every vector to its nearest centroid. Centroids are
  *    driver-sized BY DEFINITION (K ≪ N), so assignment is a row-local
  *    argmin over a literal centroid array — ZERO shuffle, zero join:
  *    the cell column is computed inside the scan projection.
  *  - STORE: partition the table by `cell`. At 100 TB each cell is a
  *    parquet partition; probing = partition pruning, i.e. the scan
  *    reads nprobe/K of the data — same pruning Catalyst already does
  *    for `shard_id`.
  *  - SEARCH: rank cells by centroid distance (row-local over the same
  *    literal), scan the nprobe nearest cells exactly, top-k via the
  *    BottomK partial aggregate (map-side k-bounded heaps, tiny final
  *    merge — never a single-task per-query sort). Recall < 1 by
  *    design; brute force (Knn) is the recall-1.0 baseline.
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
    * the partition-pruning path); both trade recall for scan fraction.
    * Backed by the native one-pass kernel — the fold form below stays as
    * the executable spec (value parity in AnnSpec; at 128 production
    * planes the fold is 8k literal expression nodes per task). */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.SignLshBucket(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(emb), planes))

  /** Literal-fold form of [[lshBucket]] — the executable spec the native
    * kernel is tested against (and the shape the DuckDB oracle replays). */
  private[graft] def lshBucketFold(emb: Column, planes: Seq[Seq[Double]]): Column = {
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

  /** Deterministic ±1 Johnson–Lindenstrauss projection planes: component
    * d of plane j is +1 iff `hash32("rp:j:d")` is even (Achlioptas-style
    * sign matrix — the JL guarantee holds for ±1 entries, and md5
    * derivation lets the oracle regenerate the identical matrix in SQL).
    * Exactly representable as float, so the plane literals are exact on
    * both engines. */
  def rpPlanes(outDim: Int, dim: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until outDim).map(j => Array.tabulate(dim)(d =>
      if (hash32(s"rp:$j:${d + 1}") % 2 == 0) 1f else -1f))
  }

  /** Project a float-vector column to `planes.size` dims: one native dot
    * product per output component (row-local, whole-stage codegen — the
    * map-side dimensionality reduction). Output ARRAY<FLOAT>: the float
    * quantization is deliberate — a 4× smaller stored sketch is the
    * point of the reduction, and the cast is IEEE-identical on every
    * engine. */
  def rpProject(emb: Column, planes: Seq[Array[Float]]): Column =
    array(planes.map(w => dot(emb, lit(w)).cast("float")): _*)

  /** Driver-side mirror of [[rpProject]] for the query vector (same
    * index-order double fold, same float quantization). */
  def rpProjectLocal(q: Array[Float], planes: Seq[Array[Float]]): Array[Float] =
    planes.map { w =>
      var acc = 0.0
      var i = 0
      while (i < q.length) { acc += q(i).toDouble * w(i).toDouble; i += 1 }
      acc.toFloat
    }.toArray

  /** ANN search via random projection: shortlist the `r` nearest by
    * squared L2 in the PROJECTED space (16 floats instead of 64 — ~4×
    * less distance compute and scan bandwidth when the sketch column is
    * stored), then exact re-rank of just those `r` full vectors. Both
    * stages are `TakeOrderedAndProject` (map-side partial top-k, no
    * shuffle of the corpus); ties break on id at both stages. JL bounds
    * the projected-distance distortion, so recall at r ≫ k is high —
    * measured honestly by the `ann_rp` oracle's exact replay. */
  def rpSearch(
      vectors: DataFrame,
      q: Array[Float],
      outDim: Int = 16,
      r: Int = 50,
      k: Int = 10,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val planes = rpPlanes(outDim, q.length)
    val qp = rpProjectLocal(q, planes)
    shortlistRerank(vectors,
      l2sq(rpProject(col(embCol), planes), lit(qp)),
      q, r, k, idCol, embCol)
  }

  /** The shared shortlist-then-rerank tail of [[rpSearch]] and
    * [[prefixSearch]]: r nearest by the given sketch distance, exact L2
    * re-rank of just those rows, (distance, id) ties at both stages —
    * both stages TakeOrderedAndProject, the corpus never shuffles. */
  private def shortlistRerank(vectors: DataFrame, shortDist: Column,
      q: Array[Float], r: Int, k: Int,
      idCol: String, embCol: String): DataFrame = {
    require(r >= k, s"shortlist r=$r must be >= k=$k")
    vectors
      .select(col(idCol), col(embCol), shortDist.as("pdist"))
      .orderBy(col("pdist"), col(idCol))
      .limit(r)
      .select(col(idCol), l2sq(col(embCol), lit(q)).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }

  /** Matryoshka / truncated-dimension search: shortlist the `r` nearest
    * by squared L2 over only the FIRST `prefixDim` components, then
    * exact re-rank of just those `r` full vectors — [[rpSearch]]'s
    * shape with the projection replaced by plain truncation. This is
    * the serving trick Matryoshka-style embeddings are trained for
    * (Kusupati et al., "Matryoshka Representation Learning", NeurIPS
    * 2022: nested prefixes are themselves usable embeddings); on a
    * column store the prefix read is a genuinely smaller scan when the
    * head slice is stored as its own column. Unlike RP, truncation
    * needs no planes — and on embeddings NOT trained for it, recall at
    * the same r is typically worse, which `ann_mrl_recall` measures
    * honestly against the JL row. */
  def prefixSearch(
      vectors: DataFrame,
      q: Array[Float],
      prefixDim: Int,
      r: Int = 50,
      k: Int = 10,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(prefixDim >= 1 && prefixDim <= q.length,
      s"prefixDim $prefixDim not in 1..${q.length}")
    shortlistRerank(vectors,
      l2sq(slice(col(embCol), 1, prefixDim), lit(q.take(prefixDim))),
      q, r, k, idCol, embCol)
  }

  /** Deterministic centroid seeds: the first `k` vectors by id.
    * (Zero-iteration k-means; `refine` runs Lloyd steps.) */
  def seedCentroids(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cell"), col(embCol).as("centroid"))

  /** Deterministic centroid seeds SPREAD uniformly over the corpus: the
    * `k` vectors ranked first by md5 of their id — a reproducible
    * pseudo-random sample (the standard IVF seeding; FAISS samples
    * training points the same way, just non-deterministically). Unlike
    * [[seedCentroids]], insensitive to id locality: lowest-k ids are
    * typically one ingest batch / one region of the embedding space,
    * and centroids clustered in one region leave the rest of the corpus
    * piling into a few giant cells (observed: 18 k-vector blocks at
    * targetBlock 64 on a 10× replicated corpus). md5 is portable, so an
    * oracle can reproduce the exact seed set. */
  def spreadCentroids(vectors: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    // the embedding is the final tie-break: duplicate-id rows carrying
    // different embeddings tie on (md5(id), id) and would make the seed
    // pick partition-order-dependent (arrays order lexicographically in
    // both Spark and DuckDB, so oracle replays stay exact)
    vectors.orderBy(md5(col(idCol).cast("string")), col(idCol), col(embCol))
      .limit(k)
      .select(col(idCol).as("cell"), col(embCol).as("centroid"))

  /** One Lloyd refinement step: mean of assigned vectors per cell.
    * Computed as per-(cell, dimension) averages over the exploded
    * components — the per-group state is one running mean, and the only
    * array built is the dim-length centroid itself. (An
    * `array_agg(embedding)` per cell would buffer the cell's whole
    * population in one aggregation row — a scale landmine at real cell
    * sizes.) Float means are order-sensitive — refined centroids are for
    * performance experiments, not oracle-checked queries. */
  def refine(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // withCells, NOT assign + self-join: the cell is row-local (argmin
    // over the centroid literal/broadcast inside the scan projection),
    // so the embedding never leaves the row — a join back on id would
    // shuffle the full vector corpus once per Lloyd step for nothing.
    val assigned = withCells(vectors, centroids, embCol)
    assigned
      .select(col("cell"), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      // bounded by dim, ordered by pos via the struct sort
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), s => s.getField("m")).as("centroid"))
  }

  /** Pull a (small) centroid table to the driver as (cell, centroid)
    * pairs, sorted by cell. Doubles (e.g. refined centroids) are
    * quantized to float — the storage element type of every embedding. */
  def collectCentroids(centroids: DataFrame): Seq[(Long, Array[Float])] =
    centroids.select(col("cell").cast("long"), col("centroid"))
      .collect()
      .map { r =>
        val emb = r.getSeq[Any](1).map {
          case f: Float => f
          case d: Double => d.toFloat
          case x => x.toString.toFloat
        }.toArray
        (r.getLong(0), emb)
      }.sortBy(_._1).toSeq

  /** Above this K the literal-struct form is replaced by the
    * single-literal fold: K struct() expression nodes each embedding a
    * dim-float array literal are fine at test K (8–64) but blow plan
    * size / codegen constant pools at production cell counts. */
  private[graft] val InlineCentroidMax = 64

  /** The whole centroid table as ONE Literal value (ArrayData behind a
    * single plan node, shipped to executors as a referenced constant —
    * NOT K expression nodes): plan size and generated code stay O(1)
    * regardless of K. Element = struct(cell LONG, centroid ARRAY<FLOAT>). */
  private[graft] def centroidLit(cents: Seq[(Long, Array[Float])]): Column =
    typedlit(cents.map { case (cellId, c) => (cellId, c.toSeq) })

  /** (distance, cell) structs for every centroid, via a transform over
    * the single centroid literal — the scale path shared by
    * [[nearestCell]] and [[probeCells]] at large K. */
  private[graft] def scoredCells(emb: Column, cents: Seq[(Long, Array[Float])]): Column =
    transform(centroidLit(cents), s =>
      struct(l2sq(emb, s.getField("_2")).as("dist"), s.getField("_1").as("cell")))

  /** Ship a centroid table to executors once as torrent-broadcast
    * blocks. The returned handle can back any number of
    * [[nearestCell]]/[[probeCells]] columns (pass it as `shared`);
    * long-lived services should build ONE handle per centroid table and
    * `.destroy()` it when the index version is retired. Columns built
    * without an explicit handle broadcast lazily per call and are
    * reclaimed by the ContextCleaner once the plan that references the
    * handle is garbage-collected (`spark.cleaner.referenceTracking`,
    * default on). */
  def broadcastCentroids(cents: Seq[(Long, Array[Float])])
      : org.apache.spark.broadcast.Broadcast[graft.expressions.CentroidSet] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(
      graft.expressions.CentroidSet(
        cents.map(_._1).toArray, cents.map(_._2).toArray))

  /** Broadcast-backed (dist, cell) probe column: the centroid table
    * ships to executors ONCE as torrent-broadcast blocks and the
    * expression holds only the `Broadcast` handle — unlike
    * [[centroidLit]], whose literal value rides inside the serialized
    * plan of every task. The scale path above [[InlineCentroidMax]];
    * value-identical to the literal fold (AnnSpec, incl. K=4096×dim=64). */
  private[graft] def probeCellsBcastCol(emb: Column,
      bc: org.apache.spark.broadcast.Broadcast[graft.expressions.CentroidSet],
      nprobe: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.ProbeCellsBcast(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(emb), bc, nprobe))

  /** Row-local nearest-centroid cell, evaluated inside the scan
    * projection — no join, no exchange, no window. Lexicographic struct
    * comparison IS the (distance, cell)-ascending argmin. Small K uses
    * `least` over inline literal structs (tightest codegen); large K the
    * broadcast probe kernel so the centroid table is not re-shipped per
    * task — value-identical (AnnSpec; [[nearestCellFold]] stays as the
    * literal-fold executable spec). Pass `shared` (from
    * [[broadcastCentroids]]) to reuse one broadcast across several
    * columns/calls instead of shipping a fresh one.
    * `try_element_at`, not `element_at`: a dimension-less corpus (no
    * matching centroid) probes an empty array, which must yield null —
    * the literal-fold behavior — under ANSI mode too, not throw. */
  def nearestCell(emb: Column, cents: Seq[(Long, Array[Float])],
      shared: Option[org.apache.spark.broadcast.Broadcast[
        graft.expressions.CentroidSet]] = None): Column =
    if (cents.size <= InlineCentroidMax) nearestCellInline(emb, cents)
    else try_element_at(
      probeCellsBcastCol(emb, shared.getOrElse(broadcastCentroids(cents)), 1), lit(1))

  private[graft] def nearestCellInline(emb: Column, cents: Seq[(Long, Array[Float])]): Column = {
    val scored = cents.map { case (cellId, c) =>
      struct(l2sq(emb, lit(c)).as("dist"), lit(cellId).as("cell"))
    }
    val best = if (scored.size == 1) scored.head else least(scored: _*)
    best.getField("cell")
  }

  private[graft] def nearestCellFold(emb: Column, cents: Seq[(Long, Array[Float])]): Column =
    array_min(scoredCells(emb, cents)).getField("cell")

  /** The `nprobe` cells nearest to a query vector, ascending by
    * (distance, cell) — same hybrid as [[nearestCell]]; `array_sort` on
    * structs is the lexicographic order at small K, the broadcast probe
    * kernel above [[InlineCentroidMax]]. */
  def probeCells(qvec: Column, cents: Seq[(Long, Array[Float])], nprobe: Int,
      shared: Option[org.apache.spark.broadcast.Broadcast[
        graft.expressions.CentroidSet]] = None): Column =
    if (cents.size <= InlineCentroidMax) {
      val scored = array(cents.map { case (cellId, c) =>
        struct(l2sq(qvec, lit(c)).as("dist"), lit(cellId).as("cell"))
      }: _*)
      transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cell"))
    } else probeCellsBcastCol(qvec, shared.getOrElse(broadcastCentroids(cents)), nprobe)

  /** Vectors with their IVF cell attached — the materialization point:
    * write this out partitioned by `cell` and probing becomes partition
    * pruning. Computed row-locally (see [[nearestCell]]). */
  def withCells(vectors: DataFrame, centroids: DataFrame,
      embCol: String = "embedding"): DataFrame =
    vectors.withColumn("cell", nearestCell(col(embCol), collectCentroids(centroids)))

  /** Assign each vector to its nearest centroid → (id, cell). */
  def assign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    withCells(vectors, centroids, embCol).select(col(idCol), col("cell"))

  /** IVF search: probe the `nprobe` cells whose centroids are nearest to
    * the query, exact top-k within them. `queries` = (query_id, qvec).
    *
    * Plan shape: cell assignment and probe lists are row-local literal
    * folds (no shuffle); the probed-cell join broadcasts the tiny query
    * side; the per-query top-k is the BottomK partial aggregate, so each
    * map task emits ≤ k rows per query before the (queries × k)-row
    * exchange. Nothing in this plan sorts or shuffles the vector table.
    */
  def search(
      vectors: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    scoredCandidates(vectors, queries, collectCentroids(centroids), nprobe,
      idCol, embCol)
      .groupBy(col("query_id"))
      .agg(bottomK(col("distance"), col(idCol).cast("long"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.id").as(idCol),
        col("col.distance").as("distance"),
        (col("pos") + 1).cast("long").as("rank"))

  /** The shared candidate pipeline of [[search]] and the streaming
    * serving path ([[graft.streaming.AnnServe]]): row-local cell
    * assignment, probe-cell explode on the (small, broadcast) query
    * side, probed-cell equi-join, exact scoring. Returns
    * (query_id, distance, idCol) — callers add their own top-k.
    * The corpus side NEVER shuffles: the query side carries the
    * broadcast hint, honored per micro-batch in the streaming case. */
  private[graft] def scoredCandidates(
      vectors: DataFrame,
      queries: DataFrame,
      cents: Seq[(Long, Array[Float])],
      nprobe: Int,
      idCol: String,
      embCol: String,
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    // ONE broadcast backs both the assignment and the probe columns —
    // per-column broadcasts would ship the same table twice per call
    // and accumulate executor memory over a long session
    val shared = if (cents.size <= InlineCentroidMax) None
      else Some(broadcastCentroids(cents))
    val withCell = vectors.withColumn("cell", nearestCell(col(embCol), cents, shared))
    val probed = queries
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("qvec"),
        explode(probeCells(col(queryVecCol), cents, nprobe, shared)).as("cell"))
    withCell.join(broadcast(probed), "cell")
      .select(col("query_id"),
        l2sq(col(embCol), col("qvec")).as("distance"),
        col(idCol))
  }
}
