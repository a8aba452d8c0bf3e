package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.TypedApi.ScoredPoint

/** Driver-RESIDENT exact k-NN serving over a loaded snapshot — the
  * engine-side analog of the reference's in-process serving path, and
  * the artifact behind the sustained-throughput rows in BASELINE.md
  * (VERDICT r16 next #2).
  *
  * The reference answers every query from index structures loaded once
  * at startup (`src/index/vector_shard.cc:34-43`): a query is a flat
  * scan over each shard (`vector_shard.cc:72-94`), shards fan out on
  * OpenMP threads (`src/index/shard_manager.cc:46-51`) and the
  * per-shard top-k lists merge by distance (`shard_manager.cc:129-145`)
  * — no scheduler, no RPC to storage, microsecond-to-millisecond
  * latencies. The engine's [[SearchService.search]] keeps the same
  * SEMANTICS but dispatches one Spark job per query, so its latency
  * floor is the per-job dispatch cost the bench records as
  * `hop_dispatch_s`. This class closes the gap for the serving-shaped
  * workload: [[ServeLoop.open]] collects one resolved snapshot into
  * flat driver arrays (the "loaded shard"), and [[search]] answers
  * queries entirely in-process — slice-parallel scan (the OpenMP
  * analog), per-slice bounded heaps, (distance, id) merge — returning
  * values BIT-IDENTICAL to `SearchService.search` / [[Knn.topK]]
  * (ServeLoopSpec pins this, including tie-breaks): the inner loop
  * accumulates `(double)xᵢ − (double)qᵢ` squares in document order,
  * the exact fold of [[graft.expressions.L2SquaredDistance]].
  *
  * SCALE CONTRACT (the driver-walk convention, GraphStore scaladoc):
  * residency is driver-memory-bounded — `open` refuses corpora above
  * `graft.serveLoopMaxRows` (default 4 M rows; at d=768 that is ~12 GB,
  * sized to a serving driver) and callers fall back to the distributed
  * [[SearchService.search]] path, which handles any corpus size. A
  * 100 TB deployment serves from sharded replicas of exactly this loop
  * (the reference's own model: N nodes × S shards, each resident);
  * the Spark engine is the thing that BUILDS those shards.
  *
  * Duplicate ids are preserved (the reference's duplicate-id quirk,
  * SURVEY §2); rows whose embedding is null or off-dimension make
  * `open` return None — the distributed path defines their semantics
  * (null distance), and a resident loop must not silently diverge. */
final class ServeLoop private[operators] (
    ids: Array[Long], flat: Array[Float], val dim: Int) {

  /** Loaded corpus size in rows. */
  val size: Int = ids.length

  // slice bounds for the scan fan-out: one contiguous range per slice
  // (the shard analog); sliced by available cores, floor one slice
  private val slices: Int =
    math.max(1, math.min(Runtime.getRuntime.availableProcessors(),
      math.max(1, size / 1024)))
  private val bounds: Array[Int] =
    Array.tabulate(slices + 1)(i => (size.toLong * i / slices).toInt)

  // concurrent-call depth drives the scan mode, measured on the
  // 1 M × 64 / 100 k × 64 synthetic corpora (ProfileServe):
  //  - depth < slices: PARALLEL — idle cores exist, the
  //    reference-style OpenMP-shaped fan-out uses them (c=1 at 100 k:
  //    p50 ~1-2 ms parallel vs 7.3 ms single-thread; c=8 at 1 M:
  //    297 vs 92 qps);
  //  - depth ≥ slices: SEQUENTIAL per query — every core already has
  //    a query; nested parallelism only adds churn (c=64 at 100 k:
  //    3717 vs 2517 qps; at 1 M: p99 0.45 vs 1.7 s).
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Exact top-k, (distance, id) ascending — value-identical to
    * `Knn.topK(state, query, k)` on the same snapshot. k ≤ 0 returns
    * Nil (the reference's k=0 short-circuit). Thread-safe: state is
    * immutable, every call allocates its own heaps — concurrent
    * callers are the serving model, not a special case. */
  def search(query: Seq[Float], k: Int): Seq[ScoredPoint] =
    search(query, k, null)

  /** [[search]] with an id predicate — the resident analog of
    * filtered/tenant-isolated serving (`knn_filtered` /
    * `Knn.groupedTopK`'s per-tenant restriction): rows whose id fails
    * `filter` never enter a heap, so the result is value-identical to
    * running the unfiltered loop over the pre-filtered snapshot
    * (ServeLoopSpec pins both parities). `filter` must be pure and
    * thread-safe; null means no filter. */
  def search(query: Seq[Float], k: Int,
      filter: Long => Boolean): Seq[ScoredPoint] = {
    if (k <= 0) return Nil
    require(query.length == dim,
      s"query dimension ${query.length} != corpus dimension $dim")
    // driver-resident compute — report through DriverMeter (`driver_s`)
    graft.util.DriverMeter.time {
    val q = query.toArray
    val kk = math.min(k, size)
    if (kk == 0) return Nil
    val depth = inFlight.incrementAndGet()
    try {
      val sliceTops = new Array[BoundedTopK](slices)
      def scanSlice(s: Int): Unit = {
        val top = new BoundedTopK(kk)
        var r = bounds(s)
        val end = bounds(s + 1)
        while (r < end) {
          if (filter == null || filter(ids(r))) {
            var acc = 0.0
            var j = 0
            var base = r * dim
            while (j < dim) {
              val d = flat(base).toDouble - q(j).toDouble
              acc += d * d
              j += 1; base += 1
            }
            top.offer(acc, ids(r))
          }
          r += 1
        }
        sliceTops(s) = top
      }
      if (depth < slices)
        java.util.stream.IntStream.range(0, slices).parallel()
          .forEach(s => scanSlice(s))
      else {
        var s = 0
        while (s < slices) { scanSlice(s); s += 1 }
      }
      // merge: concatenate slice tops (≤ slices·k rows), total-order sort
      val merged = sliceTops.iterator.flatMap(_.rows).toArray
      java.util.Arrays.sort(merged, ServeLoop.byDistThenId)
      merged.iterator.take(kk)
        .map(e => ScoredPoint(e._2, e._1, "")).toSeq
    } finally inFlight.decrementAndGet()
    } // DriverMeter.time
  }

  /** Batch serve — the resident analog of the reference's BatchSearch
    * (`src/rpc/search_service_impl.cc:53-62`, minus the consistency
    * routing, which lives in [[SearchService]]): answers every member
    * against THIS loop's snapshot, results per member value-identical
    * to [[search]] (and so to `SearchService.batchSearch` at the same
    * snapshot — ServeLoopSpec pins it). Members fan out on the common
    * pool; past saturation each member's scan runs sequentially (the
    * measured c=64 regime — [[inFlight]] flips the mode per call), so
    * batch throughput IS the concurrent-caller throughput. */
  def searchBatch(queries: Seq[Seq[Float]], k: Int,
      filter: Long => Boolean = null): Seq[Seq[ScoredPoint]] = {
    if (queries.isEmpty) return Nil
    val qarr = queries.toIndexedSeq
    val out = new Array[Seq[ScoredPoint]](qarr.length)
    java.util.stream.IntStream.range(0, qarr.length).parallel()
      .forEach(i => out(i) = search(qarr(i), k, filter))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** One bounded worst-first heap: keeps the k smallest (dist, id)
    * pairs seen. Plain binary heap on arrays — no boxing in offer's
    * hot path beyond the final keep. */
  private final class BoundedTopK(k: Int) {
    private val ds = new Array[Double](k)
    private val is = new Array[Long](k)
    private var n = 0
    private def worseThanRoot(d: Double, id: Long): Boolean =
      d > ds(0) || (d == ds(0) && id > is(0))
    def offer(d: Double, id: Long): Unit = {
      if (n < k) {
        var i = n; ds(i) = d; is(i) = id; n += 1
        while (i > 0) { // sift up (max-heap on (d, id): parent ≥ child)
          val p = (i - 1) >> 1
          if (ds(p) > ds(i) || (ds(p) == ds(i) && is(p) >= is(i))) return
          val td = ds(p); ds(p) = ds(i); ds(i) = td
          val ti = is(p); is(p) = is(i); is(i) = ti
          i = p
        }
      } else if (!worseThanRoot(d, id)) {
        ds(0) = d; is(0) = id
        var i = 0
        while (true) { // sift down
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < n && (ds(l) > ds(m) || (ds(l) == ds(m) && is(l) > is(m)))) m = l
          if (r < n && (ds(r) > ds(m) || (ds(r) == ds(m) && is(r) > is(m)))) m = r
          if (m == i) return
          val td = ds(m); ds(m) = ds(i); ds(i) = td
          val ti = is(m); is(m) = is(i); is(i) = ti
          i = m
        }
      }
    }
    def rows: Iterator[(Double, Long)] =
      (0 until n).iterator.map(i => (ds(i), is(i)))
  }
}

object ServeLoop {

  private val byDistThenId = new java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Residency cap in rows — above it `open` returns None and callers
    * serve distributed. Overridable via `-Dgraft.serveLoopMaxRows=`. */
  private[graft] def maxRows: Int =
    sys.props.get("graft.serveLoopMaxRows").map(_.toInt).getOrElse(4 << 20)

  /** Load one snapshot into a resident loop. ONE bounded collect
    * (`limit(cap+1)` keeps the job and the driver allocation capped
    * even against an over-cap corpus; the cap itself is clamped so the
    * probe limit can never overflow Int for a caller configuring
    * Int.MaxValue); None above the cap or when any row — or any
    * ELEMENT inside an embedding array — is null or off-dimension:
    * the distributed path defines null-element distance as null
    * ([[graft.expressions.L2SquaredDistance]]), so degenerate rows
    * must fall back to distributed semantics, not throw. */
  def open(state: DataFrame, idCol: String = "id",
      embCol: String = "embedding",
      cap: Int = maxRows): Option[ServeLoop] = {
    val capc = math.min(math.max(cap, 0), Int.MaxValue - 8)
    val rows = state.select(col(idCol).cast("long"), col(embCol))
      .limit(capc + 1).collect()
    if (rows.length > capc || rows.isEmpty) return None
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val first = rows(0).getSeq[Any](1)
    val dim = first.length
    val n = rows.length
    // flat-array addressability: n·dim must fit one JVM array (a 4 M ×
    // 768 corpus does not — the row cap alone is not the whole bound)
    if (dim <= 0 || n.toLong * dim > Int.MaxValue - 8) return None
    val ids = new Array[Long](n)
    val flat = new Array[Float](n * dim)
    var r = 0
    while (r < n) {
      val row = rows(r)
      // read elements as boxed values: an array<float> row can carry
      // null ELEMENTS, and unboxing one throws instead of falling back
      val emb = row.getSeq[Any](1)
      if (emb.length != dim) return None
      ids(r) = row.getLong(0)
      var j = 0
      val it = emb.iterator
      while (it.hasNext) {
        it.next() match {
          case f: java.lang.Float => flat(r * dim + j) = f.floatValue()
          case _ => return None // null (or non-float) element
        }
        j += 1
      }
      r += 1
    }
    Some(new ServeLoop(ids, flat, dim))
  }
}
