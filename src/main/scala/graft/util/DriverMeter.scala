package graft.util

/** Cumulative wall meter for DRIVER-RESIDENT compute — the engine work
  * that runs as plain Scala on the driver thread instead of as Spark
  * tasks: the connected-components union-find (collect + loop,
  * [[graft.operators.Dedup.connectedComponents]]), the MMR greedy
  * selection, the [[graft.sources.GraphStore]] driver-walk hop loops,
  * and [[graft.operators.ServeLoop]] scans.
  *
  * Why it exists (VERDICT r17 next #1): every other bench bucket
  * (sched_wait, gc, jit, hop_dispatch, ext_cpu) watches either the OS
  * or Spark's scheduler — a pass whose wall time lives in a
  * driver-side Scala loop registers in NONE of them (the loop barely
  * allocates, runs no jobs, and its first-execution JIT is a few
  * hundred ms of global compiler wall). `driver_s` names that wall
  * directly, so a tail outlier like dedup_cc (9.33 s vs ≤2.0 clean in
  * BENCH_r17 with only 1.46 s named) becomes adjudicable from the
  * artifact alone.
  *
  * Accounting, not partition: a timed section MAY contain bounded
  * point-lookup jobs (the union-find's one collect — VERDICT's own
  * definition includes it), so `driver_s` can overlap
  * `hop_dispatch_s`; buckets are attributions a reader holds against
  * wall, never summands of it. Sites are chosen non-nested, so the
  * counter itself never double-counts. */
object DriverMeter {
  private val nanoCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val sectionCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Cumulative wall nanoseconds inside driver-resident sections. */
  def nanos: Long = nanoCounter.get()

  /** Cumulative count of timed sections (observability for specs). */
  def sections: Long = sectionCounter.get()

  /** Time one driver-resident section. */
  def time[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally {
      nanoCounter.addAndGet(System.nanoTime() - t0)
      sectionCounter.incrementAndGet()
      ()
    }
  }
}
