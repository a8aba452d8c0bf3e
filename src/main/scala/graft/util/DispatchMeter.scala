package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.scheduler._

/** Job-dispatch wall meter — the measured form of SURVEY.md's
  * serving-latency honesty note (VERDICT r13 missing #3 / next #7):
  * every store-backed serving walk pays one driver job round-trip per
  * hop, so per-QUERY latency floors at Spark's job-dispatch cost
  * (submit → first task launch: DAG planning, task serialization,
  * scheduling) times the hop count — a cost that does not shrink with
  * data size, while the reference serves in-process from a loaded
  * shard (`search_service_impl.cc:26-50`). This listener accumulates
  * Σ(first-task launch − job submission) and the job count across all
  * jobs; Bench snapshots both per measured pass, so the artifact
  * carries `hop_dispatch_s` (the floor actually paid) and `jobs` (the
  * dispatch count) per query.
  *
  * Timestamps are the scheduler's own recorded millis, so the async
  * listener bus cannot skew the VALUES; a pass boundary may attribute
  * the tail job of one pass to the next (bounded by one job's
  * dispatch — noise for a floor metric). Jobs that never launch a
  * task (empty relations) contribute count but no wall.
  *
  * Bookkeeping is bounded (ADVICE r14 low: stage→job entries of
  * SKIPPED stages never see a StageCompleted event, so the old
  * per-stage cleanup leaked them for the life of the JVM): each job's
  * stage ids are recorded at onJobStart and ALL of them are purged at
  * onJobEnd, whether they ran, were skipped, or never materialized.
  * Registration is idempotent via [[register]] — a second
  * addSparkListener of this singleton would double-count every job. */
object DispatchMeter extends SparkListener {
  private val jobSubmit = new ConcurrentHashMap[Int, java.lang.Long]()
  private val stageToJob = new ConcurrentHashMap[Int, Integer]()
  private val jobStages = new ConcurrentHashMap[Int, Array[Int]]()
  private val dispatched = ConcurrentHashMap.newKeySet[Int]()
  private val dispatchMillis = new AtomicLong(0L)
  private val jobCount = new AtomicLong(0L)
  private val registered = new AtomicBoolean(false)

  /** Idempotent registration — at most one listener instance per JVM
    * regardless of how many entry points call this. */
  def register(sc: org.apache.spark.SparkContext): Unit =
    if (registered.compareAndSet(false, true)) sc.addSparkListener(this)

  /** Cumulative submit→first-task wall, milliseconds. */
  def millis: Long = dispatchMillis.get()

  /** Cumulative job count. */
  def jobs: Long = jobCount.get()

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    jobSubmit.put(e.jobId, e.time)
    val sids = e.stageIds.toArray.map(_.intValue())
    jobStages.put(e.jobId, sids)
    sids.foreach(sid => stageToJob.put(sid, e.jobId))
    jobCount.incrementAndGet()
    ()
  }

  override def onTaskStart(e: SparkListenerTaskStart): Unit = {
    val jid = stageToJob.get(e.stageId)
    if (jid != null && dispatched.add(jid)) {
      val t0 = jobSubmit.get(jid)
      if (t0 != null)
        dispatchMillis.addAndGet(math.max(0L, e.taskInfo.launchTime - t0))
      ()
    }
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    jobSubmit.remove(e.jobId)
    dispatched.remove(e.jobId)
    // purge every stage the job registered — StageCompleted never fires
    // for skipped stages, so per-stage cleanup alone leaks them
    val sids = jobStages.remove(e.jobId)
    if (sids != null) sids.foreach { sid =>
      val owner = stageToJob.get(sid)
      if (owner != null && owner.intValue() == e.jobId)
        stageToJob.remove(sid)
      ()
    }
    ()
  }
}
