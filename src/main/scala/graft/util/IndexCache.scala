package graft.util

import org.apache.spark.sql.DataFrame

/** Session-scoped, content-addressed memo of deterministic index
  * builds — the engine's index manager.
  *
  * The reference loads every index file once at startup and serves
  * every query from that in-memory structure
  * (`src/index/vector_shard.cc:34-43`); nothing in its serving path
  * rebuilds an index per query. The Spark analog: an index BUILD
  * (`KnnGraph.buildSearchGraph`, a quantizer training) is a pure
  * function of (input plan, build parameters) — every build in this
  * engine is deterministic and partitioning-invariant by contract (the
  * cpu32-vs-cpu4 gate) — so two queries in one session requesting the
  * identical build may share one materialization exactly as two
  * requests against the reference share one loaded shard. Results are
  * bit-identical to a fresh build by that determinism; the cache
  * changes WHEN a build runs, never what any query returns.
  *
  * Key = md5 of the input's canonicalized analyzed plan (file
  * locations, filters, projections all participate — sf0.01 and
  * sf0.1, or two different id-subsets of one table, never collide) +
  * the build's own parameters + the owning session's UUID (a frame
  * checkpointed in a dead session must never be served to a new one —
  * restart means rebuild or reopen from a persisted store, the
  * [[graft.sources.GraphStore]] path; the UUID is unique per session
  * object for the JVM's lifetime, unlike an identity hash which the
  * allocator may reuse after GC).
  *
  * Liveness: each entry records the RDD ids its localCheckpoint
  * pinned; a hit first verifies those ids are still in the context's
  * persistent set and silently rebuilds when a harness's blanket
  * unpersist killed them — a stale pin must degrade to one extra
  * build, never to a CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query.
  * Harnesses that drop pass-created blocks between queries should
  * still use [[unpersistAllExcept]] so live entries keep amortizing.
  *
  * Bounded: at `MaxEntries` the map is cleared wholesale — entries
  * hold localCheckpointed frames whose blocks the ContextCleaner
  * reclaims once unreferenced. `enabled = false` restores
  * build-per-call for harnesses that measure build cost itself
  * (ProfileGraph timings).
  */
object IndexCache {
  @volatile var enabled: Boolean = true
  private[graft] val MaxEntries = 64

  private final case class Entry(df: DataFrame, rddIds: Set[Int])
  private val frames = scala.collection.concurrent.TrieMap.empty[String, Entry]
  private val values = scala.collection.concurrent.TrieMap.empty[String, Any]
  // observability for specs and the bench artifact: how many builds
  // actually ran, and how much wall time they cost (the bench splits
  // serve-vs-build cost per query with these)
  private val missCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val buildNanoCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val storeReadCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val storeWriteCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Frame builds served as a PERSISTED-STORE read (see the disk-layer
    * note below) / builds written through to the store. */
  def storeReads: Long = storeReadCounter.get()
  def storeWrites: Long = storeWriteCounter.get()

  def misses: Long = missCounter.get()

  /** Cumulative wall nanoseconds spent inside cache-miss builds (frame
    * materialization + checkpoint, or driver-side model training). */
  def buildNanos: Long = buildNanoCounter.get()

  /** RDD ids of the cache's pinned materializations. Harnesses that
    * drop pass-created blocks between queries (Bench/Verify — the
    * "callers own block cleanup" convention) must EXCLUDE these: the
    * cache owns its blocks across queries; unpersisting them under a
    * live entry turns the next hit into a rebuild (never a crash —
    * see the liveness check — but the amortization is lost). */
  def pinnedRddIds: Set[Int] =
    frames.values.iterator.flatMap(_.rddIds).toSet

  /** Unpersist every persistent RDD of `sc` EXCEPT the cache's pinned
    * blocks — the one correct form of the "drop everything between
    * queries" harness convention (PlanSpec/Profile* sweeps). */
  def unpersistAllExcept(sc: org.apache.spark.SparkContext): Unit = {
    val keep = pinnedRddIds
    sc.getPersistentRDDs
      .filter { case (id, _) => !keep.contains(id) }
      .values.foreach(_.unpersist(false))
  }

  def clear(): Unit = { frames.clear(); values.clear() }

  // Session identity for the key. identityHashCode alone is NOT unique
  // (the allocator may reuse it after a stopped session is GC'd — a
  // collision would serve a dead session's checkpointed frame, the very
  // failure the key exists to prevent). Instead each session OBJECT
  // gets a fresh UUID on first use, held weakly by reference so a dead
  // session's entry vanishes with it and can never be re-issued.
  private val sessionIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()
  private def sessionId(s: org.apache.spark.sql.SparkSession): String =
    sessionIds.synchronized {
      var id = sessionIds.get(s)
      if (id == null) { id = java.util.UUID.randomUUID().toString; sessionIds.put(s, id) }
      id
    }

  private def key(input: DataFrame, params: Seq[Any]): String = {
    val canon = input.queryExecution.analyzed.canonicalized
    // toString + the canonicalized tree's content-based hashCode: plan
    // printing elides some payloads (a LocalRelation prints its schema,
    // not its rows; wide literal collections may truncate) — the
    // case-class hash walks the actual values, so two builds over
    // different data never share a key even when they PRINT alike.
    val plan = canon.toString + "#" + canon.hashCode
    val md = java.security.MessageDigest.getInstance("MD5")
    val planHash = md.digest(plan.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val session = sessionId(input.sparkSession)
    (session +: planHash +: params).mkString("|")
  }

  // ---- persisted-store layer (VERDICT r17 next #4b) ----------------
  //
  // The session memo amortizes a build WITHIN a session; the index
  // frames themselves are persistable index OBJECTS (the argument the
  // dedup scaladocs already make: at production scale the rep index /
  // banded candidate table / membership map are built once per corpus
  // and persisted, and every dedup decision PROBES them — exactly how
  // ModelStore persists quantizers). With `-Dgraft.indexStoreDir=` set,
  // a frame miss first tries a parquet read of the store; a build that
  // cost more than `graft.indexStoreMinBuildSec` (default 2 s) is
  // written through, so the NEXT session's warmup is a read.
  //
  // Correctness: the disk key is content-addressed ACROSS sessions —
  // md5 of the canonicalized analyzed plan (expressions, parameters,
  // and source paths all print) + the input's file signature
  // (path,size,mtime of every leaf file) + the compiled-code stamp
  // (StoreOnce.codeStamp — covers build logic living in closures the
  // plan cannot print), so a changed input, config, or build
  // implementation can never hit an old artifact. The layer is restricted to plans whose
  // leaves are ALL file relations — a LocalRelation payload may elide
  // from the printed plan, and cross-session reuse must never key on
  // an elided value. Values are bit-identical to a fresh build by the
  // determinism + partitioning-invariance contract (and the one store
  // artifact is, if anything, MORE deterministic than re-running the
  // build under a different parallelism). Writes are tmp+rename
  // (crash-safe, the store convention); any read/write failure
  // degrades to a plain build, never to an error.
  private def storeDir: Option[String] =
    sys.props.get("graft.indexStoreDir").filter(_.nonEmpty)
  private def minWriteNanos: Long =
    (sys.props.get("graft.indexStoreMinBuildSec").map(_.toDouble)
      .getOrElse(1.0) * 1e9).toLong

  // content key of a PINNED frame, by its checkpoint RDD id — lets a
  // DERIVED build (the withSig/candidate/membership chain, whose input
  // leaves are prior pins' LogicalRDDs) inherit a cross-session
  // signature: the derived key hashes the derived plan + the parents'
  // content keys, so transitivity carries the original file signature
  // through the whole index DAG. RDD ids are SparkContext-unique and
  // never reused, so a stale mapping cannot exist.
  private val rddContentKeys =
    scala.collection.concurrent.TrieMap.empty[Int, String]

  /** Cross-session content key, or None when the plan has a leaf with
    * no safe content signature (a LocalRelation's payload may elide
    * from the printed plan; an unrecorded RDD has no provenance). */
  private def diskKey(input: DataFrame, params: Seq[Any]): Option[String] = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.LogicalRDD
    // a random (unknown-provenance) code stamp makes every disk key
    // session-unique: reads can never hit, and write-throughs would
    // accumulate orphan artifacts forever (ADVICE r19 #3) — skip the
    // store layer entirely for such sessions
    if (StoreOnce.codeStampUnknown) return None
    val leaves = input.queryExecution.analyzed.collectLeaves()
    if (leaves.isEmpty) return None
    var hasRdd = false
    val parentKeys = new StringBuilder
    leaves.foreach {
      case _: LogicalRelation => ()
      case l: LogicalRDD =>
        hasRdd = true
        rddContentKeys.get(l.rdd.id) match {
          case Some(ck) => parentKeys.append(ck).append('\n'); ()
          case None => return None // un-pinned RDD: no provenance
        }
      case _ => return None
    }
    val files = input.inputFiles
    if (files.isEmpty && !hasRdd) return None
    val sig = new StringBuilder
    files.sorted.foreach { f =>
      try {
        val p = java.nio.file.Paths.get(new java.net.URI(f))
        sig.append(f).append('|')
          .append(java.nio.file.Files.size(p)).append('|')
          .append(java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .append('\n')
      } catch { case _: Throwable => return None } // non-local FS: skip layer
    }
    val canon = input.queryExecution.analyzed.canonicalized
    // NO hashCode component here (unlike the in-session key): a
    // canonicalized attribute still carries ExprId.jvmId — a per-JVM
    // UUID — so the tree's content hash is session-unstable by
    // construction. The printed tree (full treeString: every node,
    // every expression with its arguments) + the output schema + the
    // parent content keys are the cross-session signature; plans whose
    // payloads can elide from printing (LocalRelation) are excluded
    // above. The compiled-code stamp ([[StoreOnce.codeStamp]]) also
    // participates (ADVICE r18 #1): for builds whose logic lives in the
    // CLOSURE rather than the input plan (KnnGraph.buildSearchGraph
    // over raw vectors), the plan prints identically across a logic
    // change — without the stamp a recompiled session would silently
    // serve the old session's artifact. Any recompile now rekeys every
    // artifact; the safe failure direction is an unnecessary rebuild.
    val plan = canon.toString + "@" + input.schema.catalogString
    val md = java.security.MessageDigest.getInstance("MD5")
    Some(md.digest((plan + params.mkString("|") + sig.toString +
        parentKeys.toString + "#" + StoreOnce.codeStamp).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  private def storeRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[DataFrame] = {
    val ok = java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_SUCCESS"))
    if (!ok) None
    else try {
      storeReadCounter.incrementAndGet()
      // spread to the session width: a store artifact can read back as
      // one split, and the pinned frame feeds compute-dense serves
      // (the repIndex AQE-freeze rationale)
      Some(graft.sources.Tables.spreadToWidth(spark.read.parquet(dir)))
    } catch { case e: Throwable =>
      System.err.println(s"[graft] index store read failed ($dir): ${e.getMessage}")
      storeReadCounter.decrementAndGet()
      None
    }
  }

  private def storeWrite(df: DataFrame, dir: String): Unit = try {
    val target = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(target)) return // racer finished first
    val tmp = dir + ".tmp-" + java.util.UUID.randomUUID().toString
    StoreMeter.timed {
      df.write.mode("overwrite").parquet(tmp)
    }
    try java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: Throwable => // lost the rename race: drop ours
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    storeWriteCounter.incrementAndGet()
    ()
  } catch { case e: Throwable =>
    System.err.println(s"[graft] index store write failed ($dir): ${e.getMessage}")
  }

  /** Memoized frame build: returns the cached materialization for
    * (input, params) or runs `build`, pins it (eager localCheckpoint —
    * the pin is what makes the SECOND consumer a plain RDD scan instead
    * of a plan re-execution), and caches it. The pin keeps the build's
    * OWN partitioning: an index edge frame is O(N·m) — corpus-scaled,
    * not model-sized — so collapsing it to one partition would be a
    * scale cliff; at cluster scale the blocks stay spread across
    * executors exactly like the build output they snapshot. With the
    * persisted-store layer on, a miss may resolve as a store READ and
    * an expensive build writes through (see the disk-layer note). */
  def frame(input: DataFrame, params: Seq[Any])(build: => DataFrame): DataFrame = {
    if (!enabled) return build
    if (frames.size >= MaxEntries) clear()
    val k = key(input, params)
    val sc = input.sparkSession.sparkContext
    frames.get(k) match {
      case Some(e) if e.rddIds.subsetOf(sc.getPersistentRDDs.keySet) => e.df
      case stale =>
        // absent, or a blanket unpersist killed the pin: rebuild. The
        // dead entry is dropped first so pinnedRddIds never advertises
        // ids another job could re-pin by coincidence.
        stale.foreach(_ => frames.remove(k))
        val t0 = System.nanoTime()
        missCounter.incrementAndGet()
        // content key computed whether or not the store is on: derived
        // builds need their PARENTS' keys recorded to be signable
        val contentKey: Option[String] = diskKey(input, params)
        val diskPath: Option[String] =
          storeDir.flatMap(root => contentKey.map(ck => s"$root/$ck"))
        val fromStore: Option[DataFrame] =
          diskPath.flatMap(storeRead(input.sparkSession, _))
        // force the body first (its own intra-build pins run here and
        // remain pass-scoped garbage), then snapshot-diff the persistent
        // set around the FINAL pin so the entry records exactly its own
        // checkpoint blocks
        def pin(df: DataFrame): (DataFrame, Set[Int]) = {
          val before = sc.getPersistentRDDs.keySet
          val p = df.localCheckpoint(true)
          (p, (sc.getPersistentRDDs.keySet -- before).toSet)
        }
        // a store artifact that passes schema inference can still fail
        // at materialization (truncated/corrupt data pages) — the
        // degrade contract covers the WHOLE read path, so the pin of a
        // store frame falls back to a plain build on any error
        // (ADVICE r18 #4), never errors the query
        var usedStore = fromStore.isDefined
        val (out, ids) = fromStore match {
          case Some(sf) =>
            val beforeTry = sc.getPersistentRDDs.keySet
            try pin(sf) catch { case e: Throwable =>
              System.err.println(
                s"[graft] index store materialize failed (${diskPath.get}), " +
                  s"rebuilding: ${e.getMessage}")
              storeReadCounter.decrementAndGet()
              usedStore = false
              // a pin that failed PARTWAY may have registered blocks the
              // entry will never record — release them before falling
              // back, or a non-harness caller leaks them for the
              // session (ADVICE r19 #4)
              sc.getPersistentRDDs
                .filter { case (id, _) => !beforeTry.contains(id) }
                .values.foreach(r =>
                  try r.unpersist(false) catch { case _: Throwable => () })
              // drop the corrupt artifact so the write-through below
              // can replace it (self-heal) instead of every future
              // session paying a failed read
              try org.apache.commons.io.FileUtils.deleteDirectory(
                new java.io.File(diskPath.get))
              catch { case _: Throwable => () }
              pin(build)
            }
          case None => pin(build)
        }
        val buildWall = System.nanoTime() - t0
        buildNanoCounter.addAndGet(buildWall)
        // the pin's checkpoint RDD now CARRIES this content key —
        // derived index builds reading this frame inherit provenance
        contentKey.foreach { ck =>
          out.queryExecution.analyzed match {
            case l: org.apache.spark.sql.execution.LogicalRDD =>
              rddContentKeys(l.rdd.id) = ck
            case _ => ()
          }
        }
        // write-through from the PINNED frame (one block scan, no plan
        // re-execution), only for builds worth persisting
        if (!usedStore && diskPath.isDefined && buildWall >= minWriteNanos)
          storeWrite(out, diskPath.get)
        frames.putIfAbsent(k, Entry(out, ids)) match {
          case Some(raced) if raced.rddIds.subsetOf(sc.getPersistentRDDs.keySet) =>
            // a concurrent builder won the slot; serve its frame and
            // release ours (determinism makes the two bit-identical)
            out.unpersist(false)
            raced.df
          case Some(_) => // racer's pin already dead — replace it
            frames.put(k, Entry(out, ids)); out
          case None => out
        }
    }
  }

  /** Memoized driver-side value (a trained model, a collected centroid
    * table) derived deterministically from (input, params). */
  def value[T](input: DataFrame, params: Seq[Any])(compute: => T): T = {
    if (!enabled) return compute
    if (values.size >= MaxEntries) clear()
    values.getOrElseUpdate(key(input, params), {
      missCounter.incrementAndGet()
      val t0 = System.nanoTime()
      val v = compute.asInstanceOf[Any]
      buildNanoCounter.addAndGet(System.nanoTime() - t0)
      v
    }).asInstanceOf[T]
  }
}
