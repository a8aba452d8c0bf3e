package graft.sources

import org.apache.spark.sql.SparkSession

/** Runtime guard over each store's DERIVED batch-slot space (ADVICE r14
  * medium: the mutating APIs map public batch ids to physical
  * partitions through different slot schemes — raw ids for
  * append/delete, `2b`/`2b+1` for upserts, `3b`/`3b+1`/`3b+2` for the
  * mutation fold — so distinct public ids from different APIs can
  * collide on one partition, e.g. `upsertBatch(3)` → slots 6,7 vs
  * `applyMutationBatch(2)` → slots 6,7,8, and dynamic partition
  * overwrite would then silently destroy the earlier batch and corrupt
  * the stats increments. The "batchId must be unique and monotone"
  * contract is stated over PUBLIC ids per API and cannot see across
  * APIs).
  *
  * The contract, restated enforceably: uniqueness and monotonicity
  * apply to the DERIVED slot ids. Each public mutating call claims its
  * whole slot group `[minSlot, minSlot+width)` up front by creating a
  * marker file `_slots/g<minSlot>_<scheme>_<width>` (a driver FS op,
  * no Spark job — mutating-path-only, probes never touch it):
  *
  *  - marker already present → the call is a crash REPLAY of the same
  *    group (the stores' dynamic-overwrite idempotence makes that a
  *    byte-identical no-op) — allowed;
  *  - same `minSlot` under a DIFFERENT scheme or width → the exact
  *    cross-API collision — rejected;
  *  - otherwise the group must start ABOVE every slot already taken
  *    (claimed groups ∪ landed `batch_id=` partitions, build `-1`
  *    excluded) — out-of-order or overlapping ids are rejected before
  *    any byte lands.
  *
  * Markers survive [[IndexStore.compact]]-style folds (the slot space
  * is monotone over the store's whole life — a reused id after compact
  * is exactly the stale-cache hazard the contracts forbid) and clear
  * only on a full rebuild ([[clear]] from each store's `write`). */
private[sources] object SlotGuard {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Claim slot group `[minSlot, minSlot+width)` for `scheme`, or throw.
    * `dataDirs` are the store's partitioned layouts (e.g. `postings`,
    * `tombstones`) whose landed `batch_id=` values also bound the floor
    * — so stores predating the marker system stay guarded. */
  def claim(spark: SparkSession, path: String, scheme: String,
      minSlot: Long, width: Int, dataDirs: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$path/_slots")
    val fs = fsOf(spark, root)
    val marker = new Path(root, s"g${minSlot}_${scheme}_$width")
    if (fs.exists(marker)) return // crash replay of the same group
    val claimed: Seq[(Long, String, Int)] =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath.getName).flatMap { n =>
        n.stripPrefix("g").split("_") match {
          case Array(m, s, w) => Some((m.toLong, s, w.toInt))
          case _ => None
        }
      }
    claimed.find(_._1 == minSlot).foreach { case (_, s, w) =>
      throw new IllegalStateException(
        s"slot group g$minSlot ($scheme, width $width) collides with an " +
          s"already-claimed group ($s, width $w) on $path — public batch " +
          "ids must be unique and monotone over their DERIVED slot ids, " +
          "across every mutating API of one store")
    }
    val landed = dataDirs.flatMap { d =>
      val p = new Path(s"$path/$d")
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
        .filter(_ >= 0)
    }
    val taken = claimed.map(c => c._1 + c._3 - 1) ++ landed
    if (taken.nonEmpty && minSlot <= taken.max)
      throw new IllegalStateException(
        s"slot group [$minSlot, ${minSlot + width - 1}] ($scheme) is not " +
          s"above the store's slot high-water ${taken.max} on $path — " +
          "public batch ids must be unique and monotone over their " +
          "DERIVED slot ids, across every mutating API of one store")
    fs.mkdirs(root)
    fs.create(marker, true).close()
  }

  /** Drop every claim — a full rebuild restarts the slot space. */
  def clear(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(s"$path/_slots")
    val fs = fsOf(spark, root)
    if (fs.exists(root)) fs.delete(root, true)
    ()
  }
}
