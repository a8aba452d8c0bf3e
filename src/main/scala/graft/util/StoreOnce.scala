package graft.util

import org.apache.spark.sql.DataFrame

/** Build-once guard for PERSISTED stores — the reference's restart
  * semantics applied to the bench/serving lifecycle: a process that
  * restarts REOPENS its persisted index files, it does not rebuild
  * them (`src/node_main.cc:38-87` loads shards from disk at startup;
  * rebuild happens only when the data changed). The lifecycle queries
  * (`bm25_log`, `ann_mih_log`, `hybrid_log`, …) build a store at a
  * content-tagged path, fold a mutation log into it, and serve —
  * within a session the build is memoized via [[IndexCache.value]],
  * but every NEW session re-ran the whole build+fold+compact even
  * though the finished store was still on disk (BENCH r18: 95 s of a
  * 156 s `build_warm_s_total` was exactly these three rebuilds).
  *
  * [[ensure]] skips the build when the store's `_GRAFT_BUILD` marker
  * matches the expected fingerprint. The fingerprint must cover BOTH
  * the input content ([[inputSig]]: path/size/mtime of every input
  * file) and the builder code ([[codeStamp]]: a digest of the whole
  * compiled `graft` class tree — ANY recompile invalidates, so a
  * layout or logic change can never serve a stale store; the safe
  * failure direction is an unnecessary rebuild). On mismatch the
  * stale directory is deleted before the rebuild so layouts never
  * mix.
  *
  * ACTIVE only when the persisted-store layer is on
  * (`-Dgraft.indexStoreDir=`, the bench's serving condition) —
  * correctness harnesses (Verify without the flag) keep rebuilding
  * from scratch every run. */
object StoreOnce {
  private val skippedCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Builds skipped because the persisted store already matched. */
  def skipped: Long = skippedCounter.get()

  private def enabled: Boolean =
    sys.props.get("graft.indexStoreDir").exists(_.nonEmpty)

  /** Digest of the compiled `graft` class tree (name|size|mtime per
    * class file): changes on ANY recompile. Outside a file-based
    * classpath (jar-based runs) the classes' provenance is unknown, so
    * the fallback is a per-JVM random stamp — fingerprints from such a
    * session can never match any other session's, and every session
    * rebuilds (the safe direction; ADVICE r18 #2: the old deterministic
    * "nocode" fallback made two DIFFERENT builds' fingerprints match,
    * serving a stale store after a code change). */
  private lazy val unknownCodeStamp: String =
    "nocode-" + java.util.UUID.randomUUID().toString
  /** True when [[codeStamp]] fell back to the per-JVM random stamp —
    * such a session's disk keys can never match any other session's,
    * so content-addressed store layers should skip both reads AND
    * write-throughs (ADVICE r19 #3: write-throughs under a random
    * stamp accumulate orphan artifacts no session can ever read). */
  def codeStampUnknown: Boolean = codeStamp == unknownCodeStamp
  lazy val codeStamp: String = try {
    // getCodeSource, not getResource: a forked sbt run loads classes
    // through a manifest Class-Path wrapper jar, so resource URLs come
    // back jar-schemed even though the classes live in a directory —
    // but the protection domain's code source names the ACTUAL element
    // (the classes dir, or a real jar) the class came from.
    val loc = getClass.getProtectionDomain.getCodeSource.getLocation
    val p = java.nio.file.Paths.get(loc.toURI)
    if (java.nio.file.Files.isDirectory(p)) {
      val root = p.resolve("graft") // the compiled graft class tree
      val md = java.security.MessageDigest.getInstance("MD5")
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.sorted().forEach { q =>
          if (q.toString.endsWith(".class")) {
            md.update((root.relativize(q).toString + "|" +
              java.nio.file.Files.size(q) + "|" +
              java.nio.file.Files.getLastModifiedTime(q).toMillis + "\n")
              .getBytes("UTF-8"))
          }
        }
      } finally stream.close()
      md.digest().map("%02x".format(_)).mkString
    } else if (java.nio.file.Files.isRegularFile(p)) {
      // jar deployment. NOT path|size|mtime: sbt's forked run executes
      // from a per-invocation COPY of the packaged jar
      // (target/bg-jobs/sbt_<random>/…), so path and mtime change every
      // run even when the code did not. The entry table (name|size|crc)
      // is content-derived — stable across copies/repacks of identical
      // classes, changed by any recompile.
      val md = java.security.MessageDigest.getInstance("MD5")
      val jf = new java.util.jar.JarFile(p.toFile)
      try {
        import scala.jdk.CollectionConverters._
        jf.entries().asScala.toSeq.sortBy(_.getName).foreach { e =>
          if (!e.isDirectory)
            md.update((e.getName + "|" + e.getSize + "|" + e.getCrc + "\n")
              .getBytes("UTF-8"))
        }
      } finally jf.close()
      md.digest().map("%02x".format(_)).mkString
    } else unknownCodeStamp
  } catch { case _: Throwable => unknownCodeStamp }

  /** Sorted (path|size|mtime) signature of a frame's input files —
    * the content side of a store fingerprint. */
  def inputSig(df: DataFrame): String = {
    val sb = new StringBuilder
    df.inputFiles.sorted.foreach { f =>
      try {
        val p = java.nio.file.Paths.get(new java.net.URI(f))
        sb.append(f).append('|')
          .append(java.nio.file.Files.size(p)).append('|')
          .append(java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .append('\n')
      } catch { case _: Throwable => sb.append(f).append("|?\n") }
    }
    sb.toString
  }

  /** Run `build` unless `path` already holds a store built from the
    * same fingerprint (see object scaladoc). The marker is written
    * LAST — a crashed build leaves no marker and rebuilds next time. */
  def ensure(path: String, fingerprint: String)(build: => Unit): Unit =
    ensure(Seq(path), fingerprint)(build)

  /** Multi-store form: one build writes SEVERAL store directories
    * (hybrid_log: graph + inverted index). Skips only when EVERY
    * directory's marker matches — a partially-deleted pair can never
    * serve half a build; on any mismatch ALL directories are rebuilt
    * fresh together. */
  def ensure(paths: Seq[String], fingerprint: String)(build: => Unit): Unit = {
    val fp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest((fingerprint + "#" + codeStamp).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    def markerOf(p: String) = java.nio.file.Paths.get(p, "_GRAFT_BUILD")
    // marker alone is not enough (ADVICE r19 #2): tmpdir age-based
    // cleaners can delete store data files while the marker survives,
    // and a skipped build would then fail at serve time with no
    // degrade-to-rebuild. Require at least one parquet commit marker
    // (_SUCCESS) somewhere under the store root too — every layout this
    // guard protects (GraphStore/IndexStore/BinaryStore/ModelStore)
    // writes its tables through Spark's committer.
    def hasData(p: String): Boolean = try {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try stream.anyMatch(q => q.getFileName != null &&
        q.getFileName.toString == "_SUCCESS")
      finally stream.close()
    } catch { case _: Throwable => false }
    val allMatch = enabled && paths.forall { p =>
      val m = markerOf(p)
      java.nio.file.Files.exists(m) &&
        new String(java.nio.file.Files.readAllBytes(m), "UTF-8") == fp &&
        hasData(p)
    }
    // opt-in mismatch tracing (-Dgraft.storeDebug): prints enough to
    // see WHICH side of a fingerprint went stale (marker vs expected,
    // and the raw fingerprint before hashing) without hashing secrets
    val debugOn = sys.props.get("graft.storeDebug").exists(_.nonEmpty) ||
      sys.env.get("GRAFT_STORE_DEBUG").exists(_.nonEmpty)
    if (debugOn && !allMatch) {
      paths.foreach { p =>
        val m = markerOf(p)
        val cur = if (java.nio.file.Files.exists(m))
          new String(java.nio.file.Files.readAllBytes(m), "UTF-8") else "<absent>"
        val loc = try getClass.getProtectionDomain.getCodeSource.getLocation.toString
          catch { case _: Throwable => "<none>" }
        System.err.println(s"[graft.storeDebug] $p marker=$cur expected=$fp " +
          s"enabled=$enabled codeStamp=$codeStamp loc=$loc rawFp=${fingerprint.take(400)}")
      }
    }
    if (allMatch) { skippedCounter.incrementAndGet(); return }
    // stale or absent: rebuild FRESH so layouts never mix
    paths.foreach { p =>
      val dir = new java.io.File(p)
      if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    build
    if (enabled) paths.foreach { p =>
      try { java.nio.file.Files.write(markerOf(p), fp.getBytes("UTF-8")); () }
      catch { case e: Throwable =>
        System.err.println(s"[graft] store marker write failed ($p): ${e.getMessage}")
      }
    }
    ()
  }
}
