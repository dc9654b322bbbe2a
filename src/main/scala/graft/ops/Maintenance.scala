package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: MERGE upsert and small-file
  * compaction. Both are first-class jobs in a 100 TB pipeline — the
  * first is how incremental ingest lands (CDC batches, label fixes,
  * re-scraped documents), the second is how a table stays scannable
  * after thousands of incremental writes have fragmented it.
  */
/** Atomic table publication by MANIFEST swap — the commit protocol
  * both maintenance ops publish through. A "table" is a directory
  * holding immutable `data-<version>/` parquet directories plus one
  * `MANIFEST` file naming the current version. Publishing writes a
  * COMPLETE new data directory first, then swaps the manifest with a
  * single same-filesystem rename (atomic on POSIX and HDFS): a reader
  * concurrent with any rewrite resolves either the old or the new
  * version in full — never a mix, never a partially-written directory.
  * This is the lakehouse answer (Iceberg/Delta commit in miniature);
  * plain `mode("overwrite")` to a live path deletes before it writes
  * and has no such guarantee at any scale.
  *
  * Superseded versions are garbage collected by AGE, not by commit
  * count: a commit records each newly-unreferenced directory's
  * supersession time in a tombstone marker, and only directories
  * superseded longer than [[RetentionMsKey]] ago are deleted. The
  * pre-round-14 policy ("two versions retained") deleted version N−1's
  * data at version N+1's commit — at a per-micro-batch commit cadence
  * (the streaming MERGE sink) that window is SECONDS, and any
  * nontrivial concurrent scan of the table got FileNotFound mid-query.
  * The retention window makes reader safety a TIME guarantee
  * independent of commit rate (Delta's VACUUM-retention shape).
  */
object AtomicPublish {
  private val ManifestFile = "MANIFEST"
  private val LockFile = "_graft_commit_lock"
  private val TombPrefix = "_graft_tomb_"
  private val counter = new java.util.concurrent.atomic.AtomicLong()
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Conf: how long a committer waits for the cross-process lock before
    * failing loudly (another publisher is mid-commit). */
  val LockTimeoutMsKey = "spark.graft.manifest.lockTimeoutMs"
  val LockTimeoutMsDefault = 60000L

  /** Conf: lock age past which the holder is presumed dead (crashed
    * mid-commit) and the lock may be broken. Must exceed the longest
    * commit critical section (publish holds the lock through its data
    * write); the default assumes maintenance-job commit windows. */
  val LockStaleMsKey = "spark.graft.manifest.lockStaleMs"
  val LockStaleMsDefault = 600000L

  /** Conf: how long a SUPERSEDED data version stays on disk before GC
    * may delete it — the reader-safety window. A reader that resolved
    * the manifest at version N keeps scanning safely while any number
    * of later commits land, as long as its scan finishes within this
    * window of N's supersession. Size it to the longest expected scan
    * of the table; the storage bill is bounded by
    * (commit rate × version size × retention) — every publish here is
    * a FULL version, so minute-cadence sinks should keep this modest
    * (the default retains ~10 one-minute commits), while slow-scan
    * analytical tables should raise it. 0 restores delete-at-commit
    * (only safe single-reader-single-writer). */
  val RetentionMsKey = "spark.graft.manifest.retentionMs"
  val RetentionMsDefault = 600000L

  /** Atomic-exclusive file creation — the cross-process commit
    * primitive. HDFS `create(overwrite=false)` is atomic server-side;
    * the local filesystem goes through NIO `CREATE_NEW` (O_CREAT|O_EXCL)
    * because Hadoop's LocalFileSystem `create(false)` is
    * check-then-create (a TOCTOU window two racing drivers on one box —
    * a scheduler retry — would hit). Returns false when the lock is
    * already held. */
  private def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                 p: org.apache.hadoop.fs.Path,
                                 content: String): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath),
          content.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    }

  /** First whitespace-token of the lock file's content — the holder's
    * fencing token. None when the lock is missing or unreadable. */
  private def readLockToken(fs: org.apache.hadoop.fs.FileSystem,
                            lockPath: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val st = fs.getFileStatus(lockPath)
      val in = fs.open(lockPath)
      try {
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8").split("\\s+").headOption.filter(_.nonEmpty)
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Break a presumed-dead holder's lock via RENAME-TO-TOMBSTONE. The
    * rename is atomic, so of any number of concurrent breakers exactly
    * ONE displaces the lock — the previous delete-based break let
    * breaker B, acting on its pre-race mtime read, delete the FRESH
    * lock breaker C had just re-created, admitting two live holders.
    * Post-rename the displaced file's mtime is re-verified: a lock
    * refreshed between observation and rename (a heartbeat, or a new
    * holder landing in that window) is restored with a no-overwrite
    * rename; if even the restore loses a race, the displaced holder is
    * still protected by the swap-time fence ([[swapManifest]]). */
  private def breakStaleLock(fs: org.apache.hadoop.fs.FileSystem,
                             conf: org.apache.hadoop.conf.Configuration,
                             root: org.apache.hadoop.fs.Path,
                             lockPath: org.apache.hadoop.fs.Path,
                             staleMs: Long): Unit = {
    val tomb = new org.apache.hadoop.fs.Path(root,
      s".$LockFile.broken-${counter.incrementAndGet()}-${java.util.UUID.randomUUID()}")
    val renamed =
      try fs.rename(lockPath, tomb)
      catch { case _: java.io.IOException => false }
    if (renamed) {
      val tombM =
        try Some(fs.getFileStatus(tomb).getModificationTime)
        catch { case _: java.io.FileNotFoundException => None }
      tombM match {
        case Some(m) if System.currentTimeMillis() - m > staleMs =>
          // confirmed stale after the atomic displacement: reclaim it
          try { fs.delete(tomb, false); () }
          catch { case _: java.io.IOException => () }
        case Some(_) =>
          // the lock was refreshed between observation and rename — we
          // displaced a LIVE lease; put it back without overwriting
          // (if a new lock landed meanwhile, the displaced holder's
          // swap-time fence keeps the manifest safe)
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
            fc.rename(fs.makeQualified(tomb), fs.makeQualified(lockPath))
          } catch {
            case _: Throwable =>
              try { fs.delete(tomb, false); () }
              catch { case _: java.io.IOException => () }
          }
        case None => ()
      }
    }
  }

  /** Run `body` holding the table's CROSS-PROCESS commit lock (an
    * exclusive-create lock file at the table root); `body` receives the
    * holder's FENCING TOKEN (also written into the lock file), which
    * [[swapManifest]] re-verifies immediately before the commit rename.
    * The JVM-local `tableLocks` map serializes threads cheaply within
    * one driver; this lease is what makes the manifest
    * read-modify-write safe when TWO DRIVER PROCESSES commit
    * concurrently — a scheduler retry or a backfill racing the daily
    * appender previously lost a segment silently (last manifest swap
    * won). A held lock is waited on up to [[LockTimeoutMsKey]], then
    * the commit fails loudly; a lock whose mtime is older than
    * [[LockStaleMsKey]] is presumed orphaned by a DEAD holder and
    * broken atomically ([[breakStaleLock]]). Staleness keys on mtime,
    * not creation, because a LIVE holder HEARTBEATS the lock (a daemon
    * thread re-touches it every staleMs/3): a 100 TB publish whose
    * data write outlives the stale threshold keeps its lease — only a
    * holder that actually died stops refreshing and ages out. The
    * heartbeat verifies the lock still carries ITS token before each
    * touch — a holder whose lease was stolen stops refreshing the
    * thief's lock and is fenced at its swap.
    *
    * FILESYSTEM CONTRACT: the lease needs atomic exclusive-create,
    * atomic rename, and `setTimes` — POSIX and HDFS provide them.
    * Object stores (S3 and friends) don't, reliably; there the
    * industry answer is an external lock service next to the commit
    * log (Delta's S3 LogStore shape), deliberately out of scope for a
    * dependency-free library — run maintenance single-writer per
    * table on such stores. */
  private def withCommitLock[A](spark: SparkSession,
                                fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path)
                               (body: String => A): A = {
    val lockPath = new org.apache.hadoop.fs.Path(root, LockFile)
    val conf = spark.sparkContext.hadoopConfiguration
    val timeoutMs = spark.conf.getOption(LockTimeoutMsKey)
      .map(_.toLong).getOrElse(LockTimeoutMsDefault)
    val staleMs = spark.conf.getOption(LockStaleMsKey)
      .map(_.toLong).getOrElse(LockStaleMsDefault)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      if (tryCreateExclusive(fs, lockPath,
        s"$token pid=${ProcessHandle.current().pid()} " +
          s"t=${System.currentTimeMillis()}")) acquired = true
      else {
        val mtime =
          try Some(fs.getFileStatus(lockPath).getModificationTime)
          catch { case _: java.io.FileNotFoundException => None }
        mtime match {
          case Some(m) if System.currentTimeMillis() - m > staleMs =>
            // presumed-dead holder (heartbeat stopped): break the lock
            // atomically; the retry loop's exclusive create then
            // decides who acquires
            breakStaleLock(fs, conf, root, lockPath, staleMs)
          case _ =>
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"manifest commit lock at $lockPath held past $timeoutMs ms " +
                  s"($LockTimeoutMsKey): another publisher is committing this " +
                  s"table — retry after it finishes, or if its holder is dead " +
                  s"the lock breaks itself after $staleMs ms ($LockStaleMsKey)")
            Thread.sleep(25)
        }
      }
    }
    // lease heartbeat: keep the holder visibly alive while the commit
    // (data write included) runs — without it a publish longer than
    // staleMs would have its lock stolen MID-COMMIT and the race the
    // lock exists to prevent would return exactly on the largest
    // tables. Each beat first checks the lock still carries OUR token:
    // a stolen lease (we were presumed dead during a long GC pause, a
    // breaker reclaimed the lock, a new holder acquired) must not be
    // kept artificially fresh by its zombie.
    val beatEvery = math.max(25L, staleMs / 3)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      while (!stop.get()) {
        try {
          if (readLockToken(fs, lockPath).contains(token))
            fs.setTimes(lockPath, System.currentTimeMillis(), -1)
        } catch { case _: Throwable => () }
        var waited = 0L
        while (!stop.get() && waited < beatEvery) {
          Thread.sleep(25); waited += 25
        }
      }
    }, s"graft-manifest-lock-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try body(token)
    finally {
      stop.set(true); beat.join(1000)
      // release ONLY our own lock: after a lease theft the path holds
      // the new holder's lock, which the zombie must not delete
      try {
        if (readLockToken(fs, lockPath).contains(token)) {
          fs.delete(lockPath, false); ()
        }
      } catch { case _: Throwable => () }
    }
  }

  /** Record-and-reap GC of data directories the just-committed manifest
    * no longer references; MUST run under the commit lock. Each
    * unreferenced `data-*` directory gets a tombstone marker stamping
    * its supersession time on first observation, and is deleted only
    * once that stamp is older than [[RetentionMsKey]] — so a reader
    * that resolved any earlier manifest keeps its data for at least the
    * retention window no matter how fast later commits land. Tombstones
    * are `_`-prefixed (invisible to parquet readers and source
    * stamping) and are reaped with their directory. */
  private def gcSuperseded(spark: SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           live: Set[String]): Unit = {
    val retentionMs = spark.conf.getOption(RetentionMsKey)
      .map(_.toLong).getOrElse(RetentionMsDefault)
    val now = System.currentTimeMillis()
    val entries = fs.listStatus(root)
    val dirs = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("data-")).toSet
    val tombs = entries
      .filter(f => !f.isDirectory && f.getPath.getName.startsWith(TombPrefix))
      .map(f => f.getPath.getName.stripPrefix(TombPrefix) -> f.getModificationTime)
      .toMap
    // orphaned markers (directory already gone) — reap
    tombs.keys.filterNot(dirs).foreach { d =>
      try { fs.delete(new org.apache.hadoop.fs.Path(root, TombPrefix + d), false); () }
      catch { case _: java.io.IOException => () }
    }
    dirs.filterNot(live).foreach { d =>
      // the tombstone's MTIME is the supersession clock (what every
      // later pass reads); the epoch written as content is forensics
      // for a human inspecting the table, not a second source of truth
      val supersededAt = tombs.getOrElse(d, {
        val out = fs.create(new org.apache.hadoop.fs.Path(root, TombPrefix + d), true)
        try out.write(now.toString.getBytes("UTF-8")) finally out.close()
        now
      })
      if (now - supersededAt >= retentionMs) {
        fs.delete(new org.apache.hadoop.fs.Path(root, d), true)
        try { fs.delete(new org.apache.hadoop.fs.Path(root, TombPrefix + d), false); () }
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Run `write` against a fresh versioned data directory under
    * `tablePath`, then atomically point the manifest at it.
    * Returns the published data-directory name.
    *
    * Concurrency contract: READERS are always safe against any number
    * of concurrent publishers (the manifest swap is the only mutation
    * they observe). PUBLISHERS are serialized per table at two levels:
    * a JVM-local lock (threads of one driver, cheap) and — round 13 —
    * a CROSS-PROCESS commit lock (an exclusive-create lock file at the
    * table root, the miniature of Delta's optimistic log / Iceberg's
    * lock-service commit), so a scheduler retry or a backfill driver
    * racing the daily appender can no longer interleave with a commit's
    * read-modify-write or its GC. See [[appendSegmentCrossProcess]] for
    * the compare-and-swap this buys appends. */
  def publish(spark: SparkSession, tablePath: String)
             (write: String => Unit): String =
    tableLocks.computeIfAbsent(tablePath, _ => new Object).synchronized {
      publishCrossProcess(spark, tablePath)(write)
    }

  /** The cross-process commit path of [[publish]] (no JVM fast-path
    * lock) — package-private so the racing-writers spec can drive two
    * simulated driver processes through it. The commit lock spans the
    * prev-read, data write, swap, AND the GC: a concurrent appender can
    * therefore never have its freshly-written (not yet committed)
    * segment collected, and the prev-read can never go stale between
    * read and swap. */
  private[graft] def publishCrossProcess(spark: SparkSession, tablePath: String)
                                        (write: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    withCommitLock(spark, fs, root) { token =>
      val dataDir =
        s"data-${System.currentTimeMillis()}-${counter.incrementAndGet()}"
      write(fs.makeQualified(new org.apache.hadoop.fs.Path(root, dataDir)).toString)
      swapManifest(fs, conf, root, dataDir, token)
      // age-based GC of everything the new manifest no longer references
      gcSuperseded(spark, fs, root, live = Set(dataDir))
      dataDir
    }
  }

  /** The commit point: write the manifest content to a temp file and
    * RENAME it over `MANIFEST` — one rename, atomic-with-overwrite on
    * the same filesystem.
    *
    * On HDFS that is `FileContext.rename(…, OVERWRITE)` (Hdfs
    * overrides `renameInternal` with a genuinely atomic overwrite).
    * On the LOCAL filesystem it is NIO `ATOMIC_MOVE` — round 14 found
    * (via the streaming tail's continuous manifest polling) that the
    * local FileContext path falls back to AbstractFileSystem's
    * default delete-then-rename, which has a missing-MANIFEST window
    * a concurrent reader can hit; the NIO move also skips Hadoop's
    * `.crc` sidecars (the stale destination sidecar is removed so
    * ChecksumFileSystem readers never verify new bytes against an old
    * checksum). The same local-vs-HDFS dual path as
    * [[tryCreateExclusive]].
    *
    * FENCED: immediately before the rename the lock file is re-read
    * and must still carry `fenceToken` — a holder that lost its lease
    * (paused past the stale threshold, lock broken, a new holder
    * acquired) fails LOUDLY here instead of clobbering the new
    * holder's manifest last-write-wins. Residue: a thief landing in
    * the gap between this read and the rename is still clobbered —
    * closing that needs a filesystem with compare-and-swap or an
    * external lock service (the Delta/Iceberg endgame); the fence
    * narrows the zombie-writer window from the WHOLE commit to one
    * read-rename gap. */
  private def swapManifest(fs: org.apache.hadoop.fs.FileSystem,
                           conf: org.apache.hadoop.conf.Configuration,
                           root: org.apache.hadoop.fs.Path,
                           content: String,
                           fenceToken: String): Unit = {
    val lockPath = new org.apache.hadoop.fs.Path(root, LockFile)
    if (!readLockToken(fs, lockPath).contains(fenceToken))
      throw new IllegalStateException(
        s"commit fenced at $root: this holder's lease was lost mid-commit " +
          "(paused past the stale threshold and the lock was broken, or an " +
          "out-of-protocol writer replaced the lock) — the manifest was NOT " +
          "swapped; re-run the commit")
    val manifest = new org.apache.hadoop.fs.Path(root, ManifestFile)
    if (fs.getScheme == "file") {
      val rootLocal = java.nio.file.Paths.get(
        fs.makeQualified(root).toUri.getPath)
      val tmp = rootLocal.resolve(
        s".manifest-${counter.incrementAndGet()}.tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      // a checksum sidecar from any pre-NIO-era commit would be stale
      // against the moved bytes — reads must never verify against it
      java.nio.file.Files.deleteIfExists(rootLocal.resolve(s".$ManifestFile.crc"))
      java.nio.file.Files.move(tmp, rootLocal.resolve(ManifestFile),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s".manifest-${counter.incrementAndGet()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(manifest),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** APPEND a segment: the manifest is a NEWLINE-SEPARATED SEGMENT
    * LIST (a one-line manifest is the single-segment special case
    * every older table already satisfies), and an append writes ONLY
    * the new segment's data then swaps in a manifest naming old + new
    * — the LSM shape a 100 TB daily-growing table needs, where
    * re-publishing the whole table per day ([[publish]]) would rewrite
    * corpus-sized data for a batch-sized change. Readers concurrent
    * with an append resolve the old or the new segment LIST in full —
    * never a partial segment. No GC here: every prior segment stays
    * live; [[Compact.rewrite]] (or a fresh [[publish]]) collapses the
    * segment list back to one and GCs. */
  def appendSegment(spark: SparkSession, tablePath: String)
                   (write: String => Unit): String =
    tableLocks.computeIfAbsent(tablePath, _ => new Object).synchronized {
      appendSegmentCrossProcess(spark, tablePath)(write)
    }

  /** The cross-process commit path of [[appendSegment]] (no JVM
    * fast-path lock) — package-private so the racing-writers spec can
    * simulate two DRIVER PROCESSES appending the same table. The
    * manifest read-modify-write is a COMPARE-AND-SWAP under the
    * cross-process commit lock: the segment list is (re-)read INSIDE
    * the commit window, so a segment committed by a racing appender
    * between this appender's intent and its swap lands in `prev` and
    * survives — the pre-round-13 shape (read prev outside any
    * cross-process coordination, then rename-with-overwrite) let the
    * last writer silently erase the other's segment, the first thing a
    * scheduler retry breaks in production. The post-swap read-back
    * verifies the committed list under the same lock; a mismatch means
    * an out-of-protocol writer touched the manifest and fails loudly. */
  private[graft] def appendSegmentCrossProcess(spark: SparkSession,
                                               tablePath: String)
                                              (write: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(conf)
    require(currentSegments(spark, tablePath).nonEmpty,
      s"appendSegment: no published version (MANIFEST) at $tablePath — " +
        "publish a base segment first")
    withCommitLock(spark, fs, root) { token =>
      val prev = currentSegments(spark, tablePath)
      require(prev.nonEmpty,
        s"appendSegment: table at $tablePath lost its published version " +
          "while waiting for the commit lock")
      val dataDir =
        s"data-${System.currentTimeMillis()}-${counter.incrementAndGet()}"
      write(fs.makeQualified(new org.apache.hadoop.fs.Path(root, dataDir)).toString)
      swapManifest(fs, conf, root, (prev :+ dataDir).mkString("\n"), token)
      val committed = currentSegments(spark, tablePath)
      require(committed == prev :+ dataDir,
        s"appendSegment: manifest verify failed at $tablePath — expected " +
          s"${(prev :+ dataDir).mkString(",")} but read ${committed.mkString(",")}; " +
          "an out-of-protocol writer modified the manifest inside the commit window")
      dataDir
    }
  }

  /** Outcome of [[compactSegments]]'s optimistic commit. */
  sealed trait CompactOutcome
  object CompactOutcome {
    /** The rewrite committed; `dataDir` is the new single segment. */
    final case class Compacted(dataDir: String) extends CompactOutcome
    /** The table already had ≤ 1 segment — nothing to do. */
    case object AlreadyCompact extends CompactOutcome
    /** Every attempt found the segment list changed between its read
      * and its commit window (the table is being appended faster than
      * it compacts). NOTHING was modified — safe to retry. */
    case object LostRace extends CompactOutcome
  }

  /** Collapse a SEGMENTED table to one fresh segment under OPTIMISTIC
    * concurrency: read the segment list, run the (possibly huge)
    * `write(observedSegmentPaths, stagingPath)` rewrite with NO lock
    * held, then re-acquire the commit lock and swap ONLY IF the segment
    * list is still exactly what the rewrite consumed — otherwise
    * discard the staging output and retry against the new list. Two
    * hazards die here at once: (a) a segment committed by a racing
    * appender between the list read and the swap can no longer be
    * silently dropped from the manifest (the CAS aborts instead), and
    * (b) the commit lock is held only for the read+rename+GC window
    * (milliseconds), never for the rewrite itself — so a multi-hour
    * 100 TB compaction cannot starve concurrent daily appends into
    * lock-timeout failures.
    *
    * The rewrite stages under a hidden `.compact-*` directory (invisible
    * to [[gcSuperseded]], which only considers `data-*`), renamed into
    * the live namespace inside the commit window — a metadata-only move.
    * A holder that crashes mid-rewrite leaks its staging directory;
    * entry sweeps `.compact-*` leftovers older than 24 h. */
  def compactSegments(spark: SparkSession, tablePath: String,
                      maxAttempts: Int = 3)
                     (write: (Seq[String], String) => Unit): CompactOutcome = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(conf)
    // reclaim staging dirs a crashed compactor abandoned (a LIVE rewrite
    // older than this is conceivable only at extreme scale — raise the
    // constant in source if yours runs past a day)
    val sweepBefore = System.currentTimeMillis() - 24L * 3600 * 1000
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(f => f.isDirectory && f.getPath.getName.startsWith(".compact-") &&
          f.getModificationTime < sweepBefore)
        .foreach(f => fs.delete(f.getPath, true))
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val observed = currentSegments(spark, tablePath)
      if (observed.size <= 1) return CompactOutcome.AlreadyCompact
      val stamp = s"${System.currentTimeMillis()}-${counter.incrementAndGet()}"
      val staging = new org.apache.hadoop.fs.Path(root, s".compact-$stamp")
      val dataDir = s"data-$stamp"
      try write(observed.map(d => s"$tablePath/$d"),
        fs.makeQualified(staging).toString)
      catch { case t: Throwable => fs.delete(staging, true); throw t }
      val committed = withCommitLock(spark, fs, root) { token =>
        if (currentSegments(spark, tablePath) == observed) {
          require(fs.rename(staging, new org.apache.hadoop.fs.Path(root, dataDir)),
            s"compactSegments: staging rename failed at $staging")
          swapManifest(fs, conf, root, dataDir, token)
          gcSuperseded(spark, fs, root, live = Set(dataDir))
          true
        } else false
      }
      if (committed) return CompactOutcome.Compacted(dataDir)
      fs.delete(staging, true) // lost the race: discard, re-observe
    }
    CompactOutcome.LostRace
  }

  /** The full segment list the manifest currently names (empty when
    * unpublished). Single-segment tables return one entry.
    *
    * Tolerates the LOCAL filesystem's checksum-sidecar race: Hadoop's
    * ChecksumFileSystem renames a file and its `.crc` in two steps, so
    * a reader polling the manifest concurrently with a commit's rename
    * (the streaming tail does exactly that) can transiently see the
    * new MANIFEST against the old checksum. The read retries briefly —
    * the window is the gap between the two renames. HDFS/object stores
    * don't materialize client-side crc sidecars this way. */
  def currentSegments(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(conf)
    val m = new org.apache.hadoop.fs.Path(root, ManifestFile)
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        if (!fs.exists(m)) return Nil
        val in = fs.open(m)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(m).getLen.toInt)
          in.readFully(bytes)
          return new String(bytes, "UTF-8").linesIterator.map(_.trim)
            .filter(_.nonEmpty).toSeq
        } finally in.close()
      } catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          if (attempt >= 40) throw e
          Thread.sleep(25)
        case _: java.io.FileNotFoundException =>
          // exists↔open race with a concurrent swap: retry resolves to
          // the new manifest
          if (attempt >= 40) return Nil
          Thread.sleep(25)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The BASE data directory (first manifest segment), if published —
    * the home of table-level sidecar metadata; data readers should use
    * [[read]]/[[currentSegments]], which see every segment. */
  def currentDataDir(spark: SparkSession, tablePath: String): Option[String] =
    currentSegments(spark, tablePath).headOption

  /** Reader side of the protocol: resolve the manifest, read every
    * segment it names. One manifest read per query plan — the scan
    * itself binds to the immutable versioned directories. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    currentSegments(spark, tablePath) match {
      case Nil => throw new IllegalStateException(
        s"no published version (MANIFEST) at $tablePath")
      case segs => spark.read.parquet(segs.map(d => s"$tablePath/$d"): _*)
    }

  /** Explicit retention reaper — the VACUUM of this protocol. GC
    * normally piggybacks on commits ([[gcSuperseded]] runs inside
    * every publish/compact window), so a table that KEEPS committing
    * reaps itself; a table whose writes stop, or whose last commits
    * all landed inside the retention window, keeps its superseded
    * `data-*` directories until someone commits again. This runs the
    * same tombstone-and-reap pass under the commit lock without
    * publishing anything. Honors [[RetentionMsKey]] — a vacuum cannot
    * delete data a lagging reader is still entitled to. */
  def vacuum(spark: SparkSession, tablePath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(conf)
    val live = currentSegments(spark, tablePath)
    require(live.nonEmpty,
      s"vacuum: no published version (MANIFEST) at $tablePath")
    withCommitLock(spark, fs, root) { _ =>
      gcSuperseded(spark, fs, root,
        live = currentSegments(spark, tablePath).toSet)
    }
  }

  /** SQL front door for the table protocol: resolve the manifest ONCE
    * and register the version's reader as a temp view, so `spark.sql`
    * text can query merge-sink / published-table state the ops API
    * built (pre-round-14 a SQL user could not touch it at all). The
    * view binds the immutable versioned directories — a later commit
    * does not contaminate queries against this registration (the same
    * snapshot semantic [[read]] gives plans); re-register to advance.
    * SqlFrontDoorSpec pins `sameResult` plan equality between SQL text
    * over the view and the ops-API read. */
  def registerView(spark: SparkSession, tablePath: String,
                   viewName: String): DataFrame = {
    val df = read(spark, tablePath)
    df.createOrReplaceTempView(viewName)
    df
  }
}

object MergeInto {

  /** SCD-1 MERGE INTO: rows of `source` win on key match (UPDATE),
    * land on no match (INSERT); unmatched `target` rows pass through.
    * Schemas must be union-compatible by name.
    *
    * Scale shape: ONE left-anti shuffle join of target against the
    * distinct source keys plus a union — no full-outer join (whose
    * coalesce-per-column plan reshuffles BOTH sides and breaks column
    * pruning). With the target bucketed on the key (engine.Scratch) the
    * anti join is shuffle-free on the big side, which is the layout a
    * real lakehouse MERGE exploits.
    */
  def upsert(target: DataFrame, source: DataFrame,
             keys: Seq[String]): DataFrame =
    target
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source)

  /** MERGE-and-commit against a published table: read the current
    * version, apply [[upsert]], publish the result as a new version
    * via [[AtomicPublish]]. A reader concurrent with the merge sees
    * the pre-merge or post-merge table in full, never a mix.
    *
    * The read of the current version binds INSIDE the commit window
    * (the publish callback runs under the table's commit lock) —
    * round 14 fix: binding it before the lock, as pre-round-14 code
    * did, let two racing MERGEs both read version N and the second
    * swap silently erase the first's changes (the read-modify-write
    * lost-update race, the MERGE twin of the appendSegment race the
    * round-13 CAS closed). MaintenanceSpec races 4 upserters and
    * requires every merge to survive. */
  def upsertInto(spark: SparkSession, tablePath: String, source: DataFrame,
                 keys: Seq[String]): DataFrame = {
    AtomicPublish.publish(spark, tablePath) { p =>
      upsert(AtomicPublish.read(spark, tablePath), source, keys)
        .write.parquet(p)
    }
    AtomicPublish.read(spark, tablePath)
  }
}

object Compact {

  /** Rewrite a fragmented parquet directory into ~`targetBytes` files:
    * list the leaves, size the output partition count from real bytes,
    * and round-robin repartition into the rewrite. Returns the
    * compacted-file DataFrame reader.
    *
    * At 100 TB compaction runs per partition-directory (this function's
    * unit of work), bin-packing each independently — never a global
    * rewrite of the table. The shuffle it pays is the point: it buys
    * every later scan fewer, larger, row-group-aligned files.
    */
  def rewrite(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // Resolve the manifest first when the INPUT is itself a published
    // table (chained compactions, compacting MergeInto or appendSegment
    // output): its root holds only MANIFEST + data-* directories, which
    // a raw parquet read cannot infer a schema from. ALL segments are
    // read — compacting a segmented table collapses it to one segment.
    def resolveInDirs(): Seq[String] =
      AtomicPublish.currentSegments(spark, inPath) match {
        case Nil => Seq(inPath)
        case segs => segs.map(d => s"$inPath/$d")
      }
    val sizedDirs = resolveInDirs()
    val fs = new org.apache.hadoop.fs.Path(sizedDirs.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = sizedDirs.map(d =>
      fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // Publish through the manifest swap — a reader concurrent with the
    // compaction resolves the old fragmented version until the single
    // atomic rename, never a half-written directory. The input segment
    // list is RE-RESOLVED inside the commit window (sizing above is
    // advisory): a self-targeted rewrite (inPath == outPath) of a live
    // table otherwise raced appenders exactly like the pre-round-14
    // index compaction — a segment committed between the outer resolve
    // and the swap would be silently dropped.
    AtomicPublish.publish(spark, outPath) { dataPath =>
      spark.read.parquet(resolveInDirs(): _*)
        .repartition(parts)
        .write.parquet(dataPath)
    }
    AtomicPublish.read(spark, outPath)
  }

  /** Data-file count of a parquet directory (compaction evidence);
    * resolves the manifest (all segments) when `path` is published. */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val dirs = AtomicPublish.currentSegments(spark, path) match {
      case Nil => Seq(path)
      case segs => segs.map(d => s"$path/$d")
    }
    val fs = new org.apache.hadoop.fs.Path(dirs.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirs.map(d => fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).sum
  }
}
