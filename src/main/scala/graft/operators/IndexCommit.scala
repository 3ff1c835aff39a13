package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic commit protocol for the persisted-index family — the
  * cross-JOB concurrency story the per-loop versioning (E284) doesn't give:
  * every index this library writes (MinHash bands, Hamming sketches, LSH /
  * IVF / PQ vectors, BM25 postings, cluster state) assumed a single writer,
  * and the in-place rewrites in [[IndexMaintenance.deleteRows]] /
  * [[IndexMaintenance.compact]] have a crash window in which the only copy
  * of the index is half-overwritten.
  *
  * The protocol (Delta/Iceberg-shaped, filesystem exclusive-create as the
  * arbiter):
  *
  *   - `root/data/<staged>` — immutable full-snapshot directories, written
  *     ONCE and never modified; the staging name carries the target
  *     version, the writer id and the attempt count, so concurrent writers
  *     never collide on a path.
  *   - `root/manifest/commit-<n>` — the pointer written LAST: a one-line
  *     file naming the snapshot directory for version n, claimed with
  *     create-if-absent (`FileSystem.create(dst, overwrite = false)`). The
  *     filesystem rejects the second creator, so exactly ONE writer owns
  *     version n; readers tolerate the microsecond create→write window by
  *     re-reading an empty marker briefly.
  *   - Readers resolve max committed n → marker content → snapshot dir.
  *     A reader never sees a partial write: either the marker exists (its
  *     snapshot was fully written first) or it doesn't (the reader stays
  *     on the previous version).
  *   - A writer that loses the rename race REBASES: re-resolves the newest
  *     committed snapshot, rebuilds its output from it, and retries at
  *     n+1 — so two interleaved appenders both land and neither's batch is
  *     lost (the lost-update failure of last-writer-wins overwrites).
  *   - A crash at ANY point leaves either a stale staging directory (never
  *     referenced, swept by [[vacuum]]) or nothing — the committed chain is
  *     untouched, which is the recovery guarantee the right-to-be-forgotten
  *     flow needs (the in-place path's failure mode was "rebuild the index
  *     from corpus text").
  *
  * Object stores without atomic rename need a real commit service (the
  * documented caveat of every rename-arbitrated table format); HDFS-like
  * and local filesystems are covered.
  */
object IndexCommit {

  private def hfs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "manifest")
  private def dataDir(root: String) = new Path(root, "data")

  private val MarkerPrefix = "commit-"

  /** A claimed-but-never-pointed marker (writer died between the exclusive
    * create and the pointer write) is reclaimable once this old — long
    * enough that the create→write window (microseconds on a live writer)
    * cannot be mistaken for a death.
    */
  private[graft] val EmptyMarkerGraceMs: Long = 60L * 1000L

  /** Marker versions present under the manifest, descending. */
  private def markerVersions(fs: FileSystem, root: String): Seq[Long] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Nil
    else
      fs.listStatus(dir)
        .iterator
        .map(_.getPath.getName)
        .collect { case n if n.startsWith(MarkerPrefix) => n.drop(MarkerPrefix.length).toLong }
        .toSeq
        .sorted(Ordering[Long].reverse)
  }

  /** The marker's pointer content, or None when the marker is EMPTY past
    * the retry budget (the claimant died between create and pointer write —
    * version n was never committed) or VANISHED mid-read (the claimant's
    * failure path retracted it — same thing). Both cases are "uncommitted",
    * never an error: the chain skips the version and writers reclaim the
    * husk after [[EmptyMarkerGraceMs]]. `retries` > 1 only where an
    * in-flight writer could still be inside the microsecond create→write
    * window (the newest marker); older empty markers are always corpses.
    */
  private def markerContent(fs: FileSystem, marker: Path, retries: Int): Option[String] = {
    var attempt = 0
    while (attempt < retries) {
      attempt += 1
      val name =
        try {
          val in = fs.open(marker)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch {
          // retracted (or reclaimed) between list and open: uncommitted
          case _: java.io.FileNotFoundException => return None
        }
      if (name.nonEmpty) return Some(name)
      if (attempt < retries) Thread.sleep(20L)
    }
    None
  }

  /** Newest RESOLVABLE version with its snapshot dir name: empty markers
    * are skipped (the head waits out the in-flight create→write window
    * first; older ones are dead claims), so a crashed claimant can never
    * wedge readers — they simply stay on the previous version.
    */
  private def resolveHead(spark: SparkSession, root: String): Option[(Long, String)] = {
    val fs = hfs(spark, manifestDir(root))
    val vs = markerVersions(fs, root)
    vs.zipWithIndex.iterator
      .flatMap { case (n, i) =>
        val marker = new Path(manifestDir(root), s"$MarkerPrefix$n")
        markerContent(fs, marker, retries = if (i == 0) 50 else 1).map(n -> _)
      }
      .nextOption()
  }

  /** Newest committed version, if any resolvable commit marker exists (a
    * marker whose claimant died before writing the pointer is NOT a
    * commit).
    */
  def committedVersion(spark: SparkSession, root: String): Option[Long] =
    resolveHead(spark, root).map(_._1)

  /** Snapshot directory committed as version `n` (the marker's content).
    * Throws for an explicitly-requested version that was never committed
    * (no marker, or a claimed-but-dead empty marker) — head resolution
    * never routes here for those.
    */
  private def snapshotPath(spark: SparkSession, root: String, n: Long): Path = {
    val marker = new Path(manifestDir(root), s"$MarkerPrefix$n")
    val fs = hfs(spark, marker)
    markerContent(fs, marker, retries = 50) match {
      case Some(name) => new Path(dataDir(root), name)
      case None =>
        throw new NoSuchElementException(
          s"IndexCommit: version $n at $root was never committed " +
            "(no pointer — absent, retracted, or a dead claim)"
        )
    }
  }

  /** Newest committed snapshot with its version; None before first commit. */
  def readCommitted(spark: SparkSession, root: String): Option[(Long, DataFrame)] =
    resolveHead(spark, root).map { case (n, name) =>
      (n, ParquetIO.read(spark, new Path(dataDir(root), name).toString))
    }

  /** Attempt to publish `stagedName` as version `n` by creating
    * `manifest/commit-<n>` with create-if-absent (`overwrite = false`) and
    * writing the snapshot pointer into it. The exclusive create is the
    * arbitration primitive: the filesystem rejects the second creator, so
    * exactly one writer owns version n. (The previous exists()-then-rename()
    * implementation was check-then-act — POSIX rename(2) REPLACES an
    * existing destination, so two racers could both believe they won and
    * one snapshot silently vanished.) Returns false when another writer
    * already owns n — the caller must rebase and retry. Exposed to tests to
    * drive the race deterministically.
    */
  private[graft] def tryCommitMarker(
      spark: SparkSession,
      root: String,
      n: Long,
      stagedName: String,
      writerId: String
  ): Boolean = {
    val dir = manifestDir(root)
    val fs = hfs(spark, dir)
    fs.mkdirs(dir)
    val dst = new Path(dir, s"$MarkerPrefix$n")
    val out =
      try fs.create(dst, false)
      catch {
        // lost the race: any creator-rejection means version n has an owner
        case _: java.io.IOException if fs.exists(dst) => return false
      }
    try {
      out.write(stagedName.getBytes("UTF-8"))
      out.close()
      true
    } catch {
      case e: Throwable =>
        // our claim succeeded but the pointer write failed (disk full, …):
        // retract the marker so the version number stays claimable rather
        // than leaving a permanently empty marker at the head of the chain
        try out.close()
        catch { case _: Throwable => () }
        fs.delete(dst, false)
        throw e
    }
  }

  /** Publish one atomic index transition. `build` receives the newest
    * committed snapshot (None before the first commit) and returns the next
    * full snapshot's rows; the protocol stages them, then commits the
    * pointer, REBASING through `build` again each time another writer got
    * there first. Returns the version this writer's transition landed as.
    *
    * `build` must be a pure function of its input snapshot (it re-runs on
    * rebase) — exactly the shape of every maintenance op in this library:
    * append = base ∪ batch, delete = base ⟕̸ condemned, compact = base
    * re-bucketed.
    */
  /** True when `marker` was an expired dead claim (empty past `graceMs`)
    * and this call deleted it — the version number is claimable again. A
    * marker that vanished before the status probe counts as already
    * reclaimed. Never touches a marker with content or a younger-than-grace
    * empty one (an in-flight writer inside its create→write window).
    */
  private[graft] def reclaimDeadMarker(
      fs: FileSystem,
      marker: Path,
      graceMs: Long = EmptyMarkerGraceMs
  ): Boolean = {
    val st =
      try fs.getFileStatus(marker)
      catch { case _: java.io.FileNotFoundException => return true }
    st.getLen == 0 &&
    st.getModificationTime < System.currentTimeMillis() - graceMs &&
    fs.delete(marker, false)
  }

  def commit(
      spark: SparkSession,
      root: String,
      writerId: String,
      partitionCols: Seq[String] = Nil,
      maxAttempts: Int = 20,
      emptyMarkerGraceMs: Long = EmptyMarkerGraceMs
  )(build: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = readCommitted(spark, root)
      val target = base.map(_._1).getOrElse(0L) + 1L
      val stagedName = s"v$target-$writerId-$attempt"
      val stagedPath = new Path(dataDir(root), stagedName)
      val rows = build(base.map(_._2))
      val w = rows.write.mode("errorifexists")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(stagedPath.toString)
      if (tryCommitMarker(spark, root, target, stagedName, writerId)) return target
      // lost the race. If the blocking marker is a dead claim (empty past
      // grace — its writer crashed between create and pointer write),
      // reclaim it and retry the SAME staged snapshot: the base did not
      // move, so no rebase (and no build re-run) is needed.
      val marker = new Path(manifestDir(root), s"$MarkerPrefix$target")
      val fs = hfs(spark, marker)
      if (reclaimDeadMarker(fs, marker, emptyMarkerGraceMs) &&
        tryCommitMarker(spark, root, target, stagedName, writerId)) return target
      // genuinely outraced: discard this attempt's snapshot, rebase, retry
      hfs(spark, stagedPath).delete(stagedPath, true)
    }
    throw new IllegalStateException(
      s"IndexCommit.commit: lost the commit race $maxAttempts times at $root — " +
        "writer contention this high needs a coordination service, not optimistic retry"
    )
  }

  /** Read a SPECIFIC committed version (time travel) — valid as long as
    * [[vacuum]] hasn't swept it.
    */
  def readVersion(spark: SparkSession, root: String, n: Long): DataFrame =
    ParquetIO.read(spark, snapshotPath(spark, root, n).toString)

  /** True iff `root` carries this protocol's layout (a manifest dir) —
    * how the SQL catalog distinguishes a committed index from a plain
    * dataset directory.
    */
  def isCommitRoot(spark: SparkSession, root: String): Boolean = {
    val m = manifestDir(root)
    hfs(spark, m).exists(m)
  }

  /** Snapshot DIRECTORY of version `n` (for serving the version through a
    * file-table surface rather than as a DataFrame).
    */
  def snapshotDir(spark: SparkSession, root: String, n: Long): String =
    snapshotPath(spark, root, n).toString

  /** Snapshot directory of the newest committed version, if any. */
  def latestSnapshotDir(spark: SparkSession, root: String): Option[String] =
    resolveHead(spark, root).map { case (_, name) => new Path(dataDir(root), name).toString }

  /** Newest version COMMITTED at or before `tsMillis` (marker-file mtime —
    * the same clock every rename-arbitrated table format time-travels by);
    * None when nothing was committed yet at that instant.
    */
  def versionAsOfTimestamp(spark: SparkSession, root: String, tsMillis: Long): Option[Long] = {
    val mDir = manifestDir(root)
    val fs = hfs(spark, mDir)
    markerVersions(fs, root).iterator
      .filter { n =>
        val marker = new Path(mDir, s"$MarkerPrefix$n")
        val mt =
          try Some(fs.getFileStatus(marker).getModificationTime)
          catch { case _: java.io.FileNotFoundException => None } // retracted mid-list
        mt.exists(_ <= tsMillis) && markerContent(fs, marker, retries = 1).nonEmpty
      }
      .nextOption()
  }

  /** Version-transition audit — "what did this commit change": full-row
    * diff of two committed versions as ('added' | 'removed', row...). The
    * operational read behind every transition this protocol hosts: an
    * append's diff is exactly its delta, a forget's exactly the condemned
    * neighborhood, a compact's empty. Shuffle is two version-sized
    * exceptAll passes — state-sized, never corpus-sized.
    */
  def diffVersions(
      spark: SparkSession,
      root: String,
      from: Long,
      to: Long
  ): DataFrame = {
    val a = readVersion(spark, root, from)
    val b = readVersion(spark, root, to)
    b.exceptAll(a)
      .withColumn("change", org.apache.spark.sql.functions.lit("added"))
      .unionByName(
        a.exceptAll(b)
          .withColumn("change", org.apache.spark.sql.functions.lit("removed"))
      )
  }

  /** Drop snapshots (and their markers) older than the newest `keep`
    * committed versions, plus abandoned staging directories — the remains
    * of crashed or outraced writers. Never touches the newest committed
    * chain, so concurrent readers on recent versions stay valid.
    *
    * A staging directory that was NEVER referenced by a marker is only
    * swept once it is older than `unreferencedGraceMs`: a concurrent writer
    * stages its snapshot BEFORE attempting the marker, so an eager sweep
    * would delete an in-flight commit's data and let its subsequent marker
    * publish a pointer to nothing (the same reason Delta/Iceberg vacuum
    * has a retention window). Snapshots referenced by the EXPIRED markers
    * being dropped are deleted regardless of age — that is the explicit
    * `keep` contract.
    */
  def vacuum(
      spark: SparkSession,
      root: String,
      keep: Int = 2,
      unreferencedGraceMs: Long = 30L * 60L * 1000L,
      emptyMarkerGraceMs: Long = EmptyMarkerGraceMs
  ): Unit = {
    require(keep >= 1, "must keep at least the newest committed version")
    val mDir = manifestDir(root)
    val fs = hfs(spark, mDir)
    if (!fs.exists(mDir)) return
    // resolve every marker ONCE: dead claims (empty / vanished) are not
    // commits — they are reclaimed past their grace window and never wedge
    // the sweep; their staged data (never referenced by any pointer) falls
    // under the unreferenced-grace rule below
    val resolved = markerVersions(fs, root).map { n =>
      val marker = new Path(mDir, s"$MarkerPrefix$n")
      (n, markerContent(fs, marker, retries = 1))
    }
    resolved.collect { case (n, None) => n }.foreach { n =>
      reclaimDeadMarker(fs, new Path(mDir, s"$MarkerPrefix$n"), emptyMarkerGraceMs)
    }
    val committed = resolved.collect { case (n, Some(name)) => (n, name) }.sortBy(_._1)
    if (committed.isEmpty) return
    val keepVs = committed.takeRight(keep).map(_._1).toSet
    val keepDirs = committed.filter(c => keepVs(c._1)).map(_._2).toSet
    val expired = committed.filterNot(c => keepVs(c._1))
    val expiredDirs = expired.map(_._2).toSet
    expired.foreach { case (n, _) =>
      fs.delete(new Path(mDir, s"$MarkerPrefix$n"), false)
    }
    val dDir = dataDir(root)
    if (fs.exists(dDir)) {
      val cutoff = System.currentTimeMillis() - unreferencedGraceMs
      fs.listStatus(dDir)
        .iterator
        .filterNot(st => keepDirs.contains(st.getPath.getName))
        .filter { st =>
          expiredDirs.contains(st.getPath.getName) || st.getModificationTime < cutoff
        }
        .foreach { st =>
          fs.delete(st.getPath, true)
          // evict the swept snapshot's memoized schema so the cache does not
          // accumulate one entry per vacuumed version forever
          ParquetIO.invalidate(st.getPath.toString)
        }
    }
  }
}
