package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Atomic dual-write commits for the fragment warehouse — the journal that
  * closes the one documented crash window in the engine's mutation path:
  * every copy-on-write mutation (DELETE / UPDATE / MERGE) ends in a
  * SEQUENCE of directory swaps (master, then each affected fragment), and a
  * writer dying between them used to leave a half-applied mutation on disk
  * with nothing to finish it (a master missing rows a fragment still
  * carried, or the reverse).
  *
  * The protocol is the write-ahead-intent half of the [[IndexCommit]]
  * family, adapted to multi-directory renames (a single snapshot pointer
  * cannot arbitrate a partition-granular rewrite without either copying
  * unaffected fragment directories or breaking the Hive-layout pruning
  * tier):
  *
  *   1. The mutation stages EVERY new directory first (staging writes are
  *      the only data jobs; nothing under a live path is touched).
  *   2. It then publishes a JOURNAL — the full rename/delete plan — via
  *      write-to-temp + atomic rename, and claims it with an exclusive
  *      create (the same arbitration primitive as IndexCommit's markers).
  *      The published journal is the commit point: from here the mutation
  *      is GUARANTEED to complete, because the plan plus the staged
  *      directories are everything needed to finish it.
  *   3. The ops apply (idempotently: a swap whose staging dir is gone
  *      already happened), the journal and claim are deleted.
  *
  * A writer that dies anywhere after step 2 leaves the journal behind; the
  * NEXT engine operation on the warehouse — any read or mutation — rolls
  * the plan forward before proceeding, so engine readers see the mutation
  * either not-yet-published (old state: staging dirs only, swept as part of
  * the eventual roll-forward of nothing — they are named per-txn and
  * harmless) or fully applied (new state), never the mixed middle. A death
  * BEFORE step 2 loses nothing: no live directory was touched yet.
  *
  * Liveness vs a LIVE writer mid-apply: recovery only steals a claim older
  * than `spark.graft.txnGraceMs` (default 60 s — swaps are metadata renames,
  * over in milliseconds), exactly IndexCommit's dead-claim grace. Within
  * the grace window after a crash, readers still see the pre-roll-forward
  * mixed state; the contract is "rolled forward by the first engine
  * operation past the grace", which shrinks the exposure from
  * until-manual-repair to at-most-grace.
  *
  * ISOLATION between LIVE writers (not just crash atomicity): every
  * engine mutation captures the base [[signature]] of the directories its
  * staging reads derive from, and [[run]] re-verifies it under the
  * per-warehouse writer claim immediately before publishing the journal.
  * Two writers that both staged from the same base state serialize at the
  * claim: the first publishes, the second's signature check fails and the
  * statement is rejected whole ([[ConcurrentWriteException]], staging
  * swept, base untouched, retry-safe) — last-publish-wins lost updates
  * cannot happen.
  */
private[graft] object FragmentTxn {

  /** Thrown when a journaled mutation loses the optimistic concurrency
    * check: the dataset/master state changed between the statement's
    * staging reads and its commit (another writer published first), or a
    * live writer currently holds the mutation claim. The statement is
    * REJECTED whole — its staging directories are swept, no live directory
    * was touched — and is safe to retry from scratch against the new base.
    */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  /** The optimistic-concurrency expectation a mutation carries to its
    * commit: `paths` are the live directories the statement's staging
    * reads were derived from, `signature` their [[signature]] at read
    * time.
    */
  case class Expect(paths: Seq[String], signature: String)

  /** One journal step. `kind`:
    *   - `swap`: if `staged` exists — delete `target`, rename staged over it
    *     (absent staging = already applied, or "this fragment emptied" when
    *     paired with a prior delete of the target).
    *   - `delete`: remove `target` (an emptied fragment directory).
    *   - `rmstaging`: remove a staging ROOT after its children swapped out.
    *   - `ensure`: seed `target` with one zero-row schema-carrying fragment
    *     file when no `part=` directory survived (an emptied dataset must
    *     stay readable — schema inference fails on a bare directory).
    *   - `ensuremb`: same seed for the bucketed MASTER mirror (`mb=`
    *     directories).
    */
  case class Op(kind: String, target: String, staged: String = "")

  /** Test-only failpoint: when >= 0, [[apply]] throws after applying this
    * many ops — the crash-between-swaps scenario, injected deterministically.
    */
  @volatile private[graft] var crashAfterOps: Int = -1

  private[graft] final class InjectedCrash
      extends RuntimeException("FragmentTxn: injected crash (test failpoint)")

  val GraceConfKey = "spark.graft.txnGraceMs"
  private val DefaultGraceMs = 60000L

  private def txnDir(dataRoot: String) = new Path(dataRoot, "_txn")

  private def hfs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def graceMs(spark: SparkSession): Long =
    spark.conf.getOption(GraceConfKey).map(_.toLong).getOrElse(DefaultGraceMs)

  /** Stable signature of the CURRENT on-disk state of `paths`: an md5 over
    * the sorted (path, length, mtime) triples of every visible file under
    * each root (hidden `.`-staging and `_`-metadata entries excluded — a
    * concurrent writer's in-flight staging must not perturb the base
    * signature). Parquet part-file names carry per-write UUIDs, so ANY
    * committed rewrite of a directory changes the signature even when row
    * bytes and timestamps collide. Listing cost is the mutation surface's
    * own metadata scale: the same directories the statement is about to
    * stage-and-swap.
    */
  def signature(spark: SparkSession, paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    paths.sorted.foreach { root =>
      val p = new Path(root)
      val fs = hfs(spark, p)
      def walk(d: Path): Unit =
        fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith(".") && !n.startsWith("_")) {
            if (st.isDirectory) walk(st.getPath)
            else md.update(
              s"$n|${st.getLen}|${st.getModificationTime}\n"
                .getBytes(StandardCharsets.UTF_8))
          }
        }
      if (fs.exists(p)) { md.update(s"$root\n".getBytes(StandardCharsets.UTF_8)); walk(p) }
      else md.update(s"$root|absent\n".getBytes(StandardCharsets.UTF_8))
    }
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }

  /** Acquire the per-warehouse writer claim (exclusive create), stealing a
    * claim older than the dead-claim grace — IndexCommit's arbitration
    * primitive applied to mutations. Returns false when a LIVE writer
    * holds it.
    */
  private def acquireWriterClaim(fs: FileSystem, claim: Path, grace: Long): Boolean = {
    def tryCreate(): Boolean =
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (tryCreate()) true
    else {
      val stale =
        try fs.getFileStatus(claim).getModificationTime <= System.currentTimeMillis() - grace
        catch { case _: java.io.FileNotFoundException => true }
      if (stale) { fs.delete(claim, false); tryCreate() }
      else false
    }
  }

  /** Sweep a rejected statement's staging directories (its live targets
    * were never touched).
    */
  private def sweepStaging(fs: FileSystem, ops: Seq[Op]): Unit =
    ops.foreach { op =>
      if (op.staged.nonEmpty) fs.delete(new Path(op.staged), true)
      if (op.kind == "rmstaging") fs.delete(new Path(op.target), true)
    }

  /** Run one journaled mutation: publish the plan, apply it, clean up.
    * Must be called with every staging directory already written.
    *
    * With `expect` set, the commit is OPTIMISTICALLY CONCURRENT: under the
    * per-warehouse writer claim (exclusive create + dead-claim grace), the
    * expected base [[signature]] is re-verified immediately before the
    * journal publishes — a second live writer that staged from the same
    * base state as a first one is REJECTED with
    * [[ConcurrentWriteException]] (staging swept, base untouched) instead
    * of silently overwriting the first writer's committed mutation.
    * Without `expect` the call is the bare crash-atomicity protocol
    * (recovery roll-forward uses it — a recovered plan was already past
    * its commit point).
    */
  def run(
      spark: SparkSession,
      dataRoot: String,
      ops: Seq[Op],
      expect: Option[Expect] = None
  ): Unit = {
    val dir = txnDir(dataRoot)
    val fs = hfs(spark, dir)
    fs.mkdirs(dir)
    val writerClaim = new Path(dir, "writer.claim")
    val locked = expect.isDefined && {
      if (!acquireWriterClaim(fs, writerClaim, graceMs(spark))) {
        sweepStaging(fs, ops)
        throw new ConcurrentWriteException(
          "another writer holds the mutation claim on this warehouse; " +
            "statement rejected (staging swept) — retry after it commits")
      }
      true
    }
    try {
      expect.foreach { e =>
        val now = signature(spark, e.paths)
        if (now != e.signature) {
          sweepStaging(fs, ops)
          throw new ConcurrentWriteException(
            "concurrent write detected: the dataset changed between this " +
              "statement's staging reads and its commit; statement rejected " +
              "(staging swept, base intact) — retry against the new state")
        }
      }
      val id = java.util.UUID.randomUUID().toString
      val journal = new Path(dir, s"txn-$id.log")
      val claim = new Path(dir, s"txn-$id.claim")
      // claim BEFORE publishing: a concurrent recover must never start
      // applying a plan whose writer is alive and about to apply it itself
      fs.create(claim, false).close()
      val tmp = new Path(dir, s".txn-$id.log.tmp")
      val out = fs.create(tmp, true)
      try out.write(
        ops.map(o => s"${o.kind}\t${o.target}\t${o.staged}")
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // atomic publish: the journal appears complete or not at all
      fs.rename(tmp, journal)
      apply(spark, fs, ops)
      fs.delete(journal, false)
      fs.delete(claim, false)
    } finally if (locked) fs.delete(writerClaim, false)
  }

  /** Roll forward any published-but-unfinished mutation under `dataRoot`.
    * Cheap when idle (one existence probe); called by every engine read and
    * at the top of every mutation.
    */
  def recoverIfPending(spark: SparkSession, dataRoot: String): Unit = {
    val dir = txnDir(dataRoot)
    val fs = hfs(spark, dir)
    if (!fs.exists(dir)) return
    val grace = graceMs(spark)
    val cutoff = System.currentTimeMillis() - grace
    fs.listStatus(dir)
      .iterator
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("txn-") && n.endsWith(".log")
      }
      .foreach { st =>
        val journal = st.getPath
        val claim = new Path(dir, journal.getName.stripSuffix(".log") + ".claim")
        val claimSt =
          try Some(fs.getFileStatus(claim))
          catch { case _: java.io.FileNotFoundException => None }
        val stealable = claimSt.forall(_.getModificationTime <= cutoff)
        if (stealable) {
          // steal the dead claim, then re-claim exclusively: exactly one
          // recoverer applies the plan (the losing racer skips — the winner
          // will finish and delete the journal)
          claimSt.foreach(_ => fs.delete(claim, false))
          val owned =
            try { fs.create(claim, false).close(); true }
            catch { case _: java.io.IOException => false }
          if (owned) {
            // the journal may have been finished and deleted between the
            // listing and the claim — a vanished journal is a completed txn
            val lines =
              try {
                val in = fs.open(journal)
                try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
                finally in.close()
              } catch { case _: java.io.FileNotFoundException => Nil }
            val ops = lines.filter(_.nonEmpty).map { l =>
              val f = l.split("\t", -1)
              Op(f(0), f(1), if (f.length > 2) f(2) else "")
            }
            if (ops.nonEmpty) apply(spark, fs, ops)
            fs.delete(journal, false)
            fs.delete(claim, false)
          }
        }
      }
  }

  /** Apply the plan, idempotently — safe to re-run after a crash at any
    * point (each step keys off the staging directory's existence).
    */
  private def apply(spark: SparkSession, fs: FileSystem, ops: Seq[Op]): Unit = {
    var applied = 0
    ops.foreach { op =>
      if (crashAfterOps >= 0 && applied >= crashAfterOps) throw new InjectedCrash
      op.kind match {
        case "swap" =>
          val staged = new Path(op.staged)
          if (fs.exists(staged)) {
            fs.delete(new Path(op.target), true)
            fs.rename(staged, new Path(op.target))
          }
        case "delete" => fs.delete(new Path(op.target), true)
        case "rmstaging" => fs.delete(new Path(op.target), true)
        case "ensure" => ensureReadableDataset(spark, op.target, fs, "part")
        case "ensuremb" => ensureReadableDataset(spark, op.target, fs, "mb")
        case other => throw new IllegalStateException(s"unknown txn op: $other")
      }
      applied += 1
    }
  }

  /** A dataset whose every row was deleted has no partition directories
    * left, and a bare directory breaks the next read's schema inference —
    * so seed ONE zero-row fragment file carrying the schema: readers see
    * an empty, well-typed dataset (the reference's empty-but-selectable
    * table), and later inserts append normally. `partitionCol` is `part`
    * for fragment datasets and `mb` for the bucketed master mirror.
    */
  private def ensureReadableDataset(
      spark: SparkSession,
      dsPath: String,
      fs: FileSystem,
      partitionCol: String
  ): Unit = {
    val dir = new Path(dsPath)
    val hasPart = fs.exists(dir) && fs.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
    if (!hasPart)
      spark
        .createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](), FragmentEngine.masterSchema)
        .write.mode(SaveMode.Overwrite).parquet(new Path(dir, s"$partitionCol=0").toString)
  }
}
