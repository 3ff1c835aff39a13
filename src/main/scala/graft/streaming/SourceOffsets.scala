package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-agnostic offset + epoch contract — the replay story of the
  * engine's `foreachBatch` ingest loops (near-dup, cluster, router, crawl
  * frontier) factored into ONE documented protocol, shaped exactly like the
  * guarantee a message bus would provide. Structured Streaming gives this
  * to its built-in sources via the checkpoint's offset WAL + commit log;
  * this module gives the SAME two-phase discipline to any seekable source
  * the sandbox cannot host a broker for (a Kafka topic, a DB cursor, a
  * file-sequence, a remote queue):
  *
  *   1. An epoch is CLAIMED by logging `(epochId, startOffset, endOffset)`
  *      to `logDir/epoch-<id>` BEFORE any processing — an exclusive-create
  *      one-line file (the [[graft.operators.IndexCommit]] marker idiom),
  *      so the range is durable and unambiguous no matter where the run
  *      dies.
  *   2. The epoch's rows are `fetch(start, end)` — the ONLY thing a source
  *      must support is deterministic range reads, which is precisely
  *      Kafka's (partition, offset) contract — and land through
  *      [[StreamingOps.idempotentAppend]]'s `_batch=<epoch>`/`_SUCCESS`
  *      sink guard.
  *   3. Recovery needs no coordination: the next run reads the newest
  *      logged epoch; if its sink partition lacks `_SUCCESS` the epoch is
  *      REPLAYED from the LOGGED range (never from the source's current
  *      position — the source may have grown since), otherwise the run
  *      advances to fresh offsets. A crash at any point therefore yields
  *      exactly-once sink contents: before the log write the epoch never
  *      existed; between log and sink-commit the replay re-lands the same
  *      logged range idempotently; after sink-commit the replay is a no-op
  *      skip.
  *
  * At cluster scale the log is one tiny file per epoch next to the sink —
  * the same metadata-not-data footprint as Structured Streaming's own
  * checkpoint, and the reason swapping the simulated source for a real
  * broker changes `fetch` and NOTHING else.
  */
object SourceOffsets {

  /** One claimed epoch: rows with offset in [start, end) — Kafka's
    * half-open per-partition range convention.
    */
  case class Epoch(id: Long, start: Long, end: Long)

  private def epochPath(logDir: String, id: Long) = new Path(logDir, s"epoch-$id")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** A writer hard-killed between [[logEpoch]]'s exclusive create and its
    * content write leaves a zero-byte (or torn) `epoch-<id>` husk. Past this
    * grace window the husk is a corpse: the claim is reclaimed (deleted) so
    * the id becomes claimable again. Within the window it may be a LIVE
    * peer inside the create→write microseconds, so recovery defers — the
    * same discipline as [[graft.operators.IndexCommit.EmptyMarkerGraceMs]].
    */
  private[graft] val EmptyEpochGraceMs: Long = 60L * 1000L

  /** Parse an epoch file's "start,end" line, retrying briefly: empty or
    * torn content (the claimant died between create and write — the epoch
    * NEVER ran, [[logEpoch]] returns true only after the content write) and
    * a file that VANISHES mid-read (the claimant's failure path, or a
    * reclaim, retracted it) are both "not logged", never an error.
    * `retries` > 1 only for the newest file, where an in-flight writer
    * could still be inside the create→write window; older husks are
    * always corpses.
    */
  private def epochContent(
      f: org.apache.hadoop.fs.FileSystem,
      p: Path,
      retries: Int
  ): Option[(Long, Long)] = {
    var attempt = 0
    while (attempt < retries) {
      attempt += 1
      val line =
        try {
          val in = f.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch {
          case _: java.io.FileNotFoundException => return None
        }
      line.split(",", 2) match {
        case Array(s, e) =>
          (s.toLongOption, e.toLongOption) match {
            case (Some(sl), Some(el)) => return Some((sl, el))
            case _                    => () // torn write — retry then give up
          }
        case _ => ()
      }
      if (attempt < retries) Thread.sleep(20L)
    }
    None
  }

  /** Newest RESOLVABLE logged epoch, if any — the recovery read. Husk
    * files (empty / torn, see [[EmptyEpochGraceMs]]) are skipped after the
    * newest one's brief in-flight retry window, so a claimant that died
    * mid-create can never permanently wedge recovery with a MatchError —
    * recovery simply resumes from the previous fully-logged epoch.
    */
  def lastLogged(spark: SparkSession, logDir: String): Option[Epoch] = {
    val dir = new Path(logDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return None
    val ids = f
      .listStatus(dir)
      .iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch-") => n.stripPrefix("epoch-").toLong }
      .toSeq
      .sorted(Ordering[Long].reverse)
    ids.zipWithIndex.iterator
      .flatMap { case (id, i) =>
        epochContent(f, epochPath(logDir, id), retries = if (i == 0) 50 else 1)
          .map { case (s, e) => Epoch(id, s, e) }
      }
      .nextOption()
  }

  /** Claim an epoch: exclusive-create `epoch-<id>` holding "start,end".
    * False when the id is already claimed (a concurrent or replayed
    * driver) — the caller re-reads [[lastLogged]] and follows the winner.
    */
  def logEpoch(spark: SparkSession, logDir: String, e: Epoch): Boolean = {
    val dir = new Path(logDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val dst = epochPath(logDir, e.id)
    val out =
      try f.create(dst, false)
      catch { case _: java.io.IOException if f.exists(dst) => return false }
    try { out.write(s"${e.start},${e.end}".getBytes("UTF-8")); out.close(); true }
    catch {
      case t: Throwable =>
        try out.close() catch { case _: Throwable => () }
        f.delete(dst, false)
        throw t
    }
  }

  /** True iff `epoch`'s sink partition committed (`_SUCCESS` present). */
  def committed(spark: SparkSession, sinkPath: String, epoch: Long): Boolean = {
    val marker = new Path(new Path(sinkPath, s"_batch=$epoch"), "_SUCCESS")
    fs(spark, marker).exists(marker)
  }

  /** One recovery-aware scheduling step: replay the newest logged epoch if
    * its sink never committed (fetching the LOGGED range), else claim and
    * process [lastEnd, min(availableEnd, lastEnd + maxRowsPerEpoch)).
    * Returns the epoch that ran, or None when there was neither a pending
    * replay nor fresh data — or when ANOTHER DRIVER owns the step. Drive it
    * in a loop (or from a foreachBatch trigger) for continuous ingest.
    *
    * `maxRowsPerEpoch` is bounded admission, what every real bus gives a
    * trigger (Kafka's maxOffsetsPerTrigger): a burst after downtime — the
    * source grew by a week while the job was down — splits into capped
    * epochs across successive steps instead of becoming one giant epoch
    * whose replay-unit is the whole backlog. Replay semantics are
    * unchanged: each capped epoch logs its own exact range.
    *
    * `replayLeaseMs` guards the replay path against a LIVE peer: an
    * uncommitted logged epoch is only replayed once its log file is at
    * least this old, so a concurrent driver that just claimed it (and is
    * mid-processing) is not raced to the same `_batch=` partition —
    * interleaved overwrite commits under one _SUCCESS marker are the one
    * way to break the sink's exactly-once contract. The default 0 keeps
    * the single-driver semantics (every crash replay is immediate);
    * multi-driver deployments set it to a multiple of their epoch
    * processing time. Symmetrically, a driver that LOSES the claim race
    * returns None — it never re-executes the winner's in-flight epoch; the
    * next step finds the winner's outcome (committed → advance;
    * uncommitted past the lease → genuine crash replay).
    */
  def runEpoch(
      spark: SparkSession,
      logDir: String,
      sinkPath: String,
      availableEnd: Long,
      fetch: (Long, Long) => DataFrame,
      maxRowsPerEpoch: Long = Long.MaxValue,
      replayLeaseMs: Long = 0L
  ): Option[Epoch] = {
    require(maxRowsPerEpoch > 0, "maxRowsPerEpoch must be positive")
    val sink = StreamingOps.idempotentAppend(sinkPath)
    lastLogged(spark, logDir) match {
      case Some(last) if !committed(spark, sinkPath, last.id) =>
        val logAge = System.currentTimeMillis() -
          fs(spark, epochPath(logDir, last.id))
            .getFileStatus(epochPath(logDir, last.id))
            .getModificationTime
        if (logAge < replayLeaseMs) None // a live peer may own this epoch
        else {
          // crash between offset log and sink commit: replay the LOGGED range
          sink(fetch(last.start, last.end), last.id)
          Some(last)
        }
      case last =>
        val start = last.map(_.end).getOrElse(0L)
        if (availableEnd <= start) None
        else {
          // subtraction form: start + maxRowsPerEpoch overflows at the
          // Long.MaxValue (= uncapped) default
          val end =
            if (availableEnd - start > maxRowsPerEpoch) start + maxRowsPerEpoch
            else availableEnd
          val next = Epoch(last.map(_.id + 1).getOrElse(0L), start, end)
          def claim(): Boolean = logEpoch(spark, logDir, next)
          val claimed = claim() || {
            // the id may be blocked by a husk lastLogged skipped (a claimant
            // dead between create and content write — that epoch never ran).
            // Past the grace window reclaim it and retry the claim once;
            // within the window it may be a live peer mid-write: defer.
            val p = epochPath(logDir, next.id)
            val f = fs(spark, p)
            val deadHusk =
              try {
                val st = f.getFileStatus(p)
                epochContent(f, p, retries = 1).isEmpty &&
                st.getModificationTime < System.currentTimeMillis() - EmptyEpochGraceMs
              } catch { case _: java.io.FileNotFoundException => true }
            deadHusk && { f.delete(p, false); claim() }
          }
          if (!claimed) {
            // another driver claimed this id first: defer — NEVER re-execute
            // the winner's in-flight epoch (two writers overwriting the same
            // _batch= partition can interleave commits under one _SUCCESS)
            None
          } else {
            sink(fetch(next.start, next.end), next.id)
            Some(next)
          }
        }
    }
  }
}
