package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.FragmentEngine

/** Structured Streaming surface of the engine.
  *
  * The reference has no streaming (SURVEY §1.5); these are the extension
  * operators a live training-data pipeline needs, built on the standard
  * primitives: watermark + tumbling-window aggregation, arbitrary stateful
  * processing via mapGroupsWithState, and a foreachBatch router that gives
  * the reference's round-robin *insert* semantics a streaming ingestion path.
  *
  * Scale notes: state is keyed (event_type / user bucket), so it shards
  * across executors; watermarks bound state size; foreachBatch appends are
  * partition-directory writes — the same layout batch inserts use, so batch
  * and streaming readers see one dataset.
  */
object StreamingOps {

  /** Tumbling 1-hour windowed counts with a watermark bounding late data and
    * state. Works on any DataFrame with (ts: timestamp, event_type, value) —
    * streaming or batch (identical results; asserted in StreamingSpec).
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"),
        col("cnt"),
        col("sum_value")
      )

  /** Watermarked native session windows: events within `gap` of each other
    * merge into one [first_ts, last_ts + gap) session per user. In streaming
    * append mode a session emits once the watermark passes its end — state
    * is keyed by user and bounded by the watermark. Batch runs of the same
    * function produce every session (batch ignores watermarks); the
    * streaming output is exactly the closed subset (parity asserted in
    * MultimodalStreamingSpec).
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events")
      )

  case class EventRow(ts: java.sql.Timestamp, event_type: String, value: Double)
  case class TypeRunning(event_type: String, cnt: Long, sum_value: Double)

  /** Arbitrary stateful op: running per-type totals via mapGroupsWithState
    * (the KeyValueGroupedDataset custom-state path). ProcessingTimeTimeout
    * keeps state forever here; a production pipeline would expire idle keys.
    */
  def runningTotals(events: Dataset[EventRow]): Dataset[TypeRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[TypeRunning, TypeRunning](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[TypeRunning]) =>
          val prev = state.getOption.getOrElse(TypeRunning(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { (acc, r) =>
            TypeRunning(key, acc.cnt + 1, acc.sum_value + r.value)
          }
          state.update(next)
          next
      }
  }

  /** Streaming exact dedup on a content key: duplicates arriving within the
    * watermark horizon are dropped (state holds one entry per key and is
    * evicted once the watermark passes — bounded, unlike a global
    * dropDuplicates whose state grows forever). The batch twin is
    * [[graft.operators.Dedup.exactDedup]]; on a batch frame Spark executes
    * this as a plain aggregate-style distinct.
    */
  def dedupWithinWatermark(
      docs: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "1 hour"
  ): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Deterministic BATCH twin of [[dedupWithinWatermark]]'s state contract:
    * per key, scan events in time order and KEEP one iff it is at least
    * `horizonMicros` past the last KEPT event — exactly the streaming state
    * lifecycle (a kept key's state expires `horizon` after its event time,
    * so the next arrival re-admits). The stream may keep or drop dups whose
    * gap exceeds the horizon (its guarantee is only within-horizon), so the
    * batch twin is the REPLAYABLE definition a backfill must use.
    *
    * Shape: one keyed partial agg to per-key sorted event-time lists
    * (bounded per-key state), then a codegen'd `aggregate` HOF fold per key
    * — no shuffle beyond the groupBy, parallel across keys at any scale.
    * Returns (keyCols..., n_events, n_kept).
    */
  def horizonDedupCounts(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      horizonMicros: Long = 3600L * 1000000L
  ): DataFrame =
    df.select(keyCols.map(col) :+ unix_micros(col(tsCol)).as("_us"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sort_array(collect_list(col("_us"))).as("_xs"),
        count(lit(1)).as("n_events")
      )
      .withColumn(
        "n_kept",
        expr(
          s"""aggregate(slice(_xs, 2, size(_xs) - 1),
             |  named_struct('last', element_at(_xs, 1), 'cnt', 1L),
             |  (acc, x) -> CASE WHEN x >= acc.last + ${horizonMicros}L
             |    THEN named_struct('last', x, 'cnt', acc.cnt + 1L)
             |    ELSE acc END).cnt""".stripMargin.replaceAll("\\s+", " ")
        )
      )
      .drop("_xs")

  /** Watermarked stream-stream inner join: for every `left` event, matching
    * `right` events of the same key within `[left.ts - lookback, left.ts]` —
    * the click→conversion attribution shape. Both sides carry watermarks and
    * the join condition brackets the right timestamp against the left one,
    * which is exactly what lets Spark bound BOTH state stores: a right row
    * can be evicted once the left watermark passes `ts + lookback`, a left
    * row once the right watermark passes its ts. Without the time bracket the
    * state would grow forever — the classic unbounded stream-join mistake.
    * Works identically on batch frames (parity asserted in
    * MultimodalStreamingSpec).
    */
  def timeBracketJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      lookback: String = "interval 1 hour",
      watermark: String = "2 hours"
  ): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(
      r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") - expr(lookback) &&
        col("r.ts") <= col("l.ts")
    )
  }

  /** Left-outer variant of [[timeBracketJoin]]: every left event emits, with
    * nulls when no right event fell in its bracket. The semantics Structured
    * Streaming gives this are deliberately surfaced here: a left row with no
    * match is held in state and emitted ONLY once the watermark passes the
    * point where a match has provably become impossible (`ts`, since the
    * bracket ends there) — so "unmatched" rows arrive late by up to the
    * watermark delay, but are never retracted. Both state stores stay
    * bounded exactly as in the inner variant. The attribution shape this
    * serves: conversions WITHOUT a preceding click are the interesting rows
    * (organic traffic), and an inner join silently drops them.
    */
  def timeBracketLeftJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      lookback: String = "interval 1 hour",
      watermark: String = "2 hours"
  ): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(
      r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") - expr(lookback) &&
        col("r.ts") <= col("l.ts"),
      "left_outer"
    )
  }

  /** Full-outer variant of [[timeBracketJoin]]: both the left rows with no
    * bracketed match AND the right rows that never fell into any left
    * bracket emit (with nulls on the other side). The audit shape: a
    * conversions⋈clicks attribution wants organic conversions (left-only)
    * and dead clicks (right-only) in the SAME result. Streaming-wise this
    * is the one outer join that needs watermarks on BOTH sides to emit
    * either null side (each is held until its match window is provably
    * closed); state stays bounded by the same bracket-eviction argument as
    * the inner variant.
    */
  def timeBracketFullJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      lookback: String = "interval 1 hour",
      watermark: String = "2 hours"
  ): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(
      r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") - expr(lookback) &&
        col("r.ts") <= col("l.ts"),
      "full_outer"
    )
  }

  /** Stream-static enrichment join: every micro-batch of the stream joins
    * the (small) static dimension, broadcast to executors — the standard
    * "attach dimension attributes on ingest" shape. No state store and no
    * watermark: nothing is buffered, because the static side is complete by
    * definition and is re-resolved per micro-batch (a dim TABLE updated
    * between batches is picked up). Left join keeps stream rows with no dim
    * match — enrichment must never drop facts.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")

  /** Exactly-once `foreachBatch` file sink: each micro-batch lands in its
    * own `_batch=<id>` partition directory, and a batch id that already has
    * a `_SUCCESS` marker is SKIPPED — so the epoch replay Structured
    * Streaming performs after a failure (foreachBatch is at-least-once by
    * itself) cannot duplicate rows. This is the standard idempotent-sink
    * idiom for file targets; transactional formats get it from their commit
    * log, raw directories get it from the batch-id partition.
    */
  def idempotentAppend(path: String): (DataFrame, Long) => Unit = { (batch, batchId) =>
    // Resolve through Hadoop's FileSystem so the _SUCCESS probe works for
    // hdfs:///s3a:// sinks too — a java.io.File check is always false off
    // the local filesystem, which would silently re-run every replayed
    // batch and re-open the duplicate-output window this sink closes.
    val dir = new org.apache.hadoop.fs.Path(path, s"_batch=$batchId")
    val fs = dir.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      batch.write
        .mode("overwrite") // partial output from a crashed attempt is replaced
        .parquet(dir.toString)
    }
  }

  /** Streaming near-dup ingest loop — the `foreachBatch` lifecycle of the
    * incremental dedup family: per micro-batch of documents, (1) fold the
    * batch's MinHash bands into the persisted index (FIRST, because the
    * dynamic-partition append is replay-idempotent — a crash between the
    * two writes replays into an index that already holds this batch's
    * bands, which changes nothing: the pair join deduplicates band hits),
    * then (2) write the batch's near-dup pairs against everything ingested
    * so far into the pairs sink's `_batch=<id>` partition, guarded by the
    * [[idempotentAppend]] `_SUCCESS` idiom so an epoch replay cannot
    * duplicate pair rows. Seed an index with `Dedup.buildMinhashIndex`
    * over the existing corpus (parquet schema inference needs at least one
    * band row on disk), then
    * `.writeStream.foreachBatch(nearDupIngestLoop(...))`: each arriving
    * batch pays one signing pass over ITSELF only — corpus text is never
    * re-read, the O(delta)-per-ingest contract, now as a running stream.
    */
  def nearDupIngestLoop(
      idCol: String,
      textCol: String,
      indexPath: String,
      pairsPath: String,
      numPerm: Int = 8,
      rowsPerBand: Int = 2,
      fast: Boolean = false
  ): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val dir = new org.apache.hadoop.fs.Path(pairsPath, s"_batch=$batchId")
    val fs = dir.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      // the un-materialized batch frame is consumed by two actions (band
      // append + pair join); pin it so both see the same rows
      val pinned = batch.localCheckpoint()
      graft.operators.Dedup
        .appendMinhashIndex(pinned, idCol, textCol, indexPath, ingestId = batchId + 1,
          numPerm, rowsPerBand, fast)
      graft.operators.Dedup
        .incrementalNearDupPairs(pinned, idCol, textCol, indexPath, numPerm, rowsPerBand, fast)
        .write
        .mode("overwrite")
        .parquet(dir.toString)
    }
  }

  /** Streaming CLUSTER-maintaining ingest loop — [[nearDupIngestLoop]]
    * upgraded from pairs to the maintained assignment: per micro-batch,
    * (1) fold the batch's bands into the persisted index (replay-idempotent
    * dynamic-partition append, first for the same crash-ordering reason),
    * (2) advance the cluster state through
    * [[graft.operators.Dedup.incrementalClusters]], and (3) emit the
    * batch's own assignment rows under a `_SUCCESS`-guarded `_batch=<id>`
    * partition.
    *
    * The state is VERSIONED (`statePath/v=<k>`) rather than overwritten in
    * place, because replay safety demands that a re-run epoch read the
    * SAME input state it read the first time: batch `b` always reads the
    * newest version ≤ `b` and (over)writes `v=b+1`, so a crash after the
    * state write but before the assignment commit replays into an
    * identical recomputation instead of contracting against a state that
    * already contains the batch's own ids (which would mislabel every
    * batch doc as isolated). Readers take the max version; prune old
    * versions on a schedule once their epochs are committed. Seed
    * `v=0` with `writeClusterState` over the initial corpus clusters and
    * the index with `buildMinhashIndex` before starting the stream.
    *
    * Replay no-op, crash-between-writes recovery, and ≡-monolithic final
    * state are pinned in PipelineOpsSpec; each epoch's body is the oracled
    * `dedup_incremental_clusters` construction.
    */
  def clusterIngestLoop(
      idCol: String,
      textCol: String,
      indexPath: String,
      statePath: String,
      assignPath: String,
      numPerm: Int = 8,
      rowsPerBand: Int = 2,
      fast: Boolean = false
  ): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val conf = batch.sparkSession.sessionState.newHadoopConf()
    val outDir = new org.apache.hadoop.fs.Path(assignPath, s"_batch=$batchId")
    val fs = outDir.getFileSystem(conf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(outDir, "_SUCCESS"))) {
      val pinned = batch.localCheckpoint()
      graft.operators.Dedup
        .appendMinhashIndex(pinned, idCol, textCol, indexPath, ingestId = batchId + 1,
          numPerm, rowsPerBand, fast)
      val stDir = new org.apache.hadoop.fs.Path(statePath)
      val stFs = stDir.getFileSystem(conf)
      val versions =
        if (stFs.exists(stDir))
          stFs.listStatus(stDir).map(_.getPath.getName)
            .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
        else Array.empty[Long]
      // some version ≤ this batch must exist: v=0 for a fresh stream, or a
      // later version once pruneClusterStateVersions retired the early ones
      // (legal — pruning runs after epochs commit, and committed epochs
      // replay through the _SUCCESS gate, never through a state read)
      require(
        versions.exists(_ <= batchId),
        s"no state version ≤ batch $batchId under $statePath — seed v=0 with " +
          "writeClusterState first, or pruning outran an uncommitted epoch"
      )
      val readV = versions.filter(_ <= batchId).max
      val newState = graft.operators.Dedup
        .incrementalClusters(pinned, idCol, textCol, indexPath, s"$statePath/v=$readV",
          numPerm, rowsPerBand, fast)
        .localCheckpoint() // materialize before any writes consume it twice
      graft.operators.Dedup
        .writeClusterState(newState, "id", "cluster_id", s"$statePath/v=${batchId + 1}")
      newState
        .join(broadcast(pinned.select(col(idCol).as("id"))), Seq("id"))
        .write
        .mode("overwrite")
        .parquet(outDir.toString) // _SUCCESS lands last: the epoch's commit mark
    }
  }

  /** Prune old cluster-state versions left by [[clusterIngestLoop]]: keep
    * the newest `keepLast` `v=<k>` directories, delete the rest. Only
    * versions strictly below every kept one are ever removed, so a replay
    * of any COMMITTED epoch (which reads a version ≤ its batch id and
    * whose `_SUCCESS` gate makes the read moot) is unaffected; run it on
    * the same schedule as index compaction, after epochs commit.
    */
  def pruneClusterStateVersions(
      spark: SparkSession,
      statePath: String,
      keepLast: Int = 2
  ): Unit = {
    require(keepLast >= 1, s"must keep at least the latest version, got $keepLast")
    val dir = new org.apache.hadoop.fs.Path(statePath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) {
      val versions = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("v="))
        .sortBy(_.getName.stripPrefix("v=").toLong)
      versions.dropRight(keepLast).foreach(p => fs.delete(p, true))
    }
  }

  /** Streaming round-robin ingestion: every micro-batch is appended to the
    * master dataset AND round-robin-routed to fragments, continuing the
    * engine's `lastInserted` counter exactly like sequential
    * roundRobinInsert calls (reference `Interface1.py:193-209`), but with
    * one distributed write per batch instead of one metadata round-trip per
    * row. Start with `.writeStream.foreachBatch(roundRobinRouter(engine, "ratings"))`.
    */
  def roundRobinRouter(
      engine: FragmentEngine,
      tableName: String
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    engine.roundRobinInsertBatch(tableName, batch)
  }

  case class ChangeEvent(
      user_id: Long,
      event_type: String,
      ts: java.sql.Timestamp,
      event_id: Long
  )
  case class Scd2State(attr: String, version: Long, validFromUs: Long)
  case class Scd2Update(
      user_id: Long,
      event_type: String,
      version: Long,
      valid_from_us: Long,
      valid_to_us: Option[Long],
      is_current: Boolean
  )

  /** Streaming SCD Type-2: the incremental twin of
    * [[graft.operators.Scd2.buildType2]]. Per-key state carries the OPEN
    * version (attr, version, valid_from); each micro-batch sorts its rows
    * into the (ts, event_id) total order and, on an attribute change, emits
    * the CLOSED predecessor row (valid_to set, is_current=false) followed
    * by the new open row — upsert-shaped output a sink merges by
    * (user_id, version), after which the table equals the batch builder's
    * output over the same prefix of the log.
    *
    * State is one struct per entity — bounded by the KEY population, never
    * the event volume — and shards across executors by the group key.
    * Assumes per-key event-time monotonicity ACROSS batches (the usual
    * CDC-replay discipline); within a batch, order is restored by the sort.
    */
  def scd2Updates(events: Dataset[ChangeEvent]): Dataset[Scd2Update] = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Update](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (key, rows, state: GroupState[Scd2State]) =>
        val ordered = rows.toSeq.sortBy(r => (micros(r.ts), r.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Update]
        var st = state.getOption
        ordered.foreach { r =>
          val us = micros(r.ts)
          st match {
            case None =>
              st = Some(Scd2State(r.event_type, 1L, us))
              out += Scd2Update(key, r.event_type, 1L, us, None, is_current = true)
            case Some(s) if s.attr != r.event_type =>
              out += Scd2Update(key, s.attr, s.version, s.validFromUs, Some(us), is_current = false)
              st = Some(Scd2State(r.event_type, s.version + 1, us))
              out += Scd2Update(key, r.event_type, s.version + 1, us, None, is_current = true)
            case _ => () // unchanged attribute collapses into the open version
          }
        }
        st.foreach(state.update)
        out.iterator
      }
  }

  /** Streaming CRAWL-FRONTIER loop — the web tier's streaming leg beside
    * [[nearDupIngestLoop]]/[[clusterIngestLoop]]: per micro-batch of
    * discovered raw URLs, (1) canonicalize through
    * [[graft.operators.Curation.normalizeUrl]], (2) anti-join the visited
    * set (= every PRIOR epoch's scheduled partition of this same
    * directory — one store serves as both schedule log and visited set),
    * (3) emit only never-seen fetch targets under a replay-idempotent
    * `ingest_id=<batch>` dynamic-partition overwrite.
    *
    * Replay safety uses the established "read state ≤ epoch" rule: the
    * visited read EXCLUDES the batch's own ingest_id, so a crashed epoch's
    * partial partition can't anti-join its own rows into an empty reschedule
    * — the replay recomputes the identical fresh set and overwrites the
    * same partition. Per-epoch semantics are the oracled `cur_url_dedup`
    * construction; state grows one row per distinct canonical URL ever
    * scheduled, the minimum any visited-set crawler carries.
    */
  def frontierIngestLoop(urlCol: String, frontierPath: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val norm = batch
        .select(graft.operators.Curation.normalizeUrl(col(urlCol)).as("url_norm"))
        .distinct()
        .localCheckpoint()
      val p = new org.apache.hadoop.fs.Path(frontierPath)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val fresh =
        if (fs.exists(p)) {
          val visited = spark.read
            .parquet(frontierPath)
            .filter(col("ingest_id") =!= batchId)
            .select("url_norm")
          norm.join(visited, Seq("url_norm"), "left_anti")
        } else norm
      fresh
        .withColumn("ingest_id", lit(batchId))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_id")
        .parquet(frontierPath)
  }

  /** Streaming MV maintenance loop (E414) — the `foreachBatch` lifecycle
    * that keeps a persisted materialized view fresh UNDER ingest, composing
    * the incremental-refresh family (E366 append fold-in / E399+E406 sidecar
    * paths) with an idempotent base-table append. Per micro-batch:
    *
    *   1. Land the batch in the base table under DETERMINISTIC per-batch
    *      file names (`batch<id>-<k>.parquet`, staged then renamed): an
    *      epoch replay rewrites exactly its own files instead of appending
    *      duplicates — the rename-over idiom, idempotent like the
    *      `_batch=` sinks but without imposing a partition column on the
    *      base schema.
    *   2. Re-load the MV catalog: the manifest diff sees only appended
    *      files → the rollup folds the delta in (O(delta), never the base).
    *   3. If the refresh DROPPED the MV instead (the replay-after-refresh
    *      crash window rewrites files the manifest already holds — honest
    *      survivor-modified churn), REBUILD and re-persist it: the
    *      maintenance contract is "the MV exists and is fresh after every
    *      epoch", with the incremental path as the fast case and the
    *      rebuild as the self-healing fallback.
    *
    * Seed with `MvRewrite.build` + `persist` over the initial base before
    * starting the stream, then `.writeStream.foreachBatch(mvMaintainLoop(
    * catalogDir, defn))`.
    */
  def mvMaintainLoop(
      catalogDir: String,
      defn: graft.plans.MvRewrite.MvDef
  ): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(defn.basePath)
    val fs = base.getFileSystem(conf)
    // stage the batch, then rename into the base under deterministic names
    val staging = new org.apache.hadoop.fs.Path(defn.basePath + s"_stage_b$batchId")
    batch.write.mode("overwrite").parquet(staging.toString)
    val dataFiles = fs
      .listStatus(staging)
      .map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .sortBy(_.getName)
    // a replay may legitimately produce FEWER files than the original
    // attempt (different shuffle partitioning / AQE between attempts), so
    // clearing only the indices being overwritten would leave the original
    // attempt's higher-k files serving duplicate rows. Delete the epoch's
    // ENTIRE previous file set first, then rename — and require each
    // rename to succeed, or the batch would silently drop rows.
    fs.listStatus(base)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith(s"batch$batchId-") && n.endsWith(".parquet")
      }
      .foreach { stale =>
        if (!fs.delete(stale, false))
          throw new java.io.IOException(
            s"mvMaintainLoop: failed to delete stale replay file $stale for batch $batchId")
      }
    dataFiles.zipWithIndex.foreach { case (src, k) =>
      val dst = new org.apache.hadoop.fs.Path(base, f"batch$batchId-$k%05d.parquet")
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"mvMaintainLoop: rename $src -> $dst failed for batch $batchId " +
            "(rows would be silently dropped from the base)")
    }
    fs.delete(staging, true)
    // a replayed epoch REPLACES its own base files in place — drop the
    // session's cached listing before anything re-reads the base
    spark.catalog.refreshByPath(defn.basePath)
    // incremental refresh; self-heal if the churn class forced a drop
    val loaded = graft.plans.MvRewrite.loadCatalog(spark, catalogDir)
    if (!loaded.exists(_.mvPath == defn.mvPath)) {
      graft.plans.MvRewrite.build(spark, defn)
      graft.plans.MvRewrite.persist(spark, catalogDir, defn)
      graft.plans.MvRewrite.register(spark, defn)
    }
  }
}
