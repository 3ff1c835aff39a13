package graft.plans

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Aggregate materialized-view rewrite — the warehouse capability that turns
  * "we precomputed the rollup" into queries that never touch the fact table:
  * an `Aggregate` whose grouping columns are a SUBSET of a registered MV's
  * grouping columns and whose aggregates are all MV-derivable is rewritten
  * to RE-aggregate the MV — sums of sums, sums of counts, mins of mins and
  * maxes of maxes are exact, and AVG re-derives as total-sum ÷ total-count —
  * so a (returnflag, linestatus) rollup answers any returnflag-only query
  * from |groups| rows instead of the corpus. At 100 TB this is the
  * difference between a broadcast-sized scan and a fact-table scan per
  * dashboard tile.
  *
  * Scope (strict by design — a wrong rewrite is silent data corruption):
  *
  *   - Grouping exprs must be bare base columns, each materialized as an MV
  *     grouping column.
  *   - Every aggregate must be an undistinct, unfiltered SUM / MIN / MAX of
  *     a materialized measure, COUNT(*)/COUNT(1) with a materialized count,
  *     COUNT(col) with a materialized per-group non-null count of THAT
  *     column (count(*) would overcount null measures, so it never
  *     substitutes), or AVG of a measure with BOTH a sum and a NON-NULL
  *     count of that same measure materialized (AVG ignores NULLs, so the
  *     re-count denominator must be COUNT(col), never COUNT(*); restricted
  *     to DOUBLE-typed results — decimal AVG has engine-specific scale
  *     promotion that a derived division would have to replicate
  *     bit-for-bit, so it blocks permanently).
  *   - The aggregate must sit on the base relation modulo column-pruning
  *     Projects and Filters whose references are all MV GROUPING columns
  *     (such predicates commute with the rollup: filtering base rows by
  *     group key ≡ filtering MV rows by the same key, so they are pushed
  *     into the MV scan). A filter touching any non-grouping column
  *     disables the rewrite — residual predicates over aggregated-away
  *     rows cannot be answered from the rollup.
  *   - The base-table match is FULLY-QUALIFIED-URI equality (both sides
  *     resolved against the session Hadoop conf), never a suffix
  *     heuristic: `/backup/tmp/x/base.parquet` must not be served from the
  *     MV registered for `/tmp/x/base.parquet`.
  *   - When several registered MVs cover the same base, the rewrite
  *     deterministically prefers the SMALLEST one that can answer the query
  *     (fewest grouping columns, ties broken on mvPath) — plan choice never
  *     depends on registry iteration order.
  *
  * FRESHNESS is the caller's contract, exactly as in every rename-arbitrated
  * warehouse: register the MV after building it, re-register (or
  * [[MvRewrite.clear]]) after base-table churn. For cross-session use,
  * [[MvRewrite.persist]] records the definition plus a base-table signature
  * under a catalog directory, and [[MvRewrite.loadCatalog]] (invoked
  * automatically by [[graft.GraftExtensions]] when
  * `spark.graft.mvCatalog` is set) re-registers only the definitions whose
  * base signature still matches — a stale MV is silently DROPPED rather
  * than served.
  *
  * Output fidelity: the rewritten plan reuses the original output exprIds
  * (aliases pinned to them) and casts re-aggregated values back to the
  * original aggregate's data type where widening would otherwise change it —
  * downstream operators see byte-identical schema. A global (no GROUP BY)
  * COUNT(*) re-aggregated from a zero-row MV coalesces to 0, matching the
  * original aggregate's empty-input contract.
  */
object MvRewrite {

  /** One registered rollup: `mvPath` holds `SELECT groupCols, sum(base) AS
    * sumCol…, min(base) AS minCol…, max(base) AS maxCol…, count(base) AS
    * countColOf…, count(*) AS countCol FROM basePath GROUP BY groupCols`.
    *
    * @param sums mv measure column -> base column it sums
    * @param mins mv measure column -> base column it mins
    * @param maxs mv measure column -> base column it maxes
    * @param counts mv measure column -> base column whose NON-NULL count it
    *               holds (COUNT(col) semantics; countCol is COUNT(*))
    */
  case class MvDef(
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, String],
      countCol: Option[String],
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty
  )

  private[plans] case class Registered(defn: MvDef, qualifiedBase: String, plan: LogicalPlan)
  private val registry = TrieMap.empty[String, Registered]

  /** Fully-qualified URI form of a path string under the session's Hadoop
    * conf — the only comparison key the rewrite trusts (suffix matching
    * silently served the wrong table).
    */
  private def qualified(spark: SparkSession, p: String): String = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    path.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
  }

  /** Build the MV parquet from the base table — the one corpus-sized
    * aggregation this rule amortizes away for every later query.
    */
  private def buildAggs(defn: MvDef): Seq[org.apache.spark.sql.Column] =
    defn.sums.toSeq.sortBy(_._1).map { case (mvCol, baseCol) =>
      sum(col(baseCol)).as(mvCol)
    } ++ defn.mins.toSeq.sortBy(_._1).map { case (mvCol, baseCol) =>
      min(col(baseCol)).as(mvCol)
    } ++ defn.maxs.toSeq.sortBy(_._1).map { case (mvCol, baseCol) =>
      max(col(baseCol)).as(mvCol)
    } ++ defn.counts.toSeq.sortBy(_._1).map { case (mvCol, baseCol) =>
      count(col(baseCol)).cast("long").as(mvCol)
    } ++ defn.countCol.map(c => count(lit(1)).cast("long").as(c)).toSeq

  /** Per-file partial-aggregate sidecar location for an MV — what makes
    * DELETE-only base churn (retention expiry) incrementally refreshable:
    * sums/counts re-add and, unlike signed retraction, per-file MIN/MAX
    * partials re-aggregate EXACTLY over the surviving files, so every MV
    * measure survives deletes without touching the fact table. Sized
    * |files|×|groups| — the same order as a FileIndex snapshot, not the
    * corpus.
    */
  private[plans] def sidecarPath(mvPath: String): String = mvPath + "_files"

  /** Sidecar file-identity column (the raw `input_file_name()` URI). */
  private val FileCol = "_file"

  def build(spark: SparkSession, defn: MvDef): Unit = {
    val base = spark.read.parquet(defn.basePath)
    val aggs = buildAggs(defn)
    base
      .groupBy(defn.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write
      .mode("overwrite")
      .parquet(defn.mvPath)
    // second pass for the per-file partials — at warehouse scale production
    // folds both rollups into one scan (grouping sets); two scans at the
    // one-time build keep the MV bytes byte-identical to the direct build
    // while buying O(files×groups) delete-churn refresh forever after
    base
      .groupBy((input_file_name().as(FileCol) +: defn.groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write
      .mode("overwrite")
      .parquet(sidecarPath(defn.mvPath))
  }

  /** Build the per-file partial-aggregate sidecar for an EXISTING MV — the
    * one-time backfill that retrofits delete-churn refresh (E399) onto MVs
    * persisted before the sidecar existed (or built with sidecar writing
    * unavailable). One scan of the base grouped by `input_file_name()`,
    * O(files×groups) output.
    *
    * Freshness contract (the caller's, like [[register]]): run this while
    * the MV is FRESH relative to the base — the sidecar must describe
    * exactly the files whose rows the MV aggregates, so backfilling against
    * a base that already churned would record partials the MV never saw.
    * The natural call sites (right after [[loadCatalog]] re-registered the
    * MV as fresh, or right after [[build]]) both satisfy it.
    */
  def backfillSidecar(spark: SparkSession, defn: MvDef): Unit = {
    val aggs = buildAggs(defn)
    spark.read
      .parquet(defn.basePath)
      .groupBy((input_file_name().as(FileCol) +: defn.groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write
      .mode("overwrite")
      .parquet(sidecarPath(defn.mvPath))
  }

  /** Register (or refresh) an MV: resolves the MV parquet ONCE and keeps its
    * analyzed plan; the optimizer rule grafts fresh copies of it into
    * matching queries. Freshness is the caller's contract.
    */
  def register(spark: SparkSession, defn: MvDef): Unit = {
    // the MV parquet is overwritten in place by every refresh/rebuild;
    // readers (and this very re-analysis) must not serve the session's
    // cached FileStatus listing of the replaced files
    spark.catalog.refreshByPath(defn.mvPath)
    val plan = spark.read.parquet(defn.mvPath).queryExecution.analyzed
    registry.put(defn.mvPath, Registered(defn, qualified(spark, defn.basePath), plan))
  }

  def clear(): Unit = registry.clear()

  private[plans] def registered: Seq[Registered] = registry.values.toSeq

  // ---------------------------------------------------------------- catalog

  /** JSON-file record for one persisted MV definition: the definition plus
    * the base table's content signature at persist time. Flat types only —
    * jackson-scala round-trips it without bespoke (de)serializers.
    */
  private case class MvRecord(
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, String],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      baseSignature: String,
      counts: Map[String, String] = Map.empty,
      baseManifest: Map[String, String] = Map.empty
  )

  private lazy val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Content signature of a base table directory: file count, total bytes,
    * newest mtime. Any append / overwrite / compaction perturbs at least one
    * component, which is exactly the staleness the loader must catch. A
    * listing-level probe (metadata-sized, like every FileIndex refresh) —
    * never reads data.
    */
  private[plans] def baseSignature(spark: SparkSession, basePath: String): String = {
    val path = new Path(basePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return "absent"
    var count = 0L
    var bytes = 0L
    var maxM = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      if (!st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_")) {
        count += 1
        bytes += st.getLen
        maxM = math.max(maxM, st.getModificationTime)
      }
    }
    s"$count:$bytes:$maxM"
  }

  /** Per-file manifest of a base table directory: data-file path →
    * "length:mtime". The listing-level evidence that lets [[loadCatalog]]
    * distinguish an APPEND (every manifest file still present, byte- and
    * mtime-identical, plus new files) from arbitrary churn — append-only
    * changes refresh the MV from the appended files alone; anything else
    * drops it. One record per data file: at warehouse scale this is the
    * same metadata volume a FileIndex snapshot already holds.
    */
  private[plans] def baseManifest(spark: SparkSession, basePath: String): Map[String, String] = {
    val path = new Path(basePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Map.empty
    val b = Map.newBuilder[String, String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      if (!st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
        b += (st.getPath.toString -> s"${st.getLen}:${st.getModificationTime}")
    }
    b.result()
  }

  /** The signature [[baseSignature]] would produce on exactly the listing
    * snapshot `manifest` was built from — count:bytes:maxMtime derived from
    * the manifest entries, never a second listing. Deriving instead of
    * re-listing is what makes a persisted (signature, manifest) pair
    * internally consistent under concurrent appenders: a file landing
    * between two listings can never be recorded as covered while its rows
    * are absent.
    */
  private[plans] def signatureOf(manifest: Map[String, String]): String = {
    var bytes = 0L
    var maxM = 0L
    manifest.values.foreach { v =>
      val i = v.indexOf(':')
      bytes += v.substring(0, i).toLong
      maxM = math.max(maxM, v.substring(i + 1).toLong)
    }
    s"${manifest.size}:$bytes:$maxM"
  }

  /** Persist `defn` (plus the CURRENT base-table signature) as a JSON file
    * under `catalogDir`, so a later session can [[loadCatalog]] it. One file
    * per MV, keyed on the MV path digest — re-persisting the same MV
    * overwrites its record. The signature is DERIVED from the single
    * manifest listing (see [[signatureOf]]); an absent base keeps
    * [[baseSignature]]'s "absent" sentinel.
    */
  def persist(spark: SparkSession, catalogDir: String, defn: MvDef): Unit = {
    val manifest = baseManifest(spark, defn.basePath)
    val sig =
      if (manifest.isEmpty) baseSignature(spark, defn.basePath)
      else signatureOf(manifest)
    persistSnapshot(spark, catalogDir, defn, sig, manifest)
  }

  /** [[persist]] with an EXPLICIT (signature, manifest) snapshot — the
    * refresh paths pass the very listing their refresh decision was made
    * from, closing the refresh→persist TOCTOU window: re-listing inside
    * persist would record files that landed after the refresh as covered
    * while their rows are absent from the MV (a permanently-stale rollup
    * served as fresh).
    */
  private def persistSnapshot(
      spark: SparkSession,
      catalogDir: String,
      defn: MvDef,
      signature: String,
      manifest: Map[String, String]
  ): Unit = {
    val rec = MvRecord(
      defn.basePath,
      defn.mvPath,
      defn.groupCols,
      defn.sums,
      defn.countCol,
      defn.mins,
      defn.maxs,
      signature,
      defn.counts,
      manifest
    )
    val dir = new Path(catalogDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(defn.mvPath.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    val out = fs.create(new Path(dir, s"mv-$key.json"), true)
    try out.write(mapper.writeValueAsBytes(rec))
    finally out.close()
  }

  /** Load every persisted definition under `catalogDir` and register the
    * FRESH ones. A record whose base-table signature no longer matches the
    * live base is first checked for APPEND-ONLY churn against its per-file
    * manifest: when every persisted data file is still present with
    * identical length and mtime and the only difference is NEW files, the
    * MV is REFRESHED incrementally — the delta rollup aggregates the
    * appended files alone (O(delta), never the fact table) and merges into
    * the old MV by the partial-aggregate algebra (sums/counts add, mins
    * min, maxs max — the [[graft.operators.IncrementalAgg]] state-merge
    * generalized to the MV's column map; append-only means no retraction,
    * so MIN/MAX stay exact). Any other churn (file removed, rewritten,
    * truncated) or a missing MV parquet drops the record — serving a stale
    * rollup is wrong answers, serving none is just the un-rewritten plan.
    * Returns the definitions actually registered (fresh or refreshed).
    */
  def loadCatalog(spark: SparkSession, catalogDir: String): Seq[MvDef] = {
    val dir = new Path(catalogDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir)
      .iterator
      .filter(st => st.getPath.getName.startsWith("mv-") && st.getPath.getName.endsWith(".json"))
      .flatMap { st =>
        val in: java.io.InputStream = fs.open(st.getPath)
        val rec =
          try mapper.readValue(in, classOf[MvRecord])
          finally in.close()
        val defn = MvDef(
          rec.basePath, rec.mvPath, rec.groupCols, rec.sums, rec.countCol, rec.mins,
          rec.maxs, Option(rec.counts).getOrElse(Map.empty))
        val mvExists = fs.exists(new Path(rec.mvPath))
        // ONE listing snapshot decides freshness, the churn class AND what
        // gets persisted after a refresh — deriving the signature from it
        // (signatureOf) instead of listing again closes both TOCTOU windows
        // (decide-vs-refresh and refresh-vs-persist)
        lazy val now = baseManifest(spark, rec.basePath)
        lazy val nowSig =
          if (now.isEmpty) baseSignature(spark, rec.basePath) else signatureOf(now)
        if (!mvExists) None
        else if (nowSig == rec.baseSignature) {
          register(spark, defn)
          Some(defn)
        } else {
          val old = Option(rec.baseManifest).getOrElse(Map.empty)
          val appendOnly = old.nonEmpty &&
            old.forall { case (p, sig) => now.get(p).contains(sig) } &&
            now.size > old.size
          // retention expiry: files removed, every survivor byte+mtime
          // identical — refreshable from the per-file sidecar partials
          val deleteOnly = old.nonEmpty && now.nonEmpty &&
            now.forall { case (p, sig) => old.get(p).contains(sig) } &&
            now.size < old.size
          // the real retention+ingest epoch: files removed AND added in one
          // churn, every file present in BOTH listings byte+mtime identical.
          // The two incremental paths COMPOSE: prune the sidecar to the
          // surviving files and rebuild the rollup from their partials
          // (the delete half), then fold the appended files' delta in and
          // append their partials to the sidecar (the append half). A
          // survivor that was REWRITTEN (same path, different length/mtime)
          // fails the common-files check and keeps the DROP semantics —
          // its old rows are unretractable from partial states.
          val mixedChurn = old.nonEmpty && !appendOnly && !deleteOnly && {
            val common = old.keySet & now.keySet
            common.nonEmpty &&
            common.forall(p => old(p) == now(p)) &&
            (old.keySet -- now.keySet).nonEmpty &&
            (now.keySet -- old.keySet).nonEmpty
          }
          // the engine's OWN compaction: files replaced wholesale but rows
          // provably identical — the directory's compaction manifest names
          // exactly the removed/produced files and its content stat
          // re-verifies over the produced files. The ROLLUP is unchanged
          // by construction; only the per-file sidecar needs remapping.
          // (Covers the full-directory rewrite mixedChurn cannot: common
          // may be EMPTY here.)
          val compactionEpoch = old.nonEmpty && now.nonEmpty &&
            !appendOnly && !deleteOnly && !mixedChurn && {
              val common = old.keySet & now.keySet
              common.forall(p => old(p) == now(p)) &&
              scala.util.Try(compactionProof(
                spark, rec.basePath,
                removedNames = (old.keySet -- now.keySet).map(fileName),
                addedPaths = (now.keySet -- old.keySet).toSeq.sorted
              )).getOrElse(false)
            }
          if (!appendOnly && !deleteOnly && !mixedChurn && !compactionEpoch) None
          else
            try {
              val appended = (now.keySet -- old.keySet).toSeq.sorted
              val refreshed =
                if (appendOnly) {
                  refreshAppended(spark, defn, appended)
                  true
                } else if (deleteOnly) refreshDeleted(spark, defn, now.keySet)
                else if (compactionEpoch)
                  // rollup provably identical: remap the sidecar only
                  remapSidecarCompaction(
                    spark, defn, old.keySet & now.keySet, appended)
                else {
                  // mixed: delete half first (sidecar rows for appended
                  // files don't exist yet, so pruning to `now` keeps
                  // exactly the surviving old partials), then append half
                  val pruned = refreshDeleted(spark, defn, now.keySet)
                  if (pruned) refreshAppended(spark, defn, appended)
                  pruned
                }
              if (!refreshed) None
              else {
                persistSnapshot(spark, catalogDir, defn, nowSig, now)
                register(spark, defn)
                Some(defn)
              }
            } catch {
              // a refresh that cannot run (e.g. a Hive-partitioned base whose
              // bare-file delta read loses the partition columns) degrades to
              // the DROP semantics — serving none is just the un-rewritten
              // plan; a wedged loadCatalog would take every OTHER MV with it
              case scala.util.control.NonFatal(_) => None
            }
        }
      }
      .toSeq
  }

  /** Merge the rollup of `appendedFiles` into the existing MV parquet —
    * union of partial-aggregate states re-aggregated, each column cast back
    * to its persisted MV type so the refreshed MV is schema-identical.
    * The merged frame is eagerly materialized (localCheckpoint) before the
    * overwrite: it lazily READS the MV path it is about to replace, and the
    * MV is |groups|-sized by design, so materializing it is cheap at any
    * base scale.
    */
  /** Partial-state merge aggregates (sums/counts add, mins min, maxs max),
    * each cast back to its persisted MV type so a refreshed MV is
    * schema-identical to the direct build.
    */
  private def mergeAggs(
      defn: MvDef,
      mvTypes: Map[String, org.apache.spark.sql.types.DataType]
  ): Seq[org.apache.spark.sql.Column] =
    defn.sums.keys.toSeq.sorted.map(c => sum(col(c)).cast(mvTypes(c)).as(c)) ++
      defn.mins.keys.toSeq.sorted.map(c => min(col(c)).cast(mvTypes(c)).as(c)) ++
      defn.maxs.keys.toSeq.sorted.map(c => max(col(c)).cast(mvTypes(c)).as(c)) ++
      defn.counts.keys.toSeq.sorted.map(c => sum(col(c)).cast("long").as(c)) ++
      defn.countCol.map(c => sum(col(c)).cast("long").as(c)).toSeq

  private def refreshAppended(
      spark: SparkSession,
      defn: MvDef,
      appendedFiles: Seq[String]
  ): Unit = {
    val oldMv = spark.read.parquet(defn.mvPath)
    val aggs = buildAggs(defn)
    val delta = spark.read
      .parquet(appendedFiles: _*)
      .groupBy(defn.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val mvTypes = oldMv.schema.fields.map(f => f.name -> f.dataType).toMap
    val mvCols = oldMv.columns.toIndexedSeq.map(col)
    val merged = oldMv
      .unionByName(delta.select(mvCols: _*))
      .groupBy(defn.groupCols.map(col): _*)
      .agg(mergeAggs(defn, mvTypes).head, mergeAggs(defn, mvTypes).tail: _*)
      .select(mvCols: _*)
      .localCheckpoint()
    merged.write.mode("overwrite").parquet(defn.mvPath)
    // keep the per-file sidecar in step (when this MV has one): the
    // appended files' partials APPEND — old sidecar rows are untouched, so
    // a later delete-only churn still refreshes incrementally
    val scPath = new Path(sidecarPath(defn.mvPath))
    val fs = scPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(scPath)) {
      val sidecar = spark.read.parquet(sidecarPath(defn.mvPath))
      val scTypes = sidecar.schema.fields.map(f => f.name -> f.dataType).toMap
      spark.read
        .parquet(appendedFiles: _*)
        .groupBy((input_file_name().as(FileCol) +: defn.groupCols.map(col)): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(sidecar.columns.toIndexedSeq.map(c => col(c).cast(scTypes(c)).as(c)): _*)
        .write
        .mode("append")
        .parquet(sidecarPath(defn.mvPath))
    }
  }

  private def fileName(p: String): String = new Path(p).getName

  /** True iff the base directory's compaction manifest explains EXACTLY
    * this listing diff — replaced names == the removed set, produced names
    * == the added set — AND the produced files' recomputed content stat
    * (rows + exact hash sum) matches what the compaction recorded. The
    * re-verification costs one scan of the compacted slice, the same order
    * as the sidecar remap that follows it.
    */
  private def compactionProof(
      spark: SparkSession,
      basePath: String,
      removedNames: Set[String],
      addedPaths: Seq[String]
  ): Boolean =
    graft.operators.Compaction.readManifest(spark, basePath).exists { m =>
      removedNames.nonEmpty && addedPaths.nonEmpty &&
      m.replaced.toSet == removedNames &&
      m.produced.toSet == addedPaths.map(fileName).toSet && {
        val (rows, hash) = graft.operators.Compaction.contentStat(spark, addedPaths)
        rows == m.rows && hash == m.contentHash
      }
    }

  /** Remap the per-file sidecar across a PROVEN compaction epoch: keep the
    * surviving files' partials, recompute partials over the produced files
    * (one scan of the compacted slice — never the whole base), and leave
    * the MV rollup untouched: the manifest proves it aggregates exactly
    * the same rows, so the refreshed MV is byte-identical to what a direct
    * rebuild would produce. Returns false when this MV predates the
    * sidecar (those keep the DROP semantics).
    */
  private def remapSidecarCompaction(
      spark: SparkSession,
      defn: MvDef,
      survivingFiles: Set[String],
      producedPaths: Seq[String]
  ): Boolean = {
    val scPath = new Path(sidecarPath(defn.mvPath))
    val fs = scPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(scPath)) return false
    val sidecar = spark.read.parquet(sidecarPath(defn.mvPath))
    val scTypes = sidecar.schema.fields.map(f => f.name -> f.dataType).toMap
    val survivors = survivingFiles.map(k => new Path(k).toString)
    val keep = sidecar
      .select(col(FileCol))
      .distinct()
      .collect()
      .map(_.getString(0))
      .filter(raw => survivors.contains(new Path(raw).toString))
      .toIndexedSeq
    import spark.implicits._
    val kept = sidecar.join(broadcast(keep.toDF(FileCol)), FileCol)
    val aggs = buildAggs(defn)
    val fresh = spark.read
      .parquet(producedPaths: _*)
      .groupBy((input_file_name().as(FileCol) +: defn.groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(sidecar.columns.toIndexedSeq.map(c => col(c).cast(scTypes(c)).as(c)): _*)
    val remapped = kept.unionByName(fresh).localCheckpoint()
    remapped.write.mode("overwrite").parquet(sidecarPath(defn.mvPath))
    true
  }

  /** Rebuild the MV from the sidecar partials of the SURVIVING base files —
    * the delete-only-churn refresh. O(files×groups), never the fact table;
    * exact for every measure (MIN/MAX re-aggregate from per-file extrema —
    * no retraction needed). Returns false when this MV predates the sidecar
    * (built before the feature): those keep the DROP semantics.
    */
  private def refreshDeleted(
      spark: SparkSession,
      defn: MvDef,
      survivingFiles: Set[String]
  ): Boolean = {
    val scPath = new Path(sidecarPath(defn.mvPath))
    val fs = scPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(scPath)) return false
    val sidecar = spark.read.parquet(sidecarPath(defn.mvPath))
    // input_file_name() URIs and listing URIs normalize differently
    // (file:///x vs file:/x) — map BOTH through Path driver-side. The
    // distinct file list is metadata-sized (what a FileIndex already holds).
    val survivors = survivingFiles.map(k => new Path(k).toString)
    val keep = sidecar
      .select(col(FileCol))
      .distinct()
      .collect()
      .map(_.getString(0))
      .filter(raw => survivors.contains(new Path(raw).toString))
      .toIndexedSeq
    import spark.implicits._
    val keepDf = keep.toDF(FileCol)
    val kept = sidecar.join(broadcast(keepDf), FileCol).localCheckpoint()
    val oldMv = spark.read.parquet(defn.mvPath)
    val mvTypes = oldMv.schema.fields.map(f => f.name -> f.dataType).toMap
    val mvCols = oldMv.columns.toIndexedSeq.map(col)
    val refreshed = kept
      .groupBy(defn.groupCols.map(col): _*)
      .agg(mergeAggs(defn, mvTypes).head, mergeAggs(defn, mvTypes).tail: _*)
      .select(mvCols: _*)
      .localCheckpoint()
    refreshed.write.mode("overwrite").parquet(defn.mvPath)
    // prune the sidecar to survivors too (kept is already materialized, so
    // overwriting the path it was read from is safe)
    kept.write.mode("overwrite").parquet(sidecarPath(defn.mvPath))
    true
  }

  /** Session conf key naming an MV catalog directory to auto-load at
    * optimizer-injection time (see [[graft.GraftExtensions]]).
    */
  val CatalogConfKey = "spark.graft.mvCatalog"

  /** Auto-load hook for [[graft.GraftExtensions]]: a no-op unless the
    * session sets [[CatalogConfKey]].
    */
  def loadCatalogIfConfigured(spark: SparkSession): Unit =
    spark.conf.getOption(CatalogConfKey).foreach(dir => loadCatalog(spark, dir))

  // ---------------------------------------------------------------- rewrite

  /** Scan paths plus the Filter predicates collected between the aggregate
    * and the file relation, looking through bare-attribute Projects (column
    * pruning); None for any other operator.
    */
  private def stripToScan(
      plan: LogicalPlan,
      conds: Seq[Expression]
  ): Option[(Seq[String], Seq[Expression])] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child, conds)
    case Filter(cond, child) =>
      stripToScan(child, conds :+ cond)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some((fs.location.rootPaths.map(_.toString), conds))
    case _ => None
  }

  /** The rewrite, or None when any strictness condition fails. Candidate
    * MVs are tried smallest-first (fewest grouping columns, then mvPath) so
    * plan choice is deterministic and the cheapest rollup that can answer
    * wins.
    */
  private[plans] def rewrite(spark: SparkSession, agg: Aggregate): Option[LogicalPlan] = {
    val (scanPaths, filterConds) = stripToScan(agg.child, Nil).getOrElse(return None)
    if (scanPaths.isEmpty) return None
    val qualifiedScan = scanPaths.map(p => qualified(spark, p))
    val candidates = registry.values.toSeq
      .filter(r => qualifiedScan.forall(_ == r.qualifiedBase))
      .sortBy(r => (r.defn.groupCols.size, r.defn.mvPath))
    candidates.view.flatMap(r => rewriteWith(agg, filterConds, r)).headOption
  }

  private def rewriteWith(
      agg: Aggregate,
      filterConds: Seq[Expression],
      reg: Registered
  ): Option[LogicalPlan] = {
    val defn = reg.defn

    // filters between aggregate and scan: only deterministic predicates over
    // MV grouping columns commute with the rollup; anything else blocks
    val filtersOk = filterConds.forall { cond =>
      cond.deterministic && cond.references.forall {
        case a: AttributeReference => defn.groupCols.contains(a.name)
        case _ => false
      }
    }
    if (!filtersOk) return None

    // grouping: bare base columns, all materialized in the MV
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if defn.groupCols.contains(a.name) => a
      case _ => return None
    }

    // fresh MV relation per rewrite site (attribute ids must not collide
    // across two rewritten aggregates in one plan)
    val mvPlan = reg.plan match {
      case lr: LogicalRelation => lr.newInstance()
      case other => other
    }
    def mvAttr(name: String): AttributeReference =
      mvPlan.output.collectFirst { case a: AttributeReference if a.name == name => a }.get

    def typed(e: Expression, original: NamedExpression): Expression =
      if (e.dataType == original.dataType) e else Cast(e, original.dataType)

    def reAgg(
        fn: AttributeReference => org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction,
        srcMvCol: String,
        original: NamedExpression
    ): NamedExpression = {
      val rewrapped = AggregateExpression(fn(mvAttr(srcMvCol)), Complete, isDistinct = false)
      Alias(typed(rewrapped, original), original.name)(exprId = original.exprId)
    }

    // count re-aggregation coalesces to 0: a GLOBAL count over an empty base
    // must stay 0, but SUM over the zero-row MV would return NULL
    def reCount(cntMv: String, original: NamedExpression): NamedExpression = {
      val s = AggregateExpression(Sum(mvAttr(cntMv)), Complete, isDistinct = false)
      val fixed = Coalesce(Seq(typed(s, original), Literal(0L, LongType)))
      Alias(typed(fixed, original), original.name)(exprId = original.exprId)
    }

    val rewritten = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Sum(a: AttributeReference, _) =>
            defn.sums.collectFirst { case (mv, base) if base == a.name => mv } match {
              case Some(mv) => reAgg(x => Sum(x), mv, al)
              case None => return None
            }
          case Min(a: AttributeReference) =>
            defn.mins.collectFirst { case (mv, base) if base == a.name => mv } match {
              // min of per-group mins over a PARTITION of the rows is exact
              case Some(mv) => reAgg(x => Min(x), mv, al)
              case None => return None
            }
          case Max(a: AttributeReference) =>
            defn.maxs.collectFirst { case (mv, base) if base == a.name => mv } match {
              case Some(mv) => reAgg(x => Max(x), mv, al)
              case None => return None
            }
          case Average(a: AttributeReference, _) if al.dataType == DoubleType =>
            // AVG = re-sum ÷ re-count, both over the MV. Double-typed only:
            // the division is exact whenever the sums are (integral values
            // below 2^53), and decimal AVG's scale promotion stays blocked
            // PERMANENTLY (Spark's decimal Average divides at
            // engine-internal intermediate precision then rounds into the
            // promoted result scale; a derived division cannot replicate
            // that bit-for-bit across overflow edges, and a near-miss here
            // is silent data corruption — the bail-out is pinned in
            // MvRewriteSpec). The denominator is the materialized NON-NULL
            // count of THIS measure (defn.counts), never countCol: AVG
            // ignores NULLs, so sum(col)/COUNT(*) silently undercounts any
            // nullable measure. No materialized COUNT(col) → no rewrite.
            (
              defn.sums.collectFirst { case (mv, base) if base == a.name => mv },
              defn.counts.collectFirst { case (mv, base) if base == a.name => mv }
            ) match {
              case (Some(sumMv), Some(cntMv)) =>
                val s = AggregateExpression(Sum(mvAttr(sumMv)), Complete, isDistinct = false)
                val c = AggregateExpression(Sum(mvAttr(cntMv)), Complete, isDistinct = false)
                Alias(Divide(Cast(s, DoubleType), Cast(c, DoubleType)), al.name)(
                  exprId = al.exprId)
              case _ => return None
            }
          case Count(Seq(Literal(1, _))) | Count(Seq()) =>
            defn.countCol match {
              case Some(cntMv) => reCount(cntMv, al)
              case None => return None
            }
          case Count(Seq(a: AttributeReference)) =>
            // COUNT(col) = non-null count: derivable only from a materialized
            // per-group count(col) (count(*) would overcount null measures)
            defn.counts.collectFirst { case (mv, base) if base == a.name => mv } match {
              case Some(cntMv) => reCount(cntMv, al)
              case None => return None
            }
          case _ => return None
        }
      case _ => return None
    }
    val newGrouping = groupAttrs.map(a => mvAttr(a.name))
    val remappedFilters = filterConds.map(_.transform {
      case a: AttributeReference => mvAttr(a.name)
    })
    val newChild = remappedFilters.foldLeft(mvPlan)((p, c) => Filter(c, p))
    Some(Aggregate(newGrouping, rewritten, newChild))
  }
}

/** The optimizer rule (see [[MvRewrite]]); injected via
  * [[graft.GraftExtensions]], a no-op until an MV is registered.
  */
case class MvRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRewrite.registered.isEmpty) return plan
    plan.transform { case agg: Aggregate =>
      MvRewrite.rewrite(session, agg).getOrElse(agg)
    }
  }
}
