package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * ingestion path needs: streaming and per-batch appends accumulate
  * kilobyte-scale parquet files whose open/footer costs eventually dominate
  * scans (at 100 TB, a million 100 KB files is a metadata DoS). Compaction
  * rewrites a directory into ~`targetBytes` files sized off the ACTUAL byte
  * footprint on disk, not a guessed row count.
  *
  * The rewrite streams through executors (read → repartition →
  * write-to-sibling → swap); the only driver work is the file listing. The
  * swap renames the live directory ASIDE before renaming the compacted one
  * in, so a crash at any point leaves a complete copy of the data under
  * either the original name or the `_precompact` backup — the
  * delete-then-rename ordering that could lose the live copy is avoided,
  * and each FileSystem call's boolean result is checked (HDFS signals
  * failure by returning false, not by throwing). The swap is still not
  * transactional for CONCURRENT READERS — those belong to a table format
  * with a commit log (Delta/Iceberg), not raw directories; this operator is
  * the compaction KERNEL those formats schedule.
  */
object Compaction {

  /** Manifest a compaction leaves INSIDE the rewritten directory: the
    * replaced/produced data-file names plus an order-independent content
    * stat (row count + exact DECIMAL sum of per-row xxhash64 over the
    * name-sorted columns) computed on the source AND re-verified on the
    * rewrite before the swap — the proof that the epoch changed FILES but
    * not ROWS. The underscore prefix keeps it invisible to parquet readers
    * and to [[graft.plans.MvRewrite]]'s base manifests; MvRewrite's
    * compaction-aware refresh consumes it to remap an MV's per-file
    * sidecar instead of dropping the MV.
    */
  val ManifestName = "_graft_compaction.json"

  case class CompactionManifest(
      replaced: Seq[String],
      produced: Seq[String],
      rows: Long,
      contentHash: String
  )

  private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Order-independent content stat of a parquet path: (rows, exact
    * DECIMAL(38,0) sum of xxhash64 over the name-sorted columns). Sum (not
    * xor) so duplicate rows count; DECIMAL so the sum can never overflow
    * (ANSI-safe) and compares exactly cross-run.
    */
  def contentStat(spark: SparkSession, paths: Seq[String]): (Long, String) = {
    val df = spark.read.parquet(paths: _*)
    val cols = df.columns.sorted.map(col)
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(cols: _*).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h")
    ).head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
  }

  def readManifest(spark: SparkSession, dir: String): Option[CompactionManifest] = {
    val p = new Path(dir, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in: java.io.InputStream = fs.open(p)
      try Some(mapper.readValue(in, classOf[CompactionManifest]))
      finally in.close()
    }
  }

  /** @return (filesBefore, filesAfter) parquet data-file counts */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetBytes: Long
  ): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(p: Path) =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val (srcRows, srcHash) = contentStat(spark, Seq(dir))
    val tmp = new Path(path.getParent, path.getName + "_compacting")
    spark.read
      .parquet(dir)
      .repartition(nOut)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    // self-check BEFORE the swap: a rewrite that lost or duplicated a row
    // must never replace the live copy
    val (outRows, outHash) = contentStat(spark, Seq(tmp.toString))
    if (outRows != srcRows || outHash != srcHash) {
      fs.delete(tmp, true)
      sys.error(
        s"compaction: rewrite content mismatch (rows $srcRows -> $outRows, " +
          s"hash $srcHash -> $outHash) — rewrite discarded, $dir untouched")
    }
    // the manifest travels INSIDE the rewrite so the swap publishes it
    // atomically with the files it describes
    val manifest = CompactionManifest(
      replaced = before.map(_.getPath.getName).sorted.toSeq,
      produced = dataFiles(tmp).map(_.getPath.getName).sorted.toSeq,
      rows = srcRows,
      contentHash = srcHash)
    val mOut = fs.create(new Path(tmp, ManifestName), true)
    try mOut.write(mapper.writeValueAsBytes(manifest))
    finally mOut.close()
    val backup = new Path(path.getParent, path.getName + "_precompact")
    if (fs.exists(backup) && !fs.delete(backup, true))
      sys.error(s"compaction: could not clear stale backup $backup")
    if (!fs.rename(path, backup))
      sys.error(s"compaction: could not move $path aside to $backup")
    if (!fs.rename(tmp, path)) {
      // restore the original so the table stays readable under its own name
      fs.rename(backup, path)
      sys.error(s"compaction: could not move compacted $tmp into $path")
    }
    if (!fs.delete(backup, true))
      sys.error(s"compaction: swap complete but backup $backup was not removed")
    (before.length, dataFiles(path).length)
  }

  /** SELECTIVE compaction planning — the step before [[compactParquet]]'s
    * whole-directory rewrite when most files are already well-sized: group
    * only the undersized files into rewrite bins of roughly `targetBytes`,
    * leaving big files untouched (rewriting them buys nothing and costs a
    * full copy).
    *
    * Greedy NEXT-FIT shelf assignment as one keyed window: files ordered
    * (size DESC, path), running byte sum over the small files,
    * `bin = floor((cumsum − size) / target)` — each bin fills to at least
    * `targetBytes` before the next opens, and every bin stays under
    * `target + its largest member`. Keyed by the table partition columns,
    * so planning parallelizes across partitions with one running scalar of
    * state per key; the rewrite step groups by (partition, bin) and writes
    * one file per bin.
    *
    * @param files       one row per file with `partCols`, `pathCol`, `sizeCol`
    * @param partCols    partition-directory columns planning is keyed by
    *                    (empty = whole listing as one planning key)
    * @param targetBytes rewrite bin target size, > 0
    * @return input rows plus `bin` (−1 = keep as-is) and `bin_bytes`
    */
  def planBins(
      files: DataFrame,
      partCols: Seq[String],
      pathCol: String,
      sizeCol: String,
      targetBytes: Long
  ): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val keyCols =
      if (partCols.nonEmpty) partCols.map(col)
      else Seq(pmod(length(col(pathCol)), lit(1))) // constant, non-foldable
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col(sizeCol).desc, col(pathCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val small = col(sizeCol) < targetBytes
    val cum = sum(when(small, col(sizeCol)).otherwise(0L)).over(w)
    val bins = files
      .withColumn("_cum", cum)
      .withColumn(
        "bin",
        when(small, ((col("_cum") - col(sizeCol)) / targetBytes).cast("long"))
          .otherwise(lit(-1L))
      )
    val wBin = Window.partitionBy(keyCols :+ col("bin"): _*)
    bins
      .withColumn(
        "bin_bytes",
        when(col("bin") >= 0, sum(col(sizeCol)).over(wBin)).otherwise(col(sizeCol))
      )
      .drop("_cum")
  }
}
