package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * ingestion path needs: streaming and per-batch appends accumulate
  * kilobyte-scale parquet files whose open/footer costs eventually dominate
  * scans (at 100 TB, a million 100 KB files is a metadata DoS). Compaction
  * rewrites a directory into ~`targetBytes` files sized off the ACTUAL byte
  * footprint on disk, not a guessed row count.
  *
  * The rewrite streams through executors (read → repartition →
  * write-to-sibling → swap); the only driver work is the file listing. The
  * directory swap is not transactional — concurrent readers belong to a
  * table format with a commit log (Delta/Iceberg), not raw directories;
  * this operator is the compaction KERNEL those formats schedule.
  */
object Compaction {

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
    val tmp = new Path(path.getParent, path.getName + "_compacting")
    spark.read
      .parquet(dir)
      .repartition(nOut)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    (before.length, dataFiles(path).length)
  }
}
