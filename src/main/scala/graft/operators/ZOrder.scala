package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-skipping layout:
  * interleaving the bits of two key columns gives a single sort key whose
  * ranges are small rectangles in (x, y) space, so min/max statistics
  * (parquet row groups, file footers) prune BOTH dimensions of a box query
  * after one sort. A plain sort by x prunes only x; Z-order is how lakehouse
  * tables (Delta/Iceberg OPTIMIZE ZORDER BY) keep two query dimensions
  * skippable at once.
  *
  * `zValue2` is a pure narrow bit expression (codegen'd, engine-portable —
  * the DuckDB twin replays it with the same shifts); `cluster2` is the
  * layout op: range-repartition + intra-partition sort by the z-value, the
  * exact shape of a distributed table rewrite at 100 TB (the range
  * exchange samples the z-distribution, so skew in the raw keys does not
  * produce skewed output files).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: x occupies even output bit positions, y odd. Inputs are
    * masked to `bits` bits first, so any long column is safe to pass.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val mx = x.cast("long").bitwiseAND(lit(mask))
    val my = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(mx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(my, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Cluster a dataset for two-dimensional skipping: range-partition and
    * sort by the Morton value of (xCol, yCol). Each output partition then
    * covers a compact (x, y) rectangle — asserted in PipelineOpsSpec.
    */
  def cluster2(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int,
      bits: Int = 16
  ): DataFrame =
    df.withColumn("_z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** The persisted form of [[cluster2]] — a lakehouse `OPTIMIZE ZORDER BY`
    * rewrite: Morton-cluster, write one Hive directory per cluster zone
    * (`zone=K/`), and write a `zones/` SIDECAR of per-zone (count, min/max x,
    * min/max y) stats — the table-level zone map that [[prunedRead]] consults
    * so a 2-D box query opens only the zone directories whose bounding box
    * intersects it. The sidecar is zone-cardinality-sized (metadata, like
    * the IVF centroids or the LSH bucket index E123), and the stats are
    * computed by re-reading what was actually written, so they describe the
    * persisted layout, not an assumption about it.
    */
  def writeClustered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numPartitions: Int,
      bits: Int = 16
  ): Unit = {
    val spark = df.sparkSession
    cluster2(df, xCol, yCol, numPartitions, bits)
      .withColumn("zone", spark_partition_id())
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("zone")
      .parquet(s"$path/data")
    spark.read
      .parquet(s"$path/data")
      .groupBy("zone")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"),
        max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"),
        max(col(yCol)).as("max_y")
      )
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/zones")
  }

  /** Fold an ingest into a [[writeClustered]] layout WITHOUT re-clustering
    * history — the lakehouse append path: the batch is Morton-clustered
    * alone into fresh zone ids (offset past the current maximum, so the
    * write only creates new `zone=K/` directories), and the sidecar gains
    * the new zones' true-bounds rows. Box queries stay EXACT through any
    * append sequence ([[prunedRead]] consults the union sidecar and zone
    * stats remain true bounds) — but batch-local zones overlap history's
    * boxes, so PRUNING degrades as ingests accumulate; [[reoptimize]] is
    * the `OPTIMIZE ZORDER` rewrite that restores the single global
    * clustering. Not replay-idempotent by itself — wrap ingests in the
    * `_SUCCESS`-gate idiom (`StreamingOps.idempotentAppend`) like every
    * other append in this library.
    */
  def appendClustered(
      batch: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numPartitions: Int,
      bits: Int = 16
  ): Unit = {
    val spark = batch.sparkSession
    val oldZones = spark.read.parquet(s"$path/zones").localCheckpoint() // pre-overwrite pin
    val maxZone = oldZones.agg(max(col("zone").cast("int"))).head().getInt(0)
    cluster2(batch, xCol, yCol, numPartitions, bits)
      .withColumn("zone", spark_partition_id() + lit(maxZone + 1))
      .write
      .mode(SaveMode.Append) // fresh zone values → new directories only
      .partitionBy("zone")
      .parquet(s"$path/data")
    val newStats = spark.read
      .parquet(s"$path/data")
      .filter(col("zone") > maxZone)
      .groupBy("zone")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"),
        max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"),
        max(col(yCol)).as("max_y")
      )
    oldZones
      .unionByName(newStats.select(oldZones.columns.toIndexedSeq.map(col): _*))
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/zones")
  }

  /** Re-cluster the whole layout into one global Morton order — the
    * `OPTIMIZE ZORDER` maintenance rewrite run after a stretch of
    * [[appendClustered]] ingests has fragmented the zone map. Rows are
    * materialized before the in-place overwrite (self-overwrite guard); on
    * a real lakehouse, write to a fresh path and swap atomically instead.
    * Reads are byte-equivalent before and after; the payoff is the pruning
    * fraction returning to the freshly-clustered optimum (both pinned in
    * ZOrderLayoutSpec).
    */
  def reoptimize(
      spark: SparkSession,
      path: String,
      xCol: String,
      yCol: String,
      numPartitions: Int,
      bits: Int = 16
  ): Unit = {
    val all = spark.read.parquet(s"$path/data").drop("zone").localCheckpoint()
    writeClustered(all, xCol, yCol, path, numPartitions, bits)
  }

  /** Zones whose bbox intersects the query box, from the sidecar alone —
    * (selected, total). Metadata-scale: one tiny parquet read, ≤ one row
    * per zone on the driver (the same scale as a file-listing).
    */
  def selectZones(
      spark: SparkSession,
      path: String,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long
  ): (Seq[Int], Int) = {
    // one collect serves both the total and the intersection test — the
    // sidecar is ≤ one row per zone, so the bbox filter runs on the driver
    // instead of paying a second parquet job on this hot read path
    val zones = spark.read
      .parquet(s"$path/zones")
      .select(
        col("zone").cast("int").as("zone"),
        col("min_x").cast("long"), col("max_x").cast("long"),
        col("min_y").cast("long"), col("max_y").cast("long")
      )
      .collect()
    val keep = zones.iterator
      .filter { r =>
        !(r.getLong(2) < xLo || r.getLong(1) > xHi ||
          r.getLong(4) < yLo || r.getLong(3) > yHi)
      }
      .map(_.getInt(0))
      .toSeq
      .sorted
    (keep, zones.length)
  }

  /** Box query against the clustered layout: consult the sidecar, read ONLY
    * the intersecting `zone=K/` directories (Hive partition pruning — the
    * scan never lists the skipped zones' files), then apply the exact box
    * filter to drop the false positives inside surviving zones. Equivalent
    * to the full-scan filter by construction (zone stats are true bounds,
    * so no qualifying row lives in a skipped zone) — pinned in
    * ZOrderLayoutSpec.
    */
  def prunedRead(
      spark: SparkSession,
      path: String,
      xCol: String,
      yCol: String,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long
  ): DataFrame = {
    val (keep, _) = selectZones(spark, path, xLo, xHi, yLo, yHi)
    spark.read
      .parquet(s"$path/data")
      .filter(col("zone").isin(keep: _*))
      .filter(col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }
}
