package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
