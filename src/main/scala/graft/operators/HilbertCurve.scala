package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the locality-optimal sibling of [[ZOrder]]:
  * where Morton interleaving has "seams" (consecutive z-values can jump
  * across the whole grid when a high bit flips), the Hilbert walk visits
  * every cell of the 2^bits × 2^bits grid in a path whose CONSECUTIVE
  * indices are always grid neighbours (Manhattan distance exactly 1 —
  * asserted in HilbertCurveSpec). Equal-count ranges of the Hilbert index
  * therefore tile the plane into blobs with strictly smaller bounding boxes
  * than the same-size Morton ranges, which is why lakehouse engines that
  * offer both (e.g. Delta Lake's OPTIMIZE, DuckDB's spatial layout work)
  * recommend Hilbert for multi-dimensional data skipping at scale.
  *
  * The index is computed by the classic xy2d rotate/reflect walk (one step
  * per bit level, most-significant first; see Hamilton, "Compact Hilbert
  * Indices", or the public-domain Wikipedia C formulation): at level `s`
  * the quadrant bits (rx, ry) contribute `s²·((3·rx) ⊕ ry)` to the index
  * and the sub-square's coordinate frame is rotated/reflected so the walk
  * re-enters it in canonical orientation. Each step is ONE chained
  * projection over the previous step's aliases — plan growth is linear in
  * `bits` (CollapseProject leaves multi-referenced non-cheap aliases
  * alone), everything stays inside whole-stage codegen, and the DuckDB twin
  * replays the identical CASE chain CTE-for-CTE.
  */
object HilbertCurve {

  private val StateCols = Set("_hx", "_hy", "_hd")

  /** Append the Hilbert d-index of (xCol, yCol) — each masked to `bits`
    * bits — as `outCol`. Pure narrow bit/CASE arithmetic, no UDF, no
    * shuffle; safe on any long-castable columns.
    */
  def withHilbert(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outCol: String,
      bits: Int = 16
  ): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val n = 1L << bits
    val mask = n - 1
    var cur = df
      .withColumn("_hx", col(xCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("_hy", col(yCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("_hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("_hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("_hy"), i).bitwiseAND(lit(1L))
      // (3·rx) ⊕ ry collapses to: rx = 1 → 3 − ry, rx = 0 → ry
      val quadrant = when(rx === 1L, lit(3L) - ry).otherwise(ry)
      val nd = (col("_hd") + lit(s * s) * quadrant).as("_hd")
      // rotate/reflect the sub-square: ry = 1 keeps the frame; ry = 0 swaps
      // the axes, additionally reflecting both through n−1 when rx = 1
      val nx = when(ry === 1L, col("_hx"))
        .when(rx === 1L, lit(n - 1) - col("_hy"))
        .otherwise(col("_hy"))
        .as("_hx")
      val ny = when(ry === 1L, col("_hy"))
        .when(rx === 1L, lit(n - 1) - col("_hx"))
        .otherwise(col("_hx"))
        .as("_hy")
      val carried = cur.columns.filterNot(StateCols).map(col)
      cur = cur.select(carried ++ Seq(nd, nx, ny): _*)
    }
    cur.withColumnRenamed("_hd", outCol).drop("_hx", "_hy")
  }

  /** Cluster a dataset for two-dimensional skipping: range-partition and
    * sort by the Hilbert index of (xCol, yCol) — the same layout shape as
    * [[ZOrder.cluster2]] (the range exchange samples the index
    * distribution, so raw-key skew does not skew output files), with the
    * tighter per-range bounding boxes the walk buys.
    */
  def cluster2(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int,
      bits: Int = 16
  ): DataFrame =
    withHilbert(df, xCol, yCol, "_h", bits)
      .repartitionByRange(numPartitions, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")

  /** The persisted form of [[cluster2]] — one Hive `zone=K/` directory per
    * cluster zone plus a `zones/` sidecar of per-zone (count, min/max x,
    * min/max y), the identical layout contract as [[ZOrder.writeClustered]]
    * so [[ZOrder.prunedRead]]-style consumers work unchanged.
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
        min(xCol).as("min_x"),
        max(xCol).as("max_x"),
        min(yCol).as("min_y"),
        max(yCol).as("max_y")
      )
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/zones")
  }

  /** The unrolled DuckDB twin of [[withHilbert]] as a chain of CTEs. The
    * caller provides a CTE named `h0` with columns `(carry…, _hx, _hy, _hd)`
    * (coordinates already masked, `_hd` = 0); this returns the `, h1 AS
    * (…), …, h<bits> AS (…)` continuation replaying the walk CASE-for-CASE,
    * and the final CTE `h<bits>` again exposes `(carry…, _hd)`.
    *
    * State columns ALTERNATE names between steps (`_hx`/`_gx`, …): DuckDB
    * resolves lateral column aliases within a SELECT list, so re-aliasing
    * `_hx` and then referencing `_hx` in the `_hy` expression of the same
    * list would silently bind the NEW value — alternating names keeps every
    * reference bound to the previous step's output, exactly like the
    * DataFrame chain.
    */
  def oracleCteChain(bits: Int, carry: Seq[String]): String = {
    val n = 1L << bits
    val cols = carry.mkString(", ")
    (1 to bits).map { k =>
      val i = bits - k
      val s = 1L << i
      val in = if ((k - 1) % 2 == 0) "_h" else "_g"
      val out = if (k % 2 == 0) "_h" else "_g"
      // the last CTE normalizes the index back to the `_hd` name
      val dOut = if (k == bits) "_hd" else s"${out}d"
      s""",
         |h$k AS (SELECT $cols,
         |  ${in}d + ${s * s} * (CASE WHEN ((${in}x >> $i) & 1) = 1
         |    THEN 3 - ((${in}y >> $i) & 1) ELSE ((${in}y >> $i) & 1) END) AS $dOut,
         |  CASE WHEN ((${in}y >> $i) & 1) = 1 THEN ${in}x
         |       WHEN ((${in}x >> $i) & 1) = 1 THEN ${n - 1} - ${in}y
         |       ELSE ${in}y END AS ${out}x,
         |  CASE WHEN ((${in}y >> $i) & 1) = 1 THEN ${in}y
         |       WHEN ((${in}x >> $i) & 1) = 1 THEN ${n - 1} - ${in}x
         |       ELSE ${in}x END AS ${out}y
         |FROM h${k - 1})"""
    }.mkString
  }
}
