package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketized range (interval) join — the non-equi join Spark has no
  * native operator for. A naive `a.join(b, $"p" >= $"lo" && $"p" < $"hi")`
  * plans as BroadcastNestedLoopJoin: O(|points|·|intervals|) comparisons,
  * the plan that dies first at scale.
  *
  * The standard fix (used by every interval-join engine): quantize the value
  * domain into fixed-width bins. A point belongs to exactly ONE bin; an
  * interval is exploded to every bin it overlaps. The join becomes an
  * EQUI-join on the bin id (shuffle on a scalar key) followed by the exact
  * `lo <= p < hi` residual filter. Cost drops to O(candidates in same bin);
  * each (point, interval) pair meets at most once — the point's single bin —
  * so no post-join dedup is needed. Bin width trades explode fan-out
  * (wide intervals / narrow bins) against candidate density (wide bins).
  */
object RangeJoin {

  private def binOf(v: Column, width: Double): Column =
    floor(v / width).cast("long")

  /** Last candidate bin for an EXCLUSIVE upper bound: ceil(hi/w), i.e. one
    * bin PAST the tightest cover. The deliberate +1 slack makes the cover
    * robust to division rounding: any point p < hi satisfies
    * rounded(p/w) <= rounded(hi/w) (double division is monotone), so
    * floor(p/w) <= ceil(hi/w) always — no ulp corner can drop a true match,
    * which a tight ceil(hi/w)-1 cover cannot guarantee when the correctly
    * rounded quotient lands exactly on an integer. The extra bin only adds
    * candidates that the exact residual filter drops.
    */
  private def lastBin(hi: Column, width: Double): Column =
    ceil(hi / width).cast("long")

  /** Join `points` (value `pointCol`) to `intervals` (half-open
    * [`loCol`, `hiCol`)) on containment. All other columns of both inputs
    * are carried through.
    */
  def pointIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", binOf(col(pointCol), binWidth))
    val iv = intervals
      .withColumn(
        "_bin",
        // hi is exclusive — candidate bins are [bin(lo), ceil(hi/w)] (guard
        // against the descending-sequence hazard for empty intervals lo >= hi)
        explode(
          when(
            col(loCol) < col(hiCol),
            sequence(binOf(col(loCol), binWidth), lastBin(col(hiCol), binWidth))
          ).otherwise(array().cast("array<long>"))
        )
      )
    p.join(iv, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  /** Interval × interval overlap join: pairs with
    * [lo1, hi1) ∩ [lo2, hi2) ≠ ∅, i.e. `lo1 < hi2 && lo2 < hi1`. Both sides
    * explode to their overlapped bins and equi-join on the bin id; a pair
    * sharing several bins would match once per shared bin, so the residual
    * keeps only the FIRST shared bin (`bin == max(bin(lo1), bin(lo2))`) —
    * the standard dedup-free formulation (no distinct over the pair set).
    */
  def intervalOverlapJoin(
      left: DataFrame,
      leftLo: String,
      leftHi: String,
      right: DataFrame,
      rightLo: String,
      rightHi: String,
      binWidth: Double
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(
        "_bin",
        explode(
          when(
            col(lo) < col(hi),
            sequence(binOf(col(lo), binWidth), lastBin(col(hi), binWidth))
          ).otherwise(array().cast("array<long>"))
        )
      )
    binned(left, leftLo, leftHi)
      .as("a")
      .join(binned(right, rightLo, rightHi).as("b"), col("a._bin") === col("b._bin"))
      .filter(
        col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi) &&
          col("a._bin") === greatest(binOf(col(leftLo), binWidth), binOf(col(rightLo), binWidth))
      )
      .drop("_bin")
  }
}
