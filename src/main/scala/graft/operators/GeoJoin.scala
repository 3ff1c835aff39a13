package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed planar proximity join — the non-equi "points within radius"
  * join expressed as an equi-join Spark can shuffle-partition.
  *
  * Each point maps to a square grid cell of side `radius` (`floor(coord /
  * radius)`). A pair within `radius` can differ by at most one cell per axis
  * (cell side = radius exactly, so `floor((x + radius)/radius) = floor(x /
  * radius) + 1` — never 2), so the left side fans out to its 3×3 cell
  * neighborhood and equi-joins the right side's single home cell; the exact
  * distance predicate then filters the candidates. No pair dedup is needed:
  * the right row sits in exactly one cell, so a pair meets at most once.
  *
  * Boundary caveat: the "never 2" argument is exact-arithmetic; in computed
  * IEEE doubles a pair whose per-axis gap is within one ulp of EXACTLY
  * `radius` can land 2 cells apart (the divisions round toward different
  * integers) while the rounded `dist` still compares `<= radius` — such a
  * knife-edge pair would be silently dropped where an exact-distance oracle
  * keeps it. Measurement coordinates make an exact-radius gap a measure-zero
  * coincidence; callers needing closed-boundary certainty should widen the
  * grid side by one ulp (`Math.nextUp(radius)`) so the grid is strictly
  * looser than the kept predicate.
  *
  * Scale shape: shuffle keys are grid cells — candidate volume is bounded by
  * local density, never the cross product (the naive formulation Spark would
  * otherwise plan as BroadcastNestedLoopJoin). The 9× left fan-out is narrow
  * (key + two coords) and pre-shuffle. Dense-cell skew (a city) behaves like
  * any skewed equi-join — AQE skew split or salting applies unchanged.
  *
  * Distance is planar Euclidean in coordinate units: `sqrt(dlat² + dlon²)`,
  * written with fixed parenthesization so results are bit-deterministic
  * across engines (IEEE requires ±/×/÷/sqrt correctly rounded; no trig —
  * for geographic degrees an equirectangular lon scale can be premultiplied
  * into the lon column by the caller).
  */
object GeoJoin {

  /** @param left   point set that fans out to neighbor cells
    * @param right  point set joined on its home cell (broadcast it upstream
    *               if dimension-sized)
    * @param radius cell side and maximum kept distance (same coordinate unit)
    * @return (leftKey, rightKey, dist) for every pair with dist <= radius
    */
  def gridProximityJoin(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      latCol: String,
      lonCol: String,
      radius: Double
  ): DataFrame = {
    require(radius > 0.0, s"radius must be positive, got $radius")
    val r = right
      .select(col(rightKey), col(latCol).as("_rlat"), col(lonCol).as("_rlon"))
      .withColumn("_cx", floor(col("_rlat") / lit(radius)).cast("long"))
      .withColumn("_cy", floor(col("_rlon") / lit(radius)).cast("long"))
    val offs = array((-1 to 1).map(o => lit(o)): _*)
    val l = left
      .select(col(leftKey), col(latCol).as("_llat"), col(lonCol).as("_llon"))
      .withColumn("_dx", explode(offs))
      .withColumn("_dy", explode(offs))
      .withColumn("_cx", (floor(col("_llat") / lit(radius)) + col("_dx")).cast("long"))
      .withColumn("_cy", (floor(col("_llon") / lit(radius)) + col("_dy")).cast("long"))
    val dist = sqrt(
      ((col("_llat") - col("_rlat")) * (col("_llat") - col("_rlat"))) +
        ((col("_llon") - col("_rlon")) * (col("_llon") - col("_rlon")))
    )
    l.join(r, Seq("_cx", "_cy"))
      .withColumn("dist", dist)
      .filter(col("dist") <= lit(radius))
      .select(col(leftKey), col(rightKey), col("dist"))
  }
}
