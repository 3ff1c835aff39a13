package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort — the classic
  * two-phase selection algorithm: a coarse histogram pass locates the bucket
  * containing the k-th value, a second pass order-statistics only that
  * bucket's residents. Each pass is a partial-agg scan; nothing resembling
  * `ORDER BY` over the full data ever runs, and driver state is one bucket
  * histogram (≤ 2¹⁶ rows) plus one scalar — so the exact global median of a
  * 100 TB fact column costs two scans, not a terabyte-scale sort.
  *
  * Contrast with the repo's other quantile machinery: `q_median_groups` /
  * `q_mad_per_group` sort WITHIN keys (group-bounded), approx sketches trade
  * exactness for one pass. This is the exact-global rung: deterministic to
  * the bit, oracle-checkable against `ORDER BY ... OFFSET k-1`.
  */
object Selection {

  /** The k-th smallest (1-based) value of an integral column, exactly.
    *
    * Phase 1: histogram of value >> shiftBits (arithmetic shift, so negative
    * values bucket in order; bucket count is value-range / 2^shiftBits —
    * metadata-scale for money-like magnitudes), cumulated on the driver to
    * find the bucket holding rank k. Phase 2: an exact VALUE histogram
    * restricted to that one bucket — a pushable range predicate, and at most
    * 2^shiftBits distinct values regardless of row count, so both driver
    * payloads are bounded by configuration, not data. No TakeOrdered, no
    * per-row collection anywhere: the 100 TB cost is two partial-agg scans.
    */
  def kthSmallest(
      df: DataFrame,
      valueCol: String,
      k: Long,
      shiftBits: Int = 16
  ): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = col(valueCol).cast("long")
    val hist = df
      .select(expr(s"shiftright(cast($valueCol as long), $shiftBits)").as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = hist.map(_._2).sum
    require(k <= total, s"k=$k exceeds row count $total")
    var before = 0L
    var bucket = 0L
    var found = false
    var i = 0
    while (!found && i < hist.length) {
      val (b, c) = hist(i)
      if (before + c >= k) { bucket = b; found = true }
      else { before += c; i += 1 }
    }
    val lo = bucket << shiftBits
    val hi = ((bucket + 1) << shiftBits) - 1
    val localK = k - before
    val values = df
      .select(v.as("_v"))
      .filter(col("_v") >= lo && col("_v") <= hi)
      .groupBy("_v")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    var seen = 0L
    var j = 0
    while (seen + values(j)._2 < localK) { seen += values(j)._2; j += 1 }
    values(j)._1
  }

  /** Exact global median (lower median for even n) in two scans + the
    * phase-2 bucket read.
    */
  def exactMedian(df: DataFrame, valueCol: String): (Long, Long) = {
    val n = df.count()
    require(n > 0, "median of an empty frame")
    val k = (n + 1) / 2
    (n, kthSmallest(df, valueCol, k))
  }
}
