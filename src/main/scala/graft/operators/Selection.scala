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
  ): Long =
    kthSmallestMulti(df, valueCol, Seq(k), shiftBits)(k)

  /** Several exact order statistics sharing ONE coarse histogram pass —
    * the quantile-set form (p25/p50/p75/p99 of a 100 TB column in
    * 1 + distinct-winning-buckets scans). Phase 2 runs once per DISTINCT
    * winning bucket; adjacent quantiles frequently share one.
    */
  def kthSmallestMulti(
      df: DataFrame,
      valueCol: String,
      ks: Seq[Long],
      shiftBits: Int = 16
  ): Map[Long, Long] = {
    require(ks.nonEmpty, "need at least one rank")
    require(ks.forall(_ >= 1), s"ranks must be >= 1, got $ks")
    val v = col(valueCol).cast("long")
    val hist = df
      .select(expr(s"shiftright(cast($valueCol as long), $shiftBits)").as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = hist.map(_._2).sum
    require(ks.forall(_ <= total), s"a rank in $ks exceeds row count $total")
    // cumulative walk: rank k lives in the first bucket whose running total
    // reaches k; `before` = rows in strictly earlier buckets
    val cum = hist.scanLeft(0L)(_ + _._2)
    def locate(k: Long): (Long, Long) = {
      var i = 0
      while (cum(i + 1) < k) i += 1
      (hist(i)._1, cum(i))
    }
    val located = ks.distinct.map(k => k -> locate(k))
    located
      .groupBy(_._2._1) // distinct winning bucket → its ranks
      .flatMap { case (bucket, ranks) =>
        val lo = bucket << shiftBits
        val hi = ((bucket + 1) << shiftBits) - 1
        val values = df
          .select(v.as("_v"))
          .filter(col("_v") >= lo && col("_v") <= hi)
          .groupBy("_v")
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        ranks.map { case (k, (_, before)) =>
          val localK = k - before
          var seen = 0L
          var j = 0
          while (seen + values(j)._2 < localK) { seen += values(j)._2; j += 1 }
          k -> values(j)._1
        }
      }
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
