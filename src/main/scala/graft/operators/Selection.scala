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
  * Nulls are EXCLUDED, SQL-style: ranks are over non-null values, and the
  * row counts reported by [[exactMedian]]/[[quantiles]] count non-null
  * values only (the convention every rank-window oracle twin shares).
  *
  * Contrast with the repo's other quantile machinery: `q_median_groups` /
  * `q_mad_per_group` sort WITHIN keys (group-bounded), approx sketches trade
  * exactness for one pass. This is the exact-global rung: deterministic to
  * the bit, oracle-checkable against `ORDER BY ... OFFSET k-1`.
  */
object Selection {

  /** Phase 1: (bucket, count) histogram over non-null values, sorted by
    * bucket. Arithmetic shift, so negative values bucket in order; bucket
    * count is value-range / 2^shiftBits — metadata-scale for money-like
    * magnitudes.
    */
  private def bucketHistogram(
      df: DataFrame,
      valueCol: String,
      shiftBits: Int
  ): Array[(Long, Long)] =
    df.select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .select(expr(s"shiftright(_v, $shiftBits)").as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)

  /** Resolve ranks against a phase-1 histogram: one exact value-histogram
    * scan per DISTINCT winning bucket (≤ 2^shiftBits rows each, by
    * construction — driver payloads bounded by config, not data).
    */
  private def resolve(
      df: DataFrame,
      valueCol: String,
      ks: Seq[Long],
      shiftBits: Int,
      hist: Array[(Long, Long)]
  ): Map[Long, Long] = {
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
          .select(col(valueCol).cast("long").as("_v"))
          .filter(col("_v").isNotNull && col("_v") >= lo && col("_v") <= hi)
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

  /** The k-th smallest (1-based) non-null value of an integral column,
    * exactly.
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
    val hist = bucketHistogram(df, valueCol, shiftBits)
    val total = hist.map(_._2).sum
    require(ks.forall(_ <= total), s"a rank in $ks exceeds non-null row count $total")
    resolve(df, valueCol, ks, shiftBits, hist)
  }

  /** Exact global median (lower median for even n) of the non-null values.
    * n comes from the phase-1 histogram itself — no separate count pass.
    */
  def exactMedian(df: DataFrame, valueCol: String): (Long, Long) = {
    val hist = bucketHistogram(df, valueCol, 16)
    val n = hist.map(_._2).sum
    require(n > 0, "median of an empty (or all-null) frame")
    val k = (n + 1) / 2
    (n, resolve(df, valueCol, Seq(k), 16, hist)(k))
  }

  /** Exact global quantile set at rank ⌈pct·n/100⌉ over the non-null
    * values: (n, pct → value). One histogram pass, one in-bucket pass per
    * distinct winning bucket — n is read off the histogram, so four exact
    * quantiles cost at most five partial-agg scans total.
    */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      pcts: Seq[Int],
      shiftBits: Int = 16
  ): (Long, Map[Int, Long]) = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val hist = bucketHistogram(df, valueCol, shiftBits)
    val n = hist.map(_._2).sum
    require(n > 0, "quantiles of an empty (or all-null) frame")
    val kOf = pcts.map(p => p -> ((p.toLong * n + 99) / 100)).toMap
    val byRank = resolve(df, valueCol, kOf.values.toSeq, shiftBits, hist)
    (n, kOf.map { case (p, k) => p -> byRank(k) })
  }
}
