package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort — the classic
  * multi-phase selection algorithm: a coarse histogram pass locates the
  * bucket containing the k-th value, recursing into the bucket until it is
  * narrow enough for an exact distinct-value scan. Each pass is a
  * partial-agg scan; nothing resembling `ORDER BY` over the full data ever
  * runs, and every driver payload is CONFIG-bounded unconditionally:
  *
  *   - phase 0: one (min, max, count) row — picks the coarse shift from the
  *     ACTUAL value range, so a full-domain int64 column (hashes, ids) gets
  *     a wide shift instead of a 2⁴⁸-bucket histogram (the failure mode of
  *     an earlier fixed-shift revision),
  *   - each histogram pass: ≤ [[Selection.MaxBuckets]] (bucket, count) rows
  *     by construction of the shift,
  *   - the final exact scan: ≤ 2^shiftBits distinct values.
  *
  * Every refinement level shrinks the candidate range by ≥ 2¹⁵×, so even the
  * adversarial ±2⁶² domain resolves in ≤ 5 histogram levels (money-like
  * magnitudes resolve in one). The exact global median of a 100 TB fact
  * column costs three partial-agg scans, not a terabyte-scale sort.
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

  /** Hard cap on histogram rows collected to the driver per pass. */
  private val MaxBuckets = 1 << 16

  /** Smallest shift ≥ floorShift whose bucket span over [lo, hi] fits
    * [[MaxBuckets]] (BigInt span arithmetic — the range itself can overflow
    * a long on full-domain columns).
    */
  private def shiftFor(lo: Long, hi: Long, floorShift: Int): Int = {
    var s = floorShift
    while (s < 63 && BigInt(hi >> s) - BigInt(lo >> s) + 1 > MaxBuckets) s += 1
    s
  }

  /** Exact ranks within [lo, hi]: each (key, localRank) pair resolves to the
    * localRank-th smallest non-null value in the range, keyed by the caller's
    * key. Recursion: histogram at a span-capped shift → locate each rank's
    * bucket → recurse per DISTINCT winning bucket with ranks rebased to the
    * bucket; base case (range ≤ 2^shiftBits wide) is one exact
    * distinct-value scan.
    */
  private def resolveRange(
      df: DataFrame,
      valueCol: String,
      ks: Seq[(Long, Long)],
      lo: Long,
      hi: Long,
      shiftBits: Int
  ): Map[Long, Long] = {
    val inRange = df
      .select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_v") >= lo && col("_v") <= hi)
    if (BigInt(hi) - BigInt(lo) + 1 <= (BigInt(1) << shiftBits)) {
      val values = inRange
        .groupBy("_v")
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      ks.map { case (key, localK) =>
        var seen = 0L
        var j = 0
        while (seen + values(j)._2 < localK) { seen += values(j)._2; j += 1 }
        key -> values(j)._1
      }.toMap
    } else {
      val s = shiftFor(lo, hi, shiftBits)
      val hist = inRange
        .select(expr(s"shiftright(_v, $s)").as("b"))
        .groupBy("b")
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      val cum = hist.scanLeft(0L)(_ + _._2)
      def locate(k: Long): (Long, Long) = {
        var i = 0
        while (cum(i + 1) < k) i += 1
        (hist(i)._1, cum(i))
      }
      ks.map { case (key, k) => (key, k, locate(k)) }
        .groupBy(_._3._1) // distinct winning bucket → its ranks
        .flatMap { case (bucket, group) =>
          // bucket << s cannot overflow (bucket came from an arithmetic
          // shiftright by s), but (bucket + 1) << s wraps negative for the
          // topmost bucket — clamp to Long.MaxValue there (the wrap made an
          // earlier revision scan an empty range and walk off the end).
          val blo = math.max(lo, bucket << s)
          val bhi =
            if (bucket == (Long.MaxValue >> s)) Long.MaxValue
            else math.min(hi, ((bucket + 1) << s) - 1)
          resolveRange(
            df,
            valueCol,
            group.map { case (key, k, (_, before)) => (key, k - before) }.toSeq,
            blo,
            bhi,
            shiftBits
          )
        }
    }
  }

  /** Phase 0: (min, max, non-null count) in one partial-agg scan — one row
    * to the driver, and the basis for the range-adaptive shift.
    */
  private def domainOf(df: DataFrame, valueCol: String): (Long, Long, Long) = {
    val r = df
      .select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .agg(min("_v"), max("_v"), count(lit(1)))
      .collect()(0)
    if (r.isNullAt(0)) (0L, 0L, 0L) else (r.getLong(0), r.getLong(1), r.getLong(2))
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

  /** Several exact order statistics sharing ONE domain pass and one coarse
    * histogram pass — the quantile-set form (p25/p50/p75/p99 of a 100 TB
    * column in 2 + distinct-winning-buckets scans). Refinement runs once per
    * DISTINCT winning bucket; adjacent quantiles frequently share one.
    */
  def kthSmallestMulti(
      df: DataFrame,
      valueCol: String,
      ks: Seq[Long],
      shiftBits: Int = 16
  ): Map[Long, Long] = {
    require(ks.nonEmpty, "need at least one rank")
    require(ks.forall(_ >= 1), s"ranks must be >= 1, got $ks")
    require(shiftBits >= 1 && shiftBits <= 32, s"shiftBits must be in [1, 32], got $shiftBits")
    val (lo, hi, total) = domainOf(df, valueCol)
    require(ks.forall(_ <= total), s"a rank in $ks exceeds non-null row count $total")
    resolveRange(df, valueCol, ks.distinct.map(k => (k, k)), lo, hi, shiftBits)
  }

  /** Exact global median (lower median for even n) of the non-null values.
    * n comes from the phase-0 domain scan itself — no separate count pass.
    */
  def exactMedian(df: DataFrame, valueCol: String): (Long, Long) = {
    val (lo, hi, n) = domainOf(df, valueCol)
    require(n > 0, "median of an empty (or all-null) frame")
    val k = (n + 1) / 2
    (n, resolveRange(df, valueCol, Seq((k, k)), lo, hi, 16)(k))
  }

  /** Exact global quantile set at rank ⌈pct·n/100⌉ over the non-null
    * values: (n, pct → value). One domain pass, one coarse histogram pass,
    * one refinement chain per distinct winning bucket — n is read off the
    * domain row, so four exact quantiles cost at most six partial-agg scans
    * on any money-like column.
    */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      pcts: Seq[Int],
      shiftBits: Int = 16
  ): (Long, Map[Int, Long]) = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val (lo, hi, n) = domainOf(df, valueCol)
    require(n > 0, "quantiles of an empty (or all-null) frame")
    val kOf = pcts.map(p => p -> ((p.toLong * n + 99) / 100)).toMap
    val byRank =
      resolveRange(df, valueCol, kOf.values.toSeq.distinct.map(k => (k, k)), lo, hi, shiftBits)
    (n, kOf.map { case (p, k) => p -> byRank(k) })
  }

  /** Mergeable coarse-histogram STATE for REPEATED exact selection — the
    * IVM form of this module's phase 1: bucket counts are plain sums, so a
    * daily median job maintains (bucket, cnt) per ingest with the same
    * merge-≡-recompute algebra as `IncrementalAgg.state` and never
    * re-scans history for the histogram. A query then costs ONE scan
    * scoped to the winning bucket's value range (a pushed-down parquet
    * range filter) instead of the fresh path's two full passes. The fixed
    * shift is the price of mergeability: it fits money-like magnitudes
    * ([[kthFromHistogramState]] fails LOUDLY past the bucket bound); wide
    * domains (hashes, ids) keep the adaptive non-incremental
    * [[quantiles]].
    */
  def histogramState(df: DataFrame, valueCol: String, shiftBits: Int = 16): DataFrame = {
    require(shiftBits >= 1 && shiftBits <= 32, s"shiftBits must be in [1, 32], got $shiftBits")
    df.select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(expr(s"shiftright(_v, $shiftBits)").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The k-th smallest value with phase 1 answered FROM maintained
    * [[histogramState]] frames (merged here — pass every slice's state):
    * locate the rank's bucket from the summed counts, then run the exact
    * refinement ONLY over that bucket's value range of `df`. `df` must be
    * the same data the states describe; `shiftBits` must match the build.
    */
  def kthFromHistogramState(
      df: DataFrame,
      valueCol: String,
      states: Seq[DataFrame],
      k: Long,
      shiftBits: Int = 16
  ): Long = {
    require(states.nonEmpty, "need at least one histogram state")
    require(k >= 1, s"rank must be >= 1, got $k")
    val hist = states
      .reduce(_.unionByName(_))
      .groupBy("bucket")
      .agg(sum("cnt").cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    require(
      hist.length <= MaxBuckets,
      s"maintained histogram holds ${hist.length} buckets (> $MaxBuckets) — the fixed-shift " +
        "state fits money-like magnitudes; use the adaptive quantiles() for wide domains"
    )
    val cum = hist.scanLeft(0L)(_ + _._2)
    require(k <= cum.last, s"rank $k exceeds the states' total count ${cum.last}")
    var i = 0
    while (cum(i + 1) < k) i += 1
    val bucket = hist(i)._1
    val blo = bucket << shiftBits
    val bhi =
      if (bucket == (Long.MaxValue >> shiftBits)) Long.MaxValue
      else ((bucket + 1) << shiftBits) - 1
    resolveRange(df, valueCol, Seq((0L, k - cum(i))), blo, bhi, shiftBits)(0L)
  }
}
