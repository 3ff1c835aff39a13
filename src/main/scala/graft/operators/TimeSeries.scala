package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: align irregular events onto a uniform time grid
  * per key, with zero-fill for counts and forward-fill (last observation
  * carried forward) for values — the standard feature-engineering shape for
  * training-data pipelines over event streams.
  *
  * Scale shape: the grid is |keys| × |buckets| rows built from a distinct-key
  * projection cross-joined with a broadcastable generated sequence — never
  * densified through the raw events; the fill is a keyed window (shuffle by
  * key, sort by bucket within partition). At 100 TB of events the heavy side
  * (the per-bucket aggregate) still carries one row per (key, bucket).
  */
object TimeSeries {

  /** Period-over-period distribution drift as the EXACT 1-D earth-mover
    * distance — the metric complement to PSI (`q_psi_drift`): PSI blows up
    * on empty bins and ignores band ADJACENCY; EMD is finite everywhere
    * and charges mass by how FAR it moved across the ordered band domain,
    * which is what a "values shifted up by one bucket" drift actually is.
    * For each consecutive period pair (P = current, Q = previous):
    * EMD_ppm = Σ_bands |cumP·N_q − cumQ·N_p| · 10^6 div (N_p·N_q·(m−1)) —
    * all BIGINT, prefix differences compared in 1/(N_p·N_q) units, so the
    * report hash-verifies cross-engine. (Counts enter products with N; for
    * N beyond ~10^9 rows/period, pre-scale counts or lift the ladder to
    * DECIMAL(38).)
    *
    * One data-sized partial aggregate on (period, band); everything after
    * runs on the periods×bands grid (calendar-bounded — the window that
    * orders periods partitions on a constant bucket over ≤ |periods|
    * rows, same shape as the month-series entries).
    *
    * @return one row per period after the first:
    *         (period, prev_period, n_cur, n_prev, emd_ppm)
    */
  def emdDriftByPeriod(df: DataFrame, periodCol: String, bandCol: String): DataFrame = {
    val counts = df
      .groupBy(col(periodCol).as("_p"), col(bandCol).as("_b"))
      .agg(count(lit(1)).cast("long").as("_n"))
    val ptot = counts.groupBy(col("_p")).agg(sum(col("_n")).cast("long").as("_nt"))
    val wIdx = Window.partitionBy(lit(0)).orderBy(col("_p"))
    val periods = ptot.withColumn("_idx", row_number().over(wIdx))
    val bands = counts.select(col("_b")).distinct()
    val wCum = Window
      .partitionBy(col("_p"))
      .orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = periods
      .crossJoin(broadcast(bands))
      .join(counts, Seq("_p", "_b"), "left")
      .na
      .fill(0L, Seq("_n"))
      .withColumn("_cp", sum(col("_n")).over(wCum))
      .select(col("_p"), col("_idx"), col("_nt"), col("_b"), col("_cp"))
    val prev = grid.select(
      col("_p").as("prev_period"),
      (col("_idx") + 1).as("_idx"),
      col("_nt").as("_ntq"),
      col("_b"),
      col("_cp").as("_cq")
    )
    grid
      .join(prev, Seq("_idx", "_b"))
      .groupBy(
        col("_p").as("period"),
        col("prev_period"),
        col("_nt").as("n_cur"),
        col("_ntq").as("n_prev")
      )
      .agg(
        sum(abs(col("_cp") * col("_ntq") - col("_cq") * col("_nt"))).cast("long").as("_dsum"),
        count(lit(1)).cast("long").as("_m")
      )
      .select(
        col("period"),
        col("prev_period"),
        col("n_cur"),
        col("n_prev"),
        when(col("_m") <= 1, 0L)
          .otherwise(expr("_dsum * 1000000 div (n_cur * n_prev * (_m - 1))"))
          .cast("long")
          .as("emd_ppm")
      )
  }

  /** Wald's sequential probability ratio test (SPRT) per key over an
    * ordered boolean observation stream — the "decide as early as the
    * evidence allows" dual to fixed-horizon A/B tests (`q_ab_test_z`):
    * each observation adds a log-likelihood-ratio increment (x → llrPos =
    * ln(p1/p0), ¬x → llrNeg = ln((1−p1)/(1−p0))); the test stops at the
    * FIRST crossing of ±bound (= ln((1−β)/α) for symmetric error rates),
    * accepting H1 above, H0 below, else 'continue' at stream end.
    *
    * The increments and bound arrive as exact DECIMAL STRINGS — the
    * quantization is part of the operator contract, so the cumulative LLR
    * is an exact keyed decimal running sum and the crossing index is
    * bit-deterministic in any engine: no float accumulation, no libm at
    * run time. One keyed window (sort by the caller's order columns), one
    * min-struct aggregate for the first crossing, one max-struct for the
    * stream tail.
    *
    * @param obs   (keyCol, orderCols…, xCol BOOLEAN)
    * @return (key, decision 'h1'|'h0'|'continue', n_obs, llr)
    */
  def sprtDecision(
      obs: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      xCol: String,
      llrPos: String = "0.182321557",
      llrNeg: String = "-0.223143551",
      bound: String = "2.944438979"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val stepped = obs
      .withColumn(
        "_llr",
        when(col(xCol), lit(llrPos).cast("decimal(18,9)"))
          .otherwise(lit(llrNeg).cast("decimal(18,9)"))
      )
      .withColumn("_seq", row_number().over(w).cast("long"))
      .withColumn("_cum", sum(col("_llr")).over(w).cast("decimal(28,9)"))
    val b = lit(bound).cast("decimal(28,9)")
    val crossed = stepped.withColumn(
      "_dec",
      when(col("_cum") >= b, "h1").when(col("_cum") <= -b, "h0")
    )
    val first = crossed
      .filter(col("_dec").isNotNull)
      .groupBy(col(keyCol))
      .agg(min(struct(col("_seq"), col("_dec"), col("_cum"))).as("_f"))
      .select(
        col(keyCol),
        col("_f._seq").as("_fseq"),
        col("_f._dec").as("_fdec"),
        col("_f._cum").as("_fcum")
      )
    val tail = stepped
      .groupBy(col(keyCol))
      .agg(max(struct(col("_seq"), col("_cum"))).as("_l"))
      .select(col(keyCol), col("_l._seq").as("_lseq"), col("_l._cum").as("_lcum"))
    tail
      .join(first, Seq(keyCol), "left")
      .select(
        col(keyCol),
        coalesce(col("_fdec"), lit("continue")).as("decision"),
        coalesce(col("_fseq"), col("_lseq")).as("n_obs"),
        round(coalesce(col("_fcum"), col("_lcum")).cast("double"), 6).as("llr")
      )
  }

  /** @param step any FIXED-LENGTH Spark interval (days/hours/minutes/...);
    *   calendar intervals (month/year) have no constant micro-length and are
    *   rejected. Events are snapped to `start + k*step` for integer k — the
    *   exact timestamps `sequence(start, end, step)` generates — so any step
    *   and any (non-midnight) start align. Events after `end` are dropped;
    *   events before `start` do not appear in the output but DO seed the
    *   forward-fill, so the first grid buckets inherit the last pre-start
    *   observation instead of starting null.
    */
  def resampleFfill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      start: String,
      end: String,
      step: String = "interval 1 day"
  ): DataFrame = {
    require(
      !step.toLowerCase.matches(".*(month|year).*"),
      s"resampleFfill needs a fixed-length step; calendar interval '$step' is not"
    )
    // constant-folded scalars: step length in microseconds and the grid origin
    val stepUs = expr(s"unix_micros(timestamp'$start' + $step) - unix_micros(timestamp'$start')")
    val startUs = expr(s"unix_micros(timestamp'$start')")
    // floor-snap to the grid: pmod (not %) so pre-start events (negative
    // delta) still snap DOWN to their own bucket
    val deltaUs = unix_micros(col(tsCol)) - startUs
    val bucket = timestamp_micros(startUs + (deltaUs - pmod(deltaUs, stepUs)))

    val perBucket = events
      .filter(col(tsCol) <= expr(s"timestamp'$end' + $step")) // post-grid rows can never surface
      .groupBy(col(keyCol), bucket.as("_d"))
      // Bucket mean in EXACT integer arithmetic (1e-6 value units), rounded
      // HALF_UP to 4 dp via integer floor((units + 50·cnt) / (100·cnt)).
      // Two cross-engine hazards force this: (1) avg(double) is summation-
      // order-dependent (Spark partial agg vs a sequential oracle — observed
      // 2/45000 boundary flips at sf0.1); (2) even on identical doubles,
      // Spark's round() rounds the SHORTEST DECIMAL STRING of the double
      // (67.49124999…→"67.49125"→HALF_UP→67.4913) while engines that round
      // the binary value get 67.4912. Integers sidestep both. Non-negative
      // values assumed (floor == toward-zero); 1e-6 quantization is exact
      // for inputs with ≤6 decimal digits.
      .agg(
        count(lit(1)).as("_cnt"),
        sum((col(valueCol).cast("decimal(24,6)") * 1000000).cast("long")).as("_units")
      )
      .select(
        col(keyCol),
        col("_d"),
        col("_cnt"),
        (expr("(_units + _cnt * 50) div (_cnt * 100)").cast("double") / 10000.0).as("_avg")
      )
    val grid = events
      .select(col(keyCol))
      .distinct()
      .crossJoin(
        events.sparkSession
          .range(1)
          .select(
            explode(
              expr(s"sequence(timestamp'$start', timestamp'$end', $step)")
            ).as("_d")
          )
      )
    val onGrid = grid
      .join(perBucket.filter(col("_d") >= expr(s"timestamp'$start'")), Seq(keyCol, "_d"), "left")
      .withColumn("_on_grid", lit(true))
    // pre-start observations ride along (ordered before every grid bucket)
    // purely to seed the forward-fill window, then drop out of the output
    val preStart = perBucket
      .filter(col("_d") < expr(s"timestamp'$start'"))
      .select(col(keyCol), col("_d"), col("_cnt"), col("_avg"), lit(false).as("_on_grid"))
    val w = Window
      .partitionBy(keyCol)
      .orderBy("_d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    onGrid
      .select(col(keyCol), col("_d"), col("_cnt"), col("_avg"), col("_on_grid"))
      .union(preStart)
      .withColumn("_filled", last(col("_avg"), ignoreNulls = true).over(w))
      .filter(col("_on_grid"))
      .select(
        col(keyCol),
        // sub-daily steps need a sub-daily label or distinct buckets would
        // print identically
        date_format(
          col("_d"),
          if (step.toLowerCase.matches(".*(hour|min|sec).*")) "yyyy-MM-dd HH:mm:ss"
          else "yyyy-MM-dd"
        ).as("day"),
        coalesce(col("_cnt"), lit(0L)).as("cnt"),
        col("_filled").as("filled")
      )
  }
}
