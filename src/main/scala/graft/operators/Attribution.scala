package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-driven Shapley attribution (Shapley 1953 applied to conversion
  * credit): each channel's credit is its average marginal contribution to
  * the observed conversion rate across ALL orderings of the channel set —
  * the only attribution rule that is efficient (credits sum to
  * v(all) − v(∅)), symmetric, and null-player-zero at once. Rule-based
  * credits (first/last-touch, linear — see `q_attribution_credit`) answer
  * "which rule did we pick"; Shapley answers "what did the channel DO".
  *
  * The characteristic function is estimated from data: v(S) = conversion
  * rate among users whose exposed-channel set is exactly S (exact integer
  * ppm; unobserved coalitions contribute v = 0, the standard data-driven
  * convention — with the standard caveat that a channel NOBODY is exposed
  * to soaks negative credit through the zeroed v(S∪i) terms, so pass only
  * channels with observed exposure). With n channels the whole computation
  * after one per-user aggregate lives on the 2ⁿ-row coalition table — n is
  * the CHANNEL count (single digits in any real funnel), so the factorial
  * weights are exact literals and the grid is driver-free broadcast
  * arithmetic.
  */
object Attribution {

  private def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  /** Per-channel Shapley credit from raw events, exposure = PRESENCE of the
    * channel type in the user's stream (the textbook definition). For a
    * different exposure notion (thresholds, over-representation, windows),
    * derive the per-user booleans yourself and call
    * [[shapleyCreditFromExposures]] — the math is identical.
    */
  def shapleyCredit(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      channels: Seq[String],
      convType: String
  ): DataFrame = {
    require(!channels.contains(convType), "the conversion type is not a channel")
    val aggs = channels.map { c =>
      (max(when(col(typeCol) === c, 1L).otherwise(0L)) === 1L).as(c)
    } :+ (max(when(col(typeCol) === convType, 1L).otherwise(0L)) === 1L).as("_conv")
    val exposures = events.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    shapleyCreditFromExposures(exposures, channels, "_conv")
  }

  /** Per-channel Shapley credit over per-user exposure booleans.
    *
    * Cost shape: the per-user frame is the only data-sized input (one
    * user-keyed partial aggregate upstream produced it); here everything
    * lives on the 2ⁿ-row coalition rollup and a (n·2ⁿ⁻¹)-row broadcast
    * grid for the marginal sums.
    *
    * @param channelCols boolean exposure columns (bit i of the mask);
    *                    n ≤ 16 keeps the coalition table ≤ 65536 rows
    * @param convCol     boolean conversion column
    * @return one row per channel: (channel, phi_ppm, exposed_users) —
    *         phi sums to v(full) − v(∅) up to n integer-division ulps
    */
  def shapleyCreditFromExposures(
      exposures: DataFrame,
      channelCols: Seq[String],
      convCol: String
  ): DataFrame = {
    val n = channelCols.size
    require(n >= 1 && n <= 16, "channel count must be in [1, 16]")
    val spark = exposures.sparkSession
    import spark.implicits._
    val channels = channelCols

    val userMask = exposures.select(
      channelCols.zipWithIndex
        .map { case (c, i) => when(col(c), 1L << i).otherwise(0L) }
        .reduce(_ + _)
        .as("mask"),
      when(col(convCol), 1L).otherwise(0L).as("_c")
    )
    val v = userMask
      .groupBy(col("mask"))
      .agg(count(lit(1)).cast("long").as("nu"), sum(col("_c")).cast("long").as("cu"))
      .select(col("mask"), expr("cu * 1000000L div nu").cast("long").as("v_ppm"), col("nu"))
      .localCheckpoint() // ≤ 2^n rows; read three times below

    val chans = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }
      .toDF("channel", "bit")
    val masks = spark.range(1L << n).select(col("id").as("s"))
    // factorial weight numerators by coalition size: s!·(n−1−s)!
    val wCase = (0 until n)
      .map(s => s"WHEN ${s}L THEN ${fact(s) * fact(n - 1 - s)}L")
      .mkString("CASE bit_count(s) ", " ", " END")
    val grid = broadcast(chans)
      .crossJoin(broadcast(masks))
      .filter((col("s").bitwiseAND(col("bit"))) === 0L)
      .join(broadcast(v.select(col("mask").as("s"), col("v_ppm").as("_v0"))), Seq("s"), "left")
      .join(
        broadcast(v.select(col("mask").as("_m1"), col("v_ppm").as("_v1"))),
        col("_m1") === col("s") + col("bit"),
        "left"
      )
      .na
      .fill(0L, Seq("_v0", "_v1"))
      .withColumn("_wn", expr(wCase).cast("long"))
    val phi = grid
      .groupBy(col("channel"))
      .agg(sum((col("_v1") - col("_v0")) * col("_wn")).cast("long").as("_num"))
      .select(col("channel"), expr(s"_num div ${fact(n)}L").cast("long").as("phi_ppm"))
    val exposed = broadcast(chans)
      .join(v, (col("mask").bitwiseAND(col("bit"))) =!= 0L)
      .groupBy(col("channel"))
      .agg(sum(col("nu")).cast("long").as("exposed_users"))
    phi
      .join(exposed, Seq("channel"), "left")
      .na
      .fill(0L, Seq("exposed_users"))
  }
}
