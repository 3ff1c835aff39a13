package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark's join menu lacks (DuckDB/Pandas
  * `ASOF JOIN`): for every left row, attach the single right row with the
  * largest `rightTs <= leftTs` within the same key group.
  *
  * Built by composition (preference (a) of the custom-operator ladder — no
  * custom plan node needed): tag both sides, union, one shuffle on the key,
  * sort within partitions by (ts, tag), and carry the latest right payload
  * forward with `last(_, ignoreNulls)` over a running window. Right rows
  * sort before left rows on timestamp ties, so `<=` semantics hold exactly.
  *
  * Scale shape: ONE hash shuffle of |left| + |right| rows on the join key +
  * a within-partition sort — strictly cheaper than the naive
  * join-then-argmax (which shuffles the same data AND materializes every
  * candidate pair). Window state is one carried struct per key — O(1).
  * Inner semantics: left rows with no preceding right row are dropped
  * (matching DuckDB's default ASOF JOIN, which oracles this operator).
  */
object AsOfJoin {

  /** @param carry right-side columns delivered to matched left rows (read
    *              atomically from the single matched row via a carried struct)
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[String]
  ): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, carry, forward = false)

  /** Forward as-of join: for every left row, the single right row with the
    * SMALLEST `rightTs >= leftTs` per key — the mirror of [[asOfBackward]]
    * ("next reading after the event"). Identical one-shuffle union-sort-carry
    * plan; only the traversal direction flips (descending timestamps, so the
    * carried right row is always the nearest future one).
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[String]
  ): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, carry, forward = true)

  /** Nearest as-of join: for every left row, the right row minimizing
    * |rightTs − leftTs| per key, in EITHER direction — the sensor-alignment
    * shape ("closest reading to the event", not just the preceding one).
    *
    * One shuffle, two sorted passes over the same keyed partition: the
    * tagged union computes the nearest-preceding and nearest-following
    * candidate with two cumulative `last(ignoreNulls)` windows (ascending
    * and descending), then picks the closer by exact integer microsecond
    * distance. No candidate-pair materialization — same scale shape as the
    * directional variants.
    *
    * Determinism: distances are exact `unix_micros` integers; an exact tie
    * between directions resolves to the PRECEDING row, and equal-timestamp
    * candidates resolve by the carry struct itself (which leads with
    * `rightTs`, then the carry columns in declaration order) — so declare an
    * id column first in `carry` to pin total order. Timestamp columns only.
    *
    * @return left rows that matched in at least one direction, with
    *         `asof_<carry>` columns and `asof_dt_us` (absolute distance)
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // rightTs leads the struct: equal-distance same-direction ties order by
    // (cts, carry...) — the max struct wins in both window scans
    val carryStruct = struct((rightTs +: carry.filterNot(_ == rightTs)).map(col): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"), carryStruct.as("_carry")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*
    )
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(
          col(leftTs).as("_ts"),
          lit(1).as("_tag"),
          lit(null).cast(taggedRight.schema("_carry").dataType).as("_carry")
        ) ++
        leftCols.filterNot(keys.contains).map(col): _*
    )
    // _tag asc keeps right rows before the probe at equal timestamps in both
    // directions (inclusive <=/>=); _carry asc makes the max struct the one
    // last() carries for equal-timestamp right rows
    val wb = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_tag"), col("_carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").desc, col("_tag"), col("_carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ts = col("_ts")
    val dPrev = unix_micros(ts) - unix_micros(col(s"_prev.$rightTs"))
    val dNext = unix_micros(col(s"_next.$rightTs")) - unix_micros(ts)
    val pick = when(col("_next").isNull, col("_prev"))
      .when(col("_prev").isNull, col("_next"))
      .otherwise(when(dPrev <= dNext, col("_prev")).otherwise(col("_next")))
    taggedRight
      .unionByName(taggedLeft)
      .withColumn("_prev", last(col("_carry"), ignoreNulls = true).over(wb))
      .withColumn("_next", last(col("_carry"), ignoreNulls = true).over(wf))
      .filter(col("_tag") === 1 && (col("_prev").isNotNull || col("_next").isNotNull))
      .withColumn("_pick", pick)
      .select(
        leftCols.map(col) ++
          carry.map(c => col(s"_pick.$c").as(s"asof_$c")) :+
          abs(unix_micros(col(s"_pick.$rightTs")) - unix_micros(ts)).as("asof_dt_us"): _*
      )
  }

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[String],
      forward: Boolean
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct(carry.map(col): _*)

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"), carryStruct.as("_carry")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*
    )
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(
          col(leftTs).as("_ts"),
          lit(1).as("_tag"),
          lit(null).cast(taggedRight.schema("_carry").dataType).as("_carry")
        ) ++
        leftCols.filterNot(keys.contains).map(col): _*
    )

    // right rows (_tag 0) sort before left rows on timestamp ties in either
    // direction, so <= / >= inclusivity holds exactly
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("_ts").desc else col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight
      .unionByName(taggedLeft)
      .withColumn("_matched", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_matched").isNotNull)
      .select(
        leftCols.map(col) ++
          carry.map(c => col(s"_matched.$c").as(s"asof_$c")): _*
      )
  }
}
