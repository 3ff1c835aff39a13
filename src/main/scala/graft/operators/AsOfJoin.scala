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
