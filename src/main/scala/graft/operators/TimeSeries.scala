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

  /** @param step e.g. "interval 1 day" — any Spark sequence step interval */
  def resampleFfill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      start: String,
      end: String,
      step: String = "interval 1 day"
  ): DataFrame = {
    val bucket = date_trunc("day", col(tsCol))
    val perBucket = events
      .groupBy(col(keyCol), bucket.as("_d"))
      .agg(count(lit(1)).as("_cnt"), round(avg(col(valueCol)), 4).as("_avg"))
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
    val w = Window
      .partitionBy(keyCol)
      .orderBy("_d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(perBucket, Seq(keyCol, "_d"), "left")
      .withColumn("_filled", last(col("_avg"), ignoreNulls = true).over(w))
      .select(
        col(keyCol),
        date_format(col("_d"), "yyyy-MM-dd").as("day"),
        coalesce(col("_cnt"), lit(0L)).as("cnt"),
        col("_filled").as("filled")
      )
  }
}
