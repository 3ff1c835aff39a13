package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier) — the rows no other row
  * dominates, maximizing both dimensions: q dominates p iff q.x ≥ p.x,
  * q.y ≥ p.y, and (q.x, q.y) ≠ (p.x, p.y). The multi-objective "best
  * trade-offs" query (freshest AND highest-value, cheapest AND closest)
  * relational engines answer with a quadratic NOT EXISTS — this operator
  * answers it with one aggregation and one near-metadata window.
  *
  * Shape (the sweep-line identity): a point survives iff y = max y of its
  * x-group AND that group max strictly exceeds every y at strictly greater
  * x. So:
  *
  *   1. group by x → per-x max y                    (one keyed shuffle,
  *      |distinct x| rows — the only data-sized exchange)
  *   2. strict-prefix max over x DESC, two-phase: range-partition the
  *      group frame, per-partition ROWS window (one row per x — a ROWS
  *      frame IS the strictly-greater set), plus a partition-boundary
  *      prefix max computed over the ≤-#partitions per-partition summary
  *      (the `globalRowNumber` offset pattern; no single-reducer window
  *      ever sees data-sized input)
  *   3. equi-join survivors back on x; keep rows with y = group max
  *      (duplicate (x, y) points tie — none dominates the other — and all
  *      survive, matching the NOT EXISTS definition exactly)
  *
  * Rows with a null in either dimension are excluded (dominance is
  * undefined against null). Works for any orderable column types.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val in = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = in.groupBy(col(xCol).as("_sx")).agg(max(col(yCol)).as("_my"))
    // two-phase strict-prefix max over x desc: equal x collapsed above, so
    // a ROWS (unbounded, -1) frame inside each range partition is exactly
    // "strictly greater x within my partition"; earlier partitions hold
    // strictly greater x by range-partitioning, folded in via the
    // metadata-sized per-partition summary window.
    val sorted = g
      .repartitionByRange(col("_sx").desc)
      .sortWithinPartitions(col("_sx").desc)
      .withColumn("_gpid", spark_partition_id())
      .localCheckpoint()
    val pm = sorted.groupBy("_gpid").agg(max("_my").as("_pm"))
    // strict-prefix max across partition summaries WITHOUT a global window
    // (a no-PARTITION-BY window is the one shape PlanAudit errors on, even
    // over this metadata-sized frame): a theta self-join over the ≤
    // shuffle-partitions summary rows — bounded by cluster width, not data.
    val prev = pm
      .select(col("_gpid"))
      .join(
        broadcast(pm.select(col("_gpid").as("_bpid"), col("_pm"))),
        col("_bpid") < col("_gpid"),
        "left"
      )
      .groupBy("_gpid")
      .agg(max("_pm").as("_prevpm"))
    val wLocal = Window
      .partitionBy("_gpid")
      .orderBy(col("_sx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = sorted
      .withColumn("_localpm", max("_my").over(wLocal))
      .join(broadcast(prev), Seq("_gpid"))
      .withColumn(
        "_best",
        when(col("_localpm").isNull, col("_prevpm"))
          .when(col("_prevpm").isNull, col("_localpm"))
          .otherwise(greatest(col("_localpm"), col("_prevpm")))
      )
      .filter(col("_best").isNull || col("_my") > col("_best"))
      .select("_sx", "_my")
    in.join(
        survivors,
        col(xCol) === col("_sx") && col(yCol) === col("_my")
      )
      .select(in.columns.map(col): _*)
  }
}
