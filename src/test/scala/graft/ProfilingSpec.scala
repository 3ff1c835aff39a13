package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.queries.StatQueries

/** Profiling operator semantics on a hand-built table with nulls and
  * duplicates, plus outlier-entry sanity at sf0.001.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports rows, nulls, distincts and stringified min/max per column") {
    val df = Seq(
      (Some(1), Some("a"), Some(2.5)),
      (Some(1), None, Some(2.5)),
      (Some(3), Some("b"), None),
      (None, Some("b"), Some(-1.0))
    ).toDF("i", "s", "x")
    val out = Profiling
      .profile(df, Seq("i", "s", "x"))
      .collect()
      .map(r =>
        r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      )
      .toMap
    assert(out("i") === ((4L, 1L, 2L, "1", "3")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    assert(out("x") === ((4L, 1L, 2L, "-1.0", "2.5")))
  }

  test("profile plans two passes crossed as 1-row relations, never a cartesian") {
    val df = Seq((1, "a"), (2, "b")).toDF("i", "s")
    val plan = Profiling.profile(df, Seq("i", "s")).queryExecution.executedPlan.toString
    // the count/distinct and min/max passes join as 1-row broadcast
    // relations; a CartesianProduct would mean a real data-by-data cross
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_zscore_outliers only emits rows beyond the 3-sigma cut") {
    val out = StatQueries.entries
      .find(_.name == "q_zscore_outliers")
      .get
      .run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getAs[Double]("z")) >= 3.0, r.toString))
  }
}
