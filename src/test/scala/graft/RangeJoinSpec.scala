package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("bucketized range join equals the naive inequality join, any bin width") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 15.0), (5L, 25.0), (6L, 29.999), (7L, 30.0))
      .toDF("pid", "v")
    val intervals = Seq(
      (100L, 0.0, 10.0),   // ends ON a bin boundary: 10.0 excluded
      (101L, 5.0, 25.0),   // spans 3 bins
      (102L, 29.0, 29.5),  // sub-bin interval
      (103L, 40.0, 40.0),  // empty (lo == hi) → matches nothing
      (104L, 50.0, 45.0)   // inverted → matches nothing
    ).toDF("iid", "lo", "hi")
    for (w <- Seq(1.0, 7.0, 10.0, 100.0)) {
      val got = RangeJoin
        .pointIntervalJoin(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = points
        .join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(got == naive, s"width $w: $got vs $naive")
    }
    // spot-check semantics: lo inclusive, hi exclusive
    val m = RangeJoin
      .pointIntervalJoin(points, "v", intervals, "lo", "hi", 10.0)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(m.contains((1L, 100L)) && !m.contains((3L, 100L))) // 0.0 in, 10.0 out
    assert(m.contains((4L, 101L)) && !m.contains((5L, 102L)))
  }

  test("interval overlap join equals the naive inequality join, exactly once per pair") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 0.0, 35.0), (2L, 10.0, 12.0), (3L, 40.0, 41.0), (4L, 50.0, 50.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 5.0, 45.0), (11L, 11.0, 11.5), (12L, 34.9, 40.0), (13L, 60.0, 70.0))
      .toDF("bid", "blo", "bhi")
    for (w <- Seq(1.0, 10.0, 100.0)) {
      val got = RangeJoin
        .intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = a
        .join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("aid", "bid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      // multiset equality: each overlapping pair appears EXACTLY once (the
      // shared-bin fan-out is collapsed by the first-shared-bin residual)
      assert(got.length == got.toSet.size, s"width $w produced duplicate pairs")
      assert(got.toSet == naive, s"width $w: ${got.toSet} vs $naive")
    }
    // sanity on the fixture: the wide pair (1,10) shares many bins at w=1
    val once = RangeJoin
      .intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi", 1.0)
      .filter(col("aid") === 1L && col("bid") === 10L)
    assert(once.count() == 1)
  }

  test("range join entry plans an equi-join on the bin, not a nested loop") {
    val df = SparkEntry.queries("q_range_join_bands")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
