package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** The IVM identity on synthetic fixtures: merge(state(slices)) must equal
  * state(union) — and the finalized report must equal a direct full-table
  * aggregation — for ANY slicing, including slices that miss some keys
  * entirely. (The sf-data entry `pipe_incr_agg` pins the same identity by
  * hash against DuckDB's full recompute.)
  */
class IncrementalAggSpec extends SparkSpec {

  private def rows(n: Int) = {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random values: key in 0..6, value from a hash mix
    (1 to n)
      .map(i => (i % 7, ((i * 2654435761L) % 1000).toInt, i))
      .toDF("k", "v", "slice_src")
  }

  test("merge of per-slice states equals the state of the union, any slicing") {
    val df = rows(500).cache()
    val keys = Seq("k")
    val slices = Seq(
      df.filter(col("slice_src") % 3 === 0),
      df.filter(col("slice_src") % 3 === 1),
      df.filter(col("slice_src") % 3 === 2)
    )
    val merged = IncrementalAgg
      .merge(slices.map(s => IncrementalAgg.state(s, keys, "v")), keys)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val full = IncrementalAgg
      .state(df, keys, "v")
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(merged == full)
  }

  test("keys missing from some slices still merge correctly") {
    val s = spark
    import s.implicits._
    val a = Seq((1, 10), (1, 20)).toDF("k", "v")
    val b = Seq((2, 5)).toDF("k", "v")
    val merged = IncrementalAgg
      .merge(Seq(IncrementalAgg.state(a, Seq("k"), "v"), IncrementalAgg.state(b, Seq("k"), "v")),
        Seq("k"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(merged(1) == ((2L, 30L, 10L, 20L)))
    assert(merged(2) == ((1L, 5L, 5L, 5L)))
  }

  test("state survives a parquet round trip: catch-up merge of persisted state == full recompute") {
    // the production IVM flow: yesterday's state lives on disk, today's run
    // reads it back, folds in the delta, and rewrites — snapshot parity must
    // hold across the persistence boundary, not just in one lineage
    withTempDir { dir =>
      val df = rows(400)
      val keys = Seq("k")
      val history = df.filter(col("slice_src") <= 300)
      val delta = df.filter(col("slice_src") > 300)
      IncrementalAgg.state(history, keys, "v").write.parquet(s"$dir/state")
      val loaded = spark.read.parquet(s"$dir/state")
      val caught = IncrementalAgg
        .merge(Seq(loaded, IncrementalAgg.state(delta, keys, "v")), keys)
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val full = IncrementalAgg
        .state(df, keys, "v")
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(caught == full)
    }
  }

  test("finalize TRUNCATES avg toward zero on NEGATIVE sums, matching DuckDB //") {
    val s = spark
    import s.implicits._
    val a = Seq((1, -3), (1, -4), (2, -5), (2, 2), (3, 7), (3, 2)).toDF("k", "v")
    val fin = IncrementalAgg
      .finalize(IncrementalAgg.state(a, Seq("k"), "v"), Seq("k"))
      .collect()
      .map(r => (r.getInt(0), r.getAs[Long]("avg_units")))
      .toMap
    // DuckDB 1.0 `//` truncates toward zero (verified: -7 // 2 = -3), same as
    // Spark `div`: trunc(-7/2) = -3 (NOT floor's -4); trunc(-3/2) = -1;
    // trunc(9/2) = 4. An earlier revision floored here and would have
    // diverged from the oracle by 1 on every inexact negative division.
    assert(fin == Map(1 -> -3L, 2 -> -1L, 3 -> 4L))
  }

  test("finalize derives avg as trunc(sum/cnt) and matches a direct aggregation") {
    val df = rows(300)
    val keys = Seq("k")
    val fin = IncrementalAgg
      .finalize(IncrementalAgg.state(df, keys, "v"), keys)
      .collect()
      .map(r =>
        (r.getInt(0),
          (r.getAs[Long]("cnt"), r.getAs[Long]("sum_units"), r.getAs[Long]("min_units"),
            r.getAs[Long]("max_units"), r.getAs[Long]("avg_units"))))
      .toMap
    val direct = df
      .groupBy("k")
      .agg(
        count(lit(1)).cast("long").as("cnt"),
        sum("v").cast("long").as("s"),
        min("v").cast("long").as("mn"),
        max("v").cast("long").as("mx")
      )
      .collect()
      .map(r =>
        (r.getInt(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(2) / r.getLong(1)))) // JVM / truncates — same as div and //
      .toMap
    assert(fin == direct)
  }

  test("deltaJoin: V_old ∪ ΔV equals the full join under two-sided inserts, no duplicates") {
    val s = spark
    import s.implicits._
    // R side: (orderkey, custkey); order 5 references customer 40, which only
    // arrives in the S delta — the R_old ⋈ ΔS term. Order 4 references
    // customer 30, ALSO delta-side on S — the ΔR ⋈ ΔS corner.
    val rOld = Seq((1L, 10L), (2L, 20L), (5L, 40L)).toDF("ok", "custkey")
    val rDelta = Seq((3L, 20L), (4L, 30L)).toDF("ok", "custkey")
    val sOld = Seq((10L, "A"), (20L, "B")).toDF("custkey", "seg")
    val sDelta = Seq((30L, "C"), (40L, "D")).toDF("custkey", "seg")
    val maintained = rOld
      .join(sOld, "custkey")
      .unionByName(IncrementalAgg.deltaJoin(rOld, rDelta, sOld, sDelta, Seq("custkey")))
      .select("ok", "custkey", "seg")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val full = rOld
      .unionByName(rDelta)
      .join(sOld.unionByName(sDelta), "custkey")
      .select("ok", "custkey", "seg")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(maintained.sorted.toSeq == full.sorted.toSeq) // bag equality — no dupes, none lost
    // each derivative term contributed: old⋈old (1), ΔR⋈S_old (3),
    // R_old⋈ΔS (5), ΔR⋈ΔS (4)
    val set = maintained.toSet
    assert(Seq((1L, 10L, "A"), (3L, 20L, "B"), (5L, 40L, "D"), (4L, 30L, "C")).forall(set))
  }

  test("deltaJoinSigned + applySignedDelta equal the post-churn recompute, compound cases cancel") {
    val s = spark
    import s.implicits._
    val rOld = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("ok", "custkey")
    val sOld = Seq((10L, "A"), (20L, "B"), (30L, "C")).toDF("custkey", "seg")
    // churn: insert order 4 (→ B); DELETE order 2 (→ B); DELETE order 3
    // AND its customer 30 in the SAME delta (the −1·−1 = +1 term must
    // cancel against the two single-sided −1s); insert order 5 referencing
    // customer 30 deleted in this very delta (must NOT appear: +1 against
    // old, −1 against the deletion, net 0)
    val rDelta = Seq((4L, 20L, 1L), (2L, 20L, -1L), (3L, 30L, -1L), (5L, 30L, 1L))
      .toDF("ok", "custkey", "mult")
    val sDelta = Seq((30L, "C", -1L)).toDF("custkey", "seg", "mult")
    val vOld = rOld.join(sOld, "custkey").select("ok", "custkey", "seg")
    val maintained = IncrementalAgg
      .applySignedDelta(
        vOld,
        IncrementalAgg.deltaJoinSigned(rOld, rDelta, sOld, sDelta, Seq("custkey"))
          .select("ok", "custkey", "seg", "mult"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // post-churn truth: R = {1→10, 4→20}, S = {10, 20}
    val full = Seq((1L, 10L), (4L, 20L)).toDF("ok", "custkey")
      .join(Seq((10L, "A"), (20L, "B")).toDF("custkey", "seg"), "custkey")
      .select("ok", "custkey", "seg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(maintained === full, s"maintained=$maintained full=$full")
    assert(!maintained.exists(_._1 == 5L), "order referencing a same-delta-deleted customer leaked")
  }

  test("retractable state: deletion deltas equal the post-deletion recompute; drained keys vanish") {
    val s = spark
    import s.implicits._
    val df = rows(400).withColumn("mult", lit(1L))
    val keys = Seq("k")
    // retract every 5th row; key 6 gets fully drained via a targeted pass
    val retro = df.filter(col("slice_src") % 5 === 0).withColumn("mult", lit(-1L))
    val drain = df.filter(col("k") === 6 && col("slice_src") % 5 =!= 0).withColumn("mult", lit(-1L))
    val fin = IncrementalAgg
      .finalizeSigned(
        IncrementalAgg.mergeSigned(
          Seq(
            IncrementalAgg.signedState(df, keys, "v", "mult"),
            IncrementalAgg.signedState(retro, keys, "v", "mult"),
            IncrementalAgg.signedState(drain, keys, "v", "mult")
          ), keys), keys)
      .collect()
      .map(r => (r.getInt(0), (r.getAs[Long]("cnt"), r.getAs[Long]("sum_units"), r.getAs[Long]("avg_units"))))
      .toMap
    val direct = rows(400)
      .filter(col("slice_src") % 5 =!= 0 && col("k") =!= 6)
      .groupBy("k")
      .agg(count(lit(1)).cast("long").as("c"), sum("v").cast("long").as("s"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(2) / r.getLong(1))))
      .toMap
    assert(fin == direct, s"fin=$fin direct=$direct")
    assert(!fin.contains(6), "fully-retracted key must leave the state")
  }

  test("topK state: merge of per-slice top-k equals top-k of the union, any slicing, ties held") {
    val s = spark
    import s.implicits._
    // duplicate values force the id tiebreak to decide membership at the cut
    val df = rows(300).withColumn("v2", col("v") % 50)
    val keys = Seq("k")
    val slices = Seq(
      df.filter(col("slice_src") % 3 === 0),
      df.filter(col("slice_src") % 3 === 1),
      df.filter(col("slice_src") % 3 === 2)
    )
    val merged = IncrementalAgg
      .mergeTopK(
        slices.map(sl => IncrementalAgg.topKState(sl, keys, "v2", "slice_src", 4)),
        keys, "v2", "slice_src", 4)
      .collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("slice_src"), r.getAs[Long]("rank")))
      .toSet
    val full = IncrementalAgg
      .topKState(df, keys, "v2", "slice_src", 4)
      .collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("slice_src"), r.getAs[Long]("rank")))
      .toSet
    assert(merged === full, s"merged=$merged full=$full")
    // a slice that misses a key entirely contributes nothing and harms nothing
    val withEmpty = IncrementalAgg.mergeTopK(
      Seq(IncrementalAgg.topKState(df, keys, "v2", "slice_src", 4),
        IncrementalAgg.topKState(df.filter(col("k") === -999), keys, "v2", "slice_src", 4)),
      keys, "v2", "slice_src", 4)
      .collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("slice_src"), r.getAs[Long]("rank")))
      .toSet
    assert(withEmpty === full)
  }
}
