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

  test("profiled testdata numeric extremes stay in Double.toString's plain-notation window") {
    // the cross-engine string contract for double min/max (see the operator
    // scaladoc) requires |x| in [1e-3, 1e7) or exactly 0 — scientific
    // notation would diverge from the oracle's CAST AS VARCHAR rendering
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val out = Profiling
      .profile(orders, Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
      .collect()
    out.foreach { r =>
      for (i <- Seq(4, 5)) {
        val v = r.getString(i)
        assert(v == null || !v.matches(".*\\d[Ee][+-]?\\d.*"),
          s"scientific notation leaked into profile output: $v")
      }
    }
  }

  test("profile plans two passes crossed as 1-row relations, never a cartesian") {
    val df = Seq((1, "a"), (2, "b")).toDF("i", "s")
    val plan = Profiling.profile(df, Seq("i", "s")).queryExecution.executedPlan.toString
    // the count/distinct and min/max passes join as 1-row broadcast
    // relations; a CartesianProduct would mean a real data-by-data cross
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("quality checks count violations exactly and pass only when clean") {
    import graft.operators.QualityChecks
    val df = Seq(
      (Some(1L), Some("O"), 10.0),
      (Some(1L), Some("F"), -5.0), // dup key + negative price
      (Some(2L), Some("X"), 3.0),  // bad status
      (None, None, 0.0)            // null key + null status + zero price
    ).toDF("k", "status", "price")
    val parent = Seq(1L).toDF("pk") // 2 and null are orphans (anti join skips null)
    val out = QualityChecks
      .reportAll(Seq(
        QualityChecks.unique(df, "k"),
        QualityChecks.nonNull(df, "k"),
        QualityChecks.acceptedValues(df, "status", Seq("O", "F", "P")),
        QualityChecks.expression(df, "positive_price", col("price") > 0),
        QualityChecks.referential(df, "k", parent, "pk")
      ))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("unique_k") === ((2L, false))) // 4 rows - 2 distinct non-null (dup + null)
    assert(out("non_null_k") === ((1L, false)))
    assert(out("accepted_values_status") === ((2L, false))) // 'X' + null
    assert(out("positive_price") === ((2L, false))) // -5 and 0
    assert(out("fk_k_in_pk") === ((2L, false))) // k=2 orphan + null (anti join keeps it)
    // a clean table passes everything
    val clean = Seq((Some(1L), Some("O"), 10.0)).toDF("k", "status", "price")
    val cleanOut = QualityChecks
      .reportAll(Seq(
        QualityChecks.unique(clean, "k"),
        QualityChecks.acceptedValues(clean, "status", Seq("O")),
        QualityChecks.referential(clean, "k", parent, "pk")
      ))
      .collect()
    assert(cleanOut.forall(_.getBoolean(2)), cleanOut.mkString(","))
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

  test("hbosScores: rare-bin rows score highest, exact -ln sum") {
    val s = spark
    import s.implicits._
    // feature a: 9× bin 0, 1× bin 1; feature b: uniform (no signal)
    val df = (0 until 10).map(i => (i.toLong, if (i == 9) 1L else 0L, i.toLong % 2))
      .toDF("id", "fa", "fb")
    val out = graft.operators.QualityChecks.hbosScores(df, "id", Seq("fa", "fb"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("hbos")).toMap
    // row 9: -ln(1/10) - ln(5/10); others: -ln(9/10) - ln(5/10)
    val rare = math.rint((-math.log(0.1) - math.log(0.5)) * 1e6) / 1e6
    val common = math.rint((-math.log(0.9) - math.log(0.5)) * 1e6) / 1e6
    assert(math.abs(out(9L) - rare) < 2e-6, out.toString)
    assert(math.abs(out(0L) - common) < 2e-6, out.toString)
    assert(out(9L) > out(0L))
  }

  test("cohensKappa: hand confusion table, perfect and constant labelers") {
    val s = spark
    import s.implicits._
    // n11=4, n00=3, n10=2, n01=1 → po=0.7, pe=(6·5+4·5)/100=0.5, κ=0.4
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(3)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(1)((false, true))).toDF("a", "b")
    val r = graft.operators.QualityChecks.cohensKappa(df, "a", "b").collect().head
    assert(r.getAs[Long]("po_ppm") == 700000L, r.toString)
    assert(r.getAs[Long]("pe_ppm") == 500000L, r.toString)
    assert(r.getAs[Long]("kappa_ppm") == 400000L, r.toString)
    // perfect agreement with mixed marginals → κ = 1
    val perfect = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    assert(graft.operators.QualityChecks.cohensKappa(perfect, "a", "b")
      .collect().head.getAs[Long]("kappa_ppm") == 1000000L)
    // two constant labelers: pe = 1, κ defined to 0 (not a crash)
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    assert(graft.operators.QualityChecks.cohensKappa(const, "a", "b")
      .collect().head.getAs[Long]("kappa_ppm") == 0L)
    // empty frame: vacuous agreement reports zeros, no division by zero
    val empty = graft.operators.QualityChecks
      .cohensKappa(const.filter(lit(false)), "a", "b").collect().head
    assert(empty.getAs[Long]("n") == 0L && empty.getAs[Long]("kappa_ppm") == 0L, empty.toString)
  }
}
