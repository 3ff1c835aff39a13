package graft

import org.apache.spark.sql.functions._

/** Ground-truth checks for the rank-statistics batch (Spearman ρ, Kendall
  * τ-b, Mann-Kendall, inter-purchase gaps) on crafted order tables small
  * enough to verify by hand — the driver oracle proves cross-engine
  * equality; these prove the SEMANTICS (midrank ties, tie-corrected
  * concordance denominators, continuity-corrected Z, gap bucketing).
  */
class RankStatsSpec extends SparkSpec {

  /** Crafted orders (+ lineitem) dir shaped like the testdata layout. */
  private def ordersDir(
      orders: Seq[(Long, Long, Double, String, String)], // key, cust, price, date, priority
      itemsPerOrder: Map[Long, Int] = Map.empty,
      statusOf: Map[Long, String] = Map.empty
  ): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rank").toString
    val status = udf((k: Long) => statusOf.getOrElse(k, "F"))
    orders
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d")))
      .withColumn("o_orderstatus", status(col("o_orderkey")))
      .drop("d")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val li = orders.flatMap { case (k, _, _, _, _) =>
      Seq.fill(itemsPerOrder.getOrElse(k, 1))(k)
    }
    li.toDF("l_orderkey").write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q_spearman_rank: monotone=1, antitone=-1, midrank ties exact") {
    val dir = ordersDir(
      Seq(
        // priority A: items rise with price → ρ = 1
        (1L, 1L, 1.0, "1994-01-01", "A"),
        (2L, 1L, 2.0, "1994-01-02", "A"),
        (3L, 1L, 3.0, "1994-01-03", "A"),
        // priority B: items fall as price rises → ρ = −1
        (4L, 1L, 1.0, "1994-01-04", "B"),
        (5L, 1L, 2.0, "1994-01-05", "B"),
        (6L, 1L, 3.0, "1994-01-06", "B"),
        // priority C: tied prices take midranks → ρ = √3/2
        (7L, 1L, 1.0, "1994-01-07", "C"),
        (8L, 1L, 1.0, "1994-01-08", "C"),
        (9L, 1L, 2.0, "1994-01-09", "C")
      ),
      itemsPerOrder =
        Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 3, 5L -> 2, 6L -> 1, 7L -> 1, 8L -> 2, 9L -> 3)
    )
    val out = SparkEntry
      .queries("q_spearman_rank")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(2))
      .toMap
    assert(math.abs(out("A") - 1.0) < 1e-12)
    assert(math.abs(out("B") + 1.0) < 1e-12)
    assert(math.abs(out("C") - math.sqrt(3.0) / 2) < 1e-12)
  }

  test("q_kendall_tau: tie-corrected τ-b on a hand-checked month series") {
    // months: rev = [100, 400, 900, 100] cents, cnt = [1, 2, 3, 2]
    // pairs: C=4, D=0, tx=1 (rev tie), ty=1 (cnt tie) → τ-b = 4/√(5·5) = 0.8
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-15", "A"),
        (2L, 1L, 2.0, "1994-02-10", "A"),
        (3L, 2L, 2.0, "1994-02-20", "A"),
        (4L, 1L, 3.0, "1994-03-05", "A"),
        (5L, 2L, 3.0, "1994-03-15", "A"),
        (6L, 3L, 3.0, "1994-03-25", "A"),
        (7L, 1L, 0.5, "1994-04-10", "A"),
        (8L, 2L, 0.5, "1994-04-20", "A")
      )
    )
    val r = SparkEntry.queries("q_kendall_tau")(spark, dir).collect()(0)
    assert(r.getLong(0) == 6L) // n_pairs
    assert(r.getLong(1) == 4L) // concordant
    assert(r.getLong(2) == 0L) // discordant
    assert(math.abs(r.getDouble(3) - 0.8) < 1e-12)
  }

  test("q_mann_kendall: S, tie-corrected variance and Z on a known series") {
    // distinct customers per month: [1, 2, 3, 2] → S = 3; tie run t=2 →
    // 18·Var = 4·3·13 − 2·1·9 = 138; Z = (3−1)/√(138/18)
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-15", "A"),
        (2L, 1L, 2.0, "1994-02-10", "A"),
        (3L, 2L, 2.0, "1994-02-20", "A"),
        (4L, 1L, 3.0, "1994-03-05", "A"),
        (5L, 2L, 3.0, "1994-03-15", "A"),
        (6L, 3L, 3.0, "1994-03-25", "A"),
        (7L, 1L, 0.5, "1994-04-10", "A"),
        (8L, 2L, 0.5, "1994-04-20", "A")
      )
    )
    val r = SparkEntry.queries("q_mann_kendall")(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L) // n months
    assert(r.getLong(1) == 3L) // S
    assert(r.getLong(2) == 138L) // 18·Var
    assert(math.abs(r.getDouble(3) - 2.0 / math.sqrt(138.0 / 18)) < 1e-12)
  }

  test("q_interpurchase_gaps: gaps bucket by floor week, singletons drop") {
    // customer 1 orders on days 0, 10, 24 → gaps 10 (week 1), 14 (week 2);
    // customer 2 has one order → contributes nothing
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1970-01-01", "A"),
        (2L, 1L, 1.0, "1970-01-11", "A"),
        (3L, 1L, 1.0, "1970-01-25", "A"),
        (4L, 2L, 1.0, "1970-01-06", "A")
      )
    )
    val out = SparkEntry
      .queries("q_interpurchase_gaps")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(1L -> ((1L, 10L)), 2L -> ((1L, 14L))))
  }

  test("q_cramers_v: perfect association and independence, fixed-point exact") {
    // The entry's divisor min(r−1,c−1)=2 is the production 5×3 table's —
    // these crafted 2×2 tables validate the χ² fixed-point mechanics.
    // Perfect 2×2 association: χ² = N → chi2_ppm = N·10⁶
    val dirAssoc = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-01", "A"),
        (2L, 1L, 1.0, "1994-01-02", "A"),
        (3L, 1L, 1.0, "1994-01-03", "B"),
        (4L, 1L, 1.0, "1994-01-04", "B")
      ),
      statusOf = Map(1L -> "X", 2L -> "X", 3L -> "Y", 4L -> "Y")
    )
    val r1 = SparkEntry.queries("q_cramers_v")(spark, dirAssoc).collect()(0)
    assert(r1.getLong(1) == 4000000L)
    assert(math.abs(r1.getDouble(2) - math.sqrt(0.5)) < 1e-12)
    // independence: every cell 1 → χ² = 0 exactly (no truncation residue)
    val dirInd = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-01", "A"),
        (2L, 1L, 1.0, "1994-01-02", "A"),
        (3L, 1L, 1.0, "1994-01-03", "B"),
        (4L, 1L, 1.0, "1994-01-04", "B")
      ),
      statusOf = Map(1L -> "X", 2L -> "Y", 3L -> "X", 4L -> "Y")
    )
    val r2 = SparkEntry.queries("q_cramers_v")(spark, dirInd).collect()(0)
    assert(r2.getLong(1) == 0L)
    assert(r2.getDouble(2) == 0.0)
  }

  test("q_kaplan_meier: risk sets, events and the integer survival fold") {
    // c1: second order at week 1 (event); c2: at week 3 (event);
    // c3: single order, censored at the horizon (day 21 → week 3).
    // S(1) = 2/3 → 666666666666; S(3) = S(1)·1/2 → 333333333333.
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1970-01-01", "A"),
        (2L, 1L, 1.0, "1970-01-08", "A"),
        (3L, 2L, 1.0, "1970-01-01", "A"),
        (4L, 2L, 1.0, "1970-01-22", "A"),
        (5L, 3L, 1.0, "1970-01-01", "A")
      )
    )
    val out = SparkEntry
      .queries("q_kaplan_meier")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(
      out == Set((1L, 3L, 1L, 666666666666L), (3L, 2L, 1L, 333333333333L)),
      out.toString
    )
  }

  test("q_iqr_outlier_fence: exact quartile picks and doubled-fence counts") {
    // cents 100..10000 step 100 plus outliers at -20000 and 40000 (n=102):
    // Q1 = rank ⌈102/4⌉=26 → 2500¢, Q3 = rank ⌈306/4⌉=77 → 7600¢,
    // IQR = 5100 → fences [-5150, 15250] → 1 low, 1 high
    val rows = (1 to 100).map(i => (i.toLong, 1L, i.toDouble, "1994-01-01", "A")) ++
      Seq((101L, 1L, -200.0, "1994-01-02", "A"), (102L, 1L, 400.0, "1994-01-03", "A"))
    val dir = ordersDir(rows)
    val r = SparkEntry.queries("q_iqr_outlier_fence")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        (("A", 102L, 2500L, 7600L, 1L, 1L)),
      r.toString
    )
  }

  test("q_cohort_ltv: cumulative spend over the fixed cohort denominator") {
    // cohort 1994-01 (2 customers): age 0 revenue 600¢, age 2 revenue 200¢
    // → LTV 300000 then 400000 milli-cents per customer
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-10", "A"),
        (2L, 1L, 2.0, "1994-03-15", "A"),
        (3L, 2L, 5.0, "1994-01-20", "A")
      )
    )
    val out = SparkEntry
      .queries("q_cohort_ltv")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(
      out == Set(("1994-01", 0L, 2L, 300000L), ("1994-01", 2L, 2L, 400000L)),
      out.toString
    )
  }

  test("q_growth_accounting: new/retained/resurrected/churned hand-checked") {
    // c1 active Jan, Feb, Apr; c2 active Jan only
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-10", "A"),
        (2L, 1L, 1.0, "1994-02-10", "A"),
        (3L, 1L, 1.0, "1994-04-10", "A"),
        (4L, 2L, 1.0, "1994-01-20", "A")
      )
    )
    val out = SparkEntry
      .queries("q_growth_accounting")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(
      out == Map(
        ("1994-01", "new") -> 2L,
        ("1994-02", "retained") -> 1L,
        ("1994-02", "churned") -> 1L,
        ("1994-03", "churned") -> 1L,
        ("1994-04", "resurrected") -> 1L,
        ("1994-05", "churned") -> 1L
      ),
      out.toString
    )
    // MAU identity: new + retained + resurrected = distinct active customers
    val jan = out.collect { case ((m, s), c) if m == "1994-01" && s != "churned" => c }.sum
    assert(jan == 2L)
  }

  test("q_cumulative_reach: first-seen collapse and running total") {
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-10", "A"),
        (2L, 1L, 1.0, "1994-02-10", "A"),
        (3L, 2L, 1.0, "1994-01-20", "A"),
        (4L, 3L, 1.0, "1994-04-05", "A")
      )
    )
    val out = SparkEntry
      .queries("q_cumulative_reach")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set(("1994-01", 2L, 2L), ("1994-04", 1L, 3L)), out.toString)
  }

  test("q_runs_test: runs count, median drop, and the closed-form z") {
    // monthly cents [100,500,200,600,300]: median 300 drops May;
    // signs [0,1,0,1] → runs 4, n1 = n2 = 2
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-10", "A"),
        (2L, 1L, 5.0, "1994-02-10", "A"),
        (3L, 1L, 2.0, "1994-03-10", "A"),
        (4L, 1L, 6.0, "1994-04-10", "A"),
        (5L, 1L, 3.0, "1994-05-10", "A")
      )
    )
    val r = SparkEntry.queries("q_runs_test")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 4L)))
    val expZ = (4.0 - (8.0 / 4 + 1)) / math.sqrt(8.0 * (8.0 - 4) / (4.0 * 4) / 3)
    assert(math.abs(r.getDouble(3) - expZ) < 1e-12)
  }

  test("q_ks_two_sample: exact rational D on a hand-laid pooled sequence") {
    // urgent [100, 300]¢ vs other [200, 400]¢ → D = 1/2 → 500000 ppm
    val dir = ordersDir(
      Seq(
        (1L, 1L, 1.0, "1994-01-05", "1-URGENT"),
        (2L, 1L, 3.0, "1994-01-10", "1-URGENT"),
        (3L, 1L, 2.0, "1994-01-15", "5-LOW"),
        (4L, 1L, 4.0, "1994-01-20", "5-LOW")
      )
    )
    val r = SparkEntry.queries("q_ks_two_sample")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        (("1994-01", 2L, 2L, 500000L))
    )
  }

  test("q_hill_tail_index: ladder-exact alpha on a two-level tail") {
    // 100 customers at $2, the rank-101 threshold at $1, one below at $0.5
    val rows = (1L to 100L).map(k => (k, k, 2.0, "1994-01-05", "A")) ++
      Seq((101L, 101L, 1.0, "1994-01-06", "A"), (102L, 102L, 0.5, "1994-01-07", "A"))
    val dir = ordersDir(rows)
    val r = SparkEntry.queries("q_hill_tail_index")(spark, dir).collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 100L)
    val term = BigDecimal(math.log(2.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val exp = BigDecimal(100.0 / (term * 100).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(math.abs(r.getDouble(2) - exp) < 1e-9, s"${r.getDouble(2)} vs $exp")
  }

  test("txt_kl_sources: ladder-exact KL against a hand-built two-source corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kl").toString
    Seq((1L, "a a b", "S1"), (2L, "a b b b", "S2"))
      .toDF("doc_id", "text", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def ladder(terms: Seq[Double]): Double = {
      val q = terms.map(t => BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      BigDecimal(q.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expS1 = ladder(
      Seq(2.0 / 3 * math.log((2.0 / 3) / (3.0 / 7)), 1.0 / 3 * math.log((1.0 / 3) / (4.0 / 7)))
    )
    val expS2 = ladder(
      Seq(1.0 / 4 * math.log((1.0 / 4) / (3.0 / 7)), 3.0 / 4 * math.log((3.0 / 4) / (4.0 / 7)))
    )
    val out = SparkEntry
      .queries("txt_kl_sources")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(math.abs(out("S1") - expS1) < 1e-9, s"${out("S1")} vs $expS1")
    assert(math.abs(out("S2") - expS2) < 1e-9, s"${out("S2")} vs $expS2")
  }
}
