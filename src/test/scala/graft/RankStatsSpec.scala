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
      itemsPerOrder: Map[Long, Int] = Map.empty
  ): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rank").toString
    orders
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d")))
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
}
