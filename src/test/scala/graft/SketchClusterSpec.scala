package graft

import org.apache.spark.sql.functions._

/** Ground truth for the deterministic-HLL, record-linkage and k-means-step
  * entries: the HLL registers/estimate are replayed by an independent Scala
  * mirror, the linkage histogram is hand-computed, and the Lloyd step is
  * checked against its invariants (self-assignment, zero inertia on a
  * seeds-only corpus, member conservation).
  */
class SketchClusterSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("q_hll_estimate matches an independent Scala replay of the sketch") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val keys = (1L to 500L)
    keys
      .map(k => (k, "1994-06-01"))
      .toDF("o_orderkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")

    // independent mirror: 13-hex-char md5 hash, m=64, rho over low 46 bits
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    keys.foreach { k =>
      val hv = java.lang.Long.parseLong(md5hex(k.toString).substring(0, 13), 16)
      val idx = hv / 70368744177664L
      val w = hv % 70368744177664L
      val rho = if (w == 0L) 47 else 47 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(idx) = math.max(regs.getOrElse(idx, 0), rho)
    }
    val zn = regs.values.map(m => 1L << (47 - m)).sum +
      (64L - regs.size) * 140737488355328L
    val est = (BigInt(2904064) * BigInt(140737488355328L) / (BigInt(1000) * BigInt(zn))).toLong
    val errPpm = (est - 500L) * 1000000L / 500L

    val r = SparkEntry.queries("q_hll_estimate")(spark, dir).collect()(0)
    assert(r.getString(0) == "1994")
    assert(r.getLong(1) == 500L)
    assert(r.getLong(2) == est, s"entry ${r.getLong(2)} vs mirror $est")
    assert(r.getLong(3) == errPpm)
  }

  test("q_record_linkage: hand-computed agreement-score histogram") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_link").toString
    // nation 1 / segment S, band 0: ck1 ($100, 2 orders 1994),
    // ck2 ($150, 2 orders 1995), ck5 ($100, no orders); ck3 sits in band 2,
    // ck4 in another nation → pairs (1,2)=40, (1,5)=32, (2,5)=32
    Seq(
      (1L, 1, 100.0, "S"),
      (2L, 1, 150.0, "S"),
      (3L, 1, 5000.0, "S"),
      (4L, 2, 100.0, "S"),
      (5L, 1, 100.0, "S")
    ).toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write
      .mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, "1994-02-01"),
      (11L, 1L, "1994-07-01"),
      (12L, 2L, "1995-03-01"),
      (13L, 2L, "1995-08-01")
    ).toDF("o_orderkey", "o_custkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val out = SparkEntry
      .queries("q_record_linkage")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(40L -> 1L, 32L -> 2L), out.toString)
  }

  test("q_orphan_coverage: every check fires on a crafted corrupt snapshot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ri").toString
    Seq((1L, 1L, "1994-01-01"), (2L, 1L, "1994-01-03"))
      .toDF("o_orderkey", "o_custkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    // lineitem 99 is an orphan; part 2 and supplier 20 are never used
    Seq((2L, 1L, 10L), (99L, 1L, 10L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    Seq((1L, "a"), (5L, "b"))
      .toDF("c_custkey", "c_name")
      .write
      .mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    Seq((1L, "p1"), (2L, "p2"))
      .toDF("p_partkey", "p_name")
      .write
      .mode("overwrite")
      .parquet(s"$dir/part.parquet")
    Seq((10L, "s1"), (20L, "s2"))
      .toDF("s_suppkey", "s_name")
      .write
      .mode("overwrite")
      .parquet(s"$dir/supplier.parquet")
    val out = SparkEntry
      .queries("q_orphan_coverage")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(
      out == Map(
        "lineitem_orphan_orderkey" -> 1L,
        "customers_no_orders" -> 1L,
        "parts_never_ordered" -> 1L,
        "suppliers_never_used" -> 1L
      ),
      out.toString
    )
  }

  test("txt_readability: sentence/word/vowel-group counts and milli Flesch") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_read").toString
    // "go. stop! now what" → 3 sentences, 4 words, 4 vowel groups →
    // 206835 − 1015·4//3 − 84600·4//4 = 120882
    Seq((1L, "go. stop! now what", "S1"))
      .toDF("doc_id", "text", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("txt_readability")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        (("S1", 3L, 4L, 4L, 120882L))
    )
  }

  test("q_modularity: perfect two-community split = 0.5, single blob = 0") {
    val s = spark
    import s.implicits._
    def build(brandOf: Map[Long, String]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_mod").toString
      // parts (1,2) share orders 10,11; parts (3,4) share orders 12,13 →
      // exactly two edges in the ≥2-shared-orders graph
      Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 3L), (12L, 4L), (13L, 3L), (13L, 4L))
        .toDF("l_orderkey", "l_partkey")
        .write
        .mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      (1L to 4L)
        .map(k => (k, brandOf(k)))
        .toDF("p_partkey", "p_brand")
        .write
        .mode("overwrite")
        .parquet(s"$dir/part.parquet")
      dir
    }
    val split = build(Map(1L -> "B1", 2L -> "B1", 3L -> "B2", 4L -> "B2"))
    val r1 = SparkEntry.queries("q_modularity")(spark, split).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((2L, 2L, 2L, 500000L)))
    val blob = build(Map(1L -> "B1", 2L -> "B1", 3L -> "B1", 4L -> "B1"))
    val r2 = SparkEntry.queries("q_modularity")(spark, blob).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((2L, 2L, 1L, 0L)))
  }

  test("q_sample_quantile_err: sample ⊇ population ⇒ zero error, ceil ranks") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqe").toString
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .map { case (k, p) => (k, 1L, p, "A") }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val out = SparkEntry
      .queries("q_sample_quantile_err")(spark, dir)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(
      out == Map(
        25L -> ((100L, 100L, 0L)),
        50L -> ((200L, 200L, 0L)),
        75L -> ((300L, 300L, 0L)),
        90L -> ((400L, 400L, 0L))
      ),
      out.toString
    )
  }

  test("q_bloom_fpr matches an independent Scala replay of the filter") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val members = (1L to 100L)
    val probes = (1001L to 1100L)
    (members.map((_, 0)) ++ probes.map((_, 9)))
      .toDF("c_custkey", "c_nationkey")
      .write
      .mode("overwrite")
      .parquet(s"$dir/customer.parquet")

    def pos(i: Int, ck: Long): Int =
      (java.lang.Long.parseLong(md5hex(s"$i:$ck").substring(0, 8), 16) % 1024).toInt
    val bits = scala.collection.mutable.Set.empty[Int]
    members.foreach { ck => bits += pos(0, ck); bits += pos(1, ck) }
    val fp = probes.count(ck => bits.contains(pos(0, ck)) && bits.contains(pos(1, ck)))

    val r = SparkEntry.queries("q_bloom_fpr")(spark, dir).collect()(0)
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == bits.size.toLong, s"bits ${r.getLong(1)} vs ${bits.size}")
    assert(r.getLong(2) == 100L)
    assert(r.getLong(3) == fp.toLong, s"fp ${r.getLong(3)} vs $fp")
    assert(r.getLong(4) == fp.toLong * 1000000L / 100L)
  }

  test("q_open_orders_series: exact interval-overlap day accounting") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_open").toString
    // order 1 open [Jan 20, Feb 11): 12 days in Jan, 10 in Feb;
    // order 2 open [Feb 5, Feb 7): 2 days in Feb
    Seq((1L, "1994-01-20"), (2L, "1994-02-05"))
      .toDF("o_orderkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    Seq((1L, "1994-02-10"), (1L, "1994-01-25"), (2L, "1994-02-06"))
      .toDF("l_orderkey", "sdt")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("q_open_orders_series")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(
      out == Set(
        ("1994-01", 1L, 12L, 12000L / 31L),
        ("1994-02", 2L, 12L, 12000L / 28L)
      ),
      out.toString
    )
  }

  test("q_abc_by_type: running-share class boundaries at exactly 80/95") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_abc").toString
    // revenues 70/15/10/5 → cum shares 70, 85, 95, 100% → A, B, B, C
    Seq((1L, 70.0), (2L, 15.0), (3L, 10.0), (4L, 5.0))
      .map { case (pk, rev) => (pk, pk, rev) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    (1L to 4L)
      .map(k => (k, "T"))
      .toDF("p_partkey", "p_type")
      .write
      .mode("overwrite")
      .parquet(s"$dir/part.parquet")
    val out = SparkEntry
      .queries("q_abc_by_type")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(("A", 1L, 7000L), ("B", 2L, 2500L), ("C", 1L, 500L)), out.toString)
  }

  test("q_peak_backlog: year-keyed sweep with cross-year base carry") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_peak").toString
    // order 3 spans the year boundary → 1994's base = 1 open at Jan 1
    Seq(
      (1L, "1994-01-10", "1994-01-19"),
      (2L, "1994-01-15", "1994-02-09"),
      (3L, "1993-12-20", "1994-01-04")
    ).map { case (k, od, sd) => (k, od, sd) }
      .toDF("o_orderkey", "od", "sd")
      .write
      .mode("overwrite")
      .parquet(s"$dir/_stage.parquet")
    val st = spark.read.parquet(s"$dir/_stage.parquet")
    st.select(col("o_orderkey"), to_timestamp(col("od")).as("o_orderdate"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    st.select(col("o_orderkey").as("l_orderkey"), to_timestamp(col("sd")).as("l_shipdate"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("q_peak_backlog")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val d93 = java.time.LocalDate.of(1993, 12, 20).toEpochDay
    val d94 = java.time.LocalDate.of(1994, 1, 15).toEpochDay
    assert(out == Map(1993L -> ((1L, d93)), 1994L -> ((2L, d94))), out.toString)
  }

  test("q_single_source_risk: the 50% dominance boundary is strict") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssr").toString
    // part 1: 60/40 split → single-source; part 2: 50/50 → not (strict >)
    Seq((1L, 1L, 10L, 60.0), (1L, 1L, 20L, 40.0), (2L, 2L, 10L, 50.0), (2L, 2L, 20L, 50.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    Seq((1L, "T"), (2L, "T"))
      .toDF("p_partkey", "p_type")
      .write
      .mode("overwrite")
      .parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("q_single_source_risk")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (("T", 2L, 1L, 600000L))
    )
  }

  test("q_otif_rate: the worst line binds the whole order") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_otif").toString
    Seq((1L, "1994-01-10"), (2L, "1994-01-15"))
      .toDF("o_orderkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    // order 1: lines at +10 and +31 days → late; order 2: +5, +30 → OTIF
    Seq((1L, "1994-01-20"), (1L, "1994-02-10"), (2L, "1994-01-20"), (2L, "1994-02-14"))
      .toDF("l_orderkey", "sdt")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_otif_rate")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        (("1994-01", 2L, 1L, 500000L))
    )
  }

  test("q_return_rate_wilson: closed form replay and the p=0 lower bound") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wil").toString
    Seq(
      (1L, 1L, "R"), (2L, 1L, "N"), (3L, 1L, "N"), (4L, 1L, "A"),
      (5L, 2L, "N"), (6L, 2L, "N")
    ).toDF("l_orderkey", "l_partkey", "l_returnflag")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    Seq((1L, "B1"), (2L, "B2"))
      .toDF("p_partkey", "p_brand")
      .write
      .mode("overwrite")
      .parquet(s"$dir/part.parquet")
    def wilson(r: Long, n: Long): (Double, Double) = {
      val p = r.toDouble / n
      val z2 = 1.96 * 1.96
      val c = p + z2 / (2 * n)
      val sp = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n.toDouble * n))
      val dn = 1 + z2 / n
      ((c - sp) / dn, (c + sp) / dn)
    }
    val out = SparkEntry
      .queries("q_return_rate_wilson")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (lo1, hi1) = wilson(1, 4)
    assert(out("B1")._1 == 4L && out("B1")._2 == 1L && out("B1")._3 == 250000L)
    assert(math.abs(out("B1")._4 - lo1) < 1e-12 && math.abs(out("B1")._5 - hi1) < 1e-12)
    // p = 0: center and spread cancel exactly → lower bound 0
    assert(out("B2")._4 == 0.0, out("B2").toString)
  }

  test("q_xyz_by_type: CV class boundaries without any sqrt") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xyz").toString
    // 3 horizon months; part 1 steady (CV 0 → X), part 2 CV = 1 exactly
    // on the inclusive Y boundary... part 2 [20,10,0] → CV² = 2/3 → Y;
    // part 3 [30,0,0] → CV² = 2 → Z
    val rows = Seq(
      (1L, 1L, "1994-01-05", 10.0), (2L, 1L, "1994-02-05", 10.0), (3L, 1L, "1994-03-05", 10.0),
      (4L, 2L, "1994-01-10", 20.0), (5L, 2L, "1994-02-10", 10.0),
      (6L, 3L, "1994-01-15", 30.0)
    )
    rows
      .toDF("l_orderkey", "l_partkey", "sdt", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    (1L to 3L)
      .map(k => (k, "T"))
      .toDF("p_partkey", "p_type")
      .write
      .mode("overwrite")
      .parquet(s"$dir/part.parquet")
    val out = SparkEntry
      .queries("q_xyz_by_type")(spark, dir)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    assert(out == Map("X" -> 1L, "Y" -> 1L, "Z" -> 1L), out.toString)
  }

  test("q_did_urgent: 2x2 cell means and the DiD contrast") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_did").toString
    Seq(
      (1L, "1-URGENT", 1.0, "1996-06-01"),
      (2L, "1-URGENT", 3.0, "1997-06-01"),
      (3L, "5-LOW", 1.0, "1996-06-01"),
      (4L, "5-LOW", 2.0, "1997-06-01")
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_did_urgent")(spark, dir).collect()(0)
    assert(
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((300000L, 100000L, 200000L, 100000L, 100000L))
    )
  }

  test("q_order_aging: open-at-horizon filter and band boundaries") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_age").toString
    // horizon = 1994-05-01; ages 0 / 45 / 100 open, one closed order out
    Seq(
      (1L, 1.0, "1994-05-01"),
      (2L, 1.0, "1994-03-17"),
      (3L, 1.0, "1994-01-21"),
      (4L, 1.0, "1994-01-01")
    ).toDF("o_orderkey", "o_totalprice", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    Seq((1L, "1994-05-02"), (2L, "1994-06-01"), (3L, "1994-06-01"), (4L, "1994-01-10"))
      .toDF("l_orderkey", "sdt")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("q_order_aging")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out == Map("00-30" -> 1L, "31-60" -> 1L, "90+" -> 1L), out.toString)
  }

  test("emb_dim_variance: hand-checked per-dimension population variance") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dvar").toString
    Seq(
      (1L, Array(0f, 0f, 1f, 3f)),
      (2L, Array(0f, 2f, 1f, 5f))
    ).toDF("vec_id", "embedding")
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry
      .queries("emb_dim_variance")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(
      out == Map(
        0L -> ((2L, 0.0)),
        1L -> ((2L, 1.0)),
        2L -> ((2L, 0.0)),
        3L -> ((2L, 1.0))
      ),
      out.toString
    )
  }

  test("q_allen_relations: each relation class fires on a crafted timeline") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_allen").toString
    val d0 = java.time.LocalDate.ofEpochDay(0)
    def ts(day: Long) = d0.plusDays(day).toString
    // customer 1 spans (sd, ed)): [10,20)→[30,35) precedes, →[35,40) meets,
    // →[38,50) overlaps, →[38,45) starts... crafted pairwise:
    // c1: [10,20) then [30,35) → precedes
    // c2: [10,20) then [20,25) → meets
    // c3: [10,20) then [15,30) → overlaps
    // c4: [10,20) then [12,18) → contains
    // c5: [10,20) then [10,20) → equals
    // c6: [10,20) then [10,25) → starts
    val spans = Seq(
      (1L, 10L, 20L), (2L, 30L, 35L),
      (3L, 10L, 20L), (4L, 20L, 25L),
      (5L, 10L, 20L), (6L, 15L, 30L),
      (7L, 10L, 20L), (8L, 12L, 18L),
      (9L, 10L, 20L), (10L, 10L, 20L),
      (11L, 10L, 20L), (12L, 10L, 25L)
    )
    val custOf = spans.zipWithIndex.map { case ((ok, _, _), i) => ok -> (i / 2 + 1).toLong }.toMap
    spans
      .map { case (ok, sd, _) => (ok, custOf(ok), ts(sd)) }
      .toDF("o_orderkey", "o_custkey", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    spans
      .map { case (ok, _, ed) => (ok, ts(ed - 1)) } // ed = shipdate + 1
      .toDF("l_orderkey", "sdt")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("q_allen_relations")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(
      out == Map(
        "precedes" -> 1L, "meets" -> 1L, "overlaps" -> 1L,
        "contains" -> 1L, "equals" -> 1L, "starts" -> 1L
      ),
      out.toString
    )
  }

  test("mm_frame_dedup: shared leading frames collapse to one hash group") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mmd").toString
    // identical first 256-byte frame, divergent second frame
    Seq((1L, "A" * 300), (2L, "A" * 300 + "B" * 10))
      .toDF("doc_id", "text")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("mm_frame_dedup")(spark, dir).collect()(0)
    assert(
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 1L, 1L)),
      r.toString
    )
  }

  test("q_dau_stickiness: day-keyed distinct aggregation and the ratio") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dau").toString
    // day 1: users {1, 2}; day 2: {1} → MAU 2, ΣDAU 3, stickiness 750000
    Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (2L, "2024-01-01 11:00:00", 2L),
      (3L, "2024-01-02 10:00:00", 1L)
    ).toDF("event_id", "dt", "user_id")
      .withColumn("ts", unix_micros(to_timestamp(col("dt"))) * 1000)
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_dau_stickiness")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        (("2024-01", 2L, 2L, 1500L, 750000L)),
      r.toString
    )
  }

  test("q_laspeyres_index: base month pins at exactly 1e6 ppm") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lsp").toString
    // Jan (base): p1 100¢/1u, p2 200¢/2u; Feb: p1 300¢/2u, p2 220¢/2u
    Seq(
      (1L, 1L, "1994-01-05", 1.0, 1.0),
      (2L, 2L, "1994-01-10", 2.0, 2.0),
      (3L, 1L, "1994-02-05", 3.0, 2.0),
      (4L, 2L, "1994-02-10", 2.2, 2.0)
    ).toDF("l_orderkey", "l_partkey", "sdt", "l_extendedprice", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(col("sdt")))
      .drop("sdt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("q_laspeyres_index")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out == Map("1994-01" -> 1000000L, "1994-02" -> 1233333L), out.toString)
  }

  test("q_shift_share: expected growth at the aggregate rate, shifts sum to 0") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ss").toString
    Seq(
      (1L, 1L, 1.0, "1996-06-01"), (2L, 2L, 1.0, "1996-06-02"),
      (3L, 1L, 3.0, "1997-06-01"), (4L, 2L, 1.0, "1997-06-02")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "dt")
      .withColumn("o_orderdate", to_timestamp(col("dt")))
      .drop("dt")
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    Seq((1L, 1), (2L, 2)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "A"), (2, "B")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = SparkEntry
      .queries("q_shift_share")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map("A" -> ((200L, 100L)), "B" -> ((200L, -100L))), out.toString)
  }

  test("q_funnel_latency: median gap per stage, non-converters drop") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fl").toString
    // user 1: view 0s, click 100s, purchase 400s; user 2: view 0s, click 300s
    Seq(
      (1L, 0L, 1L, "view"), (2L, 100L, 1L, "click"), (3L, 400L, 1L, "purchase"),
      (4L, 0L, 2L, "view"), (5L, 300L, 2L, "click")
    ).toDF("event_id", "secs", "user_id", "event_type")
      .withColumn("ts", col("secs") * 1000000000L) // seconds → nanos
      .drop("secs")
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("q_funnel_latency")(spark, dir)
      .collect()
      .map(r => (r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(
      out == Map("view_to_click" -> ((2L, 100L)), "click_to_purchase" -> ((1L, 300L))),
      out.toString
    )
  }

  test("dedup_containment: subset pair scores 1.0 where Jaccard dilutes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    // A's 2 shingles ⊂ B's 4 → C(A→B)=1.0, C(B→A)=0.5 (Jaccard only 0.5)
    Seq(
      (1L, "a b c d", "en", "S"),
      (2L, "a b c d e f", "en", "S")
    ).toDF("doc_id", "text", "lang", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("dedup_containment")(spark, dir).collect()(0)
    assert(
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
        ((1L, 2L, 1.0, 0.5)),
      r.toString
    )
  }

  test("cur_boilerplate: df>=3 sentences flag, share over all instances") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bp").toString
    Seq(
      (1L, "same footer here. unique one", "S"),
      (2L, "same footer here. unique two", "S"),
      (3L, "same footer here. unique three", "S"),
      (4L, "only unique four", "S")
    ).toDF("doc_id", "text", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("cur_boilerplate")(spark, dir).collect()(0)
    assert(
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        (("S", 7L, 3L, 3L * 1000000L / 7L)),
      r.toString
    )
  }

  test("dedup_simhash_eval: identical pair is found, recall pins at 1e6") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_she").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "S"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "S"),
      (3L, "one two three four five six seven eight", "en", "S")
    ).toDF("doc_id", "text", "lang", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("dedup_simhash_eval")(spark, dir).collect()(0)
    assert(r.getLong(0) == 1L, r.toString) // one true near-dup pair
    assert(r.getLong(2) == 1L, r.toString) // found by the sketch
    assert(r.getLong(4) == 1000000L, r.toString) // recall 100%
  }

  test("q_lateral_topn: per-nation correlated LIMIT keeps exactly two rows") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lat").toString
    Seq((1, "A")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1), (2L, 1), (3L, 1)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, 3.0), (11L, 2L, 2.0), (12L, 3L, 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // GraftSQL registers every table; provide empty-but-present siblings
    for (t <- Seq("region", "supplier", "part", "lineitem", "documents", "embeddings"))
      Seq((0L, 0L)).toDF("a", "b").write.mode("overwrite").parquet(s"$dir/$t.parquet")
    Seq((0L, 0L, 0L, "x", 0.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("q_lateral_topn")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set(("A", 1L, 300L), ("A", 2L, 200L)), out.toString)
  }

  test("emb_kmeans_step: self-assignment, conservation, zero seed inertia") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_km").toString
    // 8 well-separated axis vectors and one near-duplicate of vec 0. Seeds
    // are the 8 md5-smallest ids; id 3's md5 (eccbc…) is the largest among
    // 0–8, so giving the near-duplicate id 3 pins it as the one non-seed.
    val dim = 16
    def axis(i: Int, scale: Float): Array[Float] = {
      val a = Array.fill(dim)(0f); a(i) = scale; a
    }
    val base = Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L).zipWithIndex
      .map { case (id, i) => (id, axis(i, 10f)) }
    val extra = Seq((3L, axis(0, 9f))) // closest to vec 0 by L2
    (base ++ extra)
      .toDF("vec_id", "embedding")
      .write
      .mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry
      .queries("emb_kmeans_step")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 9 vectors conserved across 8 clusters; vec 8 joins seed 0's cluster
    assert(out.map(_._2).sum == 9L)
    val (big, rest) = out.partition(_._2 == 2L)
    assert(big.length == 1 && big.head._1 == 0L, out.mkString(", "))
    assert(math.abs(big.head._3 - 1.0) < 1e-9) // |10−9|² = 1
    assert(rest.forall(t => t._2 == 1L && t._3 == 0.0), out.mkString(", "))
  }
}
