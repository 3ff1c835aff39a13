package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.plans.MvRewrite.MvDef

/** The MV rewrite must (a) actually fire — the physical plan reads the MV
  * parquet, never the base table; (b) be invisible — results and schema
  * byte-identical to the un-rewritten aggregate; (c) stay strict — any
  * non-derivable shape (filter on a measure, distinct, non-grouped column,
  * foreign scan, suffix-coinciding path) leaves the plan alone; (d) derive
  * MIN/MAX/AVG and push grouping-column filters into the MV; (e) pick the
  * smallest covering MV deterministically; (f) survive sessions through the
  * persisted catalog, dropping stale registrations.
  */
class MvRewriteSpec extends SparkSpec {

  private def physOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  /** base with two group dims and three measures (m3 deliberately NOT
    * materialized in the MV), MV with sums, mins, maxs and a count.
    */
  private def withMv[T](f: (String, String) => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    // integral-valued doubles so re-summed AVG is bit-exact
    val rows = for { i <- 1 to 60 } yield
      ("g" + (i % 3), "h" + (i % 2), i.toDouble, i.toLong, (i * 7).toDouble)
    rows.toDF("ga", "gb", "m1", "m2", "m3").write.mode("overwrite").parquet(base)
    val defn = MvDef(base, mv, Seq("ga", "gb"),
      Map("sum_m1" -> "m1", "sum_m2" -> "m2"), Some("cnt"),
      mins = Map("min_m1" -> "m1"), maxs = Map("max_m1" -> "m1"),
      counts = Map("cnt_m1" -> "m1", "cnt_m2" -> "m2"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try f(base, mv)
    finally MvRewrite.clear()
  }

  /** run `q` twice — registered (must scan the MV) and cleared (must not) —
    * and assert identical schema + rows. Caller re-registers via `reg`.
    */
  private def assertInvisible(
      q: => org.apache.spark.sql.DataFrame,
      orderCols: Seq[String],
      reg: () => Unit
  ): Unit = {
    val rewritten = q
    assert(physOf(rewritten).contains("mv.parquet"), s"rewrite did not fire:\n${physOf(rewritten)}")
    assert(!physOf(rewritten).contains("base.parquet"), "base still scanned")
    MvRewrite.clear()
    val truth = q
    assert(!physOf(truth).contains("mv.parquet"), "registry not cleared")
    reg()
    assert(rewritten.schema == truth.schema, s"${rewritten.schema} vs ${truth.schema}")
    val a = rewritten.orderBy(orderCols.map(col): _*).collect().map(_.toSeq).toSeq
    val b = truth.orderBy(orderCols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(a == b, s"$a vs $b")
  }

  test("subset-group rollup answers from the MV with identical results") {
    withMv { (base, mv) =>
      val q = spark.read.parquet(base)
        .groupBy("ga")
        .agg(sum("m1").as("s1"), count(lit(1)).as("n"), sum("m2").as("s2"))
      val phys = physOf(q)
      assert(phys.contains("mv.parquet"), s"rewrite did not fire:\n$phys")
      assert(!phys.contains("base.parquet"), s"base still scanned:\n$phys")
      MvRewrite.clear()
      val truth = spark.read.parquet(base)
        .groupBy("ga")
        .agg(sum("m1").as("s1"), count(lit(1)).as("n"), sum("m2").as("s2"))
      assert(!physOf(truth).contains("mv.parquet"))
      assert(q.schema == truth.schema, s"${q.schema} vs ${truth.schema}")
      val a = q.orderBy("ga").collect().map(_.toSeq).toSeq
      val b = truth.orderBy("ga").collect().map(_.toSeq).toSeq
      assert(a == b, s"$a vs $b")
    }
  }

  test("full-group query and downstream operators survive the rewrite") {
    withMv { (base, _) =>
      val q = spark.read.parquet(base)
        .groupBy("ga", "gb")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 5)
        .orderBy("ga", "gb")
      assert(physOf(q).contains("mv.parquet"))
      val rows = q.collect().map(r =>
        (r.getAs[String]("ga"), r.getAs[String]("gb"), r.getAs[Long]("n")))
      assert(rows.length == 6 && rows.forall(_._3 == 10L), rows.mkString(";"))
    }
  }

  test("MIN/MAX derive from materialized per-group mins/maxs, exactly") {
    withMv { (base, _) =>
      def q = spark.read.parquet(base)
        .groupBy("ga")
        .agg(min("m1").as("lo"), max("m1").as("hi"), sum("m1").as("s"))
      assertInvisible(q, Seq("ga"), () => ())
      // a MIN over a measure with no materialized min blocks
      val blocked = spark.read.parquet(base).groupBy("ga").agg(min("m2").as("lo"))
      assert(!physOf(blocked).contains("mv.parquet"), physOf(blocked))
    }
  }

  test("AVG derives as re-sum over re-count; unmaterialized measures block") {
    withMv { (base, _) =>
      def q = spark.read.parquet(base)
        .groupBy("ga")
        .agg(avg("m1").as("a1"), avg("m2").as("a2"), count(lit(1)).as("n"))
      assertInvisible(q, Seq("ga"), () => ())
      // m3 has no materialized sum → no rewrite
      val blocked = spark.read.parquet(base).groupBy("ga").agg(avg("m3").as("a"))
      assert(!physOf(blocked).contains("mv.parquet"), physOf(blocked))
    }
  }

  test("AVG of a nullable measure uses the materialized COUNT(col) denominator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-avgnull").toString
    val base = s"$dir/base.parquet"
    val s = spark
    import s.implicits._
    // m is NULL on odd i: avg = sum(m)/COUNT(m), and COUNT(*) = 2·COUNT(m)
    // in every group — the exact null-overcount the denominator rule blocks
    (1 to 40).map(i => ("g" + (i % 2), if (i % 4 < 2) Some(i.toDouble) else None))
      .toDF("ga", "m").write.parquet(base)
    // only COUNT(*) materialized → AVG must NOT rewrite (a countCol
    // denominator would silently halve the average)
    val noCnt = MvDef(base, s"$dir/mv1.parquet", Seq("ga"),
      Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, noCnt)
    MvRewrite.register(spark, noCnt)
    try {
      val blocked = spark.read.parquet(base).groupBy("ga").agg(avg("m").as("a"))
      assert(!physOf(blocked).contains("mv1.parquet"), physOf(blocked))
    } finally MvRewrite.clear()
    // with COUNT(m) materialized the rewrite fires and matches the truth
    val withCnt = MvDef(base, s"$dir/mv2.parquet", Seq("ga"),
      Map("sum_m" -> "m"), Some("cnt"), counts = Map("cnt_m" -> "m"))
    MvRewrite.build(spark, withCnt)
    MvRewrite.register(spark, withCnt)
    try {
      val q = spark.read.parquet(base).groupBy("ga").agg(avg("m").as("a"))
      assert(physOf(q).contains("mv2.parquet"), physOf(q))
      val got = q.orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.clear()
      val truth = spark.read.parquet(base).groupBy("ga").agg(avg("m").as("a"))
        .orderBy("ga").collect().map(_.toSeq).toSeq
      assert(got == truth, s"$got vs $truth")
    } finally MvRewrite.clear()
  }

  test("filters over grouping columns push into the MV; measure filters block") {
    withMv { (base, _) =>
      // gb is an MV grouping column but NOT in the query grouping — still safe
      def q = spark.read.parquet(base)
        .filter(col("gb") === "h1" && col("ga") =!= "g0")
        .groupBy("ga")
        .agg(sum("m1").as("s"), count(lit(1)).as("n"), min("m1").as("lo"))
      assertInvisible(q, Seq("ga"), () => ())
      // a measure filter cannot be answered from the rollup
      val blocked = spark.read.parquet(base).filter(col("m1") > 10)
        .groupBy("ga").agg(sum("m1").as("s"))
      assert(!physOf(blocked).contains("mv.parquet"), physOf(blocked))
    }
  }

  test("strictness: distinct, non-grouped columns, and foreign scans block the rewrite") {
    withMv { (base, _) =>
      val dist = spark.read.parquet(base).groupBy("ga")
        .agg(sum_distinct(col("m1")).as("s"))
      assert(!physOf(dist).contains("mv.parquet"))
      val wrongGroup = spark.read.parquet(base).groupBy("m2")
        .agg(sum("m1").as("s"))
      assert(!physOf(wrongGroup).contains("mv.parquet"))
      val s = spark
      import s.implicits._
      val otherDir = java.nio.file.Files.createTempDirectory("graft-mv-other").toString
      Seq(("g1", 1.0)).toDF("ga", "m1").write.parquet(s"$otherDir/t.parquet")
      val other = spark.read.parquet(s"$otherDir/t.parquet")
        .groupBy("ga").agg(sum("m1").as("s"))
      assert(!physOf(other).contains("mv.parquet"))
    }
  }

  test("path matching is qualified-URI equality — a suffix-coinciding table is not served") {
    withMv { (base, _) =>
      val s = spark
      import s.implicits._
      // a DIFFERENT table whose path ENDS with the registered base path:
      // <tmp2>/<abs base path> — the old endsWith heuristic matched this
      val tmp2 = java.nio.file.Files.createTempDirectory("graft-mv-shadow").toString
      val shadow = tmp2 + base // base is absolute → concatenation nests it
      Seq(("g0", "h0", 1000.0, 1L, 1.0), ("g1", "h1", 2000.0, 2L, 2.0))
        .toDF("ga", "gb", "m1", "m2", "m3").write.parquet(shadow)
      val q = spark.read.parquet(shadow).groupBy("ga").agg(sum("m1").as("s"))
      assert(!physOf(q).contains("mv.parquet"),
        s"suffix-coinciding path was served from the MV:\n${physOf(q)}")
      val got = q.orderBy("ga").collect().map(_.getDouble(1)).toSeq
      assert(got == Seq(1000.0, 2000.0), got.toString)
    }
  }

  test("smallest covering MV wins deterministically when several match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-arb").toString
    val base = s"$dir/base.parquet"
    val mvBig = s"$dir/mv_big.parquet"
    val mvSmall = s"$dir/mv_small.parquet"
    val s = spark
    import s.implicits._
    (1 to 40).map(i => ("g" + (i % 4), "h" + (i % 2), i.toDouble))
      .toDF("ga", "gb", "m").write.parquet(base)
    val big = MvDef(base, mvBig, Seq("ga", "gb"), Map("sum_m" -> "m"), Some("cnt"))
    val small = MvDef(base, mvSmall, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, big)
    MvRewrite.build(spark, small)
    MvRewrite.register(spark, big)
    MvRewrite.register(spark, small)
    try {
      val q1 = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(physOf(q1).contains("mv_small.parquet"),
        s"arbitration must pick the smaller MV:\n${physOf(q1)}")
      // the wider grouping can only be answered by the big MV
      val q2 = spark.read.parquet(base).groupBy("ga", "gb").agg(sum("m").as("s"))
      assert(physOf(q2).contains("mv_big.parquet"), physOf(q2))
      MvRewrite.clear()
      val t1 = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
        .orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.register(spark, big)
      MvRewrite.register(spark, small)
      val got = q1.orderBy("ga").collect().map(_.toSeq).toSeq
      assert(got == t1, s"$got vs $t1")
    } finally MvRewrite.clear()
  }

  test("COUNT(col) derives from a materialized non-null count; COUNT(*) never substitutes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-cnt").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    // m is NULL on odd i — COUNT(m) ≠ COUNT(*) in every group
    (1 to 40).map(i => ("g" + (i % 2), if (i % 2 == 0) Some(i.toDouble) else None))
      .toDF("ga", "m").write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map.empty, Some("cnt"),
      counts = Map("cnt_m" -> "m"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try {
      val q = spark.read.parquet(base)
        .groupBy("ga").agg(count(col("m")).as("nm"), count(lit(1)).as("n"))
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val rows = q.orderBy("ga").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq(("g0", 20L, 20L), ("g1", 0L, 20L)), rows.toString)
      // a COUNT over a column with no materialized count blocks (COUNT(*)
      // must never stand in for COUNT(col))
      val blocked = spark.read.parquet(base).groupBy("ga").agg(count(col("ga")).as("x"))
      assert(!physOf(blocked).contains("mv.parquet"), physOf(blocked))
    } finally MvRewrite.clear()
  }

  test("a global COUNT(*) over an empty base re-aggregates to 0, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-empty").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    Seq.empty[(String, Double)].toDF("ga", "m").write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try {
      val q = spark.read.parquet(base).agg(count(lit(1)).as("n"), sum("m").as("s"))
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val row = q.collect().head
      assert(row.getAs[Long]("n") == 0L, s"global count over empty base: $row")
      assert(row.isNullAt(row.fieldIndex("s")), "global sum over empty base stays NULL")
    } finally MvRewrite.clear()
  }

  test("decimal sums keep their original narrower type through the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dec").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    (1 to 20).map(i => ("g" + (i % 2), BigDecimal(i).setScale(2)))
      .toDF("ga", "m").write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try {
      val q = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(physOf(q).contains("mv.parquet"))
      // decimal AVG stays blocked — scale promotion is engine-specific
      val decAvg = spark.read.parquet(base).groupBy("ga").agg(avg("m").as("a"))
      assert(!physOf(decAvg).contains("mv.parquet"), physOf(decAvg))
      MvRewrite.clear()
      val truth = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(q.schema == truth.schema, s"${q.schema} vs ${truth.schema}")
      MvRewrite.register(spark, defn)
      assert(q.orderBy("ga").collect().map(_.toSeq).toSeq ==
        truth.orderBy("ga").collect().map(_.toSeq).toSeq)
    } finally MvRewrite.clear()
  }

  test("append-only base churn refreshes the MV incrementally; other churn drops it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-inc").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val cat = s"$dir/mvcatalog"
    val s = spark
    import s.implicits._
    (1 to 30).map(i => ("g" + (i % 3), i.toDouble)).toDF("ga", "m")
      .write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"),
      mins = Map("min_m" -> "m"), maxs = Map("max_m" -> "m"),
      counts = Map("cnt_m" -> "m"))
    MvRewrite.build(spark, defn)
    MvRewrite.persist(spark, cat, defn)
    MvRewrite.clear()
    // append new files (old part files untouched) — includes a NEW group g9
    ((31 to 40).map(i => ("g" + (i % 3), i.toDouble)) :+ ("g9", 100.0))
      .toDF("ga", "m").write.mode("append").parquet(base)
    try {
      val loaded = MvRewrite.loadCatalog(spark, cat)
      assert(loaded.map(_.mvPath) == Seq(mv), s"append-only refresh did not register: $loaded")
      def q = spark.read.parquet(base).groupBy("ga")
        .agg(sum("m").as("s"), count(lit(1)).as("n"), min("m").as("lo"),
          max("m").as("hi"), avg("m").as("a"))
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val got = q.orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.clear()
      val truth = q // registry cleared → un-rewritten
      assert(!physOf(truth).contains("mv.parquet"))
      assert(got == truth.orderBy("ga").collect().map(_.toSeq).toSeq, got.toString)
      // the refreshed record re-persisted: a second load is fresh (no churn)
      assert(MvRewrite.loadCatalog(spark, cat).map(_.mvPath) == Seq(mv))
      MvRewrite.clear()
      // non-append churn: the base is REWRITTEN (old files replaced) → drop
      (1 to 10).map(i => ("g" + (i % 3), i.toDouble)).toDF("ga", "m")
        .write.mode("overwrite").parquet(base)
      assert(MvRewrite.loadCatalog(spark, cat).isEmpty, "rewritten base must drop the MV")
    } finally MvRewrite.clear()
  }

  test("delete-only base churn (retention expiry) refreshes the MV from per-file partials") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-del").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val cat = s"$dir/mvcatalog"
    val s = spark
    import s.implicits._
    // several data files so deleting a strict subset is delete-ONLY churn
    (1 to 40).map(i => ("g" + (i % 3), i.toDouble)).toDF("ga", "m")
      .repartition(4).write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"),
      mins = Map("min_m" -> "m"), maxs = Map("max_m" -> "m"),
      counts = Map("cnt_m" -> "m"))
    MvRewrite.build(spark, defn)
    MvRewrite.persist(spark, cat, defn)
    MvRewrite.clear()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    val basePath = new org.apache.hadoop.fs.Path(base)
    def dataFiles() = fs.listStatus(basePath).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
    try {
      // retention expiry: remove one part file, every survivor untouched
      val victim = dataFiles().minBy(_.getName)
      fs.delete(victim, false)
      val loaded = MvRewrite.loadCatalog(spark, cat)
      assert(loaded.map(_.mvPath) == Seq(mv), s"delete-only refresh did not register: $loaded")
      def q = spark.read.parquet(base).groupBy("ga")
        .agg(sum("m").as("s"), count(lit(1)).as("n"), min("m").as("lo"),
          max("m").as("hi"), avg("m").as("a"))
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val got = q.orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.clear()
      val truth = q // registry cleared → un-rewritten, reads the survivors
      assert(!physOf(truth).contains("mv.parquet"))
      assert(got == truth.orderBy("ga").collect().map(_.toSeq).toSeq,
        "refreshed MV must equal direct aggregation over the surviving files")
      // re-persisted snapshot: a second load with no further churn is fresh
      assert(MvRewrite.loadCatalog(spark, cat).map(_.mvPath) == Seq(mv))
      MvRewrite.clear()
      // MIXED churn (a delete AND an append in ONE epoch — the real
      // retention+ingest shape) composes the two refresh paths: prune the
      // sidecar to survivors, then fold the appended files in
      fs.delete(dataFiles().minBy(_.getName), false)
      Seq(("g0", 999.0), ("g7", 5.0)).toDF("ga", "m").write.mode("append").parquet(base)
      val mixedLoaded = MvRewrite.loadCatalog(spark, cat)
      assert(mixedLoaded.map(_.mvPath) == Seq(mv),
        s"mixed churn did not refresh the MV: $mixedLoaded")
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val gotMixed = q.orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.clear()
      assert(gotMixed == q.orderBy("ga").collect().map(_.toSeq).toSeq,
        "mixed-refreshed MV must equal direct aggregation over survivors ∪ appended")
      // a REWRITTEN survivor inside a mixed diff is NOT mixed churn — its
      // old rows are unretractable from partial states, so it still drops
      fs.delete(dataFiles().minBy(_.getName), false)
      val survivor = dataFiles().minBy(_.getName)
      val surviving = spark.read.parquet(survivor.toString).collect()
      spark.createDataFrame(
          java.util.Arrays.asList(surviving.take(math.max(1, surviving.length - 1)): _*),
          spark.read.parquet(base).schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp-rewrite")
      val rewritten = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/tmp-rewrite"))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      fs.delete(survivor, false)
      fs.rename(rewritten, survivor)
      Seq(("g1", 42.0)).toDF("ga", "m").write.mode("append").parquet(base)
      assert(MvRewrite.loadCatalog(spark, cat).isEmpty,
        "survivor-modified churn must still drop the MV")
    } finally MvRewrite.clear()
  }

  test("backfillSidecar retrofits delete-refresh onto a pre-sidecar MV") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-bf").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val cat = s"$dir/mvcatalog"
    val s = spark
    import s.implicits._
    (1 to 40).map(i => ("g" + (i % 3), i.toDouble)).toDF("ga", "m")
      .repartition(4).write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"),
      mins = Map("min_m" -> "m"), maxs = Map("max_m" -> "m"),
      counts = Map("cnt_m" -> "m"))
    MvRewrite.build(spark, defn)
    MvRewrite.persist(spark, cat, defn)
    MvRewrite.clear()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    // an MV persisted before the sidecar feature existed…
    fs.delete(new org.apache.hadoop.fs.Path(mv + "_files"), true)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(base)).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
    try {
      // …backfilled ONCE while still fresh relative to the base…
      MvRewrite.backfillSidecar(spark, defn)
      // …gains delete-only refresh instead of dropping
      fs.delete(dataFiles().minBy(_.getName), false)
      val loaded = MvRewrite.loadCatalog(spark, cat)
      assert(loaded.map(_.mvPath) == Seq(mv),
        s"backfilled MV did not delete-refresh: $loaded")
      def q = spark.read.parquet(base).groupBy("ga")
        .agg(sum("m").as("s"), count(lit(1)).as("n"), min("m").as("lo"),
          max("m").as("hi"), avg("m").as("a"))
      assert(physOf(q).contains("mv.parquet"), physOf(q))
      val got = q.orderBy("ga").collect().map(_.toSeq).toSeq
      MvRewrite.clear()
      assert(got == q.orderBy("ga").collect().map(_.toSeq).toSeq,
        "refreshed MV must equal direct aggregation over the surviving files")
    } finally MvRewrite.clear()
  }

  test("delete-only churn on an MV without a sidecar keeps the DROP semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-nosc").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val cat = s"$dir/mvcatalog"
    val s = spark
    import s.implicits._
    (1 to 20).map(i => ("g" + (i % 2), i.toDouble)).toDF("ga", "m")
      .repartition(3).write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.persist(spark, cat, defn)
    MvRewrite.clear()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    // simulate an MV built before the sidecar feature existed
    fs.delete(new org.apache.hadoop.fs.Path(mv + "_files"), true)
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(base)).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .minBy(_.getName)
    fs.delete(victim, false)
    try assert(MvRewrite.loadCatalog(spark, cat).isEmpty,
      "no sidecar → a stale rollup must be dropped, never served")
    finally MvRewrite.clear()
  }

  test("persisted catalog re-registers across sessions; stale definitions are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-cat").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val catDir = s"$dir/mvcatalog"
    val s = spark
    import s.implicits._
    (1 to 30).map(i => ("g" + (i % 3), i.toDouble)).toDF("ga", "m").write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.persist(spark, catDir, defn)
    MvRewrite.clear()
    try {
      // a FRESH session configured with the catalog picks the MV up on its
      // first query — the "dashboard restarts, rollups still serve" story
      val s2 = spark.newSession()
      s2.conf.set(MvRewrite.CatalogConfKey, catDir)
      val q = s2.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(q.queryExecution.executedPlan.toString.contains("mv.parquet"),
        s"catalog did not load:\n${q.queryExecution.executedPlan}")
      assert(q.orderBy("ga").collect().map(_.getDouble(1)).toSeq
        == Seq(165.0, 145.0, 155.0))

      // base churns → the persisted signature no longer matches → the
      // loader must DROP the registration, not serve the stale rollup
      MvRewrite.clear()
      (1 to 30).map(i => ("g" + (i % 3), (i * 100).toDouble)).toDF("ga", "m")
        .write.mode("overwrite").parquet(base)
      val loaded = MvRewrite.loadCatalog(spark, catDir)
      assert(loaded.isEmpty, s"stale MV re-registered: $loaded")
      val q2 = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(!q2.queryExecution.executedPlan.toString.contains("mv.parquet"))
      assert(q2.orderBy("ga").collect().map(_.getDouble(1)).toSeq
        == Seq(16500.0, 14500.0, 15500.0))
    } finally MvRewrite.clear()
  }
}
