package graft

import org.apache.spark.sql.functions._

import graft.operators.GeoJoin
import graft.queries.StatQueries

/** Semantics of the statistical-analytics batch: grid proximity join
  * equivalence against the naive quadratic join, regression on a known line,
  * rolling-median middle-pick against a brute-force recompute.
  */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def entry(name: String) =
    StatQueries.entries.find(_.name == name).get.run(spark, sf)

  test("bigramCrossEntropy: templated docs score measurably below novel text") {
    import graft.operators.TermStats
    // shared vocabulary, very different transition structure: doc 1 cycles
    // one 4-word template; doc 2 visits many distinct transitions
    val template = Seq.fill(10)("alpha beta gamma delta").mkString(" ")
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val novel = (0 until 40).map(i => words((i * 5 + i * i) % 8)).mkString(" ")
    val df = Seq((1L, template), (2L, novel)).toDF("doc_id", "text")
    val out = TermStats
      .bigramCrossEntropy(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == 39L && out(2L)._1 == 39L)
    assert(
      out(1L)._2 + 0.5 < out(2L)._2,
      s"templated=${out(1L)._2} should be well below novel=${out(2L)._2}"
    )
  }

  test("bigramCrossEntropy drops docs without transitions, keeps two-token docs") {
    import graft.operators.TermStats
    val df = Seq((1L, "solo"), (2L, ""), (3L, "pair pair")).toDF("doc_id", "text")
    val out = TermStats
      .bigramCrossEntropy(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(3L -> 1L), s"got $out")
  }

  test("stupidBackoffEntropy walks the tier chain with exact hand-computed scores") {
    import graft.operators.TermStats
    // model: trigram "a b c" ×2 plus "b c d"; score doc exercises all tiers
    val model = Seq((0L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    // trigrams of score doc: (a,b,c) seen; (b,c,x): unseen trigram, unseen
    // bigram (c,x) → unigram floor on x (OOV); (c,x,a): unseen trigram and
    // (x,a) unseen → unigram floor on a (in-vocab)
    val scoreD = Seq((1L, "a b c x a")).toDF("doc_id", "text")
    val out = TermStats
      .stupidBackoffEntropy(model, scoreD, "doc_id", "text")
      .head()
    assert(out.getAs[Long]("n_trigrams") == 3L)
    assert(out.getAs[Long]("n_tri_hit") == 1L, out.toString)
    assert(out.getAs[Long]("n_bi_hit") == 0L)
    assert(out.getAs[Long]("n_uni") == 2L)
    // model counts: N=7 tokens, V=4 terms; c(abc)=2, c(ab)=2 →
    // S(abc)=1; floors: x OOV → 0.16·1/11, a → 0.16·3/11
    val expected = (math.round((-math.log(1.0) / math.log(2.0)) * 1e9) +
      math.round((-math.log(0.4 * 0.4 * (1.0 / 11)) / math.log(2.0)) * 1e9) +
      math.round((-math.log(0.4 * 0.4 * (3.0 / 11)) / math.log(2.0)) * 1e9)) / 3.0 / 1e9
    assert(
      math.abs(out.getAs[Double]("backoff_entropy") - expected) < 1e-5,
      s"got ${out.getAs[Double]("backoff_entropy")} want ~$expected"
    )
  }

  test("stupidBackoffEntropy: bigram tier fires when only the trigram is novel") {
    import graft.operators.TermStats
    val model = Seq((0L, "p q r"), (2L, "s q r")).toDF("doc_id", "text")
    // (p,q,r) seen as trigram; score "z q r" → (z,q,r): trigram unseen,
    // bigram (q,r) seen with c=2, context c(q)=2 → tier 2
    val out = TermStats
      .stupidBackoffEntropy(model, Seq((1L, "z q r")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(out.getAs[Long]("n_trigrams") == 1L)
    assert(out.getAs[Long]("n_bi_hit") == 1L, out.toString)
    // S = 0.4 · 2/2 = 0.4 → bits = −log2(0.4)
    val want = -math.log(0.4) / math.log(2.0)
    assert(math.abs(out.getAs[Double]("backoff_entropy") - want) < 1e-5)
  }

  test("gridProximityJoin equals the naive cross-join filter for several radii") {
    // deterministic pseudo-random points on a 100×100 plane
    val pts = (1L to 120L).map(k => (k, (k * 37 % 1000) / 10.0, (k * 73 % 1000) / 10.0))
    val a = pts.toDF("id", "lat", "lon")
    val b = pts.map { case (k, x, y) => (k + 1000, y, x) }.toDF("id", "lat", "lon")
    for (radius <- Seq(3.0, 7.5, 12.5)) {
      val fast = GeoJoin
        .gridProximityJoin(a, "id", b.withColumnRenamed("id", "rid"), "rid", "lat", "lon", radius)
        .select(col("id"), col("rid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = a
        .crossJoin(
          b.select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon"))
        )
        .filter(
          sqrt(
            ((col("lat") - col("rlat")) * (col("lat") - col("rlat"))) +
              ((col("lon") - col("rlon")) * (col("lon") - col("rlon")))
          ) <= lit(radius)
        )
        .select(col("id"), col("rid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(fast === naive, s"radius=$radius")
      assert(naive.nonEmpty, s"degenerate fixture at radius=$radius")
    }
  }

  test("gridProximityJoin property: equivalence on seeded random clouds and radii") {
    // seeded random point clouds (negative coords included — floor on
    // negatives is the classic off-by-one trap) across random radii
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val n = 60 + rnd.nextInt(60)
      val cloudA = (1 to n).map(i =>
        (i.toLong, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 120 - 60)
      )
      val cloudB = (1 to n).map(i =>
        (i.toLong + 10000, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 120 - 60)
      )
      val radius = 0.5 + rnd.nextDouble() * 25
      val a = cloudA.toDF("id", "lat", "lon")
      val b = cloudB.toDF("rid", "lat", "lon")
      val fast = GeoJoin
        .gridProximityJoin(a, "id", b, "rid", "lat", "lon", radius)
        .select(col("id"), col("rid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = a
        .crossJoin(b.select(col("rid"), col("lat").as("rlat"), col("lon").as("rlon")))
        .filter(
          sqrt(
            ((col("lat") - col("rlat")) * (col("lat") - col("rlat"))) +
              ((col("lon") - col("rlon")) * (col("lon") - col("rlon")))
          ) <= lit(radius)
        )
        .select(col("id"), col("rid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(fast === naive, s"trial=$trial radius=$radius n=$n")
    }
  }

  test("gridProximityJoin plans an equi-join, not a nested loop") {
    val a = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    val b = Seq((2L, 1.0, 1.0)).toDF("rid", "lat", "lon")
    val plan = GeoJoin
      .gridProximityJoin(a, "id", b, "rid", "lat", "lon", 5.0)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("q_regr_per_group recovers an exact linear relationship") {
    // y = 250x + 1000 cents-exact → slope 2.5, intercept 10.0 in price units
    val df = (1 to 40)
      .map(i => (i % 2 == 0, i.toDouble % 7 + 1, ((i.toDouble % 7 + 1) * 250 + 1000) / 100.0))
      .toDF("flag", "l_quantity", "l_extendedprice")
      .withColumn("l_returnflag", when(col("flag"), "A").otherwise("B"))
    withTempDir { dir =>
      df.select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .write
        .parquet(s"$dir/lineitem.parquet")
      val out = StatQueries.entries
        .find(_.name == "q_regr_per_group")
        .get
        .run(spark, dir)
        .collect()
      assert(out.length === 2)
      out.foreach { r =>
        assert(math.abs(r.getAs[Double]("slope") - 2.5) < 1e-12)
        assert(math.abs(r.getAs[Double]("intercept") - 10.0) < 1e-9)
        assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12)
      }
    }
  }

  test("q_rolling_median_rev matches a brute-force window recompute") {
    val rows = entry("q_rolling_median_rev")
      .filter(col("flag") === "A")
      .orderBy(col("day"))
      .select(col("rev_cents"), col("med7"))
      .collect()
    val revs = rows.map(_.getLong(0))
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = revs.slice(math.max(0, i - 6), i + 1).sorted
      val n = frame.length
      val expect =
        if (n % 2 == 1) frame(n / 2).toDouble
        else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
      assert(r.getDouble(1) === expect / 100.0, s"row $i")
    }
    assert(rows.length > 100)
  }

  test("q_entropy_groups stays within [0, log2(n_types)]") {
    entry("q_entropy_groups").collect().foreach { r =>
      val h = r.getAs[Double]("entropy")
      val nt = r.getAs[Long]("n_types")
      assert(h >= 0.0 && h <= math.log(nt.toDouble) / math.log(2.0) + 1e-9, r.toString)
    }
  }

  test("q_window_distinct_users rolling count bounds its single-day count") {
    val rows = entry("q_window_distinct_users").collect()
    assert(rows.nonEmpty)
    // rolling 7-day distinct can never fall below 1 nor exceed the total
    // distinct users of the whole stream
    val totalUsers = graft.Tables
      .events(spark, sf)
      .select(col("user_id"))
      .distinct()
      .count()
    rows.foreach { r =>
      val u = r.getAs[Long]("users7")
      assert(u >= 1L && u <= totalUsers, r.toString)
    }
  }

  test("txt_lm_cross_entropy is positive and bounded by log2(total tokens)") {
    // every token occurs at least once, so p(t) >= 1/T and per-doc
    // cross-entropy <= log2(T) (NOT log2(vocab): rare-token docs exceed the
    // distribution's own entropy bound)
    val total = graft.Tables
      .documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .count()
    val bound = math.log(total.toDouble) / math.log(2.0) + 1e-9
    entry("txt_lm_cross_entropy").collect().foreach { r =>
      val h = r.getAs[Double]("cross_entropy")
      assert(h > 0.0 && h <= bound, s"$r total=$total")
    }
  }

  test("q_rolling_zscore_anomalies emits only beyond-2-sigma days with a warm baseline") {
    val rows = entry("q_rolling_zscore_anomalies").collect()
    assert(rows.length > 50)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) >= 2.0, r.toString)
      assert(r.getAs[Double]("rev") > 0.0)
    }
    // a self-defending baseline (frame including the current row) would
    // shrink extreme z-scores; sanity-check genuinely large ones exist
    assert(rows.exists(r => math.abs(r.getAs[Double]("z")) > 3.0))
  }

  test("q_bitmap_months bitmap agrees with its popcount and the month domain") {
    entry("q_bitmap_months").collect().foreach { r =>
      val bm = r.getAs[Long]("month_bitmap")
      assert((bm & ~0x1ffeL) === 0L, s"bits outside months 1..12: $bm")
      assert(java.lang.Long.bitCount(bm).toLong === r.getAs[Long]("n_months"))
    }
  }
}
