package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** E411 seeded-Laplace DP release + E412 classifier training. */
class PrivacyTrainSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("dpLaplaceCounts replays the documented inverse-CDF draw exactly") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(400)(i => (s"g${i % 20}", i)).toDF("grp", "v")
    val out = Curation
      .dpLaplaceCounts(df, Seq("grp"), eps = 0.5, seed = "t1")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(out.size == 20)
    // replicate the draw in plain Scala for every group
    (0 until 20).foreach { g =>
      val key = s"g$g"
      val hv = java.lang.Long.parseLong(md5Hex(s"t1|$key").take(13), 16)
      val t = (hv * 2.0 + 1.0) / 4503599627370496.0 - 1.0
      val sgn = if (t > 0) 1.0 else if (t < 0) -1.0 else 0.0
      val expected = BigDecimal(20.0 + (-1.0 / 0.5) * sgn * math.log(1.0 - math.abs(t)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(out(key) - expected) < 1e-9,
        s"group $key: got ${out(key)}, expected $expected")
    }
  }

  test("dpLaplaceCounts is deterministic, noise is two-sided and scale-bounded") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(3000)(i => (s"k${i % 100}", i)).toDF("grp", "v")
    val a = Curation.dpLaplaceCounts(df, Seq("grp"), 0.5, "audit").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Curation.dpLaplaceCounts(df, Seq("grp"), 0.5, "audit").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b, "the seeded draw must be reproducible — re-rolling burns budget")
    val noises = a.values.map(_ - 30.0).toSeq
    // |noise| <= b * ln(2^52): the largest draw the 52-bit grid can produce
    val bound = 2.0 * 52 * math.log(2.0) + 1e-6
    assert(noises.forall(n => math.abs(n) <= bound))
    assert(noises.count(_ > 0) >= 20 && noises.count(_ < 0) >= 20,
      "two-sided noise: both signs must appear across 100 groups")
    assert(noises.count(n => math.abs(n) > 0.05) >= 50,
      "noise at eps=0.5 (scale 2) must actually perturb most groups")
    // a different seed is a different release
    val c = Curation.dpLaplaceCounts(df, Seq("grp"), 0.5, "audit2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a != c)
  }

  test("trainLinearQuality separates a marker-token corpus and is partition-invariant") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map { i =>
      val good = i % 2 == 0
      val filler = s"w${i % 7} w${i % 11} common"
      (i.toLong, if (good) s"goodmark $filler" else s"badmark $filler", good)
    }.toDF("doc_id", "text", "y")
    val w = Curation
      .trainLinearQuality(docs, "doc_id", "text", col("y"), buckets = 64, steps = 3)
    val w2 = Curation
      .trainLinearQuality(docs.repartition(13), "doc_id", "text", col("y"),
        buckets = 64, steps = 3)
    val wm = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wm2 = w2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wm == wm2, "integer gradient sums must make training partition-invariant")
    assert(wm.size == 64)

    def bucketOf(tok: String): Long =
      java.lang.Long.parseLong(md5Hex(tok).take(8), 16) % 64
    val goodB = bucketOf("goodmark")
    val badB = bucketOf("badmark")
    assert(goodB != badB, "fixture tokens must not collide for the test to mean anything")
    assert(wm(goodB) > 0.0, s"the positive marker's weight must rise, got ${wm(goodB)}")
    assert(wm(badB) < 0.0, s"the negative marker's weight must fall, got ${wm(badB)}")

    // the learned model separates the training corpus through the E229
    // inference path (weights recast to the decimal contract)
    val wtab = w.select(col("bucket"), col("weight").cast("decimal(18,9)").as("weight"))
    val scored = Curation
      .linearQualityScore(docs, "doc_id", "text", wtab, buckets = 64)
      .join(docs.select("doc_id", "y"), "doc_id")
      .select(col("y"), col("logit"))
      .collect()
    val acc = scored.count(r => (r.getDouble(1) >= 0.0) == r.getBoolean(0)).toDouble /
      scored.length
    assert(acc >= 0.95, s"3 GD steps must separate the marker corpus, accuracy $acc")
  }

  test("doremiWeights: hard domains gain weight monotonically, rounds renormalize, replay is exact") {
    val s = spark
    import s.implicits._
    // three domains: 'easy' repeats one common token (low corpus surprisal),
    // 'hard' is all rare singletons (high surprisal), 'mid' mixes
    val docs = (
      (0 until 60).map(i => ("easy", "common common common words here")) ++
        (0 until 60).map(i => ("hard", s"rare$i unique$i single$i token$i odd$i")) ++
        (0 until 60).map(i => ("mid", s"common words rare${i % 7} here"))
      ).toDF("source", "text")
    val out = graft.operators.Curation
      .doremiWeights(docs, "source", "text", eta = 0.5, rounds = 5)
      .collect()
      .map(r => r.getString(0) -> (3 to 7).map(r.getDouble).toVector)
      .toMap
    val h = graft.operators.Curation
      .doremiWeights(docs, "source", "text", eta = 0.5, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(h("hard") > h("mid") && h("mid") > h("easy"),
      s"surprisal ladder must order the domains, got $h")
    // each round's weights sum to 1 within quantization
    (0 until 5).foreach { k =>
      val tot = out.values.map(_(k)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"round ${k + 1} weights sum to $tot")
    }
    // the hardest domain's weight strictly rises; the easiest strictly falls
    val hard = out("hard"); val easy = out("easy")
    (1 until 5).foreach { k =>
      assert(hard(k) > hard(k - 1), s"hard domain must gain weight: $hard")
      assert(easy(k) < easy(k - 1), s"easy domain must lose weight: $easy")
    }
    assert(hard(4) > 1.0 / 3.0 && easy(4) < 1.0 / 3.0)
    // partition invariance (integer-quantized sums) and exact replay
    val out2 = graft.operators.Curation
      .doremiWeights(docs.repartition(11), "source", "text", eta = 0.5, rounds = 5)
      .collect()
      .map(r => r.getString(0) -> (3 to 7).map(r.getDouble).toVector)
      .toMap
    assert(out == out2)
  }

  test("conformalGate: exact rank threshold, small-calibration degeneracy, coverage") {
    val s = spark
    import s.implicits._
    // group A: calibration scores 1..10 at 9/10 coverage → k = ⌈11·9/10⌉ = 10
    // → threshold = 10; test scores 5, 10, 11 → 2 of 3 kept
    // group B: calibration of 3 → k = ⌈4·9/10⌉ = 4 > 3 → null threshold, all kept
    val rows =
      (1 to 10).map(i => ("A", i.toLong, true)) ++
        Seq(("A", 5L, false), ("A", 10L, false), ("A", 11L, false)) ++
        (1 to 3).map(i => ("B", (100 * i).toLong, true)) ++
        Seq(("B", 999999L, false))
    val out = graft.operators.Curation
      .conformalGate(rows.toDF("g", "score", "cal"), "g", "score", col("cal"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val a = out("A")
    assert(a.getLong(1) == 10L && a.getLong(2) == 10L && a.getLong(3) == 10L)
    assert(a.getLong(4) == 3L && a.getLong(5) == 2L)
    val b = out("B")
    assert(b.getLong(2) == 4L && b.isNullAt(3), "k > n_cal must yield the +inf threshold")
    assert(b.getLong(4) == 1L && b.getLong(5) == 1L, "null threshold keeps everything")

    // marginal coverage on exchangeable data: both halves drawn identically
    // → kept fraction concentrates near (at least) the 90% target
    val big = (0 until 2000)
      .map(i => ("x", ((i * 2654435761L) % 1000003L), i % 2 == 0))
      .toDF("g", "score", "cal")
    val kept = graft.operators.Curation
      .conformalGate(big, "g", "score", col("cal"))
      .collect()(0)
    val ppm = kept.getLong(6)
    assert(ppm >= 850000L, s"empirical coverage $ppm ppm too far below the 90% guarantee")

    // the corpus-size join must actually BUILD on the gate side: the old
    // right-outer shape put the broadcast hint on the preserved side,
    // which Spark silently ignores (no BroadcastHashJoin materialized)
    val plan = graft.operators.Curation
      .conformalGate(big, "g", "score", col("cal"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"gate join must be a broadcast hash join, got:\n$plan")

    // groups with zero calibration rows are excluded from the report by
    // design (no threshold exists); gate groups with zero TEST rows survive
    // with n_test = 0
    val mixed = (
      (1 to 10).map(i => ("calOnly", i.toLong, true)) ++
        Seq(("testOnly", 5L, false))
      ).toDF("g", "score", "cal")
    val mix = graft.operators.Curation
      .conformalGate(mixed, "g", "score", col("cal"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!mix.contains("testOnly"), "ungated test-only groups are excluded")
    assert(mix("calOnly").getLong(4) == 0L && mix("calOnly").getLong(5) == 0L &&
      mix("calOnly").isNullAt(6), "zero-test gate groups report n_test=0, null ppm")
  }

  test("rhoLossSelect ranks learnable-but-not-yet-learnt docs first, rho identity holds") {
    val s = spark
    import s.implicits._
    // raremark: 30 holdout positives but only 2 train positives → the
    // holdout model learns it, the train model barely moves its bucket —
    // the "learnable, not yet learnt" shape RHO exists to surface.
    // goodmark: train-only positive marker → already learnt (rho < 0).
    // class-DISTINCT token pairs: a shared filler token would let the train
    // model learn the raremark docs THROUGH the filler (verified: it halves
    // their rho below the plainword band) — the fixture isolates the signal
    val rows = (0 until 200).map { i =>
      val holdout = i % 4 == 0
      if (holdout) {
        if (i < 120) (i.toLong, "raremark raretail", true)
        else (i.toLong, "plainword plaintail", false)
      } else if (i == 1 || i == 2) (i.toLong, "raremark raretail", true)
      else if (i % 2 == 1) (i.toLong, "goodmark goodtail", true)
      else (i.toLong, "plainword plaintail", false)
    }
    val docs = rows.toDF("doc_id", "text", "y")
    def bucketOf(tok: String): Long =
      java.lang.Long.parseLong(md5Hex(tok).take(8), 16) % 256
    assert(Seq("raremark", "raretail", "goodmark", "goodtail", "plainword",
      "plaintail").map(bucketOf).toSet.size == 6,
      "fixture markers must hash to distinct buckets")
    val hold = pmod(col("doc_id"), lit(4)) === 0
    val top2 = Curation
      .rhoLossSelect(docs, "doc_id", "text", col("y"), hold, k = 2)
      .collect()
    assert(top2.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L),
      s"raremark train docs must top the RHO ranking, got ${top2.mkString(";")}")
    // full ranking: identity, membership, and already-learnt docs ranking low
    val all = Curation
      .rhoLossSelect(docs, "doc_id", "text", col("y"), hold, k = 200)
      .collect()
    assert(all.length == 150, "selection pool is exactly the train split")
    all.foreach { r =>
      assert(r.getAs[Long]("rho_nano") ==
        r.getAs[Long]("loss_tr_nano") - r.getAs[Long]("loss_ho_nano"))
      assert(r.getAs[Long]("doc_id") % 4 != 0, "holdout docs must never be selected")
    }
    val rho = all.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rho_nano")).toMap
    val goodmarkIds = rows.collect { case (id, t, _) if t.startsWith("goodmark") => id }
    assert(goodmarkIds.forall(id => rho(id) < 0L),
      "already-learnt docs (train-only marker) must carry negative rho")
    // partition invariance: integer ledgers make the whole selection stable
    val rerun = Curation
      .rhoLossSelect(docs.repartition(13), "doc_id", "text", col("y"), hold, k = 2)
      .collect()
      .map(_.getAs[Long]("doc_id"))
      .toSet
    assert(rerun == Set(1L, 2L))
  }

  test("trainLinearQuality with zero steps of signal: all-equal labels push all weights one way") {
    val s = spark
    import s.implicits._
    val docs = (0 until 50)
      .map(i => (i.toLong, s"tok${i % 5} tok${i % 3}", true))
      .toDF("doc_id", "text", "y")
    val wm = Curation
      .trainLinearQuality(docs, "doc_id", "text", col("y"), buckets = 16, steps = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    // every doc is positive: residual = 500000 - 1000000 < 0, so every
    // TOUCHED bucket's weight strictly rises and untouched buckets stay 0
    val touched = (0 until 5).map(i => s"tok$i").map(t =>
      java.lang.Long.parseLong(md5Hex(t).take(8), 16) % 16).toSet
    wm.foreach { case (b, wt) =>
      if (touched.contains(b)) assert(wt > 0.0, s"touched bucket $b must rise")
      else assert(wt == 0.0, s"untouched bucket $b must stay at 0, got $wt")
    }
  }
}
