package graft

import graft.operators.Selection

/** Two-phase selection vs sorted-array ground truth: every rank of several
  * shapes (ties, negatives, skew into one bucket), plus the median wrapper
  * and the bucket-boundary edges the histogram walk must get right.
  */
class SelectionSpec extends SparkSpec {

  private def df(xs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    xs.toDF("v")
  }

  test("kthSmallest equals the sorted array at every rank, ties included") {
    val xs = Seq[Long](5, 3, 3, 3, 9, 1, 1, 70000, 70001, 70001, 131072, -4, -70000, 0)
    val sorted = xs.sorted
    val frame = df(xs)
    for (k <- 1 to xs.length) {
      assert(Selection.kthSmallest(frame, "v", k.toLong) == sorted(k - 1),
        s"rank $k mismatch")
    }
  }

  test("values denser than one bucket still resolve exactly (skewed bucket)") {
    // all values land in bucket 0 (< 2^16): phase 2 does all the work
    val xs = (1L to 500L).map(i => (i * 7919L) % 60000L)
    val sorted = xs.sorted
    val frame = df(xs)
    for (k <- Seq(1, 2, 250, 499, 500)) {
      assert(Selection.kthSmallest(frame, "v", k.toLong) == sorted(k - 1))
    }
  }

  test("negative values bucket in order under the arithmetic shift") {
    val xs = Seq[Long](-1, -65536, -65537, -131073, 0, 65536, -2)
    val sorted = xs.sorted
    val frame = df(xs)
    for (k <- 1 to xs.length) {
      assert(Selection.kthSmallest(frame, "v", k.toLong) == sorted(k - 1))
    }
  }

  test("exactMedian returns (n, lower median) and matches a direct sort") {
    val xs = (1L to 101L).map(i => (i * 2654435761L) % 1000000L)
    val (n, med) = Selection.exactMedian(df(xs), "v")
    assert(n == 101L)
    assert(med == xs.sorted.apply(50))
    val even = xs.take(100)
    val (n2, med2) = Selection.exactMedian(df(even), "v")
    assert(n2 == 100L && med2 == even.sorted.apply(49))
  }

  test("kthSmallestMulti agrees with single-rank calls and shares buckets") {
    val xs = (1L to 400L).map(i => (i * 48271L) % 300000L)
    val sorted = xs.sorted
    val frame = df(xs)
    val ks = Seq(1L, 100L, 101L, 200L, 399L, 400L)
    val multi = graft.operators.Selection.kthSmallestMulti(frame, "v", ks)
    ks.foreach { k =>
      assert(multi(k) == sorted((k - 1).toInt), s"rank $k")
    }
    // duplicate ranks in the request are fine
    val dup = graft.operators.Selection.kthSmallestMulti(frame, "v", Seq(7L, 7L, 7L))
    assert(dup == Map(7L -> sorted(6)))
  }

  test("k out of range and empty input are rejected loudly") {
    intercept[IllegalArgumentException](Selection.kthSmallest(df(Seq(1L, 2L)), "v", 3L))
    intercept[IllegalArgumentException](Selection.kthSmallest(df(Seq(1L)), "v", 0L))
    intercept[IllegalArgumentException](Selection.exactMedian(df(Seq.empty[Long]), "v"))
  }

  test("randomized sweep: arbitrary multisets, signs, and shift widths vs sorted truth") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(300)
      val span = 1L << (8 + rnd.nextInt(16)) // exercises one-bucket and many-bucket regimes
      val xs = Vector.fill(n)(rnd.nextLong() % span) // signed, with duplicates likely
      val sorted = xs.sorted
      val frame = df(xs)
      val shift = Seq(4, 12, 16, 24)(rnd.nextInt(4))
      val ks = Seq(1L, n.toLong) ++ Seq.fill(4)(1L + rnd.nextInt(n).toLong)
      val got = graft.operators.Selection.kthSmallestMulti(frame, "v", ks, shiftBits = shift)
      ks.distinct.foreach { k =>
        assert(got(k) == sorted((k - 1).toInt), s"trial $trial shift $shift rank $k")
      }
    }
  }

  test("nulls are excluded SQL-style: ranks and n count non-null values only") {
    val s = spark
    import s.implicits._
    val frame = Seq[Option[Long]](Some(10L), None, Some(30L), Some(20L), None)
      .toDF("v")
    assert(Selection.kthSmallest(frame, "v", 2L) == 20L)
    val (n, med) = Selection.exactMedian(frame, "v")
    assert(n == 3L && med == 20L)
    // rank 4 exceeds the NON-NULL count even though the frame has 5 rows
    intercept[IllegalArgumentException](Selection.kthSmallest(frame, "v", 4L))
    val allNull = Seq[Option[Long]](None, None).toDF("v")
    intercept[IllegalArgumentException](Selection.exactMedian(allNull, "v"))
  }

  test("adversarial full-domain values: ±2^62 and Long extremes resolve without driver blow-up") {
    // a fixed-shift revision would have collected a 2^46-bucket histogram
    // here (the value range is ~2^63); the adaptive shift caps every driver
    // payload and the top-bucket hi-clamp keeps Long.MaxValue reachable
    val xs = Seq(
      Long.MaxValue, Long.MaxValue - 1, Long.MinValue, Long.MinValue + 7,
      (1L << 62), -(1L << 62), (1L << 62) + 12345L, -(1L << 62) - 99L,
      0L, 1L, -1L, 42L, (1L << 40), -(1L << 40)
    )
    val sorted = xs.sorted
    val frame = df(xs)
    for (k <- 1 to xs.length) {
      assert(Selection.kthSmallest(frame, "v", k.toLong) == sorted(k - 1), s"rank $k")
    }
    val (n, med) = Selection.exactMedian(frame, "v")
    assert(n == xs.length.toLong && med == sorted((xs.length + 1) / 2 - 1))
  }

  test("adversarial dense wide-domain sweep: hashed values spanning the int64 range") {
    // 300 spread-out values (multiplicative-hash mixed, full signed domain):
    // forces multi-level refinement (coarse shift near 48, then narrower)
    val xs = (1L to 300L).map(i => i * -7046029254386353131L + 99991L)
    val sorted = xs.sorted
    val frame = df(xs)
    for (k <- Seq(1, 2, 149, 150, 151, 299, 300)) {
      assert(Selection.kthSmallest(frame, "v", k.toLong) == sorted(k - 1), s"rank $k")
    }
    val (_, q) = Selection.quantiles(frame, "v", Seq(1, 25, 50, 75, 100))
    for (p <- Seq(1, 25, 50, 75, 100)) {
      val k = ((p.toLong * 300 + 99) / 100).toInt
      assert(q(p) == sorted(k - 1), s"p$p")
    }
  }

  test("quantiles: ceil-rank percentiles off one histogram, n from the histogram") {
    val xs = (1L to 200L).map(i => (i * 69621L) % 500000L)
    val sorted = xs.sorted
    val (n, q) = graft.operators.Selection.quantiles(df(xs), "v", Seq(25, 50, 75, 99, 100))
    assert(n == 200L)
    for (p <- Seq(25, 50, 75, 99, 100)) {
      val k = ((p.toLong * n + 99) / 100).toInt
      assert(q(p) == sorted(k - 1), s"p$p")
    }
    intercept[IllegalArgumentException](
      graft.operators.Selection.quantiles(df(xs), "v", Seq(0)))
  }

  test("maintained histogram state: merged-slice phase 1 equals the fresh path at every rank") {
    val xs = (1L to 300L).map(i => (i * 2654435761L) % 200000L - 50000L) // negatives + ties
    val sorted = xs.sorted
    val frame = df(xs).withColumn("slice", org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.lit(3)))
    val states = (0 until 3).map { sl =>
      Selection.histogramState(
        frame.filter(org.apache.spark.sql.functions.col("slice") === sl), "v")
    }
    for (k <- Seq(1L, 2L, 150L, 151L, 299L, 300L)) {
      val got = Selection.kthFromHistogramState(df(xs), "v", states, k)
      assert(got == sorted((k - 1).toInt), s"k=$k: $got vs ${sorted((k - 1).toInt)}")
      assert(got == Selection.kthSmallest(df(xs), "v", k), s"k=$k diverged from fresh path")
    }
    // rank past the states' total fails loudly
    intercept[IllegalArgumentException](
      Selection.kthFromHistogramState(df(xs), "v", states, 301L))
    // SPARSE wide-domain data stays fine: the driver bound is populated
    // buckets (data-bounded), and the in-bucket refinement recurses
    // adaptively even when one coarse bucket spans a huge range — the
    // histogram guard exists for > 2^16 POPULATED buckets, not wide values
    val wide = Seq(Long.MinValue + 7, -1L, 0L, 1L, Long.MaxValue - 7)
    val wideState = Seq(Selection.histogramState(df(wide), "v"))
    assert(Selection.kthFromHistogramState(df(wide), "v", wideState, 1L) == Long.MinValue + 7)
    assert(Selection.kthFromHistogramState(df(wide), "v", wideState, 5L) == Long.MaxValue - 7)
  }
}
