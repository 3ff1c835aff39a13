package graft

import org.apache.spark.sql.functions._

import graft.operators.Fragmentation

/** Property tests (seeded sampling — the scalatest/scalacheck bridge isn't in
  * the offline cache) for the generalized fragmentation expressions: the
  * fragmentation correctness triple (totality → completeness, determinism +
  * single assignment → disjointness; together → reconstruction) plus
  * interval-membership of the closed-form range rule.
  *
  * Expressions are evaluated in one batch per property (a single local
  * collect), not per sample — keeps the suite fast.
  */
class FragmentationPropsSpec extends SparkSpec {
  private val rnd = new scala.util.Random(4242)

  private def domains(k: Int): Seq[(Double, Double, Int)] =
    Seq.fill(k) {
      val lo = rnd.nextDouble() * 2000 - 1000
      val span = 0.5 + rnd.nextDouble() * 2000
      (lo, lo + span, 1 + rnd.nextInt(32))
    }

  test("rangeBucket: every in-domain value maps to exactly one bucket whose interval contains it") {
    for ((min, max, n) <- domains(60)) {
      val vs = Seq(min, max, (min + max) / 2) ++
        Seq.fill(20)(min + rnd.nextDouble() * (max - min))
      val width = (max - min) / n
      val cols = vs.zipWithIndex.map { case (v, i) =>
        Fragmentation.rangeBucket(lit(v), n, min, max).as(s"b$i")
      }
      val row = spark.range(1).select(cols: _*).head()
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(!row.isNullAt(i), s"in-domain $v got null (n=$n, [$min,$max])")
        val b = row.getInt(i)
        assert(b >= 0 && b < n, s"v=$v bucket out of range: $b")
        assert(v >= min + b * width - 1e-9 * math.max(1, math.abs(max)))
        assert(
          b == n - 1 || v <= min + (b + 1) * width + 1e-9 * math.max(1, math.abs(max)),
          s"v=$v above bucket $b upper bound (n=$n, [$min,$max])"
        )
      }
    }
  }

  test("hashBucketOf mirror equals the executor hashBucket expression for arbitrary keys") {
    // the derived-pruning rule computes buckets driver-side; a divergence
    // from the executor expression would silently DROP rows from pruned
    // point lookups — the worst failure mode. Longs, negatives and strings.
    val keys: Seq[String] =
      Seq.fill(40)(rnd.nextLong().toString) ++
        Seq.fill(20)(rnd.nextInt(1000).toString) ++
        Seq("0", "-1", "", "abc", "key with spaces", "ünïcödé")
    for (n <- Seq(1, 5, 8, 32)) {
      val cols = keys.zipWithIndex.map { case (k, i) =>
        Fragmentation.hashBucket(lit(k), n).as(s"b$i")
      }
      val row = spark.range(1).select(cols: _*).head()
      keys.zipWithIndex.foreach { case (k, i) =>
        val expect = graft.plans.DeriveFragmentPruning.hashBucketOf(k, n)
        assert(row.getInt(i) == expect, s"key=$k n=$n executor=${row.getInt(i)} driver=$expect")
      }
    }
  }

  test("rangeBucket: out-of-domain values map to null") {
    for ((min, max, n) <- domains(30)) {
      val cols = Seq(min - 1.0, max + 1.0).zipWithIndex.map { case (v, i) =>
        Fragmentation.rangeBucket(lit(v), n, min, max).as(s"b$i")
      }
      val row = spark.range(1).select(cols: _*).head()
      assert(row.isNullAt(0) && row.isNullAt(1), s"out-of-domain value bucketed (n=$n)")
    }
  }

  test("hashBucket: total, in [0, n), deterministic, and reasonably uniform") {
    val keys = Seq.fill(400)(rnd.nextLong())
    val n = 8
    val cols = keys.zipWithIndex.map { case (k, i) =>
      Fragmentation.hashBucket(lit(k), n).as(s"b$i")
    }
    val row1 = spark.range(1).select(cols: _*).head()
    val row2 = spark.range(1).select(cols: _*).head()
    val buckets = keys.indices.map(row1.getInt)
    assert(buckets.forall(b => b >= 0 && b < n))
    assert(buckets == keys.indices.map(row2.getInt), "hashBucket not deterministic")
    val counts = buckets.groupBy(identity).view.mapValues(_.size)
    // 400 keys over 8 buckets: expect ~50 each; loose 3-sigma-ish bound
    assert(counts.values.forall(c => c > 20 && c < 90), s"skewed: ${counts.toMap}")
  }

  test("globalRowNumber: two-phase rank is a dense global 1..N order with no global window") {
    val s = spark
    import s.implicits._
    // enough rows to span many range partitions; shuffled input order
    val keys = rnd.shuffle((1L to 5000L).toVector)
    val df = keys.toDF("k").repartition(16)
    val out = Fragmentation.globalRowNumber(df, Seq("k"), "rn")
    // the plan must contain no unpartitioned window (that is the point)
    val findings = graft.plans.PlanAudit.audit(out)
    assert(!findings.exists(_.rule == "global-window"), findings.mkString("; "))
    val got = out.select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 5000)
    // rank by key: k-th smallest key gets rn = k, densely, exactly once
    got.foreach { case (k, rn) => assert(rn == k, s"key $k got rn $rn") }
    // round-robin on top of it: part = (rn-1) mod n, balanced to within 1
    val parts = Fragmentation
      .roundRobinFragment(df, Seq("k"), 7)
      .groupBy("part").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(parts.keySet == (0 until 7).toSet)
    assert(parts.values.max - parts.values.min <= 1, parts.toString)
  }

  test("globalRowNumber: identical assignment under any input partitioning (drift regression)") {
    // Regression for the round-10 sf0.1 bug: the counts job and numbering
    // job re-planned the range exchange independently (fresh sampler seeds,
    // AQE re-coalescing), so offsets keyed to one partitioning were applied
    // to another. The failure needs MULTIPLE shuffle partitions to surface
    // (with everything coalesced to 1 both jobs trivially agree), so this
    // runs the same frame through very different input partitionings and
    // demands bit-identical rank maps.
    val s = spark
    import s.implicits._
    val keys = rnd.shuffle((1L to 4000L).toVector)
    def ranks(parts: Int): Map[Long, Long] =
      Fragmentation
        .globalRowNumber(keys.toDF("k").repartition(parts), Seq("k"), "rn")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
    val base = ranks(1)
    assert(ranks(3) == base)
    assert(ranks(16) == base)
    assert(ranks(64) == base)
  }
}
