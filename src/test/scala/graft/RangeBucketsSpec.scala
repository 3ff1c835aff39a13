package graft

import org.apache.spark.sql.functions._

import graft.operators.FragmentEngine

/** Property-style tests for the fixed-width bucket semantics (SURVEY §5
  * oracle style 2 / §7.4.1): the Spark Column expression must agree with the
  * driver-side loop for every rating in [0,5] and every n, including exact
  * boundary values where float accumulation matters.
  */
class RangeBucketsSpec extends SparkSpec {

  test("driver bucketOf: boundary value goes to the LOWER bucket") {
    val b = RangeBuckets(5, 0.0, 5.0)
    assert(b.bucketOf(0.0) === 0)
    assert(b.bucketOf(1.0) === 0) // interior boundary → lower
    assert(b.bucketOf(1.0000001) === 1)
    assert(b.bucketOf(3.0) === 2)
    assert(b.bucketOf(5.0) === 4)
    assert(b.bucketOf(-0.1) === -1)
    assert(b.bucketOf(5.1) === -1)
  }

  test("bucketsOverlapping replicates the selectMode pruning loop") {
    val b = RangeBuckets(5, 0.0, 5.0)
    assert(b.bucketsOverlapping(1.5, 3.5) === Seq(1, 2, 3))
    assert(b.bucketsOverlapping(0.0, 5.0) === Seq(0, 1, 2, 3, 4))
    assert(b.bucketsOverlapping(4.5, 4.6) === Seq(4))
    assert(b.bucketsOverlapping(2.0, 2.0) === Seq(1)) // boundary → lower bucket
  }

  test("Spark bucketExpr agrees with driver bucketOf for sampled (rating, n)") {
    val rnd = new scala.util.Random(42)
    val vs: Seq[Double] =
      (0 to 10).map(_ * 0.5) ++                    // every half-step boundary
        Seq(-1.0, -0.001, 5.0001, 6.0) ++          // out-of-domain edges
        Seq.fill(400)(rnd.nextDouble() * 5.0)      // uniform interior
    import spark.implicits._
    for (n <- 1 to 20) {
      val buckets = RangeBuckets(n, 0.0, 5.0)
      val df = vs.toDF("rating")
        .withColumn("part", FragmentEngine.bucketExpr(buckets, col("rating")))
      val got = df.collect().map(r => if (r.isNullAt(1)) -1 else r.getInt(1))
      val expected = vs.map(buckets.bucketOf)
      assert(got.toSeq === expected, s"divergence at n=$n")
    }
  }

  test("bounds accumulate like the reference loop (float accumulation, not i*inc)") {
    val b = RangeBuckets(3, 0.0, 5.0)
    val inc = 5.0 / 3
    // accumulated: 0, inc, inc+inc, then exactly max for the last bucket
    assert(b.bounds(0) === ((0.0, inc)))
    assert(b.bounds(1) === ((inc, inc + inc)))
    assert(b.bounds(2) === ((inc + inc, 5.0)))
  }
}
