package graft

import graft.operators.Sampling

/** E419 facility-location greedy: dense modes before outliers (the exact
  * opposite of k-center's pick order), submodular gain decay, determinism.
  */
class FacilitySelectSpec extends SparkSpec {

  private val zeros = "0" * 64
  private val half = "1" * 32 + "0" * 32
  private val ones = "1" * 64

  private def fixture = {
    val s = spark
    import s.implicits._
    // ids 0..9: mode A (identical), 10..12: mode B, 13: extreme outlier
    ((0 until 10).map(i => (i.toLong, zeros)) ++
      (10 until 13).map(i => (i.toLong, half)) ++
      Seq((13L, ones))).toDF("doc_id", "simhash")
  }

  test("greedy picks the dense mode, then the next mode, the outlier last") {
    val picks = Sampling
      .facilityLocationGreedy(fixture, "doc_id", "simhash", k = 3, poolSize = 14)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // step 1: an A member (covers 10 points at sim 64 + B at 32): gain
    // 10·64 + 3·32 = 736 — hand-computed; tie among A members → smallest id
    assert(picks(0) == ((0L, 0L, 736L, 736L)), s"got ${picks(0)}")
    // step 2: a B member (B pts gain 32 each + outlier 32): 128
    assert(picks(1)._2 == 10L && picks(1)._3 == 128L)
    // step 3: the outlier itself (64 − best 32 = 32)
    assert(picks(2)._2 == 13L && picks(2)._3 == 32L)
    assert(picks(2)._4 == 736L + 128L + 32L, "objective must accumulate the gains")
    // submodularity: marginal gains weakly decrease along the greedy path
    assert(picks.map(_._3).sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("contrast with k-center: max-min chases the outlier immediately") {
    val kc = Sampling
      .kCenterGreedy(fixture, "doc_id", "simhash", k = 2)
      .collect()
      .map(r => r.getLong(1))
    assert(kc(1) == 13L, "k-center's second pick must be the extreme outlier")
    val fl = Sampling
      .facilityLocationGreedy(fixture, "doc_id", "simhash", k = 2, poolSize = 14)
      .collect()
      .map(r => r.getLong(1))
    assert(!fl.contains(13L), "facility location must not burn early picks on the outlier")
  }

  test("selection is deterministic and partition-invariant on the corpus") {
    val sk = graft.operators.Dedup
      .simhash(Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    def run(parts: Int) = Sampling
      .facilityLocationGreedy(sk.repartition(parts), "doc_id", "simhash", k = 4, poolSize = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val a = run(1)
    assert(a == run(9))
    assert(a.map(_._3).sliding(2).forall { case Seq(x, y) => y <= x })
  }
}
