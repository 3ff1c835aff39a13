package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** E415 margin-based bitext mining: partial-matching law, hub demotion,
  * alignment recovery and determinism.
  */
class MarginMineSpec extends SparkSpec {

  private def vecsDF(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val dim = 8
  private def v(bumps: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(dim)(1f)
    bumps.foreach { case (i, d) => a(i) += d }
    a.toSeq
  }

  test("mining yields a mutual-best matching that pairs aligned vectors") {
    val out = Similarity
      .marginMinePairs(
        vecsDF(
          0L -> v(0 -> 0.30f), 2L -> v(1 -> 0.30f), // src: even ids
          1L -> v(0 -> 0.31f), 3L -> v(1 -> 0.31f) // tgt: odd ids, aligned
        ),
        "vec_id", "embedding", isSrc = col("vec_id") % 2 === 0,
        kR = 2, bits = 2, dim = dim)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(0L -> 1L, 2L -> 3L),
      s"each src must mine its aligned tgt, got $out")
  }

  test("output is a partial matching: no src or tgt appears twice; deterministic") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity
      .marginMinePairs(emb, "vec_id", "embedding",
        isSrc = col("vec_id") % 2 === 0, kR = 10, bits = 4, dim = 64)
      .localCheckpoint()
    val n = out.count()
    assert(n > 0, "the sf0.001 split must mine some pairs")
    assert(out.select("src_id").distinct().count() == n, "src side must be unique")
    assert(out.select("tgt_id").distinct().count() == n, "tgt side must be unique")
    // every mined src is even, every tgt odd — the declared split
    assert(out.filter(col("src_id") % 2 =!= 0 || col("tgt_id") % 2 =!= 1).count() == 0)
    // determinism under repartition
    val out2 = Similarity
      .marginMinePairs(emb.repartition(7), "vec_id", "embedding",
        isSrc = col("vec_id") % 2 === 0, kR = 10, bits = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet == out2)
  }

  test("hardNegatives: same-label excluded, guard band drops near-identical candidates") {
    val s = spark
    import s.implicits._
    val dim = 8
    def v(bumps: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(dim)(1f)
      bumps.foreach { case (i, d) => a(i) += d }
      a.toSeq
    }
    // query 0 (label 1); 1: SAME label, closest — must be excluded;
    // 2: different label, nearly identical (cos > 0.99) — guard band drops;
    // 3 and 4: different label, genuinely hard — the mined negatives,
    // ranked by cosine
    val emb = Seq(
      (0L, v(0 -> 0.40f), 1),
      (1L, v(0 -> 0.41f), 1),
      (2L, v(0 -> 0.40f, 7 -> 0.01f), 2),
      (3L, v(0 -> 0.40f, 6 -> 0.60f), 2),
      (4L, v(1 -> 0.40f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .hardNegatives(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        "label", k = 10, maxCos = 0.99, bits = 1, seed = 1, dim = dim)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
      .sortBy(_._4)
    assert(!out.exists(_._1 == 1L), "same-label candidates must never be negatives")
    assert(!out.exists(_._1 == 2L), s"the guard band must drop cos>0.99 candidates, got $out")
    assert(out.map(_._1).toSeq == Seq(3L, 4L),
      s"hard negatives ranked by cosine, got $out")
    assert(out.forall(r => r._2 == 2 && r._3 <= 0.99))
  }

  test("a hub that tops every raw-cosine list is demoted by its own density") {
    // src s0 points toward A (+0.4 on dim0), s2 toward B (+0.4 on dim1).
    // Their true targets t1/t3 carry an extra off-axis bump (+0.45) that
    // costs them ~0.005 cosine; the hub t5 sits between A and B at
    // cos ≈ 0.9955 to BOTH srcs — strictly above cos(s0,t1) ≈ 0.9909 and
    // cos(s2,t3): raw mutual-cosine would pair one src with the hub and
    // strand the other. The margin's density correction (the hub is near
    // everything, so r_bwd(hub) is the largest) must recover both true
    // alignments.
    val emb = vecsDF(
      0L -> v(0 -> 0.40f), 2L -> v(1 -> 0.40f),
      1L -> v(0 -> 0.40f, 7 -> 0.45f), 3L -> v(1 -> 0.40f, 6 -> 0.45f),
      5L -> v(0 -> 0.20f, 1 -> 0.20f)
    )
    // pin the premise: the hub really does top both srcs' raw-cosine lists
    val cosOf = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") % 2 === 1), emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(cosOf((0L, 5L)) > cosOf((0L, 1L)), "fixture: hub must top s0's raw list")
    assert(cosOf((2L, 5L)) > cosOf((2L, 3L)), "fixture: hub must top s2's raw list")
    // seed 1 co-buckets all five vectors (probed), so the margin math —
    // not bucket membership — decides the matching
    val out = Similarity
      .marginMinePairs(emb, "vec_id", "embedding",
        isSrc = col("vec_id") % 2 === 0, kR = 3, bits = 2, seed = 1, dim = dim)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(0L -> 1L, 2L -> 3L),
      s"margin mining must recover both true alignments past the hub, got $out")
  }

  test("autoBits: integer-exact, floor 4, ceiling 32, covers 100 TB-scale counts") {
    assert(Similarity.autoBits(0L) == 4)
    assert(Similarity.autoBits(4096L) == 4) // 2^4 * 256 = 4096 exactly
    assert(Similarity.autoBits(4097L) == 5)
    assert(Similarity.autoBits(20000L) == 7)
    assert(Similarity.autoBits(1000000L) == 12)
    assert(Similarity.autoBits(400L * 1000L * 1000L * 1000L) == 31) // ~100 TB of 64-dim floats
    assert(Similarity.autoBits(Long.MaxValue) == 32)
    // monotone non-decreasing over a coarse sweep (a regression here would
    // silently re-open the fixed-bucket quadratic)
    val sweep = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L).map(Similarity.autoBits)
    assert(sweep == sweep.sorted, s"autoBits must be monotone in n, got $sweep")
  }

  test("default bucketing keeps cross-set candidate volume linear as the corpus grows") {
    val s = spark
    import s.implicits._
    val d4 = 4
    // deterministic pseudo-random directions via md5-derived components —
    // same recipe as the hyperplanes, so no RNG in the spec
    def mk(n: Int) = s.range(n.toLong).select(col("id").as("vec_id"))
      .withColumn("embedding",
        expr("transform(sequence(0, 3), i -> " +
          "cast(cast(conv(substr(md5(concat(cast(vec_id as string), ':', cast(i as string))), 1, 4), 16, 10) " +
          "as double) / 65536.0 - 0.5 as float))"))
    def candidateVolume(n: Int): Long = {
      val bits = Similarity.autoBits(n.toLong)
      Similarity.lshBuckets(mk(n), "vec_id", "embedding", bits = bits, dim = d4)
        .groupBy("bucket")
        .agg((sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)) *
          sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L))).as("pairs"))
        .agg(sum("pairs")).head().getLong(0)
    }
    val small = candidateVolume(4096)
    val big = candidateVolume(16384)
    // fixed-bits bucketing grows pairs quadratically: 4x corpus -> ~16x
    // pairs. AutoBits grows the bucket count instead: 4x corpus -> ~4x
    // pairs. 8x is the midpoint guard (dim-4 signatures are coarse, so
    // occupancy is noisier than at dim 64).
    assert(big.toDouble / small <= 8.0,
      s"auto-bits candidate volume must grow ~linearly: $small -> $big " +
        s"(ratio ${big.toDouble / small})")
  }

  test("hot-bucket cap drops the skew bucket, keeps the rest, and logs") {
    // 200 identical src + 200 identical tgt vectors pile into ONE bucket
    // (identical signatures at any bits): per-side df 200 > cap
    // max(64, 16*ceil(404^0.25)) = 80 -> dropped. The aligned pair points
    // the OPPOSITE direction, lands in the complementary bucket, survives.
    val blobSrc = (0 until 200).map(i => (2L * i + 100000L) -> v(0 -> 0.2f))
    val blobTgt = (0 until 200).map(i => (2L * i + 200001L) -> v(0 -> 0.2f))
    def neg(bumps: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(dim)(-1f)
      bumps.foreach { case (i, d) => a(i) += d }
      a.toSeq
    }
    val pair = Seq(0L -> neg(0 -> -0.30f), 1L -> neg(0 -> -0.31f))
    val emb = vecsDF((blobSrc ++ blobTgt ++ pair): _*)
    val out = Similarity
      .marginMinePairs(emb, "vec_id", "embedding",
        isSrc = col("vec_id") % 2 === 0, kR = 2, dim = dim)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(!out.exists { case (a, b) => a >= 100000L || b >= 100000L },
      s"the hot blob bucket must be capped out of the candidate join, got $out")
    assert(out == Map(0L -> 1L), s"cap must not touch the cold bucket's pair, got $out")
    // exact mode keeps the blob
    val exact = Similarity
      .marginMinePairs(emb, "vec_id", "embedding",
        isSrc = col("vec_id") % 2 === 0, kR = 2, dim = dim, maxBucketDf = Long.MaxValue)
      .collect()
    assert(exact.exists(r => r.getLong(0) >= 100000L),
      "exact mode (maxBucketDf = Long.MaxValue) must keep hot-bucket pairs")
  }
}
