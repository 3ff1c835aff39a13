package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `sample(fraction)` and `rand()` are not reproducible across runs, engines,
  * or partitionings — useless for train/test splits that must be stable for
  * the lifetime of a dataset. Hashing the row KEY instead gives a sample
  * that is (a) uniform, (b) identical on every engine that agrees on md5,
  * (c) stable under repartitioning/retries, and (d) consistent across tables
  * sharing the key (the classic "hash-split" every feature store uses).
  *
  * All narrow expressions — sampling never shuffles; the stratified variant
  * shuffles once on the strata key (window rank).
  */
object Sampling {

  /** Uniform hash position of a key in [0, 1): first 8 md5 hex digits as a
    * fraction of 16^8. Same arithmetic as the DuckDB oracle twin.
    */
  def hashPosition(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0) // 16^8

  /** Deterministic Bernoulli sample: keep rows whose key hashes below
    * `fraction`.
    */
  def bernoulliByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashPosition(col(keyCol)) < fraction)

  /** Deterministic train/test split tag (`test` when the key's hash position
    * falls below `testFraction`). Rows with the same key always land on the
    * same side — across tables, runs, and engines.
    */
  def splitTag(key: Column, testFraction: Double): Column =
    when(hashPosition(key) < testFraction, lit("test")).otherwise(lit("train"))

  /** Leakage-safe train/test split report: the split is assigned at the
    * NEAR-DUP-CLUSTER level (hash of the cluster id), never per document —
    * a near-duplicate of a test document in the training set is exactly the
    * contamination a held-out set exists to prevent, and per-doc hash
    * splitting produces it whenever a cluster's members hash to different
    * sides. One row per split with the doc/cluster census plus
    * `naive_leaky_docs`: how many of this split's documents live in a
    * cluster that per-DOC hashing would have straddled across splits — the
    * leak this operator prevents, measured on the same corpus.
    *
    * Shuffle shape: two partial aggregates keyed on the cluster id and a
    * data-sized equi-join on the same key (co-partitioned — one exchange
    * feeds both), then a 2-row rollup. Nothing global, nothing all-pairs;
    * singleton clusters (the overwhelming mass of a deduped corpus) cost
    * one row each.
    *
    * @param clusters (document id, cluster id) — e.g. [[Dedup.dedupClusters]]
    * @return one row per split: (split, n_docs, n_clusters, docs_ppm,
    *         naive_leaky_docs)
    */
  def clusterSafeSplitReport(
      clusters: DataFrame,
      idCol: String,
      clusterCol: String,
      testFraction: Double
  ): DataFrame = {
    val tagged = clusters.select(
      col(idCol).as("_id"),
      col(clusterCol).as("_cl"),
      splitTag(col(clusterCol), testFraction).as("split"),
      splitTag(col(idCol), testFraction).as("_naive")
    )
    val straddle = tagged
      .groupBy(col("_cl"))
      .agg(countDistinct(col("_naive")).as("_nsplits"))
    val tot = tagged.agg(count(lit(1)).cast("long").as("_tot"))
    tagged
      .join(straddle, "_cl")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("_cl")).cast("long").as("n_clusters"),
        sum(when(col("_nsplits") > 1, 1L).otherwise(0L))
          .cast("long")
          .as("naive_leaky_docs")
      )
      .crossJoin(broadcast(tot))
      .select(
        col("split"),
        col("n_docs"),
        col("n_clusters"),
        expr("n_docs * 1000000L div _tot").cast("long").as("docs_ppm"),
        col("naive_leaky_docs")
      )
  }

  /** Deterministic training-order shard shuffle: every row gets a shard
    * (hash of key mod `nShards`) and a position within its shard (ordered
    * by key hash) — a reproducible pseudo-random global permutation, the
    * final step before a corpus is written out for data-parallel training.
    * One shuffle keyed by shard; within-shard ordering parallelizes across
    * shards (size `nShards` to the writer parallelism — thousands at
    * 100 TB — never 1).
    */
  def shardShuffle(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    val w = Window
      .partitionBy("shard")
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("shard", h % nShards)
      .withColumn("pos", row_number().over(w).cast("bigint"))
  }

  /** Apportioned stratified sample — EXACTLY `total` rows overall,
    * allocated across strata by largest-remainder (Hamilton) apportionment:
    * stratum g gets base ⌊total·n_g/N⌋ plus one extra for the L strata
    * with the largest remainders (ties on the stratum key), where
    * L = total − Σbase — the integer allocation closest to proportional
    * that still sums EXACTLY to the budget, which per-stratum rounding
    * cannot guarantee. Membership within a stratum is the md5-smallest
    * `alloc_g` keys, so samples nest as the budget grows (same contract as
    * [[exactStratifiedSample]], which fixes a RATE; this fixes a TOTAL —
    * the eval-set construction case).
    *
    * Stratum-cardinality window for the remainder ranking; row selection
    * is the usual per-stratum hash-order window. Strata counts are tiny
    * next to the corpus at any scale.
    *
    * @return sampled rows (strataCols, keyCol)
    */
  def apportionedSample(
      df: DataFrame,
      strataCols: Seq[String],
      keyCol: String,
      total: Long
  ): DataFrame = {
    val sc = strataCols.map(col)
    val counts = df.groupBy(sc: _*).agg(count(lit(1)).cast("long").as("_n"))
    val tot = counts.agg(sum(col("_n")).cast("long").as("_t"))
    val based = counts
      .crossJoin(broadcast(tot))
      .withColumn("_base", expr(s"$total * _n div _t"))
      .withColumn("_rem", expr(s"$total * _n % _t"))
    val left = based.agg((lit(total) - sum(col("_base"))).cast("long").as("_l"))
    val wRem = Window.orderBy(col("_rem").desc +: strataCols.map(col): _*)
    val alloc = based
      .withColumn("_rr", row_number().over(wRem).cast("long"))
      .crossJoin(broadcast(left))
      .withColumn("_alloc", col("_base") + when(col("_rr") <= col("_l"), 1L).otherwise(0L))
      .select(sc :+ col("_alloc"): _*)
    val wPick = Window
      .partitionBy(sc: _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(wPick).cast("long"))
      .join(alloc, strataCols)
      .filter(col("_rk") <= col("_alloc"))
      .select(sc :+ col(keyCol): _*)
  }

  /** Neyman-optimal stratified allocation (Neyman 1934): budget `total`
    * split across strata ∝ N_h·σ_h — the allocation that MINIMIZES the
    * variance of the stratified mean, versus [[apportionedSample]]'s
    * proportional split (identical when within-stratum spreads are equal;
    * a volatile stratum earns extra samples exactly when they buy the most
    * precision). The weight stays exact as long as possible:
    * N_h·σ_h = √(N_h·Σx² − (Σx)²) — the radicand an exact DECIMAL(38,0)
    * integer (Σx² overflows BIGINT on cents columns), one correctly-rounded
    * sqrt, quantized to 6 dp and re-scaled to an exact integer weight so
    * the largest-remainder split runs in pure integer arithmetic
    * (base = ⌊K·w_h/Σw⌋, extras to the largest remainders, priority-order
    * ties) and sums EXACTLY to the budget. Strata tables are tiny at any
    * scale; the one corpus pass is the moments aggregate.
    *
    * @param valueCol exact integer units (cents/ppm — the repo contract)
    * @return one row per stratum: (strataCols…, n_rows, weight, alloc)
    */
  def neymanAllocation(
      df: DataFrame,
      strataCols: Seq[String],
      valueCol: String,
      total: Long
  ): DataFrame = {
    require(total > 0, "total must be positive")
    val sc = strataCols.map(col)
    val xd = col(valueCol).cast("decimal(38,0)")
    val stats = df
      .groupBy(sc: _*)
      .agg(
        count(lit(1)).cast("long").as("_n"),
        sum(xd).cast("decimal(38,0)").as("_s"),
        sum(xd * xd).cast("decimal(38,0)").as("_s2")
      )
    val w = sqrt((col("_n") * col("_s2") - col("_s") * col("_s")).cast("double"))
    val weighted = stats.withColumn(
      "_wu",
      (round(w, 6).cast("decimal(28,6)") * 1000000).cast("decimal(38,0)")
    )
    val sw = weighted.agg(sum(col("_wu")).cast("decimal(38,0)").as("_sw"))
    val based = weighted
      .crossJoin(broadcast(sw))
      .withColumn("_base", expr(s"CAST(($total * _wu) div _sw AS BIGINT)"))
      .withColumn("_rem", expr(s"($total * _wu) % _sw"))
    val left = based.agg((lit(total) - sum(col("_base"))).cast("long").as("_l"))
    val wRem = Window.orderBy(col("_rem").desc +: strataCols.map(col): _*)
    based
      .withColumn("_rr", row_number().over(wRem).cast("long"))
      .crossJoin(broadcast(left))
      .select(
        sc ++ Seq(
          col("_n").as("n_rows"),
          round(w, 6).as("weight"),
          (col("_base") + when(col("_rr") <= col("_l"), 1L).otherwise(0L))
            .cast("long").as("alloc")
        ): _*
      )
  }

  /** Consistent-hash shard assignment (Karger ring with virtual nodes) on
    * an md5-hex ring: vnode position = md5("shard<s>:<v>"), key position =
    * md5(key); a key belongs to the vnode with the smallest position ≥ its
    * own, wrapping to the ring's minimum. Positions stay md5 hex STRINGS
    * compared lexicographically — no numeric conversion, so both engines
    * (and any re-implementation) order the ring identically.
    *
    * Why this beats `hash mod N` at fleet scale: growing N → N+1 shards
    * keeps every existing vnode position fixed and only inserts the new
    * shard's vnodes, so the ONLY keys that move are those landing on the
    * new vnodes — ~1/(N+1) of the corpus — where mod-N reshuffles almost
    * everything. The ring (nShards·vnodesPerShard rows) is collected once
    * — config-bounded like Selection's histograms — and broadcast as
    * LITERAL array/map expressions, so assignment is a pure
    * codegen-friendly projection fused into the scan: no join, no
    * shuffle, nothing but the columns.
    *
    * @return input columns + shard
    */
  def consistentShardAssign(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      vnodesPerShard: Int = 16
  ): DataFrame = {
    require(nShards > 0 && vnodesPerShard > 0, "positive ring dimensions")
    val ring: Seq[(String, Int)] = (for {
      s <- 0 until nShards
      v <- 0 until vnodesPerShard
    } yield {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md
        .digest(s"shard$s:$v".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x")
        .mkString
      (hex, s)
    }).sortBy(_._1)
    val positions = ring.map(_._1)
    val kpos = md5(col(keyCol).cast("string"))
    val chosen = coalesce(
      array_min(filter(typedLit(positions), p => p >= kpos)),
      lit(positions.head)
    )
    df.withColumn("shard", element_at(typedLit(ring.toMap), chosen).cast("int"))
  }

  /** Deterministic per-stratum sample: the k smallest key-hashes within each
    * stratum (one shuffle on the strata columns).
    */
  def stratifiedByHash(
      df: DataFrame,
      strataCols: Seq[String],
      keyCol: String,
      k: Int
  ): DataFrame = {
    val w = Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Exact-count stratified sample: each stratum contributes EXACTLY
    * round(N_g · pct/100) rows — the count guarantee a hash-threshold
    * Bernoulli sample cannot give (its per-stratum counts are binomial).
    * Selection order inside a stratum is the md5 hash of the key (with the
    * key as tie-break), so membership is stable across engines, runs and
    * partitionings, and growing `pct` only ADDS rows (nested samples).
    * One stratum-keyed window + a broadcast per-stratum target join.
    *
    * @param pct integer percentage (round-half-up per stratum)
    */
  def exactStratifiedSample(
      df: DataFrame,
      strataCols: Seq[String],
      keyCol: String,
      pct: Int
  ): DataFrame = {
    val strata = strataCols.map(col)
    val targets = df
      .groupBy(strata: _*)
      .agg(expr(s"(count(*) * $pct + 50) div 100").as("_target"))
    val w = Window
      .partitionBy(strata: _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(w).cast("long"))
      .join(broadcast(targets), strataCols)
      .filter(col("_rk") <= col("_target"))
      .drop("_rk", "_target")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-ES): each row draws its uniform from the md5 hash position
    * of its key and scores `ln(u)/w` — the k LARGEST scores are a weighted
    * sample where inclusion probability scales with `weightCol`. Same
    * reproducibility contract as the other samplers (stable across engines,
    * runs and partitionings), which an RNG-based weighted sample cannot
    * give. The top-k is a TakeOrderedAndProject (never a global sort); the
    * rank window after it touches only k rows.
    *
    * Determinism note: ln() is libm (not correctly rounded), but it is
    * applied to identical doubles on every engine and the order statistics
    * of n hash positions are ~1/n apart — last-ulp drift cannot reorder
    * them (same argument as the oracle's replay; scores round to 6 in the
    * output for hash stability).
    *
    * @param weightCol positive weights; larger weight → more likely sampled
    */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    val score = log(hashPosition(col(keyCol))) / col(weightCol)
    val w = Window.orderBy(col("_sk").desc, col(keyCol))
    df.withColumn("_sk", score)
      .orderBy(col("_sk").desc, col(keyCol))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(keyCol), col(weightCol), round(col("_sk"), 6).as("sample_key"), col("rank"))
  }

  /** Deterministic 2-arm experiment assignment + sample-ratio-mismatch
    * check: each distinct key lands in arm md5(salt|key) mod 2, and the
    * summary row carries the exact-integer SRM statistic — for two equal
    * expected halves, χ² = (n_a − n_b)²/n, reported in ppm. An SRM gate is
    * the first validity check any experimentation pipeline runs; hash
    * assignment makes it replayable across engines, runs and partitionings.
    * Plan: distinct (one keyed shuffle) → narrow hash → single partial agg
    * to one row.
    */
  def srmCheck(df: DataFrame, keyCol: String, salt: String = "ab"): DataFrame =
    df.select(col(keyCol))
      .distinct()
      .select(
        pmod(
          conv(substring(md5(concat(lit(s"$salt|"), col(keyCol).cast("string"))), 1, 8), 16, 10)
            .cast("long"),
          lit(2L)
        ).as("_arm")
      )
      .agg(
        count(lit(1)).as("n_units"),
        sum(when(col("_arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("_arm") === 1, 1L).otherwise(0L)).cast("long").as("n_b")
      )
      .select(
        col("n_units"),
        col("n_a"),
        col("n_b"),
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 div n_units").cast("long").as("srm_ppm")
      )

  // Cumulative Poisson(1) thresholds scaled to 16^4 (one 4-hex-digit slice
  // per replicate): P(W ≤ k) for k = 0..3; mass beyond 4 is capped into
  // w = 4. 16-bit granularity mis-sizes each band by < 2e-5 — irrelevant
  // to a bootstrap — and lets ONE md5 digest carry 8 replicates' draws.
  // Integer literals so both engines compare BIGINTs — no float CDF at
  // query time.
  private val PoissonCum16: Seq[Long] = Seq(24109L, 48218L, 60273L, 64291L)

  /** Poissonized bootstrap replicate means (the scalable bootstrap): row i's
    * weight in replicate j is Poisson(1)-distributed, derived from an md5
    * slice so every engine replays the same resample — the standard trick
    * that turns B bootstrap resamples into one linear pass (B× row
    * expansion, all map-side + one B-group partial agg; no per-replicate
    * shuffles, no driver state). Weights cap at 4 (P ≈ 0.4%, folded into
    * the top band).
    *
    * Hash economics: each md5(g|key) digest is cut into eight 4-hex
    * (16-bit) slices, one per replicate — ⌈B/8⌉ digests per row instead of
    * B (8× less hashing; the hash, not the agg, dominates this operator's
    * cost). Digests are computed BEFORE the replicate explode so each is
    * evaluated once per row, not once per (row, replicate).
    *
    * `valueCol` must be an exact integer metric (cents); replicate means
    * report as exact-BIGINT millis via one integer division, so the whole
    * replicate table is bit-deterministic.
    */
  def poissonBootstrapMeans(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      b: Int = 32,
      salt: String = "bs"
  ): DataFrame = {
    require(b > 0, "replicate count must be positive")
    val nDigests = (b + 7) / 8
    val digests = array((0 until nDigests).map { g =>
      md5(concat(lit(s"$salt$g|"), col(keyCol).cast("string")))
    }: _*)
    val hv = conv(
      expr("substring(element_at(_m, CAST(rep div 8 AS INT) + 1), (rep % 8) * 4 + 1, 4)"),
      16,
      10
    ).cast("long")
    val weight = when(hv < PoissonCum16(0), 0L)
      .when(hv < PoissonCum16(1), 1L)
      .when(hv < PoissonCum16(2), 2L)
      .when(hv < PoissonCum16(3), 3L)
      .otherwise(4L)
    df.select(col(keyCol), col(valueCol))
      .withColumn("_m", digests)
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("_w", weight)
      .groupBy(col("rep").cast("long").as("rep"))
      .agg(
        sum("_w").cast("long").as("n_eff"),
        sum(col("_w") * col(valueCol)).cast("long").as("_s")
      )
      .select(
        col("rep"),
        col("n_eff"),
        expr("_s * 1000 div n_eff").cast("long").as("mean_milli")
      )
  }

  /** k-center greedy (Gonzalez 1985 max-min farthest-point traversal) over
    * 64-bit Hamming sketches — the deterministic diverse-coreset selector a
    * curation pipeline uses to pick maximally-spread exemplars (coverage
    * seeding, eval-set diversity, dedup-cluster representatives). Seed =
    * smallest id; each of the k−1 rounds picks the unchosen row whose
    * distance to its NEAREST chosen center is LARGEST (ties on id). The
    * greedy result is a 2-approximation of the optimal k-center cover.
    *
    * Iterative-driver shape (like kmeansStep / PageRank): the per-doc
    * min-distance column updates with one codegen'd `least` per round —
    * the sketch rides as 4 longs and each distance is 4 bit_count(xor)
    * terms against center LITERALS, so a round is one narrow map + one
    * ordered-limit-1 reduction (TakeOrdered, no global sort); k rows total
    * ever reach the driver. localCheckpoint truncates the k-deep lineage.
    *
    * @param sketches (idCol: LONG, sketchCol: 64-char '0'/'1' string —
    *                 [[Dedup.simhash]]'s shape)
    * @return k rows: (sel_order, idCol, dist) — dist is the max-min
    *         distance at selection time; the seed carries the -1 sentinel
    */
  /** Facility-location greedy selection (E419) — the COVERAGE coreset next
    * to [[kCenterGreedy]]'s outlier-chasing max-min: maximize
    * F(S) = Σ_v max_{s∈S} sim(v, s), sim = 64 − Hamming over the SimHash
    * sketches, by the classic greedy (1−1/e approximation — Nemhauser et
    * al. 1978; the facility-location instance of submodular data selection
    * à la CRAIG/similar coreset work). Where k-center picks the point
    * FARTHEST from the selection (great for spread, hijacked by outliers),
    * facility location picks the candidate whose adoption IMPROVES the most
    * points — dense modes first, outliers last.
    *
    * Scale shape: candidates come from a bounded md5-spread pool
    * (`poolSize`, the lazy-greedy pool standard at corpus scale), so each
    * greedy step is ONE distributed pass — every candidate's marginal gain
    * Σ_v max(0, sim_c(v) − best(v)) computed as `poolSize` aggregate
    * columns over the points frame (no shuffle, scalar result), then one
    * narrow `best`-update pass with the winner's sketch as a literal.
    * Points state is (id, 4×long sketch words, best) — never a pairs
    * materialization.
    *
    * @return k rows (sel_order, idCol, gain, objective) — marginal gains
    *         and the running objective, both exact integers
    */
  def facilityLocationGreedy(
      sketches: DataFrame,
      idCol: String,
      sketchCol: String,
      k: Int,
      poolSize: Int = 16
  ): DataFrame = {
    require(k >= 1 && poolSize >= k, "need k >= 1 and poolSize >= k")
    val spark = sketches.sparkSession
    import spark.implicits._
    val base = sketches
      .select(
        col(idCol).cast("long").as("_id") +:
          (0 until 4).map(b =>
            conv(substring(col(sketchCol), b * 16 + 1, 16), 2, 10).cast("long").as(s"_i$b")
          ): _*
      )
    def simTo(sig: String): Column =
      lit(64L) - (0 until 4)
        .map { b =>
          val word = java.lang.Long.parseLong(sig.substring(b * 16, b * 16 + 16), 2)
          bit_count(col(s"_i$b").bitwiseXOR(lit(word)))
        }
        .reduce(_ + _)
        .cast("long")
    val pool: Array[(Long, String)] = sketches
      .select(col(idCol).cast("long").as("_id"), col(sketchCol).as("_sig"))
      .withColumn("_h", md5(col("_id").cast("string")))
      .orderBy(col("_h"), col("_id"))
      .limit(poolSize)
      .select("_id", "_sig")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    require(pool.nonEmpty, "facilityLocationGreedy on an empty frame")
    var pts = base.withColumn("_best", lit(0L)).localCheckpoint()
    var chosen = Vector.empty[(Long, Long, Long, Long)]
    var objective = 0L
    var step = 0
    while (step < k && chosen.size < pool.length) {
      val remaining = pool.filterNot(c => chosen.exists(_._2 == c._1))
      val aggs = remaining.zipWithIndex.map { case ((_, sig), i) =>
        sum(greatest(simTo(sig) - col("_best"), lit(0L))).cast("long").as(s"_g$i")
      }
      val row = pts.agg(aggs.head, aggs.tail: _*).collect()(0)
      val (cid, csig, cgain) = remaining.indices
        .map(i => (remaining(i)._1, remaining(i)._2, row.getLong(i)))
        .minBy { case (id, _, g) => (-g, id) } // gain DESC, id ASC
      objective += cgain
      chosen :+= ((step.toLong, cid, cgain, objective))
      if (step < k - 1) {
        val upd = pts
          .withColumn("_best", greatest(col("_best"), simTo(csig)))
          .localCheckpoint()
        pts.unpersist()
        pts = upd
      }
      step += 1
    }
    chosen.toDF("sel_order", idCol, "gain", "objective")
  }

  def kCenterGreedy(
      sketches: DataFrame,
      idCol: String,
      sketchCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "kCenterGreedy needs k >= 1")
    val spark = sketches.sparkSession
    import spark.implicits._
    val base = sketches
      .select(
        col(idCol).cast("long").as("_id") +:
          col(sketchCol).as("_sig") +:
          (0 until 4).map(b =>
            conv(substring(col(sketchCol), b * 16 + 1, 16), 2, 10).cast("long").as(s"_i$b")
          ): _*
      )
      .localCheckpoint()
    def hamTo(sig: String): Column =
      (0 until 4)
        .map { b =>
          val word = java.lang.Long.parseLong(sig.substring(b * 16, b * 16 + 16), 2)
          bit_count(col(s"_i$b").bitwiseXOR(lit(word)))
        }
        .reduce(_ + _)
        .cast("long")
    val seed = base.orderBy(col("_id")).limit(1).select("_id", "_sig").collect()
    require(seed.nonEmpty, "kCenterGreedy on an empty frame")
    var chosen = Vector((0L, seed(0).getLong(0), -1L))
    var mind = base.withColumn("_d", hamTo(seed(0).getString(1))).localCheckpoint()
    var i = 1
    var exhausted = false
    while (i < k && !exhausted) {
      val ids = chosen.map(_._2)
      val nxt = mind
        .filter(!col("_id").isin(ids: _*))
        .orderBy(col("_d").desc, col("_id"))
        .limit(1)
        .select("_id", "_d", "_sig")
        .collect()
      if (nxt.isEmpty) exhausted = true
      else {
        chosen :+= ((i.toLong, nxt(0).getLong(0), nxt(0).getLong(1)))
        if (i < k - 1) {
          val upd = mind
            .withColumn("_d", least(col("_d"), hamTo(nxt(0).getString(2))))
            .localCheckpoint()
          mind.unpersist()
          mind = upd
        }
        i += 1
      }
    }
    chosen.toDF("sel_order", idCol, "dist")
  }
}
