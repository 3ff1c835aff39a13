package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKeyExec

/** The custom physical operator: Filter(row_number <= k) over a window must
  * plan as TopKPerKeyExec (partial + final, no WindowExec, no full sort) and
  * return exactly what WindowExec returns on a total order.
  */
class TopKPerKeySpec extends SparkSpec {

  /** Collect TopKPerKeyExec nodes, descending through AQE wrappers (collect
    * alone stops at AdaptiveSparkPlanExec, which is a leaf).
    */
  private def topkExecs(df: org.apache.spark.sql.DataFrame): Seq[TopKPerKeyExec] = {
    df.collect() // force AQE to finalize
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[TopKPerKeyExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case t: TopKPerKeyExec => Seq(t)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  private def hasWindowExec(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case _: org.apache.spark.sql.execution.window.WindowExec => true
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      }.contains(true)
    walk(df.queryExecution.executedPlan)
  }

  private def topkDf(k: Int) = {
    val s = spark
    import s.implicits._
    // 3 keys × 200 rows, values crafted so the order is total per key
    val df = (1 to 600)
      .map(i => (i % 3, (i * 7919) % 601, i))
      .toDF("key", "value", "uid")
    val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("rewrite fires: TopKPerKeyExec partial+final, no WindowExec") {
    val df = topkDf(5)
    val execs = topkExecs(df)
    assert(execs.size == 2, s"expected partial+final, got:\n${df.queryExecution.executedPlan}")
    assert(execs.count(_.rankAttr.isDefined) == 1, "exactly one rank-emitting final")
    assert(!hasWindowExec(df),
      s"WindowExec must be replaced:\n${df.queryExecution.executedPlan}")
  }

  test("results equal the WindowExec formulation on a total order") {
    val got = topkDf(5)
    val expected = withDisabled { topkDf(5) }
    assert(got.count() == 15)
    val g = got.collect().map(_.toSeq).toSet
    val e = expected.collect().map(_.toSeq).toSet
    assert(g == e, s"bounded-heap result diverges:\n got=${g.take(5)}\n exp=${e.take(5)}")
  }

  test("rank values are the true 1..k sequence per key") {
    val rows = topkDf(3).collect()
    val byKey = rows.groupBy(_.getInt(0))
    assert(byKey.size == 3)
    byKey.values.foreach { ks =>
      assert(ks.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
    }
  }

  test("k=1 via rn = 1 equality predicate") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 10, 1), (1, 20, 2), (2, 30, 3)).toDF("key", "value", "uid")
    val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
    val top1 = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(topkExecs(top1).nonEmpty)
    assert(top1.select("uid").as[Int].collect().toSet == Set(2, 3))
  }

  test("no rewrite for conjunctive predicates or non-rank functions") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i % 2, i)).toDF("key", "value")
    val w = Window.partitionBy("key").orderBy("value")
    val conj = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("value") > 10)
    assert(topkExecs(conj).isEmpty, "conjunction must not rewrite")
    // and the conjunction still computes correctly through WindowExec
    assert(conj.count() == withDisabled { conj.count() })
    val lagged = df.withColumn("lv", lag("value", 1).over(w)).filter(col("lv") <= 3)
    assert(topkExecs(lagged).isEmpty, "lag() must not rewrite")
  }

  test("rank() and dense_rank() rewrite and match WindowExec, ties included") {
    val s = spark
    import s.implicits._
    // heavy ties: value = i/10 gives 10-row tie groups per key
    val df = (1 to 400).map(i => (i % 2, i / 10, i)).toDF("key", "value", "uid")
      .repartition(4)
    val w = Window.partitionBy("key").orderBy(col("value"))
    for (fn <- Seq(rank(), dense_rank())) {
      def run() = df.withColumn("rn", fn.over(w)).filter(col("rn") <= 4)
        .collect().map(_.toSeq).toSet
      val planned = df.withColumn("rn", fn.over(w)).filter(col("rn") <= 4)
      assert(topkExecs(planned).size == 2, s"$fn must rewrite:\n${planned.queryExecution.executedPlan}")
      val got = run()
      val exp = withDisabled { run() }
      assert(got == exp, s"$fn diverges: got=${got.size} exp=${exp.size}")
      assert(got.nonEmpty)
    }
    // rank ≤ k keeps MORE than k rows under ties — the superset partial must not clip
    val rk = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 4).count()
    assert(rk == withDisabled {
      df.withColumn("rn", rank().over(w)).filter(col("rn") <= 4).count()
    })
  }

  test("maxBufferedRows cap: pass-through fallback stays correct under a tiny budget") {
    val s = spark
    import s.implicits._
    // 500 keys × 4 rows in one task with a 16-row buffer: almost everything
    // passes through unreduced; the final stage must still filter exactly
    spark.conf.set(graft.plans.TopKPerKey.MaxBufferedKey, "16")
    try {
      val df = (1 to 2000).map(i => (i % 500, (i * 7919) % 2003, i))
        .toDF("key", "value", "uid").repartition(2)
      val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
      def run() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .collect().map(_.toSeq).toSet
      val got = run()
      assert(topkExecs(df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)).size == 2)
      val exp = withDisabled { run() }
      assert(got == exp, s"capped partial diverges: ${got.size} vs ${exp.size}")
      // rank mode under the same cap (tie buckets + pass-through interleave)
      val wr = Window.partitionBy("key").orderBy(col("value").desc)
      def runRank() = df.withColumn("rn", rank().over(wr)).filter(col("rn") <= 2)
        .collect().map(_.toSeq).toSet
      assert(runRank() == withDisabled { runRank() })
    } finally spark.conf.unset(graft.plans.TopKPerKey.MaxBufferedKey)
  }

  test("adversarial cardinality: far more distinct keys per task than the buffer admits") {
    val s = spark
    import s.implicits._
    // 50k rows, EVERY key distinct, single task, 64-row budget: the partial
    // can reduce at most ~64 keys and must pass ~49,936 rows through
    // unreduced — the worst case for any per-key map-side structure. The
    // final stage still filters exactly and the rewrite stays planned
    // (fallback is row-level, not plan-level).
    spark.conf.set(graft.plans.TopKPerKey.MaxBufferedKey, "64")
    try {
      val df = (1 to 50000).map(i => (i, (i * 48271) % 99991, i)).toDF("key", "value", "uid")
        .coalesce(1)
      val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      assert(topkExecs(q).size == 2, "rewrite must stay planned under the cap")
      val got = q.collect()
      // every key has exactly one row → all 50k survive with rn = 1
      assert(got.length == 50000 && got.forall(_.getAs[Int]("rn") == 1))
      val exp = withDisabled {
        df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
          .collect().map(_.toSeq).toSet
      }
      assert(got.map(_.toSeq).toSet == exp)
    } finally spark.conf.unset(graft.plans.TopKPerKey.MaxBufferedKey)
  }

  test("shuffle volume is bounded by k·keys·partitions, not input size") {
    val s = spark
    import s.implicits._
    // 30k rows, 3 keys, 6 input partitions, k=5 → the partial must shuffle
    // ≤ 5·3·6 = 90 rows (vs 30,000 unreduced)
    val df = (1 to 30000).map(i => (i % 3, (i * 7919) % 30011, i))
      .toDF("key", "value", "uid").repartition(6)
    val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
    val top = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    top.collect()
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.metrics.collect {
            case (name, m) if name.toLowerCase.contains("records") => m.value
          }.toSeq
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
      }.flatten
    val recs = shuffles(top.queryExecution.executedPlan)
      .filter(_ > 0) // the repartition(6) exchange carries the full 30k — skip it
      .filter(_ <= 30000 - 1)
    assert(recs.nonEmpty, s"no reduced shuffle found:\n${top.queryExecution.executedPlan}")
    assert(recs.min <= 90, s"partial did not bound the shuffle: $recs")
  }

  test("global top-k (no partition keys) gathers to one group") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => ((i * 31) % 101, i)).toDF("value", "uid")
    val w = Window.orderBy(col("value").desc, col("uid"))
    val top = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    assert(topkExecs(top).size == 2)
    val expected = withDisabled { top.collect().map(_.toSeq).toSet }
    assert(top.collect().map(_.toSeq).toSet == expected)
  }

  test("randomized equivalence sweep: heap path == WindowExec path for many shapes") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random corpora: vary row count, key cardinality,
    // k, and partition count; values made unique per key so the order is
    // total and both paths are comparable row-for-row
    for (seed <- 1 to 4; k <- Seq(1, 3, 7)) {
      val n = 100 + seed * 137
      val nk = 1 + (seed * 3) % 7
      val rows = (1 to n).map { i =>
        val h = (i * 2654435761L + seed * 40503L) & 0x7fffffffL
        ((h % nk).toInt, (h / nk % 10007).toInt, i)
      }
      val df = rows.toDF("key", "value", "uid").repartition(1 + seed % 5)
      val w = Window.partitionBy("key").orderBy(col("value").desc, col("uid"))
      def run() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .collect().map(_.toSeq).toSet
      val got = run()
      val exp = withDisabled { run() }
      assert(got == exp, s"seed=$seed k=$k nk=$nk: ${got.size} vs ${exp.size}")
    }
  }

  test("driver entry q_window_top_order_per_cust runs through the operator") {
    val df = SparkEntry.queries("q_window_top_order_per_cust")(spark, "/root/testdata/sf0.001")
    assert(topkExecs(df).size == 2,
      "the flagship top-k entry must exercise TopKPerKeyExec — pattern drift?")
  }

  test("driver entry q_window_rank_topk runs through the operator in rank mode") {
    val df = SparkEntry.queries("q_window_rank_topk")(spark, "/root/testdata/sf0.001")
    val execs = topkExecs(df)
    assert(execs.size == 2,
      "the rank-mode top-k entry must exercise TopKPerKeyExec — pattern drift?")
    assert(execs.forall(_.mode == graft.plans.TopKPerKey.ModeRank))
  }

  private def withDisabled[A](f: => A): A = {
    spark.conf.set(graft.plans.TopKPerKey.EnabledKey, "false")
    try f
    finally spark.conf.set(graft.plans.TopKPerKey.EnabledKey, "true")
  }
}
