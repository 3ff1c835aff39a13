package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PlanAudit

/** The plan auditor must flag each antipattern on a crafted offender and
  * stay quiet on the engine's own (scale-clean) entries.
  */
class PlanAuditSpec extends SparkSpec {

  test("global window is flagged as an error") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(i => (i, i * 2)).toDF("a", "b")
      .withColumn("rk", rank().over(Window.orderBy("a")))
    val f = PlanAudit.audit(df)
    assert(f.exists(x => x.rule == "global-window" && x.severity == "error"), f)
  }

  test("cartesian product is flagged; keyed join is not") {
    val s = spark
    import s.implicits._
    val a = (1 to 5).toDF("x")
    val b = (1 to 5).toDF("y")
    // tiny sides broadcast into a nested loop by default; disable the
    // threshold so the planner shows its true cartesian
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = a.crossJoin(b).filter(col("x") =!= col("y")) // stays unkeyed
      assert(PlanAudit.audit(cart).exists(_.rule == "cartesian"),
        PlanAudit.audit(cart))
      val keyed = a.join(b, col("x") === col("y"))
      assert(!PlanAudit.audit(keyed).exists(_.rule == "cartesian"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("unpushed filter above a parquet scan is flagged") {
    withTempDir { dir =>
      val s = spark
      import s.implicits._
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/t.parquet")
      // a non-convertible predicate (UDF) defeats parquet pushdown
      val ugly = org.apache.spark.sql.functions.udf((x: Long) => x % 3 == 0)
      val df = spark.read.parquet(s"$dir/t.parquet").filter(ugly(col("id")))
      val f = PlanAudit.audit(df)
      assert(f.exists(_.rule == "unpushed-filter"), f)
      // the same filter written declaratively pushes down and is clean
      val ok = spark.read.parquet(s"$dir/t.parquet").filter(col("id") % 3 === 0)
      assert(!PlanAudit.audit(ok).exists(_.rule == "unpushed-filter"),
        PlanAudit.audit(ok))
    }
  }

  test("flagship engine entries audit clean of error-severity findings") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    for (name <- Seq("q_join_revenue_rollup", "dedup_minhash_pairs",
                     "txt_tfidf", "q_window_top_order_per_cust")) {
      val errors = PlanAudit.audit(SparkEntry.queries(name)(spark, sfDir))
        .filter(_.severity == "error")
      assert(errors.isEmpty, s"$name: $errors")
    }
  }

  test("auditDF returns the findings as rows") {
    val s = spark
    import s.implicits._
    val df = (1 to 4).toDF("a").withColumn("rk", rank().over(Window.orderBy("a")))
    val out = PlanAudit.auditDF(spark, df)
    assert(out.columns.toSeq == Seq("rule", "severity", "node"))
    assert(out.filter(col("rule") === "global-window").count() == 1)
  }
}
