package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.plans.MvRewrite.MvDef

/** The MV rewrite must (a) actually fire — the physical plan reads the MV
  * parquet, never the base table; (b) be invisible — results and schema
  * byte-identical to the un-rewritten aggregate; (c) stay strict — any
  * non-derivable shape (filter, avg, distinct, non-grouped column) leaves
  * the plan alone.
  */
class MvRewriteSpec extends SparkSpec {

  private def withMv[T](f: (String, String) => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    // two group dims, deterministic measures; dup keys so counts > 1
    val rows = for { i <- 1 to 60 } yield ("g" + (i % 3), "h" + (i % 2), i.toDouble, i.toLong)
    rows.toDF("ga", "gb", "m1", "m2").write.mode("overwrite").parquet(base)
    val defn = MvDef(base, mv, Seq("ga", "gb"),
      Map("sum_m1" -> "m1", "sum_m2" -> "m2"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try f(base, mv)
    finally MvRewrite.clear()
  }

  test("subset-group rollup answers from the MV with identical results") {
    withMv { (base, mv) =>
      val q = spark.read.parquet(base)
        .groupBy("ga")
        .agg(sum("m1").as("s1"), count(lit(1)).as("n"), sum("m2").as("s2"))
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("mv.parquet"), s"rewrite did not fire:\n$phys")
      assert(!phys.contains("base.parquet"), s"base still scanned:\n$phys")
      // ground truth from a rule-blind recompute (avg blocks the rewrite,
      // so derive sums from it… simpler: clear the registry and re-plan)
      MvRewrite.clear()
      val truth = spark.read.parquet(base)
        .groupBy("ga")
        .agg(sum("m1").as("s1"), count(lit(1)).as("n"), sum("m2").as("s2"))
      assert(!truth.queryExecution.executedPlan.toString.contains("mv.parquet"))
      assert(q.schema == truth.schema, s"${q.schema} vs ${truth.schema}")
      val a = q.orderBy("ga").collect().map(_.toSeq).toSeq
      val b = truth.orderBy("ga").collect().map(_.toSeq).toSeq
      assert(a == b, s"$a vs $b")
    }
  }

  test("full-group query and downstream operators survive the rewrite") {
    withMv { (base, _) =>
      val q = spark.read.parquet(base)
        .groupBy("ga", "gb")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 5)
        .orderBy("ga", "gb")
      assert(q.queryExecution.executedPlan.toString.contains("mv.parquet"))
      val rows = q.collect().map(r =>
        (r.getAs[String]("ga"), r.getAs[String]("gb"), r.getAs[Long]("n")))
      assert(rows.length == 6 && rows.forall(_._3 == 10L), rows.mkString(";"))
    }
  }

  test("strictness: filters, avg, distinct, and foreign scans block the rewrite") {
    withMv { (base, _) =>
      def physOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
      // a filter between aggregate and scan
      val filtered = spark.read.parquet(base).filter(col("m1") > 10)
        .groupBy("ga").agg(sum("m1").as("s"))
      assert(!physOf(filtered).contains("mv.parquet"), physOf(filtered))
      // a non-derivable aggregate
      val avged = spark.read.parquet(base).groupBy("ga").agg(avg("m1").as("a"))
      assert(!physOf(avged).contains("mv.parquet"))
      // distinct sum
      val dist = spark.read.parquet(base).groupBy("ga")
        .agg(sum_distinct(col("m1")).as("s"))
      assert(!physOf(dist).contains("mv.parquet"))
      // grouping on a non-materialized column
      val wrongGroup = spark.read.parquet(base).groupBy("m2")
        .agg(sum("m1").as("s"))
      assert(!physOf(wrongGroup).contains("mv.parquet"))
      // an unrelated table with the same shape
      val s = spark
      import s.implicits._
      val otherDir = java.nio.file.Files.createTempDirectory("graft-mv-other").toString
      Seq(("g1", 1.0)).toDF("ga", "m1").write.parquet(s"$otherDir/t.parquet")
      val other = spark.read.parquet(s"$otherDir/t.parquet")
        .groupBy("ga").agg(sum("m1").as("s"))
      assert(!physOf(other).contains("mv.parquet"))
    }
  }

  test("decimal sums keep their original narrower type through the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-dec").toString
    val base = s"$dir/base.parquet"
    val mv = s"$dir/mv.parquet"
    val s = spark
    import s.implicits._
    (1 to 20).map(i => ("g" + (i % 2), BigDecimal(i).setScale(2)))
      .toDF("ga", "m").write.parquet(base)
    val defn = MvDef(base, mv, Seq("ga"), Map("sum_m" -> "m"), Some("cnt"))
    MvRewrite.build(spark, defn)
    MvRewrite.register(spark, defn)
    try {
      val q = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(q.queryExecution.executedPlan.toString.contains("mv.parquet"))
      MvRewrite.clear()
      val truth = spark.read.parquet(base).groupBy("ga").agg(sum("m").as("s"))
      assert(q.schema == truth.schema, s"${q.schema} vs ${truth.schema}")
      MvRewrite.register(spark, defn)
      assert(q.orderBy("ga").collect().map(_.toSeq).toSeq ==
        truth.orderBy("ga").collect().map(_.toSeq).toSeq)
    } finally MvRewrite.clear()
  }
}
