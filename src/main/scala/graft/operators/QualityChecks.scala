package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: evaluate a set of named checks against a
  * table and emit one (check, violations, pass) row per check — the
  * dbt-test / Deequ-style report a pipeline runs before promoting a drop
  * (complement of [[Profiling]]: profiling describes, checks judge).
  *
  * Each check family is a single aggregate or aggregate+join; the report is
  * a union of 1-row relations, so the whole gate is a handful of scans with
  * partial aggregation and nothing on the driver. Violation COUNTS (not
  * booleans) are emitted so a failed gate is immediately sized.
  */
object QualityChecks {

  /** Rows where `col` is null. */
  def nonNull(df: DataFrame, c: String): DataFrame =
    report(s"non_null_$c", df.filter(col(c).isNull))

  /** Duplicate occurrences of a key: total rows minus distinct NON-NULL
    * keys — so null keys count as uniqueness violations too (a null can't
    * prove itself distinct; pair with [[nonNull]] to attribute them).
    */
  def unique(df: DataFrame, c: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(c))).as("violations"))
      .select(
        lit(s"unique_$c").as("check_name"),
        col("violations"),
        (col("violations") === 0L).as("pass")
      )

  /** Rows whose `col` value falls outside the accepted set. */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    report(s"accepted_values_$c", df.filter(!col(c).isin(allowed: _*) || col(c).isNull))

  /** Rows violating an arbitrary row-level predicate (pass = predicate holds). */
  def expression(df: DataFrame, name: String, predicate: Column): DataFrame =
    report(name, df.filter(!predicate || predicate.isNull))

  /** Child rows whose key has no match in the parent table (FK integrity) —
    * a left-anti join, the scalable referential check. Null child keys never
    * match and so count as violations (pair with [[nonNull]] to attribute).
    */
  def referential(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String)
      : DataFrame =
    report(
      s"fk_${childKey}_in_$parentKey",
      child.join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    )

  /** Union the per-check 1-row reports into the gate's result table. */
  def reportAll(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))

  /** Histogram-Based Outlier Score (Goldstein & Dengel 2012) over
    * ALREADY-DISCRETIZED feature columns: hbos(row) = Σ_f −ln(p_f(row)),
    * the log-product of inverse per-feature bin frequencies — the
    * embarrassingly-parallel unsupervised outlier detector (no pairwise
    * distances, no iterations) that screens event streams before the
    * heavier per-group z-score/IQR fences. Assumes feature independence
    * by construction — that trade-off IS the speed.
    *
    * Each feature costs one partial-agg frequency table (bin-cardinality
    * rows, broadcast back) — the row side is touched once, every join is
    * a broadcast hash join, the whole score is one codegen'd projection.
    * Per-term −ln quantizes to 9-dp DECIMAL before the cross-feature sum
    * (no float sum-order), one final rounded cast.
    *
    * @return input columns + `hbos` (rounded to 6 dp)
    */
  def hbosScores(df: DataFrame, idCol: String, featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "hbosScores needs at least one feature column")
    val tot = df.agg(count(lit(1)).cast("long").as("_nt"))
    var cur = df
      .select(col(idCol) +: featureCols.map(col): _*)
      .crossJoin(broadcast(tot))
    featureCols.foreach { f =>
      val freq = df.groupBy(col(f)).agg(count(lit(1)).cast("long").as(s"_nf_$f"))
      cur = cur.join(broadcast(freq), f)
    }
    val terms = featureCols.map { f =>
      round(-log(col(s"_nf_$f").cast("double") / col("_nt")), 9).cast("decimal(18,9)")
    }
    cur
      .withColumn("hbos", round(terms.reduce(_ + _).cast("double"), 6))
      .select(col(idCol) +: featureCols.map(col) :+ col("hbos"): _*)
  }

  private def report(name: String, violations: DataFrame): DataFrame =
    violations
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"), (col("violations") === 0L).as("pass"))
}
