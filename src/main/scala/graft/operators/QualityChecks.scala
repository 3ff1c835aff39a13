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

  /** Cohen's κ agreement between two boolean labelers — the calibration
    * read run before a cheap gate (a length cut, a regex) is trusted to
    * stand in for an expensive one (a classifier): raw agreement p_o
    * overstates concordance when the base rate is skewed, κ subtracts the
    * agreement two INDEPENDENT labelers with these marginals would reach by
    * chance. κ = (p_o − p_e)/(1 − p_e), all exact integer ppm: p_o from the
    * confusion diagonal, p_e from the marginal products, the final division
    * on the ppm ladder. Degenerate p_e = 1 (both labelers constant) → 0.
    *
    * One partial aggregate over the corpus; everything else is scalar
    * arithmetic on a 1-row frame.
    *
    * @return one row: (n, n11, n00, n10, n01, po_ppm, pe_ppm, kappa_ppm)
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col(aCol) && col(bCol), 1L).otherwise(0L)).cast("long").as("n11"),
      sum(when(!col(aCol) && !col(bCol), 1L).otherwise(0L)).cast("long").as("n00"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).cast("long").as("n10"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).cast("long").as("n01")
    ).select(
      col("n"),
      col("n11"),
      col("n00"),
      col("n10"),
      col("n01"),
      // n = 0 (empty frame): agreement is vacuous — report 0, don't crash
      when(col("n") === 0L, 0L)
        .otherwise(expr("(n11 + n00) * 1000000L div n"))
        .cast("long")
        .as("po_ppm"),
      when(col("n") === 0L, 0L)
        .otherwise(
          expr("((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) * 1000000L div (n * n)")
        )
        .cast("long")
        .as("pe_ppm")
    ).withColumn(
      "kappa_ppm",
      when(col("pe_ppm") === 1000000L, 0L)
        .otherwise(expr("(po_ppm - pe_ppm) * 1000000L div (1000000L - pe_ppm)"))
        .cast("long")
    )

  private def report(name: String, violations: DataFrame): DataFrame =
    violations
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"), (col("violations") === 0L).as("pass"))
}
