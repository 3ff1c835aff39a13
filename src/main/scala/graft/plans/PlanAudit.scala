package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Plan auditor: the scale-antipattern review this library applies to its own
  * entries (see PlanQualitySpec), exposed as an API any pipeline can run on
  * any DataFrame BEFORE launching it against 100 TB. Each finding names the
  * rule, a severity, and the offending node — the automated form of
  * "would this plan survive a 1000-executor cluster?".
  *
  * Detected rules:
  *   - `global-window`  (error): a window function with no PARTITION BY —
  *     every row flows through ONE task regardless of cluster size.
  *   - `cartesian`      (error): CartesianProductExec — an unkeyed
  *     fact×fact product; almost always a missing join condition.
  *   - `nested-loop`    (warn): BroadcastNestedLoopJoin — legitimate for
  *     1-row scalar frames, quadratic for anything larger; review the
  *     build side.
  *   - `unpushed-filter` (warn): a Filter directly above a parquet scan
  *     that reports no pushed-down predicates — the scan reads rows the
  *     filter immediately discards (typically a non-foldable or
  *     UDF-wrapped predicate).
  *   - `smj-small-side` (info): a sort-merge join whose one side's
  *     estimated size is under the broadcast threshold — stats were
  *     unknown at planning; AQE usually rescues this at runtime, but a
  *     `broadcast()` hint makes it deterministic.
  */
object PlanAudit {

  final case class Finding(rule: String, severity: String, node: String)

  def audit(df: DataFrame): Seq[Finding] = {
    val logicalFindings = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty =>
        Finding("global-window", "error", w.simpleString(80))
    }
    val threshold = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .replaceAll("[bB]$", "").trim match {
      case s if s.endsWith("k") || s.endsWith("K") => s.dropRight(1).toLong * 1024
      case s if s.endsWith("m") || s.endsWith("M") => s.dropRight(1).toLong * 1024 * 1024
      case s => try s.toLong catch { case _: NumberFormatException => 10485760L }
    }
    def walk(p: SparkPlan): Seq[Finding] = {
      val here: Seq[Finding] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case _: CartesianProductExec =>
          Seq(Finding("cartesian", "error", p.simpleString(80)))
        case _: BroadcastNestedLoopJoinExec =>
          Seq(Finding("nested-loop", "warn", p.simpleString(80)))
        case f: FilterExec =>
          // descend through pass-through wrappers (codegen, columnar
          // adapters) — the scan is rarely the literal child in an
          // executed plan
          def scanBelow(n: SparkPlan): Option[FileSourceScanExec] = n match {
            case s: FileSourceScanExec => Some(s)
            case w: org.apache.spark.sql.execution.WholeStageCodegenExec => scanBelow(w.child)
            case i: org.apache.spark.sql.execution.InputAdapter => scanBelow(i.child)
            case c: org.apache.spark.sql.execution.ColumnarToRowExec => scanBelow(c.child)
            case p: org.apache.spark.sql.execution.ProjectExec => scanBelow(p.child)
            case _ => None
          }
          // dataFilters lists pushdown CANDIDATES; the scan's metadata
          // reports what actually reached the parquet reader
          scanBelow(f.child) match {
            case Some(scan)
                if scan.metadata.get("PushedFilters").contains("[]")
                  && f.condition.deterministic =>
              Seq(Finding("unpushed-filter", "warn", scan.simpleString(80)))
            case _ => Nil
          }
        case j: SortMergeJoinExec =>
          val sizes = Seq(j.left, j.right).map(_.logicalLink.map(_.stats.sizeInBytes))
          if (sizes.exists(_.exists(_ < threshold)))
            Seq(Finding("smj-small-side", "info", j.simpleString(80)))
          else Nil
        case _ => Nil
      }
      // AQE wrappers and query stages are leaves to TreeNode traversal, so
      // recurse manually; ordinary nodes descend through children
      here ++ (p match {
        case _: AdaptiveSparkPlanExec | _: QueryStageExec => Nil
        case _ => p.children.flatMap(walk)
      })
    }
    logicalFindings ++ walk(df.queryExecution.executedPlan)
  }

  /** The findings as a DataFrame — so audits compose with the rest of the
    * engine (store them, diff them across releases, gate CI on them).
    */
  def auditDF(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = audit(df).map(f => Row(f.rule, f.severity, f.node))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rule", StringType, nullable = false),
        StructField("severity", StringType, nullable = false),
        StructField("node", StringType, nullable = false)
      ))
    )
  }
}
