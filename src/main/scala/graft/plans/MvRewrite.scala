package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Aggregate materialized-view rewrite — the warehouse capability that turns
  * "we precomputed the rollup" into queries that never touch the fact table:
  * an `Aggregate` whose grouping columns are a SUBSET of a registered MV's
  * grouping columns and whose aggregates are all MV-derivable (SUM of a
  * materialized measure, COUNT(*) against a materialized count) is rewritten
  * to RE-aggregate the MV — sums of sums and sums of counts are exact, so a
  * (returnflag, linestatus) rollup answers any returnflag-only query from
  * |groups| rows instead of the corpus. At 100 TB this is the difference
  * between a broadcast-sized scan and a fact-table scan per dashboard tile.
  *
  * Scope (strict by design — a wrong rewrite is silent data corruption):
  * grouping exprs must be bare base columns; every aggregate must be an
  * undistinct, unfiltered SUM of a materialized measure or COUNT(*)/COUNT(1)
  * with a materialized count; the aggregate must sit DIRECTLY on the base
  * relation (modulo a column-pruning Project of bare attributes) — any
  * Filter in between disables the rewrite (residual-predicate pushdown into
  * the MV is a correctness minefield when the predicate references
  * non-grouped columns). AVG/MIN/MAX are not derivable from this MV shape
  * and block the rewrite. FRESHNESS is the caller's contract, exactly as in
  * every rename-arbitrated warehouse: register the MV after building it,
  * re-register (or [[MvRewrite.clear]]) after base-table churn.
  *
  * Output fidelity: the rewritten plan reuses the original output exprIds
  * (aliases pinned to them) and casts re-aggregated sums back to the
  * original aggregate's data type where decimal widening would otherwise
  * change it — downstream operators see byte-identical schema.
  */
object MvRewrite {

  /** One registered rollup: `mvPath` holds `SELECT groupCols, sum(base) AS
    * measure…, count(*) AS countCol FROM basePath GROUP BY groupCols`.
    *
    * @param sums mv measure column -> base column it sums
    */
  case class MvDef(
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, String],
      countCol: Option[String]
  )

  private[plans] case class Registered(defn: MvDef, plan: LogicalPlan)
  private val registry = TrieMap.empty[String, Registered]

  /** Build the MV parquet from the base table — the one corpus-sized
    * aggregation this rule amortizes away for every later query.
    */
  def build(spark: SparkSession, defn: MvDef): Unit = {
    val base = spark.read.parquet(defn.basePath)
    val aggs = defn.sums.toSeq.sortBy(_._1).map { case (mvCol, baseCol) =>
      sum(col(baseCol)).as(mvCol)
    } ++ defn.countCol.map(c => count(lit(1)).cast("long").as(c)).toSeq
    base
      .groupBy(defn.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write
      .mode("overwrite")
      .parquet(defn.mvPath)
  }

  /** Register (or refresh) an MV: resolves the MV parquet ONCE and keeps its
    * analyzed plan; the optimizer rule grafts fresh copies of it into
    * matching queries. Freshness is the caller's contract.
    */
  def register(spark: SparkSession, defn: MvDef): Unit = {
    val plan = spark.read.parquet(defn.mvPath).queryExecution.analyzed
    registry.put(defn.mvPath, Registered(defn, plan))
  }

  def clear(): Unit = registry.clear()

  private[plans] def registered: Seq[Registered] = registry.values.toSeq

  /** Root paths of the file relation under `plan`, looking through a
    * bare-attribute Project (column pruning); None for anything else.
    */
  private def baseScanPaths(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseScanPaths(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString))
    case _ => None
  }

  private def pathMatches(scanPaths: Seq[String], basePath: String): Boolean = {
    val b = basePath.stripSuffix("/")
    scanPaths.exists { p =>
      val s = p.stripSuffix("/")
      s == b || s.endsWith("/" + b.stripPrefix("/")) || b.endsWith("/" + s.stripPrefix("/"))
    }
  }

  /** The rewrite, or None when any strictness condition fails. */
  private[plans] def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val scan = baseScanPaths(agg.child).getOrElse(return None)
    val reg = registry.values.find(r => pathMatches(scan, r.defn.basePath)).getOrElse(return None)
    val defn = reg.defn

    // grouping: bare base columns, all materialized in the MV
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if defn.groupCols.contains(a.name) => a
      case _ => return None
    }

    // fresh MV relation per rewrite site (attribute ids must not collide
    // across two rewritten aggregates in one plan)
    val mvPlan = reg.plan match {
      case lr: LogicalRelation => lr.newInstance()
      case other => other
    }
    def mvAttr(name: String): AttributeReference =
      mvPlan.output.collectFirst { case a: AttributeReference if a.name == name => a }.get

    def reSum(srcMvCol: String, original: NamedExpression): NamedExpression = {
      val summed = AggregateExpression(Sum(mvAttr(srcMvCol)), Complete, isDistinct = false)
      val fixed: Expression =
        if (summed.dataType == original.dataType) summed else Cast(summed, original.dataType)
      Alias(fixed, original.name)(exprId = original.exprId)
    }

    val rewritten = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Sum(a: AttributeReference, _) =>
            val mvCol = defn.sums.collectFirst { case (mv, base) if base == a.name => mv }
            mvCol match {
              case Some(mv) => reSum(mv, al)
              case None => return None
            }
          case Count(Seq(Literal(1, _))) | Count(Seq()) =>
            defn.countCol match {
              case Some(c) => reSum(c, al)
              case None => return None
            }
          case _ => return None
        }
      case _ => return None
    }
    val newGrouping = groupAttrs.map(a => mvAttr(a.name))
    Some(Aggregate(newGrouping, rewritten, mvPlan))
  }
}

/** The optimizer rule (see [[MvRewrite]]); injected via
  * [[graft.GraftExtensions]], a no-op until an MV is registered.
  */
case class MvRewriteRule() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRewrite.registered.isEmpty) return plan
    plan.transform { case agg: Aggregate =>
      MvRewrite.rewrite(agg).getOrElse(agg)
    }
  }
}
