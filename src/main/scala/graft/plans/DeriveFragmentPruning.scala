package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

import graft.RangeBuckets

/** Optimizer rule: derive fragment-partition predicates from rating
  * predicates — the one piece of engine knowledge Catalyst cannot infer
  * itself, because `part = bucket(rating)` is a graft invariant, not a
  * catalog fact.
  *
  * When a Filter over a fragment dataset (output has both `rating` and the
  * `part` partition column) constrains `rating`, we conjoin the implied
  * `part IN (overlapping buckets)` predicate; Spark's stock
  * PruneFileSourcePartitions then turns it into FileIndex partition pruning,
  * so pruned fragment directories are never listed or read. This gives any
  * ad-hoc DataFrame/SQL query over the fragmented dataset the same pruning
  * the engine's own rangeQuery/pointQuery do by hand (asserted equivalent in
  * PlanQualitySpec).
  *
  * Bucket metadata travels via the session conf key `spark.graft.range.meta`
  * (= "n,min,max"), set by FragmentEngine when a range fragmentation is
  * created or opened. Registered through
  * [[graft.GraftExtensions]].injectOptimizerRule — the standard
  * SparkSessionExtensions path.
  */
case class DeriveFragmentPruning() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val metaStr =
      try SQLConf.get.getConfString(DeriveFragmentPruning.MetaKey, "")
      catch { case _: Throwable => "" }
    if (metaStr.isEmpty) return plan
    val buckets = metaStr.split(",") match {
      case Array(n, mn, mx) => RangeBuckets(n.toInt, mn.toDouble, mx.toDouble)
      case _                => return plan
    }
    plan.transform {
      case f @ Filter(cond, child)
          if child.output.exists(_.name == "part") &&
            child.output.exists(_.name == "rating") &&
            !cond.references.exists(_.name == "part") =>
        ratingBounds(cond) match {
          case Some((lo, hi)) =>
            // clamp to the fragmented domain: stored rows are always within
            // [min, max], so an out-of-domain query range selects no buckets
            val clampedLo = math.max(lo, buckets.min)
            val clampedHi = math.min(hi, buckets.max)
            val parts =
              if (clampedLo > clampedHi) Seq.empty
              else buckets.bucketsOverlapping(clampedLo, clampedHi)
            val partAttr = child.output.find(_.name == "part").get
            val partPred: Expression =
              if (parts.isEmpty) Literal.FalseLiteral
              else In(partAttr, parts.map(i => Literal(i)))
            Filter(And(cond, partPred), child)
          case None => f
        }
    }
  }

  /** Extract a conservative [lo, hi] interval implied for `rating` by the
    * conjunctive predicate; None if rating is unconstrained (or only
    * constrained under OR/NOT, where deriving bounds would be unsound
    * without interval union logic).
    */
  private def ratingBounds(e: Expression): Option[(Double, Double)] = {
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    var found = false
    def num(l: Literal): Option[Double] = l.value match {
      case n: Number => Some(n.doubleValue())
      case _         => None
    }
    def isRating(x: Expression): Boolean = x match {
      case a: Attribute => a.name == "rating"
      case _            => false
    }
    def walk(x: Expression): Unit = x match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, lit: Literal) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case GreaterThan(a, lit: Literal) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case LessThanOrEqual(a, lit: Literal) if isRating(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case LessThan(a, lit: Literal) if isRating(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case EqualTo(a, lit: Literal) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      // mirrored literal-first forms
      case GreaterThanOrEqual(lit: Literal, a) if isRating(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case GreaterThan(lit: Literal, a) if isRating(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case LessThanOrEqual(lit: Literal, a) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case LessThan(lit: Literal, a) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case EqualTo(lit: Literal, a) if isRating(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      case _ => () // other conjuncts don't constrain rating; OR/NOT ignored
    }
    walk(e)
    if (found) Some((lo, hi)) else None
  }
}

object DeriveFragmentPruning {
  val MetaKey = "spark.graft.range.meta"
}
