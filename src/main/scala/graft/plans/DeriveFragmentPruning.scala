package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

import graft.RangeBuckets

/** Optimizer rule: derive fragment-partition predicates from value-column
  * predicates — the one piece of engine knowledge Catalyst cannot infer
  * itself, because `part = bucket(value)` is a graft invariant, not a
  * catalog fact.
  *
  * When a Filter over a fragment dataset (output has both the fragmented
  * value column and the `part` partition column) constrains the value, we
  * conjoin the implied `part IN (overlapping buckets)` predicate; Spark's
  * stock PruneFileSourcePartitions then turns it into FileIndex partition
  * pruning, so pruned fragment directories are never listed or read. This
  * gives any ad-hoc DataFrame/SQL query over a fragmented dataset the same
  * pruning the engine's own rangeQuery/pointQuery do by hand (asserted
  * equivalent in PlanQualitySpec).
  *
  * Bucket metadata travels via the session conf key `spark.graft.range.meta`
  * = `style,column,n,min,max,path`, published by [[graft.operators.FragmentEngine]]
  * (`style=ref`: the reference's accumulated-bound boundary rule) and
  * [[graft.operators.Fragmentation]] (`style=closed`: closed-form width
  * buckets). Overlap is computed with the SAME arithmetic as the matching
  * assignment expression, so pruning can never disagree with assignment at a
  * float boundary. Registered through [[graft.GraftExtensions]]
  * .injectOptimizerRule — the standard SparkSessionExtensions path.
  */
case class DeriveFragmentPruning() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val metaStr =
      try SQLConf.get.getConfString(DeriveFragmentPruning.MetaKey, "")
      catch { case _: Throwable => "" }
    if (metaStr.isEmpty) return plan
    // path is last and parsed with a split limit: it may itself contain commas
    val (style, valueCol, n, mn, mx, dsPath) = metaStr.split(",", 6) match {
      case Array(s, c, n0, mn0, mx0, p) =>
        (s, c, n0.toInt, mn0.toDouble, mx0.toDouble, p.stripSuffix("/"))
      case _ => return plan
    }
    plan.transform {
      case f @ Filter(cond, child)
          if style == "hash" &&
            child.output.exists(_.name == "part") &&
            child.output.exists(_.name == valueCol) &&
            !cond.references.exists(_.name == "part") &&
            scansFragmentedDataset(child, dsPath) =>
        // hash scheme: only EQUALITY / IN predicates imply buckets (an
        // interval says nothing about md5 positions)
        equalityValues(cond, valueCol) match {
          case Some(vals) =>
            val parts = vals.map(v => DeriveFragmentPruning.hashBucketOf(v, n)).distinct
            val partAttr = child.output.find(_.name == "part").get
            val partPred: Expression =
              if (parts.isEmpty) Literal.FalseLiteral
              else In(partAttr, parts.map(i => Literal(i)))
            Filter(And(cond, partPred), child)
          case None => f
        }
      case f @ Filter(cond, child)
          if style != "hash" &&
            child.output.exists(_.name == "part") &&
            child.output.exists(_.name == valueCol) &&
            !cond.references.exists(_.name == "part") &&
            scansFragmentedDataset(child, dsPath) =>
        valueBounds(cond, valueCol) match {
          case Some((lo, hi)) =>
            // clamp to the fragmented domain: stored rows are always within
            // [min, max], so an out-of-domain query range selects no buckets
            val clampedLo = math.max(lo, mn)
            val clampedHi = math.min(hi, mx)
            val parts: Seq[Int] =
              if (clampedLo > clampedHi) Seq.empty
              else if (style == "ref")
                RangeBuckets(n, mn, mx).bucketsOverlapping(clampedLo, clampedHi)
              else {
                // closed-form width rule — identical arithmetic to
                // Fragmentation.rangeBucket, so overlap == assignment
                val width = (mx - mn) / n
                val b0 = math.min(math.floor((clampedLo - mn) / width).toInt, n - 1)
                val b1 = math.min(math.floor((clampedHi - mn) / width).toInt, n - 1)
                b0 to b1
              }
            val partAttr = child.output.find(_.name == "part").get
            val partPred: Expression =
              if (parts.isEmpty) Literal.FalseLiteral
              else In(partAttr, parts.map(i => Literal(i)))
            Filter(And(cond, partPred), child)
          case None => f
        }
    }
  }

  /** True iff the subtree actually scans the published fragmented dataset —
    * a file relation whose root paths sit at/under `dsPath`. Matching by
    * column names alone would misfire on ANY DataFrame that happens to carry
    * `part` + the value column (the engine's own round-robin dataset does!)
    * and silently drop its rows; the dataset path is the identity. Both scan
    * tiers match: the v1 `LogicalRelation` (DataFrame reads) and the v2
    * `DataSourceV2Relation` over a `FileTable` (reads through the
    * [[graft.catalog.GraftTableCatalog]] table surface) — this rule runs in
    * the operator-optimization batch, BEFORE V2ScanRelationPushDown, so the
    * conjoined `part` predicate reaches the v2 scan's partition filters.
    */
  private def scansFragmentedDataset(plan: LogicalPlan, dsPath: String): Boolean = {
    def underDs(rp: org.apache.hadoop.fs.Path): Boolean = {
      val p = rp.toUri.getPath
      p == dsPath || p.startsWith(dsPath + "/")
    }
    dsPath.nonEmpty && plan.collectLeaves().exists {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.exists(underDs)
          case _ => false
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        // the insertable fragment tables wrap the parquet FileTable —
        // unwrap so the table surface keeps both pruning tiers
        val t = r.table match {
          case w: graft.catalog.FragmentWritableTable => w.delegate
          case other => other
        }
        t match {
          case ft: org.apache.spark.sql.execution.datasources.v2.FileTable =>
            ft.fileIndex.rootPaths.exists(underDs)
          case _ => false
        }
      case _ => false
    }
  }

  /** Collect the literal values the conjunctive predicate pins the key column
    * to via `=` or `IN` — None when unconstrained (or constrained only under
    * OR/NOT, where derivation would be unsound). Only integer/string
    * literals qualify: their Scala `toString` is guaranteed to match Spark's
    * `cast(key AS STRING)` rendering, which the md5 bucket hashes; float
    * renderings are not, so they conservatively bail out.
    */
  private def equalityValues(e: Expression, name: String): Option[Seq[String]] = {
    def isTarget(x: Expression): Boolean = x match {
      case a: Attribute => a.name == name
      case _            => false
    }
    def litStr(l: Literal): Option[String] = l.value match {
      case null                                             => None
      case u: org.apache.spark.unsafe.types.UTF8String      => Some(u.toString)
      case i: Byte                                          => Some(i.toString)
      case i: Short                                         => Some(i.toString)
      case i: Int                                           => Some(i.toString)
      case i: Long                                          => Some(i.toString)
      case _                                                => None
    }
    var found: Option[Seq[String]] = None
    def record(vals: Seq[Option[String]]): Unit =
      // every literal must be derivable, else the conjunct is unusable
      if (vals.nonEmpty && vals.forall(_.isDefined) && found.isEmpty)
        found = Some(vals.flatten)
    def walk(x: Expression): Unit = x match {
      case And(l, r)                                => walk(l); walk(r)
      case EqualTo(a, lit: Literal) if isTarget(a)  => record(Seq(litStr(lit)))
      case EqualTo(lit: Literal, a) if isTarget(a)  => record(Seq(litStr(lit)))
      case In(a, lits) if isTarget(a) && lits.forall(_.isInstanceOf[Literal]) =>
        record(lits.map(l => litStr(l.asInstanceOf[Literal])))
      case _ => ()
    }
    walk(e)
    found
  }

  /** Extract a conservative [lo, hi] interval implied for the value column by
    * the conjunctive predicate; None if unconstrained (or only constrained
    * under OR/NOT, where deriving bounds would be unsound without interval
    * union logic).
    */
  private def valueBounds(e: Expression, name: String): Option[(Double, Double)] = {
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    var found = false
    def num(l: Literal): Option[Double] = l.value match {
      case n: Number => Some(n.doubleValue())
      case _         => None
    }
    def isTarget(x: Expression): Boolean = x match {
      case a: Attribute => a.name == name
      case _            => false
    }
    def walk(x: Expression): Unit = x match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, lit: Literal) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case GreaterThan(a, lit: Literal) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case LessThanOrEqual(a, lit: Literal) if isTarget(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case LessThan(a, lit: Literal) if isTarget(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case EqualTo(a, lit: Literal) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      // mirrored literal-first forms
      case GreaterThanOrEqual(lit: Literal, a) if isTarget(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case GreaterThan(lit: Literal, a) if isTarget(a) =>
        num(lit).foreach { v => hi = math.min(hi, v); found = true }
      case LessThanOrEqual(lit: Literal, a) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case LessThan(lit: Literal, a) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); found = true }
      case EqualTo(lit: Literal, a) if isTarget(a) =>
        num(lit).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v); found = true }
      case _ => () // other conjuncts don't constrain the column; OR/NOT ignored
    }
    walk(e)
    if (found) Some((lo, hi)) else None
  }
}

object DeriveFragmentPruning {
  val MetaKey = "spark.graft.range.meta"

  /** Publish bucket metadata for [[DeriveFragmentPruning]]. `path` is the
    * fragmented dataset's root directory — the rule only rewrites Filters
    * whose subtree scans THAT dataset, never a column-name coincidence.
    */
  def publish(
      spark: org.apache.spark.sql.SparkSession,
      style: String,
      valueCol: String,
      n: Int,
      min: Double,
      max: Double,
      path: String
  ): Unit =
    spark.conf.set(MetaKey, s"$style,$valueCol,$n,$min,$max,$path")

  /** Publish metadata for a HASH-fragmented dataset (`style=hash`; the
    * domain fields are unused).
    */
  def publishHash(
      spark: org.apache.spark.sql.SparkSession,
      keyCol: String,
      n: Int,
      path: String
  ): Unit = publish(spark, "hash", keyCol, n, 0.0, 0.0, path)

  /** Driver-side mirror of [[graft.operators.Fragmentation.hashBucket]]:
    * first 8 md5 hex digits of the key's string form, as a long, mod n —
    * byte-identical to the executor expression, so a derived `part` filter
    * can never disagree with assignment.
    */
  def hashBucketOf(key: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    (((v % n) + n) % n).toInt
  }
}
