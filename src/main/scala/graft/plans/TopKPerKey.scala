package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator custom physical plan: bounded-heap top-k per key.
  *
  * The idiomatic Spark formulation of "top k rows per key" is
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(key).orderBy(ord)))
  *     .filter($"rn" <= k) }}}
  *
  * which executes as Exchange → SORT of every row in each key group →
  * WindowExec — at 100 TB the sort materializes the full fact table per key
  * even though all but k rows per key are discarded. This strategy recognizes
  * the Filter-over-row_number pattern in the optimized logical plan and swaps
  * in a two-phase bounded-heap operator, the windowed analogue of
  * partial/final aggregation:
  *
  *   TopKPerKeyExec(partial)  — per input partition, one k-bounded heap per
  *       key; emits ≤ k rows per (key, partition), NO ordering requirement,
  *       so it runs map-side BEFORE the exchange and the shuffle carries at
  *       most k·distinct-keys·partitions rows instead of the full input.
  *   Exchange(key)            — inserted by EnsureRequirements from the final
  *       exec's ClusteredDistribution requirement (absent when the child is
  *       already clustered — e.g. reading a bucketed table).
  *   TopKPerKeyExec(final)    — merges the per-partition survivors, sorts the
  *       ≤ k winners per key, and emits them with the row_number attribute
  *       (same exprId the Filter's condition referenced, so the rewrite is
  *       output-transparent to the rest of the plan).
  *
  * Semantics match WindowExec for any DETERMINISTIC ordering; with ties the
  * kept set among tied rows is unspecified — exactly row_number's own
  * contract (its tie order is whatever the underlying sort produced).
  * Memory per task is k · (distinct keys in the task's data) rows — strictly
  * less than WindowExec's full-group buffer; no spill path in this version,
  * so the rewrite only fires for k ≤ spark.graft.topkRewrite.maxK.
  *
  * Registered via [[graft.GraftExtensions]].injectPlannerStrategy (the
  * Spark-standard extension point); disable with
  * `spark.graft.topkRewrite.enabled=false`.
  */
object TopKPerKey {
  val EnabledKey = "spark.graft.topkRewrite.enabled"
  val MaxKKey = "spark.graft.topkRewrite.maxK"

  /** Extract k from the Filter condition IFF it is a bare upper bound on the
    * row_number attribute: `rn <= k`, `rn < k`, `k >= rn`, `k > rn`, or
    * `rn = 1`. Conjunctions bail out (the residual predicate would be lost).
    */
  private[plans] def boundOf(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _)   => Some(v)
      case Literal(v: Long, _) if v <= Int.MaxValue => Some(v.toInt)
      case _                    => None
    }
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rn.exprId
      case _            => false
    }
    cond match {
      case LessThanOrEqual(a, l) if isRn(a)    => lit(l)
      case LessThan(a, l) if isRn(a)           => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a) if isRn(a) => lit(l)
      case GreaterThan(l, a) if isRn(a)        => lit(l).map(_ - 1)
      case EqualTo(a, l) if isRn(a)            => lit(l).filter(_ == 1)
      case EqualTo(l, a) if isRn(a)            => lit(l).filter(_ == 1)
      case _                                   => None
    }
  }
}

/** Planner strategy matching `Filter(rn <= k, Window(row_number() AS rn))`. */
class TopKPerKeyStrategy extends SparkStrategy {
  import TopKPerKey._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(
          cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)), partSpec, orderSpec, child, _))
        if SQLConf.get.getConfString(EnabledKey, "true").toBoolean && orderSpec.nonEmpty =>
      val maxK = SQLConf.get.getConfString(MaxKKey, "10000").toInt
      boundOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= maxK =>
          // InferWindowGroupLimit has usually inserted its own logical
          // group-limit below the Window by now; planned as-is it would cost
          // a full per-partition SORT on each side of the exchange before
          // our heaps even run. The heaps enforce the same k bound, so
          // strip it and plan its child directly (same keys/order — the
          // node was derived from this very window).
          val source = child match {
            case org.apache.spark.sql.catalyst.plans.logical
                  .WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case c => c
          }
          val partial =
            TopKPerKeyExec(partSpec, orderSpec, k, rankAttr = None, planLater(source))
          TopKPerKeyExec(partSpec, orderSpec, k, Some(alias.toAttribute), partial) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key; `rankAttr` present on the final
  * (merging, rank-emitting) instance, absent on the map-side partial.
  */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq

  // the rank attribute is CREATED here (it was the logical Window's output);
  // without this the node reports it as missing input and AQE's sanity check
  // rejects the plan
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val pExprs = partitionExprs
    val ordSpec = orderSpec
    val childOutput = child.output
    val limit = k
    val emitRank = rankAttr.isDefined
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = RowOrdering.create(ordSpec, childOutput)
      // worst-first heap per key: peek() is the weakest kept row, so a
      // candidate only enters (and evicts) when it beats the weakest
      val heaps =
        new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
      }
      val groups = heaps.values().iterator()
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      new Iterator[InternalRow] {
        private var cur: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = i < cur.length || groups.hasNext
        override def next(): InternalRow = {
          if (i >= cur.length) {
            cur = groups.next().toArray(Array.empty[InternalRow]).sorted(ord)
            i = 0
          }
          val row = cur(i)
          i += 1
          if (emitRank) {
            rankRow.update(0, i) // rank = 1-based position in sorted group
            toUnsafe(joined(row, rankRow))
          } else row
        }
      }
    }, preservesPartitioning = true)
  }
}
