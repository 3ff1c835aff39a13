package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator custom physical plan: bounded-memory top-k per key for
  * `row_number()`, `rank()`, and `dense_rank()` upper-bound filters.
  *
  * The idiomatic Spark formulation of "top k rows per key" is
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(key).orderBy(ord)))
  *     .filter($"rn" <= k) }}}
  *
  * which executes as Exchange → SORT of every row in each key group →
  * WindowExec — at 100 TB the sort materializes the full fact table per key
  * even though all but k rows per key are discarded. This strategy recognizes
  * the Filter-over-rank-function pattern in the optimized logical plan and
  * swaps in a two-phase operator, the windowed analogue of partial/final
  * aggregation:
  *
  *   TopKPerKeyExec(partial)  — per input partition, a k-bounded structure
  *       per key (worst-first heap for row_number; a ≤ k-distinct-order-value
  *       tie-bucket tree for rank/dense_rank, a provable superset of the
  *       survivors); emits a reduced row set with NO ordering requirement, so
  *       it runs map-side BEFORE the exchange and the shuffle carries at most
  *       k·distinct-keys·partitions rows (plus tie mass for rank modes)
  *       instead of the full input.
  *   Exchange(key) + Sort     — inserted by EnsureRequirements from the final
  *       exec's distribution AND ordering requirements. The sort is Spark's
  *       external (spillable) sort over the already-reduced row set.
  *   TopKPerKeyExec(final)    — STREAMS the sorted groups, counting the rank
  *       function per key and emitting rows while it stays ≤ k, with the
  *       rank attribute (same exprId the Filter's condition referenced, so
  *       the rewrite is output-transparent). O(1) state beyond the sort:
  *       no per-key buffering at all.
  *
  * Semantics match WindowExec for any DETERMINISTIC ordering; with ties the
  * row_number kept-set among tied rows is unspecified — exactly row_number's
  * own contract. rank/dense_rank results are tie-stable (the survivor SET is
  * determined by the order values alone).
  *
  * Memory: the final stage buffers nothing (the sort spills); the partial
  * stage's working set is k rows per distinct key in the task (plus ties for
  * rank modes), which is NOT bounded by k alone when key cardinality per
  * task is huge. It therefore enforces a hard cap,
  * `spark.graft.topkRewrite.maxBufferedRows` (default 4M): once the task's
  * buffered total would exceed the cap, further rows for NEW keys (or new
  * tie mass) pass through unreduced — correctness is unaffected (the final
  * stage filters exactly), only the map-side reduction degrades, exactly
  * like a partial aggregation falling back under memory pressure.
  *
  * Registered via [[graft.GraftExtensions]].injectPlannerStrategy (the
  * Spark-standard extension point); disable with
  * `spark.graft.topkRewrite.enabled=false`.
  */
object TopKPerKey {
  val EnabledKey = "spark.graft.topkRewrite.enabled"
  val MaxKKey = "spark.graft.topkRewrite.maxK"
  val MaxBufferedKey = "spark.graft.topkRewrite.maxBufferedRows"

  /** Which rank function the filtered window computed. */
  sealed abstract class Mode(val name: String)
  case object ModeRowNumber extends Mode("row_number")
  case object ModeRank extends Mode("rank")
  case object ModeDenseRank extends Mode("dense_rank")

  /** Extract k from the Filter condition IFF it is a bare upper bound on the
    * rank attribute: `rn <= k`, `rn < k`, `k >= rn`, `k > rn`, or `rn = 1`.
    * Conjunctions bail out (the residual predicate would be lost).
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

/** Planner strategy matching `Filter(rn <= k, Window(rank-like() AS rn))`. */
class TopKPerKeyStrategy extends SparkStrategy {
  import TopKPerKey._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(
          cond,
          Window(Seq(alias @ Alias(WindowExpression(fn, _), _)), partSpec, orderSpec, child, _))
        if SQLConf.get.getConfString(EnabledKey, "true").toBoolean && orderSpec.nonEmpty =>
      val mode: Option[Mode] = fn match {
        case _: RowNumber => Some(ModeRowNumber)
        case _: Rank      => Some(ModeRank)
        case _: DenseRank => Some(ModeDenseRank)
        case _            => None
      }
      val maxK = SQLConf.get.getConfString(MaxKKey, "10000").toInt
      (mode, boundOf(cond, alias.toAttribute)) match {
        case (Some(m), Some(k)) if k >= 1 && k <= maxK =>
          // InferWindowGroupLimit has usually inserted its own logical
          // group-limit below the Window by now; planned as-is it would cost
          // a full per-partition SORT on each side of the exchange before
          // our reduction even runs. The partial enforces the same k bound,
          // so strip it and plan its child directly (same keys/order — the
          // node was derived from this very window).
          val source = child match {
            case org.apache.spark.sql.catalyst.plans.logical
                  .WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case c => c
          }
          val partial =
            TopKPerKeyExec(partSpec, orderSpec, k, m, rankAttr = None, planLater(source))
          TopKPerKeyExec(partSpec, orderSpec, k, m, Some(alias.toAttribute), partial) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Physical bounded-memory top-k per key; `rankAttr` present on the final
  * (streaming, rank-emitting) instance, absent on the map-side partial.
  */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    mode: TopKPerKey.Mode,
    rankAttr: Option[Attribute],
    child: SparkPlan
) extends UnaryExecNode {
  import TopKPerKey._

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq

  // the rank attribute is CREATED here (it was the logical Window's output);
  // without this the node reports it as missing input and AQE's sanity check
  // rejects the plan
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  /** The final stage streams sorted groups: require (key, orderSpec) order —
    * EnsureRequirements plants Spark's external (spillable) SortExec over
    * the exchange, so this operator itself buffers nothing.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (rankAttr.isEmpty) Seq(Nil)
    else Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputOrdering: Seq[SortOrder] =
    if (rankAttr.isEmpty) Nil else requiredChildOrdering.head

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    if (rankAttr.isEmpty) executePartial() else executeFinal()

  /** Map-side reduction with a hard task-level memory cap: rows that cannot
    * be buffered without exceeding the cap pass through unreduced (the final
    * stage filters exactly either way).
    */
  private def executePartial(): RDD[InternalRow] = {
    val pExprs = partitionExprs
    val ordSpec = orderSpec
    val childOutput = child.output
    val limit = k
    val m = mode
    val maxBuffered =
      SQLConf.get.getConfString(TopKPerKey.MaxBufferedKey, "4194304").toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = RowOrdering.create(ordSpec, childOutput)
      var buffered = 0L

      // row_number: worst-first heap per key — peek() is the weakest kept
      // row; a candidate only enters (and evicts) when it beats the weakest.
      val heaps =
        new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // rank/dense_rank: per key, the k smallest DISTINCT order values with
      // their tie buckets. rank ≤ k ⇒ fewer than k rows (hence fewer than k
      // distinct order values) are strictly better ⇒ the row's order value
      // is among the k smallest distinct — so this is a superset of the
      // survivors for BOTH rank modes.
      val trees = new java.util.LinkedHashMap[
        UnsafeRow,
        java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]]]()

      // Returns true if consumed into a buffer, false → caller passes it on.
      def offer(row: InternalRow): Boolean = m match {
        case ModeRowNumber =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            if (buffered >= maxBuffered) return false
            heap = new java.util.PriorityQueue[InternalRow](limit, ord.reverse)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit) {
            if (buffered >= maxBuffered) return false
            heap.add(row.copy()); buffered += 1
          } else if (ord.lt(row, heap.peek())) {
            heap.poll(); heap.add(row.copy()) // swap: no growth
          }
          true
        case _ =>
          val key = keyProj(row)
          var tree = trees.get(key)
          if (tree == null) {
            if (buffered >= maxBuffered) return false
            tree = new java.util.TreeMap(ord)
            trees.put(key.copy(), tree)
          }
          val existing = tree.get(row)
          if (existing != null) {
            if (buffered >= maxBuffered) return false
            existing.add(row.copy()); buffered += 1 // tie mass
          } else if (tree.size < limit) {
            if (buffered >= maxBuffered) return false
            val b = new java.util.ArrayList[InternalRow](1)
            val copy = row.copy()
            b.add(copy); tree.put(copy, b); buffered += 1
          } else if (ord.compare(row, tree.lastKey()) < 0) {
            if (buffered >= maxBuffered) return false
            val b = new java.util.ArrayList[InternalRow](1)
            val copy = row.copy()
            b.add(copy); tree.put(copy, b); buffered += 1
            val evicted = tree.pollLastEntry() // k+1 distinct → drop worst
            buffered -= evicted.getValue.size()
          }
          // order value worse than the k-th distinct → provably rank > k
          true
      }

      // Interleave pass-through rows with the end-of-input buffer drain.
      new Iterator[InternalRow] {
        private var passThrough: InternalRow = null
        private var drain: Iterator[InternalRow] = null
        private def pump(): Unit = {
          while (passThrough == null && drain == null) {
            if (iter.hasNext) {
              val row = iter.next()
              if (!offer(row)) passThrough = row
            } else {
              import scala.jdk.CollectionConverters._
              drain =
                if (m == ModeRowNumber) heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
                else trees.values().iterator().asScala.flatMap(_.values().iterator().asScala.flatMap(_.iterator().asScala))
            }
          }
        }
        override def hasNext: Boolean = { pump(); passThrough != null || drain.hasNext }
        override def next(): InternalRow = {
          pump()
          if (passThrough != null) { val r = passThrough; passThrough = null; r }
          else drain.next()
        }
      }
    }, preservesPartitioning = true)
  }

  /** Reduce-side: stream the (key, order)-sorted input, computing the rank
    * function per key and emitting rows while it stays ≤ k. No buffering —
    * the upstream external sort is the only stateful step and it spills.
    */
  private def executeFinal(): RDD[InternalRow] = {
    val pExprs = partitionExprs
    val ordSpec = orderSpec
    val childOutput = child.output
    val limit = k
    val m = mode
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = RowOrdering.create(ordSpec, childOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = null
        private var prevOrdRow: InternalRow = null
        private var pos = 0L     // row_number within the key
        private var rankVal = 0L // current rank()/dense_rank() value
        private var nextRow: InternalRow = null
        private var nextRank = 0L
        private def pump(): Unit = {
          while (nextRow == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy(); prevOrdRow = null; pos = 0L; rankVal = 0L
            }
            pos += 1
            val newGroup = prevOrdRow == null || ord.compare(row, prevOrdRow) != 0
            val r = m match {
              case ModeRowNumber => pos
              case ModeRank      => if (newGroup) pos else rankVal
              case ModeDenseRank => if (newGroup) rankVal + 1 else rankVal
            }
            rankVal = r
            if (newGroup) prevOrdRow = row.copy()
            if (r <= limit) { nextRow = row; nextRank = r }
            // r > k: for row_number/dense_rank the rest of the key is also
            // > k, but rows arrive key-grouped so simply skipping is both
            // correct and O(remaining) — no state to manage.
          }
        }
        override def hasNext: Boolean = { pump(); nextRow != null }
        override def next(): InternalRow = {
          pump()
          val row = nextRow; nextRow = null
          rankRow.update(0, nextRank.toInt)
          toUnsafe(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
}
