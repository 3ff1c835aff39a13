package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductFloat

/** Spark-standard extension entry point: inject the engine's custom Catalyst
  * pieces at session build time —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Currently registers the codegen'd `graft_dot` vector kernel (see
  * [[graft.functions.DotProductFloat]]); [[graft.functions.VectorExpressions.install]]
  * is the imperative equivalent for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // engine-knowledge pruning: rating predicates imply fragment predicates
    ext.injectOptimizerRule(_ => graft.plans.DeriveFragmentPruning())
    // aggregate materialized-view rewrite: SUM/MIN/MAX/AVG/COUNT rollups
    // answered from a registered MV instead of the fact table
    // (graft.plans.MvRewrite); a persisted MV catalog auto-loads when
    // spark.graft.mvCatalog names one (stale definitions are dropped)
    ext.injectOptimizerRule { session =>
      graft.plans.MvRewrite.loadCatalogIfConfigured(session)
      graft.plans.MvRewriteRule(session)
    }
    // bounded-heap top-k-per-key physical operator replacing the
    // Filter(row_number <= k) WindowExec pattern (graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_dot(a, b) takes exactly 2 arguments")
          DotProductFloat(children.head, children(1))
        }
      )
    )
    // bloom semi-join reduction pair (same builders SemiReduce.install uses)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "graft_bloom_agg"
        ),
        (children: Seq[Expression]) => {
          require(children.size == 3, "graft_bloom_agg(value, items, bits) takes exactly 3 arguments")
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            children(0), children(1), children(2))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "graft_bloom_contains"
        ),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_bloom_contains(bf, value) takes exactly 2 arguments")
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(children(0), children(1))
        }
      )
    )
  }
}
