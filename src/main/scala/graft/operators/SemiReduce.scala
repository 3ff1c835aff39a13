package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: shrink a huge probe side BEFORE its
  * shuffle by testing join keys against a sketch of the (filtered) build
  * side — the manual form of the engine technique Spark's own
  * InjectRuntimeFilter applies, exposed as an operator so a pipeline can
  * apply it where the optimizer's thresholds would not.
  *
  * Mechanics: the build side aggregates into one Bloom filter value
  * (partial aggregation merges per-partition sketches — the shuffle carries
  * sketch bytes, not rows); only the KB-scale sketch reaches the driver
  * (metadata-scale, like IVF centroids), and the probe side evaluates a
  * codegen'd `might_contain` against the sketch literal — a narrow filter
  * with NO join and no shuffle of dropped rows. False positives survive the
  * prefilter (the exact join downstream removes them); false negatives are
  * impossible, so `prefilter ∘ join ≡ join` — which is exactly what the
  * oracle entry verifies.
  *
  * Reuses Spark's internal `BloomFilterAggregate`/`BloomFilterMightContain`
  * expressions (registered here under graft_* names — they have no public
  * SQL registration), rather than re-implementing the sketch.
  */
object SemiReduce {

  /** Register the bloom expression pair in the session registry (idempotent;
    * same registry path as VectorExpressions.install).
    */
  def install(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def register(name: String, arity: Int, build: Seq[Expression] => Expression): Unit = {
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(
          ident,
          new ExpressionInfo(classOf[BloomFilterAggregate].getName, name),
          (children: Seq[Expression]) => {
            require(children.size == arity, s"$name takes exactly $arity arguments")
            build(children)
          }
        )
      }
    }
    register("graft_bloom_agg", 3, c => new BloomFilterAggregate(c(0), c(1), c(2)))
    register("graft_bloom_contains", 2, c => BloomFilterMightContain(c(0), c(1)))
  }

  /** Probe rows whose `factKey` might match a `dimKey` of `dim`. Guaranteed
    * superset of the exact semi join (no false negatives); follow with the
    * exact join. An empty build side yields an empty result directly.
    */
  def bloomPrefilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024
  ): DataFrame = {
    install(fact.sparkSession)
    val sketch = dim
      .agg(
        call_function(
          "graft_bloom_agg",
          xxhash64(col(dimKey)),
          lit(expectedItems),
          lit(numBits)
        ).as("bf")
      )
      .head()
    if (sketch.isNullAt(0)) fact.where(lit(false))
    else
      fact.where(
        call_function("graft_bloom_contains", lit(sketch.getAs[Array[Byte]](0)), xxhash64(col(factKey)))
      )
  }
}
