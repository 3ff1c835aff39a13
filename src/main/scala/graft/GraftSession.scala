package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine-standard Spark configuration.
  *
  * Scale rationale (targets a real multi-executor cluster even though tests
  * run `local[*]`):
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     replace hand-tuned partition counts at 100 TB.
  *   - `nanosAsLong`: the `events` table carries TIMESTAMP(NANOS) parquet,
  *     which Spark's vectorized reader rejects; we read nanos as long and
  *     convert explicitly (see [[Tables.events]]).
  *   - UTC session timezone so timestamp formatting is deterministic and
  *     matches the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // inject custom Catalyst pieces (graft_dot) the Spark-standard way
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(
        "spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"
      )
      .config("spark.ui.enabled", "false")

  /** Apply the engine-standard runtime confs to an externally-created session
    * (the driver owns session creation in Verify/Bench).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // best-effort: lets an externally-built session read the events table
    // (ignored if the conf is static in this Spark build)
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    // a session built WITHOUT spark.sql.extensions=graft.GraftExtensions
    // still gets the custom kernels (graft_dot etc.) — idempotent installs
    graft.functions.VectorExpressions.install(spark)
    graft.operators.SemiReduce.install(spark)
    // ... and the top-k-per-key physical operator, via the runtime strategy
    // hook (injectPlannerStrategy is build-time only)
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.TopKPerKeyStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new graft.plans.TopKPerKeyStrategy
    spark
  }
}
