package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Every query entry receives `(spark, sfDir)` and reads parquet directly —
  * filters and projections declared downstream reach the scan via Catalyst
  * pushdown (verified in `PlanQualitySpec`), so no caching layer is needed
  * and the same code path works against a 100 TB warehouse directory.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` ships TIMESTAMP(NANOS) parquet which Spark cannot read natively;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` the raw column arrives
    * as nano-of-epoch long. We expose `ts` as a proper TimestampType truncated
    * to microseconds — the same truncation DuckDB applies when it reads nanos,
    * so both engines see identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
