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
  /** Base-table reads go through [[graft.operators.ParquetIO]]'s memoized
    * SCHEMA per path — metadata, not data (one cache with one invalidation
    * story instead of a private duplicate, per the round-17 advisory).
    * Footer-based schema inference costs ~0.1 s per call on this host, paid
    * by every entry for every table it opens — tens of seconds across a
    * 479-entry bench lap; a production warehouse pins schemas in a catalog
    * instead of re-inferring per query. Rows are still read from parquet on
    * every invocation — only the footer-inference step is skipped.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.ParquetIO.read(spark, s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` has shipped in two physical forms across testdata
    * generations, so the reader dispatches on the ACTUAL parquet dtype:
    *
    *  - TIMESTAMP(NANOS), which Spark only reads with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` as a nano-of-epoch long —
    *    truncated here to micros (the same truncation DuckDB applies), or
    *  - TIMESTAMP(MICROS) (current generations), read natively; NTZ is cast
    *    to session-local TimestampType so downstream date/window functions
    *    behave identically on either input.
    *
    * Either way callers see one canonical `ts: TimestampType` column.
    */
  def events(s: SparkSession, d: String): DataFrame =
    canonicalizeEventsTs(table(s, d, "events"))

  /** Normalize an events-shaped DataFrame's `ts` to TimestampType regardless
    * of physical input form. Shared by the batch reader above and any
    * `readStream` over the same layout (streams carry the same schema drift).
    */
  def canonicalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }
}
