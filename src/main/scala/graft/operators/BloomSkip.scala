package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-zone Bloom-filter data skipping — the lakehouse sidecar for EQUALITY
  * predicates on high-cardinality columns, where zone maps are blind: a
  * zone's (min, max) on a key uncorrelated with ingest order spans the
  * whole domain, so min/max pruning proves nothing, while a KB-scale Bloom
  * per zone prunes every zone whose filter misses either probe bit — with
  * zero false negatives by construction (a Bloom never drops a member), so
  * skipping is always safe.
  *
  * Deterministic to the bit cross-engine (the E204 sketch contract): m =
  * 1024 bits stored as 32 OR-aggregated 32-bit words per zone, k = 2
  * probe positions from md5("i:" + key) — identical hex in Spark and
  * DuckDB, so the twin rebuilds every mask and replays every probe.
  *
  * Scale shape: building is one (zone, word)-keyed aggregate over the data
  * (state ≤ 32 rows per zone — the sidecar is metadata-sized relative to
  * the table); probing touches only the sidecar, never the data; the
  * surviving-zone set then drives a partition-pruned read. 512-row zones
  * hold ~2 bits/key of load (~22% fill, ~5% FPR) — size zones to keep the
  * filter unsaturated, a saturated Bloom prunes nothing (the audit entry
  * reports fill via pruned counts round over round).
  */
object BloomSkip {

  private def pos(i: Column, key: Column): Column =
    conv(
      substring(md5(concat(i.cast("string"), lit(":"), key.cast("string"))), 1, 8),
      16,
      10
    ).cast("long") % 1024

  /** (zone, word, mask) sidecar: the zone's 1024-bit Bloom over keyCol as
    * up-to-32 nonzero 32-bit words.
    */
  def buildZoneBlooms(df: DataFrame, zoneCol: String, keyCol: String): DataFrame = {
    val two = broadcast(df.sparkSession.range(0, 2).toDF("i"))
    df.select(col(zoneCol).as("zone"), col(keyCol).as("_k"))
      .crossJoin(two)
      .select(col("zone"), pos(col("i"), col("_k")).as("p"))
      .groupBy(col("zone"), expr("p div 32").as("word"))
      .agg(
        expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))")
          .cast("long")
          .as("mask")
      )
  }

  /** Zones whose Bloom has BOTH probe bits for `key` set — the zones a
    * point lookup must read; every zone actually containing the key is
    * guaranteed present (no false negatives), extra zones are the Bloom's
    * bounded false-positive tax.
    */
  def zonesMaybeContaining(blooms: DataFrame, key: Column): DataFrame = {
    val two = broadcast(blooms.sparkSession.range(0, 2).toDF("i"))
    val probes = two.select(pos(col("i"), key).as("p"))
    blooms
      .join(broadcast(probes), expr("p div 32") === col("word"))
      .groupBy("zone")
      .agg(
        sum(
          when(expr("(shiftright(mask, CAST(p % 32 AS INT))) & 1") === 1, 1L)
            .otherwise(0L)
        ).as("_hits")
      )
      .filter(col("_hits") === 2L)
      .select("zone")
  }
}
