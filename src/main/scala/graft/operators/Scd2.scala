package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 builder: collapse an ordered change log
  * into effective-dated dimension rows (valid_from, valid_to, version,
  * is_current) — the standard shape a warehouse dimension load ships.
  *
  * Change detection keeps a row iff the tracked attribute tuple differs from
  * its predecessor in (orderCol, tieCol) order; surviving rows then close
  * each other's intervals with `lead` and number versions per key. Both
  * windows are ENTITY-KEYED — state is bounded by one entity's history, so
  * the build parallelizes by key at any corpus size (the classic SCD2
  * MERGE-loop is the serial formulation this replaces).
  *
  * Determinism: (orderCol, tieCol) is a total order per key; the open
  * interval's end is a literal sentinel rather than NULL so downstream
  * range predicates (`valid_from <= ts < valid_to`) need no null branch.
  */
object Scd2 {

  val OpenEndSentinel = "9999-12-31 00:00:00.000000"

  /** Build Type-2 rows from a change log.
    *
    * @param log      change events, one row per observation
    * @param keyCols  entity identity (dimension natural key)
    * @param attrCols tracked attributes — a new version opens when the tuple changes
    * @param orderCol monotone event-time column (microsecond timestamp)
    * @param tieCol   unique tie-breaker making (orderCol, tieCol) a total order
    */
  def buildType2(
      log: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      orderCol: String,
      tieCol: String
  ): DataFrame = {
    val key: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(col(orderCol), col(tieCol))
    val attrTuple = struct(attrCols.map(col): _*)
    val changed = log
      .withColumn("_prev", lag(attrTuple, 1).over(w))
      // first observation (NULL prev) always opens version 1
      .filter(col("_prev").isNull || col("_prev") =!= attrTuple)
      .drop("_prev")
    changed
      .withColumn("_vt", lead(col(orderCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn(
        "valid_from",
        date_format(col(orderCol), "yyyy-MM-dd HH:mm:ss.SSSSSS")
      )
      .withColumn(
        "valid_to",
        coalesce(
          date_format(col("_vt"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
          lit(OpenEndSentinel)
        )
      )
      .withColumn("is_current", col("_vt").isNull.cast("int"))
      .drop("_vt", orderCol, tieCol)
  }
}
