package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (fragmentation parity)
  * plus the SQL-operator layer and the training-data pipeline extensions; each
  * entry with an `oracleSql` twin is hash-checked against DuckDB at sf0.01 by
  * the driver's Verify flow.
  */
object SparkEntry {
  private[graft] def inventory: Seq[QEntry] =
    FragQueries.entries ++ RelationalQueries.entries ++ AnalyticsQueries.entries ++
      BehaviorQueries.entries ++ TextQueries.entries ++ PipelineQueries.entries ++
      CurationQueries.entries ++ MultimodalQueries.entries ++ SourceQueries.entries ++
      RetrievalQueries.entries ++ StatQueries.entries ++ GraphQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    RelationalQueries.entries
      .find(_.name == "q_agg_pricing_summary")
      .get
      .run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2 (insertion order). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(inventory.map(e => e.name -> e.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops → the driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    ListMap(inventory.collect { case QEntry(n, _, Some(sql)) => n -> sql }: _*)
}
