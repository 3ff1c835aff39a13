package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the warehouse tables as temp views and run plain
  * Spark SQL against them (plus the engine's custom functions, e.g.
  * `graft_dot`). This is the "switch your BI tool over" entry point — every
  * DataFrame operator in the inventory is equally reachable through
  * `spark.sql`.
  */
object GraftSQL {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def registerViews(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      val df =
        if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    graft.functions.VectorExpressions.install(spark)
    graft.operators.SemiReduce.install(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
