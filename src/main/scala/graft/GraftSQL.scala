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
    // Per-table isolation: a table whose reader throws (schema drift, missing
    // file) must not take down the whole SQL surface — queries that never
    // touch it should still run. The failure surfaces when (and only when)
    // a query references the broken view, as an unresolved-table error.
    val broken = TableNames.flatMap { t =>
      try {
        val df =
          if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
        df.createOrReplaceTempView(t)
        None
      } catch { case e: Throwable =>
        spark.catalog.dropTempView(t) // no stale view from a prior dir
        System.err.println(s"[graft-sql] view '$t' unavailable: ${e.getMessage}")
        Some(t)
      }
    }
    if (broken.nonEmpty)
      System.err.println(s"[graft-sql] ${broken.size} views unavailable: ${broken.mkString(", ")}")
    graft.functions.VectorExpressions.install(spark)
    graft.operators.SemiReduce.install(spark)
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
