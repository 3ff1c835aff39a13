package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling pass: per-column row/null/distinct counts and min/max, one
  * output row per profiled column — the summary a pipeline runs over a new
  * 100 TB drop before trusting it (null surges, cardinality collapse, domain
  * drift all show up here first).
  *
  * Single-job shape: ONE aggregate over the table computes every per-column
  * statistic (the exact distinct counts expand the aggregate buffer by one
  * Expand branch per column — the standard Spark multi-count-distinct plan;
  * still one scan), then the 1-row result pivots to per-column rows with an
  * explode over a literal struct array — driver never touches data. Min/max
  * are cast to strings so heterogeneous column types share one schema.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c")
      )
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(
      array(
        cols.map(c =>
          struct(
            lit(c).as("col_name"),
            col(s"_nulls_$c").as("n_nulls"),
            col(s"_dist_$c").as("n_distinct"),
            col(s"_min_$c").as("min_val"),
            col(s"_max_$c").as("max_val")
          )
        ): _*
      )
    ).as("_p")
    one
      .select(col("_n").as("n_rows"), stacked)
      .select(
        col("_p.col_name").as("col_name"),
        col("n_rows"),
        col("_p.n_nulls").as("n_nulls"),
        col("_p.n_distinct").as("n_distinct"),
        col("_p.min_val").as("min_val"),
        col("_p.max_val").as("max_val")
      )
  }
}
