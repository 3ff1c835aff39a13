package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling pass: per-column row/null/distinct counts and min/max, one
  * output row per profiled column — the summary a pipeline runs over a new
  * 100 TB drop before trusting it (null surges, cardinality collapse, domain
  * drift all show up here first).
  *
  * Shape: two aggregates over the table (count/null/distinct with an
  * all-long buffer — the exact distincts cost one Expand branch per column,
  * the standard multi-count-distinct plan; string-cast min/max in a second
  * narrow pass — see the in-method note on why folding them together demotes
  * the whole aggregate to a sorting SortAggregate), crossed as 1-row
  * relations and pivoted to per-column rows with an explode over a literal
  * struct array — the driver never touches data. Min/max are cast to strings
  * so heterogeneous column types share one schema. At 100 TB swap
  * countDistinct for approx_count_distinct to drop the Expand entirely.
  *
  * String rendering caveat: double min/max go through Java's
  * `Double.toString`, which switches to scientific notation at |x| ≥ 1e7 or
  * < 1e-3, while SQL engines' `CAST(double AS VARCHAR)` (e.g. the DuckDB
  * oracle) render plain notation over a wider range — the cross-engine
  * string contract holds only while extreme values stay inside the
  * plain-notation window (true of every profiled testdata column; asserted
  * in ProfilingSpec). For columns that can leave it, quantize first (cast to
  * a fixed-scale decimal) so both engines render identically.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // two aggregates, crossed as 1-row relations: the count/distinct pass
    // keeps an all-long buffer, so the Expand-widened rows flow through a
    // HashAggregate; folding the string-typed min/max into the same
    // aggregate would demote it to a SortAggregate that SORTS the ×N
    // expanded input (measured 4× slower at sf0.1). The min/max pass scans
    // narrow un-expanded rows instead.
    val cntAggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_dist_$c")
      )
    }
    val mmAggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c")
      )
    }
    val one = df
      .agg(cntAggs.head, cntAggs.tail: _*)
      .crossJoin(df.agg(mmAggs.head, mmAggs.tail: _*))
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
