package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized horizontal fragmentation — the reference's schemes
  * (`rangePartition`/`roundRobinPartition` over the hard-coded rating domain,
  * SURVEY §2.1) lifted to any numeric column, any domain, plus the hash
  * scheme every distributed warehouse actually defaults to.
  *
  * All assignment expressions are single narrow codegen'd projections: at
  * 100 TB, fragmentation is one pass + a partitioned write, never a driver
  * loop. (The ratings-parity engine in [[FragmentEngine]] keeps the
  * reference's exact accumulated-bound boundary semantics; these generic
  * operators use the closed-form width-bucket rule, which is identical in
  * IEEE doubles across engines and needs no per-bucket expression chain.)
  */
object Fragmentation {

  /** Fixed-width range bucket over [min, max]: floor((v-min)/width), clamped
    * to n-1 so v == max lands in the last fragment; null outside the domain.
    */
  def rangeBucket(v: Column, n: Int, min: Double, max: Double): Column = {
    val width = (max - min) / n
    when(
      v >= min && v <= max,
      least(floor((v - lit(min)) / lit(width)), lit(n - 1)).cast("int")
    ).otherwise(lit(null).cast("int"))
  }

  /** Range-fragment on a data-derived domain: one aggregate pass for
    * min/max (a scalar to the driver — metadata, not data), then the narrow
    * bucket projection. Returns the fragmented frame and the derived domain.
    */
  def rangeFragmentAuto(
      df: DataFrame,
      valueCol: String,
      n: Int,
      partCol: String = "part"
  ): (DataFrame, (Double, Double)) = {
    val row = df.agg(min(col(valueCol)), max(col(valueCol))).head()
    val (lo, hi) = (row.getAs[Any](0), row.getAs[Any](1)) match {
      case (a: Number, b: Number) => (a.doubleValue(), b.doubleValue())
      case _ => throw new IllegalArgumentException(s"$valueCol has no numeric range")
    }
    (df.withColumn(partCol, rangeBucket(col(valueCol), n, lo, hi)), (lo, hi))
  }

  /** Range-fragment on a data-derived domain, write as a Hive-partitioned
    * dataset, and publish the bucket metadata so
    * [[graft.plans.DeriveFragmentPruning]] prunes fragment directories for
    * any ad-hoc filter on the value column. Returns the re-opened dataset.
    */
  def writeRangeFragmentedAuto(
      df: DataFrame,
      valueCol: String,
      n: Int,
      path: String
  ): DataFrame = {
    val spark = df.sparkSession
    val (fragged, (lo, hi)) = rangeFragmentAuto(df, valueCol, n)
    fragged
      .filter(col("part").isNotNull)
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("part")
      .parquet(path)
    graft.plans.DeriveFragmentPruning
      .publish(spark, "closed", valueCol, n, lo, hi, new java.io.File(path).getAbsolutePath)
    spark.read.parquet(path)
  }

  /** Hash fragment: md5-derived bucket (engine-portable, verified against the
    * DuckDB oracle — Spark's internal `hash()` is not cross-engine). The
    * first 8 md5 hex digits as an integer mod n: uniform, deterministic,
    * and skew-free for any key distribution, which is why hash is the
    * default co-location scheme for big joins.
    */
  def hashBucket(key: Column, n: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), lit(n.toLong))
      .cast("int")

  def hashFragment(df: DataFrame, keyCol: String, n: Int, partCol: String = "part"): DataFrame =
    df.withColumn(partCol, hashBucket(col(keyCol), n))

  /** Write a hash-fragmented dataset Hive-partitioned by bucket and publish
    * its metadata, so [[graft.plans.DeriveFragmentPruning]] turns ad-hoc
    * `key = literal` / `key IN (...)` filters into FileIndex partition
    * pruning — the hash analog of [[writeRangeFragmentedAuto]]'s interval
    * pruning (point lookups read 1 of n fragment directories).
    */
  def writeHashFragmented(df: DataFrame, keyCol: String, n: Int, path: String): DataFrame = {
    val spark = df.sparkSession
    hashFragment(df, keyCol, n)
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("part")
      .parquet(path)
    graft.plans.DeriveFragmentPruning
      .publishHash(spark, keyCol, n, new java.io.File(path).getAbsolutePath)
    spark.read.parquet(path)
  }

  /** Global 1-based row number over a total order WITHOUT a single-reducer
    * window: two-phase rank. Phase 1 range-partitions on the order key and
    * sorts within partitions (parallel sort, same physical shape as a
    * distributed ORDER BY); phase 2 counts rows per partition (one tiny
    * row per shuffle partition), turns the counts into cumulative offsets,
    * and broadcast-joins them back so each partition numbers its rows
    * locally as `offset + local row_number`. The only unpartitioned window
    * runs over the ≤ `spark.sql.shuffle.partitions` offset rows — bounded
    * at any data scale. Rows with equal keys land in one range partition
    * (RangePartitioner), so ties behave exactly as in a global window.
    */
  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[String],
      outCol: String = "rn"
  ): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs at least one order column")
    val W = org.apache.spark.sql.expressions.Window
    // localCheckpoint PINS the range exchange: the counts job and the final
    // job below are separate actions, and without materialization each
    // re-plans the shuffle from scratch — RangePartitioner re-SAMPLES under
    // fresh RDD ids and AQE re-coalesces by runtime sizes, so the two jobs
    // can disagree about what partition id K contains (observed at sf0.1:
    // offsets keyed to one partitioning applied to another → wrong ranks;
    // invisible at sf0.01 where both jobs coalesce to one partition).
    // Checkpointing materializes the exchange once, so `_gpid` means the
    // same thing in both jobs. Same reliability trade as the pagerank /
    // BFS loops' localCheckpoint: executor-local blocks, no lineage replay.
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("_gpid", spark_partition_id())
      .localCheckpoint()
    // Metadata-sized action (the zipWithIndex pattern): ONE (pid, count) row
    // per shuffle partition reaches the driver; cumulative offsets become a
    // literal lookup map.
    val counts = sorted
      .groupBy("_gpid")
      .agg(count(lit(1)).as("_gcnt"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2)).toMap
    val wLocal = W.partitionBy("_gpid").orderBy(orderCols.map(col): _*)
    sorted
      .withColumn(
        outCol,
        row_number().over(wLocal).cast("bigint") +
          coalesce(element_at(typedLit(offsets), col("_gpid")), lit(0L))
      )
      .drop("_gpid")
  }

  /** Round-robin by explicit order key — k-th row (0-based) → k mod n.
    * The order columns make the assignment reproducible under any read
    * parallelism (Spark's own repartition round-robin is not row-stable).
    *
    * Built on [[globalRowNumber]]'s two-phase rank, so the total order is
    * computed by a parallel range-partitioned sort plus per-partition count
    * offsets — no single-reducer `WindowExec: No Partition Defined` shape
    * anywhere on the path. For bulk ingest the engine instead uses
    * [[FragmentEngine.loadRatings]]'s `zipWithIndex` (stable order from
    * split offsets, zero extra shuffle) or [[hashFragment]].
    */
  def roundRobinFragment(
      df: DataFrame,
      orderCols: Seq[String],
      n: Int,
      partCol: String = "part"
  ): DataFrame =
    globalRowNumber(df, orderCols, outCol = partCol)
      .withColumn(partCol, ((col(partCol) - 1L) % n).cast("int"))
}
