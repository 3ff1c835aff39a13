package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** The persisted Z-order layout (OPTIMIZE ZORDER BY shape): write the
  * clustered `zone=K/` directories + zone-stats sidecar, then prove
  *   (a) a sidecar-pruned box read returns EXACTLY the full-scan filter's
  *       rows (zone stats are true bounds → skipping is lossless), and
  *   (b) the sidecar actually prunes — a small box selects a strict subset
  *       of zones, which is the I/O the layout exists to save.
  * (The measured linear-vs-Morton pruning gain on the sf data is the
  * `q_zorder_prune_gain` driver entry.)
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def grid(n: Int) = {
    val s = spark
    import s.implicits._
    // n×n integer grid with a payload, shuffled ingest order via a hash so
    // the unclustered layout has no accidental locality
    (0 until n * n)
      .map { i =>
        val x = (i * 2654435761L % (n.toLong * n)).toInt
        (x % n, x / n, i)
      }
      .toDF("gx", "gy", "payload")
  }

  test("pruned box read equals the full-scan filter, and prunes zones") {
    withTempDir { dir =>
      val df = grid(64) // 4096 rows over a 64x64 grid
      ZOrder.writeClustered(df, "gx", "gy", dir, numPartitions = 16, bits = 8)

      val (xLo, xHi, yLo, yHi) = (10L, 20L, 30L, 40L)
      val full = spark.read
        .parquet(s"$dir/data")
        .filter(col("gx").between(xLo, xHi) && col("gy").between(yLo, yHi))
        .select("gx", "gy", "payload")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .toSet
      val pruned = ZOrder
        .prunedRead(spark, dir, "gx", "gy", xLo, xHi, yLo, yHi)
        .select("gx", "gy", "payload")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .toSet
      assert(pruned == full)
      assert(full.nonEmpty, "box must select something for the test to mean anything")

      val (keep, total) = ZOrder.selectZones(spark, dir, xLo, xHi, yLo, yHi)
      assert(total > 1, "need multiple zones to demonstrate pruning")
      assert(keep.nonEmpty && keep.size < total,
        s"an 11x11 box over a 64x64 Morton grid must skip zones (kept ${keep.size}/$total)")
    }
  }

  test("sidecar stats are true bounds for every persisted zone") {
    withTempDir { dir =>
      ZOrder.writeClustered(grid(32), "gx", "gy", dir, numPartitions = 8, bits = 8)
      val stats = spark.read
        .parquet(s"$dir/zones")
        .collect()
        .map(r =>
          r.getAs[Int]("zone") ->
            (r.getAs[Long]("n_rows"), r.getAs[Int]("min_x"), r.getAs[Int]("max_x"),
              r.getAs[Int]("min_y"), r.getAs[Int]("max_y")))
        .toMap
      val actual = spark.read
        .parquet(s"$dir/data")
        .groupBy("zone")
        .agg(count(lit(1)).as("n"), min("gx").as("a"), max("gx").as("b"),
          min("gy").as("c"), max("gy").as("d"))
        .collect()
        .map(r =>
          r.getAs[Int]("zone") ->
            (r.getAs[Long]("n"), r.getAs[Int]("a"), r.getAs[Int]("b"),
              r.getAs[Int]("c"), r.getAs[Int]("d")))
        .toMap
      assert(stats == actual)
      assert(stats.values.map(_._1).sum == 32L * 32L)
    }
  }

  test("a box outside the data domain reads zero zones and zero rows") {
    withTempDir { dir =>
      ZOrder.writeClustered(grid(16), "gx", "gy", dir, numPartitions = 4, bits = 8)
      val (keep, _) = ZOrder.selectZones(spark, dir, 1000L, 2000L, 1000L, 2000L)
      assert(keep.isEmpty)
      assert(ZOrder.prunedRead(spark, dir, "gx", "gy", 1000L, 2000L, 1000L, 2000L).count() == 0L)
    }
  }

  test("appendClustered keeps reads exact, degrades pruning; reoptimize restores it") {
    withTempDir { dir =>
      val s = spark
      import s.implicits._
      val all = grid(64).withColumn("slice", pmod(col("payload"), lit(4)))
      ZOrder.writeClustered(
        all.filter(col("slice") < 2).drop("slice"), "gx", "gy", dir, numPartitions = 8, bits = 8)
      ZOrder.appendClustered(
        all.filter(col("slice") === 2).drop("slice"), "gx", "gy", dir, numPartitions = 4, bits = 8)
      ZOrder.appendClustered(
        all.filter(col("slice") === 3).drop("slice"), "gx", "gy", dir, numPartitions = 4, bits = 8)
      val (xLo, xHi, yLo, yHi) = (10L, 20L, 30L, 40L)
      def boxRows() = ZOrder
        .prunedRead(spark, dir, "gx", "gy", xLo, xHi, yLo, yHi)
        .select("gx", "gy", "payload")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val truth = all.drop("slice")
        .filter(col("gx").between(xLo, xHi) && col("gy").between(yLo, yHi))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      // (a) exactness survives any append sequence — the union sidecar's
      // stats are still true bounds, so skipping stays lossless
      val appended = boxRows()
      assert(appended === truth, s"appended-layout read diverged (${appended.size} vs ${truth.size})")
      // fresh zone ids: 8 history zones + 4 + 4 ingest zones
      val (keepFrag, totalFrag) = ZOrder.selectZones(spark, dir, xLo, xHi, yLo, yHi)
      assert(totalFrag == 16, s"expected 16 zones after appends, got $totalFrag")
      // (b) OPTIMIZE: a single global re-cluster restores the read AND
      // improves (or equals) the selected-zone fraction for the same box
      ZOrder.reoptimize(spark, dir, "gx", "gy", numPartitions = 16, bits = 8)
      val (keepOpt, totalOpt) = ZOrder.selectZones(spark, dir, xLo, xHi, yLo, yHi)
      assert(totalOpt == 16)
      assert(boxRows() === truth, "reoptimized-layout read diverged")
      assert(
        keepOpt.size.toDouble / totalOpt <= keepFrag.size.toDouble / totalFrag,
        s"reoptimize worsened pruning: kept ${keepOpt.size}/$totalOpt vs ${keepFrag.size}/$totalFrag"
      )
      assert(keepFrag.size > keepOpt.size,
        s"fixture should show real fragmentation cost (${keepFrag.size} vs ${keepOpt.size})")
    }
  }
}
