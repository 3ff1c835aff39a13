package graft

import org.apache.spark.sql.functions._

import graft.operators.{HilbertCurve, ZOrder}

/** The Hilbert walk (E410): prove the index is the real curve —
  *   (a) the bits=1 quadrant order is the canonical U: (0,0)→(0,1)→(1,1)→(1,0),
  *   (b) the index is a bijection onto [0, 4^bits) on a full grid,
  *   (c) CONSECUTIVE indices are always grid neighbours (Manhattan distance
  *       exactly 1) — the locality property Morton seams break, and the
  *       entire reason Hilbert layouts prune better,
  *   (d) equal-count Hilbert ranges have bounding boxes no worse than the
  *       same-size Morton ranges on a full grid (the layout payoff, measured
  *       for real data by the q_hilbert_prune_gain driver entry),
  *   (e) cluster2 zones cover compact boxes (the physical layout op).
  */
class HilbertCurveSpec extends SparkSpec {

  private def grid(n: Int) = {
    val s = spark
    import s.implicits._
    // shuffled ingest order via a hash so nothing is accidentally sorted
    (0 until n * n)
      .map { i =>
        val x = (i * 2654435761L % (n.toLong * n)).toInt
        (x % n, x / n)
      }
      .toDF("gx", "gy")
  }

  private def indexed(n: Int, bits: Int) =
    HilbertCurve
      .withHilbert(grid(n), "gx", "gy", "h", bits)
      .select("gx", "gy", "h")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

  test("bits=1 walks the canonical U through the 2x2 grid") {
    val byD = indexed(2, 1).map { case (x, y, h) => h -> ((x, y)) }.toMap
    assert(byD == Map(0L -> ((0, 0)), 1L -> ((0, 1)), 2L -> ((1, 1)), 3L -> ((1, 0))))
  }

  test("bijection onto [0, 4^bits) and unit-step adjacency on a 32x32 grid") {
    val pts = indexed(32, 5).sortBy(_._3)
    assert(pts.map(_._3).toSeq == (0L until 1024L).toSeq,
      "Hilbert index must be a bijection onto [0, n*n)")
    pts.sliding(2).foreach { case Array((x0, y0, d0), (x1, y1, _)) =>
      val manhattan = math.abs(x1 - x0) + math.abs(y1 - y0)
      assert(manhattan == 1,
        s"consecutive Hilbert cells must be grid neighbours; d=$d0 jumped $manhattan")
    }
  }

  test("equal-count Hilbert ranges bound tighter boxes than Morton on a full grid") {
    val s = spark
    import s.implicits._
    val n = 64
    val both = HilbertCurve
      .withHilbert(grid(n), "gx", "gy", "h", bits = 6)
      .withColumn("z", ZOrder.zValue2(col("gx"), col("gy"), 6))
    def meanBoxArea(key: String): Double = {
      val zones = both
        .withColumn("zone", (col(key) / lit(256L)).cast("long")) // 16 zones of 256 cells
        .groupBy("zone")
        .agg(
          (max("gx") - min("gx") + lit(1)).as("w"),
          (max("gy") - min("gy") + lit(1)).as("ht")
        )
        .select((col("w") * col("ht")).cast("double").as("area"))
        .as[Double]
        .collect()
      zones.sum / zones.length
    }
    val hArea = meanBoxArea("h")
    val zArea = meanBoxArea("z")
    // contiguous 256-cell Hilbert ranges are 16x16 boxes (area 256); Morton
    // ranges at this granularity are exact quadrants too, so allow equality —
    // but Hilbert must never be WORSE, and both must beat random (4096)
    assert(hArea <= zArea, s"Hilbert mean bbox area $hArea must be <= Morton $zArea")
    assert(hArea <= 300.0, s"contiguous Hilbert ranges must be compact, got $hArea")
  }

  test("offset equal-count ranges: Hilbert strictly beats Morton across seams") {
    val s = spark
    import s.implicits._
    val n = 64
    val both = HilbertCurve
      .withHilbert(grid(n), "gx", "gy", "h", bits = 6)
      .withColumn("z", ZOrder.zValue2(col("gx"), col("gy"), 6))
    // offset the range boundaries by half a zone so ranges STRADDLE quadrant
    // boundaries — the seam case real range-partitioning hits, where Morton
    // jumps across the grid and Hilbert steps to a neighbour
    def meanBoxArea(key: String): Double = {
      val zones = both
        .withColumn("zone", ((col(key) + lit(128L)) / lit(256L)).cast("long"))
        .groupBy("zone")
        .agg(
          (max("gx") - min("gx") + lit(1)).as("w"),
          (max("gy") - min("gy") + lit(1)).as("ht")
        )
        .select((col("w") * col("ht")).cast("double").as("area"))
        .as[Double]
        .collect()
      zones.sum / zones.length
    }
    val hArea = meanBoxArea("h")
    val zArea = meanBoxArea("z")
    assert(hArea < zArea,
      s"across range seams Hilbert ($hArea) must bound tighter boxes than Morton ($zArea)")
  }

  test("cluster2 zones cover compact disjoint index ranges") {
    val df = HilbertCurve
      .cluster2(grid(64), "gx", "gy", numPartitions = 8, bits = 6)
      .withColumn("pid", spark_partition_id())
    val stats = HilbertCurve
      .withHilbert(df.select("gx", "gy", "pid"), "gx", "gy", "h", bits = 6)
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min("h").as("lo"), max("h").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(stats.map(_._1).sum == 64L * 64L)
    stats.sliding(2).foreach {
      case Array((_, _, hi0), (_, lo1, _)) =>
        assert(hi0 < lo1, "range-partitioned Hilbert zones must be disjoint and ordered")
      case _ =>
    }
  }
}
