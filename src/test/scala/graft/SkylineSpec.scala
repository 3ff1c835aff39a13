package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Hand-computed Pareto frontiers for [[Skyline.skyline2D]] — the oracle
  * entry only proves engine agreement; these pin the dominance semantics:
  * strict-in-one/geq-in-both dominance, duplicate-point ties surviving,
  * same-x lower-y elimination, null exclusion.
  */
class SkylineSpec extends SparkSpec {

  private def pts(rows: (Long, java.lang.Long, java.lang.Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "x", "y")
  }

  test("skyline: hand-computed frontier with ties, duplicates and same-x elimination") {
    val df = pts(
      (1L, 5L, 1L), // dominated by (5,3): same x, lower y
      (2L, 5L, 3L), // frontier
      (3L, 6L, 2L), // frontier
      (4L, 4L, 7L), // frontier (highest y)
      (5L, 3L, 7L), // dominated by (4,7)
      (6L, 6L, 2L), // duplicate of 3 — ties survive, both reported
      (7L, 2L, 2L)  // dominated by everything upper-right
    )
    val out = Skyline.skyline2D(df, "x", "y").collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(2L, 3L, 4L, 6L))
  }

  test("skyline: single point, all-collinear chain, and null rows excluded") {
    val one = pts((1L, 1L, 1L))
    assert(Skyline.skyline2D(one, "x", "y").count() == 1L)
    // strictly increasing x with strictly decreasing y: every point on frontier
    val chain = pts((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L))
    assert(Skyline.skyline2D(chain, "x", "y").count() == 3L)
    val withNull = pts((1L, 5L, 5L), (2L, null, 9L), (3L, 9L, null))
    val out = Skyline.skyline2D(withNull, "x", "y").collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(1L))
  }

  test("skyline: agrees with quadratic NOT-EXISTS definition on a random-ish grid") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random grid from md5 — 60 points on a 8x8 lattice
    val df = s
      .range(60)
      .select(
        col("id"),
        (conv(substring(md5(concat(lit("sx|"), col("id"))), 1, 4), 16, 10) % 8)
          .cast("long").as("x"),
        (conv(substring(md5(concat(lit("sy|"), col("id"))), 1, 4), 16, 10) % 8)
          .cast("long").as("y")
      )
    val fast = Skyline.skyline2D(df, "x", "y").collect().map(_.getAs[Long]("id")).toSet
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, qx, qy) => qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(_._1).toSet
    assert(fast == brute)
  }
}
