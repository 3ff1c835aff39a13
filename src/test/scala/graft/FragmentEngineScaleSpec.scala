package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.FragmentEngine

/** The full reference pipeline at 3000× the reference fixture (60k rows
  * derived from lineitem): load → both fragmentations → queries → insert,
  * with invariants checked against direct computation on the master table.
  * Catches anything that only breaks past toy size (partition fan-out,
  * counter continuation, pruning under many files).
  */
class FragmentEngineScaleSpec extends SparkSpec {

  test("reference pipeline end-to-end at 60k rows") {
    withTempDir { root =>
      // synthesize a "::"-delimited ratings file from lineitem: rating =
      // quantity mapped into [0,5] in 0.5 steps (the reference domain)
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      val lines = li
        .select(
          concat_ws(
            "::",
            col("l_orderkey"),
            col("l_partkey"),
            (floor(col("l_quantity") / 5.0) / 2.0).cast("string"),
            lit("838985046")
          )
        )
        .collect()
        .map(_.getString(0))
      val file = s"$root/ratings.txt"
      Files.write(Paths.get(file), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

      val e = new FragmentEngine(spark, root)
      e.loadRatings("ratings", file)
      val master = e.master("ratings")
      assert(master.count() == lines.length)

      e.rangePartition("ratings", 5)
      e.roundRobinPartition("ratings", 7)

      // reconstruction: every scheme holds exactly the master rows
      val range = spark.read.parquet(s"$root/range_ratings")
      val rr = spark.read.parquet(s"$root/round_robin_ratings")
      assert(range.count() == lines.length)
      assert(rr.count() == lines.length)
      assert(rr.select("part").distinct().count() == 7)

      // per-fragment range counts match the boundary-rule oracle
      val buckets = RangeBuckets(5, 0.0, 5.0)
      val fromFragments = range
        .groupBy("part")
        .count()
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
        .toMap
      val fromMaster = master
        .collect()
        .groupBy(r => buckets.bucketOf(r.getAs[Double]("rating")))
        .view
        .mapValues(_.length.toLong)
        .toMap
      assert(fromFragments == fromMaster.filter(_._1 >= 0))

      // pruned point query count == direct filter count, doubled (both schemes)
      val (rangeSide, rrSide) = e.pointQueryDF(2.5)
      val direct = master.filter(col("rating") === 2.5).count()
      assert(rangeSide.count() == direct && rrSide.count() == direct)

      // range query [1.5, 3.5]: each side returns exactly the master matches
      val (rs, rr2) = e.rangeQueryDF(1.5, 3.5)
      val directRange = master.filter(col("rating") >= 1.5 && col("rating") <= 3.5).count()
      assert(rs.count() == directRange && rr2.count() == directRange)

      // inserts continue to route correctly at this size
      e.rangeInsert("ratings", 999999, 1, 3.0)
      e.roundRobinInsert("ratings", 999999, 2, 1.0)
      assert(e.master("ratings").count() == lines.length + 2)
      val inserted = spark.read
        .parquet(s"$root/range_ratings")
        .filter(col("userid") === 999999)
      assert(inserted.count() == 1)
      assert(inserted.head().getAs[Int]("part") == buckets.bucketOf(3.0))
    }
  }
}
