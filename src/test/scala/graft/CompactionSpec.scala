package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Bin-packing invariants of the compaction planner. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val target = 100L

  test("next-fit bins: every bin under target + largest member; big files untouched") {
    val files = Seq(
      ("p1", "a", 150L), // >= target: keep as-is
      ("p1", "b", 60L), ("p1", "c", 55L), ("p1", "d", 40L),
      ("p1", "e", 30L), ("p1", "f", 10L),
      ("p2", "g", 99L), ("p2", "h", 1L)
    ).toDF("part", "path", "bytes")
    val out = Compaction
      .planBins(files, Seq("part"), "path", "bytes", target)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getAs[Long]("bin"), r.getAs[Long]("bin_bytes")))
    val byPath = out.map(t => t._2 -> t).toMap
    // oversized file is exempt
    assert(byPath("a")._4 == -1L && byPath("a")._5 == 150L)
    // small files all assigned to bins >= 0
    assert(out.filter(_._2 != "a").forall(_._4 >= 0))
    // bin byte totals stay under target + the bin's largest member
    val bins = out.filter(_._4 >= 0).groupBy(t => (t._1, t._4))
    bins.foreach { case ((part, bin), fs) =>
      val total = fs.map(_._3).sum
      val largest = fs.map(_._3).max
      assert(total < target + largest, s"bin ($part,$bin) holds $total")
      assert(fs.forall(_._5 == total), s"bin_bytes mismatch in ($part,$bin)")
    }
    // partitions plan independently: p2's two files share one bin
    assert(byPath("g")._4 == byPath("h")._4 && byPath("g")._1 == "p2")
    // deterministic: a repartitioned input yields the identical plan
    val again = Compaction
      .planBins(files.repartition(4), Seq("part"), "path", "bytes", target)
      .collect()
      .map(r => r.getString(1) -> r.getAs[Long]("bin"))
      .toMap
    assert(out.map(t => t._2 -> t._4).toMap == again)
  }

  test("empty partCols plans the whole listing as one key") {
    val files = (1 to 7).map(i => (s"f$i", 30L)).toDF("path", "bytes")
    val out = Compaction
      .planBins(files, Nil, "path", "bytes", target)
      .select("path", "bin")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // 7 × 30 bytes → cumsum opens a new bin per ~100 bytes: bins 0,0,0,0,1,1,1
    assert(out.values.max == 1L && out.values.min == 0L)
    assert(out.values.count(_ == 0L) == 4)
  }
}
