package graft

/** Core data model of the fragmentation engine.
  *
  * Mirrors the reference's relational model (reference `Interface1.py:17`:
  * `CREATE TABLE ratings (userid int, movieid int, rating float)`) plus the
  * two singleton metadata tables (`Interface1.py:53,77`). The `_rowid` column
  * is our engine's explicit, stable load-order index — the reference relies on
  * PostgreSQL heap insertion order for round-robin determinism and tie
  * ordering; a distributed engine must materialize that order.
  */
case class Rating(userid: Int, movieid: Int, rating: Double)

/** `RANGE_METADATA` analog (reference `Interface1.py:77`):
  * `(range_total_partitions int, min_value float, max_value float, interval float)`.
  */
case class RangeMeta(
    totalPartitions: Int,
    minValue: Double,
    maxValue: Double,
    interval: Double
)

/** `ROUND_ROBIN_METADATA` analog (reference `Interface1.py:53`):
  * `(round_robin_total_partitions int, round_robin_last_inserted int)`.
  * `lastInserted` starts at -1 (reference default row `Interface1.py:58`).
  */
case class RoundRobinMeta(totalPartitions: Int, lastInserted: Long)

/** Fixed-width range-bucket semantics shared by rangePartition, rangeInsert,
  * rangeQuery and pointQuery (reference `Interface1.py:122-137,238-247,
  * 272-290,321-331`).
  *
  * With `inc = (max-min)/n`, bucket bounds are accumulated iteratively
  * (`minVal = upperBound` each step — float ACCUMULATION, not `min + i*inc`),
  * bucket 0 is closed-closed `[min, min+inc]`, bucket i>0 is open-closed
  * `(lb, lb+inc]`, and the last bucket's upper bound is exactly `max`.
  * A value on an interior boundary goes to the LOWER bucket.
  */
final case class RangeBuckets(n: Int, min: Double, max: Double) {
  require(n > 0, "numberofpartitions must be > 0")
  val interval: Double = (max - min) / n

  /** (lowerBound, upperBound) per bucket, accumulated exactly like the
    * reference loop so float boundaries agree bit-for-bit.
    */
  val bounds: IndexedSeq[(Double, Double)] = {
    val b = Vector.newBuilder[(Double, Double)]
    var lo = min
    var i = 0
    while (i < n) {
      val hi = if (i < n - 1) lo + interval else max
      b += ((lo, hi))
      lo = hi
      i += 1
    }
    b.result()
  }

  /** Bucket containing `v`, or -1 when v is outside [min, max]. */
  def bucketOf(v: Double): Int = {
    var i = 0
    while (i < n) {
      val (lo, hi) = bounds(i)
      val in = if (i == 0) lo <= v && v <= hi else lo < v && v <= hi
      if (in) return i
      i += 1
    }
    -1
  }

  /** Buckets whose interval overlaps [qmin, qmax], replicating the
    * `selectMode` loop of `rangeQuery` (reference `Interface1.py:273-290`):
    * start at the bucket containing qmin, stop after the bucket containing
    * qmax. NOTE reference quirk: if qmin is below `min`, selectMode never
    * flips on and nothing is selected from range fragments.
    */
  def bucketsOverlapping(qmin: Double, qmax: Double): Seq[Int] = {
    val out = Vector.newBuilder[Int]
    var selectMode = false
    var i = 0
    var done = false
    while (i < n && !done) {
      val (lo, hi) = bounds(i)
      if (!selectMode) {
        val in = if (i == 0) lo <= qmin && qmin <= hi else lo < qmin && qmin <= hi
        if (in) selectMode = true
      }
      if (selectMode) out += i
      val maxIn = if (i == 0) lo <= qmax && qmax <= hi else lo < qmax && qmax <= hi
      if (maxIn) done = true
      i += 1
    }
    out.result()
  }
}
