package graft

import org.apache.spark.sql.functions._

/** Ground-truth checks for the behavioral-analytics battery on crafted event
  * logs (the driver oracle proves cross-engine equality; these prove the
  * SEMANTICS — streak lengths, pattern hits, weighting — on inputs small
  * enough to verify by hand).
  */
class BehaviorQueriesSpec extends SparkSpec {

  /** Write a crafted events table into a temp dir shaped like the testdata
    * layout (nanosecond-long ts column, matching Tables.events' contract).
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_behav").toString
    rows
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts") * lit(1000000000L)) // seconds → nanos
      .withColumn("props", lit("{}"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private val day = 86400L

  test("q_gaps_islands: streak lengths and island counts match hand-checked counts") {
    // user 1: days 1,2,3, 7,8, 20  → longest 3, islands 3
    // user 2: days 5              → longest 1, islands 1
    val dir = eventsDir(
      Seq(1L, 2L, 3L, 7L, 8L, 20L).zipWithIndex.map { case (d0, i) =>
        (i.toLong, d0 * day + 3600L, 1L, "view", 1.0)
      } ++ Seq((100L, 5L * day, 2L, "click", 1.0))
    )
    val out = SparkEntry
      .queries("q_gaps_islands")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((3L, 3L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("q_seq_patterns: contiguous trigram support counts users, not occurrences") {
    // user 1: a b c a b c → a>b>c twice (1 user), b>c>a once, c>a>b once
    // user 2: a b c       → a>b>c once (2nd user)
    val dir = eventsDir(
      Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map { case (t, i) =>
        (i.toLong, 1000L + i, 1L, t, 1.0)
      } ++ Seq("a", "b", "c").zipWithIndex.map { case (t, i) =>
        (100L + i, 2000L + i, 2L, t, 1.0)
      }
    )
    val out = SparkEntry
      .queries("q_seq_patterns")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("a>b>c") == ((2L, 3L)), out.toString)
    assert(out("b>c>a") == ((1L, 1L)))
    assert(out("c>a>b") == ((1L, 1L)))
    // ranking: a>b>c first (max support)
    val first = SparkEntry.queries("q_seq_patterns")(spark, dir).collect().head
    assert(first.getString(0) == "a>b>c")
  }

  test("q_event_pattern_match: error→purchase without signup in between") {
    val dir = eventsDir(
      Seq(
        // user 1: error, click, purchase → recovered
        (1L, 100L, 1L, "error", 0.0),
        (2L, 200L, 1L, "click", 0.0),
        (3L, 300L, 1L, "purchase", 0.0),
        // user 2: error, signup, purchase → NOT recovered (signup resets)
        (4L, 100L, 2L, "error", 0.0),
        (5L, 200L, 2L, "signup", 0.0),
        (6L, 300L, 2L, "purchase", 0.0),
        // user 3: purchase before error only → not recovered
        (7L, 100L, 3L, "purchase", 0.0),
        (8L, 200L, 3L, "error", 0.0)
      )
    )
    val out = SparkEntry
      .queries("q_event_pattern_match")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == ((3L, true)))
    assert(out(2L) == ((3L, false)))
    assert(out(3L) == ((2L, false)))
  }

  test("q_time_weighted_avg: gap-weighted mean, last reading carries no weight") {
    // user 1: value 10 held for 30 s, then 20 held for 10 s, then 99 (no
    // weight — nothing after it). tw = (10*30 + 20*10) / 40 = 12.5
    val dir = eventsDir(
      Seq(
        (1L, 1000L, 1L, "view", 10.0),
        (2L, 1030L, 1L, "view", 20.0),
        (3L, 1040L, 1L, "view", 99.0)
      )
    )
    val row = SparkEntry.queries("q_time_weighted_avg")(spark, dir).collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 40L * 1000000L) // 40 s in µs
    assert(math.abs(row.getDouble(2) - 12.5) < 1e-12)
  }

  test("q_ratio_to_report: shares sum to 1 within every month") {
    val df = SparkEntry.queries("q_ratio_to_report")(spark, "/root/testdata/sf0.001")
    val sums = df
      .groupBy("month")
      .agg(sum("share").as("s"), sum("cents").as("c"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"month ${r.getString(0)}")
      assert(r.getLong(2) > 0)
    }
  }
}
