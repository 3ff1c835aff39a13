package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scd2, SymSpell}

/** Semantics tests for the SCD Type-2 builder and the SymSpell typo-restore
  * pipeline (the sf0.01 value-for-value checks live in the DuckDB oracle
  * entries `q_scd2_intervals` / `txt_symspell_restore`).
  */
class Scd2SymSpellSpec extends SparkSpec {

  private def log(rows: (Long, String, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows
      .toDF("k", "attr", "us", "eid")
      .select(col("k"), col("attr"), timestamp_micros(col("us")).as("ts"), col("eid"))
  }

  test("scd2 collapses unchanged observations and closes intervals in order") {
    val df = log(
      (1L, "a", 1000000L, 1L),
      (1L, "a", 2000000L, 2L), // unchanged — collapsed into version 1
      (1L, "b", 3000000L, 3L),
      (1L, "a", 4000000L, 4L), // returning to 'a' opens a NEW version
      (2L, "x", 1000000L, 5L)
    )
    val out = Scd2
      .buildType2(df, Seq("k"), Seq("attr"), "ts", "eid")
      .orderBy("k", "version")
      .collect()
      .map(r =>
        (
          r.getAs[Long]("k"),
          r.getAs[String]("attr"),
          r.getAs[Long]("version"),
          r.getAs[String]("valid_from"),
          r.getAs[String]("valid_to"),
          r.getAs[Int]("is_current")
        )
      )
    assert(out.length == 4)
    assert(out(0) == ((1L, "a", 1L, "1970-01-01 00:00:01.000000", "1970-01-01 00:00:03.000000", 0)))
    assert(out(1) == ((1L, "b", 2L, "1970-01-01 00:00:03.000000", "1970-01-01 00:00:04.000000", 0)))
    assert(out(2) == ((1L, "a", 3L, "1970-01-01 00:00:04.000000", Scd2.OpenEndSentinel, 1)))
    assert(out(3) == ((2L, "x", 1L, "1970-01-01 00:00:01.000000", Scd2.OpenEndSentinel, 1)))
  }

  test("scd2 intervals tile each key's timeline: from < to, no overlap, one current") {
    val df = log(
      (1L, "a", 1000000L, 1L),
      (1L, "b", 2000000L, 2L),
      (1L, "c", 5000000L, 3L),
      (3L, "z", 9000000L, 4L)
    )
    val rows = Scd2
      .buildType2(df, Seq("k"), Seq("attr"), "ts", "eid")
      .orderBy("k", "version")
      .collect()
    val byKey = rows.groupBy(_.getAs[Long]("k"))
    byKey.foreach { case (_, vs) =>
      assert(vs.count(_.getAs[Int]("is_current") == 1) == 1)
      vs.sliding(2).foreach {
        case Array(a, b) =>
          // adjacent versions share the boundary instant exactly
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
        case _ => ()
      }
      vs.foreach(r => assert(r.getAs[String]("valid_from") < r.getAs[String]("valid_to")))
    }
  }

  private def corpus = {
    val s = spark
    import s.implicits._
    // one dominant word repeated enough that the relative cut (max/4)
    // separates it from its injected corruptions
    val words = Seq.fill(400)("spark") ++ Seq.fill(300)("table") ++ Seq.fill(250)("query")
    words.grouped(25).zipWithIndex.map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  test("symspell restores every OOV form to a vocabulary word one deletion away") {
    val out = SymSpell.restoreTypos(corpus, "doc_id", "text").collect()
    assert(out.nonEmpty) // rate 1/8 over ~950 tokens injects reliably
    val vocab = Set("spark", "table", "query")
    out.foreach { r =>
      val bad = r.getAs[String]("bad_tok")
      val good = r.getAs[String]("restored_tok")
      assert(vocab.contains(good))
      assert(!vocab.contains(bad))
      assert(bad.length == good.length - 1)
      // bad really is good minus one character
      assert(
        (0 until good.length)
          .exists(i => good.substring(0, i) + good.substring(i + 1) == bad)
      )
      assert(r.getAs[Long]("n_occ") > 0L)
    }
  }

  test("streaming scd2Updates replayed through an upsert equals the batch builder") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.ChangeEvent
    def at(secs: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(secs)}")
    val batch1 = Seq(
      ChangeEvent(1L, "a", at(1), 1L),
      ChangeEvent(1L, "a", at(2), 2L),
      ChangeEvent(2L, "x", at(1), 3L)
    )
    val batch2 = Seq(
      ChangeEvent(1L, "b", at(3), 4L), // change -> closes v1, opens v2
      ChangeEvent(2L, "x", at(5), 5L), // unchanged -> no emission
      ChangeEvent(1L, "a", at(6), 6L)  // back to 'a' -> v3
    )
    val mem = MemoryStream[ChangeEvent]
    val q = StreamingOps
      .scd2Updates(mem.toDS())
      .writeStream
      .format("memory")
      .queryName("scd2_out")
      .outputMode("append")
      .start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // upsert by (user_id, version): the LAST emission wins (a close
    // supersedes the open it closes)
    val streamed = spark
      .table("scd2_out")
      .collect()
      .zipWithIndex
      .groupBy(r => (r._1.getAs[Long]("user_id"), r._1.getAs[Long]("version")))
      .map { case (_, vs) => vs.maxBy(_._2)._1 }
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[String]("event_type"),
          r.getAs[Long]("version"),
          r.getAs[Long]("valid_from_us"),
          Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue),
          r.getAs[Boolean]("is_current")
        )
      )
      .toSet
    // batch builder over the SAME log
    val log = (batch1 ++ batch2).toDF()
    val expected = graft.operators.Scd2
      .buildType2(log, Seq("user_id"), Seq("event_type"), "ts", "event_id")
      .collect()
      .map { r =>
        def us(str: String): Long =
          java.sql.Timestamp.valueOf(str).toInstant.getEpochSecond * 1000000L
        (
          r.getAs[Long]("user_id"),
          r.getAs[String]("event_type"),
          r.getAs[Long]("version"),
          us(r.getAs[String]("valid_from")),
          if (r.getAs[Int]("is_current") == 1) None
          else Some(us(r.getAs[String]("valid_to"))),
          r.getAs[Int]("is_current") == 1
        )
      }
      .toSet
    assert(streamed == expected)
  }

  test("typo injection is partition-independent (pure function of doc_id:pos:tok)") {
    val a = SymSpell
      .injectTypos(corpus.repartition(7), "doc_id", "text", 0.125, 4)
      .groupBy("tok")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val b = SymSpell
      .injectTypos(corpus.coalesce(1), "doc_id", "text", 0.125, 4)
      .groupBy("tok")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(a == b)
    assert(a.keys.exists(t => !Set("spark", "table", "query").contains(t)))
  }
}
