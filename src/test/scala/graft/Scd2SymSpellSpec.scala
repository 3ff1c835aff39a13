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
