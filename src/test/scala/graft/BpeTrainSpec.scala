package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** BPE merge learning on the classic hand-checkable corpus: known merge
  * order, greedy non-overlap semantics, encode/learn consistency.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges recovers the expected first merges on the classic corpus") {
    // "low" x5, "lowest" x2: pairs (l,o) and (o,w) both appear 7 times —
    // lexicographic tie-break picks (l,o) first, then (lo,w)
    val docs = Seq.fill(5)("low").mkString(" ") + " " + Seq.fill(2)("lowest").mkString(" ")
    val df = Seq(docs).toDF("text")
    val merges = BpeTrain
      .learnMerges(df, "text", nMerges = 3, minPairCount = 2)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges(0) === ((0, "l", "o", "lo", 7L)))
    assert(merges(1) === ((1, "lo", "w", "low", 7L)))
    // after (lo,w): "low</w>" x5 and "low e s t </w>" x2 → next best is
    // (low,</w>) with 5
    assert(merges(2) === ((2, "low", "</w>", "low</w>", 5L)))
  }

  test("greedy merge does not double-merge overlapping occurrences") {
    // word "aaa": pairs (a,a) count 2 per word — one merge pass yields
    // [aa, a, </w>], never [aa, aa, ...]
    val df = Seq("aaa aaa aaa").toDF("text")
    val merges = BpeTrain.learnMerges(df, "text", nMerges = 1, minPairCount = 2).collect()
    assert(merges.length == 1)
    val seg = BpeTrain
      .applyMerges(df.limit(1), "text", Seq(("a", "a")))
      .select(col("_bpe"))
      .head()
      .getSeq[String](0)
    assert(seg === Seq("aa", "a", "</w>"), seg.toString)
  }

  test("applyMerges replays the learned table to a coarser segmentation") {
    val df = Seq("low low low low low lowest lowest").toDF("text")
    val learned = BpeTrain
      .learnMerges(df, "text", nMerges = 3, minPairCount = 2)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    val segs = BpeTrain
      .applyMerges(df, "text", learned)
      .select(col("_w"), col("_bpe"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    assert(segs("low") === Seq("low</w>"))
    assert(segs("lowest") === Seq("low", "e", "s", "t", "</w>"))
  }

  test("learnMerges stops early when no pair clears the frequency floor") {
    val df = Seq("ab cd ef").toDF("text")
    val merges = BpeTrain.learnMerges(df, "text", nMerges = 10, minPairCount = 2).collect()
    assert(merges.isEmpty)
  }
}
