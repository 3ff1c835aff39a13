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

  private def mergeTable(
      df: org.apache.spark.sql.DataFrame,
      n: Int,
      batch: Int
  ): Seq[(Int, String, String, String, Long)] =
    BpeTrain
      .learnMerges(df, "text", nMerges = n, minPairCount = 2, maxBatchPerRound = batch)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("batched rounds produce the merge table the sequential loop produces") {
    // corpora chosen to attack every batching stop condition:
    //  - created-pair dominance: after merging (a,b), the new pair (x,ab)
    //    outranks the next disjoint candidate — the ceiling must end the
    //    round so the sequential argmax picks (x,ab) next
    val createdDominates = Seq(
      (Seq.fill(50)("xab") ++ Seq.fill(45)("cd")).mkString(" "))
    //  - lexicographic tie against a created pair: (a,bc)-style created
    //    names that sort BEFORE remaining originals at equal count
    val createdLexTie = Seq(
      (Seq.fill(40)("zbc") ++ Seq.fill(40)("de")).mkString(" "))
    //  - overlap/greedy semantics inside a batch (l == r members)
    val overlaps = Seq(
      (Seq.fill(30)("aaaa") ++ Seq.fill(28)("bc") ++ Seq.fill(26)("dd")).mkString(" "))
    //  - the classic hand-checkable corpus
    val classic = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++ Seq.fill(6)("newer")).mkString(" "))
    //  - pseudo-random tiny-alphabet corpora: maximal symbol sharing, heavy
    //    ties, chained created-token reuse (deterministic seed)
    val rnd = new scala.util.Random(41)
    val randoms = (1 to 6).map { _ =>
      Seq((1 to 300).map { _ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" "))
    }
    val corpora = Seq(createdDominates, createdLexTie, overlaps, classic) ++ randoms
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val df = texts.toDF("text")
      val seq = mergeTable(df, 8, batch = 1)
      val bat = mergeTable(df, 8, batch = 8)
      assert(bat == seq, s"corpus #$i: batched $bat != sequential $seq")
    }
  }

  test("batched rounds match sequential on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val seq = mergeTable(docs, 12, batch = 1)
    val bat = mergeTable(docs, 12, batch = 12)
    assert(bat == seq, s"batched $bat != sequential $seq")
  }

  private def deltaTable(
      df: org.apache.spark.sql.DataFrame,
      n: Int,
      batch: Int
  ): Seq[(Int, String, String, String, Long)] =
    BpeTrain
      .learnMerges(df, "text", nMerges = n, minPairCount = 2,
        maxBatchPerRound = batch, deltaState = true)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("delta-state training produces the recompute's merge table on every corpus family") {
    // the same adversarial families as the batching proof (created-pair
    // dominance, lex ties, overlap greediness, classic, tiny-alphabet
    // randoms): the maintained trigram state must be indistinguishable from
    // the per-round recompute — counts, ceilings and collision flags alike
    val createdDominates = Seq(
      (Seq.fill(50)("xab") ++ Seq.fill(45)("cd")).mkString(" "))
    val createdLexTie = Seq(
      (Seq.fill(40)("zbc") ++ Seq.fill(40)("de")).mkString(" "))
    val overlaps = Seq(
      (Seq.fill(30)("aaaa") ++ Seq.fill(28)("bc") ++ Seq.fill(26)("dd")).mkString(" "))
    val classic = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++ Seq.fill(6)("newer")).mkString(" "))
    val rnd = new scala.util.Random(43)
    val randoms = (1 to 4).map { _ =>
      Seq((1 to 300).map { _ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" "))
    }
    val corpora = Seq(createdDominates, createdLexTie, overlaps, classic) ++ randoms
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val df = texts.toDF("text")
      // against BOTH schedulers: sequential (batch 1) and batched rounds
      assert(deltaTable(df, 8, batch = 1) == mergeTable(df, 8, batch = 1),
        s"corpus #$i: delta(seq) diverged")
      assert(deltaTable(df, 8, batch = 8) == mergeTable(df, 8, batch = 8),
        s"corpus #$i: delta(batched) diverged")
    }
  }

  test("delta-state training matches the recompute on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(deltaTable(docs, 12, batch = 12) == mergeTable(docs, 12, batch = 12))
  }

  test("bpeEncodeWords equals the Column-HOF replay word for word on learned tables") {
    def foldSegs(df: org.apache.spark.sql.DataFrame, merges: Seq[(String, String)]) =
      BpeTrain.applyMerges(df, "text", merges)
        .select(col("_w"), col("_bpe")).distinct()
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def fastSegs(df: org.apache.spark.sql.DataFrame, merges: Seq[(String, String)]) =
      BpeTrain.bpeEncodeWords(df, "text", merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val rnd = new scala.util.Random(17)
    val corpora = Seq(
      // classic + created-pair chains
      Seq.fill(5)("low").mkString(" ") + " " + Seq.fill(3)("lowest lower newest") .mkString(" "),
      // overlap runs (l == r merges) and dead lower-rank pairs
      (Seq.fill(20)("aaaa") ++ Seq.fill(18)("abab") ++ Seq.fill(16)("bcbc")).mkString(" ")
    ) ++ (1 to 4).map { _ =>
      (1 to 250).map { _ =>
        (1 to (2 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" ")
    }
    val s = spark
    import s.implicits._
    corpora.zipWithIndex.foreach { case (text, i) =>
      val df = Seq(text).toDF("text")
      val merges = BpeTrain.learnMerges(df, "text", nMerges = 10, minPairCount = 2)
        .orderBy(col("rank")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
      if (merges.nonEmpty)
        assert(fastSegs(df, merges) == foldSegs(df, merges), s"corpus #$i diverged")
    }
    // depth beyond the HOF replay's comfort: a 24-merge table still encodes
    // (and round-trips the classic invariants) through the imperative path
    val wide = ('a' to 'x').grouped(2).map(_.mkString).zipWithIndex
      .flatMap { case (w, i) => Seq.fill(40 - i)(w + "!") }.mkString(" ")
    val wideDf = Seq(wide).toDF("text")
    val wideMerges = BpeTrain.learnMerges(wideDf, "text", nMerges = 24, minPairCount = 2)
      .orderBy(col("rank")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(wideMerges.size >= 12, s"expected a wide table, got ${wideMerges.size}")
    val encoded = fastSegs(wideDf, wideMerges)
    assert(encoded.nonEmpty)
    // segmentation is a partition of the word's characters + the end marker
    encoded.foreach { case (w, segs) =>
      assert(segs.mkString == w + "</w>", s"$w -> $segs is not a partition")
    }
  }

  test("a disjoint pair spectrum trains in >=5x fewer Spark jobs than the sequential loop") {
    // 12 symbol-disjoint frequent pairs with strictly graded counts; each
    // pair occurs under 4 shared prefixes x 3 FAMILY-PRIVATE suffixes (so
    // no suffix-</w> pair accumulates across families and no trigram family
    // reaches a pair's count) — the whole spectrum batches in ONE round
    val pairSyms = ('A' to 'X').map(_.toString).grouped(2).map(_.mkString).toSeq // 12 pairs
    val sufPool = (('0' to '9') ++ ('a' to 'z')).map(_.toString) // 36 private suffixes
    val pre = Seq("!", "#", "%", "&")
    val words = pairSyms.zipWithIndex.flatMap { case (p, i) =>
      val suf = sufPool.slice(i * 3, i * 3 + 3)
      val contexts = for { a <- pre; b <- suf } yield s"$a$p$b" // 12 contexts
      val freqPer = 40 - i * 2 // pair count = 12 * freqPer, strictly graded
      contexts.flatMap(w => Seq.fill(freqPer)(w))
    }
    val df = Seq(words.mkString(" ")).toDF("text")
    val sc = spark.sparkContext
    def jobsFor(group: String)(run: => Unit): Int = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try run finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    val seqTable = scala.collection.mutable.ArrayBuffer.empty[Any]
    val batTable = scala.collection.mutable.ArrayBuffer.empty[Any]
    val seqJobs = jobsFor("bpe-seq") { seqTable ++= mergeTable(df, 12, batch = 1) }
    val batJobs = jobsFor("bpe-bat") { batTable ++= mergeTable(df, 12, batch = 12) }
    assert(batTable == seqTable, "job-count A/B must be at EQUAL output")
    assert(seqTable.size == 12, s"expected 12 merges, got ${seqTable.size}")
    assert(seqJobs >= 5 * batJobs,
      s"sequential $seqJobs jobs vs batched $batJobs — expected >=5x reduction")
  }
}
