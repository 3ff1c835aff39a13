package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** E413 unigram-LM tokenizer: hand-checked Viterbi, tie-break law, coverage,
  * hard-EM objective monotonicity, partition invariance.
  */
class UnigramLmSpec extends SparkSpec {

  private def piecesDF(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("piece", "cost")
  }

  private def wordsDF(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("word", "freq")
  }

  private def segOf(words: Seq[(String, Long)], pieces: Seq[(String, Long)]) =
    UnigramLm
      .viterbiSegment(wordsDF(words: _*), piecesDF(pieces: _*), maxPieceLen = 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](2), r.getLong(3))))
      .toMap

  test("Viterbi picks the exact min-cost segmentation (hand-computed)") {
    // 'abcd': [abcd]=100, [ab,cd]=30+30=60, [a,b,cd]=25+25+30=80,
    // [abc,d]=45+25=70 → [ab,cd] wins at 60
    val pieces = Seq("a" -> 25L, "b" -> 25L, "c" -> 25L, "d" -> 25L,
      "ab" -> 30L, "cd" -> 30L, "abc" -> 45L, "abcd" -> 100L)
    val out = segOf(Seq("abcd" -> 7L), pieces)
    assert(out("abcd") == ((Seq("ab", "cd"), 60L)))
  }

  test("exact-cost ties break on the lexicographically smaller chr(31) path") {
    // 'ab': [ab]=20 vs [a,b]=10+10=20 — tie; 'a'+sep+'b' sorts below 'ab'
    // because the separator (0x1f) is smaller than any letter
    val out = segOf(Seq("ab" -> 1L), Seq("a" -> 10L, "b" -> 10L, "ab" -> 20L))
    assert(out("ab") == ((Seq("a", "b"), 20L)))
    // flip the economics: [ab]=19 beats the tie-break
    val out2 = segOf(Seq("ab" -> 1L), Seq("a" -> 10L, "b" -> 10L, "ab" -> 19L))
    assert(out2("ab") == ((Seq("ab"), 19L)))
  }

  test("single-char coverage makes every vocabulary word segmentable") {
    val s = spark
    import s.implicits._
    val docs = Seq("zq xxyzzy a", "zq zq prr").toDF("text")
    val words = UnigramLm.wordFreqs(docs, "text")
    val pieces = UnigramLm.candidatePieces(words, maxPieceLen = 4, topN = 2)
    // topN=2 keeps almost no multi-char pieces; chars alone must suffice
    val seg = UnigramLm.viterbiSegment(words, pieces, maxPieceLen = 4)
    assert(seg.count() == words.count())
    assert(seg.filter(size(col("seg")) === 0).count() == 0)
    // reconstruction: concatenating each word's pieces yields the word
    val bad = seg
      .withColumn("rebuilt", concat_ws("", col("seg")))
      .filter(col("rebuilt") =!= col("word"))
      .count()
    assert(bad == 0, "every segmentation must reconstruct its word")
  }

  test("hard-EM corpus cost is non-increasing and training is deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq.tabulate(60)(i =>
      s"join hash row batch scan w${i % 5} join hash joinhash").toDF("text")
    val (p1, c1) = UnigramLm.train(docs, "text", maxPieceLen = 4, topN = 32, rounds = 1)
    val (p2, c2) = UnigramLm.train(docs, "text", maxPieceLen = 4, topN = 32, rounds = 2)
    val (p2b, c2b) = UnigramLm.train(docs, "text", maxPieceLen = 4, topN = 32, rounds = 2)
    // round 2 re-segments under usage-renormalized costs: the hard-EM
    // objective cannot rise beyond micro-nat quantization jitter
    assert(c2 <= c1 + 1000L, s"EM objective rose: round1 $c1 → round2 $c2")
    assert(c2 == c2b, "training must be deterministic")
    assert(p2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      .sameElements(p2b.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted))
    assert(p1.count() > 0 && p2.count() > 0)
  }

  test("phraseTag: exact occurrences, overlaps, blocking false-positives rejected") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the bad actor did a bad deed"),
      (2L, "bad bad actor"),
      (3L, "nothing here"),
      (4L, "actor bad")
    ).toDF("doc_id", "text")
    val out = graft.functions.TextAnalysis
      .phraseTag(docs, "doc_id", "text",
        Seq(Seq("bad", "actor"), Seq("bad", "bad"), Seq("nothing"), Seq("bad", "deed", "x")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      (1L, "bad actor", 2L), // "the [bad actor] did…"
      (2L, "bad actor", 2L), // second 'bad' starts the phrase
      (2L, "bad bad", 1L),
      (3L, "nothing", 1L) // single-token phrase degrades to a vocab hit
      // "bad deed x": first-token candidates at doc1 pos 2/6 — slice check
      // rejects both; doc 4's "bad" at the end can't head any 2-gram
    ), s"got $out")
  }

  test("segmentation and recount are partition-invariant") {
    val s = spark
    import s.implicits._
    val docs = Seq.tabulate(40)(i => s"alpha beta gamma d${i % 3} alphabeta").toDF("text")
    def run(parts: Int) = {
      val words = UnigramLm.wordFreqs(docs.repartition(parts), "text")
      val pieces = UnigramLm.candidatePieces(words, 4, 16)
      UnigramLm
        .emRecount(UnigramLm.viterbiSegment(words.repartition(parts), pieces, 4))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
    }
    assert(run(1) == run(7))
  }
}
