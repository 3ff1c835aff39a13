package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Unit semantics for the retrieval layer (BM25 / inverted index / keyness)
  * on tiny hand-checkable corpora; oracle parity at sf runs through the
  * txt_bm25_topdocs / txt_inverted_index / txt_keyness_chi2 driver entries.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark join", "en"),
    (2L, "spark join join join", "en"),
    (3L, "vector vector stream", "de"),
    (4L, "stream stream stream stream", "de"),
    (5L, "join vector", "en")
  ).toDF("doc_id", "text", "lang")

  test("bm25TopDocs ranks higher-tf docs first at equal length and caps at k") {
    val out = Retrieval
      .bm25TopDocs(corpus, "doc_id", "text", Seq("spark", "stream"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
      .toSet
    // doc 1 (tf=3, dl=4) beats doc 2 (tf=1, dl=4) for "spark"; doc 4 (tf=4)
    // beats doc 3 (tf=2) for "stream"; k=2 keeps exactly two rows per term
    assert(out === Set(("spark", 1L, 1L), ("spark", 2L, 2L), ("stream", 4L, 1L), ("stream", 3L, 2L)))
  }

  test("bm25 saturation: tf growth raises the score sublinearly") {
    val scores = Retrieval
      .bm25TopDocs(corpus, "doc_id", "text", Seq("spark"), k = 5)
      .orderBy(col("rank"))
      .select(col("bm25"))
      .as[Double]
      .collect()
    assert(scores.length === 2)
    // tf 3 vs 1 at equal dl: score grows, but by less than 3×
    assert(scores(0) > scores(1) && scores(0) < scores(1) * 3.0)
  }

  test("invertedIndex emits sorted capped postings with df and cf") {
    val idx = Retrieval
      .invertedIndex(corpus, "doc_id", "text", minTermLen = 3, maxPostings = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(idx("join") === ((3L, 5L, "1,2")))   // docs 1,2,5 → capped to 2
    assert(idx("vector") === ((2L, 3L, "3,5")))
    assert(idx("stream") === ((2L, 5L, "3,4")))
  }

  test("booleanAndSearch keeps only docs matching every query term") {
    val hits = Retrieval
      .booleanAndSearch(corpus, "doc_id", "text", Seq("spark", "join"))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(hits === Set(1L, 2L)) // docs 1,2 contain both; 5 has join only
  }

  test("phraseSearch finds consecutive positions, including repeats and 3-term phrases") {
    val docs = Seq(
      (1L, "a b c a b"), // "a b" at 1 and 4
      (2L, "a c b"),     // both terms, never adjacent
      (3L, "a b c d")    // 3-term phrase "a b c" at 1
    ).toDF("doc_id", "text")
    val two = Retrieval
      .phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSet
    assert(two === Set((1L, 1), (1L, 4), (3L, 1)))
    val three = Retrieval
      .phraseSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSet
    assert(three === Set((1L, 1), (3L, 1)))
  }

  test("chi2Keyness flags group-exclusive terms as most key, with the right slice") {
    val rows = Retrieval
      .chi2Keyness(corpus, "text", "lang", "en", k = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getString(4))))
      .toMap
    // "stream" occurs only outside en, "spark"/"join" predominantly inside
    assert(rows("stream")._2 === "rest")
    assert(rows("spark")._2 === "en")
    // exclusive terms separate the slices more strongly than the shared "vector"
    assert(rows("stream")._1 > rows("vector")._1)
    assert(rows("spark")._1 > rows("vector")._1)
    assert(rows.values.forall(_._1 >= 0.0))
  }

  test("bm25 index: query-time stats make appends exact — ranking ≡ monolithic, idf moves") {
    val s = spark
    import s.implicits._
    val corpus1 = Seq(
      (1L, "apple banana cherry date elderberry fig grape"),
      (2L, "apple apple kiwi lemon mango nectarine orange"),
      (3L, "papaya quince raspberry strawberry tomato ugli vanilla")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "apple walnut xigua yam zucchini almond barley"),
      (12L, "apple cashew dill endive fennel ginger herb")
    ).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long](1), (r.getAs[Double]("bm25"), r.getAs[Long]("rank")))).toMap
    withTempDir { dir =>
      graft.operators.Retrieval.buildBm25Index(corpus1, "doc_id", "text", s"$dir/idx")
      val before = rows(graft.operators.Retrieval
        .bm25TopDocsFromIndex(spark, s"$dir/idx", Seq("apple"), k = 10))
      val mono1 = rows(graft.operators.Retrieval
        .bm25TopDocs(corpus1, "doc_id", "text", Seq("apple"), k = 10))
      assert(before === mono1, s"before=$before mono1=$mono1")
      graft.operators.Retrieval.appendBm25Index(batch, "doc_id", "text", s"$dir/idx", 1L)
      val after = rows(graft.operators.Retrieval
        .bm25TopDocsFromIndex(spark, s"$dir/idx", Seq("apple"), k = 10))
      val mono2 = rows(graft.operators.Retrieval
        .bm25TopDocs(corpus1.unionByName(batch), "doc_id", "text", Seq("apple"), k = 10))
      // the append changed df (2→4) and N/avgdl — the index's query-time
      // statistics must track, so post-append ranking equals the monolithic
      // recompute over the union…
      assert(after === mono2, s"after=$after mono2=$mono2")
      // …and doc 1's score really moved even though doc 1 never changed —
      // the staleness a materialized-score index would silently keep
      assert(after(1L)._1 != before(1L)._1, s"idf did not move: $before -> $after")
      assert(after.contains(11L) && after.contains(12L))
      // replayed append is a no-op (dynamic overwrite of its own partition)
      graft.operators.Retrieval.appendBm25Index(batch, "doc_id", "text", s"$dir/idx", 1L)
      val replay = rows(graft.operators.Retrieval
        .bm25TopDocsFromIndex(spark, s"$dir/idx", Seq("apple"), k = 10))
      assert(replay === after)
      // generic compaction folds the ingest partitions back into one
      // layout; ranking is byte-equivalent before and after
      graft.operators.IndexMaintenance.compact(
        spark, s"$dir/idx/postings", Seq("ingest_id", "term_pfx"))
      graft.operators.IndexMaintenance.compact(
        spark, s"$dir/idx/docstats", Seq("ingest_id"))
      def ingestDirs(p: String) =
        new java.io.File(p).listFiles.map(_.getName).filter(_.startsWith("ingest_id=")).sorted
      assert(ingestDirs(s"$dir/idx/postings").sameElements(Array("ingest_id=0")))
      assert(ingestDirs(s"$dir/idx/docstats").sameElements(Array("ingest_id=0")))
      val compacted = rows(graft.operators.Retrieval
        .bm25TopDocsFromIndex(spark, s"$dir/idx", Seq("apple"), k = 10))
      assert(compacted === after, s"compacted=$compacted after=$after")
    }
  }

  test("ndcgAtK: perfect ranking scores 1, inverted ranking below, unjudged gain 0") {
    val ranked = Seq(
      ("q1", 10L, 1L), ("q1", 11L, 2L), ("q1", 12L, 3L), // ideal order
      ("q2", 12L, 1L), ("q2", 11L, 2L), ("q2", 10L, 3L), // inverted
      ("q3", 10L, 1L), ("q3", 99L, 2L)                   // 99 unjudged → gain 0
    ).toDF("q", "doc_id", "rank")
    val rels = Seq(
      ("q1", 10L, 3L), ("q1", 11L, 2L), ("q1", 12L, 1L),
      ("q2", 10L, 3L), ("q2", 11L, 2L), ("q2", 12L, 1L),
      ("q3", 10L, 3L), ("q3", 11L, 2L)
    ).toDF("q", "doc_id", "gain")
    val out = Retrieval.ndcgAtK(ranked, rels, "q", "doc_id", k = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def d(gains: Seq[Long]) = gains.zipWithIndex.map { case (g, i) =>
      math.round(g / (math.log(i + 2.0) / math.log(2.0)) * 1e9) / 1e9
    }.sum
    val ideal = d(Seq(3L, 2L, 1L))
    assert(out("q1")._3 == 1.0, out.toString)
    assert(math.abs(out("q2")._1 - d(Seq(1L, 2L, 3L))) < 1e-6)
    assert(out("q2")._3 < 1.0 && math.abs(out("q2")._3 - d(Seq(1L, 2L, 3L)) / ideal) < 1e-5)
    // q3: rank-2 doc unjudged → dcg = just gain 3 at rank 1; idcg over judged {3,2}
    assert(math.abs(out("q3")._1 - 3.0) < 1e-6, out.toString)
    assert(math.abs(out("q3")._2 - d(Seq(3L, 2L))) < 1e-6)
  }

  test("queryLikelihoodTopDocs matches hand-computed Dirichlet scores, drops no-match docs") {
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "spark other other other"),
      (3L, "other other other")
    ).toDF("doc_id", "text")
    val out = Retrieval
      .queryLikelihoodTopDocs(docs, "doc_id", "text", Seq("spark", "join"), mu = 10L, k = 10)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // N = 10 tokens; cf(spark) = 3, cf(join) = 1
    // d1 (dl 3): ln(1+2·10/(10·3)) + ln(1+1·10/(10·1)) + 2·ln(10/13)
    val s1 = math.log(5.0 / 3) + math.log(2.0) + 2 * math.log(10.0 / 13)
    // d2 (dl 4): ln(1+1·10/(10·3)) + 2·ln(10/14)
    val s2 = math.log(4.0 / 3) + 2 * math.log(10.0 / 14)
    assert(out.keySet == Set(1L, 2L), out.toString) // d3 matches nothing → excluded
    assert(out(1L)._1 == 2L && out(1L)._2 == 3L)
    assert(out(2L)._1 == 1L && out(2L)._2 == 4L)
    assert(math.abs(out(1L)._3 - s1) < 1e-5, s"${out(1L)._3} vs $s1")
    assert(math.abs(out(2L)._3 - s2) < 1e-5, s"${out(2L)._3} vs $s2")
    assert(out(1L)._3 > out(2L)._3)
  }

  test("prfExpandedTopDocs: expansion recovers the doc the bare query misses") {
    val s = spark
    import s.implicits._
    // docs 1-3 are pseudo-relevant ('spark' + the co-occurring 'engine');
    // doc 4 talks about engines WITHOUT saying 'spark' — invisible to the
    // bare query, recovered by the expanded one. docs 5-6 are noise.
    val docs = Seq(
      (1L, "spark engine fast engine run"),
      (2L, "spark engine scale engine out"),
      (3L, "spark engine core"),
      (4L, "engine engine engine tuning tips"),
      (5L, "cooking pasta with sauce"),
      (6L, "gardening in the spring rain")
    ).toDF("doc_id", "text")
    val bare = graft.operators.Retrieval
      .bm25TopDocs(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!bare.contains(4L), "bare query must miss doc 4")
    val out = graft.operators.Retrieval
      .prfExpandedTopDocs(docs, "doc_id", "text", "spark", fbDocs = 3, fbTerms = 2, k = 10)
      .collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(4L), s"expansion must recover doc 4: $ids")
    assert(!ids.contains(5L) && !ids.contains(6L), s"noise stays out: $ids")
    // docs matching both query and feedback terms outrank single-term docs
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_terms")).toMap
    assert(byId(1L) >= 2L && byId(4L) >= 1L, byId.toString)
  }
}
