package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Targeted semantics tests for the corpus-curation operators (the sf0.01
  * value-for-value checks live in the DuckDB oracle entries).
  */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontamination flags only train docs sharing a 3-gram with eval") {
    val train = docs(
      1L -> "the quick brown fox jumps over fences",
      2L -> "completely unrelated training content here",
      3L -> "quick brown fox appears here too somehow"
    )
    val eval = docs(100L -> "watch the quick brown fox leap")
    val out = Curation
      .contaminationPairs(train, eval, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares "the quick brown" + "quick brown fox" (2 grams), doc 3
    // shares "quick brown fox" (1); doc 2 is clean
    assert(out.map(t => ((t._1, t._2), t._3)).toMap == Map((1L, 100L) -> 2L, (3L, 100L) -> 1L))
  }

  test("temperatureMixture survives a 100TB-class char budget without Long overflow") {
    val s = spark
    import s.implicits._
    // one source → w_ppm = 1_000_000; budget 1e14 chars: the old BIGINT
    // product budget·w_ppm = 1e20 wraps past Long.MaxValue (ANSI off) and
    // silently corrupted epochs_milli — the DECIMAL(38,0) product must not
    val docs = Seq((1L, "web", 500L), (2L, "web", 500L)).toDF("doc_id", "source", "n_chars")
    val budget = 100_000_000_000_000L // 1e14
    val row = graft.operators.Curation
      .temperatureMixture(docs, "source", "n_chars", budget)
      .head()
    assert(row.getAs[Long]("w_ppm") == 1000000L)
    // epochs = budget / chars = 1e14 / 1000 → 1e11 epochs = 1e14 milli
    assert(row.getAs[Long]("epochs_milli") == 100_000_000_000_000L,
      s"epochs_milli=${row.getAs[Long]("epochs_milli")}")
    assert(row.getAs[Long]("epochs_milli") > 0, "overflow would go negative")
  }

  test("extractMainContent keeps the article and drops nav/footer/script") {
    val page =
      """<html><head><title>tiny page</title>
        |<style>body{color:red}</style><script>alert("the the the");</script>
        |</head><body>
        |<div class="nav"><a href="/">home page</a> <a href="/x">all the posts</a> <a href="/y">sign in</a></div>
        |<h1>a heading</h1>
        |<p>this is the real article text and it talks about a topic at length with the detail a reader wants</p>
        |<div class="footer"><a href="/terms">terms</a> 2024</div>
        |</body></html>""".stripMargin
    val df = docs(1L -> page).withColumnRenamed("text", "html")
    val blocks = Curation
      .htmlBlocks(df, "doc_id", "html")
      .orderBy("block_id")
      .collect()
    // script/style text never reaches any block
    assert(!blocks.exists(_.getAs[String]("block_text").contains("alert")))
    assert(!blocks.exists(_.getAs[String]("block_text").contains("color:red")))
    val kept = blocks.filter(_.getAs[Boolean]("is_content"))
    assert(kept.length == 1, blocks.map(_.mkString("|")).mkString("\n"))
    assert(kept.head.getAs[String]("block_text").startsWith("this is the real article"))
    // the nav block is rejected for link density specifically
    val nav = blocks.find(_.getAs[String]("block_text").contains("home page")).get
    assert(nav.getAs[Long]("link_ppm") >= 250000L)
    // heading fails the minimum token count
    val h1 = blocks.find(_.getAs[String]("block_text") == "a heading").get
    assert(h1.getAs[Long]("n_tokens") < 5L)

    val doc = Curation.extractMainContent(df, "doc_id", "html").head()
    assert(doc.getAs[Long]("n_kept") == 1L)
    assert(doc.getAs[String]("main_text").startsWith("this is the real article"))
  }

  test("extractMainContent keeps all-boilerplate docs with n_kept 0") {
    val df = docs(7L -> """<div><a href="/a">one link</a> <a href="/b">two link</a> <a href="/c">the rest</a></div>""")
      .withColumnRenamed("text", "html")
    val doc = Curation.extractMainContent(df, "doc_id", "html").head()
    assert(doc.getAs[Long]("n_kept") == 0L)
    assert(doc.getAs[String]("main_text") == "")
  }

  test("htmlBlocks stopword-density gate rejects token soup") {
    val df = docs(
      1L -> "<p>the quick brown fox jumps over the lazy dog near a river</p>",
      2L -> "<p>FOO BAR BAZ QUX QUUX CORGE GRAULT GARPLY WALDO FRED</p>"
    ).withColumnRenamed("text", "html")
    val m = Curation
      .htmlBlocks(df, "doc_id", "html")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_content"))
      .toMap
    assert(m == Map(1L -> true, 2L -> false))
  }

  test("normalizeUrl canonicalizes scheme/host/port/params/slash, preserves path case") {
    val cases = Seq(
      "HTTP://Example.COM:80/Path/One/?utm_source=f&b=2&a=1#frag" ->
        "http://example.com/Path/One?a=1&b=2",
      "https://a.b.c:443/x?z=1" -> "https://a.b.c/x?z=1",
      "http://Site.com/" -> "http://site.com",
      // :8080 is NOT a default port and must survive
      "http://h.io:8080/p" -> "http://h.io:8080/p",
      // all params tracking → no '?' at all
      "http://h.io/p?utm_a=1&utm_b=2" -> "http://h.io/p"
    )
    val df = docs(cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }: _*)
      .toDF("id", "url")
    val got = df
      .select(col("id"), Curation.normalizeUrl(col("url")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"$u → ${got(i.toLong)} (want $want)")
    }
  }

  test("decodeHtmlEntities decodes the five named entities with &amp; last") {
    val df = docs(1L -> "a &lt;b&gt; &quot;c&quot; d&#39;s&nbsp;&amp; e")
    val out = df.select(Curation.decodeHtmlEntities(col("text"))).head().getString(0)
    assert(out == "a <b> \"c\" d's & e")
    val n = df.select(Curation.htmlEntityCount(col("text"))).head().getLong(0)
    assert(n == 7L)
  }

  test("extractLinks resolves every href tier and drops unfetchable targets") {
    val html =
      """<a href="http://other.com/x">abs</a>
        |<a href="//cdn.ex.com/lib.js">proto</a>
        |<a href="/root/a">root</a>
        |<a href="sib.html">rel</a>
        |<a href="#sec">frag</a>
        |<a href="mailto:a@b.c">mail</a>
        |<a href="javascript:void(0)">js</a>""".stripMargin
    val df = docs(1L -> html)
      .withColumnRenamed("text", "html")
      .withColumn("base", lit("HTTPS://Ex.COM:443/dir/page.html#top"))
    val got = Curation
      .extractLinks(df, "doc_id", "html", "base")
      .collect()
      .map(r => r.getAs[String]("href") -> r.getAs[String]("url"))
      .toMap
    assert(got == Map(
      "http://other.com/x" -> "http://other.com/x",
      "//cdn.ex.com/lib.js" -> "https://cdn.ex.com/lib.js",
      "/root/a" -> "https://ex.com/root/a",
      "sib.html" -> "https://ex.com/dir/sib.html"
    ), s"got $got")
  }

  test("robotsScreen matches host+prefix, counts rules once per distinct url") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "http://a.com/private/x"),  // blocked by both a.com rules
      (2L, "http://a.com/public"),     // allowed
      (3L, "http://b.com/private/x"),  // no rules for b.com
      (4L, "http://a.com/shared"),     // duplicated row below
      (5L, "http://a.com/shared")
    ).toDF("id", "url")
    val rules = Seq(("a.com", "/private"), ("a.com", "/priv")).toDF("host", "prefix")
    val out = Curation.robotsScreen(urls, "url", rules)
      .collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("n_rules_matched"), r.getAs[Boolean]("allowed"))))
      .toMap
    assert(out(1L) == ((2L, false)), s"got ${out(1L)}")
    assert(out(2L) == ((0L, true)))
    assert(out(3L) == ((0L, true)))
    // the shared url appears in two rows; each row reports the SAME count
    assert(out(4L) == ((0L, true)) && out(5L) == ((0L, true)))
  }

  test("extractAnchors carries cleaned link text; anchorTextRollup picks dominant text") {
    val s = spark
    import s.implicits._
    val html =
      """<a href="/t">click  here</a> <a href="/t">click here</a>
        |<a href="/t">better name</a> <a href="/other">x</a>
        |<a href="/t"><img src="i.png"></a>
        |<a href="/icon"></a>""".stripMargin
    val df = docs(1L -> html)
      .withColumnRenamed("text", "html")
      .withColumn("base", lit("http://ex.com/p/q.html"))
    val anchors = Curation.extractAnchors(df, "doc_id", "html", "base")
    val got = anchors.collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("anchor_text")))
    // nested-tag anchor (<img> body) is out of the simple-anchor shape; the
    // empty-body icon anchor IS matched but carries an empty text
    assert(got.toSet == Set(
      ("http://ex.com/t", "click here"), // whitespace collapsed → both rows equal
      ("http://ex.com/t", "better name"),
      ("http://ex.com/other", "x"),
      ("http://ex.com/icon", "")
    ), got.mkString(", "))
    assert(got.count(_ == (("http://ex.com/t", "click here"))) == 2)

    val roll = Curation.anchorTextRollup(anchors, "url", "anchor_text")
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_anchors"), r.getAs[Long]("n_texts"),
          r.getAs[String]("top_text"), r.getAs[Long]("top_n"))))
      .toMap
    assert(roll("http://ex.com/t") == ((3L, 2L, "click here", 2L)), roll.toString)
    assert(roll("http://ex.com/other") == ((1L, 1L, "x", 1L)))
    assert(!roll.contains("http://ex.com/icon")) // empty texts excluded

    // tie on count → lexicographically greatest text wins
    val tie = Curation.anchorTextRollup(
      Seq(("u", "alpha"), ("u", "beta")).toDF("url", "anchor_text"),
      "url", "anchor_text").head()
    assert(tie.getAs[String]("top_text") == "beta" && tie.getAs[Long]("top_n") == 1L)
  }

  test("robotsDecision: longest prefix wins, allow beats disallow at equal length") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "http://a.com/pub/x"),     // /pub allow (len 4) beats / disallow (len 1)
      (2L, "http://a.com/pub/sec/x"), // /pub/sec disallow (len 8) beats /pub allow
      (3L, "http://a.com/other"),     // only / disallow matches
      (4L, "http://a.com/tie"),       // /tie allow + /tie disallow → allow wins
      (5L, "http://b.com/pub/x")      // no rules for b.com → allowed, len 0
    ).toDF("id", "url")
    val rules = Seq(
      ("a.com", "/", false),
      ("a.com", "/pub", true),
      ("a.com", "/pub/sec", false),
      ("a.com", "/tie", true),
      ("a.com", "/tie", false)
    ).toDF("host", "prefix", "allow")
    val out = Curation.robotsDecision(urls, "url", rules)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("matched_len"), r.getAs[Boolean]("allowed"))))
      .toMap
    assert(out(1L) == ((4L, true)), out.toString)
    assert(out(2L) == ((8L, false)))
    assert(out(3L) == ((1L, false)))
    assert(out(4L) == ((4L, true)))
    assert(out(5L) == ((0L, true)))
  }

  test("luhnValid and redactValidCards: checksum gates the redaction") {
    val s = spark
    import s.implicits._
    // 4532015112830366 is Luhn-valid; flipping the last digit breaks it
    val df = Seq(
      (1L, "pay 4532015112830366 now"),          // valid → redacted
      (2L, "ref 4532015112830367 kept"),         // invalid → untouched
      (3L, "a 4532015112830366 b 4532015112830367 c"), // mixed
      (4L, "short 123456 stays")                 // below candidate length
    ).toDF("id", "t")
    val out = df.select(col("id"), Curation.redactValidCards(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "pay <CARD> now", out.toString)
    assert(out(2L) == "ref 4532015112830367 kept")
    assert(out(3L) == "a <CARD> b 4532015112830367 c")
    assert(out(4L) == "short 123456 stays")
    val v = Seq(("4532015112830366", true), ("4532015112830367", false), ("79927398713", true))
      .toDF("d", "want")
    assert(v.filter(Curation.luhnValid(col("d")) =!= col("want")).count() == 0)
  }

  test("prCurve: hand-computed confusion counts across thresholds") {
    val s = spark
    import s.implicits._
    // scores 50k/150k/.../950k (bins 0..9), label = top 4 bins positive
    val df = (0 until 10).map(i => (i * 100000L + 50000L, i >= 6)).toDF("s", "y")
    val out = graft.operators.Curation.prCurve(df, "s", "y", bins = 10)
      .collect()
      .map(r => r.getAs[Long]("threshold_ppm") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("recall_ppm"))))
      .toMap
    // t=0: everything positive → P = 4/10, R = 1
    assert(out(0L) == ((4L, 6L, 0L, 400000L, 1000000L)), out.toString)
    // t=600000: exactly the 4 positives → P = R = 1
    assert(out(600000L) == ((4L, 0L, 0L, 1000000L, 1000000L)))
    // t=800000: 2 of 4 → P = 1, R = 1/2
    assert(out(800000L) == ((2L, 0L, 2L, 1000000L, 500000L)))
    // F1 at t=0: 2·0.4·1/(1.4) ppm, integral division
    val f1 = graft.operators.Curation.prCurve(df, "s", "y", bins = 10)
      .filter(col("threshold_ppm") === 0L).collect().head.getAs[Long]("f1_ppm")
    assert(f1 == 2L * 400000L * 1000000L / 1400000L, f1.toString)
  }

  test("paddingWasteReport: exact pad accounting and the bucketing win") {
    val s = spark
    import s.implicits._
    // lengths 10, 60, 64, 70: buckets 64 (three docs) and 128 (one doc)
    val df = Seq(10L, 60L, 64L, 70L).toDF("n_tokens")
    val out = graft.operators.Curation.paddingWasteReport(df, "n_tokens", 64)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet == Set(64L, 128L))
    val b64 = out(64L)
    assert(b64.getAs[Long]("n_docs") == 3L && b64.getAs[Long]("sum_tokens") == 134L)
    assert(b64.getAs[Long]("pad_tokens") == 64L * 3 - 134) // 58
    assert(b64.getAs[Long]("waste_ppm") == 58L * 1000000L / 192L)
    val b128 = out(128L)
    assert(b128.getAs[Long]("pad_tokens") == 128L - 70L)
    // unbucketed baseline: everything padded to 128 → (4·128 − 204)/512
    val glob = (4L * 128 - 204) * 1000000L / (4L * 128)
    assert(out.values.forall(_.getAs[Long]("global_pad_ppm") == glob))
    // the whole point: bucketing strictly beats pad-to-max on this frame
    assert(out.values.forall(_.getAs[Long]("waste_ppm") < glob))
    // degenerate zero-token doc: bucket 0 reports 0 waste instead of
    // dividing by zero; an all-empty frame likewise
    val withZero = graft.operators.Curation
      .paddingWasteReport(Seq(0L, 70L).toDF("n_tokens"), "n_tokens", 64)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("waste_ppm")).toMap
    assert(withZero(0L) == 0L, withZero.toString)
    val allZero = graft.operators.Curation
      .paddingWasteReport(Seq(0L).toDF("n_tokens"), "n_tokens", 64)
      .collect().head
    assert(allZero.getAs[Long]("global_pad_ppm") == 0L, allZero.toString)
  }

  test("quantileNormalize: cross-source calibration despite wild scale gaps") {
    val s = spark
    import s.implicits._
    // source a scores in [0.1, 0.5]; source b in [900, 1300] — a raw global
    // threshold would keep ALL of b and none of a
    val df = (1 to 5).map(i => ("a", i.toLong, 0.1 * i)) ++
      (1 to 5).map(i => ("b", 100L + i, 800.0 + 100 * i))
    val out = graft.operators.Curation
      .quantileNormalize(df.toDF("source", "id", "score"), "score", "source", "id")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("id"), r.getAs[Long]("norm_ppm")))
    // each source spans the full [0, 1e6] ladder with the same steps
    Seq("a", "b").foreach { src =>
      val ppms = out.filter(_._1 == src).map(_._3).sorted
      assert(ppms.toSeq == Seq(0L, 250000L, 500000L, 750000L, 1000000L), ppms.mkString(","))
    }
    // a global "top 40%" cut (norm_ppm >= 750000) keeps exactly 2 per source
    val kept = out.filter(_._3 >= 750000L)
    assert(kept.count(_._1 == "a") == 2 && kept.count(_._1 == "b") == 2)
    // singleton stratum normalizes to 0, not a division by zero
    val single = graft.operators.Curation
      .quantileNormalize(Seq(("c", 1L, 7.0)).toDF("source", "id", "score"),
        "score", "source", "id")
      .collect().head.getAs[Long]("norm_ppm")
    assert(single == 0L)
  }

  test("tokenBudgetTrim: md5-order prefix fills but never exceeds the budget") {
    val s = spark
    import s.implicits._
    val docs = (1L to 10L).map(i => ("w", i, 30L)).toDF("source", "doc_id", "n_tokens")
    val budgets = Seq(("w", 100L)).toDF("source", "budget")
    val out = graft.operators.Curation
      .tokenBudgetTrim(docs, "source", "doc_id", "n_tokens", budgets)
      .collect()
    val kept = out.filter(_.getAs[Boolean]("kept"))
    // 30-token docs against 100: exactly 3 fit, 90 tokens, never 4
    assert(kept.length == 3, kept.mkString(";"))
    assert(kept.map(_.getAs[Long]("n_tokens")).sum == 90L)
    assert(kept.forall(_.getAs[Long]("cum_tokens") <= 100L))
    // the kept prefix is the md5 order, not ingestion order: recompute it
    val md5Order = (1L to 10L).sortBy { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.take(3).toSet
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == md5Order)
    // determinism: same frame again
    val again = graft.operators.Curation
      .tokenBudgetTrim(docs, "source", "doc_id", "n_tokens", budgets)
      .filter(col("kept")).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == md5Order)
  }

  test("strideInterleave: every prefix carries the blend, sources finish together") {
    val s = spark
    import s.implicits._
    // source a: 4 docs, source b: 8 docs — b must appear twice as often
    val df = ((1L to 4L).map(i => ("a", i)) ++ (11L to 18L).map(i => ("b", i)))
      .toDF("source", "doc_id")
    val out = graft.operators.Curation.strideInterleave(df, "source", "doc_id")
      .orderBy(col("vt_ppm"), col("source"), col("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("vt_ppm")))
    // any prefix ending on a full stride: 1 a per 2 b
    val first6 = out.take(6)
    assert(first6.count(_._1 == "a") == 2 && first6.count(_._1 == "b") == 4, first6.mkString(","))
    // all sources exhaust at vt = 1e6 exactly
    assert(out.filter(_._1 == "a").map(_._2).max == 1000000L)
    assert(out.filter(_._1 == "b").map(_._2).max == 1000000L)
    // vt is monotone in rank within each source
    Seq("a", "b").foreach { src =>
      val vts = out.filter(_._1 == src).map(_._2)
      assert(vts.zip(vts.tail).forall { case (x, y) => x <= y })
    }
  }

  test("epochSchedule: exact repetition accounting with a binding cap") {
    val s = spark
    import s.implicits._
    val avail = Seq(("web", 100L), ("code", 10L), ("empty", 0L))
      .toDF("source", "avail_tokens")
    val targets = Seq(("web", 150L), ("code", 100L), ("empty", 50L))
      .toDF("source", "target_tokens")
    val out = graft.operators.Curation.epochSchedule(avail, targets, "source", 4)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("epochs"), r.getAs[Long]("served_tokens"),
          r.getAs[Long]("deficit_tokens"), r.getAs[Long]("repeat_ppm"))))
      .toMap
    // web: 2 epochs cover 150 of 100-avail; served capped at target
    assert(out("web") == ((2L, 150L, 0L, 1500000L)), out("web").toString)
    // code: needs 10 epochs, cap 4 binds -> 40 served, 60 unfilled
    assert(out("code") == ((4L, 40L, 60L, 4000000L)), out("code").toString)
    // empty source: zero everything, no division blowup
    assert(out("empty") == ((0L, 0L, 50L, 0L)), out("empty").toString)
  }

  test("corpusCard: every datasheet metric exact on a hand corpus") {
    val s = spark
    import s.implicits._
    val long = ("words " * 30).trim // 179 chars, 30 tokens
    val df = Seq(
      ("a", "en", long),
      ("a", "en", long),                       // exact duplicate
      ("b", "de", "short doc"),                // < 100 chars
      ("b", "fr", s"mail me at bob@example.com today")
    ).toDF("source", "lang", "text")
    val card = graft.operators.Curation.corpusCard(df, "text", "source", "lang")
      .collect().map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    assert(card("n_docs") == 4L)
    assert(card("n_sources") == 2L && card("n_langs") == 3L)
    assert(card("exact_dup_docs") == 1L, card.toString)
    assert(card("email_docs") == 1L, card.toString)
    assert(card("short_docs") == 2L, card.toString) // "short doc" + the email doc
    assert(card("n_tokens") == 30L + 30L + 2L + 5L, card.toString)
    assert(card("n_chars") == 179L + 179L + 9L + 32L, card.toString)
  }

  test("dateShift: intervals exact, offsets bounded, per-entity consistent") {
    val s = spark
    import s.implicits._
    val base = 1700000000000000L // µs epoch
    val df = Seq(
      (1L, base), (1L, base + 3600000000L), (1L, base + 7200000000L),
      (2L, base + 100L)
    ).map { case (u, us) => (u, new java.sql.Timestamp(us / 1000)) }
      .toDF("user_id", "ts")
    val out = graft.operators.Curation.dateShift(df, "user_id", "ts", 30)
      .select(col("user_id"), col("offset_days"),
        unix_micros(col("ts")).as("us"), unix_micros(col("ts_shifted")).as("uss"))
      .collect()
    out.foreach { r =>
      val off = r.getAs[Long]("offset_days")
      assert(off >= -30 && off <= 30, r.toString)
      assert(r.getAs[Long]("uss") - r.getAs[Long]("us") == off * 86400000000L, r.toString)
    }
    // one offset per entity; intervals inside the entity survive exactly
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[Long]("offset_days")).distinct.length == 1)
    val origGaps = u1.map(_.getAs[Long]("us")).sorted.sliding(2).map(p => p(1) - p(0)).toSeq
    val shiftGaps = u1.map(_.getAs[Long]("uss")).sorted.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(origGaps == shiftGaps, s"$origGaps vs $shiftGaps")
    // different entities get (generally) different offsets — deterministic fn of key
    val offs = out.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("offset_days")).toMap
    val again = graft.operators.Curation.dateShift(df, "user_id", "ts", 30)
      .select(col("user_id"), col("offset_days")).distinct().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("offset_days")).toMap
    assert(again == offs)
  }

  test("kAnonLattice: least-generalized achieving node wins, grid complete") {
    val s = spark
    import s.implicits._
    // engineered so (1,1) is the unique cheapest k=2 node:
    // a1 singleton breaks every a_level=0 node and (2,0)/(1,0) via B=4
    val rows =
      Seq(("a1", 4)) ++
        Seq(("a2", 3), ("a2", 3), ("a2", 1), ("a2", 1), ("a2", 2)) ++
        Seq.fill(5)(("a3", 1)) ++ Seq.fill(5)(("a4", 3))
    val df = rows.toDF("src", "band")
    val grid = graft.operators.Curation.kAnonLattice(
      df,
      Seq(col("src"),
        when(col("src").isin("a1", "a2"), "gA").otherwise("gB"),
        lit("*")),
      Seq(col("band").cast("string"),
        when(col("band") <= 2, "x").otherwise("y"),
        lit("*")),
      k = 2
    ).collect()
    assert(grid.length == 9)
    val byNode = grid.map(r => (r.getAs[Long]("a_level"), r.getAs[Long]("b_level")) -> r).toMap
    assert(!byNode((0L, 0L)).getAs[Boolean]("achieves_k"))
    assert(!byNode((0L, 2L)).getAs[Boolean]("achieves_k"), "a1 singleton survives B suppression")
    assert(!byNode((2L, 0L)).getAs[Boolean]("achieves_k"), "B=4 singleton survives A suppression")
    assert(byNode((1L, 1L)).getAs[Boolean]("achieves_k"))
    assert(byNode((2L, 2L)).getAs[Boolean]("achieves_k"), "full suppression always achieves")
    assert(byNode((2L, 2L)).getAs[Long]("min_class_size") == 16L)
    // exactly one choice: the cheapest achieving node
    val choices = grid.filter(_.getAs[Boolean]("is_choice"))
    assert(choices.length == 1, grid.mkString(";"))
    assert((choices.head.getAs[Long]("a_level"), choices.head.getAs[Long]("b_level")) == ((1L, 1L)))
  }

  test("privacyAudit: hand-computed l-diversity and exact 1-D EMD") {
    val s = spark
    import s.implicits._
    // classes: A = two rows of band 0, B = two of band 1, C = one of each.
    // Global Q = (1/2, 1/2); P_A = (1, 0) → EMD 1/2; P_C = Q → EMD 0.
    val df = Seq(
      ("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L), ("C", 0L), ("C", 1L)
    ).toDF("g", "band")
    val out = graft.operators.Curation.privacyAudit(df, Seq("g"), "band")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("class_size"), r.getAs[Long]("l_distinct"), r.getAs[Long]("emd_ppm"))))
      .toMap
    assert(out("A") == ((2L, 1L, 500000L)), out.toString)
    assert(out("B") == ((2L, 1L, 500000L)))
    assert(out("C") == ((2L, 2L, 0L)))
    // degenerate one-value domain: EMD defined as 0
    val one = Seq(("A", 7L), ("B", 7L)).toDF("g", "band")
    val o1 = graft.operators.Curation.privacyAudit(one, Seq("g"), "band")
      .collect().map(r => r.getAs[Long]("emd_ppm")).toSeq
    assert(o1 == Seq(0L, 0L))
  }

  test("calibrationReport: exact ppm bins, gaps, and the weighted ECE") {
    val s = spark
    import s.implicits._
    // bin 0 (scores < 100000): conf (20000+80000)/2=50000, 1 positive →
    // acc 500000; bin 9: two docs conf 950000, both positive → acc 1000000
    val scored = Seq(
      (20000L, false), (80000L, true), (950000L, true), (950000L, true)
    ).toDF("s_ppm", "y")
    val out = Curation.calibrationReport(scored, "s_ppm", "y", bins = 10)
      .collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("conf_ppm"),
          r.getAs[Long]("acc_ppm"), r.getAs[Long]("gap_ppm"), r.getAs[Long]("ece_ppm"))))
      .toMap
    // ECE = (2·450000 + 2·50000) / 4 = 250000
    assert(out(0L) == ((2L, 50000L, 500000L, 450000L, 250000L)), out.toString)
    assert(out(1L * 9) == ((2L, 950000L, 1000000L, 50000L, 250000L)))
    // a score of exactly 1e6 clamps into the top bin, not bin 10
    val edge = Curation.calibrationReport(
      Seq((1000000L, true)).toDF("s_ppm", "y"), "s_ppm", "y", bins = 10).head()
    assert(edge.getAs[Long]("bin") == 9L)
  }

  test("recrawlSchedule classifies new/stale/fresh/orphan with date compares") {
    val s = spark
    import s.implicits._
    val sitemap = Seq(
      ("u/new", "2024-02-01"), ("u/stale", "2024-02-01"), ("u/fresh", "2024-01-01")
    ).toDF("url", "lm").select(col("url"), to_date(col("lm")).as("lastmod"))
    val log = Seq(
      ("u/stale", "2024-01-15"), ("u/fresh", "2024-01-15"), ("u/orphan", "2024-01-15")
    ).toDF("url", "f").select(col("url"), to_date(col("f")).as("fetched_at"))
    val out = Curation.recrawlSchedule(sitemap, log)
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("status"), r.getAs[Boolean]("needs_fetch"))))
      .toMap
    assert(out == Map(
      "u/new" -> (("new", true)), "u/stale" -> (("stale", true)),
      "u/fresh" -> (("fresh", false)), "u/orphan" -> (("orphan", false))
    ), out.toString)
  }

  test("maxMinFairBudget: water-filling with exact integer remainder spread") {
    val s = spark
    import s.implicits._
    // queues 2, 5, 40, 41 with budget 20: host a fully served (2·4+0=8≤20),
    // b fully served (5·3+2=17≤20); rem 13 over {c, d} → 6 each, first
    // (smaller queue, c) takes the odd unit
    val hosts = Seq(("a", 2L), ("b", 5L), ("c", 40L), ("d", 41L)).toDF("host", "q")
    val out = Curation.maxMinFairBudget(hosts, "host", "q", budget = 20L)
      .collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("alloc"), r.getAs[Boolean]("fully_served"))))
      .toMap
    assert(out == Map(
      "a" -> ((2L, true)), "b" -> ((5L, true)),
      "c" -> ((7L, false)), "d" -> ((6L, false))
    ), out.toString)
    assert(out.values.map(_._1).sum == 20L)

    // budget covers everything → every host fully served, Σalloc = Σq
    val all = Curation.maxMinFairBudget(hosts, "host", "q", budget = 1000L)
      .collect().map(r => (r.getAs[Long]("alloc"), r.getAs[Boolean]("fully_served")))
    assert(all.forall(_._2) && all.map(_._1).sum == 88L)

    // extreme skew: one megahost can't starve the rest
    val skew = Seq(("mega", 1000000L), ("s1", 3L), ("s2", 3L)).toDF("host", "q")
    val sk = Curation.maxMinFairBudget(skew, "host", "q", budget = 30L)
      .collect().map(r => r.getAs[String]("host") -> r.getAs[Long]("alloc")).toMap
    assert(sk == Map("s1" -> 3L, "s2" -> 3L, "mega" -> 24L), sk.toString)
  }

  test("urlTemplate collapses hex ids before digit runs") {
    val cases = Seq(
      "http://s1.com/p/12345" -> "http://s{n}.com/p/{n}",
      // 8+ hex chars (incl. a pure-digit run of 8) → {h}, not two {n}s
      "http://s.com/d/deadbeef42" -> "http://s.com/d/{h}",
      "http://s.com/d/12345678" -> "http://s.com/d/{h}",
      "http://s.com/cal?y=2024&m=7" -> "http://s.com/cal?y={n}&m={n}"
    )
    val df = docs(cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }: _*)
      .toDF("id", "url")
    val got = df.select(col("id"), Curation.urlTemplate(col("url")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"$u → ${got(i.toLong)}")
    }
  }

  test("crawlTrapReport flags the unbounded template, keeps structural ones") {
    val s = spark
    import s.implicits._
    // calendar trap: 30 urls one host; structural: 3 hosts' root pages
    val urls = ((1 to 30).map(d => s"http://trap.com/cal/2024/$d") ++
      Seq("http://a.com/about", "http://b.com/about", "http://c.com/about") ++
      Seq("http://a.com/about")).toDF("url") // dup must not inflate counts
    val out = Curation.crawlTrapReport(urls, "url", minUrls = 10L)
      .collect()
      .map(r => r.getAs[String]("template") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_hosts"),
          r.getAs[Long]("urls_per_host"), r.getAs[Boolean]("is_trap"))))
      .toMap
    assert(out("http://trap.com/cal/{n}/{n}") == ((30L, 1L, 30L, true)), out.toString)
    assert(out("http://a.com/about") == ((1L, 1L, 1L, false)))
    assert(out.size == 4) // a/b/c differ only in host letter → 3 templates + trap
  }

  test("fetchSchedule assigns deterministic per-host slots and ETAs") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      "http://a.com/z", "http://a.com/m", "http://a.com/b",
      "http://b.com/only", "http://a.com/m" // dup collapses
    ).toDF("url")
    val out = Curation.fetchSchedule(urls, "url", crawlDelayMs = 100L)
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("host"), r.getAs[Long]("slot"),
          r.getAs[Long]("n_host_urls"), r.getAs[Long]("eta_ms"))))
      .toMap
    assert(out("http://a.com/b") == (("a.com", 1L, 3L, 0L)), out.toString)
    assert(out("http://a.com/m") == (("a.com", 2L, 3L, 100L)))
    assert(out("http://a.com/z") == (("a.com", 3L, 3L, 200L)))
    assert(out("http://b.com/only") == (("b.com", 1L, 1L, 0L)))
  }

  test("parseWarcLite splits records, reads headers, audits declared lengths") {
    val archive =
      "WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://a.com/1\n" +
        "Content-Length: 11\n\nhello world\n" +
        "WARC/1.0\nWARC-Target-URI: http://a.com/2\nContent-Length: 99\n\nshort\n" +
        "WARC/1.0\nWARC-Target-URI: http://a.com/3\nContent-Length: 3\n\nabc\n"
    val df = docs(7L -> archive).withColumnRenamed("text", "warc")
    val out = Curation
      .parseWarcLite(df, "doc_id", "warc")
      .orderBy("rec_id")
      .collect()
      .map(r => (r.getAs[Long]("rec_id"), r.getAs[String]("uri"),
        r.getAs[String]("body"), r.getAs[Boolean]("length_ok")))
    assert(out.toSeq == Seq(
      (1L, "http://a.com/1", "hello world", true),
      (2L, "http://a.com/2", "short", false), // declared 99, actual 5
      (3L, "http://a.com/3", "abc", true)
    ), out.mkString("\n"))
  }

  test("web pipeline composes: archive → records → main text → links → frontier") {
    val page1 =
      """<html><body><div><a href="/nav1">all the nav</a> <a href="/nav2">more the nav</a> <a href="/nav3">still the nav</a></div>
        |<p>this is the first article and it has a reasonable amount of the usual text</p>
        |<p><a href="/next">read the next article on a page</a> plus the trailing words here</p>
        |</body></html>""".stripMargin.replace("\n", "")
    val page2 =
      """<html><body><p>the second article talks about a different topic at the same length</p>
        |<p><a href="http://other.com/x">an offsite link in the body</a> and more of the words</p>
        |</body></html>""".stripMargin.replace("\n", "")
    def rec(uri: String, body: String) =
      s"WARC/1.0\nWARC-Target-URI: $uri\nContent-Length: ${body.length}\n\n$body\n"
    val archive = rec("http://a.com/p/1", page1) + rec("http://b.com/q/2", page2)
    val arc = docs(1L -> archive).withColumnRenamed("text", "warc")

    val records = Curation.parseWarcLite(arc, "doc_id", "warc")
    assert(records.count() == 2 &&
      records.filter(col("length_ok")).count() == 2, "both records parse length-clean")

    val main = Curation
      .extractMainContent(records.select(col("uri"), col("body")), "uri", "body")
      .collect()
      .map(r => r.getAs[String]("uri") -> r.getAs[String]("main_text"))
      .toMap
    assert(main("http://a.com/p/1").startsWith("this is the first article"))
    assert(main("http://b.com/q/2").startsWith("the second article"))
    // the link-dense nav block never reaches the extracted text
    assert(!main("http://a.com/p/1").contains("nav"))

    val frontier = Curation
      .extractLinks(records.select(col("uri"), col("body")), "uri", "body", "uri")
      .select(Curation.normalizeUrl(col("url")).as("u"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(frontier == Set(
      "http://a.com/nav1", "http://a.com/nav2", "http://a.com/nav3",
      "http://a.com/next", "http://other.com/x"
    ), s"frontier $frontier")
  }

  test("pii scrub redacts emails, IPv4s, and long digit runs in order") {
    val df = docs(1L -> "mail bob.smith+x@corp.example.org from 192.168.0.1 acct 123456789 tail")
    val red = df.select(Curation.piiScrub(col("text"))).head().getString(0)
    assert(red == "mail <EMAIL> from <IP> acct <NUM> tail")
    val (e, i, n) = Curation.piiCounts(col("text"))
    val counts = df.select(e, i, n).head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((1L, 1L, 1L)))
    // short digit runs and bare words survive
    val clean = docs(2L -> "version 1.2.3 build 42")
    assert(clean.select(Curation.piiScrub(col("text"))).head().getString(0) == "version 1.2.3 build 42")
  }

  test("repetition stats: totals, distincts, top-token share, dup ratio") {
    val df = docs(1L -> "a a a b b c", 2L -> "x y z")
    val out = Curation
      .repetitionStats(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((6L, 3L, 0.5, 0.5)))   // 6 tokens, 3 distinct, 'a' 3/6
    assert(out(2L) == ((3L, 3L, 0.3333, 0.0)))
  }

  test("token packing: cumulative budget boundaries, parallel per stratum") {
    val s = spark
    import s.implicits._
    // 4 docs of 3 tokens each, budget 6 → packs 0,0,1,1 within the stratum
    val df = Seq(
      ("en", 1L, "w w w"), ("en", 2L, "w w w"), ("en", 3L, "w w w"), ("en", 4L, "w w w"),
      ("de", 9L, "w w w w w w w") // 7 tokens > budget: alone in pack 1 (cum 7)
    ).toDF("lang", "doc_id", "text")
    val out = Curation
      .packByTokenBudget(df, Seq("lang"), "doc_id", "text", 6)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(out(("en", 1L)) == 0L && out(("en", 2L)) == 0L) // cum 3, 6
    assert(out(("en", 3L)) == 1L && out(("en", 4L)) == 1L) // cum 9, 12
    assert(out(("de", 9L)) == 1L)
    // a global (un-stratified) pack order is refused
    intercept[IllegalArgumentException] {
      Curation.packByTokenBudget(df, Seq.empty, "doc_id", "text", 6)
    }
  }

  test("quality band keeps the middle percentiles per stratum") {
    val s = spark
    import s.implicits._
    // 5 docs per stratum with strictly increasing quality (longer → higher
    // length-saturation score) → percent_rank 0, .25, .5, .75, 1
    def doc(n: Int) = Seq.fill(n * 8)("word").mkString(" ")
    val df = (1 to 5).flatMap(i =>
      Seq(("en", i.toLong, doc(i)), ("de", 10L + i, doc(i)))
    ).toDF("lang", "doc_id", "text")
    val kept = Curation
      .qualityBand(df, "doc_id", "text", "lang", 0.2, 0.8)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    // rank 0 (worst) and rank 1.0 (best) fall outside [0.2, 0.8] in BOTH strata
    assert(kept == Set(2L, 3L, 4L, 12L, 13L, 14L), s"kept $kept")
  }

  test("tf-idf ranks a rare distinctive term above ubiquitous ones") {
    val corpus = docs(
      1L -> "common common common zebra",
      2L -> "common words fill this doc",
      3L -> "common words appear here again",
      4L -> "common words everywhere as usual"
    )
    // log-idf production variant: doc 1's top term must be the corpus-unique
    // "zebra" (tf 1 × high idf), not "common" (tf 3 × idf ~ 0)
    val top = graft.operators.TermStats
      .tfIdfTopTerms(corpus, "doc_id", "text", k = 1, logIdf = true)
      .filter(col("doc_id") === 1L)
      .select("term")
      .head()
      .getString(0)
    assert(top == "zebra")
    // ratio variant agrees on this corpus
    val topRatio = graft.operators.TermStats
      .tfIdfTopTerms(corpus, "doc_id", "text", k = 1, logIdf = false)
      .filter(col("doc_id") === 1L)
      .select("term")
      .head()
      .getString(0)
    assert(topRatio == "zebra")
  }

  test("mlm mask is deterministic, near the target rate, and position-consistent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Curation.mlmMask(docs, "doc_id", "text", 0.15).collect()
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    val masked = out.map(_.getAs[Long]("n_masked")).sum
    val rate = masked.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"rate $rate")
    out.foreach { r =>
      val pos = r.getAs[String]("masked_positions")
      val n = if (pos.isEmpty) 0 else pos.split(",").length
      assert(n.toLong == r.getAs[Long]("n_masked"), r.toString)
      if (n > 0) {
        val ps = pos.split(",").map(_.toLong)
        assert(ps.sameElements(ps.sorted) && ps.forall(p => p >= 1 && p <= r.getAs[Long]("n_tokens")))
      }
    }
    // identical mask on rerun (no RNG anywhere)
    val again = graft.operators.Curation.mlmMask(docs, "doc_id", "text", 0.15).collect()
    assert(out.map(r => r.getLong(0) -> r.getString(3)).toMap ==
      again.map(r => r.getLong(0) -> r.getString(3)).toMap)
  }

  test("dsir weights rank target-like docs above off-target docs; partition-independent") {
    val s = spark
    import s.implicits._
    // target slice (id < 10) speaks "alpha"; the rest speak "omega"; probe
    // docs mix them — weight must order by target-likeness
    val rows =
      (0L until 10L).map(i => (i, "alpha alpha alpha alpha", true)) ++
        (10L until 20L).map(i => (i, "omega omega omega omega", false)) ++
        Seq((100L, "alpha alpha alpha omega", false), (101L, "alpha omega omega omega", false))
    val docs = rows.toDF("doc_id", "text", "tgt")
    val out = graft.operators.Curation
      .dsirWeights(docs, "doc_id", "text", col("tgt"), 64)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("dsir_weight"))
      .toMap
    assert(out(0L) > out(100L), s"pure target not above mixed: $out")
    assert(out(100L) > out(101L), s"3:1 mix not above 1:3 mix: $out")
    assert(out(101L) > out(10L), s"1:3 mix not above pure off-target: $out")
    val again = graft.operators.Curation
      .dsirWeights(docs.repartition(5), "doc_id", "text", col("tgt"), 64)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("dsir_weight"))
      .toMap
    assert(out == again, "weights changed under repartitioning")
  }

  test("span corruption hits the target rate, merges spans, and is partition-independent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Curation.spanCorrupt(docs, "doc_id", "text", 0.15, 3).collect()
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    val corrupted = out.map(_.getAs[Long]("n_corrupted")).sum
    val rate = corrupted.toDouble / total
    // expected ≈ 0.15 minus overlap shrinkage; generous band
    assert(rate > 0.09 && rate < 0.21, s"rate $rate")
    out.foreach { r =>
      val nCov = r.getAs[Long]("n_corrupted")
      val nSpans = r.getAs[Long]("n_spans")
      // merged spans: each covers >= 1 token, at most spanLen tokens per
      // contributing start, and numbering is dense 0..n_spans-1 in the text
      assert(nSpans <= nCov && (nCov == 0) == (nSpans == 0), r.toString)
      val text = r.getAs[String]("corrupted_text")
      val sentinels = "<extra_id_(\\d+)>".r.findAllMatchIn(text).map(_.group(1).toInt).toSeq
      assert(sentinels.size.toLong == nSpans, r.toString)
      assert(sentinels == (0 until sentinels.size), s"non-dense sentinels: $sentinels")
      // every corrupted run in the position list is contiguous per span count
      val pos = r.getAs[String]("corrupted_positions")
      if (pos.nonEmpty) {
        val ps = pos.split(",").map(_.toLong)
        val runs = ps.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 => (p :: acc.head) :: acc.tail
          case (acc, p)                                           => List(p) :: acc
        }
        assert(runs.size.toLong == nSpans, r.toString)
        // every merged span is >= spanLen tokens unless truncated by doc end
        val nTok = r.getAs[Long]("n_tokens")
        assert(
          runs.forall(run => run.size >= 3 || run.contains(nTok)),
          s"interior span shorter than spanLen: $r"
        )
      }
    }
    // identical output under a different physical partitioning — the md5
    // position contract is data-dependent only
    val shuffled = graft.operators.Curation
      .spanCorrupt(docs.repartition(7, col("source")), "doc_id", "text", 0.15, 3)
      .collect()
    assert(out.map(r => r.getLong(0) -> r.getString(5)).toMap ==
      shuffled.map(r => r.getLong(0) -> r.getString(5)).toMap)
  }

  test("linear quality classifier scores every doc and labels by logit sign") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wtab = s.range(256).select(
      col("id").as("bucket"),
      round(
        conv(substring(md5(concat(lit("qw|"), col("id").cast("string"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0) * 2 - 1,
        9
      ).cast("decimal(18,9)").as("weight")
    )
    val out = graft.operators.Curation
      .linearQualityScore(docs, "doc_id", "text", wtab, 256)
      .collect()
    assert(out.length.toLong == docs.count())
    out.foreach { r =>
      val logit = r.getAs[Double]("logit")
      val label = r.getAs[String]("label")
      assert(math.abs(logit) <= 1.0, r.toString) // mean of weights in [-1,1]
      assert(label == (if (logit >= 0.0) "keep" else "drop"), r.toString)
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
    // both labels occur on the synthetic corpus — the cut is non-degenerate
    assert(out.map(_.getAs[String]("label")).distinct.sorted.toSeq == Seq("drop", "keep"))
    // a doc with no tokens abstains: n_tokens 0, logit 0, keep
    val empty = graft.operators.Curation
      .linearQualityScore(Seq((1L, " ")).toDF("doc_id", "text"), "doc_id", "text", wtab, 256)
      .collect()
    assert(empty.length == 1 && empty.head.getAs[Long]("n_tokens") == 0L &&
      empty.head.getAs[Double]("logit") == 0.0 && empty.head.getAs[String]("label") == "keep")
  }

  test("codeScreen: symbol density routes code-like text, zero-length is prose") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "def f(x) { return (x < y); }"), // dense in {}();=<>
      (2L, "plain prose with no special symbols at all"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .codeScreen(df, "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    // doc 1: symbols (){}();< → 8 of 28 chars ≈ 285714 ppm
    assert(out(1L).getAs[Long]("symbols") == 8L)
    assert(out(1L).getAs[Boolean]("is_code"))
    assert(out(2L).getAs[Long]("symbols") == 0L && !out(2L).getAs[Boolean]("is_code"))
    assert(out(3L).getAs[Long]("symbol_ppm") == 0L && !out(3L).getAs[Boolean]("is_code"))
  }

  test("spanNovelty: first appearance owns the span; copies score zero novelty") {
    val s = spark
    import s.implicits._
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      (1L, eight),                 // introduces the span
      (2L, eight),                 // verbatim copy → 0 novel
      (3L, "a b c d e f g h i"),   // 2 distinct spans, both novel
      (4L, "too short")            // < 8 tokens → sentinel
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .spanNovelty(df, "doc_id", "text", k = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Long]("n_novel") == 1L && out(1L).getAs[Long]("novel_ppm") == 1000000L)
    assert(out(2L).getAs[Long]("n_novel") == 0L && out(2L).getAs[Long]("novel_ppm") == 0L)
    assert(out(3L).getAs[Long]("n_spans") == 2L && out(3L).getAs[Long]("novel_ppm") == 1000000L)
    assert(out(4L).getAs[Long]("n_spans") == 0L && out(4L).getAs[Long]("novel_ppm") == -1L)
  }

  test("spanRewrite: non-owner copies lose covered tokens; owner and unique text survive") {
    val s = spark
    import s.implicits._
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      (1L, eight),                              // owner (min id): keeps everything
      (2L, "pre " + eight + " post"),           // copy inside unique text → loses the 8
      (3L, "a b c d e f g h i"),                // unique spans → untouched
      (4L, eight)                               // another verbatim copy → fully cut
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .spanRewrite(df, "doc_id", "text", k = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    def md5Hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // owner: 8 tokens, none dropped, text intact
    assert(out(1L).getAs[Long]("n_dropped") == 0L)
    assert(out(1L).getAs[String]("kept_md5") == md5Hex(eight))
    // copy with flanks: exactly the 8 covered tokens cut, flanks rejoined
    assert(out(2L).getAs[Long]("n_tokens") == 10L && out(2L).getAs[Long]("n_dropped") == 8L)
    assert(out(2L).getAs[String]("kept_md5") == md5Hex("pre post"))
    // unique doc untouched
    assert(out(3L).getAs[Long]("n_dropped") == 0L)
    assert(out(3L).getAs[String]("kept_md5") == md5Hex("a b c d e f g h i"))
    // verbatim copy: everything cut, md5 of the empty rewrite
    assert(out(4L).getAs[Long]("n_dropped") == 8L)
    assert(out(4L).getAs[String]("kept_md5") == md5Hex(""))
    // overlapping duplicated spans cover shared tokens ONCE: doc 6 contains
    // a 9-token run whose two overlapping 8-spans both exist in doc 5 —
    // 9 tokens cut, not 16
    val df2 = Seq(
      (5L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),
      (6L, "lead x1 x2 x3 x4 x5 x6 x7 x8 x9 tail")
    ).toDF("doc_id", "text")
    val out2 = graft.operators.Dedup
      .spanRewrite(df2, "doc_id", "text", k = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out2(5L).getAs[Long]("n_dropped") == 0L)
    assert(out2(6L).getAs[Long]("n_dropped") == 9L)
    assert(out2(6L).getAs[String]("kept_md5") == md5Hex("lead tail"))
  }

  test("incrementalSpanRewrite ≡ monolithic spanRewrite restricted to batch rows") {
    val s = spark
    import s.implicits._
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val nine = "y1 y2 y3 y4 y5 y6 y7 y8 y9"
    val corpus = Seq(
      (1L, eight),
      (2L, "a b c d e f g h i")
    ).toDF("doc_id", "text")
    // batch (ids above all corpus ids — the ingest-order contract):
    // 101 re-sends corpus content inside flanks (corpus owns → 8 cut);
    // 102/103 are a batch-internal pair of UNSEEN content (102 owns, 103
    // fully cut); 104 is unseen and unique (identity)
    val batch = Seq(
      (101L, "pre " + eight + " post"),
      (102L, nine),
      (103L, nine),
      (104L, "p q r s t u v w x")
    ).toDF("doc_id", "text")
    def md5Hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    withTempDir { dir =>
      graft.operators.Dedup.buildSpanIndex(corpus, "doc_id", "text", s"$dir/sp")
      val inc = graft.operators.Dedup
        .incrementalSpanRewrite(batch, "doc_id", "text", s"$dir/sp")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped"), r.getAs[String]("kept_md5"))))
        .toMap
      val mono = graft.operators.Dedup
        .spanRewrite(corpus.unionByName(batch), "doc_id", "text")
        .filter(col("doc_id") >= 100L)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped"), r.getAs[String]("kept_md5"))))
        .toMap
      assert(inc === mono, s"inc=$inc mono=$mono")
      // corpus-owned content cut, flanks survive
      assert(inc(101L) === ((10L, 8L, md5Hex("pre post"))), inc(101L).toString)
      // batch-internal: min-id owner keeps, its twin is emptied
      assert(inc(102L) === ((9L, 0L, md5Hex(nine))))
      assert(inc(103L) === ((9L, 9L, md5Hex(""))))
      // unseen unique doc is the identity rewrite
      assert(inc(104L) === ((9L, 0L, md5Hex("p q r s t u v w x"))))
    }
  }
}
