package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Curation, Dedup}

/** Corpus-curation battery: eval-set decontamination, PII scrub, repetition
  * quality signals, token-budget packing. All DuckDB-oracled value-for-value.
  */
object CurationQueries {

  private val wordsSql = """string_split_regex(trim(text), '\s+')"""
  /** 3-word shingles, 1-based list indexing — twin of Dedup.shingles. */
  private val shinglesSql =
    s"""list_transform(range(1, greatest(len(words) - 2, 0) + 1),
       |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])"""
      .stripMargin.replaceAll("\\s+", " ")

  // deterministic synthetic crawl URL per document — three shapes covering
  // every normalization axis: 0) SHOUTED host, default :80, tracking params,
  // unsorted query, fragment; 1) https:443 with interleaved utm_; 2) bare
  // root with trailing slash (the shape that collides after normalization)
  private val urlFixtureSql =
    """CASE CAST(doc_id % 3 AS INT)
      |WHEN 0 THEN 'HTTP://Site' || CAST(doc_id % 50 AS VARCHAR) ||
      |  '.COM:80/Path/' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#frag'
      |WHEN 1 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR) ||
      |  '.com:443/a?z=9&utm_campaign=x&y=8'
      |ELSE 'http://Site' || CAST(doc_id % 50 AS VARCHAR) || '.com/' END"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Spark twin of [[urlFixtureSql]]. */
  private def urlFixture(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val k = (col("doc_id") % 50).cast("string")
    df.select(
      col("doc_id"),
      when(
        col("doc_id") % 3 === 0,
        concat(lit("HTTP://Site"), k, lit(".COM:80/Path/"), col("doc_id").cast("string"),
          lit("/?utm_source=feed&b=2&a=1#frag"))
      ).when(
        col("doc_id") % 3 === 1,
        concat(lit("https://site"), k, lit(".com:443/a?z=9&utm_campaign=x&y=8"))
      ).otherwise(concat(lit("http://Site"), k, lit(".com/"))).as("url")
    )
  }

  /** Reusable DuckDB twin of [[Curation.normalizeUrl]]: given a relation
    * `$srcRel` with columns ($keyCols, url), emits CTEs ending in `nn`
    * with ($keyCols, url, url_norm).
    */
  private def urlNormSql(srcRel: String, keyCols: String): String =
    s"""ns AS (SELECT $keyCols, url, regexp_replace(url, '#.*$$', '') AS u0 FROM $srcRel),
       |np AS (SELECT $keyCols, url, u0,
       |    list_sort(list_filter(string_split(
       |      regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$$', 1),
       |                     '[?](.*)$$', 1), '&'),
       |      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')) AS ps
       |  FROM ns),
       |nn AS (SELECT $keyCols, url,
       |    lower(regexp_extract(u0, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) || '://' ||
       |    regexp_replace(lower(regexp_extract(u0, '^[^:/]+://([^/?#]+)', 1)),
       |                   ':(80|443)$$', '') ||
       |    regexp_replace(regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$$', 1),
       |                   '^([^?]*)', 1), '/+$$', '') ||
       |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END AS url_norm
       |  FROM np)""".stripMargin.replaceAll("\\s+", " ")

  // deterministic synthetic HTML page per document, buildable identically in
  // both engines — the corpus is plain text, so the extractor needs pages
  // with real boilerplate: a title, a link-dense nav, a heading, the article
  // body, a SHOUTED copy (no lowercase stopwords → fails stop density), and
  // a link footer. Double quotes inside attributes keep both string
  // literals single-quote-clean.
  private val htmlFixtureSql =
    """'<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
      |'</title><style>p{margin:0}</style><script>var x=1;</script></head><body>' ||
      |'<div><a href="/">home page</a> <a href="/about">about the site</a> ' ||
      |'<a href="/login">login now</a></div>' ||
      |'<h1>' || array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 3), ' ') ||
      |'</h1><p>' || text || '</p><p>' || upper(text) ||
      |'</p><div><a href="/terms">terms</a> copyright ' ||
      |CAST(2000 + doc_id % 20 AS VARCHAR) || '</div></body></html>'"""
      .stripMargin.replaceAll("\\s+", " ")

  /** DuckDB twin of [[Curation.htmlBlocks]] over the fixture — ends in a
    * relation `blk` with the operator's full per-block schema.
    */
  private val htmlBlocksSql =
    s"""WITH h AS (SELECT doc_id, $htmlFixtureSql AS html FROM documents),
       |c AS (SELECT doc_id, regexp_replace(html,
       |    '${graft.operators.Curation.HtmlNoisePattern}', ' ', 'g') AS s FROM h),
       |seg AS (SELECT doc_id, string_split(regexp_replace(s,
       |    '${graft.operators.Curation.HtmlBlockBreakPattern}', chr(10), 'g'),
       |    chr(10)) AS bs FROM c),
       |b AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(bs) + 1), i -> i)) AS bi,
       |    unnest(bs) AS raw FROM seg),
       |p AS (SELECT doc_id, CAST(bi AS BIGINT) AS block_id,
       |    trim(regexp_replace(regexp_replace(raw,
       |      '${graft.operators.Curation.HtmlTagPattern}', ' ', 'g'),
       |      '\\s+', ' ', 'g')) AS block_text,
       |    CAST(COALESCE(list_sum(list_transform(regexp_extract_all(raw,
       |      '${graft.operators.Curation.HtmlAnchorPattern}', 1),
       |      x -> length(x))), 0) AS BIGINT) AS anchor_chars
       |  FROM b),
       |m AS (SELECT doc_id, block_id, block_text,
       |    CAST(length(block_text) AS BIGINT) AS n_chars,
       |    CAST(len(list_filter(string_split(block_text, ' '),
       |      t -> t <> '')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(string_split(block_text, ' '),
       |      t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop,
       |    anchor_chars FROM p),
       |blk AS (SELECT doc_id, block_id, block_text, n_chars, n_tokens,
       |    anchor_chars * 1000000 // greatest(n_chars, 1) AS link_ppm,
       |    n_stop * 1000000 // greatest(n_tokens, 1) AS stop_ppm,
       |    (n_tokens >= 5
       |     AND anchor_chars * 1000000 // greatest(n_chars, 1) < 250000
       |     AND n_stop * 1000000 // greatest(n_tokens, 1) >= 20000) AS is_content
       |  FROM m WHERE n_chars > 0)"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Spark twin of [[htmlFixtureSql]]. */
  private def htmlFixture(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextAnalysis
    df.select(
      col("doc_id"),
      concat(
        lit("<html><head><title>doc "), col("doc_id").cast("string"),
        lit("</title><style>p{margin:0}</style><script>var x=1;</script></head><body>"),
        lit("""<div><a href="/">home page</a> <a href="/about">about the site</a> """),
        lit("""<a href="/login">login now</a></div>"""),
        lit("<h1>"), array_join(slice(TextAnalysis.tokens(col("text")), 1, 3), " "),
        lit("</h1><p>"), col("text"), lit("</p><p>"), upper(col("text")),
        lit("""</p><div><a href="/terms">terms</a> copyright """),
        (lit(2000) + col("doc_id") % 20).cast("string"),
        lit("</div></body></html>")
      ).as("html")
    )
  }

  // deterministic synthetic PII, buildable identically in both engines — the
  // documents corpus itself is clean, so the scrubber needs planted targets
  private val piiTextSql =
    """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |'@example.com or 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |' ref ' || CAST(900000000 + doc_id AS VARCHAR)"""
      .stripMargin.replaceAll("\\s+", " ")

  val entries: Seq[QEntry] = Seq(
    // Decontamination: training docs sharing any 3-gram with the (synthetic)
    // eval split doc_id % 10 == 0. Shingle equi-join; overlap = group count.
    QEntry.sql(
      "cur_decontamination",
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct($shinglesSql)) AS s
         |  FROM (SELECT doc_id, $wordsSql AS words FROM documents) w)
         |SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS common
         |FROM (SELECT * FROM sh WHERE doc_id % 10 != 0) a
         |JOIN (SELECT * FROM sh WHERE doc_id % 10 = 0) b ON a.s = b.s
         |GROUP BY 1, 2""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      Curation.contaminationPairs(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id",
        "text"
      )
    },

    // PII scrub: counts per category + md5 of the redacted text (email →
    // IPv4 → long-digit-run, in that order on both engines).
    QEntry.sql(
      "cur_pii_scrub", {
        val email = Curation.EmailPattern.replace("\\", "\\")
        val ip = Curation.Ipv4Pattern
        val num = Curation.LongDigitsPattern
        s"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(regexp_replace(t, '$email', '<EMAIL>', 'g'), '$ip')) AS BIGINT) AS n_ips,
           |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
           |        '$ip', '<IP>', 'g'), '$num')) AS BIGINT) AS n_nums,
           |  md5(regexp_replace(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
           |        '$ip', '<IP>', 'g'), '$num', '<NUM>', 'g')) AS red_md5
           |FROM (SELECT doc_id, $piiTextSql AS t FROM documents) p"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val withPii = documents(s, d).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 10.0.0."), (col("doc_id") % 256).cast("string"),
          lit(" ref "), (col("doc_id") + 900000000L).cast("string")
        ).as("t")
      )
      val (nEmails, nIps, nNums) = Curation.piiCounts(col("t"))
      withPii.select(
        col("doc_id"),
        nEmails.as("n_emails"),
        nIps.as("n_ips"),
        nNums.as("n_nums"),
        md5(Curation.piiScrub(col("t"))).as("red_md5")
      )
    },

    // E328 Luhn-gated card redaction ([[Curation.luhnValid]] /
    // [[Curation.redactValidCards]]): every doc plants one 16-digit
    // candidate derived from its id; the checksum decides redaction, so
    // ~1 in 10 docs redact and the rest keep their digits — the
    // false-positive cut a bare digit-run regex can't make. Validity and
    // the redacted text verified value-for-value.
    QEntry.sql(
      "cur_pii_luhn", {
        val luhn =
          """list_sum(list_transform(range(1, 17), i ->
            |  CASE WHEN i % 2 = 0 THEN
            |    (CASE WHEN 2 * CAST(substr(reverse(cand), CAST(i AS INT), 1) AS INT) > 9
            |          THEN 2 * CAST(substr(reverse(cand), CAST(i AS INT), 1) AS INT) - 9
            |          ELSE 2 * CAST(substr(reverse(cand), CAST(i AS INT), 1) AS INT) END)
            |  ELSE CAST(substr(reverse(cand), CAST(i AS INT), 1) AS INT) END)) % 10 = 0"""
            .stripMargin.replaceAll("\\s+", " ")
        s"""WITH c AS (SELECT doc_id,
           |    '4' || lpad(CAST((doc_id * 37) % 1000000000000000 AS VARCHAR), 15, '0')
           |      AS cand
           |  FROM documents),
           |v AS (SELECT doc_id, cand, ($luhn) AS luhn_ok,
           |    'card ' || cand || ' end' AS t FROM c)
           |SELECT doc_id, cand, luhn_ok,
           |  CASE WHEN luhn_ok THEN replace(t, cand, '<CARD>') ELSE t END AS redacted
           |FROM v""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val cand = concat(
        lit("4"),
        lpad(((col("doc_id") * 37) % 1000000000000000L).cast("string"), 15, "0")
      )
      documents(s, d)
        .select(col("doc_id"), cand.as("cand"))
        .select(
          col("doc_id"),
          col("cand"),
          Curation.luhnValid(col("cand")).as("luhn_ok"),
          Curation
            .redactValidCards(concat(lit("card "), col("cand"), lit(" end")))
            .as("redacted")
        )
    },

    // Repetition quality signal (Gopher-style): token totals, distincts,
    // top-token share, duplicate-word ratio.
    QEntry.sql(
      "cur_repetition",
      s"""SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  count(*) AS n_distinct,
         |  round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_token_ratio,
         |  round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 4) AS dup_ratio
         |FROM (
         |  SELECT doc_id, w, count(*) AS c
         |  FROM (SELECT doc_id, unnest($wordsSql) AS w FROM documents) u
         |  WHERE w != '' GROUP BY doc_id, w) t
         |GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => Curation.repetitionStats(documents(s, d), "doc_id", "text") },

    // Token-budget packing within language strata: running token totals in
    // doc_id order → pack assignment (keyed window — parallel across langs).
    QEntry.sql(
      "cur_token_packing",
      s"""SELECT lang, doc_id, n_tokens,
         |  CAST(floor((cum - 1) / 500.0) AS BIGINT) AS pack_id
         |FROM (
         |  SELECT lang, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM (SELECT lang, doc_id, CAST(len($wordsSql) AS BIGINT) AS n_tokens
         |        FROM documents) t) c""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.packByTokenBudget(documents(s, d), Seq("lang"), "doc_id", "text", 500)
    },

    // E353 k-anonymity generalization lattice ([[Curation.kAnonLattice]]):
    // every (source-hierarchy × length-band-hierarchy) node's class census
    // + the least-generalized node achieving k=5 flagged — the "how much
    // must I coarsen?" search behind the cur_kanonymity gate. Hierarchies:
    // source → publisher group (id mod 4) → * ; n_chars÷100 → ÷500 → *.
    QEntry.sql(
      "cur_kanon_lattice", {
        val aL = Seq(
          "source",
          "'g' || CAST(CAST(substr(source, 4) AS INT) % 4 AS VARCHAR)",
          "'*'"
        )
        val bL = Seq(
          "CAST(n_chars // 100 AS VARCHAR)",
          "CAST(n_chars // 500 AS VARCHAR)",
          "'*'"
        )
        val nodes = (for { i <- 0 to 2; j <- 0 to 2 } yield
          s"""SELECT ${i}::BIGINT AS a_level, ${j}::BIGINT AS b_level,
             |  CAST(count(*) AS BIGINT) AS n_classes,
             |  CAST(min(cs) AS BIGINT) AS min_class_size,
             |  CAST(sum(CASE WHEN cs < 5 THEN cs ELSE 0 END) AS BIGINT) AS risky_rows
             |FROM (SELECT ${aL(i)} AS a, ${bL(j)} AS b, count(*) AS cs
             |      FROM documents GROUP BY 1, 2) c$i$j""".stripMargin)
          .mkString(" UNION ALL ")
        s"""WITH grid AS ($nodes),
           |g2 AS (SELECT *, min_class_size >= 5 AS achieves_k,
           |         (a_level + b_level) * 100 + a_level * 10 + b_level AS pick
           |       FROM grid),
           |best AS (SELECT min(pick) AS bp FROM g2 WHERE achieves_k)
           |SELECT a_level, b_level, n_classes, min_class_size, risky_rows,
           |  achieves_k,
           |  (achieves_k AND bp IS NOT NULL AND pick = bp) AS is_choice
           |FROM g2, best""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val docs = documents(s, d)
      Curation.kAnonLattice(
        docs,
        Seq(
          col("source"),
          concat(lit("g"), (substring(col("source"), 4, 10).cast("int") % 4).cast("string")),
          lit("*")
        ),
        Seq(
          expr("CAST(n_chars div 100 AS STRING)"),
          expr("CAST(n_chars div 500 AS STRING)"),
          lit("*")
        ),
        k = 5
      )
    },

    // E352 de-identifying date shift ([[Curation.dateShift]]): one
    // md5-derived offset in [−30, +30] days per user, applied to every
    // event — absolute dates destroyed, within-user intervals preserved
    // EXACTLY (the rollup proves both: spans equal, first-day moved by the
    // offset). Narrow projection + one user-keyed rollup.
    QEntry.sql(
      "cur_date_shift",
      """WITH s AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      (strpos('0123456789abcdef',
        |              substr(md5('ds|' || CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |      * pow(16, 8 - i))) AS BIGINT) % 61 - 30 AS offset_days
        |  FROM events)
        |SELECT user_id, CAST(max(offset_days) AS BIGINT) AS offset_days,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(us) - min(us) AS BIGINT) AS span_us,
        |  CAST(max(us + offset_days * 86400000000) - min(us + offset_days * 86400000000)
        |       AS BIGINT) AS span_us_shifted,
        |  CAST(min(us) // 86400000000 AS BIGINT) AS first_day,
        |  CAST(min(us + offset_days * 86400000000) // 86400000000 AS BIGINT)
        |    AS first_day_shifted
        |FROM s GROUP BY user_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation
        .dateShift(events(s, d), "user_id", "ts", 30)
        .select(
          col("user_id"),
          col("offset_days"),
          unix_micros(col("ts")).as("_us"),
          unix_micros(col("ts_shifted")).as("_uss")
        )
        .groupBy(col("user_id"))
        .agg(
          max(col("offset_days")).cast("long").as("offset_days"),
          count(lit(1)).cast("long").as("n_events"),
          (max(col("_us")) - min(col("_us"))).cast("long").as("span_us"),
          (max(col("_uss")) - min(col("_uss"))).cast("long").as("span_us_shifted"),
          expr("min(_us) div 86400000000L").cast("long").as("first_day"),
          expr("min(_uss) div 86400000000L").cast("long").as("first_day_shifted")
        )
    },

    // E350 corpus card ([[Curation.corpusCard]]): the dataset datasheet —
    // size, mix breadth, duplication, PII exposure, length/quality tails —
    // as a (metric, value) long frame from ONE corpus scan. The twin
    // computes the same one-row aggregate and unpivots via UNION ALL.
    QEntry.sql(
      "cur_corpus_card", {
        val email = Curation.EmailPattern
        s"""WITH a AS (SELECT
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len($wordsSql)) AS BIGINT) AS n_tokens,
           |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
           |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS exact_dup_docs,
           |  CAST(sum(CASE WHEN regexp_matches(text, '$email') THEN 1 ELSE 0 END)
           |       AS BIGINT) AS email_docs,
           |  CAST(sum(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS short_docs,
           |  CAST(sum(CASE WHEN (${TextQueries.qualityExprSql}) >= 0.5 THEN 1 ELSE 0 END)
           |       AS BIGINT) AS quality_hi_docs
           |FROM documents)
           |SELECT 'n_docs' AS metric, n_docs AS value FROM a
           |UNION ALL SELECT 'n_tokens', n_tokens FROM a
           |UNION ALL SELECT 'n_chars', n_chars FROM a
           |UNION ALL SELECT 'n_sources', n_sources FROM a
           |UNION ALL SELECT 'n_langs', n_langs FROM a
           |UNION ALL SELECT 'exact_dup_docs', exact_dup_docs FROM a
           |UNION ALL SELECT 'email_docs', email_docs FROM a
           |UNION ALL SELECT 'short_docs', short_docs FROM a
           |UNION ALL SELECT 'quality_hi_docs', quality_hi_docs FROM a"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.corpusCard(documents(s, d), "text", "source", "lang")
    },

    // E349 labeler agreement ([[QualityChecks.cohensKappa]]): Cohen's κ
    // between the heuristic quality gate (score ≥ 0.5) and the cheap length
    // gate (n_chars ≥ 300) — raw agreement p_o flatters any skewed-base-rate
    // pair; κ subtracts chance agreement from the marginals. One partial
    // aggregate; all exact integer ppm.
    QEntry.sql(
      "cur_labeler_kappa",
      s"""WITH l AS (SELECT (${TextQueries.qualityExprSql}) >= 0.5 AS a,
         |                  n_chars >= 300 AS b FROM documents),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |  CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         |  CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |  CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01
         |  FROM l),
         |p AS (SELECT *, CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
         |  CAST(((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
         |       * 1000000 // (n * n) AS BIGINT) AS pe_ppm FROM c)
         |SELECT n, n11, n00, n10, n01, po_ppm, pe_ppm,
         |  CAST(CASE WHEN pe_ppm = 1000000 THEN 0
         |       ELSE (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) END AS BIGINT)
         |    AS kappa_ppm
         |FROM p""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val labeled = documents(s, d).select(
        (graft.functions.TextAnalysis.qualityScore(col("text")) >= 0.5).as("a"),
        (col("n_chars") >= 300).as("b")
      )
      graft.operators.QualityChecks.cohensKappa(labeled, "a", "b")
    },

    // E346 stride-scheduled mixture interleave ([[Curation.strideInterleave]]):
    // virtual time = rank-within-source·10⁶ div source-size, so the vt-ordered
    // stream carries the blend's mix at EVERY prefix (stride scheduling
    // applied to data ordering). Entry = the stream's first 200 docs via
    // TakeOrdered — top-k, never a global sort.
    QEntry.sql(
      "cur_stride_interleave",
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, doc_id, CAST(rk AS BIGINT) AS src_rank,
        |  CAST(rk * 1000000 // n AS BIGINT) AS vt_ppm
        |FROM r ORDER BY vt_ppm, source, doc_id LIMIT 200"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation
        .strideInterleave(documents(s, d).select(col("doc_id"), col("source")), "source", "doc_id")
        .select(col("source"), col("doc_id"), col("src_rank"), col("vt_ppm"))
        .orderBy(col("vt_ppm"), col("source"), col("doc_id"))
        .limit(200)
    },

    // E347 data-constrained epoch schedule ([[Curation.epochSchedule]]):
    // equal per-source token targets summing to 3× the corpus (a
    // repetition-forcing mix), epoch cap 4 — per source the exact epochs,
    // served tokens, unfilled deficit, and repeat factor. Sources-sized
    // arithmetic on one broadcast join; only the avail aggregate touches
    // data.
    QEntry.sql(
      "cur_epoch_schedule",
      s"""WITH t AS (SELECT source, CAST(len($wordsSql) AS BIGINT) AS n FROM documents),
         |a AS (SELECT source, CAST(sum(n) AS BIGINT) AS avail FROM t GROUP BY source),
         |g AS (SELECT CAST(sum(avail) AS BIGINT) AS tt,
         |             CAST(count(*) AS BIGINT) AS ns FROM a),
         |tg AS (SELECT a.source, a.avail, CAST(3 * g.tt // g.ns AS BIGINT) AS target
         |       FROM a, g)
         |SELECT source, avail AS avail_tokens, target AS target_tokens,
         |  CAST(CASE WHEN avail = 0 THEN 0
         |       ELSE least((target + avail - 1) // avail, 4) END AS BIGINT) AS epochs,
         |  CAST(least(target, CASE WHEN avail = 0 THEN 0
         |       ELSE least((target + avail - 1) // avail, 4) END * avail) AS BIGINT)
         |    AS served_tokens,
         |  CAST(target - least(target, CASE WHEN avail = 0 THEN 0
         |       ELSE least((target + avail - 1) // avail, 4) END * avail) AS BIGINT)
         |    AS deficit_tokens,
         |  CAST(CASE WHEN avail = 0 THEN 0
         |       ELSE least(target, CASE WHEN avail = 0 THEN 0
         |            ELSE least((target + avail - 1) // avail, 4) END * avail)
         |            * 1000000 // avail END AS BIGINT) AS repeat_ppm
         |FROM tg""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val avail = documents(s, d)
        .select(
          col("source"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("bigint").as("_n")
        )
        .groupBy(col("source"))
        .agg(sum(col("_n")).cast("long").as("avail_tokens"))
      val totals = avail.agg(
        sum(col("avail_tokens")).cast("long").as("_tt"),
        count(lit(1)).cast("long").as("_ns")
      )
      val targets = avail
        .select(col("source"))
        .crossJoin(broadcast(totals))
        .select(col("source"), expr("3L * _tt div _ns").cast("long").as("target_tokens"))
      Curation.epochSchedule(avail, targets, "source", 4)
    },

    // E345 token-budget mixture trim ([[Curation.tokenBudgetTrim]]): each
    // source keeps its md5-ordered doc prefix until a 500-token budget
    // fills — the token-denominated sampling a training mix actually
    // specifies ("N tokens of web", never "N documents"). Rollup: per
    // source, docs/tokens kept and exact fill ppm; never over budget.
    QEntry.sql(
      "cur_token_budget",
      s"""WITH t AS (SELECT doc_id, source, CAST(len($wordsSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |c AS (SELECT source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM t)
         |SELECT source, CAST(500 AS BIGINT) AS budget,
         |  CAST(sum(CASE WHEN cum <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN cum <= 500 THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tokens_kept,
         |  CAST(sum(CASE WHEN cum <= 500 THEN n_tokens ELSE 0 END) * 1000000 // 500
         |    AS BIGINT) AS fill_ppm
         |FROM c GROUP BY source""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val toks = documents(s, d).select(
        col("doc_id"),
        col("source"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")
      )
      val budgets = toks.select(col("source")).distinct().withColumn("budget", lit(500L))
      Curation
        .tokenBudgetTrim(toks, "source", "doc_id", "n_tokens", budgets)
        .groupBy(col("source"))
        .agg(
          max(col("budget")).as("budget"),
          sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L))
            .cast("long")
            .as("tokens_kept")
        )
        .withColumn("fill_ppm", expr("tokens_kept * 1000000L div budget").cast("long"))
    },

    // E343 per-source quantile normalization ([[Curation.quantileNormalize]]):
    // raw heuristic quality remapped to its exact rank-ppm WITHIN its source,
    // so one global "keep top X%" threshold cuts every source at the same
    // quantile no matter how each scorer is scaled. One source-keyed window;
    // rank ties broken by doc_id, norm exact integer ppm.
    QEntry.sql(
      "cur_quantile_norm",
      s"""SELECT doc_id, source, quality,
         |  CAST(CASE WHEN n = 1 THEN 0
         |            ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT) AS norm_ppm
         |FROM (SELECT doc_id, source, quality,
         |        row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
         |        count(*) OVER (PARTITION BY source) AS n
         |      FROM (SELECT doc_id, source, ${TextQueries.qualityExprSql} AS quality
         |            FROM documents) q) t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val scored = documents(s, d).select(
        col("doc_id"),
        col("source"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("quality")
      )
      Curation.quantileNormalize(scored, "quality", "source", "doc_id")
    },

    // E342 length-bucketed padding-waste report ([[Curation.paddingWasteReport]]):
    // pad-to-next-64 bucketing vs pad-to-corpus-max, the batching-efficiency
    // read that decides a training run's bucket config. One bucket-keyed
    // partial agg; the unbucketed baseline rides every row as a broadcast
    // scalar. All exact BIGINT, ppm by integer division.
    QEntry.sql(
      "cur_padding_waste",
      s"""WITH t AS (SELECT CAST(len($wordsSql) AS BIGINT) AS n_tokens FROM documents),
         |b AS (SELECT ((n_tokens + 63) // 64) * 64 AS bucket,
         |        CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |      FROM t GROUP BY 1),
         |g AS (SELECT max(bucket) AS mb, sum(n_docs) AS n, sum(sum_tokens) AS s FROM b)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, sum_tokens,
         |  CAST(bucket * n_docs - sum_tokens AS BIGINT) AS pad_tokens,
         |  CAST((bucket * n_docs - sum_tokens) * 1000000 // (bucket * n_docs) AS BIGINT)
         |    AS waste_ppm,
         |  CAST((g.mb * g.n - g.s) * 1000000 // (g.mb * g.n) AS BIGINT) AS global_pad_ppm
         |FROM b, g""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")
        )
      Curation.paddingWasteReport(toks, "n_tokens", 64)
    },

    // E376 CCNet-style perplexity buckets ([[graft.operators.TermStats
    // .bigramCrossEntropy]] + value-cutoff tertiles): every scored doc is
    // binned head / middle / tail by the corpus's OWN bigram cross-entropy
    // tertiles — the Wenzek et al. 2020 disposition a production pipeline
    // applies before mixing (head = fluent, tail = noisy, middle = the
    // usual keep-with-caution band); docs too short to score (< 2 tokens)
    // surface as 'unscored', never silently dropped. Cutoffs are the k-th
    // smallest SCORE VALUES (k = n/3, 2n/3), fetched as two scalar probes
    // via TakeOrdered — ties straddling a boundary go by value on both
    // engines, and no global window enters the Spark plan. Per (source,
    // bucket) counts: the mixture-shift audit for the filter.
    QEntry.sql(
      "cur_ppl_buckets",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
         |tk AS (SELECT doc_id, t.term FROM
         |  (SELECT doc_id, unnest(words) AS term FROM w) t WHERE t.term <> ''),
         |uni AS (SELECT term, count(*) AS cu FROM tk GROUP BY term),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
         |  FROM uni),
         |bgs AS (SELECT doc_id, unnest(list_transform(range(2, len(words) + 1),
         |    i -> struct_pack(prev := words[i-1], cur := words[i]))) AS bp
         |  FROM w WHERE len(words) >= 2),
         |bstream AS (SELECT doc_id, bp.prev AS prev, bp.cur AS cur FROM bgs),
         |bg AS (SELECT prev, cur, count(*) AS c2 FROM bstream GROUP BY prev, cur),
         |ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY prev),
         |ratio AS (SELECT bg.prev, bg.cur,
         |    CAST(round(-log2(0.75 * (CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
         |      + 0.25 * (CAST(cu + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))), 9)
         |      AS DECIMAL(18,9)) AS bits
         |  FROM bg JOIN ctx ON bg.prev = ctx.prev
         |  JOIN uni ON bg.cur = uni.term CROSS JOIN tot),
         |ent AS (SELECT s.doc_id,
         |    round(CAST(CAST(sum(bits) AS DECIMAL(28,9)) AS DOUBLE) / count(*), 6) AS e
         |  FROM bstream s JOIN ratio ON s.prev = ratio.prev AND s.cur = ratio.cur
         |  GROUP BY s.doc_id),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ent),
         |rk AS (SELECT e, row_number() OVER (ORDER BY e) AS rn FROM ent),
         |c1 AS (SELECT max(e) AS c FROM rk CROSS JOIN n WHERE rn <= n // 3),
         |c2 AS (SELECT max(e) AS c FROM rk CROSS JOIN n WHERE rn <= 2 * n // 3)
         |SELECT d.source,
         |  CASE WHEN ent.e IS NULL THEN 'unscored'
         |       WHEN ent.e <= c1.c THEN 'head'
         |       WHEN ent.e <= c2.c THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
         |CROSS JOIN c1 CROSS JOIN c2
         |GROUP BY 1, 2""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      val ent = graft.operators.TermStats
        .bigramCrossEntropy(docs, "doc_id", "text", 0.75)
        .select(col("doc_id"), col("bigram_entropy").as("e"))
        .localCheckpoint() // counted + two cutoff probes + the disposition join
      val n = ent.count()
      // two scalar cutoff probes (metadata-sized, like the q_kth_element
      // family): kth smallest VALUE via TakeOrdered-k + max
      def kth(k: Long): Double =
        ent.orderBy("e").limit(k.toInt).agg(max("e")).head().getDouble(0)
      val cut1 = kth(n / 3)
      val cut2 = kth(2 * n / 3)
      docs
        .select(col("doc_id"), col("source"))
        .join(ent, Seq("doc_id"), "left")
        .select(
          col("source"),
          when(col("e").isNull, "unscored")
            .when(col("e") <= cut1, "head")
            .when(col("e") <= cut2, "middle")
            .otherwise("tail")
            .as("bucket")
        )
        .groupBy("source", "bucket")
        .agg(count(lit(1)).cast("long").as("n_docs"))
    },

    // Quality-quantile band filter: keep the [20%, 80%] quality band per
    // language (drop the worst and the suspicious best). percent_rank is the
    // exact rational (rank-1)/(n-1) — engine-deterministic, no rounding.
    QEntry.sql(
      "cur_quality_bands",
      s"""SELECT doc_id, lang, quality, pct FROM (
         |  SELECT doc_id, lang, quality,
         |    percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS pct
         |  FROM (SELECT doc_id, lang, ${TextQueries.qualityExprSql} AS quality
         |        FROM documents) q) t
         |WHERE pct >= 0.2 AND pct <= 0.8""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.qualityBand(documents(s, d), "doc_id", "text", "lang", 0.2, 0.8)
    },

    // Sliding-window token chunking with overlap (chunk 64, stride 48 →
    // 16-token overlap): the RAG/long-doc context-prep op. Start count is
    // exact integer arithmetic; both engines slice the same token array.
    QEntry.sql(
      "cur_chunk_overlap",
      s"""SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |  CAST(k * 48 AS BIGINT) AS start_tok,
         |  CAST(least(len(ws) - k * 48, 64) AS BIGINT) AS n_tok,
         |  array_to_string(list_slice(ws, CAST(k * 48 + 1 AS INT),
         |                             CAST(k * 48 + 64 AS INT)), ' ') AS chunk_text
         |FROM (
         |  SELECT doc_id, ws,
         |    unnest(range(0, CASE WHEN len(ws) <= 64 THEN 1
         |      ELSE CAST(floor((len(ws) - 64 + 47) / 48.0) AS INT) + 1 END)) AS k
         |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents) w) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.chunkWithOverlap(documents(s, d), "doc_id", "text", 64, 48)
    },

    // Deterministic source-weighted mixture ("data mixing"): per-source keep
    // fractions by md5 hash position of the doc id — reproducible across
    // engines/runs/partitionings, and nested under weight increases. Narrow
    // filter, no shuffle.
    QEntry.sql(
      "cur_mixture_sample", {
        val hashpos =
          """CAST(list_sum(list_transform(range(1, 9), i ->
            |  (strpos('0123456789abcdef',
            |          substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1)
            |  * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0""".stripMargin
        s"""SELECT doc_id, source FROM documents
           |WHERE $hashpos < CASE WHEN source = 'src0' THEN 1.0
           |                      WHEN source = 'src1' THEN 0.75
           |                      WHEN source = 'src2' THEN 0.5
           |                      WHEN source = 'src3' THEN 0.25
           |                      ELSE 0.1 END""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation
        .mixtureSample(
          documents(s, d),
          "doc_id",
          "source",
          Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
          defaultWeight = 0.1
        )
        .select("doc_id", "source")
    },

    // C4-style cleaning-rule rollup: per (lang, source), how many docs each
    // heuristic rule rejects and how many survive all of them. Rules are
    // integer-count arithmetic (cross-multiplied mean-word-length band — no
    // float division), so both engines flag identical docs.
    QEntry.sql(
      "cur_c4_filters", {
        val words = s"len($wordsSql)"
        val letters = """length(regexp_replace(text, '\s', '', 'g'))"""
        s"""SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN $words < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           |  CAST(sum(CASE WHEN NOT ($letters >= $words * 3 AND $letters <= $words * 5)
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_wordlen_out,
           |  CAST(sum(CASE WHEN strpos(' ' || text || ' ', ' the ') = 0
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_no_stop,
           |  CAST(sum(CASE WHEN $words >= 20
           |                 AND ($letters >= $words * 3 AND $letters <= $words * 5)
           |                 AND strpos(' ' || text || ' ', ' the ') > 0
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM documents GROUP BY lang, source"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation
        .c4Rules(documents(s, d), "text")
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("too_short"), 1).otherwise(0)).as("n_short"),
          sum(when(col("wordlen_out"), 1).otherwise(0)).as("n_wordlen_out"),
          sum(when(col("no_stopword"), 1).otherwise(0)).as("n_no_stop"),
          sum(when(col("kept"), 1).otherwise(0)).as("n_kept")
        )
    },

    // Deterministic MLM masking: token (doc, p) masked iff the md5 hash
    // position of "id:p" < 15% — identical mask across engines/runs; the
    // twin replays the hash position digit-by-digit per token.
    QEntry.sql(
      "cur_mlm_mask", {
        val hashpos =
          """CAST(list_sum(list_transform(range(1, 9), i ->
            |  (strpos('0123456789abcdef',
            |          substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(m.p AS VARCHAR)),
            |                 CAST(i AS INT), 1)) - 1)
            |  * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0""".stripMargin
        s"""WITH toks AS (SELECT doc_id,
           |    unnest(list_transform(range(1, len(words) + 1), i -> i)) AS p
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
           |        FROM documents) w),
           |m AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
           |    ($hashpos) < 0.15 AS masked
           |  FROM toks m)
           |SELECT doc_id, count(*) AS n_tokens,
           |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           |  COALESCE(array_to_string(list_sort(list(p) FILTER (WHERE masked)), ','), '')
           |    AS masked_positions
           |FROM m GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.mlmMask(documents(s, d), "doc_id", "text", 0.15)
    },

    // T5 span corruption: a span starts at (doc, p) iff the md5 hash
    // position of "id:p" < rate/spanLen (0.15/3); coverage is a trailing
    // 2-PRECEDING window, adjacent spans merge, each merged span becomes one
    // <extra_id_K> sentinel. The twin replays the hash digit-by-digit and
    // the identical window algebra. Threshold interpolated from the SAME
    // Scala double division so both engines compare against the same bits.
    QEntry.sql(
      "cur_span_corrupt", {
        val hashpos =
          """CAST(list_sum(list_transform(range(1, 9), i ->
            |  (strpos('0123456789abcdef',
            |          substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)),
            |                 CAST(i AS INT), 1)) - 1)
            |  * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0""".stripMargin
        s"""WITH toks AS (SELECT doc_id,
           |    unnest(list_transform(range(1, len(words) + 1),
           |      i -> struct_pack(p := i, term := words[i]))) AS tp
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
           |        FROM documents) w),
           |t AS (SELECT doc_id, CAST(tp.p AS BIGINT) AS p, tp.term AS term FROM toks),
           |s AS (SELECT doc_id, p, term, ($hashpos) < ${0.15 / 3} AS st FROM t),
           |c AS (SELECT doc_id, p, term, st,
           |    max(CASE WHEN st THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
           |      ORDER BY p ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS cov
           |  FROM s),
           |f AS (SELECT doc_id, p, term, cov,
           |    cov AND NOT COALESCE(lag(cov) OVER (PARTITION BY doc_id ORDER BY p),
           |                         FALSE) AS opn
           |  FROM c),
           |g AS (SELECT doc_id, p, term, cov, opn,
           |    sum(CASE WHEN opn THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY p) AS k
           |  FROM f)
           |SELECT doc_id, count(*) AS n_tokens,
           |  CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
           |  CAST(sum(CASE WHEN opn THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
           |  COALESCE(array_to_string(list_sort(list(p) FILTER (WHERE cov)), ','), '')
           |    AS corrupted_positions,
           |  COALESCE(string_agg(CASE WHEN NOT cov THEN term
           |      WHEN opn THEN '<extra_id_' || CAST(k - 1 AS VARCHAR) || '>' END,
           |      ' ' ORDER BY p), '') AS corrupted_text
           |FROM g GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.spanCorrupt(documents(s, d), "doc_id", "text", 0.15, 3)
    },

    // DSIR importance weights: target slice = lang 'en'. The twin replays
    // the md5 bucket hash digit-by-digit, the add-one-smoothed log-ratios
    // (quantized to 9 decimals → DECIMAL, so per-doc sums are summation-
    // order-independent) and the final round(6).
    QEntry.sql(
      "cur_dsir_weight",
      s"""WITH toks AS (SELECT doc_id, (lang = 'en') AS tgt, unnest($wordsSql) AS t
         |  FROM documents),
         |tk AS (SELECT doc_id, tgt, t,
         |    CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS BIGINT) % 1024 AS b
         |  FROM toks WHERE t <> ''),
         |stats AS (SELECT b,
         |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    count(*) AS cr
         |  FROM tk GROUP BY b),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
         |    CAST(sum(cr) AS BIGINT) AS nr FROM stats),
         |ratio AS (SELECT b,
         |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))
         |             - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)), 9)
         |      AS DECIMAL(18,9)) AS lr
         |  FROM stats CROSS JOIN tot)
         |SELECT tk.doc_id, count(*) AS n_tokens,
         |  round(CAST(CAST(sum(lr) AS DECIMAL(28,9)) AS DOUBLE), 6) AS dsir_weight
         |FROM tk JOIN ratio ON tk.b = ratio.b
         |GROUP BY tk.doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.dsirWeights(documents(s, d), "doc_id", "text", col("lang") === "en", 1024)
    },

    // fastText-style linear quality-classifier inference: the model is a
    // 256-row broadcast weight table (here fabricated deterministically from
    // md5 so the twin can regenerate it value-for-value); logit = mean slot
    // weight over hashed tokens via the exact-DECIMAL ladder, label = sign.
    // Verifies the score AND the keep/drop cut bit-for-bit.
    QEntry.sql(
      "cur_quality_classifier",
      s"""WITH wt AS (SELECT b AS bucket,
         |    CAST(round(CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef',
         |              substr(md5('qw|' || CAST(b AS VARCHAR)), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0 * 2 - 1, 9)
         |      AS DECIMAL(18,9)) AS w
         |  FROM (SELECT unnest(range(0, 256)) AS b) t),
         |tk AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS BIGINT) % 256 AS b
         |  FROM (SELECT doc_id, unnest($wordsSql) AS t FROM documents) x WHERE t <> ''),
         |agg AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    round(CAST(CAST(sum(wt.w) AS DECIMAL(28,9)) AS DOUBLE) / count(*), 6) AS logit
         |  FROM tk JOIN wt ON tk.b = wt.bucket GROUP BY tk.doc_id)
         |SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens,
         |  COALESCE(agg.logit, 0.0) AS logit,
         |  CASE WHEN COALESCE(agg.logit, 0.0) >= 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM documents d LEFT JOIN agg USING (doc_id)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val wtab = s.range(256).select(
        col("id").as("bucket"),
        round(
          conv(substring(md5(concat(lit("qw|"), col("id").cast("string"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0) * 2 - 1,
          9
        ).cast("decimal(18,9)").as("weight")
      )
      Curation.linearQualityScore(documents(s, d), "doc_id", "text", wtab, 256)
    },

    // E412 classifier TRAINING ([[Curation.trainLinearQuality]]): 3 steps of
    // full-batch logistic-regression GD over the 256-bucket hashed
    // bag-of-words, labeled by the independent length heuristic (n_chars ≥
    // 1000) — the seed-classifier bootstrap a curation pipeline runs before
    // E229 inference and E325 calibration. Determinism is structural:
    // exact-DECIMAL per-doc logits (one division, round₆), ppm-quantized
    // sigmoid (floor — boundary-safe), per-doc residuals scaled by 1/n_d
    // (q_d = floor(1000·r_d/n_d) — the mean-feature gradient, so long docs
    // pull exactly as hard as their logit scaling says), INTEGER gradient
    // sums (summation-order-independent across 1000 executors), round₉
    // weight updates. The twin unrolls the three steps CTE-for-CTE and
    // hash-matches the final weight table — a trainer that mis-joined a
    // residual, dropped an empty bucket, or let a float accumulate
    // diverges.
    QEntry.sql(
      "cur_classifier_train", {
        val bHash = "CAST(list_sum(list_transform(range(1, 9), i -> " +
          "(strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1) " +
          "* pow(16, 8 - i))) AS BIGINT) % 256"
        val steps = (1 to 3).map { k =>
          s""",
             |z$k AS (SELECT tk.doc_id, tk.y, count(*) AS n,
             |    round(CAST(CAST(sum(w${k - 1}.w) AS DECIMAL(28,9)) AS DOUBLE)
             |      / count(*), 6) AS z
             |  FROM tk JOIN w${k - 1} ON tk.b = w${k - 1}.bucket
             |  GROUP BY tk.doc_id, tk.y),
             |r$k AS (SELECT doc_id, CAST(floor(
             |    CAST(CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT)
             |      - (CASE WHEN y THEN 1000000 ELSE 0 END) AS DOUBLE)
             |    * 1000.0 / n) AS BIGINT) AS r FROM z$k),
             |g$k AS (SELECT tk.b AS bucket, CAST(sum(r$k.r) AS BIGINT) AS g
             |  FROM tk JOIN r$k USING (doc_id) GROUP BY tk.b),
             |w$k AS (SELECT w${k - 1}.bucket,
             |    CAST(round(CAST(w${k - 1}.w AS DOUBLE)
             |      - CAST(COALESCE(g$k.g, 0) AS DOUBLE) / (nd.n_docs * 250000000.0), 9)
             |      AS DECIMAL(18,9)) AS w
             |  FROM w${k - 1} LEFT JOIN g$k USING (bucket) CROSS JOIN nd)"""
        }.mkString
        s"""WITH tk AS (SELECT doc_id, (n_chars >= 1000) AS y, $bHash AS b
           |  FROM (SELECT doc_id, n_chars, unnest($wordsSql) AS t FROM documents) x
           |  WHERE t <> ''),
           |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tk),
           |w0 AS (SELECT b AS bucket, CAST(0 AS DECIMAL(18,9)) AS w
           |  FROM (SELECT unnest(range(0, 256)) AS b) t)$steps
           |SELECT bucket, CAST(w AS DOUBLE) AS weight FROM w3"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.trainLinearQuality(
        documents(s, d), "doc_id", "text",
        label = col("n_chars") >= 1000,
        buckets = 256, steps = 3, lr = 4.0)
    },

    // E325 classifier calibration ([[Curation.calibrationReport]]): the
    // E229 classifier's logit maps to a ppm confidence (floor((logit+1)·
    // 5e5) clamped to [0, 1e6] — floor, not round: floor of a double is
    // boundary-safe cross-engine where round is not), labeled against the
    // independent length signal (n_chars ≥ 1000); reliability bins, gaps
    // and the ECE are all exact integer ppm.
    QEntry.sql(
      "cur_classifier_ece",
      s"""WITH wt AS (SELECT b AS bucket,
         |    CAST(round(CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef',
         |              substr(md5('qw|' || CAST(b AS VARCHAR)), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0 * 2 - 1, 9)
         |      AS DECIMAL(18,9)) AS w
         |  FROM (SELECT unnest(range(0, 256)) AS b) t),
         |tk AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS BIGINT) % 256 AS b
         |  FROM (SELECT doc_id, unnest($wordsSql) AS t FROM documents) x WHERE t <> ''),
         |agg AS (SELECT tk.doc_id, round(CAST(CAST(sum(wt.w) AS DECIMAL(28,9))
         |      AS DOUBLE) / count(*), 6) AS logit
         |  FROM tk JOIN wt ON tk.b = wt.bucket GROUP BY tk.doc_id),
         |sc AS (SELECT d.doc_id,
         |    greatest(least(CAST(floor((COALESCE(agg.logit, 0.0) + 1.0) * 500000)
         |      AS BIGINT), 1000000), 0) AS s_ppm,
         |    d.n_chars >= 1000 AS y
         |  FROM documents d LEFT JOIN agg USING (doc_id)),
         |bi AS (SELECT least(s_ppm * 10 // 1000000, 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(s_ppm) AS BIGINT) // count(*) AS conf_ppm,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*)
         |      AS acc_ppm
         |  FROM sc GROUP BY bin),
         |ec AS (SELECT CAST(sum(n_docs * abs(acc_ppm - conf_ppm)) // sum(n_docs)
         |    AS BIGINT) AS ece_ppm FROM bi)
         |SELECT bin, n_docs, conf_ppm, acc_ppm,
         |  abs(acc_ppm - conf_ppm) AS gap_ppm, ece_ppm
         |FROM bi CROSS JOIN ec""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val wtab = s.range(256).select(
        col("id").as("bucket"),
        round(
          conv(substring(md5(concat(lit("qw|"), col("id").cast("string"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0) * 2 - 1,
          9
        ).cast("decimal(18,9)").as("weight")
      )
      val scored = Curation
        .linearQualityScore(documents(s, d), "doc_id", "text", wtab, 256)
        .join(documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
        .select(
          greatest(
            least(floor((col("logit") + 1.0) * 500000).cast("long"), lit(1000000L)),
            lit(0L)
          ).as("s_ppm"),
          (col("n_chars") >= 1000).as("y")
        )
      Curation.calibrationReport(scored, "s_ppm", "y", bins = 10)
    },

    // E339 precision/recall threshold sweep ([[Curation.prCurve]]) for the
    // same hashed-feature classifier, labeled n_chars ≥ 300 (a balanced
    // label at every sf — the ≥ 1000 calibration label is all-negative
    // here, fine for ECE, degenerate for PR): one descending cumulative
    // window over the 10-bin table yields TP/FP at every threshold from a
    // single data pass; P/R/F1 exact integer ppm with 0-denominator → 0.
    QEntry.sql(
      "cur_pr_curve",
      s"""WITH wt AS (SELECT b AS bucket,
         |    CAST(round(CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef',
         |              substr(md5('qw|' || CAST(b AS VARCHAR)), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0 * 2 - 1, 9)
         |      AS DECIMAL(18,9)) AS w
         |  FROM (SELECT unnest(range(0, 256)) AS b) t),
         |tk AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 9), i ->
         |      (strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1)
         |      * pow(16, 8 - i))) AS BIGINT) % 256 AS b
         |  FROM (SELECT doc_id, unnest($wordsSql) AS t FROM documents) x WHERE t <> ''),
         |agg AS (SELECT tk.doc_id, round(CAST(CAST(sum(wt.w) AS DECIMAL(28,9))
         |      AS DOUBLE) / count(*), 6) AS logit
         |  FROM tk JOIN wt ON tk.b = wt.bucket GROUP BY tk.doc_id),
         |sc AS (SELECT d.doc_id,
         |    greatest(least(CAST(floor((COALESCE(agg.logit, 0.0) + 1.0) * 500000)
         |      AS BIGINT), 1000000), 0) AS s_ppm,
         |    d.n_chars >= 300 AS y
         |  FROM documents d LEFT JOIN agg USING (doc_id)),
         |bi AS (SELECT least(s_ppm * 10 // 1000000, 9) AS bin,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
         |  FROM sc GROUP BY bin),
         |g AS (SELECT t.b AS bin, COALESCE(bi.np, 0) AS np, COALESCE(bi.nn, 0) AS nn
         |  FROM (SELECT unnest(range(0, 10)) AS b) t LEFT JOIN bi ON t.b = bi.bin),
         |cm AS (SELECT bin,
         |    CAST(sum(np) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS tp,
         |    CAST(sum(nn) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS fp,
         |    CAST((SELECT sum(np) FROM g) AS BIGINT) AS post
         |  FROM g),
         |f AS (SELECT CAST(bin * 100000 AS BIGINT) AS threshold_ppm, tp, fp,
         |    post - tp AS fn,
         |    CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp) END
         |      AS precision_ppm,
         |    CASE WHEN post = 0 THEN 0 ELSE tp * 1000000 // post END AS recall_ppm
         |  FROM cm)
         |SELECT threshold_ppm, tp, fp, fn, precision_ppm, recall_ppm,
         |  CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |    ELSE 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm) END
         |    AS BIGINT) AS f1_ppm
         |FROM f""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val wtab = s.range(256).select(
        col("id").as("bucket"),
        round(
          conv(substring(md5(concat(lit("qw|"), col("id").cast("string"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0) * 2 - 1,
          9
        ).cast("decimal(18,9)").as("weight")
      )
      val scored = Curation
        .linearQualityScore(documents(s, d), "doc_id", "text", wtab, 256)
        .join(documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
        .select(
          greatest(
            least(floor((col("logit") + 1.0) * 500000).cast("long"), lit(1000000L)),
            lit(0L)
          ).as("s_ppm"),
          (col("n_chars") >= 300).as("y")
        )
      Curation.prCurve(scored, "s_ppm", "y", bins = 10)
    },

    // Mixture concentration (Herfindahl–Hirschman index) of the source
    // mix: HHI = Σ shareᵢ² in exact ppm — the single number a curation
    // run monitors to catch one source swamping the blend (1/HHI = the
    // effective source count). The >int64 product at corpus scale routes
    // through HUGEINT/DECIMAL(38,0) like q_gini_concentration; one
    // source-keyed partial agg, then a 20-row reduction.
    QEntry.sql(
      "cur_mixture_hhi",
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(CAST(n AS HUGEINT) * n) * 1000000
        |    // (CAST(max(t.nn) AS HUGEINT) * max(t.nn)) AS BIGINT) AS hhi_ppm
        |FROM c CROSS JOIN t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val c = documents(s, d).groupBy("source").agg(count(lit(1)).as("n"))
      val t = c.agg(sum("n").cast("long").as("nn"))
      c.crossJoin(broadcast(t))
        .agg(
          count(lit(1)).as("n_sources"),
          expr(
            "CAST(CAST(sum(n * n) AS DECIMAL(38,0)) * 1000000" +
              " div (CAST(max(nn) AS DECIMAL(38,0)) * max(nn)) AS BIGINT)"
          ).as("hhi_ppm")
        )
    },

    // Boilerplate detection, CCNet-style: sentences whose EXACT content
    // recurs across ≥ 3 documents of a source (nav bars, footers,
    // templates) — the cross-document line-frequency pass that runs
    // before intra-doc repetition scoring (cur_repetition is Gopher's
    // WITHIN-doc signal; this is the corpus-level one). Sentences are
    // the shared [.!?]+ split; only 32-char digests shuffle for the
    // document-frequency count; instance counts and the contamination
    // share are exact BIGINT/ppm.
    QEntry.sql(
      "cur_boilerplate",
      """WITH sen AS (SELECT d.doc_id, d.source, trim(t.sn) AS sn
        |  FROM documents d, unnest(string_split_regex(d.text, '[.!?]+')) AS t(sn)
        |  WHERE trim(t.sn) <> ''),
        |h AS (SELECT doc_id, source, md5(sn) AS hh FROM sen),
        |df AS (SELECT source, hh, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs,
        |    CAST(count(*) AS BIGINT) AS inst FROM h GROUP BY source, hh)
        |SELECT source, CAST(sum(inst) AS BIGINT) AS n_sentences,
        |  CAST(sum(CASE WHEN docs >= 3 THEN inst ELSE 0 END) AS BIGINT)
        |    AS n_boilerplate,
        |  CAST(sum(CASE WHEN docs >= 3 THEN inst ELSE 0 END) * 1000000
        |    // sum(inst) AS BIGINT) AS boiler_share_ppm
        |FROM df GROUP BY source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val sen = documents(s, d)
        .select(col("doc_id"), col("source"), explode(split(col("text"), "[.!?]+")).as("sn"))
        .select(col("doc_id"), col("source"), trim(col("sn")).as("sn"))
        .filter(col("sn") =!= "")
      val df = sen
        .select(col("doc_id"), col("source"), md5(col("sn")).as("hh"))
        .groupBy("source", "hh")
        .agg(countDistinct("doc_id").as("docs"), count(lit(1)).as("inst"))
      df.groupBy("source")
        .agg(
          sum("inst").cast("long").as("n_sentences"),
          sum(when(col("docs") >= 3, col("inst")).otherwise(0L)).cast("long").as("n_boilerplate"),
          expr(
            "CAST(sum(CASE WHEN docs >= 3 THEN inst ELSE 0 END) * 1000000 div sum(inst)" +
              " AS BIGINT)"
          ).as("boiler_share_ppm")
        )
    },

    // Code-vs-prose screen ([[Curation.codeScreen]]) rolled up per source:
    // symbol density ({}[]();=<> chars as ppm of characters) thresholded at
    // 2% — the router curation pipelines use to keep source code out of (or
    // in) a text corpus. Exact integer arithmetic; narrow per-doc exprs +
    // one partial agg.
    QEntry.sql(
      "cur_code_detect",
      """WITH s AS (SELECT source, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[{}\[\]();=<>]', '', 'g')) AS sym
        |  FROM documents),
        |p AS (SELECT source,
        |    CASE WHEN n = 0 THEN 0 ELSE sym * 1000000 // n END AS ppm FROM s)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(CASE WHEN ppm >= 20000 THEN 1 ELSE 0 END) AS BIGINT) AS code_docs,
        |  CAST(sum(ppm) // count(*) AS BIGINT) AS mean_symbol_ppm
        |FROM p GROUP BY source""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation
        .codeScreen(documents(s, d), "text")
        .groupBy("source")
        .agg(
          count(lit(1)).as("docs"),
          sum(when(col("is_code"), 1L).otherwise(0L)).cast("long").as("code_docs"),
          expr("sum(symbol_ppm) div count(*)").cast("long").as("mean_symbol_ppm")
        )
    },

    // Span-novelty attribution ([[graft.operators.Dedup.spanNovelty]]): a
    // doc's distinct 8-token spans are novel when this doc is the span's
    // corpus-wide first appearance (min doc id owns it) — the provenance
    // view a dedup postmortem reads alongside dedup_exact_substring's
    // duplication share. Digest-keyed aggs and one equi-join; sentinel −1
    // for docs under 8 tokens, reinstated in the twin by the documents
    // LEFT JOIN.
    QEntry.sql(
      "cur_ngram_novelty",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
        |sp AS (SELECT DISTINCT doc_id, md5(s) AS h FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(words) - 7, 0) + 1),
        |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
        |      || ' ' || words[i+4] || ' ' || words[i+5] || ' ' || words[i+6]
        |      || ' ' || words[i+7])) AS s FROM w) t),
        |own AS (SELECT h, min(doc_id) AS fd FROM sp GROUP BY h),
        |agg AS (SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(CASE WHEN own.fd = sp.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM sp JOIN own ON sp.h = own.h GROUP BY sp.doc_id)
        |SELECT w.doc_id, COALESCE(agg.n_spans, 0) AS n_spans,
        |  COALESCE(agg.n_novel, 0) AS n_novel,
        |  CAST(CASE WHEN COALESCE(agg.n_spans, 0) = 0 THEN -1
        |       ELSE agg.n_novel * 1000000 // agg.n_spans END AS BIGINT) AS novel_ppm
        |FROM w LEFT JOIN agg USING (doc_id)""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => Dedup.spanNovelty(documents(s, d), "doc_id", "text", k = 8) },

    // k-anonymity audit ([[Curation.kAnonymity]]) over the corpus
    // quasi-identifier (lang, source) at k = 5: the release-gate privacy
    // review a scrubbed corpus still needs — rare attribute combinations
    // re-identify where direct identifiers don't. All counts exact BIGINTs;
    // class-cardinality state (≤ |lang|·|source|) at any corpus size.
    QEntry.sql(
      "cur_kanonymity",
      """WITH c AS (SELECT lang, source, count(*) AS class_size
        |  FROM documents GROUP BY lang, source)
        |SELECT CAST(5 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(class_size) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
        |    AS n_risky_rows,
        |  CAST(sum(class_size) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) * 1000000
        |    // sum(class_size) AS BIGINT) AS risky_ppm
        |FROM c""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.kAnonymity(documents(s, d), Seq("lang", "source"), k = 5)
    },

    // E418 split-conformal filtering gate ([[Curation.conformalGate]]): per
    // source, the ⌈(n_cal+1)·9/10⌉-th smallest calibration length becomes
    // the distribution-free keep threshold for the test slice — the
    // finite-sample quantile with a ≥90% marginal coverage guarantee,
    // entirely in integer arithmetic (rational coverage, exact rank, exact
    // order-stat threshold). Calibration = even doc_id BLOCKS of 20 (the
    // corpus assigns source = doc_id mod 20, so plain parity would starve
    // every source of test rows); the twin replays
    // the rank, the ceil division, the null-threshold degeneracy and the
    // gating counts.
    QEntry.sql(
      "cur_conformal_gate",
      """WITH b AS (SELECT source AS g, n_chars AS s, (doc_id // 20) % 2 = 0 AS cal
        |  FROM documents),
        |cs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
        |    CAST(((count(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
        |  FROM b WHERE cal GROUP BY g),
        |rk AS (SELECT g, s, CAST(row_number() OVER (PARTITION BY g ORDER BY s)
        |    AS BIGINT) AS rn FROM b WHERE cal),
        |th AS (SELECT cs.g, cs.n_cal, cs.k, rk.s AS threshold
        |  FROM cs LEFT JOIN rk ON cs.g = rk.g AND rk.rn = cs.k),
        |t AS (SELECT g, s FROM b WHERE NOT cal)
        |SELECT th.g AS source, th.n_cal, th.k, CAST(th.threshold AS BIGINT) AS threshold,
        |  CAST(count(t.s) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN t.s IS NOT NULL AND (th.threshold IS NULL
        |    OR t.s <= th.threshold) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(CASE WHEN count(t.s) > 0 THEN sum(CASE WHEN t.s IS NOT NULL
        |    AND (th.threshold IS NULL OR t.s <= th.threshold) THEN 1 ELSE 0 END)
        |    * 1000000 // count(t.s) ELSE NULL END AS BIGINT) AS kept_ppm
        |FROM th LEFT JOIN t ON th.g = t.g
        |GROUP BY th.g, th.n_cal, th.k, th.threshold"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.conformalGate(documents(s, d), "source", "n_chars",
        calibPred = expr("doc_id div 20") % 2 === 0,
        coverageNum = 9, coverageDen = 10)
    },

    // E417 DoReMi-style domain reweighting ([[Curation.doremiWeights]]):
    // five multiplicative-weights rounds over the per-source mean corpus
    // surprisal — domains the corpus blend explains worst gain mixture
    // weight, w'_d ∝ w_d·exp(η·(ℓ_d − Σ w·ℓ)). The twin replays the
    // DECIMAL surprisal ladder, every round's 10⁹-quantized integer
    // mixture/normalizer sums, and each exp on the pinned double, so the
    // full per-round ledger hash-matches — a reweighter that normalized
    // before quantizing (or let a float sum's order leak in) mismatches.
    QEntry.sql(
      "cur_doremi_weights", {
        val roundsSql = (1 to 5).map { k =>
          val prev = if (k == 1) "w0" else s"w${k - 1}"
          val carry = (1 until k).map(j => s"w_$j").map(c => s", $c").mkString
          // sK/wK MATERIALIZED: each is referenced twice downstream
          // (dK+wK, mK+sK) — inlined, the reference count doubles per
          // round and the h-chain replays 2^rounds times
          s""",
             |m$k AS (SELECT CAST(sum(CAST(round(w * h_mean * 1e9, 0) AS BIGINT))
             |    AS BIGINT) AS mq FROM $prev),
             |s$k AS MATERIALIZED (SELECT d, n_tokens, h_mean, w$carry,
             |    CAST(round(w * exp(0.5 * (h_mean - CAST(mq AS DOUBLE) / 1e9)) * 1e9, 0)
             |      AS BIGINT) AS wq
             |  FROM $prev CROSS JOIN m$k),
             |d$k AS (SELECT CAST(sum(wq) AS BIGINT) AS dq FROM s$k),
             |w$k AS MATERIALIZED (SELECT d, n_tokens, h_mean$carry,
             |    round(CAST(wq AS DOUBLE) / CAST(dq AS DOUBLE), 6) AS w_$k,
             |    round(CAST(wq AS DOUBLE) / CAST(dq AS DOUBLE), 6) AS w
             |  FROM s$k CROSS JOIN d$k)"""
        }.mkString
        s"""WITH tok AS MATERIALIZED (SELECT source AS d, t, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT source, unnest($wordsSql) AS t FROM documents) x
           |  WHERE t <> '' GROUP BY source, t),
           |ct AS (SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM tok GROUP BY t),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tok),
           |h AS MATERIALIZED (SELECT d, CAST(sum(c) AS BIGINT) AS n_tokens,
           |    round(CAST(CAST(sum(c * CAST(round(ln(CAST(n AS DOUBLE)
           |      / CAST(ct AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DECIMAL(28,9))
           |      AS DOUBLE) / sum(c), 6) AS h_mean
           |  FROM tok JOIN ct USING (t) CROSS JOIN n GROUP BY d),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS ndom FROM h),
           |w0 AS (SELECT d, n_tokens, h_mean, round(1.0 / ndom, 6) AS w
           |  FROM h CROSS JOIN nd)$roundsSql
           |SELECT d AS source, n_tokens, h_mean, w_1, w_2, w_3, w_4, w_5 FROM w5"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.doremiWeights(documents(s, d), "source", "text", eta = 0.5, rounds = 5)
        .withColumnRenamed("_d", "source")
    },

    // E411 ε-DP-style Laplace release ([[Curation.dpLaplaceCounts]]): the
    // per-source doc-count release at ε = 0.5 with SEEDED noise — u =
    // (h+0.5)/2⁵² from the md5 of (seed, group key), pushed through the
    // Laplace inverse CDF −(1/ε)·sgn(2u−1)·ln(1−|2u−1|). Deterministic by
    // design (reproducible audits, no re-rolling the draw) and replayed
    // hash-for-hash by the twin; noisy_count rounds to 4 per the libm
    // policy (ln once, same expression order, never a ranking key). The
    // epsilon/sensitivity/scale columns are the per-release ledger entries
    // a sequential-composition accountant sums. Plan = the count's own
    // (map-side combine), noise attaches after aggregation.
    QEntry.sql(
      "cur_dp_release",
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |h AS (SELECT source, n,
        |  CAST(('0x' || substr(md5('dp1|' || source), 1, 13)) AS BIGINT) AS hv FROM g),
        |t AS (SELECT source, n,
        |  (hv * 2.0 + 1.0) / 4503599627370496.0 - 1.0 AS t FROM h)
        |SELECT source,
        |  round(CAST(n AS DOUBLE) + (-2.0) * (CASE WHEN t > 0 THEN 1.0
        |    WHEN t < 0 THEN -1.0 ELSE 0.0 END) * ln(1.0 - abs(t)), 4) AS noisy_count,
        |  CAST(0.5 AS DOUBLE) AS epsilon, CAST(1.0 AS DOUBLE) AS sensitivity,
        |  CAST(2.0 AS DOUBLE) AS scale
        |FROM t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.dpLaplaceCounts(documents(s, d), Seq("source"), eps = 0.5, seed = "dp1")
    },

    // E333 l-diversity + t-closeness audit ([[Curation.privacyAudit]]):
    // per (lang, source) class over the length-band sensitive attribute
    // (n_chars div 100) — l = distinct sensitive values in the class,
    // t = exact integer 1-D earth-mover distance between the class's and
    // the corpus's band distributions (prefix sums compared in 1/(n_g·N)
    // units, ppm-normalized by m−1). The k-anon follow-up: a k-large class
    // still leaks when l = 1 or its distribution diverges.
    QEntry.sql(
      "cur_privacy_audit",
      """WITH d AS (SELECT lang, source, n_chars // 100 AS band FROM documents),
        |cl AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size
        |  FROM d GROUP BY lang, source),
        |gb AS (SELECT band, CAST(count(*) AS BIGINT) AS q FROM d GROUP BY band),
        |cb AS (SELECT lang, source, band, CAST(count(*) AS BIGINT) AS p
        |  FROM d GROUP BY lang, source, band),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(DISTINCT band) AS BIGINT) AS m FROM d),
        |grid AS (SELECT cl.lang, cl.source, cl.class_size, gb.band, gb.q,
        |    COALESCE(cb.p, 0) AS p
        |  FROM cl CROSS JOIN gb LEFT JOIN cb
        |    ON cl.lang = cb.lang AND cl.source = cb.source AND gb.band = cb.band),
        |cum AS (SELECT lang, source, class_size, p,
        |    sum(p) OVER (PARTITION BY lang, source ORDER BY band
        |      ROWS UNBOUNDED PRECEDING) AS cp,
        |    sum(q) OVER (PARTITION BY lang, source ORDER BY band
        |      ROWS UNBOUNDED PRECEDING) AS cq
        |  FROM grid),
        |ag AS (SELECT lang, source, class_size, m, n_total,
        |    CAST(sum(abs(cp * n_total - cq * class_size)) AS BIGINT) AS dsum,
        |    CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS l_distinct
        |  FROM cum CROSS JOIN tot GROUP BY lang, source, class_size, m, n_total)
        |SELECT lang, source, class_size, l_distinct,
        |  CAST(CASE WHEN m <= 1 THEN 0
        |    ELSE dsum * 1000000 // (class_size * n_total * (m - 1)) END AS BIGINT)
        |    AS emd_ppm
        |FROM ag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.privacyAudit(
        documents(s, d).withColumn("band", expr("n_chars div 100")),
        Seq("lang", "source"),
        "band"
      )
    },

    // Temperature-scaled mixture weights at α = 0.5 with per-source epoch
    // budgets ([[Curation.temperatureMixture]]): wᵢ ∝ √nᵢ upsamples small
    // sources (the multilingual rebalancing rule), then a 10⁹-char budget
    // splits by weight and converts to milli-epochs over each source's
    // actual char mass — the repetition-rate plan a data-constrained run
    // reads before sampling. √n is quantized to exact integer micro-units
    // BEFORE summation, so no float sum-order exists on either engine.
    QEntry.sql(
      "cur_temperature_mix",
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(sq) AS BIGINT) AS sq_total FROM s)
        |SELECT source, n_docs, chars,
        |  CAST(sq * 1000000 // sq_total AS BIGINT) AS w_ppm,
        |  CAST((1000000000 * (sq * 1000000 // sq_total) // 1000000) * 1000
        |    // chars AS BIGINT) AS epochs_milli
        |FROM s CROSS JOIN t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.temperatureMixture(
        documents(s, d), "source", "n_chars", budgetChars = 1000000000L)
    },

    // Canonical URL normalization ([[Curation.normalizeUrl]]) over planted
    // crawl URLs (three shapes: uppercase host + default port + tracking
    // params + fragment; https:443 with unsorted params; bare root with
    // trailing slash). Verifies scheme/host lowering, default-port and
    // fragment stripping, utm_ removal, param sorting and slash trimming
    // value-for-value — path case intentionally PRESERVED.
    QEntry.sql(
      "cur_url_normalize", {
        val norm =
          """lower(regexp_extract(u0, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) || '://' ||
            |regexp_replace(lower(regexp_extract(u0, '^[^:/]+://([^/?#]+)', 1)),
            |               ':(80|443)$', '') ||
            |regexp_replace(regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$', 1),
            |               '^([^?]*)', 1), '/+$', '') ||
            |CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END"""
            .stripMargin.replaceAll("\\s+", " ")
        s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
           |s AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS u0 FROM r),
           |p AS (SELECT doc_id, url, u0,
           |    list_sort(list_filter(string_split(
           |      regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$$', 1),
           |                     '[?](.*)$$', 1), '&'),
           |      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')) AS ps
           |  FROM s)
           |SELECT doc_id, url, $norm AS url_norm,
           |  regexp_replace(lower(regexp_extract(u0, '^[^:/]+://([^/?#]+)', 1)),
           |                 ':(80|443)$$', '') AS host
           |FROM p""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      urlFixture(documents(s, d))
        .select(
          col("doc_id"),
          col("url"),
          Curation.normalizeUrl(col("url")).as("url_norm"),
          regexp_replace(
            lower(regexp_extract(regexp_replace(col("url"), "#.*$", ""), "^[^:/]+://([^/?#]+)", 1)),
            ":(80|443)$",
            ""
          ).as("host")
        )
    },

    // Crawl dedup on the normalized key: the planted root-path URLs (one
    // per doc_id % 50 within the doc_id % 3 == 2 class) collapse to one
    // fetch each — exactly the duplicate-crawl suppression the normalizer
    // exists for. Exact counts + first-seen doc per canonical URL.
    QEntry.sql(
      "cur_url_dedup",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |s AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS u0 FROM r),
         |p AS (SELECT doc_id, url, u0,
         |    list_sort(list_filter(string_split(
         |      regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$$', 1),
         |                     '[?](.*)$$', 1), '&'),
         |      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')) AS ps
         |  FROM s),
         |n AS (SELECT doc_id,
         |    lower(regexp_extract(u0, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) || '://' ||
         |    regexp_replace(lower(regexp_extract(u0, '^[^:/]+://([^/?#]+)', 1)),
         |                   ':(80|443)$$', '') ||
         |    regexp_replace(regexp_extract(regexp_extract(u0, '^[^:/]+://[^/?#]+(.*)$$', 1),
         |                   '^([^?]*)', 1), '/+$$', '') ||
         |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END AS url_norm
         |  FROM p)
         |SELECT url_norm, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM n GROUP BY url_norm""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      urlFixture(documents(s, d))
        .select(col("doc_id"), Curation.normalizeUrl(col("url")).as("url_norm"))
        .groupBy("url_norm")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
    },

    // Naive-chain HTML entity decode ([[Curation.decodeHtmlEntities]]) on
    // planted entities: counts pre-decode, decoded text value-for-value
    // (the &amp;-last ordering replayed identically by the twin).
    QEntry.sql(
      "cur_html_entities",
      s"""WITH r AS (SELECT doc_id,
         |    'Tom &amp; Jerry say &quot;' ||
         |    string_split_regex(trim(text), '\\s+')[1] ||
         |    '&quot; &lt;i&gt;it&#39;s&nbsp;fine&lt;/i&gt;' AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '&(lt|gt|quot|amp|nbsp|#39);')) AS BIGINT)
         |    AS n_entities,
         |  replace(replace(replace(replace(replace(replace(raw,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         |    '&nbsp;', ' '), '&amp;', '&') AS decoded
         |FROM r""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      import graft.functions.TextAnalysis
      documents(s, d)
        .select(
          col("doc_id"),
          concat(
            lit("Tom &amp; Jerry say &quot;"),
            element_at(TextAnalysis.tokens(col("text")), 1),
            lit("&quot; &lt;i&gt;it&#39;s&nbsp;fine&lt;/i&gt;")
          ).as("raw")
        )
        .select(
          col("doc_id"),
          Curation.htmlEntityCount(col("raw")).as("n_entities"),
          Curation.decodeHtmlEntities(col("raw")).as("decoded")
        )
    },

    // WARC-lite archive round-trip ([[Curation.parseWarcLite]]): ten-doc
    // archives synthesized by ordered concatenation of records, then split
    // back into per-record rows — URI, declared length, body and length
    // audit all verified value-for-value (body ≡ the original document
    // text, so the parse is a proven inverse of the synthesis).
    QEntry.sql(
      "cur_warc_records",
      s"""WITH rec AS (SELECT doc_id, CAST(doc_id // 10 AS BIGINT) AS g,
         |    'WARC/1.0' || chr(10) || 'WARC-Type: response' || chr(10) ||
         |    'WARC-Target-URI: http://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |    '.com/doc/' || CAST(doc_id AS VARCHAR) || chr(10) ||
         |    'Content-Length: ' || CAST(n_chars AS VARCHAR) || chr(10) || chr(10) ||
         |    text || chr(10) AS r
         |  FROM documents),
         |arc AS (SELECT g, string_agg(r, '' ORDER BY doc_id) AS a FROM rec GROUP BY g),
         |sp AS (SELECT g, string_split(a, 'WARC/1.0' || chr(10)) AS parts FROM arc),
         |ex AS (SELECT g, unnest(list_transform(range(2, len(parts) + 1), i -> i)) AS i,
         |    parts FROM sp),
         |pr AS (SELECT g AS archive_id, CAST(i - 1 AS BIGINT) AS rec_id,
         |    regexp_extract(parts[i], '(?m)^WARC-Target-URI: (.*)$$', 1) AS uri,
         |    CAST(regexp_extract(parts[i], '(?m)^Content-Length: (.*)$$', 1) AS BIGINT)
         |      AS content_length,
         |    regexp_replace(regexp_extract(parts[i], '(?s)\\n\\n(.*)$$', 1),
         |                   '\\n$$', '') AS body
         |  FROM ex)
         |SELECT archive_id, rec_id, uri, content_length, body,
         |  CAST(length(body) AS BIGINT) AS body_len,
         |  length(body) = content_length AS length_ok
         |FROM pr""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val rec = documents(s, d).select(
        col("doc_id"),
        expr("CAST(doc_id div 10 AS BIGINT)").as("g"),
        concat(
          lit("WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://site"),
          (col("doc_id") % 50).cast("string"),
          lit(".com/doc/"), col("doc_id").cast("string"),
          lit("\nContent-Length: "), col("n_chars").cast("string"),
          lit("\n\n"), col("text"), lit("\n")
        ).as("r")
      )
      val arc = rec
        .groupBy("g")
        .agg(
          array_join(
            expr("transform(array_sort(collect_list(struct(doc_id, r))), x -> x.r)"),
            ""
          ).as("a")
        )
      Curation
        .parseWarcLite(arc, "g", "a")
        .withColumnRenamed("g", "archive_id")
    },

    // Crawl frontier generation: [[Curation.extractLinks]] over the fixture
    // pages (root-relative hrefs) resolved against each page's own planted
    // URL, normalized, and rolled up per canonical target — the
    // extract→resolve→normalize→dedup chain a crawler runs per fetched
    // page. The twin replays extraction regex, resolution tiers and the
    // normalizer CTE for CTE.
    QEntry.sql(
      "cur_link_frontier",
      s"""WITH pg AS (SELECT doc_id, $htmlFixtureSql AS html, $urlFixtureSql AS burl
         |  FROM documents),
         |b AS (SELECT doc_id, html, regexp_replace(burl, '#.*$$', '') AS base FROM pg),
         |bx AS (SELECT doc_id, html, base,
         |    lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS sch,
         |    lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) || '://' ||
         |      regexp_replace(lower(regexp_extract(base, '^[^:/]+://([^/?#]+)', 1)),
         |                     ':(80|443)$$', '') AS hostroot,
         |    regexp_extract(base, '^[^:/]+://[^/?#]+([^?#]*)', 1) AS bpath
         |  FROM b),
         |lk AS (SELECT doc_id, sch, hostroot,
         |    hostroot || regexp_replace(bpath, '[^/]*$$', '') AS dir,
         |    unnest(regexp_extract_all(html, '<a[^>]*href="([^"]*)"', 1)) AS href
         |  FROM bx),
         |res AS (SELECT doc_id,
         |    CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
         |         WHEN href LIKE '//%' THEN sch || ':' || href
         |         WHEN href LIKE '/%' THEN hostroot || href
         |         ELSE dir || href END AS url
         |  FROM lk
         |  WHERE href <> '' AND href NOT LIKE '#%'
         |    AND href NOT LIKE 'javascript:%' AND href NOT LIKE 'mailto:%'),
         |${urlNormSql("res", "doc_id")}
         |SELECT url_norm, CAST(count(*) AS BIGINT) AS n_refs,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM nn GROUP BY url_norm""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val pages = htmlFixture(documents(s, d))
        .join(urlFixture(documents(s, d)), "doc_id")
      Curation
        .extractLinks(pages, "doc_id", "html", "url")
        .select(col("doc_id"), Curation.normalizeUrl(col("url")).as("url_norm"))
        .groupBy("url_norm")
        .agg(
          count(lit(1)).as("n_refs"),
          countDistinct(col("doc_id")).as("n_docs"),
          min("doc_id").as("first_doc")
        )
    },

    // Anchor-text aggregation ([[Curation.extractAnchors]] →
    // [[Curation.anchorTextRollup]]): anchors from the fixture pages
    // resolved against each page's planted URL, normalized, and rolled up
    // per canonical target — anchor counts, distinct-text counts and the
    // dominant text (count-then-text precedence) verified value-for-value.
    QEntry.sql(
      "cur_anchor_text",
      s"""WITH pg AS (SELECT doc_id, $htmlFixtureSql AS html, $urlFixtureSql AS burl
         |  FROM documents),
         |b AS (SELECT doc_id, html, regexp_replace(burl, '#.*$$', '') AS base FROM pg),
         |bx AS (SELECT doc_id, html, base,
         |    lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS sch,
         |    lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) || '://' ||
         |      regexp_replace(lower(regexp_extract(base, '^[^:/]+://([^/?#]+)', 1)),
         |                     ':(80|443)$$', '') AS hostroot,
         |    regexp_extract(base, '^[^:/]+://[^/?#]+([^?#]*)', 1) AS bpath
         |  FROM b),
         |ak AS (SELECT doc_id, sch, hostroot,
         |    hostroot || regexp_replace(bpath, '[^/]*$$', '') AS dir,
         |    unnest(regexp_extract_all(html, '<a[^>]*href="[^"]*"[^>]*>[^<]*</a>')) AS a
         |  FROM bx),
         |ah AS (SELECT doc_id, sch, hostroot, dir,
         |    regexp_extract(a, 'href="([^"]*)"', 1) AS href,
         |    trim(regexp_replace(regexp_extract(a, '>([^<]*)</a>', 1),
         |                        '\\s+', ' ', 'g')) AS txt
         |  FROM ak),
         |res AS (SELECT doc_id, txt,
         |    CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
         |         WHEN href LIKE '//%' THEN sch || ':' || href
         |         WHEN href LIKE '/%' THEN hostroot || href
         |         ELSE dir || href END AS url
         |  FROM ah
         |  WHERE href <> '' AND href NOT LIKE '#%'
         |    AND href NOT LIKE 'javascript:%' AND href NOT LIKE 'mailto:%'),
         |${urlNormSql("res", "doc_id, txt")},
         |cnt AS (SELECT url_norm, txt, CAST(count(*) AS BIGINT) AS c
         |  FROM nn WHERE txt <> '' GROUP BY url_norm, txt),
         |m AS (SELECT url_norm, CAST(sum(c) AS BIGINT) AS n_anchors,
         |    CAST(count(*) AS BIGINT) AS n_texts, max(c) AS mc
         |  FROM cnt GROUP BY url_norm),
         |tp AS (SELECT cnt.url_norm, max(cnt.txt) AS top_text
         |  FROM cnt JOIN m ON cnt.url_norm = m.url_norm AND cnt.c = m.mc
         |  GROUP BY cnt.url_norm)
         |SELECT m.url_norm, m.n_anchors, m.n_texts, tp.top_text, m.mc AS top_n
         |FROM m JOIN tp ON m.url_norm = tp.url_norm"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val pages = htmlFixture(documents(s, d))
        .join(urlFixture(documents(s, d)), "doc_id")
      Curation.anchorTextRollup(
        Curation
          .extractAnchors(pages, "doc_id", "html", "url")
          .select(
            Curation.normalizeUrl(col("url")).as("url_norm"),
            col("anchor_text")
          ),
        "url_norm",
        "anchor_text"
      )
    },

    // robots.txt-style prefix screen ([[Curation.robotsScreen]]): planted
    // per-host disallow rules (every even host blocks /Path, every third
    // blocks /a) against the planted crawl URLs — the politeness gate
    // between frontier and fetch. Per-URL match counts computed over
    // DISTINCT urls (shared root URLs must not inflate counts), joined
    // back to every input row.
    QEntry.sql(
      "cur_robots_screen",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |parts AS (SELECT DISTINCT url,
         |    regexp_replace(lower(regexp_extract(url, '^[^:/]+://([^/?#]+)', 1)),
         |                   ':(80|443)$$', '') AS h,
         |    regexp_extract(url, '^[^:/]+://[^/?#]+([^?#]*)', 1) AS pth
         |  FROM r),
         |rules AS (
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host, '/Path' AS prefix
         |  FROM range(0, 50) t(k) WHERE k % 2 = 0
         |  UNION ALL
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com', '/a'
         |  FROM range(0, 50) t(k) WHERE k % 3 = 0),
         |m AS (SELECT url, CAST(count(*) AS BIGINT) AS n_rules_matched
         |  FROM parts JOIN rules ON parts.h = rules.host
         |    AND starts_with(parts.pth, rules.prefix)
         |  GROUP BY url)
         |SELECT r.doc_id, r.url,
         |  COALESCE(m.n_rules_matched, 0) AS n_rules_matched,
         |  COALESCE(m.n_rules_matched, 0) = 0 AS allowed
         |FROM r LEFT JOIN m ON r.url = m.url""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val rulesBase = s.range(0, 50).toDF("k")
      val rules = rulesBase
        .filter(col("k") % 2 === 0)
        .select(concat(lit("site"), col("k").cast("string"), lit(".com")).as("host"),
          lit("/Path").as("prefix"))
        .unionByName(
          rulesBase
            .filter(col("k") % 3 === 0)
            .select(concat(lit("site"), col("k").cast("string"), lit(".com")).as("host"),
              lit("/a").as("prefix"))
        )
      Curation.robotsScreen(urlFixture(documents(s, d)), "url", rules)
    },

    // RFC-9309 longest-match robots decision ([[Curation.robotsDecision]]):
    // layered Allow/Disallow rules — every host disallows /Path but
    // re-allows /Path/1 (longer prefix wins), even hosts re-disallow
    // /Path/12 (longer still), k%3 hosts disallow /a while k%5 hosts ALLOW
    // /a (equal length → allow wins on the k%15 overlap). Exercises
    // most-specific-match precedence and the allow-beats-disallow tie rule
    // value-for-value per URL.
    QEntry.sql(
      "cur_robots_decision",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |parts AS (SELECT DISTINCT url,
         |    regexp_replace(lower(regexp_extract(url, '^[^:/]+://([^/?#]+)', 1)),
         |                   ':(80|443)$$', '') AS h,
         |    regexp_extract(url, '^[^:/]+://[^/?#]+([^?#]*)', 1) AS pth
         |  FROM r),
         |rules AS (
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com' AS host,
         |    '/Path' AS prefix, FALSE AS allow FROM range(0, 50) t(k)
         |  UNION ALL
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com', '/Path/1', TRUE
         |  FROM range(0, 50) t(k)
         |  UNION ALL
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com', '/Path/12', FALSE
         |  FROM range(0, 50) t(k) WHERE k % 2 = 0
         |  UNION ALL
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com', '/a', FALSE
         |  FROM range(0, 50) t(k) WHERE k % 3 = 0
         |  UNION ALL
         |  SELECT 'site' || CAST(k AS VARCHAR) || '.com', '/a', TRUE
         |  FROM range(0, 50) t(k) WHERE k % 5 = 0),
         |cand AS (SELECT parts.url, CAST(length(rules.prefix) AS BIGINT) AS len,
         |    rules.allow
         |  FROM parts JOIN rules ON parts.h = rules.host
         |    AND starts_with(parts.pth, rules.prefix)),
         |m AS (SELECT url, max(len) AS matched_len FROM cand GROUP BY url),
         |a AS (SELECT c.url, max(CASE WHEN c.allow THEN 1 ELSE 0 END) = 1 AS allowed
         |  FROM cand c JOIN m ON c.url = m.url AND c.len = m.matched_len
         |  GROUP BY c.url)
         |SELECT r.doc_id, r.url, COALESCE(m.matched_len, 0) AS matched_len,
         |  COALESCE(a.allowed, TRUE) AS allowed
         |FROM r LEFT JOIN m ON r.url = m.url
         |LEFT JOIN a ON r.url = a.url""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ks = s.range(0, 50).toDF("k")
      def hostCol = concat(lit("site"), col("k").cast("string"), lit(".com"))
      def ruleSet(f: org.apache.spark.sql.DataFrame, prefix: String, allow: Boolean) =
        f.select(hostCol.as("host"), lit(prefix).as("prefix"), lit(allow).as("allow"))
      val rules = ruleSet(ks, "/Path", allow = false)
        .unionByName(ruleSet(ks, "/Path/1", allow = true))
        .unionByName(ruleSet(ks.filter(col("k") % 2 === 0), "/Path/12", allow = false))
        .unionByName(ruleSet(ks.filter(col("k") % 3 === 0), "/a", allow = false))
        .unionByName(ruleSet(ks.filter(col("k") % 5 === 0), "/a", allow = true))
      Curation.robotsDecision(urlFixture(documents(s, d)), "url", rules)
    },

    // Crawler-trap mining ([[Curation.crawlTrapReport]]): distinct
    // canonical URLs grouped by their digit/hex template — the planted
    // per-doc path ids collapse into ONE template row whose n_urls is the
    // doc count of that shape (the trap signature), while the per-host
    // root and /a shapes stay at host cardinality. Threshold 100 flags
    // exactly the id-bearing shape at every sf.
    QEntry.sql(
      "cur_url_templates",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |${urlNormSql("r", "doc_id")},
         |d AS (SELECT DISTINCT url_norm FROM nn),
         |t AS (SELECT url_norm,
         |    regexp_replace(regexp_replace(url_norm, '[0-9a-f]{8,}', '{h}', 'g'),
         |                   '[0-9]+', '{n}', 'g') AS template,
         |    regexp_extract(url_norm, '^[^:/]+://([^/?#]+)', 1) AS h
         |  FROM d),
         |g AS (SELECT template, CAST(count(*) AS BIGINT) AS n_urls,
         |    CAST(count(DISTINCT h) AS BIGINT) AS n_hosts,
         |    min(url_norm) AS sample_url
         |  FROM t GROUP BY template)
         |SELECT template, n_urls, n_hosts, n_urls // n_hosts AS urls_per_host,
         |  sample_url, n_urls >= 100 AS is_trap
         |FROM g""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.crawlTrapReport(
        urlFixture(documents(s, d))
          .select(Curation.normalizeUrl(col("url")).as("url_norm")),
        "url_norm",
        minUrls = 100L
      )
    },

    // Per-host politeness schedule ([[Curation.fetchSchedule]]): every
    // distinct canonical URL gets its deterministic per-host fetch slot
    // (ordered by the URL string) and ETA under a 500 ms crawl delay, with
    // the host's queue depth alongside — slot/eta/depth verified
    // value-for-value against the twin's window functions.
    QEntry.sql(
      "cur_fetch_schedule",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |${urlNormSql("r", "doc_id")},
         |d AS (SELECT DISTINCT url_norm FROM nn),
         |h AS (SELECT url_norm,
         |    regexp_extract(url_norm, '^[^:/]+://([^/?#]+)', 1) AS host
         |  FROM d)
         |SELECT url_norm, host,
         |  CAST(row_number() OVER (PARTITION BY host ORDER BY url_norm) AS BIGINT)
         |    AS slot,
         |  CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n_host_urls,
         |  CAST((row_number() OVER (PARTITION BY host ORDER BY url_norm) - 1) * 500
         |    AS BIGINT) AS eta_ms
         |FROM h""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.fetchSchedule(
        urlFixture(documents(s, d))
          .select(Curation.normalizeUrl(col("url")).as("url_norm")),
        "url_norm",
        crawlDelayMs = 500L
      )
    },

    // Recrawl scheduling ([[Curation.recrawlSchedule]]): sitemap = the
    // distinct canonical URLs with a lastmod derived from the URL string;
    // fetch log = a deterministic subset with its own derived fetch date,
    // plus planted gone-from-sitemap URLs. Exercises all four statuses
    // (new/stale/fresh/orphan) with exact date comparisons.
    QEntry.sql(
      "cur_recrawl",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |${urlNormSql("r", "doc_id")},
         |d AS (SELECT DISTINCT url_norm FROM nn),
         |sm AS (SELECT url_norm AS url,
         |    DATE '2024-01-01' + CAST(strlen(url_norm) % 30 AS INT) AS lastmod FROM d),
         |fl AS (SELECT url_norm AS url,
         |    DATE '2024-01-01' + CAST(strlen(url_norm) % 45 AS INT) AS fetched_at
         |  FROM d WHERE strlen(url_norm) % 3 <> 0
         |  UNION ALL
         |  SELECT 'http://gone' || CAST(k AS VARCHAR) || '.com/x',
         |    DATE '2024-01-10' FROM range(0, 10) t(k)),
         |j AS (SELECT COALESCE(sm.url, fl.url) AS url, sm.lastmod, fl.fetched_at
         |  FROM sm FULL OUTER JOIN fl ON sm.url = fl.url)
         |SELECT url,
         |  COALESCE(strftime(lastmod, '%Y-%m-%d'), '') AS lastmod_day,
         |  COALESCE(strftime(fetched_at, '%Y-%m-%d'), '') AS fetched_day,
         |  CASE WHEN lastmod IS NULL THEN 'orphan'
         |       WHEN fetched_at IS NULL THEN 'new'
         |       WHEN lastmod > fetched_at THEN 'stale' ELSE 'fresh' END AS status,
         |  CASE WHEN lastmod IS NULL THEN FALSE
         |       WHEN fetched_at IS NULL THEN TRUE
         |       ELSE lastmod > fetched_at END AS needs_fetch
         |FROM j""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val urls = urlFixture(documents(s, d))
        .select(Curation.normalizeUrl(col("url")).as("url"))
        .distinct()
      val sitemap = urls.select(
        col("url"),
        date_add(to_date(lit("2024-01-01")), (length(col("url")) % 30).cast("int"))
          .as("lastmod")
      )
      val fetchLog = urls
        .filter(length(col("url")) % 3 =!= 0)
        .select(
          col("url"),
          date_add(to_date(lit("2024-01-01")), (length(col("url")) % 45).cast("int"))
            .as("fetched_at")
        )
        .unionByName(
          s.range(0, 10)
            .select(
              concat(lit("http://gone"), col("id").cast("string"), lit(".com/x")).as("url"),
              to_date(lit("2024-01-10")).as("fetched_at")
            )
        )
      Curation
        .recrawlSchedule(sitemap, fetchLog)
        .select(
          col("url"),
          coalesce(date_format(col("lastmod"), "yyyy-MM-dd"), lit("")).as("lastmod_day"),
          coalesce(date_format(col("fetched_at"), "yyyy-MM-dd"), lit("")).as("fetched_day"),
          col("status"),
          col("needs_fetch")
        )
    },

    // Max-min fair crawl-budget split ([[Curation.maxMinFairBudget]]):
    // per-host frontier queues (distinct canonical URLs) share 120 fetches
    // — small hosts are fully served, the rest get the water-filling share
    // with the integer remainder spread deterministically. The twin
    // replays the closed-form rank/prefix solution window-for-window.
    QEntry.sql(
      "cur_crawl_budget",
      s"""WITH r AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
         |${urlNormSql("r", "doc_id")},
         |d AS (SELECT DISTINCT url_norm FROM nn),
         |hq AS (SELECT regexp_extract(url_norm, '^[^:/]+://([^/?#]+)', 1) AS host,
         |    CAST(count(*) AS BIGINT) AS q FROM d GROUP BY host),
         |ranked AS (SELECT host, q,
         |    CAST(row_number() OVER (ORDER BY q, host) AS BIGINT) AS i,
         |    CAST(sum(q) OVER (ORDER BY q, host ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS prefix
         |  FROM hq),
         |nn2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hq),
         |af AS (SELECT ranked.*, nn2.n,
         |    q * (n - i + 1) + (prefix - q) <= 120 AS fully_served
         |  FROM ranked CROSS JOIN nn2),
         |kk AS (SELECT COALESCE(max(CASE WHEN fully_served THEN i END), 0) AS k,
         |    COALESCE(max(CASE WHEN fully_served THEN prefix END), 0) AS pk
         |  FROM af)
         |SELECT host, q AS queue,
         |  CAST(CASE WHEN fully_served THEN q
         |    ELSE (120 - pk) // (n - k)
         |      + (CASE WHEN i - k <= (120 - pk) % (n - k) THEN 1 ELSE 0 END) END
         |    AS BIGINT) AS alloc,
         |  fully_served
         |FROM af CROSS JOIN kk""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val hosts = urlFixture(documents(s, d))
        .select(Curation.normalizeUrl(col("url")).as("u"))
        .distinct()
        .groupBy(Curation.urlHost(col("u")).as("host"))
        .agg(count(lit(1)).as("q"))
      Curation.maxMinFairBudget(hosts, "host", "q", budget = 120L)
    },

    // jusText-lite block classification ([[Curation.htmlBlocks]]) over a
    // synthesized page per document (title/nav/h1/article/SHOUTED-copy/
    // footer). Verifies segmentation, tag stripping, integer link/stopword
    // ppm densities and the keep cut block-by-block — the twin replays the
    // identical regexes under RE2 and the identical integer arithmetic.
    QEntry.sql(
      "cur_html_blocks",
      s"""$htmlBlocksSql
         |SELECT doc_id, block_id, block_text, n_chars, n_tokens,
         |  CAST(link_ppm AS BIGINT) AS link_ppm,
         |  CAST(stop_ppm AS BIGINT) AS stop_ppm, is_content
         |FROM blk""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.htmlBlocks(htmlFixture(documents(s, d)), "doc_id", "html")
    },

    // Main-content extraction ([[Curation.extractMainContent]]): per-doc
    // rollup — content blocks joined in document order; boilerplate (nav,
    // footer, title, heading, the no-stopword SHOUTED copy) dropped. Docs
    // whose article block itself fails the stopword test survive with
    // n_kept = 0 — extraction never silently drops documents.
    QEntry.sql(
      "cur_html_extract",
      s"""$htmlBlocksSql
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(CASE WHEN is_content THEN block_text END,
         |    ' | ' ORDER BY block_id), '') AS main_text
         |FROM blk GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Curation.extractMainContent(htmlFixture(documents(s, d)), "doc_id", "html")
    },

    // E428 RHO-loss selection ([[Curation.rhoLossSelect]]): top-100 training
    // docs by reducible holdout loss — loss under the training-split model
    // minus loss under the holdout-split model, both 2-step integer-gradient
    // GD runs of the E412 trainer. The twin replays BOTH trainings
    // CTE-for-CTE (split by doc_id % 4), both scoring passes, the clamped
    // floor-ppm sigmoid, the round₉-DECIMAL log-losses and the
    // (rho DESC, id) cut — a selector that mixed up its splits, skipped the
    // clamp, or let a float into either gradient diverges in the hash.
    QEntry.sql(
      "cur_rho_select", {
        val bHash = "CAST(list_sum(list_transform(range(1, 9), i -> " +
          "(strpos('0123456789abcdef', substr(md5(t), CAST(i AS INT), 1)) - 1) " +
          "* pow(16, 8 - i))) AS BIGINT) % 256"
        def train(p: String, cond: String) = {
          val steps = (1 to 2).map { k =>
            s""",
               |z$p$k AS (SELECT tk.doc_id, tk.y, count(*) AS n,
               |    round(CAST(CAST(sum(w$p${k - 1}.w) AS DECIMAL(28,9)) AS DOUBLE)
               |      / count(*), 6) AS z
               |  FROM tk$p tk JOIN w$p${k - 1} ON tk.b = w$p${k - 1}.bucket
               |  GROUP BY tk.doc_id, tk.y),
               |r$p$k AS (SELECT doc_id, CAST(floor(
               |    CAST(CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT)
               |      - (CASE WHEN y THEN 1000000 ELSE 0 END) AS DOUBLE)
               |    * 1000.0 / n) AS BIGINT) AS r FROM z$p$k),
               |g$p$k AS (SELECT tk.b AS bucket, CAST(sum(r$p$k.r) AS BIGINT) AS g
               |  FROM tk$p tk JOIN r$p$k USING (doc_id) GROUP BY tk.b),
               |w$p$k AS (SELECT w$p${k - 1}.bucket,
               |    CAST(round(CAST(w$p${k - 1}.w AS DOUBLE)
               |      - CAST(COALESCE(g$p$k.g, 0) AS DOUBLE)
               |        / (nd$p.n_docs * 250000000.0), 9)
               |      AS DECIMAL(18,9)) AS w
               |  FROM w$p${k - 1} LEFT JOIN g$p$k USING (bucket) CROSS JOIN nd$p)"""
          }.mkString
          s"""tk$p AS (SELECT doc_id, y, b FROM tk WHERE $cond),
             |nd$p AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |  FROM tk$p),
             |w${p}0 AS (SELECT b AS bucket, CAST(0 AS DECIMAL(18,9)) AS w
             |  FROM (SELECT unnest(range(0, 256)) AS b) t)$steps"""
        }
        s"""WITH tk AS (SELECT doc_id, (n_chars >= 300) AS y, $bHash AS b
           |  FROM (SELECT doc_id, n_chars, unnest($wordsSql) AS t FROM documents) x
           |  WHERE t <> ''),
           |${train("h", "doc_id % 4 = 0")},
           |${train("t", "doc_id % 4 <> 0")},
           |sc AS (SELECT d.doc_id, d.y, COALESCE(t.n, 0) AS n_tokens,
           |    COALESCE(t.ztr, 0.0) AS ztr, COALESCE(t.zho, 0.0) AS zho
           |  FROM (SELECT doc_id, (n_chars >= 300) AS y FROM documents
           |        WHERE doc_id % 4 <> 0) d
           |  LEFT JOIN (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n,
           |      round(CAST(CAST(sum(wt.w) AS DECIMAL(28,9)) AS DOUBLE)
           |        / count(*), 6) AS ztr,
           |      round(CAST(CAST(sum(wh.w) AS DECIMAL(28,9)) AS DOUBLE)
           |        / count(*), 6) AS zho
           |    FROM tkt tk JOIN wt2 wt ON tk.b = wt.bucket
           |    JOIN wh2 wh ON tk.b = wh.bucket
           |    GROUP BY tk.doc_id) t USING (doc_id)),
           |pl AS (SELECT doc_id, n_tokens,
           |    greatest(least(CAST(floor(1000000.0 / (1.0 + exp(-ztr))) AS BIGINT),
           |      999999), 1) AS ptr,
           |    greatest(least(CAST(floor(1000000.0 / (1.0 + exp(-zho))) AS BIGINT),
           |      999999), 1) AS pho, y
           |  FROM sc),
           |ls AS (SELECT doc_id, n_tokens,
           |    CAST(CAST((CASE WHEN y THEN round(-ln(ptr / 1000000.0), 9)
           |      ELSE round(-ln((1000000 - ptr) / 1000000.0), 9) END)
           |      AS DECIMAL(18,9)) * 1000000000 AS BIGINT) AS loss_tr_nano,
           |    CAST(CAST((CASE WHEN y THEN round(-ln(pho / 1000000.0), 9)
           |      ELSE round(-ln((1000000 - pho) / 1000000.0), 9) END)
           |      AS DECIMAL(18,9)) * 1000000000 AS BIGINT) AS loss_ho_nano
           |  FROM pl)
           |SELECT doc_id, n_tokens, loss_tr_nano, loss_ho_nano,
           |  loss_tr_nano - loss_ho_nano AS rho_nano
           |FROM ls ORDER BY rho_nano DESC, doc_id LIMIT 100"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      Curation.rhoLossSelect(
        documents(s, d), "doc_id", "text",
        label = col("n_chars") >= 300,
        holdout = pmod(col("doc_id"), lit(4)) === 0,
        k = 100, buckets = 256, steps = 2, lr = 4.0)
    }
  )
}
