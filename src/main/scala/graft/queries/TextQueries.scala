package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextAnalysis._

/** Text-analysis inventory over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting. Spark
  * implementations in [[graft.functions.TextAnalysis]]; the oracle SQL mirrors
  * the same arithmetic in portable DuckDB (note `'g'` flags — DuckDB
  * regexp_replace is first-match-only by default, Spark's replaces all).
  */
object TextQueries {

  private val wordsSql = """string_split_regex(trim(text), '\s+')"""
  private val swListSql =
    Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  private val tokensSql = s"len($wordsSql)"
  private val swCntSql =
    s"len(list_filter($wordsSql, w -> list_contains($swListSql, w)))"
  private val punctCntSql =
    """(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))"""

  private val langScoreSql: Seq[(String, String)] = LangMarkers.map { case (code, ms) =>
    val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
    code -> s"len(list_filter($wordsSql, w -> list_contains($lst, w)))"
  }

  /** Inline single-expression twin of TextAnalysis.qualityScore (same
    * arithmetic as the txt_quality entry's subquery form). Shared with
    * CurationQueries' quality-band entry.
    */
  private[queries] val qualityExprSql: String =
    s"""round(least(1.0, CAST($tokensSql AS DOUBLE) / 100.0) * 0.5
       |  + (CAST($swCntSql AS DOUBLE) / $tokensSql) * 0.3
       |  + (1.0 - CAST($punctCntSql AS DOUBLE) / length(text)) * 0.2, 4)"""
      .stripMargin.replaceAll("\\s+", " ")

  val entries: Seq[QEntry] = Seq(
    // Token + char counting and ratio metrics, one narrow codegen pass.
    QEntry.sql(
      "txt_stats",
      s"""SELECT doc_id, length(text) AS chars, $tokensSql AS tokens,
         |  round(CAST($punctCntSql AS DOUBLE) / length(text), 4) AS punct_ratio,
         |  round(CAST($swCntSql AS DOUBLE) / $tokensSql, 4) AS stopword_ratio
         |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        charCount(col("text")).cast("bigint").as("chars"),
        tokenCount(col("text")).cast("bigint").as("tokens"),
        punctRatio(col("text")).as("punct_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio")
      )
    },

    // Composite quality score (length saturation + stopword density + punct).
    QEntry.sql(
      "txt_quality",
      s"""SELECT doc_id, round(least(1.0, CAST(tokens AS DOUBLE) / 100.0) * 0.5
         |  + (CAST(sw AS DOUBLE) / tokens) * 0.3
         |  + (1.0 - CAST(punct AS DOUBLE) / chars) * 0.2, 4) AS quality
         |FROM (SELECT doc_id, length(text) AS chars, $tokensSql AS tokens,
         |        $swCntSql AS sw, $punctCntSql AS punct
         |      FROM documents) t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d).select(col("doc_id"), qualityScore(col("text")).as("quality"))
    },

    // Stopword-marker language ID (argmax with first-wins tie-break).
    QEntry.sql(
      "txt_langid", {
        val scoreDefs = langScoreSql.map { case (c, e) => s"$e AS s_$c" }.mkString(", ")
        val best = langScoreSql.map { case (c, _) => s"s_$c" }.mkString("greatest(", ", ", ")")
        val cases = langScoreSql.map { case (c, _) => s"WHEN s_$c = m THEN '$c'" }.mkString(" ")
        s"""SELECT doc_id, lang, CASE WHEN m = 0 THEN 'und' $cases ELSE 'und' END AS lang_guess
           |FROM (SELECT doc_id, lang, $best AS m, s_en, s_de, s_es, s_fr, s_zh
           |      FROM (SELECT doc_id, lang, $scoreDefs FROM documents) t1) t2"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        col("lang"),
        langId(col("text")).as("lang_guess")
      )
    },

    // E340 language-ID confusion matrix: the langid heuristic evaluated
    // against the corpus's ground-truth lang label — per (actual, guessed)
    // cell count plus the within-language share in exact ppm, the accuracy
    // read a pipeline runs before trusting lang gates (txt_langid emits
    // per-doc guesses; this is the EVAL over them). Two partial aggs, one
    // broadcast of the per-lang totals.
    QEntry.sql(
      "txt_langid_confusion", {
        val scoreDefs = langScoreSql.map { case (c, e) => s"$e AS s_$c" }.mkString(", ")
        val best = langScoreSql.map { case (c, _) => s"s_$c" }.mkString("greatest(", ", ", ")")
        val cases = langScoreSql.map { case (c, _) => s"WHEN s_$c = m THEN '$c'" }.mkString(" ")
        s"""WITH g AS (
           |  SELECT doc_id, lang, CASE WHEN m = 0 THEN 'und' $cases ELSE 'und' END AS lang_guess
           |  FROM (SELECT doc_id, lang, $best AS m, s_en, s_de, s_es, s_fr, s_zh
           |        FROM (SELECT doc_id, lang, $scoreDefs FROM documents) t1) t2),
           |t AS (SELECT lang, CAST(count(*) AS BIGINT) AS lt FROM g GROUP BY lang)
           |SELECT g.lang, g.lang_guess, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(*) * 1000000 // max(t.lt) AS BIGINT) AS row_ppm,
           |  (g.lang = g.lang_guess) AS is_hit
           |FROM g JOIN t ON g.lang = t.lang GROUP BY g.lang, g.lang_guess"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val g = documents(s, d).select(
        col("doc_id"),
        col("lang"),
        langId(col("text")).as("lang_guess")
      )
      val t = g.groupBy("lang").agg(count(lit(1)).cast("long").as("_lt"))
      g.join(broadcast(t), "lang")
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).cast("long").as("n"), max(col("_lt")).as("_lt"))
        .select(
          col("lang"),
          col("lang_guess"),
          col("n"),
          expr("n * 1000000 div _lt").cast("long").as("row_ppm"),
          (col("lang") === col("lang_guess")).as("is_hit")
        )
    },

    // Normalized-content fingerprint (md5 of casefolded, punct-collapsed text).
    QEntry.sql(
      "txt_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d).select(col("doc_id"), fingerprint(col("text")).as("fp"))
    },

    // BPE-ish regex token counting (second tokenizer — same pattern semantics
    // under Java regex and RE2).
    QEntry.sql(
      "txt_bpe_tokens",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '''[a-z]+|[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9 ]+')) AS bpe_tokens
        |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), size(bpeTokens(col("text"))).cast("bigint").as("bpe_tokens"))
    },

    // Tokenizer fertility by language: BPE-ish tokens per whitespace word
    // and chars per token, exact ppm ratios per lang — the multilingual
    // tokenizer-budget audit (high fertility = a language is paying more
    // sequence length per word). One lang-keyed partial agg over per-doc
    // counts; all sums exact BIGINTs.
    QEntry.sql(
      "txt_fertility",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS words,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '''[a-z]+|[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9 ]+'))) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(sum(len(regexp_extract_all(text,
        |      '''[a-z]+|[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9 ]+'))) * 1000000
        |    // sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS fertility_ppm,
        |  CAST(sum(length(text)) * 1000000
        |    // sum(len(regexp_extract_all(text,
        |         '''[a-z]+|[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9 ]+'))) AS BIGINT)
        |    AS chars_per_token_ppm
        |FROM documents GROUP BY lang"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d)
        .select(
          col("lang"),
          size(tokens(col("text"))).cast("long").as("_w"),
          size(bpeTokens(col("text"))).cast("long").as("_b"),
          length(col("text")).cast("long").as("_c")
        )
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("_w").as("words"),
          sum("_b").as("bpe_tokens"),
          sum("_c").as("chars")
        )
        .select(
          col("lang"),
          col("n_docs"),
          col("words"),
          col("bpe_tokens"),
          col("chars"),
          expr("bpe_tokens * 1000000L div words").as("fertility_ppm"),
          expr("chars * 1000000L div bpe_tokens").as("chars_per_token_ppm")
        )
    },

    // Winnowing fingerprints: char-8-gram rolling hashes, min per window of
    // 4, distinct survivors — the classic near-dup/plagiarism sketch. The
    // oracled slice is the deterministic 1-in-10 doc subset: the md5-per-char
    // hash is the ORACLE-portable formulation (DuckDB must replay every
    // digit), so its cost is oracle tax, not production cost — the xxhash64
    // production twin `x_winnow_fp_fast` benches the FULL corpus alongside.
    QEntry.sql(
      "txt_winnow_fp",
      """SELECT doc_id, len(fp) AS n_fp,
        |  list_aggregate(fp, 'min') AS min_fp, list_aggregate(fp, 'max') AS max_fp
        |FROM (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(length(text) - 7, 0) + 1 - 3),
        |    i -> list_aggregate(list_transform(range(0, 4),
        |           j -> substr(md5(substr(text, CAST(i + j AS INT), 8)), 1, 8)), 'min'))) AS fp
        |  FROM documents WHERE doc_id % 10 = 0) t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      winnowFingerprintStats(
        documents(s, d).filter(col("doc_id") % 10 === 0), "doc_id", "text")
    },

    // TF-IDF characteristic terms: top-3 per doc. The oracled entry uses the
    // raw-ratio idf variant (score = tf*N/df — integer product + one exact
    // division, bit-identical across engines); the classic ln() variant is
    // the operator's production default, spec-covered in CurationSpec.
    QEntry.sql(
      "txt_tfidf",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf_cnt FROM toks
        |       WHERE term IS NOT NULL AND term <> '' GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf_cnt, doc_freq, tfidf, rank FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf_cnt, dfq.doc_freq,
        |    CAST(tf.tf_cnt * n.n_docs AS DOUBLE) / dfq.doc_freq AS tfidf,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf_cnt * n.n_docs AS DOUBLE) / dfq.doc_freq DESC, tf.term) AS rank
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n) t
        |WHERE rank <= 3""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      graft.operators.TermStats.tfIdfTopTerms(documents(s, d), "doc_id", "text", k = 3, logIdf = false)
    },

    // Corpus vocabulary heavy hitters: global top-20 terms by occurrence
    // (explode → partial-agg count + distinct-doc count → TakeOrdered).
    // Rank-20 ties break on the term, so the LIMIT content is deterministic.
    QEntry.sql(
      "txt_top_terms",
      """SELECT term, cnt, docs FROM (
        |  SELECT term, count(*) AS cnt, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |        FROM documents) t
        |  WHERE term IS NOT NULL AND term <> '' GROUP BY term) g
        |ORDER BY cnt DESC, term LIMIT 20""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), explode_outer(tokens(col("text"))).as("term"))
        .filter(col("term").isNotNull && col("term") =!= "")
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("docs"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(20)
    },

    // Bigram collocations ranked by lift (the PMI argument without the log —
    // same ordering, exact arithmetic): lift = P(w1w2)/(P(w1)P(w2)) reported
    // in parts-per-million as c_xy·N·10⁶ // (c_x·c_y), every step an exact
    // BIGINT (no log/float ranking, so the top-100 is bit-identical
    // cross-engine). Unigram and bigram counts are partial-agg shuffles;
    // the count join is equi on the word; the scalar N broadcasts; top-100
    // is TakeOrderedAndProject — all 100 TB-safe shapes.
    QEntry.sql(
      "txt_collocations",
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS words FROM documents),
        |uc AS (SELECT term, count(*) AS c FROM
        |         (SELECT unnest(words) AS term FROM w) u
        |       WHERE term <> '' GROUP BY term),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_words FROM uc),
        |bc AS (SELECT bg, count(*) AS c_xy FROM
        |         (SELECT unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
        |                  i -> words[i] || ' ' || words[i+1])) AS bg FROM w) b
        |       GROUP BY bg HAVING count(*) >= 3)
        |SELECT bg AS bigram, c_xy, u1.c AS c_w1, u2.c AS c_w2, n_words,
        |  c_xy * n_words * 1000000 // (u1.c * u2.c) AS lift_ppm
        |FROM bc CROSS JOIN n
        |JOIN uc u1 ON u1.term = string_split(bg, ' ')[1]
        |JOIN uc u2 ON u2.term = string_split(bg, ' ')[2]
        |ORDER BY lift_ppm DESC, bigram LIMIT 100"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = documents(s, d).select(tokens(col("text")).as("_ws"))
      val uc = w
        .select(explode(col("_ws")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term")
        .agg(count(lit(1)).as("c"))
      val n = uc.agg(sum("c").as("n_words"))
      val bc = w
        .select(explode(graft.operators.Dedup.shinglesFromWords(col("_ws"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 3)
      bc.crossJoin(broadcast(n))
        .withColumn("_w1", split(col("bigram"), " ").getItem(0))
        .withColumn("_w2", split(col("bigram"), " ").getItem(1))
        .join(uc.select(col("term").as("_w1"), col("c").as("c_w1")), "_w1")
        .join(uc.select(col("term").as("_w2"), col("c").as("c_w2")), "_w2")
        .select(
          col("bigram"),
          col("c_xy"),
          col("c_w1"),
          col("c_w2"),
          col("n_words"),
          expr("c_xy * n_words * 1000000 div (c_w1 * c_w2)").as("lift_ppm")
        )
        .orderBy(col("lift_ppm").desc, col("bigram"))
        .limit(100)
    },

    // Pairwise vocabulary overlap between corpus sources: Jaccard of the
    // distinct term sets for every source pair with a non-empty
    // intersection. |A∩B| via a self-equi-join on term (per-term candidate
    // volume is bounded by sources², never the corpus); |A| by a small
    // broadcast rollup; Jaccard one division of exact BIGINTs. The corpus-
    // mixing diagnostic read before setting mixture weights.
    QEntry.sql(
      "txt_vocab_overlap",
      s"""WITH v AS (SELECT DISTINCT source, unnest($wordsSql) AS term
         |  FROM documents),
         |v2 AS (SELECT source, term FROM v WHERE term <> ''),
         |sz AS (SELECT source, count(*) AS n FROM v2 GROUP BY source),
         |iv AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
         |  FROM v2 a JOIN v2 b ON a.term = b.term AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT iv.src_a, iv.src_b, CAST(iv.inter AS BIGINT) AS inter,
         |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
         |  CAST(iv.inter AS DOUBLE) / (sa.n + sb.n - iv.inter) AS jaccard
         |FROM iv JOIN sz sa ON iv.src_a = sa.source
         |        JOIN sz sb ON iv.src_b = sb.source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val v = documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .distinct()
      val sz = v.groupBy("source").agg(count(lit(1)).as("n"))
      val iv = v
        .toDF("src_a", "term")
        .join(v.toDF("src_b", "term"), "term")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("inter"))
      iv
        .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
        .select(
          col("src_a"),
          col("src_b"),
          col("inter"),
          col("n_a"),
          col("n_b"),
          (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
            .as("jaccard")
        )
    },

    // Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the top-100
    // corpus terms. The log values (libm, identical inputs both engines)
    // are quantized to 9 decimals and summed as DECIMAL — exact and
    // summation-order-independent, so the only float steps are the final
    // slope/intercept combinations on identical inputs; outputs round to 6
    // to absorb libm last-ulp drift (the established entropy-entry rule).
    // The top-100 cut is a TakeOrdered with a term tie-break.
    QEntry.sql(
      "txt_zipf_slope",
      s"""WITH tf AS (SELECT term, count(*) AS cnt
         |  FROM (SELECT unnest($wordsSql) AS term FROM documents) t
         |  WHERE term <> '' GROUP BY term),
         |top AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
         |  FROM tf ORDER BY cnt DESC, term LIMIT 100),
         |pts AS (SELECT
         |    CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(15,9)) AS x,
         |    CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(15,9)) AS y
         |  FROM top),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS DECIMAL(28,9)) AS sx, CAST(sum(y) AS DECIMAL(28,9)) AS sy,
         |    CAST(sum(x * y) AS DECIMAL(38,18)) AS sxy,
         |    CAST(sum(x * x) AS DECIMAL(38,18)) AS sxx
         |  FROM pts)
         |SELECT n,
         |  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) -
         |         (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
         |        ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)) -
         |         (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) AS zipf_slope
         |FROM s""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val tf = documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"))
      val top = tf
        .orderBy(col("cnt").desc, col("term"))
        .limit(100)
        .withColumn(
          "rank",
          // constant-0 non-foldable key: single partition by design over the
          // 100 post-limit rows, without the empty-partition-spec warning
          row_number().over(
            Window.partitionBy(pmod(col("cnt"), lit(1))).orderBy(col("cnt").desc, col("term"))
          )
        )
      val pts = top.select(
        round(log(col("rank").cast("double")), 9).cast("decimal(15,9)").as("x"),
        round(log(col("cnt").cast("double")), 9).cast("decimal(15,9)").as("y")
      )
      pts
        .agg(
          count(lit(1)).as("n"),
          sum("x").cast("decimal(28,9)").as("sx"),
          sum("y").cast("decimal(28,9)").as("sy"),
          sum(col("x") * col("y")).cast("decimal(38,18)").as("sxy"),
          sum(col("x") * col("x")).cast("decimal(38,18)").as("sxx")
        )
        .select(
          col("n"),
          round(
            ((col("n").cast("double") * col("sxy").cast("double")) -
              (col("sx").cast("double") * col("sy").cast("double"))) /
              ((col("n").cast("double") * col("sxx").cast("double")) -
                (col("sx").cast("double") * col("sx").cast("double"))),
            6
          ).as("zipf_slope")
        )
    },

    // Rank-biased overlap (Webber et al. 2010) between the occurrence-count
    // and doc-frequency top-20 term rankings — the standard top-weighted
    // agreement metric for comparing two rankers. Truncated form:
    // RBO@k = Σ_{d≤k} (1−p)·p^(d−1) · |A_d ∩ B_d| / d, p = 0.9. The 20
    // geometric weights are Scala-computed literals interpolated into BOTH
    // engines (e-notation, typed DOUBLE); prefix-overlap counts are exact
    // ints; each depth's contribution quantizes to 12 decimals and sums as
    // DECIMAL (order-free). Both rankings are TakeOrdered top-20s — the
    // depth join touches ≤ 20×20 rows.
    QEntry.sql(
      "txt_rbo_rankings", {
        val wCase = (1 to 20)
          .map { dd =>
            val v = (0.1 * math.pow(0.9, dd - 1)).toString
            val l = if (v.contains("E") || v.contains("e")) s"${v.replace("E", "e")}" else s"${v}e0"
            s"WHEN $dd THEN $l"
          }
          .mkString(" ")
        s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
           |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
           |tf AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
           |atop AS (SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS ra
           |  FROM (SELECT * FROM tf ORDER BY cnt DESC, term LIMIT 20) t),
           |dfq AS (SELECT term, count(*) AS dfc
           |  FROM (SELECT DISTINCT doc_id, term FROM tk) u GROUP BY term),
           |btop AS (SELECT term, row_number() OVER (ORDER BY dfc DESC, term) AS rb
           |  FROM (SELECT * FROM dfq ORDER BY dfc DESC, term LIMIT 20) t),
           |ab AS (SELECT atop.term, ra, rb FROM atop JOIN btop USING (term)),
           |ds AS (SELECT unnest(range(1, 21)) AS d),
           |xd AS (SELECT ds.d AS d, count(ab.term) AS x
           |  FROM ds LEFT JOIN ab ON ab.ra <= ds.d AND ab.rb <= ds.d GROUP BY ds.d),
           |c AS (SELECT d, CAST(round((CASE d $wCase END) * x / d, 12)
           |    AS DECIMAL(16,12)) AS contrib FROM xd)
           |SELECT CAST(20 AS BIGINT) AS k,
           |  round(CAST(CAST(sum(contrib) AS DECIMAL(28,12)) AS DOUBLE), 6) AS rbo
           |FROM c""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      def ranked(counts: org.apache.spark.sql.DataFrame, cName: String, rName: String) =
        counts
          .orderBy(col(cName).desc, col("term"))
          .limit(20)
          .withColumn(
            rName,
            row_number().over(
              Window.partitionBy(pmod(col(cName), lit(1))).orderBy(col(cName).desc, col("term"))
            )
          )
          .select(col("term"), col(rName))
      val atop = ranked(tk.groupBy("term").agg(count(lit(1)).as("cnt")), "cnt", "ra")
      val btop = ranked(tk.distinct().groupBy("term").agg(count(lit(1)).as("dfc")), "dfc", "rb")
      val ab = atop.join(btop, "term")
      val ds = s.range(1, 21).toDF("d")
      val xd = ds
        .join(ab, col("ra") <= col("d") && col("rb") <= col("d"), "left")
        .groupBy("d")
        .agg(count(col("term")).as("x"))
      val wExpr = (1 to 20).foldLeft(lit(null).cast("double")) { (acc, dd) =>
        when(col("d") === dd, lit(0.1 * math.pow(0.9, dd - 1))).otherwise(acc)
      }
      xd
        .select(round(wExpr * col("x") / col("d"), 12).cast("decimal(16,12)").as("contrib"))
        .agg(sum("contrib").cast("decimal(28,12)").cast("double").as("_r"))
        .select(lit(20L).as("k"), round(col("_r"), 6).as("rbo"))
    },

    // SymSpell typo restoration end-to-end: md5-deterministic single-char
    // deletions are INJECTED at rate 1/8 (same replay contract as
    // cur_mlm_mask), the vocabulary self-calibrates on a RELATIVE frequency
    // cut (≥ max/4 — scale-invariant where an absolute count flips between
    // sfs), and each OOV form meets its source word on a deletion-variant
    // EQUI-join — SymSpell's blocking, never an all-pairs edit-distance
    // scan. See operators/SymSpell.scala for the scale shape.
    QEntry.sql(
      "txt_symspell_restore", {
        val key = "CAST(doc_id AS VARCHAR) || ':' || CAST(u.s.p AS VARCHAR) || ':' || u.s.tk"
        val hashpos =
          s"""CAST(list_sum(list_transform(range(1, 9), i ->
             |  (strpos('0123456789abcdef', substr(md5($key), CAST(i AS INT), 1)) - 1)
             |  * pow(16, 8 - i))) AS DOUBLE) / 4294967296.0""".stripMargin
        val delval =
          s"""CAST(list_sum(list_transform(range(9, 17), i ->
             |  (strpos('0123456789abcdef', substr(md5($key), CAST(i AS INT), 1)) - 1)
             |  * pow(16, 16 - i))) AS BIGINT)""".stripMargin
        s"""WITH toks AS (
           |  SELECT doc_id, u.s.p AS p, u.s.tk AS tok,
           |    ($hashpos) < 0.125 AS corrupt,
           |    1 + ($delval) % length(u.s.tk) AS delpos
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
           |        FROM documents) w,
           |    unnest(list_transform(range(1, len(words) + 1),
           |      i -> struct_pack(p := i, tk := words[i]))) AS u(s)
           |  WHERE length(u.s.tk) >= 4),
           |stream AS (SELECT CASE WHEN corrupt
           |    THEN substr(tok, 1, CAST(delpos - 1 AS INT)) || substr(tok, CAST(delpos + 1 AS INT))
           |    ELSE tok END AS tok FROM toks),
           |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM stream GROUP BY tok),
           |mx AS (SELECT CAST(max(freq) AS BIGINT) AS m FROM cnt),
           |vocab AS (SELECT tok, freq FROM cnt CROSS JOIN mx WHERE freq >= m // 4),
           |oov AS (SELECT tok, freq FROM cnt CROSS JOIN mx WHERE freq < m // 4),
           |vr AS (SELECT v.tok AS good, v.freq AS good_freq, u.x AS variant
           |  FROM vocab v, unnest(list_transform(range(1, CAST(length(v.tok) AS INT) + 1),
           |    i -> substr(v.tok, 1, i - 1) || substr(v.tok, i + 1))) AS u(x)),
           |cand AS (SELECT o.tok AS bad_tok, o.freq AS n_occ, vr.good, vr.good_freq,
           |    row_number() OVER (PARTITION BY o.tok
           |      ORDER BY vr.good_freq DESC, vr.good) AS rk
           |  FROM oov o JOIN vr ON o.tok = vr.variant)
           |SELECT bad_tok, good AS restored_tok, n_occ, good_freq AS restored_freq
           |FROM cand WHERE rk = 1""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      graft.operators.SymSpell.restoreTypos(documents(s, d), "doc_id", "text")
    },

    // Term burstiness: variance-to-mean ratio of per-document counts over
    // the WHOLE corpus (absent docs contribute c = 0, which vanishes from
    // both sums — so the population VMR needs only the present rows).
    // Sufficient statistics are exact BIGINTs; VMR ships as one UNROUNDED
    // fixed-parenthesization double division. VMR ≈ 1 is Poisson
    // (unbursty); content words exceed it. One (doc, term) partial agg →
    // one term agg; no per-term threshold here because the synthetic
    // vocabulary is bounded — at corpus scale add a support cut to bound
    // the output, same as the collocation entries.
    QEntry.sql(
      "txt_burstiness",
      """WITH tc AS (SELECT d.doc_id, lower(t.tk) AS term,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents d, unnest(string_split_regex(trim(d.text), '\s+')) AS t(tk)
        |  WHERE length(t.tk) >= 4 GROUP BY d.doc_id, lower(t.tk)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |g AS (SELECT term, CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(c * c) AS BIGINT) AS scc FROM tc GROUP BY term)
        |SELECT g.term, g.sc AS total_occ,
        |  CAST(nd.n_docs * g.scc - g.sc * g.sc AS DOUBLE) /
        |    (CAST(nd.n_docs AS DOUBLE) * g.sc) AS vmr
        |FROM g CROSS JOIN nd"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val tc = documents(s, d)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tk"))
        .filter(length(col("tk")) >= 4)
        .groupBy(col("doc_id"), lower(col("tk")).as("term"))
        .agg(count(lit(1)).as("c"))
      val nd = documents(s, d).agg(count(lit(1)).as("n_docs"))
      tc.groupBy("term")
        .agg(sum("c").cast("long").as("sc"), sum(col("c") * col("c")).cast("long").as("scc"))
        .crossJoin(broadcast(nd))
        .select(
          col("term"),
          col("sc").as("total_occ"),
          ((col("n_docs") * col("scc") - col("sc") * col("sc")).cast("double") /
            (col("n_docs").cast("double") * col("sc"))).as("vmr")
        )
    },

    // Vocabulary growth statistics per source: token count, type count,
    // hapax legomena, and type-token ratio in exact ppm — the Heaps'-law
    // inputs a corpus-health dashboard tracks (a source whose TTR
    // collapses is templated/duplicated text). One (source, term) partial
    // agg then a source rollup; all exact BIGINTs.
    QEntry.sql(
      "txt_heaps_ttr",
      """WITH tok AS (SELECT d.source, lower(t.tk) AS tk
        |  FROM documents d, unnest(string_split_regex(trim(d.text), '\s+')) AS t(tk)
        |  WHERE length(t.tk) >= 1),
        |tc AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY source, tk)
        |SELECT source, CAST(sum(c) AS BIGINT) AS tokens,
        |  CAST(count(*) AS BIGINT) AS types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm
        |FROM tc GROUP BY source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tk"))
        .filter(length(col("tk")) >= 1)
        .groupBy(col("source"), lower(col("tk")).as("term"))
        .agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(
          sum("c").cast("long").as("tokens"),
          count(lit(1)).as("types"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).cast("long").as("hapax"),
          expr("count(*) * 1000000L div sum(c)").cast("long").as("ttr_ppm")
        )
    },

    // Per-source KL divergence from the corpus unigram distribution —
    // D(P_src ‖ P_corpus) in nats, the one-number "how far does this
    // source's vocabulary drift from the blend" monitor (the directed
    // relative of cur_mixture_hhi's concentration). Every source term
    // also appears in the corpus, so q > 0 wherever p > 0 and no
    // smoothing is needed. Term probabilities are exact BIGINT ratios;
    // each p·ln(p/q) term is a libm output, so it takes the q_psi_drift
    // ladder: quantize to 12 dp, sum as DECIMAL (order-free), round 6.
    // One (source, term) partial agg + a broadcast corpus side.
    QEntry.sql(
      "txt_kl_sources",
      """WITH tok AS (SELECT d.source, lower(t.tk) AS tk
        |  FROM documents d, unnest(string_split_regex(trim(d.text), '\s+')) AS t(tk)
        |  WHERE length(t.tk) >= 1),
        |sc AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY source, tk),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sc GROUP BY source),
        |gc AS (SELECT tk, CAST(sum(c) AS BIGINT) AS g FROM sc GROUP BY tk),
        |gt AS (SELECT CAST(sum(g) AS BIGINT) AS ng FROM gc),
        |terms AS (SELECT sc.source,
        |    CAST(round((CAST(sc.c AS DOUBLE) / st.ns)
        |      * ln((CAST(sc.c AS DOUBLE) / st.ns) / (CAST(gc.g AS DOUBLE) / gt.ng)),
        |      12) AS DECIMAL(16,12)) AS term
        |  FROM sc JOIN st USING (source) JOIN gc USING (tk) CROSS JOIN gt)
        |SELECT source, round(CAST(CAST(sum(term) AS DECIMAL(20,12)) AS DOUBLE), 6)
        |    AS kl_nats
        |FROM terms GROUP BY source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val sc = documents(s, d)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tk"))
        .filter(length(col("tk")) >= 1)
        .groupBy(col("source"), lower(col("tk")).as("tk"))
        .agg(count(lit(1)).as("c"))
      val st = sc.groupBy("source").agg(sum("c").cast("long").as("ns"))
      val gc = sc.groupBy("tk").agg(sum("c").cast("long").as("g"))
      val gt = gc.agg(sum("g").cast("long").as("ng"))
      val p = col("c").cast("double") / col("ns")
      val q = col("g").cast("double") / col("ng")
      sc.join(broadcast(st), "source")
        .join(broadcast(gc), "tk")
        .crossJoin(broadcast(gt))
        .select(
          col("source"),
          round(p * log(p / q), 12).cast("decimal(16,12)").as("term")
        )
        .groupBy("source")
        .agg(round(sum("term").cast("decimal(20,12)").cast("double"), 6).as("kl_nats"))
    },

    // Flesch-style readability per source, in EXACT milli-points: flesch =
    // 206.835 − 1.015·(words/sentences) − 84.6·(vowelgroups/words), held
    // as 206835 − 1015·W div S − 84600·V div W — two truncating integral
    // divisions (a DEFINED fixed-point, not float drift). Sentences are
    // non-empty [.!?]+ splits, syllables the vowel-group proxy both
    // engines count identically via regex. The corpus-quality score a
    // readability filter thresholds on. One token explode + partial agg.
    QEntry.sql(
      "txt_readability",
      """WITH d AS (SELECT source,
        |    CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
        |      x -> trim(x) <> '')) AS BIGINT) AS sents, text FROM documents),
        |w AS (SELECT d.source, lower(t.tk) AS tk
        |  FROM d, unnest(string_split_regex(trim(d.text), '\s+')) AS t(tk)
        |  WHERE length(t.tk) >= 1),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS wrds,
        |    CAST(sum(CAST(len(regexp_extract_all(tk, '[aeiou]+')) AS BIGINT))
        |      AS BIGINT) AS vgs
        |  FROM w GROUP BY source),
        |sct AS (SELECT source, CAST(sum(sents) AS BIGINT) AS sents
        |  FROM d GROUP BY source)
        |SELECT a.source, sct.sents, a.wrds AS words, a.vgs AS vowel_groups,
        |  206835 - CAST(1015 * a.wrds // sct.sents AS BIGINT)
        |    - CAST(84600 * a.vgs // a.wrds AS BIGINT) AS flesch_milli
        |FROM a JOIN sct ON a.source = sct.source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d).select(
        col("source"),
        expr("size(filter(split(text, '[.!?]+'), x -> trim(x) != ''))")
          .cast("long")
          .as("sents"),
        col("text")
      )
      val w = docs
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tk"))
        .filter(length(col("tk")) >= 1)
        .select(col("source"), lower(col("tk")).as("tk"))
      val a = w
        .groupBy("source")
        .agg(
          count(lit(1)).as("wrds"),
          sum(expr("regexp_count(tk, '[aeiou]+')")).cast("long").as("vgs")
        )
      val sct = docs.groupBy("source").agg(sum("sents").cast("long").as("sents"))
      a.join(sct, "source")
        .select(
          col("source"),
          col("sents"),
          col("wrds").as("words"),
          col("vgs").as("vowel_groups"),
          (lit(206835L) - expr("1015 * wrds div sents") - expr("84600 * vgs div wrds"))
            .cast("long")
            .as("flesch_milli")
        )
    },

    // Signed hashing-trick features ([[graft.operators.TermStats.featureHash]]):
    // token → bucket h mod 64 with a ±1 sign from an independent md5 digit,
    // per-doc signed count sums — the sparse representation linear models
    // train on over an unbounded vocabulary. Exact BIGINT sums; one keyed
    // hash-agg with map-side combine, ≤ 64 rows per doc regardless of length.
    QEntry.sql(
      "txt_feature_hash",
      """SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
        |  CAST(sum(CASE WHEN sv % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS feat
        |FROM (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS hv,
        |    CAST(('0x' || substr(md5(term), 9, 1)) AS BIGINT) AS sv
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |        FROM documents) t
        |  WHERE term IS NOT NULL AND term <> '') h
        |GROUP BY doc_id, bucket""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => graft.operators.TermStats.featureHash(documents(s, d), "doc_id", "text", 64) },

    // Dictionary coverage per source ([[graft.operators.TermStats
    // .dictionaryCoverage]]): share of tokens covered by the corpus top-1000
    // vocabulary, OOV rate as exact ppm. Vocab ranking ties break on the
    // term, so the set is deterministic; membership joins via BROADCAST
    // (vocab is 1000 rows by construction).
    QEntry.sql(
      "txt_dict_coverage",
      """WITH tk AS (SELECT source, term FROM (
        |    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents) t
        |  WHERE term IS NOT NULL AND term <> ''),
        |vocab AS (SELECT term FROM (
        |    SELECT term, count(*) AS cnt FROM tk GROUP BY term) g
        |  ORDER BY cnt DESC, term LIMIT 1000),
        |c AS (SELECT tk.source, CAST(count(*) AS BIGINT) AS tokens,
        |    CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_vocab
        |  FROM tk LEFT JOIN vocab v ON tk.term = v.term GROUP BY tk.source)
        |SELECT source, tokens, in_vocab,
        |  CAST((tokens - in_vocab) * 1000000 // tokens AS BIGINT) AS oov_ppm
        |FROM c""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      graft.operators.TermStats.dictionaryCoverage(documents(s, d), "text", "source", 1000)
    },

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    // stopword/punctuation-delimited runs; a word scores degree/frequency
    // (degree = Σ phrase-length over its instance occurrences) and a phrase
    // scores the sum over its words — computed as exact per-word integral
    // ppm divisions, summed exactly, so ranking is engine-stable. The
    // stopword delimiting is TWO regexp passes (RE2 has no lookahead;
    // consecutive stopwords leave a leftover the second pass catches —
    // both engines run the identical normalization, which is the contract
    // that matters). Corpus top-20 phrase types by score, ties on the
    // phrase. All stages are explode → partial-agg → broadcast-join shapes.
    QEntry.sql(
      "txt_rake_keywords", {
        val sw = Stopwords.mkString("|")
        val norm =
          s"""regexp_replace(regexp_replace(regexp_replace(
             |  ' ' || text || ' ', '[.,;:!?]+', ' | ', 'g'),
             |  '\\s($sw)\\s', ' | ', 'g'), '\\s($sw)\\s', ' | ', 'g')"""
        s"""WITH ph AS (SELECT trim(p) AS phrase FROM (
           |    SELECT unnest(string_split($norm, '|')) AS p FROM documents) t
           |  WHERE trim(p) <> ''),
           |inst AS (SELECT phrase, string_split_regex(phrase, '\\s+') AS ws FROM ph
           |  WHERE len(string_split_regex(phrase, '\\s+')) <= 4),
           |iw AS (SELECT unnest(ws) AS w, len(ws) AS plen FROM inst),
           |stats AS (SELECT w, CAST(count(*) AS BIGINT) AS f,
           |    CAST(sum(plen) AS BIGINT) AS deg FROM iw GROUP BY w),
           |types AS (SELECT phrase, CAST(count(*) AS BIGINT) AS occurrences FROM inst
           |  GROUP BY phrase),
           |tw AS (SELECT t.phrase, t.occurrences, u.w,
           |    CAST(len(string_split_regex(t.phrase, '\\s+')) AS BIGINT) AS n_words
           |  FROM types t, unnest(string_split_regex(t.phrase, '\\s+')) AS u(w))
           |SELECT tw.phrase, max(tw.n_words) AS n_words, max(tw.occurrences) AS occurrences,
           |  CAST(sum(s.deg * 1000000 // s.f) AS BIGINT) AS score_ppm
           |FROM tw JOIN stats s ON tw.w = s.w
           |GROUP BY tw.phrase
           |ORDER BY score_ppm DESC, tw.phrase LIMIT 20"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val sw = Stopwords.mkString("|")
      val norm = regexp_replace(
        regexp_replace(
          regexp_replace(concat(lit(" "), col("text"), lit(" ")), "[.,;:!?]+", " | "),
          s"\\s($sw)\\s",
          " | "
        ),
        s"\\s($sw)\\s",
        " | "
      )
      val ph = documents(s, d)
        .select(explode(split(norm, "\\|")).as("p"))
        .select(trim(col("p")).as("phrase"))
        .filter(col("phrase") =!= "")
      val inst = ph
        .withColumn("ws", split(col("phrase"), "\\s+"))
        .filter(size(col("ws")) <= 4)
        .localCheckpoint() // word stats and type counts both consume it
      val stats = inst
        .select(explode(col("ws")).as("w"), size(col("ws")).cast("long").as("plen"))
        .groupBy("w")
        .agg(count(lit(1)).as("f"), sum("plen").cast("long").as("deg"))
      val types = inst.groupBy("phrase").agg(count(lit(1)).as("occurrences"))
      val tw = types
        .select(
          col("phrase"),
          col("occurrences"),
          size(split(col("phrase"), "\\s+")).cast("long").as("n_words"),
          explode(split(col("phrase"), "\\s+")).as("w")
        )
      tw.join(stats, "w")
        .groupBy("phrase")
        .agg(
          max("n_words").as("n_words"),
          max("occurrences").as("occurrences"),
          sum(expr("deg * 1000000 div f")).cast("long").as("score_ppm")
        )
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(20)
    },

    // Simpson lexical-diversity index per source: D = Σ fᵢ(fᵢ−1) / (N(N−1))
    // — the probability two random tokens coincide, the repetition-diversity
    // complement of txt_heaps_ttr's vocabulary-growth curve. An EXACT
    // rational of token-frequency sums reported in ppm (one integral
    // division); source-keyed partial aggs over (source, token) state, no
    // windows, no float.
    QEntry.sql(
      "txt_simpson_diversity",
      s"""WITH tok AS (SELECT source, unnest($wordsSql) AS w
         |  FROM (SELECT source, text FROM documents) t),
         |f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS f
         |  FROM tok GROUP BY source, w)
         |SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(f * (f - 1)) * 1000000 // (sum(f) * (sum(f) - 1)) AS BIGINT)
         |    AS simpson_ppm
         |FROM f GROUP BY source""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .groupBy("source", "w")
        .agg(count(lit(1)).as("f"))
        .groupBy("source")
        .agg(
          sum(col("f")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_types"),
          expr("sum(f * (f - 1)) * 1000000L div (sum(f) * (sum(f) - 1L))")
            .cast("long").as("simpson_ppm")
        )
    },

    // E110 BPE merge LEARNING, oracled: the Sennrich loop's merge table for
    // 6 iterations, hash-matched against a DuckDB twin that replays the
    // identical algorithm — words as chr(31)-delimited symbol strings
    // ('␟t1␟␟t2␟…', every token delimited on BOTH sides so a merge pattern
    // can never match a token suffix), pair counts via list windows, argmax
    // by (count DESC, left, right), and the left-to-right non-overlapping
    // merge as a single string replace() (scan resumes AFTER each
    // replacement — exactly the carry-fold's semantics). Six unrolled CTE
    // iterations; one row per learned merge.
    QEntry.sql("txt_bpe_merges", bpeMergeOracleSql(6)) { (s, d) =>
      graft.operators.BpeTrain
        .learnMerges(documents(s, d), "text", nMerges = 6)
        .select(
          col("rank").cast("long").as("rank"),
          col("left"), col("right"), col("merged"),
          col("pair_count").cast("long").as("pair_count")
        )
    },

    // E409 DELTA-STATE BPE training, oracled against the SAME DuckDB replay
    // as txt_bpe_merges: the trigram aggregate initializes once and then
    // evolves by retracting exactly the touched words' old contributions and
    // adding their post-merge ones — per-round analysis input shrinks from
    // O(vocab trigrams) to O(touched trigrams), the production shape for
    // 30k–100k-merge runs. The oracle replays the SEQUENTIAL argmax, so a
    // delta scheduler that dropped a retraction, double-counted an
    // insertion, or rebuilt the collision vocabulary wrong hash-mismatches
    // on the merge table itself — the strongest equivalence the driver can
    // check.
    QEntry.sql("txt_bpe_merges_delta", bpeMergeOracleSql(6)) { (s, d) =>
      graft.operators.BpeTrain
        .learnMerges(documents(s, d), "text", nMerges = 6, deltaState = true)
        .select(
          col("rank").cast("long").as("rank"),
          col("left"), col("right"), col("merged"),
          col("pair_count").cast("long").as("pair_count")
        )
    },

    // E404 BPE ENCODE at production shape: learn 6 merges, then segment
    // every distinct word through the imperative per-partition encoder
    // ([[graft.operators.BpeTrain.bpeEncodeWords]] — the scalable sibling
    // of the Column-HOF replay, whose expression depth caps at tens of
    // merges). The oracle extends the unrolled merge-replay CTEs to CARRY
    // the word identity through each replace() pass and reads the final
    // segmentation per word, so an encoder that merged out of rank order,
    // double-merged an overlap, or resurrected a dead lower-rank pair
    // hash-mismatches.
    QEntry.sql("txt_bpe_encode", bpeEncodeOracleSql(6)) { (s, d) =>
      val docs = documents(s, d)
      val merges = graft.operators.BpeTrain
        .learnMerges(docs, "text", nMerges = 6)
        .orderBy("rank")
        .collect()
        .map(r => (r.getString(1), r.getString(2)))
        .toSeq
      graft.operators.BpeTrain
        .bpeEncodeWords(docs, "text", merges)
        .select(col("word"), concat_ws(" ", col("bpe")).as("bpe"))
    },

    // E421 phrase gazetteer tagging ([[TextAnalysis.phraseTag]]): the
    // blocklist/entity/PII-phrase screen — every occurrence of every
    // gazetteer phrase located by FIRST-TOKEN BLOCKING (broadcast equi-join
    // on the first token) + sliced array-equality verification, the
    // Aho-Corasick workload as one join instead of a per-row automaton.
    // The gazetteer derives deterministically from the corpus itself (top-8
    // bigrams + top-4 trigrams by (count DESC, phrase ASC) — the deployment
    // shape: a driver-side curated list, broadcast). The twin recounts
    // every n-gram instance against the same cut, so a tagger that missed
    // an overlap, matched across a doc boundary, or double-counted a
    // position hash-mismatches.
    QEntry.sql(
      "txt_phrase_tag",
      s"""WITH tk AS MATERIALIZED (SELECT doc_id, $wordsSql AS toks FROM documents),
         |big AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS phrase
         |  FROM tk),
         |trig AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |    i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] || ' '
         |      || toks[CAST(i + 2 AS INT)])) AS phrase
         |  FROM tk),
         |bg AS MATERIALIZED (SELECT phrase, count(*) AS cnt FROM big
         |  GROUP BY phrase ORDER BY cnt DESC, phrase LIMIT 8),
         |tg AS MATERIALIZED (SELECT phrase, count(*) AS cnt FROM trig
         |  GROUP BY phrase ORDER BY cnt DESC, phrase LIMIT 4),
         |occ AS (SELECT b.doc_id, b.phrase FROM big b JOIN bg USING (phrase)
         |  UNION ALL SELECT t.doc_id, t.phrase FROM trig t JOIN tg USING (phrase))
         |SELECT phrase, CAST(count(*) AS BIGINT) AS n_matches,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM occ GROUP BY phrase""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      def topGrams(n: Int, top: Int): Seq[String] = toks
        .filter(size(col("toks")) >= n)
        .select(explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"
        )).as("phrase"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("phrase"))
        .limit(top)
        .collect()
        .map(_.getString(0))
        .toSeq
      val gazetteer = (topGrams(2, 8) ++ topGrams(3, 4)).map(_.split(" ").toSeq)
      graft.functions.TextAnalysis
        .phraseTag(docs, "doc_id", "text", gazetteer)
        .groupBy("phrase")
        .agg(
          count(lit(1)).cast("long").as("n_matches"),
          countDistinct(col("doc_id")).cast("long").as("n_docs")
        )
    },

    // E413 unigram-LM tokenizer ([[graft.operators.UnigramLm]]) — the
    // SentencePiece-family sibling of BPE: candidate pieces = frequency-
    // weighted substring counts (all single chars kept for coverage, top-48
    // multi-char by (count DESC, piece ASC)); costs = INTEGER micro-nats
    // round(ln(total/cnt)·10⁶); each word Viterbi-segments under exact
    // min-plus integer DP with ties broken on the lexicographically smaller
    // chr(31)-joined path; output = the hard-EM M-step usage counts. The
    // twin replays the ENTIRE pipeline — candidate cut, cost quantization,
    // and the DP unrolled position-for-position (12 CTEs, edges joined per
    // predecessor) — so a segmenter that broke a tie the other way, let a
    // dropped candidate win, or mis-quantized one cost hash-mismatches.
    // Both sides segment the ≤12-char vocabulary slice (the oracle's unroll
    // depth; the operator itself has no length cap).
    QEntry.sql("txt_unigram_pieces", unigramOracleSql(12, 4, 48)) { (s, d) =>
      val words = graft.operators.UnigramLm
        .wordFreqs(documents(s, d), "text")
        .filter(length(col("word")) <= 12)
      val pieces = graft.operators.UnigramLm.candidatePieces(words, 4, 48)
      val seg = graft.operators.UnigramLm.viterbiSegment(words, pieces, 4)
      graft.operators.UnigramLm
        .emRecount(seg)
        .select(col("piece"), col("n_uses"))
    },

    // E433 CCNet-style perplexity terciles (Wenzek et al. 2020: per
    // LANGUAGE, rank documents by LM perplexity and cut the corpus into
    // head/middle/tail thirds — the quality stratification the CCNet
    // pipeline samples from, always per-lang because perplexity is not
    // comparable across languages): ranks are exact row_numbers over
    // (entropy, doc_id) inside each lang partition, bucket = (rank−1)·3
    // div n — exact thirds, no ntile ambiguity; per-bucket doc/bigram
    // census plus the mean entropy through the DECIMAL-sum ladder. Docs
    // under 2 tokens have no bigram perplexity and are excluded (the
    // unrankable tail, documented). One keyed window per lang; nothing
    // global.
    QEntry.sql(
      "txt_ccnet_buckets",
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
         |perdoc AS (SELECT s.doc_id, count(*) AS n_bigrams,
         |    round(CAST(CAST(sum(bits) AS DECIMAL(28,9)) AS DOUBLE) / count(*), 6)
         |      AS ent
         |  FROM bstream s JOIN ratio ON s.prev = ratio.prev AND s.cur = ratio.cur
         |  GROUP BY s.doc_id),
         |rk AS (SELECT d.lang, p.doc_id, p.n_bigrams, p.ent,
         |    row_number() OVER (PARTITION BY d.lang ORDER BY p.ent, p.doc_id) AS r,
         |    count(*) OVER (PARTITION BY d.lang) AS nl
         |  FROM perdoc p JOIN documents d USING (doc_id))
         |SELECT lang, CAST((r - 1) * 3 // nl AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         |  round(CAST(CAST(sum(CAST(ent AS DECIMAL(18,6))) AS DECIMAL(28,6))
         |    AS DOUBLE) / count(*), 6) AS avg_entropy
         |FROM rk GROUP BY lang, bucket""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ent = graft.operators.TermStats
        .bigramCrossEntropy(documents(s, d), "doc_id", "text", 0.75)
      val wRank = Window.partitionBy("lang").orderBy(col("bigram_entropy"), col("doc_id"))
      val wAll = Window.partitionBy("lang")
      ent
        .join(documents(s, d).select("doc_id", "lang"), "doc_id")
        .withColumn("r", row_number().over(wRank))
        .withColumn("nl", count(lit(1)).over(wAll))
        .withColumn("bucket", expr("(r - 1) * 3 div nl").cast("long"))
        .groupBy("lang", "bucket")
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum("n_bigrams").cast("long").as("n_bigrams"),
          round(
            sum(col("bigram_entropy").cast("decimal(18,6)"))
              .cast("decimal(28,6)").cast("double") / count(lit(1)),
            6
          ).as("avg_entropy")
        )
    }
  )

  /** DuckDB replay of the [[graft.operators.UnigramLm]] pipeline: word
    * frequencies (≤ `maxWordLen` chars), substring candidates with the
    * single-char/top-N split, micro-nat cost quantization, then the Viterbi
    * DP unrolled to `maxWordLen` position CTEs — each position takes the
    * row_number()-argmin over (cost, seg) of its ≤ `maxPieceLen`
    * predecessors — and the M-step usage recount.
    */
  private def unigramOracleSql(maxWordLen: Int, maxPieceLen: Int, topN: Int): String = {
    val S = "chr(31)"
    val dps = (1 to maxWordLen).map { k =>
      val arms = (math.max(0, k - maxPieceLen) until k).map { j =>
        s"""SELECT e.word, d.cost + e.cost AS cost, d.seg || $S || e.piece AS seg
           |      FROM ed e JOIN dp$j d ON e.word = d.word AND e.j = $j
           |      WHERE e.i = $k"""
      }.mkString("\n|      UNION ALL\n|      ")
      s""",
         |dp$k AS MATERIALIZED (SELECT word, cost, seg FROM (
         |    SELECT word, cost, seg,
         |      row_number() OVER (PARTITION BY word ORDER BY cost, seg) AS rn
         |    FROM ($arms) c) r
         |  WHERE rn = 1)"""
    }.mkString
    val fins = (1 to maxWordLen).map { k =>
      s"""SELECT wf.word, wf.freq, d.seg FROM wf
         |    JOIN dp$k d ON wf.word = d.word AND length(wf.word) = $k"""
    }.mkString("\n|  UNION ALL\n|  ")
    // wf / ed MATERIALIZED: DuckDB inlines CTEs by default, and the DP's
    // unrolled positions reference them dozens of times — inlined, every
    // reference re-opens the parquet scan (observed as an fd-exhaustion
    // error at 12 positions × ≤4 predecessor arms)
    s"""WITH wf AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($wordsSql) AS w FROM documents) t
       |  WHERE w <> '' AND length(w) <= $maxWordLen GROUP BY w),
       |sub AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(flatten(list_transform(range(1, length(word) + 1), i ->
       |      list_transform(range(i, least(length(word), i + ${maxPieceLen - 1}) + 1), j ->
       |        substr(word, CAST(i AS INT), CAST(j - i + 1 AS INT)))))) AS piece
       |    FROM wf) s GROUP BY piece),
       |multi AS (SELECT piece, cnt FROM sub WHERE length(piece) >= 2
       |  ORDER BY cnt DESC, piece LIMIT $topN),
       |p0 AS (SELECT piece, cnt FROM sub WHERE length(piece) = 1
       |  UNION ALL SELECT piece, cnt FROM multi),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p0),
       |pieces AS (SELECT piece,
       |    CAST(round(ln(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000.0, 0)
       |      AS BIGINT) AS cost
       |  FROM p0 CROSS JOIN tot),
       |ed AS MATERIALIZED (SELECT word, e.j AS j, e.i AS i, e.piece AS piece, p.cost
       |  FROM (SELECT word, unnest(flatten(list_transform(range(0, length(word)), j ->
       |      list_transform(range(j + 1, least(length(word), j + $maxPieceLen) + 1), i ->
       |        struct_pack(j := j, i := i,
       |          piece := substr(word, CAST(j + 1 AS INT), CAST(i - j AS INT))))))) AS e
       |    FROM wf) u
       |  JOIN pieces p ON e.piece = p.piece),
       |dp0 AS (SELECT word, CAST(0 AS BIGINT) AS cost, '' AS seg FROM wf)$dps,
       |fin AS ($fins),
       |used AS (SELECT freq, unnest(string_split(substr(seg, 2), $S)) AS piece FROM fin)
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses FROM used GROUP BY piece"""
      .stripMargin.replaceAll("\\s+", " ")
  }

  /** DuckDB replay of [[graft.operators.BpeTrain.learnMerges]], unrolled to
    * `n` iterations. Symbol sequences are strings of chr(31)-delimited
    * tokens; see the txt_bpe_merges comment for why replace() is exactly
    * the carry-fold.
    */
  /** DuckDB replay of [[graft.operators.BpeTrain.bpeEncodeWords]] after
    * learning `n` merges: the same unrolled argmax/replace chain as
    * [[bpeMergeOracleSql]], but the word-table CTEs CARRY the word string
    * so the final CTE reads each word's segmentation (chr(31) delimiters
    * translated back to spaces).
    */
  private def bpeEncodeOracleSql(n: Int): String = {
    val S = "chr(31)"
    val SS = "chr(31) || chr(31)"
    val head =
      s"""WITH toks AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) t
         |  WHERE w <> '' GROUP BY w),
         |w0 AS (SELECT w, $S || array_to_string(
         |    list_append(string_split(w, ''), '</w>'), $SS) || $S AS seq, freq FROM toks)"""
    val iters = (1 to n).map { i =>
      s""",
         |p$i AS (SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(tl)), j ->
         |        struct_pack(l := tl[CAST(j AS INT)], r := tl[CAST(j + 1 AS INT)]))) AS p,
         |      freq
         |    FROM (SELECT string_split(substr(seq, 2, length(seq) - 2), $SS) AS tl, freq
         |          FROM w${i - 1}) s) q
         |  GROUP BY 1, 2 HAVING cnt >= 2),
         |b$i AS (SELECT l, r FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS (SELECT w, replace(seq, $S || b.l || $SS || b.r || $S,
         |    $S || b.l || b.r || $S) AS seq, freq
         |  FROM w${i - 1} CROSS JOIN b$i b)"""
    }
    val tail =
      s"""
         |SELECT w AS word,
         |  replace(substr(seq, 2, length(seq) - 2), $SS, ' ') AS bpe
         |FROM w$n"""
    (head + iters.mkString + tail).stripMargin.replaceAll("\\s+", " ")
  }

  private def bpeMergeOracleSql(n: Int): String = {
    val S = "chr(31)"
    val SS = "chr(31) || chr(31)"
    val head =
      s"""WITH toks AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) t
         |  WHERE w <> '' GROUP BY w),
         |w0 AS (SELECT $S || array_to_string(
         |    list_append(string_split(w, ''), '</w>'), $SS) || $S AS seq, freq FROM toks)"""
    val iters = (1 to n).map { i =>
      s""",
         |p$i AS (SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(tl)), j ->
         |        struct_pack(l := tl[CAST(j AS INT)], r := tl[CAST(j + 1 AS INT)]))) AS p,
         |      freq
         |    FROM (SELECT string_split(substr(seq, 2, length(seq) - 2), $SS) AS tl, freq
         |          FROM w${i - 1}) s) q
         |  GROUP BY 1, 2 HAVING cnt >= 2),
         |b$i AS (SELECT CAST(${i - 1} AS BIGINT) AS rank, l, r, l || r AS merged,
         |    cnt AS pair_count
         |  FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS (SELECT replace(seq, $S || b.l || $SS || b.r || $S,
         |    $S || b.l || b.r || $S) AS seq, freq
         |  FROM w${i - 1} CROSS JOIN b$i b)"""
    }
    val union = (1 to n)
      .map(i => s"""SELECT rank, l AS "left", r AS "right", merged, pair_count FROM b$i""")
      .mkString(" UNION ALL ")
    (head + iters.mkString + "\n" + union)
      .stripMargin.replaceAll("\\s+", " ")
  }
}
