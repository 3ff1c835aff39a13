package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.Retrieval

/** Retrieval-layer inventory over `documents`: BM25 ranking, inverted-index
  * construction, chi-square keyness. Spark implementations in
  * [[graft.operators.Retrieval]]; each oracle replays the identical
  * arithmetic in DuckDB (identical parenthesization — see the determinism
  * notes on [[QEntry]] and the χ²-over-LLR rationale in the operator doc).
  */
object RetrievalQueries {

  private val wordsSql = """string_split_regex(trim(text), '\s+')"""

  val entries: Seq[QEntry] = Seq(
    // Okapi BM25 top-5 docs per query term (ratio idf variant — no ln, so
    // scores and the top-k cut are bit-deterministic across engines).
    QEntry.sql(
      "txt_bm25_topdocs",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
         |SELECT term, doc_id, tf, dl, round(score, 4) AS bm25, rank
         |FROM (SELECT scored.*, CAST(row_number() OVER
         |        (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM scored) t
         |WHERE rank <= 5""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.bm25TopDocs(
        documents(s, d),
        "doc_id",
        "text",
        Seq("spark", "join", "vector", "stream"),
        k = 5
      )
    },

    // E348 pseudo-relevance-feedback expansion
    // ([[Retrieval.prfExpandedTopDocs]]): BM25 top-10 for 'spark' → the 5
    // terms most characteristic of those docs (df-in-R, then tf, then term)
    // → rescore the corpus on the 6-term expanded query, per-doc totals on
    // the 9-dp DECIMAL ladder (float term-sum order would break ranking).
    // The twin replays all three stages with the dynamic term set via IN
    // (SELECT …).
    QEntry.sql(
      "txt_prf_expansion",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf0 AS (SELECT doc_id, count(*) AS tf FROM toks
         |        WHERE term = 'spark' GROUP BY doc_id),
         |df0 AS (SELECT count(*) AS df FROM tf0),
         |rel AS (SELECT doc_id FROM (
         |  SELECT tf0.doc_id,
         |    row_number() OVER (ORDER BY
         |      (((s.n_docs - df0.df) + 0.5) / (df0.df + 0.5) + 1.0)
         |      * ((tf0.tf * (1.2 + 1.0)) / (tf0.tf + (1.2 * ((1.0 - 0.75)
         |         + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) DESC,
         |      tf0.doc_id) AS rk
         |  FROM tf0 CROSS JOIN df0 JOIN dl USING (doc_id) CROSS JOIN stats s) t
         |  WHERE rk <= 10),
         |fb AS (SELECT term FROM (
         |  SELECT term, count(DISTINCT t.doc_id) AS df_r, count(*) AS tf_r
         |  FROM toks t JOIN rel USING (doc_id)
         |  WHERE term <> 'spark' AND length(term) >= 3
         |  GROUP BY term ORDER BY df_r DESC, tf_r DESC, term LIMIT 5) f),
         |exp AS (SELECT term FROM fb UNION ALL SELECT 'spark'),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM exp) GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.doc_id,
         |    CAST(round((((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))), 9)
         |      AS DECIMAL(18,9)) AS sc
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(sc) AS DECIMAL(28,9)) AS tot FROM scored GROUP BY doc_id)
         |SELECT doc_id, n_terms, round(CAST(tot AS DOUBLE), 6) AS bm25_total
         |FROM agg ORDER BY tot DESC, doc_id LIMIT 10"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.prfExpandedTopDocs(documents(s, d), "doc_id", "text", "spark")
    },

    // E326 nDCG@10 of the BM25 ranking against tf-graded relevance
    // ([[Retrieval.ndcgAtK]]): the twin replays the BM25 scoring CTE, the
    // rank-10 cut, the discount ladder and the ideal (tf-sorted) ordering
    // — dcg/idcg/ndcg match value-for-value per query term. BM25 ranks by
    // saturated-tf·idf, the gain is RAW tf, so nDCG < 1 exactly where
    // length normalization reorders docs — the metric measures something
    // real here, not a tautology.
    QEntry.sql(
      "txt_ndcg_eval",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id, tf.tf,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
         |rk AS (SELECT term, doc_id, tf, row_number() OVER
         |    (PARTITION BY term ORDER BY score DESC, doc_id) AS rank FROM scored),
         |dcg AS (SELECT term, CAST(sum(CAST(round(CAST(tf AS DOUBLE)
         |      / log2(CAST(rank AS DOUBLE) + 1.0), 9) AS DECIMAL(18,9)))
         |      AS DECIMAL(28,9)) AS dcg
         |  FROM rk WHERE rank <= 10 GROUP BY term),
         |ir AS (SELECT term, tf, row_number() OVER
         |    (PARTITION BY term ORDER BY tf DESC, doc_id) AS irank FROM tf),
         |idcg AS (SELECT term, CAST(sum(CAST(round(CAST(tf AS DOUBLE)
         |      / log2(CAST(irank AS DOUBLE) + 1.0), 9) AS DECIMAL(18,9)))
         |      AS DECIMAL(28,9)) AS idcg
         |  FROM ir WHERE irank <= 10 GROUP BY term)
         |SELECT dcg.term, round(CAST(dcg.dcg AS DOUBLE), 6) AS dcg,
         |  round(CAST(idcg.idcg AS DOUBLE), 6) AS idcg,
         |  round(CAST(dcg.dcg AS DOUBLE) / CAST(idcg.idcg AS DOUBLE), 6) AS ndcg
         |FROM dcg JOIN idcg USING (term)""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val terms = Seq("spark", "join", "vector", "stream")
      val ranked = Retrieval
        .bm25TopDocs(documents(s, d), "doc_id", "text", terms, k = 10)
        .select(col("term"), col("doc_id"), col("rank"))
      val rels = documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).cast("long").as("gain"))
      Retrieval.ndcgAtK(ranked, rels, "term", "doc_id", k = 10)
    },

    // E322 Dirichlet query-likelihood top-20 ([[Retrieval
    // .queryLikelihoodTopDocs]]): the LM-retrieval dual of BM25 in its
    // sparse decomposition — matched postings contribute ln(1+tf·N/(μ·cf)),
    // the length prior |q|·ln(μ/(dl+μ)) is per-doc; all ln terms through
    // the 9-decimal quantize → DECIMAL-sum ladder, the top-20 cut compares
    // exact decimals.
    QEntry.sql(
      "txt_ql_dirichlet",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl
         |  FROM documents),
         |st AS (SELECT CAST(sum(dl) AS BIGINT) AS n FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |qt AS (SELECT doc_id, term FROM toks
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM qt GROUP BY doc_id, term),
         |cfq AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM qt GROUP BY term),
         |b1 AS (SELECT doc_id,
         |    CAST(round(ln(CAST(1 AS DOUBLE)
         |      + CAST(tf.tf * st.n AS DOUBLE) / CAST(2000 * cfq.cf AS DOUBLE)), 9)
         |      AS DECIMAL(18,9)) AS bits
         |  FROM tf JOIN cfq USING (term) CROSS JOIN st),
         |m AS (SELECT doc_id, CAST(sum(bits) AS DECIMAL(28,9)) AS m1,
         |    CAST(count(*) AS BIGINT) AS n_matched FROM b1 GROUP BY doc_id),
         |sc AS (SELECT m.doc_id, m.n_matched, dl.dl,
         |    m.m1 + 4 * CAST(round(ln(CAST(2000 AS DOUBLE)
         |      / CAST(dl.dl + 2000 AS DOUBLE)), 9) AS DECIMAL(18,9)) AS s
         |  FROM m JOIN dl USING (doc_id))
         |SELECT doc_id, n_matched, dl, round(CAST(s AS DOUBLE), 6) AS ql_score
         |FROM sc ORDER BY s DESC, doc_id LIMIT 20"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.queryLikelihoodTopDocs(
        documents(s, d),
        "doc_id",
        "text",
        Seq("spark", "join", "vector", "stream"),
        mu = 2000L,
        k = 20
      )
    },

    // E370 Jelinek-Mercer query likelihood ([[Retrieval
    // .jelinekMercerTopDocs]]): the λ-interpolation member of the classical
    // LM ladder beside Dirichlet — same sparse decomposition (matched
    // postings contribute ln(1 + (λ/(1−λ))·tf·|C|/(cf·dl)), the
    // doc-constant query mass Σ ln((1−λ)cf/|C|) attaches as one broadcast
    // scalar), λ = 0.5 so the odds ratio is exactly 1; 9-decimal quantize →
    // DECIMAL sums, top-20 compares exact decimals.
    QEntry.sql(
      "txt_ql_jm",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl
         |  FROM documents),
         |st AS (SELECT CAST(sum(dl) AS BIGINT) AS n FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |qt AS (SELECT doc_id, term FROM toks
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM qt GROUP BY doc_id, term),
         |cfq AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM qt GROUP BY term),
         |b1 AS (SELECT tf.doc_id,
         |    CAST(round(ln(CAST(1 AS DOUBLE)
         |      + 1.0 * CAST(tf.tf * st.n AS DOUBLE) / CAST(cfq.cf * dl.dl AS DOUBLE)), 9)
         |      AS DECIMAL(18,9)) AS bits
         |  FROM tf JOIN cfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |m AS (SELECT doc_id, CAST(sum(bits) AS DECIMAL(28,9)) AS m1,
         |    CAST(count(*) AS BIGINT) AS n_matched FROM b1 GROUP BY doc_id),
         |qc AS (SELECT CAST(sum(CAST(round(ln(0.5 * CAST(cf AS DOUBLE)
         |      / CAST(st.n AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS qc
         |  FROM cfq CROSS JOIN st)
         |SELECT doc_id, n_matched, dl,
         |  round(CAST(m.m1 + qc.qc AS DOUBLE), 6) AS jm_score
         |FROM m JOIN dl USING (doc_id) CROSS JOIN qc
         |ORDER BY m.m1 + qc.qc DESC, doc_id LIMIT 20"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.jelinekMercerTopDocs(
        documents(s, d),
        "doc_id",
        "text",
        Seq("spark", "join", "vector", "stream"),
        lambda = 0.5,
        k = 20
      )
    },

    // E372 pivoted-length-normalized VSM ([[Retrieval.pivotedVsmTopDocs]],
    // Singhal/Buckley/Mitra 1996): w_d = (1+ln tf)/((1−s)+s·dl/avgdl),
    // w_q = ln((N+1)/df), slope 0.2 — the vector-space ranker beside BM25
    // and the LM smoothers. dl/avgdl computed as (dl·N)/Σdl (exact integer
    // numerator into one division); per-posting products 9-decimal quantize
    // → DECIMAL sums; top-20 compares exact decimals.
    QEntry.sql(
      "txt_pivoted_vsm",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl
         |  FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |qt AS (SELECT doc_id, term FROM toks
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM qt GROUP BY doc_id, term),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |b1 AS (SELECT tf.doc_id,
         |    CAST(round(((1.0 + ln(CAST(tf.tf AS DOUBLE)))
         |        / (0.8 + 0.2 * CAST(dl.dl * st.n_docs AS DOUBLE)
         |            / CAST(st.tot AS DOUBLE)))
         |      * ln(CAST(st.n_docs + 1 AS DOUBLE) / CAST(dfq.df AS DOUBLE)), 9)
         |      AS DECIMAL(18,9)) AS bits
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |m AS (SELECT doc_id, CAST(sum(bits) AS DECIMAL(28,9)) AS s,
         |    CAST(count(*) AS BIGINT) AS n_matched FROM b1 GROUP BY doc_id)
         |SELECT doc_id, n_matched, dl, round(CAST(s AS DOUBLE), 6) AS vsm_score
         |FROM m JOIN dl USING (doc_id)
         |ORDER BY s DESC, doc_id LIMIT 20"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.pivotedVsmTopDocs(
        documents(s, d),
        "doc_id",
        "text",
        Seq("spark", "join", "vector", "stream"),
        slope = 0.2,
        k = 20
      )
    },

    // E373 BM25+ (Lv & Zhai 2011): the lower-bounded BM25 variant — a
    // matched term contributes at least idf·δ (δ = 1) no matter how long
    // the document, fixing classic BM25's over-penalization of very long
    // docs (whose saturated-tf term can fall below what an UNMATCHED term
    // would score under add-one smoothing). Same plan as txt_bm25_topdocs
    // (posting-filtered tf agg, broadcast df/stats, term-keyed top-k
    // window); the twin adds the identical +1.0 inside the idf product.
    QEntry.sql(
      "txt_bm25_plus",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * (((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) + 1.0) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
         |SELECT term, doc_id, tf, dl, round(score, 4) AS bm25, rank
         |FROM (SELECT scored.*, CAST(row_number() OVER
         |        (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM scored) t
         |WHERE rank <= 5""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.bm25TopDocs(
        documents(s, d),
        "doc_id",
        "text",
        Seq("spark", "join", "vector", "stream"),
        k = 5,
        delta = 1.0
      )
    },

    // E291 persisted BM25 index with incremental ingest: build over the
    // even docs, append the odds as ingest 1, query FROM the index — df,
    // N and avgdl derive from the index's current postings+sidecar at
    // query time (nothing score-shaped is materialized, which is what
    // makes the append a plain idempotent partition write), so ranking
    // after the append equals the monolithic BM25 over the whole corpus —
    // the twin is txt_bm25_topdocs' full-corpus replay verbatim.
    QEntry.sql(
      "txt_bm25_index",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
         |SELECT term, doc_id, tf, dl, round(score, 4) AS bm25, rank
         |FROM (SELECT scored.*, CAST(row_number() OVER
         |        (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM scored) t
         |WHERE rank <= 5""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-bm25idx").resolve("idx").toString
      Retrieval.buildBm25Index(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir)
      Retrieval.appendBm25Index(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir, 1L)
      Retrieval
        .bm25TopDocsFromIndex(s, dir, Seq("spark", "join", "vector", "stream"), k = 5)
        .withColumnRenamed("id", "doc_id")
    },

    // E292 retrieval right-to-be-forgotten: every fifth document's rows
    // leave postings AND sidecar via the generic index deletion, and —
    // because nothing score-shaped is materialized — df, N and avgdl
    // CORRECT THEMSELVES at the next query: the twin recomputes BM25 over
    // the post-deletion corpus from scratch and the hash matches. A
    // materialized-score index would keep ranking every survivor against
    // the deleted doc's ghost statistics.
    QEntry.sql(
      "txt_bm25_forget",
      s"""WITH d2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
         |dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM d2),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM d2),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s)
         |SELECT term, doc_id, tf, dl, round(score, 4) AS bm25, rank
         |FROM (SELECT scored.*, CAST(row_number() OVER
         |        (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM scored) t
         |WHERE rank <= 5""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-bm25fgt").resolve("idx").toString
      Retrieval.buildBm25Index(docs, "doc_id", "text", dir)
      val deleted = docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
      graft.operators.IndexMaintenance
        .deleteRows(s, deleted, s"$dir/postings", "id", Seq("ingest_id", "term_pfx"))
      graft.operators.IndexMaintenance
        .deleteRows(s, deleted, s"$dir/docstats", "id", Seq("ingest_id"))
      Retrieval
        .bm25TopDocsFromIndex(s, dir, Seq("spark", "join", "vector", "stream"), k = 5)
        .withColumnRenamed("id", "doc_id")
    },

    // Reciprocal Rank Fusion of the BM25 ranking with a plain
    // length-normalized-TF ranking (two genuinely different orders over
    // the same query terms) — the hybrid-search combiner. RRF in exact
    // integer micro-units (10⁹ div (60 + rank), summed BIGINTs), so the
    // fused order is engine-deterministic; -1 sentinels mark single-list
    // docs. List-sized frames end to end (top-20 in, top-10 out).
    QEntry.sql(
      "txt_rrf_fusion",
      s"""WITH dl AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
         |toks AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (SELECT tf.term, tf.doc_id,
         |    (((s.n_docs - dfq.df) + 0.5) / (dfq.df + 0.5) + 1.0)
         |    * ((tf.tf * (1.2 + 1.0)) / (tf.tf + (1.2 * ((1.0 - 0.75)
         |       + (0.75 * (dl.dl / (CAST(s.tot AS DOUBLE) / s.n_docs))))))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
         |ra AS (SELECT term, doc_id, rank FROM (SELECT scored.*, row_number() OVER
         |    (PARTITION BY term ORDER BY score DESC, doc_id) AS rank FROM scored) t
         |  WHERE rank <= 20),
         |rb AS (SELECT term, doc_id, rank FROM (SELECT tf.term, tf.doc_id,
         |    row_number() OVER (PARTITION BY tf.term
         |      ORDER BY CAST(tf.tf AS DOUBLE) / dl.dl DESC, tf.doc_id) AS rank
         |  FROM tf JOIN dl USING (doc_id)) t WHERE rank <= 20),
         |u AS (SELECT term, doc_id FROM ra UNION SELECT term, doc_id FROM rb),
         |f AS (SELECT u.term, u.doc_id,
         |    CAST(COALESCE(ra.rank, -1) AS BIGINT) AS rank_a,
         |    CAST(COALESCE(rb.rank, -1) AS BIGINT) AS rank_b,
         |    CAST(CASE WHEN ra.rank IS NULL THEN 0
         |          ELSE 1000000000 // (60 + ra.rank) END
         |       + CASE WHEN rb.rank IS NULL THEN 0
         |          ELSE 1000000000 // (60 + rb.rank) END AS BIGINT) AS rrf_micro
         |  FROM u LEFT JOIN ra USING (term, doc_id) LEFT JOIN rb USING (term, doc_id))
         |SELECT term, doc_id, rank_a, rank_b, rrf_micro,
         |  CAST(fused_rank AS BIGINT) AS fused_rank
         |FROM (SELECT f.*, row_number() OVER
         |    (PARTITION BY term ORDER BY rrf_micro DESC, doc_id) AS fused_rank FROM f) t
         |WHERE fused_rank <= 10""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val terms = Seq("spark", "join", "vector", "stream")
      val base = documents(s, d)
      val a = Retrieval.bm25TopDocs(base, "doc_id", "text", terms, k = 20)
        .select("term", "doc_id", "rank")
      val dl = base.select(
        col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("dl")
      )
      val tf = base
        .select(col("doc_id"), explode_outer(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
      val wB = Window
        .partitionBy("term")
        .orderBy((col("tf").cast("double") / col("dl")).desc, col("doc_id"))
      val b = tf
        .join(dl, "doc_id")
        .withColumn("rank", row_number().over(wB).cast("long"))
        .filter(col("rank") <= 20)
        .select("term", "doc_id", "rank")
      Retrieval.rrfFuse(a, b, Seq("term"), "doc_id", c = 60, k = 10)
    },

    // Inverted index: df, cf, sorted capped posting list per term.
    QEntry.sql(
      "txt_inverted_index",
      s"""SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, count(*) AS cf,
         |  array_to_string(list_sort(list(DISTINCT doc_id))[1:40], ',') AS postings
         |FROM (SELECT doc_id, unnest($wordsSql) AS term FROM documents) t
         |WHERE length(term) >= 3
         |GROUP BY term""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.invertedIndex(documents(s, d), "doc_id", "text")
    },

    // Boolean-AND retrieval: posting intersection, never a text rescan.
    QEntry.sql(
      "txt_boolean_and_search",
      s"""SELECT doc_id, count(*) AS n_terms_matched
         |FROM (SELECT DISTINCT doc_id, term
         |      FROM (SELECT doc_id, unnest($wordsSql) AS term FROM documents) t
         |      WHERE term IN ('spark', 'vector', 'stream')) m
         |GROUP BY doc_id HAVING count(*) = 3""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.booleanAndSearch(documents(s, d), "doc_id", "text", Seq("spark", "vector", "stream"))
    },

    // Exact phrase search from a positional index (pos+1 joins, IR-style).
    QEntry.sql(
      "txt_phrase_search",
      s"""WITH pos0 AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(words) + 1),
         |      i -> struct_pack(p := i, term := words[i]))) AS u
         |  FROM (SELECT doc_id, $wordsSql AS words FROM documents) w),
         |pos AS (SELECT doc_id, CAST(u.p AS BIGINT) AS p, u.term AS term
         |  FROM pos0 WHERE u.term IN ('spark', 'join'))
         |SELECT a.doc_id, a.p AS start_pos
         |FROM (SELECT doc_id, p FROM pos WHERE term = 'spark') a
         |JOIN (SELECT doc_id, p - 1 AS p FROM pos WHERE term = 'join') b
         |ON a.doc_id = b.doc_id AND a.p = b.p""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval
        .phraseSearch(documents(s, d), "doc_id", "text", Seq("spark", "join"))
        .select(col("doc_id"), col("start_pos").cast("long").as("start_pos"))
    },

    // Chi-square keyness: top-20 terms separating lang='en' docs from the rest.
    QEntry.sql(
      "txt_keyness_chi2",
      s"""WITH toks AS (SELECT lang, unnest($wordsSql) AS term FROM documents),
         |counts AS (SELECT term,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    count(*) AS tot
         |  FROM toks WHERE term <> '' GROUP BY term),
         |cb AS (SELECT term, a, tot - a AS b FROM counts),
         |totals AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM cb),
         |scored AS (SELECT term, a, b, ta - a AS c, tb - b AS d, ta, tb
         |  FROM cb CROSS JOIN totals),
         |chi0 AS (SELECT term, a, b, ta, tb,
         |    (CAST(ta + tb AS DOUBLE)
         |      * ((CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
         |         * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)))
         |    / (((CAST(a + b AS DOUBLE) * (c + d)) * (a + c)) * (b + d)) AS chi2raw
         |  FROM scored),
         |chi AS (SELECT term, a, b,
         |    CASE WHEN chi2raw IS NULL OR isnan(chi2raw) THEN 0.0
         |         ELSE chi2raw END AS chi2,
         |    CASE WHEN CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) > CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) THEN 'en' ELSE 'rest' END AS overrep
         |  FROM chi0)
         |SELECT term, a AS focus_cnt, b AS rest_cnt, round(chi2, 4) AS chi2, overrep
         |FROM (SELECT * FROM chi ORDER BY chi2 DESC, term LIMIT 20) top"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.chi2Keyness(documents(s, d), "text", "lang", "en", k = 20)
    },

    // E390 Dunning log-likelihood-ratio keyness ([[Retrieval.llrKeyness]]):
    // the corpus-linguistics standard beside chi² — G² = 2·Σ O·ln(O/E)
    // stays calibrated at the small expected counts where characteristic
    // terms live, exactly where chi² over-weights. Fixed-order four-cell
    // double expression, 0-cells contribute 0; identical text both engines.
    QEntry.sql(
      "txt_keyness_llr",
      s"""WITH toks AS (SELECT lang, unnest($wordsSql) AS term FROM documents),
         |counts AS (SELECT term,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    count(*) AS tot
         |  FROM toks WHERE term <> '' GROUP BY term),
         |cb AS (SELECT term, a, tot - a AS b FROM counts),
         |totals AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM cb),
         |cells AS (SELECT term, a, b, ta - a AS c, tb - b AS d, ta, tb, ta + tb AS n
         |  FROM cb CROSS JOIN totals),
         |scored AS (SELECT term, a, b,
         |    2.0 * ((CASE WHEN a = 0 THEN 0.0 ELSE CAST(a AS DOUBLE)
         |        * ln(CAST(a AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(a + b AS DOUBLE) * CAST(ta AS DOUBLE))) END)
         |      + (CASE WHEN b = 0 THEN 0.0 ELSE CAST(b AS DOUBLE)
         |        * ln(CAST(b AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(a + b AS DOUBLE) * CAST(tb AS DOUBLE))) END)
         |      + (CASE WHEN c = 0 THEN 0.0 ELSE CAST(c AS DOUBLE)
         |        * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(c + d AS DOUBLE) * CAST(ta AS DOUBLE))) END)
         |      + (CASE WHEN d = 0 THEN 0.0 ELSE CAST(d AS DOUBLE)
         |        * ln(CAST(d AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(c + d AS DOUBLE) * CAST(tb AS DOUBLE))) END)) AS llr,
         |    CASE WHEN CAST(a AS DOUBLE) * CAST(tb AS DOUBLE) > CAST(b AS DOUBLE) * CAST(ta AS DOUBLE) THEN 'en' ELSE 'rest' END AS overrep
         |  FROM cells)
         |SELECT term, a AS focus_cnt, b AS rest_cnt, round(llr, 4) AS llr, overrep
         |FROM (SELECT * FROM scored ORDER BY llr DESC, term LIMIT 20) top"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Retrieval.llrKeyness(documents(s, d), "text", "lang", "en", k = 20)
    }
  )
}
