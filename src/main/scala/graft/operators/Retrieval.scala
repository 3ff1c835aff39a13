package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus retrieval primitives: BM25 ranking, inverted-index construction and
  * chi-square term keyness. These are the search-side counterparts of the
  * TF-IDF statistics in [[TermStats]] — what a training-data pipeline uses to
  * find, weigh and contrast documents at corpus scale.
  *
  * Plan shapes (all keyed shuffles; nothing touches the driver):
  *   - BM25: explode tokens → (doc, term) tf hash-agg → broadcast the per-term
  *     document frequencies and the 1-row corpus stats → keyed row_number
  *     window for top-k. Shuffle width is the matched (doc, term) set only —
  *     the term filter runs BEFORE the tf aggregate, so off-query tokens never
  *     enter a shuffle.
  *   - inverted index: explode → per-term hash aggregate. Posting lists are
  *     explicitly capped (`maxPostings`): an uncapped list for a stopword-like
  *     term is a single-key memory bomb at 100 TB. Production layouts shard
  *     hot terms further ((term, bucket) composite keys); the cap keeps this
  *     operator's per-group state bounded either way.
  *   - keyness: explode → per-term conditional-sum aggregate (one pass for
  *     both corpus slices) → broadcast 1-row totals → arithmetic-only χ²
  *     scoring. χ² is chosen over log-likelihood-ratio keyness deliberately:
  *     it is pure +/×/÷ on exact integer counts, which IEEE-754 requires
  *     correctly rounded, so scores are bit-identical across engines (the
  *     QEntry determinism contract) — ln() is not and would make ranking
  *     engine-dependent near ties.
  */
object Retrieval {

  /** Okapi BM25 top-k documents per query term.
    *
    * Classic saturation formula with the ratio idf variant
    * `idf = (N - df + 0.5)/(df + 0.5) + 1` (the +1-shifted Robertson idf
    * without the ln — every operation is exact-or-correctly-rounded, see the
    * object doc). Document length is the whitespace token count; `avgdl` is
    * computed from the corpus in the same pass.
    *
    * @param queryTerms literal term set to score (each term is ranked
    *                   independently — a disjunctive query is the sum of its
    *                   per-term rows)
    */
  def bm25TopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      delta: Double = 0.0
  ): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))
    val dl = base.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl")
    )
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val toks = base
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // idf and the saturation term are parenthesized identically to the DuckDB
    // twin so every intermediate double matches bit-for-bit
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    // delta > 0 is BM25+ (Lv & Zhai 2011): a lower bound on the saturated
    // tf term, fixing BM25's over-penalization of very long documents — a
    // matched term can never contribute less than idf*delta no matter how
    // long the doc. delta = 0 is classic BM25.
    val score = idf * ((col("tf") * lit(k1 + 1.0)) /
      (col("tf") + (lit(k1) * ((lit(1.0) - lit(b)) + (lit(b) * (col("dl") / avgdl))))) +
      lit(delta))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col(idCol))
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("term"),
        col(idCol),
        col("tf"),
        col("dl"),
        round(col("score"), 4).as("bm25"),
        col("rank")
      )
  }

  /** Pseudo-relevance-feedback query expansion (RM3-lite, Lavrenko & Croft
    * 2001 shape): run the query, mine the top `fbDocs` results for the
    * `fbTerms` terms that best characterize them (ranked by how many
    * pseudo-relevant docs contain the term, then total occurrences — the
    * df-in-R signal, cheap and exact), expand the query with them, and
    * rescore the corpus on the expanded set — the vocabulary-mismatch fix
    * every retrieval stack reaches for before anything neural.
    *
    * Per-doc totals sum each term's BM25 contribution QUANTIZED to 9-dp
    * DECIMAL first (the E160 ladder) — a float sum over terms would be
    * partial-aggregation-order dependent and break cross-engine ranking.
    *
    * Cost shape: stage 1 is [[bm25TopDocs]] (query-term-filtered tf — the
    * posting lists, never the corpus matrix); feedback mining scans only
    * the fbDocs docs via a broadcast semi-join; stage 2 rescoring filters
    * tokens to ≤ fbTerms+1 terms via a broadcast join. Top-k cuts are
    * TakeOrdered.
    *
    * @return top-k docs on the expanded query: (doc_id…, n_terms,
    *         bm25_total), TakeOrdered on (total desc, id)
    */
  def prfExpandedTopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      fbDocs: Int = 10,
      fbTerms: Int = 5,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val base = docs.select(col(idCol), col(textCol))
    val rel = bm25TopDocs(base, idCol, textCol, Seq(query), fbDocs, k1, b)
      .select(col(idCol))
    val fb = base
      .join(broadcast(rel), idCol)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= query && length(col("term")) >= 3)
      .groupBy(col("term"))
      .agg(countDistinct(col(idCol)).cast("long").as("df_r"), count(lit(1)).cast("long").as("tf_r"))
      .orderBy(col("df_r").desc, col("tf_r").desc, col("term"))
      .limit(fbTerms)
      .select(col("term"))
    val expanded = fb
      .unionAll(docs.sparkSession.range(1).select(lit(query).as("term")))
      .localCheckpoint() // tiny; read twice (filter + doc census) and lazily self-derived
    val dl = base.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = base
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .join(broadcast(expanded), "term")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    val score = idf * ((col("tf") * lit(k1 + 1.0)) /
      (col("tf") + (lit(k1) * ((lit(1.0) - lit(b)) + (lit(b) * (col("dl") / avgdl))))))
    val perDoc = tf
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("_s", round(score, 9).cast("decimal(18,9)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_terms"),
        sum(col("_s")).cast("decimal(28,9)").as("_tot")
      )
    perDoc
      .orderBy(col("_tot").desc, col(idCol))
      .limit(k)
      .select(
        col(idCol),
        col("n_terms"),
        round(col("_tot").cast("double"), 6).as("bm25_total")
      )
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001) —
    * the language-model dual to [[bm25TopDocs]], in its sparse
    * decomposition: ln p(q|d) = Σ_{w∈q, tf>0} ln(1 + tf·N/(μ·cf)) +
    * |q|·ln(μ/(dl+μ)). The first sum runs only over MATCHED postings (the
    * decomposition is what keeps the plan sparse — no dense doc×term
    * grid); the second is a pure per-doc length prior. Docs matching no
    * query term rank by length alone and are excluded, the standard
    * practical cut.
    *
    * Exactness: tf·N and μ·cf are exact BIGINT products, each ln argument
    * is one correctly-rounded double division; per-posting and per-doc ln
    * terms quantize to 9 decimals → DECIMAL, so the doc score is an exact
    * order-free DECIMAL sum and the top-k cut compares exact decimals.
    * Same shapes as BM25: corpus-sized token filter (pushed before the tf
    * aggregate), term-keyed broadcast stats, one per-doc agg, global
    * top-k via sort-limit (TakeOrdered, never a full sort).
    *
    * @return (id, n_matched, dl, ql_score) — top-k by score
    */
  def queryLikelihoodTopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      mu: Long = 2000L,
      k: Int = 20
  ): DataFrame = {
    val terms = queryTerms.distinct
    val base = docs.select(col(idCol), col(textCol))
    val dl = base.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl")
    )
    val stats = dl.agg(sum(col("dl")).cast("long").as("n"))
    val toks = base
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).cast("long").as("tf"))
    val cf = toks.groupBy(col("term")).agg(count(lit(1)).cast("long").as("cf"))
    val b1 = tf
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .select(
        col(idCol),
        round(
          log(
            lit(1.0) + (col("tf") * col("n")).cast("double") /
              (lit(mu) * col("cf")).cast("double")
          ),
          9
        ).cast("decimal(18,9)").as("bits")
      )
    val m = b1
      .groupBy(col(idCol))
      .agg(
        sum(col("bits")).cast("decimal(28,9)").as("m1"),
        count(lit(1)).cast("long").as("n_matched")
      )
    val prior = round(
      log(lit(mu.toDouble) / (col("dl") + lit(mu)).cast("double")),
      9
    ).cast("decimal(18,9)")
    m.join(dl, idCol)
      .withColumn("_s", col("m1") + lit(terms.size) * prior)
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(
        col(idCol),
        col("n_matched"),
        col("dl"),
        round(col("_s").cast("double"), 6).as("ql_score")
      )
  }

  /** Jelinek-Mercer smoothed query likelihood — the λ-interpolation member
    * of the classical LM-retrieval ladder beside [[queryLikelihoodTopDocs]]'
    * Dirichlet prior (Zhai & Lafferty 2001: JM favors verbose queries,
    * Dirichlet short ones; an engine shipping one should ship both):
    *
    *   score(q,d) = Σ_{t∈q} ln( λ·tf/dl + (1−λ)·cf/|C| )
    *              = Σ_{t∈q} ln((1−λ)·cf/|C|)                 (doc-constant)
    *              + Σ_{t∈q∩d} ln(1 + (λ/(1−λ))·tf·|C|/(cf·dl))  (sparse)
    *
    * — the same sparse decomposition as Dirichlet, so only MATCHED postings
    * contribute rows and the doc-constant query term attaches as one
    * broadcast scalar. All ln terms quantize to 9 decimals → DECIMAL sums
    * (order-free), final score one rounded double. The default λ = 0.5
    * makes λ/(1−λ) = 1 exactly, so every intermediate is a ratio of exact
    * integers through one IEEE division — engine-deterministic.
    * Shuffles: one tf partial agg; cf and corpus stats broadcast; top-k is
    * TakeOrdered. Scale shape identical to the Dirichlet entry.
    */
  def jelinekMercerTopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      lambda: Double = 0.5,
      k: Int = 20
  ): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, "lambda must be in (0,1)")
    val terms = queryTerms.distinct
    val base = docs.select(col(idCol), col(textCol))
    val dl = base.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl")
    )
    val stats = dl.agg(sum(col("dl")).cast("long").as("n"))
    val toks = base
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).cast("long").as("tf"))
    val cf = toks.groupBy(col("term")).agg(count(lit(1)).cast("long").as("cf"))
    val ratio = lambda / (1.0 - lambda)
    val matched = tf
      .join(broadcast(cf), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(
        col(idCol),
        round(
          log(
            lit(1.0) + lit(ratio) * (col("tf") * col("n")).cast("double") /
              (col("cf") * col("dl")).cast("double")
          ),
          9
        ).cast("decimal(18,9)").as("bits")
      )
    val m = matched
      .groupBy(col(idCol))
      .agg(
        sum(col("bits")).cast("decimal(28,9)").as("m1"),
        count(lit(1)).cast("long").as("n_matched")
      )
    // doc-constant query mass: Σ_t ln((1−λ)·cf_t/|C|) — one broadcast scalar
    val qconst = cf
      .crossJoin(broadcast(stats))
      .agg(
        sum(
          round(
            log(lit(1.0 - lambda) * col("cf").cast("double") / col("n").cast("double")),
            9
          ).cast("decimal(18,9)")
        ).cast("decimal(28,9)").as("qc")
      )
    m.join(dl, idCol)
      .crossJoin(broadcast(qconst))
      .withColumn("_s", col("m1") + col("qc"))
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(
        col(idCol),
        col("n_matched"),
        col("dl"),
        round(col("_s").cast("double"), 6).as("jm_score")
      )
  }

  /** Pivoted-length-normalized VSM scoring (Singhal, Buckley & Mitra 1996;
    * the SMART lnc.ltc lineage) — the vector-space member of the ranking
    * ladder beside BM25 and the two LM smoothers, and the historical answer
    * to "cosine normalization over-penalizes long documents":
    *
    *   w_d(t) = (1 + ln tf) / ((1−s) + s · dl/avgdl)
    *   w_q(t) = ln((N+1)/df_t)
    *   score  = Σ_{t∈q∩d} w_d·w_q
    *
    * with slope s = 0.2 (the paper's default). Only matched postings
    * contribute; df/N/avgdl are broadcast scalars; each per-posting product
    * quantizes to 9 decimals → DECIMAL sums, and dl/avgdl is computed as
    * (dl·N)/Σdl so the numerator stays an exact integer product into one
    * IEEE division. Same shuffle shape as the QL entries: one tf partial
    * agg, broadcasts, TakeOrdered top-k.
    */
  def pivotedVsmTopDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      slope: Double = 0.2,
      k: Int = 20
  ): DataFrame = {
    require(slope > 0.0 && slope < 1.0, "slope must be in (0,1)")
    val terms = queryTerms.distinct
    val base = docs.select(col(idCol), col(textCol))
    val dl = base.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl")
    )
    val stats = dl.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("tot")
    )
    val toks = base
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).cast("long").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val bits = tf
      .join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(
        col(idCol),
        round(
          ((lit(1.0) + log(col("tf").cast("double"))) /
            (lit(1.0 - slope) + lit(slope) *
              (col("dl") * col("n_docs")).cast("double") / col("tot").cast("double"))) *
            log((col("n_docs") + 1).cast("double") / col("df").cast("double")),
          9
        ).cast("decimal(18,9)").as("bits")
      )
    bits
      .groupBy(col(idCol))
      .agg(
        sum(col("bits")).cast("decimal(28,9)").as("_s"),
        count(lit(1)).cast("long").as("n_matched")
      )
      .join(dl, idCol)
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(
        col(idCol),
        col("n_matched"),
        col("dl"),
        round(col("_s").cast("double"), 6).as("vsm_score")
      )
  }

  /** nDCG@k ranking evaluation — the graded-relevance IR metric computed
    * engine-side, so ranker comparisons (BM25 vs [[queryLikelihoodTopDocs]]
    * vs a fused list) run as one query instead of exporting rankings:
    * DCG = Σ_{rank≤k} gain/log₂(rank+1) over the SYSTEM ranking, IDCG the
    * same sum over the ideal (gain-sorted, id tie-break) ordering of ALL
    * judged docs, nDCG their ratio. Per-position terms quantize to 9
    * decimals → DECIMAL (order-free sums); the ratio is one double
    * division rounded to 6. Retrieved-but-unjudged docs contribute gain 0
    * (the standard convention). One join + two query-keyed aggs; the
    * ideal ranking windows within each query's judged set only.
    *
    * @param ranked (qCol, idCol, rank) — system ranking, rank 1-based
    * @param rels (qCol, idCol, gain LONG ≥ 0) — graded judgments
    * @return (q, dcg, idcg, ndcg)
    */
  def ndcgAtK(
      ranked: DataFrame,
      rels: DataFrame,
      qCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    def disc(rank: org.apache.spark.sql.Column, gain: org.apache.spark.sql.Column) =
      round(gain.cast("double") / log2(rank.cast("double") + lit(1.0)), 9)
        .cast("decimal(18,9)")
    val dcg = ranked
      .filter(col("rank") <= k)
      .join(rels, Seq(qCol, idCol), "left")
      .select(col(qCol), disc(col("rank"), coalesce(col("gain"), lit(0L))).as("_g"))
      .groupBy(col(qCol))
      .agg(sum(col("_g")).cast("decimal(28,9)").as("_dcg"))
    val w = Window.partitionBy(col(qCol)).orderBy(col("gain").desc, col(idCol))
    val ideal = rels
      .withColumn("_ir", row_number().over(w))
      .filter(col("_ir") <= k)
      .select(col(qCol), disc(col("_ir"), col("gain")).as("_g"))
      .groupBy(col(qCol))
      .agg(sum(col("_g")).cast("decimal(28,9)").as("_idcg"))
    dcg
      .join(ideal, qCol)
      .select(
        col(qCol),
        round(col("_dcg").cast("double"), 6).as("dcg"),
        round(col("_idcg").cast("double"), 6).as("idcg"),
        round(col("_dcg").cast("double") / col("_idcg").cast("double"), 6).as("ndcg")
      )
  }

  /** Persist a BM25 retrieval index: per-(doc, term) tf POSTINGS
    * (16-way term-hash-prefix partitioned — a query's terms prune to their
    * prefix directories) plus a per-doc LENGTH sidecar. Deliberately NO
    * materialized df/idf/score: global statistics go stale the moment a
    * batch arrives, which is exactly why naive "index the scores" designs
    * cannot ingest incrementally. Here df/N/avgdl are derived AT QUERY
    * TIME from the current postings and sidecar ([[bm25TopDocsFromIndex]]),
    * so [[appendBm25Index]] is a plain replay-idempotent partition append
    * and every query automatically scores against up-to-date corpus
    * statistics — ranking after any append sequence ≡ [[bm25TopDocs]] over
    * the union corpus (the `txt_bm25_index` entry's oracle and
    * RetrievalSpec pin it).
    */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    writeBm25(docs, idCol, textCol, path, 0L, dynamic = false)

  /** Fold one accepted ingest into a [[buildBm25Index]] index — dynamic
    * partition overwrite on the ingest's own partition, the replay-
    * idempotence idiom shared with `Dedup.appendMinhashIndex`. Use ids > 0.
    */
  def appendBm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      ingestId: Long
  ): Unit = {
    require(ingestId > 0L, s"ingest ids start at 1 (0 is the initial build), got $ingestId")
    writeBm25(docs, idCol, textCol, path, ingestId, dynamic = true)
  }

  private def writeBm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      ingestId: Long,
      dynamic: Boolean
  ): Unit = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("_t")).localCheckpoint()
    def writer(df: DataFrame) = {
      val w = df.withColumn("ingest_id", lit(ingestId)).write.mode("overwrite")
      if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w
    }
    writer(
      base
        .select(col("id"), explode_outer(TextAnalysis.tokens(col("_t"))).as("term"))
        .filter(col("term").isNotNull)
        .groupBy(col("id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("term_pfx", pmod(xxhash64(col("term")), lit(16)))
    ).partitionBy("ingest_id", "term_pfx").parquet(s"$path/postings")
    writer(
      base.select(col("id"), TextAnalysis.tokenCount(col("_t")).cast("long").as("dl"))
    ).partitionBy("ingest_id").parquet(s"$path/docstats")
  }

  /** BM25 top-k per query term FROM a persisted index — identical
    * arithmetic (and parenthesization) to [[bm25TopDocs]], with df, N and
    * avgdl derived from the index's CURRENT state: one doc-count-sized
    * sidecar scan for the corpus stats and a term-prefix-PRUNED postings
    * read (the prefix predicates are constant-foldable, so only the query
    * terms' 16ths of the postings are ever listed). Corpus text is never
    * touched at query time.
    */
  def bm25TopDocsFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val dl = ParquetIO.read(spark, s"$path/docstats").select(col("id"), col("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val pfxPred = queryTerms
      .map(t => col("term_pfx") === pmod(xxhash64(lit(t)), lit(16)))
      .reduce(_ || _)
    val tf = spark.read
      .parquet(s"$path/postings")
      .filter(pfxPred && col("term").isin(queryTerms: _*))
      .select(col("id"), col("term"), col("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("tot").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    val score = idf * ((col("tf") * lit(k1 + 1.0)) /
      (col("tf") + (lit(k1) * ((lit(1.0) - lit(b)) + (lit(b) * (col("dl") / avgdl))))))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("id"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("term"),
        col("id"),
        col("tf"),
        col("dl"),
        round(col("score"), 4).as("bm25"),
        col("rank")
      )
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009) of two rankings — the
    * hybrid-search combiner (lexical ⊕ semantic, BM25 ⊕ dense retrieval)
    * every modern retrieval pipeline runs. RRF(d) = Σ_r 1/(c + rank_r(d)),
    * defined here in exact integer micro-units — `10⁹ div (c + rank)`,
    * summed as BIGINTs — so fusion scores and the fused order are
    * engine-deterministic with no float division anywhere (the object-doc
    * discipline). Documents absent from one list contribute 0 from it and
    * carry a −1 sentinel rank.
    *
    * Inputs are (keyCols..., id, rank) frames — rank lists, typically
    * top-k-bounded, so the full-outer union and the fused window are
    * list-sized, never corpus-sized: at 100 TB the upstream retrievers
    * bound their own output and fusion cost is O(k) per query key.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      c: Int = 60,
      k: Int = 10
  ): DataFrame = {
    val keys = keyCols.map(col) :+ col(idCol)
    val ra = a.select(keys :+ col("rank").as("_ra"): _*)
    val rb = b.select(keys :+ col("rank").as("_rb"): _*)
    val fused = ra
      .join(rb, keyCols :+ idCol, "full_outer")
      .select(
        keyCols.map(col) ++ Seq(
          col(idCol),
          coalesce(col("_ra"), lit(-1L)).as("rank_a"),
          coalesce(col("_rb"), lit(-1L)).as("rank_b"),
          // integer `div`, not `/`: the DSL slash would promote to double
          (when(col("_ra").isNull, lit(0L))
            .otherwise(expr(s"1000000000L div (${c}L + _ra)")) +
            when(col("_rb").isNull, lit(0L))
              .otherwise(expr(s"1000000000L div (${c}L + _rb)")))
            .cast("long")
            .as("rrf_micro")
        ): _*
      )
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("rrf_micro").desc, col(idCol))
    fused
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
  }

  /** Inverted index: per term, document frequency, collection frequency and a
    * sorted, capped posting list rendered as a comma-joined string (strings
    * hash portably across engines; the cap bounds per-term state — see the
    * object doc for the 100 TB sharding note).
    */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTermLen: Int = 3,
      maxPostings: Int = 40
  ): DataFrame = {
    val toks = docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= minTermLen)
    val counts = toks
      .groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"), count(lit(1)).as("cf"))
    // rank BEFORE collecting so the aggregate only ever sees `maxPostings`
    // ids per term — collect_set with a post-hoc slice would still buffer
    // the full posting list for hot terms, exactly the single-key state
    // bomb the cap exists to prevent. WindowGroupLimit prunes the ranked
    // rows before the window's own sort at scale.
    val w = Window.partitionBy(col("term")).orderBy(col(idCol))
    val postings = toks
      .select(col("term"), col(idCol))
      .distinct()
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPostings)
      .groupBy(col("term"))
      .agg(
        array_join(array_sort(collect_list(col(idCol))).cast("array<string>"), ",")
          .as("postings")
      )
    counts.join(postings, Seq("term"))
  }

  /** Boolean-AND retrieval over the term postings: documents containing ALL
    * query terms, via the posting-intersection shape (distinct (doc, term)
    * pairs filtered to the query, grouped per doc, kept when every term
    * matched) — never a rescan of the text per term. Returns (doc_id,
    * n_terms_matched).
    */
  def booleanAndSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String]
  ): DataFrame = {
    val wanted = queryTerms.distinct
    docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(wanted: _*))
      .select(col(idCol), col("term"))
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"))
      .filter(col("n_terms_matched") === wanted.length)
  }

  /** Exact phrase search via a positional index: token positions are
    * materialized once (posexplode) and consecutive query terms join on
    * `pos + 1` — the positional-posting intersection of an IR engine, not a
    * substring rescan. Returns one row per occurrence (doc_id, start_pos,
    * 1-based).
    */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]
  ): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val pos = docs
      .select(col(idCol), posexplode_outer(TextAnalysis.tokens(col(textCol))).as(Seq("p", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
      // 1-based positions; keep only query terms in the index slice
      .select(col(idCol), (col("p") + 1).as("p"), col("term"))
    val first = pos
      .filter(col("term") === phrase.head)
      .select(col(idCol), col("p").as("start_pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
      acc.join(
        pos
          .filter(col("term") === t)
          .select(col(idCol), (col("p") - i).as("start_pos")),
        Seq(idCol, "start_pos")
      )
    }
  }

  /** Chi-square keyness of terms between one corpus slice (`groupCol ===
    * focus`) and the rest. The table is built from token OCCURRENCES, not
    * per-document frequencies — a term used 50× in one focus doc counts 50
    * (keyness of usage mass; for doc-frequency keyness, distinct (doc, term)
    * first). For each term the 2×2 contingency table is (a = occurrences in
    * focus, b = occurrences elsewhere, c/d = the group remainders);
    * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)). Factors are
    * cast to double BEFORE multiplying (the raw bigint products overflow at
    * corpus scale); the double math is correctly rounded from exact integer
    * inputs, so scores — and the top-k cut — are engine-deterministic.
    *
    * @return top-`k` terms by χ² with their slice counts and the slice the
    *         term is over-represented in (cross-multiplication with each
    *         factor cast to double first — exact below 2^53 and, unlike the
    *         BIGINT product, never sign-wraps at web-corpus token counts)
    */
  def chi2Keyness(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      focus: String,
      k: Int = 20
  ): DataFrame = {
    val toks = docs
      .select(col(groupCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks
      .groupBy(col("term"))
      .agg(
        sum(when(col(groupCol) === focus, 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("tot")
      )
      .withColumn("b", col("tot") - col("a"))
    val totals = counts.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val withTotals = counts
      .crossJoin(broadcast(totals))
      .withColumn("c", col("ta") - col("a"))
      .withColumn("d", col("tb") - col("b"))
    // square via self-multiplication, not pow(): x*x is a single correctly
    // rounded multiply everywhere; pow's libm path is not guaranteed to be
    val diff = col("a").cast("double") * col("d") - col("b").cast("double") * col("c")
    val num = (col("ta") + col("tb")).cast("double") * (diff * diff)
    val den = (((col("a") + col("b")).cast("double") * (col("c") + col("d"))) *
      (col("a") + col("c"))) * (col("b") + col("d"))
    // try_divide: a single-slice corpus (one side empty) zeroes every
    // contingency denominator, and ANSI mode makes the plain divide THROW
    // (double included in Spark 4). Degenerate tables score 0 — the
    // ranking-safe "no separation evidence" value (a NaN would sort above
    // every real score descending).
    withTotals
      .withColumn("chi2", coalesce(try_divide(num, den), lit(0.0)))
      .withColumn(
        "overrep",
        when(
          col("a").cast("double") * col("tb").cast("double") >
            col("b").cast("double") * col("ta").cast("double"),
          lit(focus)).otherwise(lit("rest"))
      )
      .orderBy(col("chi2").desc, col("term"))
      .limit(k)
      .select(
        col("term"),
        col("a").as("focus_cnt"),
        col("b").as("rest_cnt"),
        round(col("chi2"), 4).as("chi2"),
        col("overrep")
      )
  }

  /** Dunning log-likelihood-ratio keyness (Dunning 1993) — the keyness the
    * corpus-linguistics literature standardized on, beside [[chi2Keyness]]
    * (χ² over-weights rare events; G² stays calibrated at small expected
    * counts, which is exactly where characteristic terms live):
    * G² = 2·Σ_cells O·ln(O/E), E = rowTot·colTot/N, 0-cells contribute 0.
    * The four cell terms are a FIXED-ORDER double expression (not an
    * aggregation), each ln over a ratio of exact integer products — written
    * identically on both engines, so ranking is engine-deterministic
    * without the 9-dp ladder. Same one-pass contingency build as χ².
    */
  def llrKeyness(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      focus: String,
      k: Int = 20
  ): DataFrame = {
    val toks = docs
      .select(col(groupCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks
      .groupBy(col("term"))
      .agg(
        sum(when(col(groupCol) === focus, 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("tot")
      )
      .withColumn("b", col("tot") - col("a"))
    val totals = counts.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    // Each factor is cast to double BEFORE multiplying: o and n are token
    // counts, and o*n as BIGINT wraps past ~9.2e18 — i.e. at exactly the
    // multi-billion-token corpora this operator targets. The double ratio is
    // taken immediately anyway, and below 2^53 the two forms are bit-equal,
    // so the DuckDB twin (same factor-wise casts) stays hash-stable.
    def cell(o: Column, rowTot: Column, colTot: Column, n: Column): Column =
      when(o === 0, lit(0.0)).otherwise(
        o.cast("double") * log(
          o.cast("double") * n.cast("double") /
            (rowTot.cast("double") * colTot.cast("double"))))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("c", col("ta") - col("a"))
      .withColumn("d", col("tb") - col("b"))
      .withColumn("n", col("ta") + col("tb"))
      .withColumn(
        "llr",
        lit(2.0) * (cell(col("a"), col("a") + col("b"), col("ta"), col("n")) +
          cell(col("b"), col("a") + col("b"), col("tb"), col("n")) +
          cell(col("c"), col("c") + col("d"), col("ta"), col("n")) +
          cell(col("d"), col("c") + col("d"), col("tb"), col("n")))
      )
      .withColumn(
        "overrep",
        when(
          col("a").cast("double") * col("tb").cast("double") >
            col("b").cast("double") * col("ta").cast("double"),
          lit(focus)).otherwise(lit("rest"))
      )
      .orderBy(col("llr").desc, col("term"))
      .limit(k)
      .select(
        col("term"),
        col("a").as("focus_cnt"),
        col("b").as("rest_cnt"),
        round(col("llr"), 4).as("llr"),
        col("overrep")
      )
  }
}
