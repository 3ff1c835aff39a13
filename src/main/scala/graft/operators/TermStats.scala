package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus term statistics: TF-IDF characteristic-term extraction.
  *
  * Plan shape (all keyed shuffles, no driver involvement):
  * explode tokens → (doc, term) count [hash-agg, map-side combine] →
  * term document-frequency [hash-agg over the already-small tf relation] →
  * equi-join tf⋈df on term → broadcast the 1-row corpus count → per-doc
  * top-k via a row_number window partitioned by doc id (shuffle key =
  * window key). The widest shuffle is the distinct (doc, term) set —
  * proportional to corpus vocabulary, not to raw token count, thanks to
  * partial aggregation.
  */
object TermStats {

  /** Top-k characteristic terms per document ranked by TF-IDF.
    *
    * `logIdf = true` is the classic smoothed variant
    * (idf = ln((N+1)/(df+1))). `logIdf = false` uses the raw-ratio variant
    * idf = N/df: ranking-relevant when results must be bit-identical across
    * engines — ln() is the one operation IEEE-754 does not require correctly
    * rounded (libm implementations differ in the last ulp), while integer
    * multiply + one double division ARE exact-rounded everywhere, so the
    * ratio variant's scores and therefore its ranking are cross-engine
    * deterministic (see QEntry's determinism contract). Ties (identical
    * score) break on the term itself, so output order is total either way.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      logIdf: Boolean = true
  ): DataFrame = {
    // explode_outer, not explode: a bare generator makes Catalyst infer a
    // size()>0 filter with the tokenizer re-inlined below the project
    // (InferFiltersFromGenerate) — same hazard Dedup documents
    val toks = docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf_cnt"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf =
      if (logIdf) log((col("n_docs") + 1).cast("double") / (col("doc_freq") + 1))
      else (col("tf_cnt") * col("n_docs")).cast("double") / col("doc_freq")
    val score =
      if (logIdf) col("tf_cnt") * idf
      else idf // ratio variant folds tf into the exact integer product
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf_cnt"), col("doc_freq"), col("tfidf"), col("rank"))
  }

  /** Signed hashing-trick features (Weinberger et al. 2009): each token maps
    * to bucket h(t) mod `dim` with a ±1 sign from an independent hash bit,
    * and the doc's feature value at a bucket is the signed token-count sum —
    * the unbiased sparse representation linear models train on when the
    * vocabulary is unbounded.
    *
    * Hashes are md5-derived so a SQL oracle replays them: bucket from the
    * first 8 hex chars, sign from the parity of the 9th — independent
    * digits of one digest, the cheap stand-in for two hash functions.
    * Plan: explode → narrow hash projection → one (doc, bucket) hash-agg
    * with map-side combine. State per group is one BIGINT; output is at most
    * `dim` rows per doc regardless of doc length. Zero-sum buckets (equal
    * +1/−1 mass) are kept: dropping them would make the representation
    * depend on which collisions occurred, and downstream consumers treat
    * absent ≡ never-touched.
    */
  def featureHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64
  ): DataFrame = {
    require(dim > 0, "dim must be positive")
    val toks = docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
    toks
      .select(
        col(idCol),
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"), lit(dim.toLong))
          .as("bucket"),
        when(conv(substring(md5(col("term")), 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L)
          .as("_sign")
      )
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("_sign")).cast("long").as("feat"))
  }

  /** Per-group dictionary coverage: the share of tokens covered by the
    * corpus's top-`vocabK` vocabulary, reported as an exact-integer OOV
    * rate in ppm — the vocabulary-coverage audit run before committing to a
    * tokenizer or a pruned embedding table. Vocabulary rank ties break on
    * the term itself, so the vocab set (and therefore every downstream
    * number) is deterministic.
    *
    * Plan: token explode → vocabulary hash-agg (vocabulary-sized, thanks to
    * map-side combine) → top-k TakeOrdered (never a global sort) →
    * BROADCAST membership join (vocab is k rows by construction) → one
    * per-group partial agg. No data-sized shuffle after the TF agg.
    */
  /** Interpolated add-one bigram cross-entropy per document (bits/bigram) —
    * the KenLM-class perplexity quality filter one order up from the unigram
    * signal (`txt_lm_cross_entropy`): score each document by how surprising
    * its word TRANSITIONS are under the corpus's own bigram statistics.
    * Repetitive/templated text (high-count transitions) scores low; novel
    * word orderings score high — the standard "perplexity filter" cut.
    *
    * Model: p(cur|prev) = λ·(c₂+1)/(c₁+V) + (1−λ)·(c_uni+1)/(T+V) — add-one
    * smoothed bigram interpolated with the add-one unigram (c₂ = bigram
    * count, c₁ = context count, V = vocabulary size, T = token count; all
    * EXACT BIGINTs, so both engines see identical probabilities up to two
    * correctly-rounded double divisions). Per-bigram-TYPE bits quantize to
    * 9 decimals → DECIMAL before the per-doc sum (summation-order-free, the
    * same ladder as [[Curation.dsirWeights]]); the final bits/bigram is one
    * double division rounded to 6.
    *
    * Shapes: bigram stream is a narrow per-row array transform (positions
    * from the token array — no window, no self-join); stats are two partial
    * aggs whose state is bigram-vocabulary-sized; the stats join back to
    * the stream on the (prev, cur) key — vocabulary-sized build side, which
    * AQE broadcasts when it fits and shuffles when a web-scale bigram table
    * doesn't. Docs with fewer than two tokens have no transitions and drop
    * out (no 0/0 row).
    *
    * @return (id, n_bigrams, bigram_entropy)
    */
  def bigramCrossEntropy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.75
  ): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, "lambda in (0, 1]")
    val ws = TextAnalysis.tokens(col(textCol))
    val toks = docs
      .select(col(idCol), explode(ws).as("term"))
      .filter(col("term") =!= "")
    val uni = toks.groupBy("term").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(
      sum("cu").cast("long").as("t"),
      count(lit(1)).cast("long").as("v")
    )
    val bgStream = docs
      .select(col(idCol), ws.as("_ws"))
      .filter(size(col("_ws")) >= 2)
      .select(
        col(idCol),
        // Spark SQL array indexing is 0-based: position i (1-based, 2..n)
        // pairs _ws[i-2] (prev) with _ws[i-1] (cur)
        explode(
          expr("transform(sequence(2, size(_ws)), i -> struct(_ws[i-2] AS prev, _ws[i-1] AS cur))")
        ).as("_bg")
      )
      .select(col(idCol), col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
    val bg = bgStream.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
    val ctx = bg.groupBy("prev").agg(sum("c2").as("c1"))
    val ratio = bg
      .join(ctx, "prev")
      .join(uni.withColumnRenamed("term", "cur"), "cur")
      .crossJoin(broadcast(tot))
      .select(
        col("prev"),
        col("cur"),
        round(
          -log2(
            lit(lambda) * ((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")) +
              lit(1.0 - lambda) * ((col("cu") + 1).cast("double") / (col("t") + col("v")).cast("double"))
          ),
          9
        ).cast("decimal(18,9)").as("bits")
      )
    bgStream
      .join(ratio, Seq("prev", "cur"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(
          sum(col("bits")).cast("decimal(28,9)").cast("double") / count(lit(1)),
          6
        ).as("bigram_entropy")
      )
  }

  /** Stupid-backoff trigram cross-entropy (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale LM scoring
    * scheme that skips normalization entirely): score `scoreDocs` under
    * counts from `modelDocs` with
    * S(w|u,v) = c(uvw)/c(uv) if the trigram was seen,
    * else α·c(vw)/c(v) if the bigram was, else α²·(c(w)+1)/(N+V)
    * (add-one unigram floor so unseen words stay finite — the one
    * departure from pure stupid backoff, documented). The model/score
    * split is what makes backoff REAL: scoring a corpus under its own
    * counts never leaves the trigram tier.
    *
    * Exactness: all counts exact BIGINTs; each tier's score is
    * correctly-rounded double arithmetic in a fixed expression shape, so
    * both engines compute identical doubles; per-trigram-TYPE bits
    * quantize to 9 decimals → DECIMAL before the order-free per-doc sum
    * (the [[bigramCrossEntropy]] ladder). Per-tier hit counts ride along —
    * the model-coverage diagnostic that tells a pipeline how much of a
    * shard's probability mass came from backoff.
    *
    * Shapes: model tables are n-gram-vocabulary-sized partial aggs; the
    * scoring stream joins them by n-gram key at TYPE granularity (distinct
    * trigrams of the scored shard), then bits join back to the stream —
    * the stream ships twice, the model tables once each, nothing
    * quadratic.
    *
    * @return (id, n_trigrams, n_tri_hit, n_bi_hit, n_uni, backoff_entropy)
    */
  def stupidBackoffEntropy(
      modelDocs: DataFrame,
      scoreDocs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4
  ): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    val ws = TextAnalysis.tokens(col(textCol))
    val mToks = modelDocs.select(explode(ws).as("term")).filter(col("term") =!= "")
    val cu = mToks.groupBy("term").agg(count(lit(1)).as("c1"))
    val tot = cu.agg(
      sum("c1").cast("long").as("n"),
      count(lit(1)).cast("long").as("v")
    )
    val mW = modelDocs.select(ws.as("_ws"))
    val bg = mW
      .filter(size(col("_ws")) >= 2)
      .select(
        explode(
          expr("transform(sequence(2, size(_ws)), i -> struct(_ws[i-2] AS p, _ws[i-1] AS c))")
        ).as("_b")
      )
      .groupBy(col("_b.p").as("p"), col("_b.c").as("c"))
      .agg(count(lit(1)).as("c2"))
    val triExpr =
      "transform(sequence(3, size(_ws)), i -> struct(_ws[i-3] AS p2, _ws[i-2] AS p1, _ws[i-1] AS cur))"
    val tg = mW
      .filter(size(col("_ws")) >= 3)
      .select(explode(expr(triExpr)).as("_t"))
      .groupBy(col("_t.p2").as("p2"), col("_t.p1").as("p1"), col("_t.cur").as("cur"))
      .agg(count(lit(1)).as("c3"))
    val ss = scoreDocs
      .select(col(idCol), ws.as("_ws"))
      .filter(size(col("_ws")) >= 3)
      .select(col(idCol), explode(expr(triExpr)).as("_t"))
      .select(
        col(idCol),
        col("_t.p2").as("p2"),
        col("_t.p1").as("p1"),
        col("_t.cur").as("cur")
      )
    val ty = ss.select("p2", "p1", "cur").distinct()
    val joined = ty
      .join(tg, Seq("p2", "p1", "cur"), "left")
      .join(bg.select(col("p").as("p2"), col("c").as("p1"), col("c2").as("d3")), Seq("p2", "p1"), "left")
      .join(bg.select(col("p").as("p1"), col("c").as("cur"), col("c2").as("n2")), Seq("p1", "cur"), "left")
      .join(cu.select(col("term").as("p1"), col("c1").as("d2")), Seq("p1"), "left")
      .join(cu.select(col("term").as("cur"), col("c1").as("u1")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
    val a = lit(alpha)
    val sVal = when(col("c3").isNotNull, col("c3").cast("double") / col("d3"))
      .when(col("n2").isNotNull, a * (col("n2").cast("double") / col("d2")))
      .otherwise(
        a * a * ((coalesce(col("u1"), lit(0L)) + 1).cast("double") / (col("n") + col("v")))
      )
    val tier = when(col("c3").isNotNull, 3).when(col("n2").isNotNull, 2).otherwise(1)
    val bits = joined.select(
      col("p2"),
      col("p1"),
      col("cur"),
      tier.as("tier"),
      round(-log2(sVal), 9).cast("decimal(18,9)").as("bits")
    )
    ss.join(bits, Seq("p2", "p1", "cur"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("tier") === 3, 1L).otherwise(0L)).cast("long").as("n_tri_hit"),
        sum(when(col("tier") === 2, 1L).otherwise(0L)).cast("long").as("n_bi_hit"),
        sum(when(col("tier") === 1, 1L).otherwise(0L)).cast("long").as("n_uni"),
        round(
          sum(col("bits")).cast("decimal(28,9)").cast("double") / count(lit(1)),
          6
        ).as("backoff_entropy")
      )
  }

  def dictionaryCoverage(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      vocabK: Int = 1000
  ): DataFrame = {
    val toks = docs
      .select(col(groupCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
    val vocab = toks
      .groupBy("term")
      .agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("term"))
      .limit(vocabK)
      .select(col("term"), lit(1L).as("_in"))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("tokens"),
        sum(coalesce(col("_in"), lit(0L))).cast("long").as("in_vocab")
      )
      .select(
        col(groupCol),
        col("tokens"),
        col("in_vocab"),
        expr("(tokens - in_vocab) * 1000000 div tokens").cast("long").as("oov_ppm")
      )
  }

  /** Good-Turing count re-estimation table (Good 1953) — the
    * frequency-of-frequencies view under every classical smoother: for each
    * observed unigram count class r, the number of types N_r seen exactly r
    * times and the Good-Turing adjusted count r* = (r+1)·N_{r+1}/N_r — the
    * expected count a type seen r times "really" has, which is also where
    * the probability mass for UNSEEN types (N_1/N) comes from. Restricted
    * to classes whose successor class exists (raw GT is undefined across
    * N_{r+1} = 0 gaps; smoothed variants interpolate, this table reports
    * the raw estimator).
    *
    * Two grouped aggregates (term counts → class counts, both map-side
    * combining) plus a self-join on r+1 over the CLASS table — at most
    * max-count rows, metadata-sized at any corpus scale. Exact integer
    * ratios in double, rounded once.
    *
    * @return up to `topN` rows, smallest r first: (r, n_r, r_star)
    */
  def goodTuringTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int = 20
  ): DataFrame = {
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("term").agg(count(lit(1)).as("r"))
    val classes = tf.groupBy("r").agg(count(lit(1)).cast("long").as("n_r")).localCheckpoint()
    val next = classes.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
    classes
      .join(next, "r")
      .select(
        col("r"),
        col("n_r"),
        round((col("r") + 1) * (col("n_r1").cast("double") / col("n_r")), 6).as("r_star")
      )
      .orderBy("r")
      .limit(topN)
  }

  /** Good-Turing missing-mass estimate — the scalar the [[goodTuringTable]]
    * exists to justify: the probability that the NEXT token drawn is a type
    * never seen in this corpus is P₀ = N₁/N (singleton types over total
    * tokens, Good 1953), the standard coverage answer to "how much of the
    * language does this corpus still miss". Reported with the raw
    * ingredients so the estimate is auditable: type/token counts, singleton
    * and doubleton type counts, P₀ in ppm (exact integral division) and as
    * a rounded double.
    *
    * One corpus-sized token explode, then type-table aggregates — the
    * shuffle carries term TYPES after map-side combine.
    *
    * @return one row: (n_types, n_tokens, n1, n2, p0_ppm, p_unseen)
    */
  def goodTuringUnseenMass(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    toks
      .groupBy("term")
      .agg(count(lit(1)).as("r"))
      .agg(
        count(lit(1)).cast("long").as("n_types"),
        sum("r").cast("long").as("n_tokens"),
        sum(when(col("r") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("r") === 2, 1L).otherwise(0L)).cast("long").as("n2")
      )
      .select(
        col("n_types"),
        col("n_tokens"),
        col("n1"),
        col("n2"),
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr("n1 * 1000000 div n_tokens"))
          .cast("long")
          .as("p0_ppm"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(round(col("n1").cast("double") / col("n_tokens"), 6))
          .as("p_unseen")
      )
  }

  /** Interpolated Kneser-Ney bigram table (Kneser & Ney 1995, Chen &
    * Goodman 1999) — the smoothing the add-k / stupid-backoff tiers
    * approximate: the corpus's top-`topN` bigrams with their full KN
    * decomposition,
    *
    *   P_KN(cur|prev) = max(c(prev,cur) − D, 0) / c(prev)
    *                  + D · N₁₊(prev,·) / c(prev) · P_cont(cur)
    *   P_cont(cur)    = N₁₊(·,cur) / |bigram types|
    *   D              = n₁ / (n₁ + 2·n₂)       (absolute discount estimate)
    *
    * where N₁₊ are distinct-continuation counts and n₁/n₂ the counts of
    * bigram types seen exactly once/twice. Continuation probability — "how
    * many contexts does this word FOLLOW" — is what distinguishes KN from
    * every frequency-interpolated smoother, and all of it is count algebra:
    * three grouped aggregates over the bigram stream plus one broadcast
    * scalar row, so the only corpus-sized pass is the token explode (the
    * shuffle carries bigram TYPES after map-side combine). Every ratio is
    * exact-integer-count division in double, rounded once — an external
    * engine replays it bit-for-bit.
    *
    * @return topN rows: (prev, cur, c2, c1, p_kn) ordered by c2 desc, then
    *         (prev, cur)
    */
  def knBigramTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int = 30
  ): DataFrame = {
    val ws = TextAnalysis.tokens(col(textCol))
    val bgStream = docs
      .select(col(idCol), ws.as("_ws"))
      .filter(size(col("_ws")) >= 2)
      .select(
        explode(
          expr("transform(sequence(2, size(_ws)), i -> struct(_ws[i-2] AS prev, _ws[i-1] AS cur))")
        ).as("_bg")
      )
      .select(col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
    val bg = bgStream.groupBy("prev", "cur").agg(count(lit(1)).as("c2")).localCheckpoint()
    val ctx = bg.groupBy("prev").agg(
      sum("c2").cast("long").as("c1"),
      count(lit(1)).cast("long").as("nf") // N₁₊(prev,·): distinct continuations
    )
    val cont = bg.groupBy("cur").agg(count(lit(1)).cast("long").as("np")) // N₁₊(·,cur)
    val disc = bg.agg(
      sum(when(col("c2") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
      sum(when(col("c2") === 2, 1L).otherwise(0L)).cast("long").as("n2"),
      count(lit(1)).cast("long").as("bt") // |bigram types|
    )
    bg
      .join(ctx, "prev")
      .join(cont, "cur")
      .crossJoin(broadcast(disc))
      // degenerate corpus (no singleton/doubleton bigram types — every
      // bigram frequent): the discount estimate is 0/0; D = 0 reduces KN to
      // the MLE c2/c1, the correct no-discount limit
      .withColumn(
        "_d",
        when(col("n1") + lit(2) * col("n2") === 0, lit(0.0))
          .otherwise(col("n1").cast("double") / (col("n1") + lit(2) * col("n2"))))
      .select(
        col("prev"),
        col("cur"),
        col("c2"),
        col("c1"),
        round(
          greatest(col("c2") - col("_d"), lit(0.0)) / col("c1") +
            ((col("_d") * col("nf")) / col("c1")) *
            (col("np").cast("double") / col("bt")),
          6
        ).as("p_kn")
      )
      .orderBy(col("c2").desc, col("prev"), col("cur"))
      .limit(topN)
  }

  /** Conditional bigram entropy H(cur|prev) = H(prev,cur) − H(prev) — the
    * ENTROPY-RATE estimate of the corpus (bits of new information per
    * token given one token of context) that sits under every perplexity
    * number in this battery: unigram cross-entropy bounds it from above,
    * and the gap H(unigram) − H(cond) is exactly the predictability that
    * bigram LMs (add-k, backoff, KN) monetize. Both entropies compute over
    * the SAME bigram stream (the prev-marginal, not the raw unigram table,
    * so the chain rule holds exactly); per-type terms quantize to 9-dp
    * DECIMAL (order-free sums), the subtraction is exact decimal, and the
    * shuffle carries bigram TYPES after map-side combine.
    *
    * @return one row: (n_bigrams, h_joint, h_prev, h_cond)
    */
  def conditionalEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = TextAnalysis.tokens(col(textCol))
    val bgStream = docs
      .select(col(idCol), ws.as("_ws"))
      .filter(size(col("_ws")) >= 2)
      .select(
        explode(
          expr("transform(sequence(2, size(_ws)), i -> struct(_ws[i-2] AS prev, _ws[i-1] AS cur))")
        ).as("_bg")
      )
      .select(col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
    val bg = bgStream.groupBy("prev", "cur").agg(count(lit(1)).cast("long").as("c2"))
      .localCheckpoint() // joint terms, prev marginal and the total re-read it
    val tot = bg.agg(sum("c2").cast("long").as("bt"))
    def hTerm(c: Column): Column =
      round(
        -(c.cast("double") / col("bt")) * log2(c.cast("double") / col("bt")),
        9
      ).cast("decimal(18,9)")
    val hJoint = bg
      .crossJoin(broadcast(tot))
      .agg(sum(hTerm(col("c2"))).cast("decimal(28,9)").as("hj"))
    val hPrev = bg
      .groupBy("prev")
      .agg(sum("c2").cast("long").as("c1"))
      .crossJoin(broadcast(tot))
      .agg(
        sum(hTerm(col("c1"))).cast("decimal(28,9)").as("hp"),
        max("bt").as("n_bigrams")
      )
    hPrev
      .crossJoin(broadcast(hJoint))
      .select(
        col("n_bigrams"),
        round(col("hj").cast("double"), 6).as("h_joint"),
        round(col("hp").cast("double"), 6).as("h_prev"),
        round((col("hj") - col("hp")).cast("double"), 6).as("h_cond")
      )
  }

  /** Witten-Bell smoothing per domain (Witten & Bell 1991, method C — the
    * escape-probability smoother of the PPM compressors and the third
    * member of this engine's classical ladder beside Good-Turing and
    * Kneser-Ney): within a domain with N tokens and T observed types,
    *
    *   P_wb(seen w)  = c(w) / (N + T)
    *   escape mass   = T / (N + T)     (probability the next token is NEW)
    *
    * — the T "first occurrence" events stand in for the unseen-type count
    * the way GT uses singletons. Reported per domain with its top term's
    * raw and smoothed mass so the discount is auditable, everything an
    * exact integer ppm division. One token explode; both aggregates
    * map-side combine (the shuffle carries (domain, term) TYPES); the
    * top-term window partitions by domain.
    *
    * @return one row per domain: (domainCols…, n_tokens, n_types,
    *         escape_ppm, top_term, top_count, p_top_ppm)
    */
  def wittenBellTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCols: Seq[String] = Seq("source")
  ): DataFrame = {
    require(domainCols.nonEmpty, "wittenBellTable needs at least one domain column")
    val dcols = domainCols.map(col)
    val toks = docs
      .select(dcols :+ explode(TextAnalysis.tokens(col(textCol))).as("term"): _*)
      .filter(col("term") =!= "")
    val tf = toks
      .groupBy(dcols :+ col("term"): _*)
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint() // stats and top-term both re-read the type table
    val stats = tf
      .groupBy(dcols: _*)
      .agg(
        sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types")
      )
    val w = Window
      .partitionBy(dcols: _*)
      .orderBy(col("c").desc, col("term"))
    val top = tf
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(dcols ++ Seq(col("term").as("top_term"), col("c").as("top_count")): _*)
    stats
      .join(top, domainCols)
      .select(
        dcols ++ Seq(
          col("n_tokens"),
          col("n_types"),
          expr("n_types * 1000000 div (n_tokens + n_types)").cast("long").as("escape_ppm"),
          col("top_term"),
          col("top_count"),
          expr("top_count * 1000000 div (n_tokens + n_types)").cast("long").as("p_top_ppm")
        ): _*
      )
  }
}
