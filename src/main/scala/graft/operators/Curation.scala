package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-curation operators a large-scale training-data pipeline runs after
  * dedup and before training: eval-set decontamination, PII redaction,
  * repetition-based quality signals, and token-budget sequence packing.
  *
  * Everything is column expressions + equi-joins + keyed windows — the shapes
  * that survive 100 TB. No driver loops, no UDFs, and every operator has a
  * portable DuckDB twin (see [[graft.queries.CurationQueries]]).
  */
object Curation {

  /** Train/eval contamination pairs: training docs sharing at least
    * `minOverlap` distinct word k-grams with an eval doc, with the overlap
    * count. The join key is the shingle (shuffle on a scalar string key, same
    * shape as [[Dedup.ngramJaccardPairs]]) — |overlap| arrives as the
    * join-group count, so no per-pair set materializes and the eval side,
    * being small, broadcasts. This is the standard n-gram decontamination
    * check (eval benchmarks leaking into pretraining corpora).
    */
  def contaminationPairs(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minOverlap: Int = 1
  ): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as), TextAnalysis.tokens(col(textCol)).as("_ws"))
        .select(col(as), array_distinct(Dedup.shinglesFromWords(col("_ws"), k)).as("_shs"))
        .select(col(as), explode_outer(col("_shs")).as("_sh"))
        .filter(col("_sh").isNotNull)
    shingled(train, "train_id")
      .join(broadcast(shingled(eval, "eval_id")), "_sh")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minOverlap)
  }

  // PII patterns, ASCII-simplified so the identical regex runs under both
  // Java regex and DuckDB's RE2. Deliberately conservative shapes: emails,
  // IPv4s, and long digit runs (account/phone-number-ish).
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val LongDigitsPattern = "[0-9]{9,}"

  /** Per-document PII counts + the scrubbed text with typed placeholders.
    * Order matters: emails first (they contain digits/dots), then IPv4s,
    * then long digit runs.
    */
  def piiScrub(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, LongDigitsPattern, "<NUM>")
  }

  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("bigint"),
    size(regexp_extract_all(regexp_replace(text, EmailPattern, "<EMAIL>"), lit(Ipv4Pattern), lit(0)))
      .cast("bigint"),
    size(
      regexp_extract_all(
        regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), Ipv4Pattern, "<IP>"),
        lit(LongDigitsPattern),
        lit(0)
      )
    ).cast("bigint")
  )

  /** Luhn checksum validity of a digit string — the check that separates
    * real card numbers from order ids and phone numbers, cutting the
    * false-positive redactions a bare digit-run regex ([[piiScrub]])
    * makes: from the right, double every second digit (folding > 9 by
    * −9), sum, valid iff ≡ 0 (mod 10). Pure higher-order column
    * expressions (transform/aggregate) — fuses into the scan, no UDF.
    */
  def luhnValid(digits: Column): Column = {
    val chars = split(reverse(digits), "")
    aggregate(
      transform(
        sequence(lit(1), length(digits)),
        i => {
          val d = element_at(chars, i).cast("int")
          when(i % 2 === 0, when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        }
      ),
      lit(0),
      (a, x) => a + x
    ) % 10 === 0
  }

  /** Redact every Luhn-VALID 13–19-digit run in `text` with `<CARD>`,
    * leaving invalid runs (ids, timestamps, tracking numbers) untouched —
    * checksum-gated PII scrubbing. Candidates come from one
    * `regexp_extract_all`, validity from [[luhnValid]] inside a lambda,
    * and the replacement folds over the valid list — still a single
    * projection, no join, no UDF.
    */
  def redactValidCards(text: Column): Column =
    aggregate(
      filter(regexp_extract_all(text, lit("[0-9]{13,19}"), lit(0)), c => luhnValid(c)),
      text,
      (acc, c) => regexp_replace(acc, c, lit("<CARD>"))
    )

  /** Word-repetition quality stats (the Gopher-style repetition signal):
    * per-doc total/distinct token counts, the most-frequent token's share,
    * and the duplicate-word ratio. Explode → two-level hash aggregate —
    * partial aggregation keeps the shuffle at one row per (doc, word).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_ws"))
      .select(col(idCol), explode_outer(col("_ws")).as("_w"))
      .filter(col("_w").isNotNull && col("_w") =!= "")
    words
      .groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(
        sum("_c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("_c").as("_maxc")
      )
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_distinct"),
        round(col("_maxc").cast("double") / col("n_tokens"), 4).as("top_token_ratio"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4).as("dup_ratio")
      )
  }

  /** Token-budget sequence packing: within each `partCols` stratum, assign
    * docs (in `idCol` order) to consecutive packs of ~`budget` tokens via a
    * running token total — pack k holds the docs whose cumulative count lands
    * in (k*budget, (k+1)*budget]. The window is PARTITIONED (keyed shuffle +
    * sort): packing parallelizes across strata, which is how you'd shard it
    * at 100 TB (per language/source/date-bucket), never one global order.
    */
  def packByTokenBudget(
      df: DataFrame,
      partCols: Seq[String],
      idCol: String,
      textCol: String,
      budget: Int
  ): DataFrame = {
    require(partCols.nonEmpty, "packByTokenBudget needs stratum columns — a global pack order would serialize")
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      partCols.map(col) ++ Seq(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("bigint").as("n_tokens")
      ): _*
    ).withColumn("pack_id", floor((sum("n_tokens").over(w) - 1) / budget).cast("bigint"))
  }

  /** Length-bucketed batching report: docs padded to the next multiple of
    * `bucketWidth` tokens batch with near-zero waste, vs padding everything
    * to the corpus max — the throughput read that decides a training run's
    * bucketing config before any GPU burns a cycle on pad tokens. Per
    * bucket: doc count, real tokens, pad tokens, waste share; every row also
    * carries `global_pad_ppm`, the waste of the UNBUCKETED pad-to-max
    * baseline on the same corpus, so the win is read off one frame.
    *
    * One data-sized partial aggregate (bucket count is tokens/width —
    * tiny); the baseline scalar is a broadcast crossJoin of the bucket
    * table's own rollup, so the corpus is touched exactly once. All exact
    * BIGINT; ppm by integer division.
    *
    * @param df      one row per doc with an integral token count
    * @return one row per occupied bucket: (bucket, n_docs, sum_tokens,
    *         pad_tokens, waste_ppm, global_pad_ppm)
    */
  def paddingWasteReport(df: DataFrame, tokensCol: String, bucketWidth: Int): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val buckets = df
      .select(
        expr(s"(($tokensCol + ${bucketWidth - 1}L) div ${bucketWidth}L) * ${bucketWidth}L")
          .cast("long")
          .as("bucket"),
        col(tokensCol).cast("long").as("_t")
      )
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_t")).cast("long").as("sum_tokens")
      )
    val global = buckets.agg(
      max(col("bucket")).as("_mb"),
      sum(col("n_docs")).cast("long").as("_n"),
      sum(col("sum_tokens")).cast("long").as("_s")
    )
    buckets
      .crossJoin(broadcast(global))
      .select(
        col("bucket"),
        col("n_docs"),
        col("sum_tokens"),
        (col("bucket") * col("n_docs") - col("sum_tokens")).as("pad_tokens"),
        // bucket 0 (a zero-token doc) pads nothing — avoid the ANSI
        // divide-by-zero instead of crashing the report on degenerate rows
        when(col("bucket") === 0L, 0L)
          .otherwise(expr("(bucket * n_docs - sum_tokens) * 1000000L div (bucket * n_docs)"))
          .cast("long")
          .as("waste_ppm"),
        when(col("_mb") === 0L, 0L)
          .otherwise(expr("(_mb * _n - _s) * 1000000L div (_mb * _n)"))
          .cast("long")
          .as("global_pad_ppm")
      )
  }

  /** Quality-quantile band filter: keep documents whose heuristic quality
    * score sits in the [lo, hi] percentile band WITHIN each stratum (the
    * standard "drop the worst X% and the suspicious best Y%" curation step,
    * stratified so one language's score distribution never gates another's).
    * percent_rank is the exact rational (rank-1)/(n-1) — one correctly
    * rounded division, so scores and the band cut are engine-deterministic.
    * The window partitions by the stratum (shuffle key = window key).
    */
  def qualityBand(
      df: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      lo: Double,
      hi: Double
  ): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("quality"), col(idCol))
    df.select(
      col(idCol),
      col(strataCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality")
    ).withColumn("pct", percent_rank().over(w))
      .filter(col("pct") >= lo && col("pct") <= hi)
  }

  /** Token-budget trimming: training mixtures are specified in TOKENS, not
    * documents — "100 B tokens of web, 20 B of code" — so the sampler must
    * keep a deterministic prefix of each stratum until its token budget
    * fills, never a doc-count quota that drifts with length distribution.
    * Docs are taken in md5(id) order (a stable pseudo-random order —
    * reproducible across runs, engines and partitionings, immune to
    * ingest-order bias) and kept while the running token total stays within
    * the stratum's budget; documents are never split.
    *
    * One window keyed on the stratum (per-source sort parallelizes across
    * sources); budgets ride in on a broadcast join. At 100 TB this is the
    * same shuffle as any stratified rank — no global order anywhere.
    *
    * @param budgets one row per stratum: (strataCol, budget) — token budget
    * @return input plus (budget, cum_tokens, kept)
    */
  def tokenBudgetTrim(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      tokensCol: String,
      budgets: DataFrame
  ): DataFrame = {
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(budgets), strataCol)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .withColumn("kept", col("cum_tokens") <= col("budget"))
  }

  /** Generalization-lattice k-anonymity search (Incognito/Samarati shape,
    * restricted to full-domain generalization over two QI hierarchies):
    * evaluate EVERY (level_a, level_b) node of the lattice — class census,
    * min class size, rows below k — and flag the k-achieving node with the
    * least generalization (lowest level sum, ties toward keeping attribute
    * A specific). [[kAnonymity]] answers "is THIS release k-anonymous?";
    * this answers the operational question behind it — "how much do I have
    * to coarsen before it is?".
    *
    * One corpus scan projects all hierarchy levels into a narrow
    * checkpointed frame; each lattice node is then a class-cardinality
    * aggregate over that frame (grouping-sets in spirit — the shuffle
    * state per node is the class census, never rows). The lattice itself
    * is |levels_a|·|levels_b| rows of broadcast arithmetic.
    *
    * @param aLevels hierarchy for attribute A, most specific first, last
    *                typically a constant (full suppression)
    * @return one row per lattice node: (a_level, b_level, n_classes,
    *         min_class_size, risky_rows, achieves_k, is_choice)
    */
  def kAnonLattice(
      df: DataFrame,
      aLevels: Seq[Column],
      bLevels: Seq[Column],
      k: Long
  ): DataFrame = {
    require(aLevels.nonEmpty && bLevels.nonEmpty, "need at least one level per attribute")
    require(aLevels.size <= 9 && bLevels.size <= 9, "pick_key encoding assumes < 10 levels")
    val proj = df
      .select(
        aLevels.zipWithIndex.map { case (c, i) => c.cast("string").as(s"_a$i") } ++
          bLevels.zipWithIndex.map { case (c, i) => c.cast("string").as(s"_b$i") }: _*
      )
      .localCheckpoint()
    val nodes = for { i <- aLevels.indices; j <- bLevels.indices } yield proj
      .groupBy(col(s"_a$i"), col(s"_b$j"))
      .agg(count(lit(1)).cast("long").as("_cs"))
      .agg(
        lit(i.toLong).as("a_level"),
        lit(j.toLong).as("b_level"),
        count(lit(1)).cast("long").as("n_classes"),
        min(col("_cs")).cast("long").as("min_class_size"),
        sum(when(col("_cs") < k, col("_cs")).otherwise(0L)).cast("long").as("risky_rows")
      )
    val grid = nodes
      .reduce(_ unionAll _)
      .withColumn("achieves_k", col("min_class_size") >= k)
      // generalization cost: total levels climbed; ties keep A specific
      .withColumn("_pick", expr("(a_level + b_level) * 100 + a_level * 10 + b_level"))
    val best = grid
      .filter(col("achieves_k"))
      .agg(min(col("_pick")).as("_best"))
    grid
      .crossJoin(broadcast(best))
      .withColumn(
        "is_choice",
        col("achieves_k") && col("_best").isNotNull && col("_pick") === col("_best")
      )
      .drop("_pick", "_best")
  }

  /** Per-entity date shifting (HIPAA Safe-Harbor-style de-identification):
    * every entity's timestamps move by ONE deterministic md5-derived offset
    * in [−maxShiftDays, +maxShiftDays], so absolute dates are destroyed but
    * every within-entity interval — session gaps, retention windows,
    * sequence order — is preserved exactly. The offset is a pure function
    * of the entity key: reapplying the operator (or applying it on another
    * engine, or to another table sharing the key) shifts consistently,
    * which is what keeps cross-table joins on (entity, time) valid after
    * de-identification.
    *
    * A narrow projection — no shuffle, no state; the md5 is computed once
    * per row and the shift is integer µs arithmetic.
    *
    * @return input plus (offset_days, <tsCol>_shifted)
    */
  def dateShift(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      maxShiftDays: Int
  ): DataFrame = {
    require(maxShiftDays >= 1, "maxShiftDays must be positive")
    val span = 2L * maxShiftDays + 1
    val off = (conv(substring(md5(concat(lit("ds|"), col(entityCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % span - maxShiftDays).as("offset_days")
    df.withColumn("offset_days", off)
      .withColumn(
        s"${tsCol}_shifted",
        timestamp_micros(
          unix_micros(col(tsCol)) + col("offset_days") * lit(86400000000L)
        )
      )
  }

  /** Corpus card: the one-command dataset datasheet — the handful of
    * numbers every drop ships with (size, mix breadth, duplication, PII
    * exposure, length and quality tails) as a long (metric, value) frame,
    * so downstream tooling diffs two drops with one join. ONE aggregate
    * computes every metric in a single corpus scan (partial aggregation
    * does the work; the distinct counts are the only shuffled state), then
    * a 9-row unpivot — no metric costs a second pass.
    *
    * All values exact BIGINT: counts, sums, and count-distinct (exact, not
    * approx — a datasheet is an audit artifact; swap in approx_count_distinct
    * when 10⁹-key exactness is genuinely not worth its shuffle).
    */
  def corpusCard(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      langCol: String
  ): DataFrame = {
    val agg = df.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol))).cast("long").as("n_tokens"),
      sum(length(col(textCol))).cast("long").as("n_chars"),
      countDistinct(col(sourceCol)).cast("long").as("n_sources"),
      countDistinct(col(langCol)).cast("long").as("n_langs"),
      (count(lit(1)) - countDistinct(md5(col(textCol)))).cast("long").as("exact_dup_docs"),
      sum(when(col(textCol).rlike(EmailPattern), 1L).otherwise(0L))
        .cast("long")
        .as("email_docs"),
      sum(when(length(col(textCol)) < 100, 1L).otherwise(0L)).cast("long").as("short_docs"),
      sum(when(TextAnalysis.qualityScore(col(textCol)) >= 0.5, 1L).otherwise(0L))
        .cast("long")
        .as("quality_hi_docs")
    )
    agg.selectExpr(
      """stack(9,
        |  'n_docs', n_docs,
        |  'n_tokens', n_tokens,
        |  'n_chars', n_chars,
        |  'n_sources', n_sources,
        |  'n_langs', n_langs,
        |  'exact_dup_docs', exact_dup_docs,
        |  'email_docs', email_docs,
        |  'short_docs', short_docs,
        |  'quality_hi_docs', quality_hi_docs
        |) AS (metric, value)""".stripMargin.replaceAll("\\s+", " ")
    )
  }

  /** Proportional stride-scheduled mixture interleave: assign every doc a
    * virtual time vt = rank-within-source · 10⁶ div source-size (rank in
    * md5(id) order), so reading the corpus in vt order yields a stream
    * whose source mix matches the blend AT EVERY PREFIX — all sources
    * exhaust together at vt = 10⁶, none front-loads. This is stride
    * scheduling applied to data mixing: training stability cares about the
    * LOCAL mix of the stream, not just the global shares, and a
    * source-ordered concatenation (or an unlucky shuffle) feeds the model
    * one distribution for hours before switching.
    *
    * One window keyed on the source (rank + size share a frame); vt is a
    * narrow integer projection. Downstream, shard by hash and sort each
    * shard by vt — never a global sort; consumers read shards round-robin.
    *
    * @return input plus (vt_ppm, src_rank, src_n)
    */
  def strideInterleave(df: DataFrame, strataCol: String, idCol: String): DataFrame = {
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val ws = Window.partitionBy(col(strataCol))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("src_n", count(lit(1)).over(ws).cast("long"))
      .withColumn("vt_ppm", expr("src_rank * 1000000L div src_n").cast("long"))
  }

  /** Data-constrained epoch schedule (Muennighoff et al. 2023): when a
    * source's available tokens fall short of its target share, repeat it —
    * up to `maxEpochs` passes, beyond which repeated data stops helping —
    * and account exactly for what each source serves and what stays
    * unfilled. Per source: epochs = ⌈target/avail⌉ (capped), served =
    * min(target, maxEpochs·avail), deficit = target − served, repeat
    * factor in exact ppm of one pass.
    *
    * The avail side is a data-sized aggregate upstream of this call; the
    * schedule itself is sources-sized arithmetic on a broadcast join —
    * free at any corpus size.
    *
    * @param avail   one row per source: (strataCol, avail_tokens)
    * @param targets one row per source: (strataCol, target_tokens)
    */
  def epochSchedule(
      avail: DataFrame,
      targets: DataFrame,
      strataCol: String,
      maxEpochs: Int
  ): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    avail
      .join(broadcast(targets), strataCol)
      .select(
        col(strataCol),
        col("avail_tokens").cast("long").as("avail_tokens"),
        col("target_tokens").cast("long").as("target_tokens")
      )
      .withColumn(
        "epochs",
        when(col("avail_tokens") === 0L, 0L)
          .otherwise(
            least(
              expr("(target_tokens + avail_tokens - 1) div avail_tokens"),
              lit(maxEpochs.toLong)
            )
          )
          .cast("long")
      )
      .withColumn(
        "served_tokens",
        least(col("target_tokens"), col("epochs") * col("avail_tokens")).cast("long")
      )
      .withColumn("deficit_tokens", (col("target_tokens") - col("served_tokens")).cast("long"))
      .withColumn(
        "repeat_ppm",
        when(col("avail_tokens") === 0L, 0L)
          .otherwise(expr("served_tokens * 1000000L div avail_tokens"))
          .cast("long")
      )
  }

  /** Per-stratum quantile normalization: replace a raw score with its exact
    * rank position inside its own stratum's distribution, in integer ppm —
    * the cross-source calibration step that makes one global quality
    * threshold meaningful when each source's scorer has a different scale
    * ("keep top 30%" must mean top 30% OF EACH SOURCE, or the strictest
    * scorer silently deletes its source from the mix). norm_ppm =
    * (rank−1)·10⁶ div (n−1), rank by (value, tieCol) so ties are
    * deterministic; single-row strata normalize to 0.
    *
    * One window keyed on the stratum — a per-source sort, the same shuffle
    * shape as any stratified rank; nothing global.
    *
    * @return the input plus `norm_ppm`
    */
  def quantileNormalize(
      df: DataFrame,
      valueCol: String,
      strataCol: String,
      tieCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(valueCol), col(tieCol))
    val ws = Window.partitionBy(col(strataCol))
    df.withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(ws).cast("long"))
      .withColumn(
        "norm_ppm",
        when(col("_n") === 1L, 0L)
          .otherwise(expr("(_rk - 1) * 1000000L div (_n - 1)"))
          .cast("long")
      )
      .drop("_rk", "_n")
  }

  /** Sliding-window token chunking with overlap — the standard context-prep
    * op (RAG indexing, long-doc training windows): chunk k covers tokens
    * `[k·stride, k·stride + chunkTokens)`, so consecutive chunks share
    * `chunkTokens − stride` tokens. Start count is exact integer arithmetic
    * (`1 + ceil((n − chunkTokens)/stride)` for n > chunkTokens, else 1), so
    * every token is covered and no start begins at/after the end. Pure
    * per-row array expressions — no shuffle; the explode multiplies rows by
    * ~n/stride, the unavoidable output size.
    *
    * @return (id, chunk_id, start_tok, n_tok, chunk_text)
    */
  def chunkWithOverlap(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 64,
      stride: Int = 48
  ): DataFrame = {
    require(stride >= 1 && stride <= chunkTokens, s"need 1 <= stride <= chunkTokens")
    val n = size(col("_ws"))
    val nStarts =
      when(n <= chunkTokens, lit(1))
        .otherwise(floor((n - chunkTokens + stride - 1) / lit(stride.toDouble)).cast("int") + 1)
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_ws"))
      .select(
        col(idCol),
        col("_ws"),
        posexplode(sequence(lit(0), nStarts - 1)).as(Seq("chunk_id", "_k"))
      )
      .select(
        col(idCol),
        col("chunk_id").cast("bigint").as("chunk_id"),
        (col("_k") * stride).cast("bigint").as("start_tok"),
        least(size(col("_ws")) - col("_k") * stride, lit(chunkTokens))
          .cast("bigint")
          .as("n_tok"),
        array_join(slice(col("_ws"), col("_k") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text")
      )
  }

  /** Deterministic source-weighted mixture sampling — the "data mixing" step
    * of a pretraining pipeline: each source keeps the fraction of its rows
    * given by `weights` (sources absent from the map keep `defaultWeight`).
    * Membership is by md5 hash position of the row key
    * ([[Sampling.hashPosition]]), so the mixture is reproducible across
    * engines, runs, and partitionings, and upweighting a source later (e.g.
    * 0.25 → 0.5) KEEPS every previously-sampled row — hash-position sampling
    * is nested by construction, which rand() mixtures are not.
    *
    * A narrow filter expression: no shuffle, fuses into the scan.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0
  ): DataFrame = {
    val weight = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.filter(Sampling.hashPosition(col(keyCol)) < weight)
  }

  /** C4-style heuristic cleaning flags (Raffel et al. 2020 §2.2 adapted to a
    * whitespace-token corpus): minimum document length, mean-word-length band,
    * and stopword presence. Every rule is INTEGER arithmetic over counts —
    * the mean-word-length band is the cross-multiplied
    * `lo·words ≤ letters ≤ hi·words`, never a float division — so flags are
    * bit-identical across engines and partitionings.
    *
    * Narrow per-row expressions: no shuffle, fuses into the scan; the usual
    * consumer is a (lang, source) rollup of rule hit-counts (see
    * `cur_c4_filters`), whose shuffle carries only group rows.
    */
  def c4Rules(
      df: DataFrame,
      textCol: String,
      minWords: Int = 20,
      meanLenLo: Int = 3,
      meanLenHi: Int = 5,
      stopword: String = "the"
  ): DataFrame = {
    val t = col(textCol)
    val words = TextAnalysis.tokenCount(t)
    val letters = length(regexp_replace(t, "\\s", ""))
    df.withColumn("too_short", words < minWords)
      .withColumn(
        "wordlen_out",
        !(letters >= words * meanLenLo && letters <= words * meanLenHi)
      )
      .withColumn(
        "no_stopword",
        instr(concat(lit(" "), t, lit(" ")), s" $stopword ") === 0
      )
      .withColumn(
        "kept",
        !col("too_short") && !col("wordlen_out") && !col("no_stopword")
      )
  }

  /** Deterministic MLM-style token masking: token `p` of a document is
    * masked iff the md5 hash position of `"<id>:<p>"` falls below `rate` —
    * the same reproducibility contract as [[graft.operators.Sampling]]
    * (identical mask across engines, runs and partitionings, which an RNG
    * mask cannot give; re-runs of a training pipeline see the same tokens
    * hidden). Per-doc output: token count, masked count and the sorted
    * masked positions (state bounded by document length). Narrow explode +
    * one keyed aggregate.
    */
  def mlmMask(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double,
      fast: Boolean = false
  ): DataFrame = {
    val toks = docs
      .select(
        col(idCol),
        posexplode_outer(graft.functions.TextAnalysis.tokens(col(textCol)))
          .as(Seq("_p0", "_term"))
      )
      .select(col(idCol), (col("_p0") + 1).as("p"))
    val key = concat(col(idCol).cast("string"), lit(":"), col("p").cast("string"))
    // fast path: xxhash64 basis-point threshold (production hash, not
    // DuckDB-replayable) — same plan, benched as x_mlm_mask_fast
    val masked =
      if (fast) pmod(xxhash64(key), lit(10000L)) < (rate * 10000).toLong
      else Sampling.hashPosition(key) < rate
    toks
      .withColumn("_m", masked)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_m"), 1L).otherwise(0L)).as("n_masked"),
        array_join(
          array_sort(collect_list(when(col("_m"), col("p")))).cast("array<string>"),
          ","
        ).as("masked_positions")
      )
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document by how
    * much more likely its tokens are under a TARGET distribution than under
    * the RAW corpus distribution, using hashed unigram features —
    * `w(doc) = Σ_t [ln p̂_target(bucket(t)) − ln p̂_raw(bucket(t))]` with
    * add-one smoothing over `buckets` hashed vocabulary cells (the hashing
    * is what bounds the feature space at corpus scale; md5-derived so every
    * engine agrees on cell assignment). High-weight docs look like the
    * target slice; resampling by these weights steers a pretraining mixture
    * toward it.
    *
    * Shapes: the bucket statistics table is `buckets` rows — broadcast to
    * the token stream; the per-doc reduction quantizes each log-ratio to 9
    * decimals and sums as DECIMAL, so document scores are independent of
    * token summation order (float Σ is not); outputs round to 6 to absorb
    * libm ln() drift. One narrow explode, two partial-agg shuffles (bucket
    * stats, per-doc sum).
    *
    * @param targetPred rows where this predicate holds form the target slice
    * @param buckets    hashed vocabulary size (power of two conventional)
    */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 1024
  ): DataFrame = {
    val toks = docs
      .select(col(idCol), targetPred.as("_tgt"), explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
      .withColumn(
        "_b",
        pmod(conv(substring(md5(col("_t")), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))
      )
    val stats = toks
      .groupBy("_b")
      .agg(
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cr")
      )
    val totals = stats.agg(
      sum("_ct").cast("long").as("_nt"),
      sum("_cr").cast("long").as("_nr")
    )
    val ratio = stats
      .crossJoin(broadcast(totals))
      .select(
        col("_b"),
        round(
          log((col("_ct") + 1).cast("double") / (col("_nt") + buckets).cast("double")) -
            log((col("_cr") + 1).cast("double") / (col("_nr") + buckets).cast("double")),
          9
        ).cast("decimal(18,9)").as("_lr")
      )
    toks
      .join(broadcast(ratio), "_b")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("_lr").cast("decimal(28,9)").cast("double").as("_w")
      )
      .select(col(idCol), col("n_tokens"), round(col("_w"), 6).as("dsir_weight"))
  }

  /** fastText-style linear quality-classifier INFERENCE (Joulin et al. 2017,
    * the model family behind CCNet/GPT-3-era quality filters): each token
    * hashes into one of `buckets` weight slots, a document's logit is the
    * mean weight of its tokens, and the keep/drop label is the logit's sign.
    * The model arrives as a DataFrame — (bucket BIGINT, weight
    * DECIMAL(18,9)) — because at 100 TB the classifier IS data: a
    * `buckets`-row broadcast table joined against exploded tokens, partial
    * aggregation collapsing each doc map-side. Training happens offline
    * (this engine only scores); the oracle entry fabricates a deterministic
    * md5-derived weight table so inference is hash-checked end to end.
    *
    * Determinism ladder: weights are 9-dp DECIMAL quantized, the per-doc
    * sum is an order-free exact DECIMAL(28,9) aggregate, and the mean is
    * one correctly-rounded double division — bit-identical cross-engine
    * (same contract as [[dsirWeights]]). The label compares that identical
    * double against 0, so the cut is engine-stable too.
    *
    * @return one row per doc: (id, n_tokens, logit, label) — label 'keep'
    *         iff logit ≥ 0; empty-token docs carry n_tokens = 0,
    *         logit = 0.0, 'keep' (a classifier abstains on empty input)
    */
  def linearQualityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 256
  ): DataFrame = {
    val toks = docs
      .select(col(idCol), explode_outer(graft.functions.TextAnalysis.tokens(col(textCol))).as("_t"))
      .withColumn(
        "_b",
        when(
          col("_t").isNotNull && col("_t") =!= "",
          pmod(conv(substring(md5(col("_t")), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))
        )
      )
    toks
      .join(broadcast(weights.select(col("bucket").as("_b"), col("weight").as("_w"))), Seq("_b"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("_w")).as("n_tokens"),
        sum("_w").cast("decimal(28,9)").cast("double").as("_s")
      )
      .select(
        col(idCol),
        col("n_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(round(col("_s") / col("n_tokens"), 6))
          .as("logit")
      )
      .withColumn("label", when(col("logit") >= 0.0, lit("keep")).otherwise(lit("drop")))
  }

  /** Full-batch gradient-descent TRAINING of the linear quality classifier
    * (E412) — the missing half of [[linearQualityScore]]'s inference: given
    * a boolean label (a seed heuristic, an annotated slice), learn the
    * 256-bucket hashed bag-of-words weights by logistic regression, entirely
    * as joins and aggregates. Per step: z_d = round₆(Σ w_b·cnt_db / n_d)
    * (exact DECIMAL ladder, one division), p_d = ⌊10⁶·σ(z_d)⌋ quantized to
    * ppm, residual r_d = p_d − 10⁶·y_d (INTEGER), then q_d =
    * ⌊10³·r_d/n_d⌋ — the per-doc 1/n_d factor that makes the gradient
    * match the MEAN-feature forward pass (without it long documents pull
    * the weights proportionally harder than their own logit scaling, the
    * round-16 advisory): gradient g_b = Σ_d q_d·cnt_db (an exact integer
    * sum — summation-order-independent, so 1000 executors' partials merge
    * bit-identically; q_d's single floor-of-IEEE-division is pinned per
    * doc BEFORE the sum, never accumulated), update w_b ←
    * round₉(w_b − g_b/(n_docs·10⁹/lr)). The only libm calls (exp in σ)
    * happen on the round₆-pinned z and quantize immediately to an integer,
    * per DETERMINISM.md: no float ever accumulates.
    *
    * Scale shape: the weight table is bucket-sized (broadcast both ways);
    * each step is one broadcast join + two keyed partial aggs over the
    * token instances; the token table is pinned once with localCheckpoint
    * (steps reuse it), and the per-step weight table localCheckpoints to
    * cut the iterative lineage — the [[graft.queries]] PageRank/HITS
    * discipline.
    *
    * @param label boolean Column over `docs`' columns
    * @return (bucket, weight DOUBLE) — `buckets` rows, feedable to
    *         [[linearQualityScore]] after a decimal(18,9) cast
    */
  def trainLinearQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      buckets: Int = 256,
      steps: Int = 3,
      lr: Double = 4.0
  ): DataFrame = {
    require(buckets >= 2 && steps >= 1 && lr > 0.0, "need buckets>=2, steps>=1, lr>0")
    // one row per token instance; docs with no tokens have no features and
    // contribute nothing to z or the gradient (they'd score logit 0 at
    // inference regardless of weights)
    val tk = docs
      .select(
        col(idCol).as("_doc"),
        label.as("_y"),
        explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("_t")
      )
      .filter(col("_t") =!= "")
      .withColumn("_b", tokenBucket(col("_t"), buckets))
      .select("_doc", "_y", "_b")
      .localCheckpoint()
    trainFromTokenBuckets(tk, buckets, steps, lr)
  }

  /** The md5-prefix hashed-bag bucket both the trainer and scorer key
    * features by — factored out so multi-model callers ([[rhoLossSelect]])
    * tokenize and hash the corpus ONCE and share the frame.
    */
  private def tokenBucket(t: Column, buckets: Int): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** GD over an already-materialized token-instance frame (_doc, _y, _b) —
    * the post-tokenize body of [[trainLinearQuality]]. `tk` must be pinned
    * (localCheckpoint) by the caller: every step scans it twice.
    */
  private def trainFromTokenBuckets(
      tk: DataFrame,
      buckets: Int,
      steps: Int,
      lr: Double
  ): DataFrame = {
    val spark = tk.sparkSession
    // collapse token INSTANCES to (doc, bucket) COUNTS once: both per-step
    // scans (the z forward pass and the gradient scatter) are keyed sums
    // over the same counts, so every later join and shuffle carries one row
    // per distinct (doc, bucket) instead of one per token (guide §2.3 —
    // aggregate before you shuffle). Exactness is untouched: Σ w = w·cnt
    // and Σ r = r·cnt are exact in DECIMAL/integer arithmetic, so every
    // z, q and gradient is bit-identical to the instance-level ladder.
    // Within a step's job both branches contain the same aggregation
    // exchange, which the engine reuses (one shuffle, two readers).
    val db = tk.groupBy("_doc", "_y", "_b").agg(count(lit(1)).as("_cnt"))
    val nDocs = db.select("_doc").distinct().count()
    require(nDocs > 0, "trainLinearQuality needs at least one tokenized doc")
    // q_d carries ppm·10³ scaling (the 10³ is the 1/n_d quantization grain)
    val divisor = nDocs * (1000000000.0 / lr)
    var w = spark
      .range(buckets)
      .select(col("id").as("bucket"), lit(0.0).cast("decimal(18,9)").as("weight"))
    for (_ <- 1 to steps) {
      val z = db
        .join(
          broadcast(w.select(col("bucket").as("_b"), col("weight").as("_w"))),
          Seq("_b")
        )
        .groupBy("_doc", "_y")
        .agg(
          sum(col("_cnt")).cast("long").as("_n"),
          // _cnt is cast to decimal(10,0) so the product type is
          // decimal(29,9) — EXACT at scale 9; a bare bigint operand would
          // push precision past 38 and Spark would round the scale to 8
          sum(col("_w") * col("_cnt").cast("decimal(10,0)"))
            .cast("decimal(28,9)").cast("double").as("_s")
        )
        .select(col("_doc"), col("_y"), col("_n"), round(col("_s") / col("_n"), 6).as("_z"))
      val resid = z.select(
        col("_doc"),
        // q_d = floor(1000 * r_d / n_d): the mean-feature gradient scaling,
        // quantized to an integer per doc so the bucket sums stay exact
        floor(
          (floor(lit(1000000.0) / (lit(1.0) + exp(-col("_z")))).cast("long")
            - when(col("_y"), 1000000L).otherwise(0L)).cast("double")
            * 1000.0 / col("_n").cast("double"))
          .cast("long").as("_r")
      )
      val grad = db
        .join(resid, Seq("_doc"))
        .groupBy("_b")
        .agg(sum(col("_r") * col("_cnt")).cast("long").as("_g"))
      w = w
        .join(grad.select(col("_b").as("bucket"), col("_g")), Seq("bucket"), "left")
        .select(
          col("bucket"),
          round(
            col("weight").cast("double")
              - coalesce(col("_g"), lit(0L)).cast("double") / lit(divisor),
            9
          ).cast("decimal(18,9)").as("weight")
        )
        .localCheckpoint()
    }
    w.select(col("bucket"), col("weight").cast("double").as("weight"))
  }

  /** RHO-loss data selection (Mindermann et al. 2022, "Prioritized training
    * on points that are learnable, worth learning, and not yet learnt"):
    * rank training points by REDUCIBLE holdout loss — the gap between the
    * point's loss under the model trained on the training split and its
    * loss under a model trained on a held-out split:
    *
    *   rho(x) = L(x; θ_train) − L(x; θ_holdout)
    *
    * High rho = the training model still gets x wrong but the holdout model
    * (which never saw the training split) finds x predictable — learnable
    * and not yet learnt, exactly the batch worth spending compute on. Low
    * (negative) rho = noise/mislabeled (both models lose) or already learnt.
    * The selector the data-efficiency literature runs where loss-only
    * selection keeps feeding the model unlearnable noise.
    *
    * Built entirely on the exact-integer classifier machinery: both models
    * are [[trainLinearQuality]] runs (integer-gradient GD — bit-reproducible
    * across engines and partitionings), scoring is [[linearQualityScore]]'s
    * exact-DECIMAL mean-bucket-weight logit, probabilities are the
    * boundary-safe floor-ppm sigmoid clamped to [1, 999999] so the log-loss
    * is finite, and each loss lands as round(−ln(p), 9) → DECIMAL(18,9), so
    * rho is an exact DECIMAL difference reported in integer NANO-nats. The
    * top-k cut is (rho DESC, id ASC) via TakeOrdered — partial top-k per
    * partition before one k-row exchange, never a global sort.
    *
    * Docs whose training-split text has no tokens score logit 0 under both
    * models (rho = loss difference of identical constants = 0) — they stay
    * in the ranking but never beat a genuinely learnable doc.
    *
    * @param holdout boolean column: true → row trains the REFERENCE model
    *                and is excluded from selection; false → row trains the
    *                training model and is a selection candidate
    * @return k rows: (id, n_tokens, loss_tr_nano, loss_ho_nano, rho_nano)
    */
  def rhoLossSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      holdout: Column,
      k: Int,
      buckets: Int = 256,
      steps: Int = 2,
      lr: Double = 4.0
  ): DataFrame = {
    require(k > 0, "k > 0")
    // ONE tokenize + bucket-hash pass shared by both trainings and the
    // scoring (the holdout flag rides along) — the four separate passes
    // this used to run re-exploded and re-digested the same corpus each
    // time. Null _b marks the explode_outer placeholder of a token-less
    // doc (kept: such docs must still appear in the ranking at logit 0).
    val tokAll = docs
      .select(
        col(idCol).as("_doc"),
        label.as("_y"),
        holdout.as("_ho"),
        explode_outer(graft.functions.TextAnalysis.tokens(col(textCol))).as("_t")
      )
      .withColumn(
        "_b",
        when(col("_t").isNotNull && col("_t") =!= "", tokenBucket(col("_t"), buckets))
      )
      .select("_doc", "_y", "_ho", "_b")
      .localCheckpoint()
    def dec(w: DataFrame) =
      w.select(col("bucket"), col("weight").cast("decimal(18,9)").as("weight"))
    def tkSide(ho: Boolean) = tokAll
      .filter(col("_ho") === ho && col("_b").isNotNull)
      .select("_doc", "_y", "_b")
    val wHo = dec(trainFromTokenBuckets(tkSide(ho = true), buckets, steps, lr)
      .select(col("bucket"), col("weight").cast("double").as("weight")))
    val wTr = dec(trainFromTokenBuckets(tkSide(ho = false), buckets, steps, lr)
      .select(col("bucket"), col("weight").cast("double").as("weight")))
    // one scoring pass with BOTH weight tables joined in (was two separate
    // per-model aggregates over re-tokenized text): identical sums, the
    // n_tokens count rides on the training-model join exactly as before
    val scored = tokAll
      .filter(!col("_ho"))
      .join(broadcast(wTr.select(col("bucket").as("_b"), col("weight").as("_wt"))), Seq("_b"), "left")
      .join(broadcast(wHo.select(col("bucket").as("_b"), col("weight").as("_wh"))), Seq("_b"), "left")
      .groupBy(col("_doc"), col("_y"))
      .agg(
        count(col("_wt")).as("n_tokens"),
        sum("_wt").cast("decimal(28,9)").cast("double").as("_st"),
        sum("_wh").cast("decimal(28,9)").cast("double").as("_sh")
      )
      .select(
        col("_doc").as(idCol),
        col("_y"),
        col("n_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(round(col("_st") / col("n_tokens"), 6)).as("_ztr"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(round(col("_sh") / col("n_tokens"), 6)).as("_zho")
      )
    def pPpm(z: Column): Column =
      greatest(least(floor(lit(1000000.0) / (lit(1.0) + exp(-z))).cast("long"),
        lit(999999L)), lit(1L))
    def lossNano(p: Column, y: Column): Column =
      (when(y, round(-log(p.cast("double") / 1000000.0), 9))
        .otherwise(round(-log((lit(1000000L) - p).cast("double") / 1000000.0), 9))
        .cast("decimal(18,9)") * 1000000000L).cast("long")
    scored
      .select(
        col(idCol),
        col("n_tokens"),
        lossNano(pPpm(col("_ztr")), col("_y")).as("loss_tr_nano"),
        lossNano(pPpm(col("_zho")), col("_y")).as("loss_ho_nano")
      )
      .withColumn("rho_nano", col("loss_tr_nano") - col("loss_ho_nano"))
      .orderBy(col("rho_nano").desc, col(idCol))
      .limit(k)
  }

  /** Calibration report (reliability diagram + expected calibration error)
    * for a probabilistic quality classifier — the eval a pipeline runs
    * before trusting a score as a sampling weight: scores (exact ppm
    * integers in [0, 1e6]) bucket into `bins` equal-width bins; per bin
    * the mean confidence, the empirical accuracy against the boolean
    * label, and their gap; ECE = Σ n_b·|acc_b − conf_b| / N rides along
    * on every row. ALL integer arithmetic (ppm means via integer
    * division), so the report is hash-exact — no float summation
    * anywhere. One keyed partial agg over bin (≤ `bins` groups), one
    * scalar rollup.
    *
    * @param scored (…, scorePpmCol LONG in [0, 1e6], labelCol BOOLEAN)
    * @return (bin, n_docs, conf_ppm, acc_ppm, gap_ppm, ece_ppm)
    */
  def calibrationReport(
      scored: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame = {
    val b = scored
      .select(
        expr(s"least($scorePpmCol * $bins div 1000000L, ${bins - 1}L)")
          .cast("long").as("bin"),
        col(scorePpmCol).as("_s"),
        when(col(labelCol), 1L).otherwise(0L).as("_y")
      )
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_s")).cast("long").as("_ssum"),
        sum(col("_y")).cast("long").as("_pos")
      )
      .withColumn("conf_ppm", expr("_ssum div n_docs"))
      .withColumn("acc_ppm", expr("_pos * 1000000L div n_docs"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
    val ece = b.agg(
      expr("sum(n_docs * gap_ppm) div sum(n_docs)").cast("long").as("ece_ppm")
    )
    b.crossJoin(broadcast(ece))
      .select("bin", "n_docs", "conf_ppm", "acc_ppm", "gap_ppm", "ece_ppm")
  }

  /** Precision/recall/F1 threshold sweep for a ppm-scored binary
    * classifier — the operating-point picker that pairs with
    * [[calibrationReport]] (calibration says whether the score is honest;
    * this says where to CUT it). One row per decision threshold
    * k·(10^6/bins): predict positive when score_ppm lands in bin ≥ k, so
    * TP/FP at every threshold come from ONE descending cumulative window
    * over the bins-row bin table — the data is touched once by the binning
    * aggregate, never per-threshold. All counts exact BIGINT; P/R/F1 are
    * exact integer ppm with zero-denominator → 0 conventions.
    *
    * @return one row per threshold: (threshold_ppm, tp, fp, fn,
    *         precision_ppm, recall_ppm, f1_ppm)
    */
  def prCurve(
      scored: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame = {
    val c = scored
      .select(
        expr(s"least($scorePpmCol * $bins div 1000000L, ${bins - 1}L)")
          .cast("long").as("_bin"),
        when(col(labelCol), 1L).otherwise(0L).as("_y")
      )
      .groupBy(col("_bin"))
      .agg(
        sum(col("_y")).cast("long").as("_np"),
        sum(lit(1L) - col("_y")).cast("long").as("_nn")
      )
    val grid = scored.sparkSession
      .range(bins)
      .select(col("id").cast("long").as("_bin"))
      .join(c, Seq("_bin"), "left")
      .na
      .fill(0L, Seq("_np", "_nn"))
    val wDesc = Window
      .partitionBy(lit(0))
      .orderBy(col("_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.agg(sum(col("_np")).cast("long").as("_post"))
    grid
      .withColumn("tp", sum(col("_np")).over(wDesc).cast("long"))
      .withColumn("fp", sum(col("_nn")).over(wDesc).cast("long"))
      .crossJoin(broadcast(tot))
      .select(
        expr(s"_bin * (1000000L div $bins)").cast("long").as("threshold_ppm"),
        col("tp"),
        col("fp"),
        (col("_post") - col("tp")).as("fn"),
        when(col("tp") + col("fp") === 0, 0L)
          .otherwise(expr("tp * 1000000L div (tp + fp)"))
          .cast("long")
          .as("precision_ppm"),
        when(col("_post") === 0, 0L)
          .otherwise(expr("tp * 1000000L div _post"))
          .cast("long")
          .as("recall_ppm")
      )
      .withColumn(
        "f1_ppm",
        when(col("precision_ppm") + col("recall_ppm") === 0, 0L)
          .otherwise(
            expr("2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm)")
          )
          .cast("long")
      )
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4), deterministic: a
    * span STARTS at token `p` of a document iff the md5 hash position of
    * `"<id>:<p>"` falls below `rate / spanLen` — the same engine/run/
    * partitioning-independent contract as [[mlmMask]] — and covers the next
    * `spanLen` tokens; overlapping or adjacent starts merge into one span.
    * Expected corrupted fraction ≈ `rate` (exactly `rate` in the
    * non-overlapping limit). The corrupted text replaces each merged span
    * with one `<extra_id_K>` sentinel, K numbered left-to-right per doc, as a
    * T5 encoder input would be.
    *
    * Shapes: coverage is a keyed trailing `spanLen−1` window over dense
    * 1-based positions (bounded frame — per-key state is `spanLen` rows at
    * any scale), span numbering a keyed running sum, reconstruction one keyed
    * aggregate whose state is bounded by document length. No global windows,
    * no driver-side data.
    */
  def spanCorrupt(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double = 0.15,
      spanLen: Int = 3
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(
        col(idCol),
        posexplode_outer(graft.functions.TextAnalysis.tokens(col(textCol)))
          .as(Seq("_p0", "_term"))
      )
      .select(col(idCol), (col("_p0") + 1).as("p"), col("_term"))
    val key = concat(col(idCol).cast("string"), lit(":"), col("p").cast("string"))
    val wCover = Window
      .partitionBy(idCol)
      .orderBy("p")
      .rowsBetween(-(spanLen - 1), Window.currentRow)
    val wOrd = Window.partitionBy(idCol).orderBy("p")
    val marked = toks
      .withColumn("_st", Sampling.hashPosition(key) < rate / spanLen)
      .withColumn("_cov", max(when(col("_st"), 1).otherwise(0)).over(wCover) === 1)
      .withColumn(
        "_open",
        col("_cov") && !coalesce(lag("_cov", 1).over(wOrd), lit(false))
      )
      .withColumn("_k", sum(when(col("_open"), 1L).otherwise(0L)).over(wOrd))
    val outTok = when(!col("_cov"), col("_term"))
      .when(col("_open"), concat(lit("<extra_id_"), (col("_k") - 1).cast("string"), lit(">")))
    marked
      .withColumn("_out", outTok)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_cov"), 1L).otherwise(0L)).as("n_corrupted"),
        sum(when(col("_open"), 1L).otherwise(0L)).as("n_spans"),
        array_join(
          array_sort(collect_list(when(col("_cov"), col("p")))).cast("array<string>"),
          ","
        ).as("corrupted_positions"),
        array_join(
          expr("transform(array_sort(collect_list(CASE WHEN _out IS NOT NULL THEN struct(p, _out) END)), x -> x._out)"),
          " "
        ).as("corrupted_text")
      )
  }

  /** Code-vs-prose screen: the symbol-density heuristic curation pipelines
    * run to route source code away from (or into) a text corpus — braces,
    * brackets, semicolons, operators as a ppm of characters, thresholded.
    * Everything is exact integer arithmetic on regexp-stripped lengths
    * (codegen'd, no UDF); per-doc columns so callers can filter, flag, or
    * aggregate. A doc with no characters is prose by definition (0 ppm).
    */
  def codeScreen(
      df: DataFrame,
      textCol: String,
      thresholdPpm: Long = 20000L
  ): DataFrame = {
    val t = col(textCol)
    val symbols = length(t) - length(regexp_replace(t, "[{}\\[\\]();=<>]", ""))
    df.withColumn("n_chars_", length(t).cast("long"))
      .withColumn("symbols", symbols.cast("long"))
      .withColumn(
        "symbol_ppm",
        when(col("n_chars_") === 0L, 0L)
          .otherwise(expr("symbols * 1000000L div n_chars_"))
          .cast("long")
      )
      .withColumn("is_code", col("symbol_ppm") >= thresholdPpm)
      .drop("n_chars_")
  }

  /** k-anonymity audit over a quasi-identifier column set: how many
    * equivalence classes fall below k, and what share of rows they expose.
    * The release gate privacy review runs AFTER piiScrub — a scrubbed corpus
    * can still re-identify via rare attribute combinations. One partial agg
    * over the class keys + a one-row rollup; class cardinality (≤ the QI
    * domain product) bounds state regardless of corpus size.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "kAnonymity needs columns and k >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(
        lit(k.toLong).as("k"),
        count(lit(1)).cast("long").as("n_classes"),
        min(col("class_size")).cast("long").as("min_class_size"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).cast("long")
          .as("n_risky_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .cast("long").as("n_risky_rows"),
        sum(col("class_size")).cast("long").as("n_rows")
      )
      .withColumn(
        "risky_ppm",
        expr("n_risky_rows * 1000000L div n_rows").cast("long")
      )
  }

  /** l-diversity + t-closeness audit per quasi-identifier class — the two
    * follow-ups to [[kAnonymity]] (Machanavajjhala 2007; Li et al. 2007): a
    * class can be k-large yet expose its members because every row shares
    * one sensitive value (l = 1), or because its sensitive DISTRIBUTION
    * diverges from the corpus's (t-closeness, measured as the exact 1-D
    * earth-mover distance over the ordered sensitive domain). EMD is
    * computed entirely in integers: prefix-sum differences are compared in
    * units of 1/(n_g·N) — Σ_j |cumP_j·N − cumQ_j·n_g| — and normalized by
    * (m−1) to ppm with one integral division, so the audit hash-verifies
    * cross-engine.
    *
    * Plan shape: three key-partial aggregates (class, class×value,
    * global value), a class×domain grid (domain cardinality m is tiny —
    * broadcast), one keyed window for the prefix sums. Nothing scales
    * beyond classes×m.
    *
    * @return one row per class: (quasiCols…, class_size, l_distinct,
    *         emd_ppm)
    */
  def privacyAudit(df: DataFrame, quasiCols: Seq[String], sensCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "privacyAudit needs quasi-identifier columns")
    val qc = quasiCols.map(col)
    val base = df.select((quasiCols :+ sensCol).map(col): _*)
    val classes = base.groupBy(qc: _*).agg(count(lit(1)).cast("long").as("class_size"))
    val classBand = base
      .groupBy((quasiCols :+ sensCol).map(col): _*)
      .agg(count(lit(1)).cast("long").as("_p"))
    val globalBand = base.groupBy(col(sensCol)).agg(count(lit(1)).cast("long").as("_q"))
    val tot = base.agg(
      count(lit(1)).cast("long").as("_n_total"),
      countDistinct(col(sensCol)).cast("long").as("_m")
    )
    val win = Window
      .partitionBy(qc: _*)
      .orderBy(col(sensCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes
      .crossJoin(broadcast(globalBand))
      .join(classBand, quasiCols :+ sensCol, "left")
      .na
      .fill(0L, Seq("_p"))
      .withColumn("_cp", sum(col("_p")).over(win))
      .withColumn("_cq", sum(col("_q")).over(win))
      .crossJoin(broadcast(tot))
      .groupBy((qc :+ col("class_size") :+ col("_m") :+ col("_n_total")): _*)
      .agg(
        sum(abs(col("_cp") * col("_n_total") - col("_cq") * col("class_size")))
          .cast("long")
          .as("_dsum"),
        sum(when(col("_p") > 0, 1L).otherwise(0L)).cast("long").as("l_distinct")
      )
      .select(
        (qc :+ col("class_size") :+ col("l_distinct") :+
          when(col("_m") <= 1, 0L)
            .otherwise(
              expr("_dsum * 1000000 div (class_size * _n_total * (_m - 1))")
            )
            .cast("long")
            .as("emd_ppm")): _*
      )
  }

  // ---- HTML main-content extraction (jusText-lite) -----------------------
  // Patterns are ASCII, quote-free and backslash-free so the IDENTICAL
  // string runs under Java regex and DuckDB's RE2 (the oracle twin).

  /** script/style payloads and comments — removed before segmentation. */
  val HtmlNoisePattern =
    "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"

  /** Closing block-level tags: each one ends a candidate text block. */
  val HtmlBlockBreakPattern =
    "</p>|</div>|</li>|</h[1-6]>|</td>|</tr>|</title>|<br[^>]*>"

  /** Any remaining tag (replaced by a space before tokenization). */
  val HtmlTagPattern = "<[^>]*>"

  /** Anchor inner text (group 1) — the link-density numerator. */
  val HtmlAnchorPattern = "<a[^>]*>(.*?)</a>"

  val HtmlStopwords: Seq[String] = Seq("the", "a")

  /** Block-level boilerplate classification of an HTML column — a
    * deterministic jusText-lite (Pomikálek 2011): strip script/style/
    * comments, segment on closing block tags, and classify each block by
    * three signals real extractors use — minimum token count, LINK density
    * (anchor-text chars per plain-text char: navigation/footer blocks are
    * mostly links) and STOPWORD density (genuine prose carries function
    * words; token soup and SHOUTING navigation don't). Densities are exact
    * integer ppm (`x·10⁶ div max(d,1)`) so the keep/drop cut is
    * bit-identical cross-engine — no float division anywhere.
    *
    * Narrow per-row expressions (regex strip → split → posexplode →
    * per-block arithmetic): no shuffle, fuses into the scan; output rows =
    * blocks, the unavoidable fan-out. At 100 TB this is the first stage of
    * the corpus — everything downstream (dedup, quality, packing) reads its
    * survivors, so keeping it shuffle-free matters.
    *
    * @return (id, block_id, block_text, n_chars, n_tokens, link_ppm,
    *         stop_ppm, is_content); empty blocks (no plain-text chars) are
    *         dropped, block_id is the 1-based pre-drop segment position
    */
  def htmlBlocks(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minTokens: Int = 5,
      maxLinkPpm: Long = 250000L,
      minStopPpm: Long = 20000L,
      stopwords: Seq[String] = HtmlStopwords
  ): DataFrame = {
    val cleaned = regexp_replace(col(htmlCol), HtmlNoisePattern, " ")
    val segmented = regexp_replace(cleaned, HtmlBlockBreakPattern, "\n")
    val anchorChars = aggregate(
      transform(
        regexp_extract_all(col("_raw"), lit(HtmlAnchorPattern), lit(1)),
        x => length(x).cast("long")
      ),
      lit(0L),
      (a, x) => a + x
    )
    df.select(col(idCol), split(segmented, "\n").as("_bs"))
      .select(col(idCol), posexplode(col("_bs")).as(Seq("_p", "_raw")))
      .withColumn("block_id", (col("_p") + 1).cast("bigint"))
      .withColumn("_anchor_chars", anchorChars)
      .withColumn(
        "block_text",
        trim(regexp_replace(regexp_replace(col("_raw"), HtmlTagPattern, " "), "\\s+", " "))
      )
      .withColumn("_toks", filter(split(col("block_text"), " "), t => t =!= ""))
      .withColumn("n_chars", length(col("block_text")).cast("bigint"))
      .withColumn("n_tokens", size(col("_toks")).cast("bigint"))
      .withColumn(
        "_stop",
        size(filter(col("_toks"), t => t.isin(stopwords: _*))).cast("bigint")
      )
      .withColumn("link_ppm", expr("_anchor_chars * 1000000L div greatest(n_chars, 1L)"))
      .withColumn("stop_ppm", expr("_stop * 1000000L div greatest(n_tokens, 1L)"))
      .withColumn(
        "is_content",
        col("n_tokens") >= minTokens &&
          col("link_ppm") < maxLinkPpm &&
          col("stop_ppm") >= minStopPpm
      )
      .filter(col("n_chars") > 0)
      .select(
        col(idCol),
        col("block_id"),
        col("block_text"),
        col("n_chars"),
        col("n_tokens"),
        col("link_ppm"),
        col("stop_ppm"),
        col("is_content")
      )
  }

  /** Main-content extraction: the per-document rollup of [[htmlBlocks]] —
    * content blocks concatenated in document order (the extracted article),
    * plus block/keep counts for the curation audit. One keyed aggregate;
    * state bounded by document length. A doc whose every block is
    * boilerplate survives with `n_kept = 0` and empty `main_text`, so the
    * extraction stage never silently drops documents — the filter decision
    * stays with the caller.
    */
  def extractMainContent(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minTokens: Int = 5,
      maxLinkPpm: Long = 250000L,
      minStopPpm: Long = 20000L,
      stopwords: Seq[String] = HtmlStopwords
  ): DataFrame =
    htmlBlocks(df, idCol, htmlCol, minTokens, maxLinkPpm, minStopPpm, stopwords)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("is_content"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          expr(
            "transform(array_sort(collect_list(" +
              "CASE WHEN is_content THEN struct(block_id, block_text) END)), x -> x.block_text)"
          ),
          " | "
        ).as("main_text")
      )

  /** Naive single-pass HTML entity decode — the post-extraction cleanup a
    * web corpus needs before tokenization (`&amp;` in anchor text, `&nbsp;`
    * padding, numeric apostrophes): a fixed replace chain over the five
    * named entities HTML4 guarantees plus `&#39;`. `&amp;` decodes LAST so
    * the chain is one logical pass over the original text (the usual naive
    * ordering; doubly-encoded text like `&amp;lt;` therefore decodes twice
    * — acceptable for corpus cleaning, documented here). Pure narrow string
    * expressions; the identical chain replays under DuckDB.
    */
  def decodeHtmlEntities(text: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&nbsp;" -> " ",
      "&amp;" -> "&"
    )
    steps.foldLeft(text) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Entity occurrences in the raw text (decode-audit numerator). */
  def htmlEntityCount(text: Column): Column =
    size(regexp_extract_all(text, lit("&(lt|gt|quot|amp|nbsp|#39);"), lit(0))).cast("bigint")

  /** Canonical URL normalization — the fetch-dedup key of a web pipeline
    * (the same raw page arrives as `HTTP://Site.COM:80/a/?utm_source=x` and
    * `http://site.com/a`; crawling both doubles cost and duplicates the
    * corpus). Deterministic, both-engine-replayable steps:
    *   1. fragment stripped (never sent to the server),
    *   2. scheme + host lowercased, default ports :80/:443 dropped,
    *   3. tracking params (utm_ prefix) dropped, remaining query params
    *      SORTED (param order is transport-irrelevant),
    *   4. trailing path slashes stripped (`/a/` ≡ `/a`; the root path
    *      normalizes to the bare host).
    * Pure regex/array expressions — fuses into the scan; the normalized
    * string is the group key for crawl dedup and per-site rollups.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[^:/]+://([^/?#]+)", 1))
    val host = regexp_replace(hostport, ":(80|443)$", "")
    val pathq = regexp_extract(noFrag, "^[^:/]+://[^/?#]+(.*)$", 1)
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "[?](.*)$", 1)
    val params = array_sort(
      filter(split(query, "&"), p => p =!= "" && substring(p, 1, 4) =!= "utm_")
    )
    concat(
      scheme,
      lit("://"),
      host,
      path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    )
  }

  /** Host (lowercased, default ports stripped) of an absolute URL. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[^:/]+://([^/?#]+)", 1)), ":(80|443)$", "")

  /** Path component of an absolute URL ('' for bare host). */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[^:/]+://[^/?#]+([^?#]*)", 1)

  /** Outlink extraction + resolution — the step that turns an extracted
    * page into crawl-frontier candidates: every `href="…"` anchor target,
    * resolved against the page's own URL. Resolution tiers (each a regex
    * test, both-engine replayable):
    *   - absolute (`scheme://…`) → kept as-is,
    *   - protocol-relative (`//host/…`) → base scheme prepended,
    *   - root-relative (`/…`) → base scheme://host prepended,
    *   - document-relative → base DIRECTORY prepended (no `../` algebra —
    *     dot-segment links are a vanishing fraction of a crawl and a
    *     correctness rabbit hole; they resolve textually, documented),
    *   - fragment-only / javascript: / mailto: → dropped (not fetchable).
    * Callers pipe the output through [[normalizeUrl]] for frontier dedup.
    * Narrow explode — rows = anchors, the unavoidable fan-out.
    *
    * @return (id, href, url) — raw attribute value and resolved URL
    */
  def extractLinks(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      baseUrlCol: String
  ): DataFrame = {
    // resolution parts re-derive from the carried _base column (the raw
    // base-url column does not survive the explode projection)
    val scheme = lower(regexp_extract(col("_base"), "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostRoot = concat(scheme, lit("://"), urlHost(col("_base")))
    val dir = concat(hostRoot, regexp_replace(urlPath(col("_base")), "[^/]*$", ""))
    df.select(
      col(idCol),
      regexp_replace(col(baseUrlCol), "#.*$", "").as("_base"),
      explode_outer(
        regexp_extract_all(col(htmlCol), lit("<a[^>]*href=\"([^\"]*)\""), lit(1))
      ).as("href")
    ).filter(
      col("href").isNotNull && col("href") =!= "" &&
        !col("href").startsWith("#") &&
        !col("href").startsWith("javascript:") &&
        !col("href").startsWith("mailto:")
    ).select(
      col(idCol),
      col("href"),
      when(col("href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), col("href"))
        .when(col("href").startsWith("//"), concat(scheme, lit(":"), col("href")))
        .when(col("href").startsWith("/"), concat(hostRoot, col("href")))
        .otherwise(concat(dir, col("href")))
        .as("url")
    )
  }

  /** Anchor extraction with the LINK TEXT attached — the input to anchor-
    * text aggregation ([[anchorTextRollup]]), the classic off-page
    * relevance signal (what OTHER pages call a target). Same resolution
    * tiers and unfetchable-target drops as [[extractLinks]]; the anchor's
    * inner text comes along whitespace-collapsed and trimmed. The match is
    * restricted to simple `<a …>text</a>` anchors (no nested tags inside
    * the anchor body) — the dominant shape by far, and the one that's
    * regex-exact in both engines.
    *
    * @return (id, href, anchor_text, url)
    */
  def extractAnchors(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      baseUrlCol: String
  ): DataFrame = {
    val scheme = lower(regexp_extract(col("_base"), "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostRoot = concat(scheme, lit("://"), urlHost(col("_base")))
    val dir = concat(hostRoot, regexp_replace(urlPath(col("_base")), "[^/]*$", ""))
    df.select(
      col(idCol),
      regexp_replace(col(baseUrlCol), "#.*$", "").as("_base"),
      explode_outer(
        regexp_extract_all(
          col(htmlCol),
          lit("<a[^>]*href=\"[^\"]*\"[^>]*>[^<]*</a>"),
          lit(0)
        )
      ).as("_a")
    ).filter(col("_a").isNotNull)
      .select(
        col(idCol),
        col("_base"),
        regexp_extract(col("_a"), "href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_replace(regexp_extract(col("_a"), ">([^<]*)</a>", 1), "\\s+", " "))
          .as("anchor_text")
      )
      .filter(
        col("href") =!= "" &&
          !col("href").startsWith("#") &&
          !col("href").startsWith("javascript:") &&
          !col("href").startsWith("mailto:")
      )
      .select(
        col(idCol),
        col("href"),
        col("anchor_text"),
        when(col("href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), col("href"))
          .when(col("href").startsWith("//"), concat(scheme, lit(":"), col("href")))
          .when(col("href").startsWith("/"), concat(hostRoot, col("href")))
          .otherwise(concat(dir, col("href")))
          .as("url")
      )
  }

  /** Anchor-text aggregation per link target: for every (canonical) target
    * URL, how many anchors point at it, how many distinct texts they use,
    * and the dominant text with its count — ties on count break to the
    * lexicographically GREATEST text (one `max(struct(count, text))`
    * aggregate resolves count-then-text in a single pass, and the
    * direction is deterministic in any engine). Empty anchor texts
    * (image/icon links) are excluded. Two keyed partial aggs; state is
    * (target, text)-cardinality-sized — anchors never ship twice.
    *
    * @return (url, n_anchors, n_texts, top_text, top_n)
    */
  def anchorTextRollup(anchors: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val cnt = anchors
      .filter(col(textCol) =!= "")
      .groupBy(col(urlCol), col(textCol))
      .agg(count(lit(1)).as("cnt"))
    cnt
      .groupBy(col(urlCol))
      .agg(
        sum(col("cnt")).cast("long").as("n_anchors"),
        count(lit(1)).cast("long").as("n_texts"),
        max(struct(col("cnt").as("cnt"), col(textCol).as("t"))).as("_top")
      )
      .select(
        col(urlCol),
        col("n_anchors"),
        col("n_texts"),
        col("_top.t").as("top_text"),
        col("_top.cnt").cast("long").as("top_n")
      )
  }

  /** robots.txt-style prefix screen: a URL is blocked iff ANY rule row
    * (host, path prefix) matches its host exactly and its path by prefix —
    * the crawl-politeness gate between frontier generation and fetch.
    * Host-keyed equi-join (the rules table is per-site-small and
    * broadcasts; a web-scale rule set shuffles on the host key), prefix
    * test as a startswith filter, one keyed aggregate back to a row per
    * URL with the matched-rule count.
    *
    * @param rules (host, prefix) disallow rows
    * @return input columns + n_rules_matched + allowed
    */
  def robotsScreen(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame
  ): DataFrame = {
    // rule matching runs over DISTINCT urls — a url shared by many input
    // rows must not multiply its per-rule match count
    val distinctUrls = urls
      .select(col(urlCol))
      .distinct()
      .withColumn("_host", urlHost(col(urlCol)))
      .withColumn("_path", urlPath(col(urlCol)))
    val matched = distinctUrls
      .join(rules.select(col("host").as("_host"), col("prefix")), Seq("_host"))
      .filter(col("_path").startsWith(col("prefix")))
      .groupBy(col(urlCol))
      .agg(count(lit(1)).as("n_rules_matched"))
    urls
      .join(matched, Seq(urlCol), "left")
      .withColumn("n_rules_matched", coalesce(col("n_rules_matched"), lit(0L)))
      .withColumn("allowed", col("n_rules_matched") === 0L)
  }

  /** RFC-9309-style robots decision — [[robotsScreen]] grown into the real
    * Allow/Disallow semantics (one user-agent group; group selection is a
    * per-site parse concern upstream of this set-oriented matcher): among
    * all rules whose host matches exactly and whose path prefix matches,
    * the MOST SPECIFIC (longest prefix) rule decides, and at equal length
    * Allow beats Disallow; a URL no rule matches is allowed. The decision
    * reduces to one aggregate: `max(struct(len, allow))` — struct ordering
    * compares length first, then the boolean (false < true), which IS the
    * longest-match-then-allow-wins precedence.
    *
    * Same shapes as [[robotsScreen]]: distinct-URL match (shared URLs
    * can't multiply rule work), host-keyed equi-join (rule tables
    * broadcast when per-site-small, shuffle on host at web scale), one
    * keyed agg, left-join back to every input row.
    *
    * @param rules (host, prefix, allow) rows
    * @return input columns + matched_len + allowed
    */
  def robotsDecision(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame
  ): DataFrame = {
    val distinctUrls = urls
      .select(col(urlCol))
      .distinct()
      .withColumn("_host", urlHost(col(urlCol)))
      .withColumn("_path", urlPath(col(urlCol)))
    val best = distinctUrls
      .join(
        rules.select(col("host").as("_host"), col("prefix"), col("allow")),
        Seq("_host")
      )
      .filter(col("_path").startsWith(col("prefix")))
      .groupBy(col(urlCol))
      .agg(
        max(
          struct(length(col("prefix")).cast("long").as("len"), col("allow").as("allow"))
        ).as("_best")
      )
      .select(
        col(urlCol),
        col("_best.len").as("matched_len"),
        col("_best.allow").as("allowed")
      )
    urls
      .join(best, Seq(urlCol), "left")
      .withColumn("matched_len", coalesce(col("matched_len"), lit(0L)))
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }

  /** WARC-lite record splitting — the stage in FRONT of [[htmlBlocks]]:
    * a crawl archive column (many concatenated `WARC/1.0` records, each
    * headers + blank line + body) explodes into per-record rows with the
    * target URI, declared Content-Length, the body, and a length audit
    * flag. "Lite": newline-delimited (`\n`, not CRLF) and header
    * extraction limited to the two fields a corpus pipeline consumes —
    * the full spec's chunked/continuation records are out of scope.
    *
    * Narrow split + posexplode per archive row: parallelism = archives ×
    * records, no shuffle — at 100 TB the archive FILES are the input
    * splits and this operator is the map side of the whole corpus.
    *
    * @return (id, rec_id, uri, content_length, body, body_len, length_ok)
    */
  def parseWarcLite(df: DataFrame, idCol: String, warcCol: String): DataFrame =
    df.select(
      col(idCol),
      posexplode(split(col(warcCol), "WARC/1\\.0\n")).as(Seq("_p", "_r"))
    ).filter(col("_p") >= 1)
      .select(
        col(idCol),
        col("_p").cast("bigint").as("rec_id"),
        regexp_extract(col("_r"), "(?m)^WARC-Target-URI: (.*)$", 1).as("uri"),
        regexp_extract(col("_r"), "(?m)^Content-Length: (.*)$", 1)
          .cast("long")
          .as("content_length"),
        regexp_replace(regexp_extract(col("_r"), "(?s)\\n\\n(.*)$", 1), "\\n$", "")
          .as("body")
      )
      .withColumn("body_len", length(col("body")).cast("bigint"))
      .withColumn("length_ok", col("body_len") === col("content_length"))

  /** Temperature-scaled source mixture at α = 0.5 (UNICODE-style
    * multilingual rebalancing, Lample & Conneau 2019: wᵢ ∝ nᵢ^α — α < 1
    * upsamples small sources): per-source doc counts, √n quantized to
    * integer micro-units (sqrt and one double multiply are both IEEE
    * correctly-rounded, so the quantized value is bit-identical in any
    * engine; summation is then EXACT integer arithmetic — no float-sum
    * order anywhere), mixture weight in ppm, and milli-epochs each source
    * runs under a character budget. Two partial aggs, source-cardinality
    * state.
    */
  def temperatureMixture(
      df: DataFrame,
      srcCol: String,
      sizeCol: String,
      budgetChars: Long
  ): DataFrame = {
    val bySrc = df
      .groupBy(col(srcCol))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col(sizeCol)).cast("long").as("chars")
      )
      .withColumn("sq_micro", floor(sqrt(col("n_docs")) * lit(1000000.0)).cast("long"))
    val total = bySrc.agg(sum(col("sq_micro")).cast("long").as("sq_total"))
    bySrc
      .crossJoin(broadcast(total))
      .withColumn("w_ppm", expr("sq_micro * 1000000L div sq_total").cast("long"))
      // budget · w_ppm in DECIMAL(38,0): a BIGINT product silently wraps
      // (ANSI off) once budgetChars exceeds ~9.2e12 chars with w_ppm near
      // 1e6 — exactly the 100 TB corpora this mixer is for. The div brings
      // the value back ≤ budgetChars, so the later ×1000 stays in range for
      // any budget under ~9.2e15 chars (≈ 9 PB of text).
      .withColumn(
        "epochs_milli",
        expr(
          s"(CAST(${budgetChars} AS DECIMAL(38,0)) * w_ppm div 1000000L) * 1000L div chars"
        ).cast("long")
      )
      .select(srcCol, "n_docs", "chars", "w_ppm", "epochs_milli")
  }

  /** URL template key for crawler-trap mining: long (≥ 8) lowercase-hex
    * runs collapse to `{h}` FIRST (session ids, content hashes — a pure
    * digit run of 8+ is hex too and must not split into two tokens), then
    * any remaining digit run to `{n}`. Two global regex replaces — fuses
    * into the scan; the template is the group key under which a calendar,
    * pagination or session-id trap's unbounded URL space collapses to one
    * row.
    */
  def urlTemplate(urlNorm: Column): Column =
    regexp_replace(regexp_replace(urlNorm, "[0-9a-f]{8,}", "{h}"), "[0-9]+", "{n}")

  /** Crawler-trap report: distinct canonical URLs grouped by
    * [[urlTemplate]] — the fan-out audit a crawl scheduler runs before
    * committing fetch budget. A template whose distinct-URL count reaches
    * `minUrls` is flagged a trap candidate (calendar pages, faceted
    * search, session-id explosions — the URL spaces that grow without
    * bound while the content doesn't). One distinct pass + one
    * template-keyed aggregate; state is template-cardinality-sized, and
    * templates are bounded by site STRUCTURE, not corpus size — the 100 TB
    * report is small even when the frontier isn't.
    *
    * @return (template, n_urls, n_hosts, urls_per_host, sample_url, is_trap)
    */
  def crawlTrapReport(urls: DataFrame, urlCol: String, minUrls: Long): DataFrame =
    urls
      .select(col(urlCol))
      .distinct()
      .select(col(urlCol), urlTemplate(col(urlCol)).as("template"), urlHost(col(urlCol)).as("_host"))
      .groupBy(col("template"))
      .agg(
        count(lit(1)).cast("long").as("n_urls"),
        countDistinct(col("_host")).cast("long").as("n_hosts"),
        min(col(urlCol)).as("sample_url")
      )
      .withColumn("urls_per_host", expr("n_urls div n_hosts"))
      .withColumn("is_trap", col("n_urls") >= minUrls)
      .select("template", "n_urls", "n_hosts", "urls_per_host", "sample_url", "is_trap")

  /** Recrawl scheduling — the sitemap⋈fetch-log reconciliation a crawler
    * runs between visits: full-outer join on the canonical URL classifies
    * every URL as `new` (in the sitemap, never fetched), `stale`
    * (modified since the last fetch), `fresh` (fetch is current), or
    * `orphan` (fetched once, no longer advertised — the candidate for
    * index cleanup); `needs_fetch` = new ∨ stale. One URL-keyed full-outer
    * join, no windows — both inputs are URL-cardinality-sized state, and
    * at web scale the join shuffles on the same canonical-URL key every
    * other frontier op already uses.
    *
    * @param sitemap (url, lastmod DATE) rows
    * @param fetchLog (url, fetched_at DATE) rows
    * @return (url, lastmod, fetched_at, status, needs_fetch)
    */
  def recrawlSchedule(sitemap: DataFrame, fetchLog: DataFrame): DataFrame =
    sitemap
      .join(fetchLog, Seq("url"), "full_outer")
      .withColumn(
        "status",
        when(col("lastmod").isNull, "orphan")
          .when(col("fetched_at").isNull, "new")
          .when(col("lastmod") > col("fetched_at"), "stale")
          .otherwise("fresh")
      )
      .withColumn("needs_fetch", col("status").isin("new", "stale"))

  /** Max-min fair crawl-budget allocation (progressive filling / water-
    * filling, exact integers): split `budget` fetches across hosts so no
    * host gets more than its queue, hosts that fit are fully served, and
    * the rest share the remainder as evenly as integers allow — the
    * classic max-min fairness definition, solved in closed form on the
    * queue-sorted order. Host i (ascending by queue, ties on host) is
    * fully served iff serving EVERYONE at its level is affordable:
    * qᵢ·(n−i+1) + prefixᵢ₋₁ ≤ B. Past the last such rank k, each of the
    * m = n−k unsatisfied hosts gets ⌊rem/m⌋ with the first rem mod m (in
    * the same deterministic order) getting one extra; maximality of k
    * guarantees the share never exceeds any unsatisfied queue. Σalloc =
    * min(B, Σq) by construction.
    *
    * The global window ranks HOSTS — state is host-cardinality, orders of
    * magnitude below the frontier; if even that bottlenecks, the
    * two-phase global-rank idiom applies as in [[Fragmentation]].
    *
    * @return (host, queue, alloc, fully_served)
    */
  def maxMinFairBudget(
      hosts: DataFrame,
      hostCol: String,
      queueCol: String,
      budget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("queue"), col(hostCol))
    val ranked = hosts
      .select(col(hostCol), col(queueCol).cast("long").as("queue"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("prefix", sum(col("queue")).over(w).cast("long"))
    val nRow = ranked.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("queue")).cast("long").as("totq")
    )
    val afford = ranked
      .crossJoin(broadcast(nRow))
      .withColumn(
        "fully_served",
        col("queue") * (col("n") - col("i") + 1) + (col("prefix") - col("queue")) <= budget
      )
    val kRow = afford.agg(
      coalesce(max(when(col("fully_served"), col("i"))), lit(0L)).as("k"),
      coalesce(max(when(col("fully_served"), col("prefix"))), lit(0L)).as("pk")
    )
    afford
      .crossJoin(broadcast(kRow))
      .withColumn("m", col("n") - col("k"))
      .withColumn("rem", lit(budget) - col("pk"))
      .withColumn(
        "alloc",
        when(col("fully_served"), col("queue")).otherwise(
          expr("rem div m") + when(col("i") - col("k") <= expr("rem % m"), 1L).otherwise(0L)
        )
      )
      .select(col(hostCol), col("queue"), col("alloc").cast("long"), col("fully_served"))
  }

  /** Per-host politeness schedule — the fetch-queue assignment between
    * frontier and fetcher: each distinct URL gets a deterministic slot
    * within its host (URLs ordered by their own string — no arrival-order
    * nondeterminism) and an ETA of `(slot−1)·crawlDelayMs`, the earliest
    * fetch time a one-request-per-delay politeness budget allows. The
    * per-host URL count rides along so the dispatcher can see queue depth
    * (`makespan = (n_host_urls−1)·delay`) without a second pass.
    *
    * One shuffle keyed by host; the window sorts within each host only.
    * A pathological host holding a large share of the frontier serializes
    * its own partition — which is exactly what politeness REQUIRES
    * (those fetches must serialize anyway); if slot assignment itself ever
    * bottlenecks, the two-phase global-rank idiom
    * ([[Fragmentation]]'s round-robin ranking) applies per host.
    *
    * @return (url, host, slot, n_host_urls, eta_ms)
    */
  def fetchSchedule(urls: DataFrame, urlCol: String, crawlDelayMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col(urlCol))
    urls
      .select(col(urlCol))
      .distinct()
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("n_host_urls", count(lit(1)).over(Window.partitionBy(col("host"))).cast("long"))
      .withColumn("eta_ms", (col("slot") - 1) * lit(crawlDelayMs))
  }

  /** Split-conformal filtering gate (E418; Vovk's split-conformal recipe):
    * calibrate a per-group nonconformity threshold at the
    * ⌈(n_cal+1)·coverage⌉-th smallest calibration score — the
    * finite-sample-correct quantile that guarantees ≥ coverage of
    * exchangeable future points pass — then gate the test slice with it.
    * This is the distribution-free answer to "keep documents that look
    * like the calibration set", with a marginal coverage guarantee instead
    * of a tuned cutoff; coverage is a RATIONAL (num/den), so the rank k is
    * exact integer arithmetic, and the threshold is an order statistic of
    * exact integer scores — no float anywhere.
    *
    * When k exceeds n_cal the conformal threshold is +∞ (everything
    * passes) — reported as a null threshold with kept = all, the honest
    * small-calibration degeneracy.
    *
    * Plan shape: one group-keyed window over the calibration slice (ranks
    * within each group only); the test slice is gated by an INNER
    * broadcast-hash join with the group-cardinality gate table as the
    * build side, and gate groups with no test rows are restored by a
    * tiny-to-tiny left join after aggregation. Group cardinality bounds
    * all state. Test rows in groups with zero calibration rows are
    * excluded from the report (no threshold exists for them).
    *
    * @param calibPred boolean Column over `df` marking the calibration rows
    * @return one row per group: (groupCol, n_cal, k, threshold, n_test,
    *         n_kept, kept_ppm)
    */
  def conformalGate(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      calibPred: Column,
      coverageNum: Int = 9,
      coverageDen: Int = 10
  ): DataFrame = {
    require(coverageNum > 0 && coverageDen > 0 && coverageNum < coverageDen,
      "coverage must be a proper fraction")
    val base = df.select(col(groupCol).as("_g"), col(scoreCol).cast("long").as("_s"),
      calibPred.as("_cal"))
    val cal = base.filter(col("_cal"))
    val calStats = cal
      .groupBy("_g")
      .agg(count(lit(1)).cast("long").as("n_cal"))
      // k = ceil((n_cal + 1) * num / den), exactly
      .withColumn("k",
        expr(s"((n_cal + 1) * $coverageNum + $coverageDen - 1) div $coverageDen")
          .cast("long"))
    val ranked = cal
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_g").orderBy(col("_s"))).cast("long"))
    val thresholds = calStats
      .join(ranked.select(col("_g"), col("_s"), col("_rn")),
        Seq("_g"), "left")
      .filter(col("_rn") === col("k"))
      .select(col("_g"), col("_s").as("threshold"))
    val gate = calStats.join(thresholds, Seq("_g"), "left") // null = +∞ (k > n_cal)
    val test = base.filter(!col("_cal"))
    // The corpus-size join is an INNER join with the group-cardinality gate
    // table broadcast as the build side (an outer join preserving the gate
    // cannot also broadcast it: BroadcastHashJoin only builds the
    // non-preserved side). Gate groups with zero test rows are restored by
    // the tiny-to-tiny left join below. Test rows whose group has NO
    // calibration rows are EXCLUDED from the report by design — there is
    // no threshold to gate them against; surface them upstream if a group
    // can legitimately appear test-only.
    val perGroup = test
      .join(broadcast(gate), Seq("_g"))
      .groupBy("_g")
      .agg(
        count(col("_s")).cast("long").as("n_test"),
        sum(when(col("_s").isNotNull &&
          (col("threshold").isNull || col("_s") <= col("threshold")), 1L)
          .otherwise(0L)).cast("long").as("n_kept")
      )
    gate
      .join(perGroup, Seq("_g"), "left")
      .withColumn("n_test", coalesce(col("n_test"), lit(0L)))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("kept_ppm",
        when(col("n_test") > 0, expr("n_kept * 1000000L div n_test")).otherwise(lit(null))
          .cast("long"))
      .select(col("_g").as(groupCol), col("n_cal"), col("k"), col("threshold"),
        col("n_test"), col("n_kept"), col("kept_ppm"))
  }

  /** DoReMi-style domain mixture reweighting (E417; Xie et al. 2023's
    * Domain Reweighting with Minimax Optimization, the deterministic-replay
    * skeleton): domains whose corpus EXCESS loss is positive get their
    * mixture weight multiplied up, exponentiated-gradient style —
    * w'_d ∝ w_d · exp(η·(ℓ_d − Σ_e w_e·ℓ_e)) — iterated `rounds` times.
    * Here ℓ_d is the domain's mean per-token surprisal under the CORPUS
    * unigram LM (the "hard for the current mixture" signal a proxy model
    * supplies in the full recipe; any per-domain loss column can replace
    * it), so the weights shift toward domains the corpus blend explains
    * worst — the same fixed point DoReMi's minimax inner loop tracks.
    *
    * Every accumulation is order-independent: surprisals quantize to
    * 9-dp DECIMAL before the exact weighted sums; each round's mixture
    * average and weight normalization run over 10⁹-scaled BIGINT
    * quantizations (integer sums — exact on any executor layout), with the
    * single exp() per (domain, round) applied to a pinned double. Domain
    * cardinality bounds all state; the corpus enters only through one
    * token-count aggregation.
    *
    * @return one row per domain: (groupCol, n_tokens, h_mean, w_1..w_rounds)
    *         — the full per-round ledger, weights as round₆ fractions
    */
  def doremiWeights(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      eta: Double = 0.5,
      rounds: Int = 5
  ): DataFrame = {
    require(rounds >= 1 && eta > 0.0, "need rounds>=1, eta>0")
    val tok = docs
      .select(col(groupCol).as("_d"), explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
      .groupBy("_d", "_t")
      .agg(count(lit(1)).cast("long").as("_c"))
      .localCheckpoint()
    val corpus = tok.groupBy("_t").agg(sum(col("_c")).cast("long").as("_ct"))
    val total = tok.agg(sum(col("_c")).cast("long").as("_n"))
    // mean per-token corpus surprisal per domain, through the DECIMAL ladder
    val h = tok
      .join(corpus, "_t")
      .crossJoin(broadcast(total))
      .select(
        col("_d"),
        col("_c"),
        (col("_c") * round(log(col("_n").cast("double") / col("_ct").cast("double")), 9)
          .cast("decimal(18,9)")).as("_s")
      )
      .groupBy("_d")
      .agg(
        sum(col("_c")).cast("long").as("n_tokens"),
        round(sum(col("_s")).cast("decimal(28,9)").cast("double") / sum(col("_c")), 6)
          .as("h_mean")
      )
      .localCheckpoint()
    val nDomains = h.count()
    var cur = h.withColumn("_w", round(lit(1.0) / lit(nDomains.toDouble), 6))
    val ledger = scala.collection.mutable.ArrayBuffer.empty[String]
    for (k <- 1 to rounds) {
      // mixture average as an exact integer sum of 1e9-quantized products
      val mix = cur
        .select((round(col("_w") * col("h_mean") * 1e9, 0).cast("long")).as("_q"))
        .agg(sum(col("_q")).cast("long").as("_mq"))
      val stepped = cur
        .crossJoin(broadcast(mix))
        .withColumn("_excess", col("h_mean") - col("_mq").cast("double") / 1e9)
        .withColumn("_wq",
          round(col("_w") * exp(lit(eta) * col("_excess")) * 1e9, 0).cast("long"))
      val denom = stepped.agg(sum(col("_wq")).cast("long").as("_dq"))
      cur = stepped
        .crossJoin(broadcast(denom))
        .withColumn(s"w_$k",
          round(col("_wq").cast("double") / col("_dq").cast("double"), 6))
        .withColumn("_w", col(s"w_$k"))
        .drop("_excess", "_wq", "_mq", "_dq")
        .localCheckpoint()
      ledger += s"w_$k"
    }
    cur.select((Seq(col("_d").as(groupCol), col("n_tokens"), col("h_mean")) ++
      ledger.map(col)): _*)
  }

  /** ε-differentially-private-STYLE Laplace release of group counts — the
    * noisy-aggregate release that lets a curation pipeline publish corpus
    * composition statistics (per-source doc counts, per-language token
    * totals) without exposing any individual document's membership. The
    * noise shape is the classic Laplace mechanism (Dwork et al. 2006): a
    * COUNT has sensitivity 1, noise is Laplace(0, 1/ε).
    *
    * THE GUARANTEE IS CONDITIONAL, NOT ε-DP IN GENERAL: the draw is
    * derived deterministically from (seed, group key) alone, so anyone
    * who knows — or can guess — the seed inverts the noise exactly and
    * recovers the true count. The release is ε-DP-STYLE only under the
    * operational discipline that the seed is (a) secret from every
    * release consumer and (b) used for AT MOST ONE release (reusing it
    * across releases of overlapping statistics correlates the draws,
    * which breaks the composition accounting too). Treat the
    * `epsilon`/`sensitivity`/`scale` columns as a bookkeeping ledger of
    * what the release WOULD spend under that discipline — not as a
    * self-certifying privacy budget; a real adversarial deployment should
    * mix a non-replayable secret (e.g. an HSM-held key) into the seed.
    *
    * Within that framing, the seeded draw is a feature twice over: u =
    * (h + 0.5)/2⁵², h the 52-bit md5 of (seed, group key), pushed through
    * the Laplace inverse CDF −b·sgn(2u−1)·ln(1−|2u−1|) — the release is
    * reproducible for audit (re-running the pipeline cannot "re-roll" a
    * luckier draw, which would silently burn budget), and the
    * draw is engine-portable (the DuckDB twin replays it hash-for-hash;
    * noisy_count rounds to 4 per DETERMINISM.md's libm policy — ln appears
    * once, same expression order both engines, never a ranking key).
    * The (h+0.5)/2⁵² form keeps u strictly inside (0, 1): 2u−1 =
    * (2h+1−2⁵²)/2⁵² is an odd numerator over a power of two — never 0,
    * never ±1 — so sgn and ln(1−|t|) are always finite, with no clamping
    * branch to diverge between engines.
    *
    * One partial agg over the group keys + per-group scalar math: the
    * noise attaches AFTER aggregation, so the plan is exactly the
    * underlying count's (map-side combine, group-cardinality state) at any
    * corpus size.
    *
    * @return one row per group: (groupCols…, noisy_count, epsilon,
    *         sensitivity, scale)
    */
  def dpLaplaceCounts(
      df: DataFrame,
      groupCols: Seq[String],
      eps: Double,
      seed: String
  ): DataFrame = {
    require(groupCols.nonEmpty, "dpLaplaceCounts needs group columns")
    require(eps > 0.0, "epsilon must be positive")
    val keyed = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("_n"))
      .withColumn(
        "_hv",
        conv(
          substring(
            md5(concat_ws("|", lit(seed) +: groupCols.map(c => col(c).cast("string")): _*)),
            1, 13),
          16, 10
        ).cast("long")
      )
      .withColumn("_t", (col("_hv").cast("double") * 2.0 + 1.0) / 4503599627370496.0 - 1.0)
    keyed
      .withColumn(
        "_sgn",
        when(col("_t") > 0.0, 1.0).when(col("_t") < 0.0, -1.0).otherwise(0.0)
      )
      .withColumn(
        "noisy_count",
        round(
          col("_n").cast("double") +
            (lit(-1.0 / eps)) * col("_sgn") * log(lit(1.0) - abs(col("_t"))),
          4
        )
      )
      .withColumn("epsilon", lit(eps))
      .withColumn("sensitivity", lit(1.0))
      .withColumn("scale", lit(1.0 / eps))
      .select((groupCols.map(col) ++ Seq(
        col("noisy_count"), col("epsilon"), col("sensitivity"), col("scale")
      )): _*)
  }
}
