package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all expressed as
  * built-in column expressions (codegen'd / higher-order functions — no UDFs,
  * so they stay inside WholeStageCodegen or at worst Spark's optimized
  * HigherOrderFunction eval, and scale linearly with no driver involvement).
  *
  * Every function here has a portable ANSI-SQL twin used by the DuckDB
  * oracle entries in [[graft.queries.TextQueries]] — hence md5 (identical hex
  * in both engines) rather than xxhash64 for fingerprints.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex split of the builder brief). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are sentence punctuation, rounded for
    * cross-engine float stability.
    */
  def punctRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
        .cast("double") / length(text),
      4
    )

  /** English-ish stopword list shared with the SQL oracle. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopwordRatio(text: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    round(
      size(filter(tokens(text), w => array_contains(sw, w))).cast("double") /
        size(tokens(text)),
      4
    )
  }

  /** Heuristic quality score in [0,1]: length saturation + stopword density +
    * punctuation sanity. Deliberately simple arithmetic so the DuckDB twin is
    * bit-identical after rounding.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(lit(1.0), tokenCount(text).cast("double") / 100.0)
    val sw = size(filter(tokens(text), w => array_contains(array(Stopwords.map(lit): _*), w)))
      .cast("double") / tokenCount(text)
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / length(text)
    round(lenScore * 0.5 + sw * 0.3 + (lit(1.0) - punct) * 0.2, 4)
  }

  /** Language-marker stopword sets for the n-gram/stopword language-ID
    * heuristic. Order is the deterministic tie-break (first wins).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "una"),
    "fr" -> Seq("le", "les", "et", "une", "est"),
    "zh" -> Seq("的", "是", "不", "我", "在")
  )

  private def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => array_contains(array(markers.map(lit): _*), w)))

  /** Argmax over marker-hit counts with first-wins tie-break (CASE chain on
    * `score = greatest(...)`); "und" (unknown) when no marker matched at all.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (code, ms) => code -> markerHits(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    val argmax = scores.foldRight(lit("und")) { case ((code, s), fallback) =>
      when(s === best, lit(code)).otherwise(fallback)
    }
    when(best > 0, argmax).otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the casefolded, punctuation-collapsed text.
    * (Content-defined winnowing fingerprints live in [[winnowFingerprints]];
    * this is the exact-normalized-dup key.)
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** BPE-ish regex tokenizer (GPT-2-style shape, ASCII-simplified so the
    * same pattern runs identically under Java regex and DuckDB's RE2):
    * contractions, letter runs with optional leading space, digit runs,
    * punctuation runs.
    */
  val BpePattern = "'[a-z]+|[a-zA-Z]+| ?[0-9]+|[^a-zA-Z0-9 ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Winnowing fingerprints (Schleimer et al.): char k-gram rolling hashes,
    * minimum per sliding window of `w` hashes, distinct survivors. The
    * guarantee: any shared substring of length k+w-1 between two docs yields
    * at least one shared fingerprint — the standard plagiarism/near-dup
    * sketch. `hashes` must be a materialized attribute column of k-gram
    * hashes (see the CSE note on [[graft.operators.Dedup.shinglesFromWords]]).
    */
  def kgramHashes(text: Column, k: Int = 8): Column =
    when(
      length(text) >= k,
      transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => md5(text.substr(i, lit(k))).substr(lit(1), lit(8))
      )
    ).otherwise(array().cast("array<string>"))

  /** Winnowing fingerprint stats as a fully codegen'd plan: explode gram
    * INDICES (not precomputed hash arrays), hash each gram in the codegen'd
    * projection, sliding-window minimum per doc, distinct-count + min/max
    * aggregate. Same values as the Column-API [[winnowFingerprints]] route
    * (asserted in PipelineOpsSpec), ~3× faster on the bench corpus because
    * nothing runs in interpreted lambda eval.
    *
    * `fast = true` swaps the per-gram md5 (one digest per CHARACTER of the
    * corpus — kept on the oracled path because DuckDB can replay it) for
    * xxhash64 — and with a ~GB/s hash the plan changes shape entirely: the
    * whole winnow (gram hashes → sliding minima → distinct survivors) runs
    * as per-ROW array lambdas, one hash per character and NO shuffle at all
    * — where the md5 route's Window operator shuffles + sorts one row per
    * corpus character, the whole cost of that route at 100 TB. Measured at
    * sf0.1: lambda 2.0 s vs window 2.2 s vs a least()-of-w-rehashes variant
    * 5.4 s (4× substring/hash allocation loses to one-hash-per-char even
    * interpreted). Equivalence with the window formulation is asserted in
    * PipelineOpsSpec.
    */
  def winnowFingerprintStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      fast: Boolean = false
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (fast) {
      // Hash array materialized as its own projection so the sliding-min
      // lambda references an attribute, not the hash expression (interpreted
      // HOFs do no CSE). Docs with no grams / no full window short-circuit
      // to null → n_fp 0, null min/max — same shape as the md5 route's left
      // join, without the join.
      df.select(col(idCol), col(textCol).as("_t"))
        .select(
          col(idCol),
          when(
            length(col("_t")) >= k,
            transform(
              sequence(lit(1), length(col("_t")) - (k - 1)),
              i => xxhash64(col("_t").substr(i, lit(k)))
            )
          ).as("_hs")
        )
        .select(
          col(idCol),
          when(
            size(col("_hs")) >= w,
            array_distinct(
              transform(
                sequence(lit(1), size(col("_hs")) - (w - 1)),
                j => array_min(slice(col("_hs"), j, lit(w)))
              )
            )
          ).as("_fps")
        )
        .select(
          col(idCol),
          coalesce(size(col("_fps")), lit(0)).cast("bigint").as("n_fp"),
          array_min(col("_fps")).as("min_fp"),
          array_max(col("_fps")).as("max_fp")
        )
    } else {
      val grams = df
        .select(col(idCol), col(textCol).as("_t"))
        .withColumn("_i", explode(sequence(lit(1), greatest(length(col("_t")) - (k - 1), lit(0)))))
        .select(col(idCol), col("_i"), md5(col("_t").substr(col("_i"), lit(k))).substr(1, 8).as("_h"))
      val win = Window.partitionBy(idCol).orderBy("_i").rowsBetween(-(w - 1), 0)
      val stats = grams
        .withColumn("_fp", min(col("_h")).over(win))
        .filter(col("_i") >= w) // only full windows
        .groupBy(col(idCol))
        .agg(
          countDistinct(col("_fp")).as("n_fp"),
          min(col("_fp")).as("min_fp"),
          max(col("_fp")).as("max_fp")
        )
      // docs too short for a full window still get a row (n_fp = 0, null
      // min/max) — same shape as the empty-fingerprint-list oracle
      df.select(col(idCol))
        .join(stats, Seq(idCol), "left")
        .select(
          col(idCol),
          coalesce(col("n_fp"), lit(0L)).as("n_fp"),
          col("min_fp"),
          col("max_fp")
        )
    }
  }

  def winnowFingerprints(hashes: Column, w: Int = 4): Column =
    when(
      size(hashes) >= w,
      array_distinct(
        transform(
          sequence(lit(1), size(hashes) - (w - 1)),
          i => array_min(slice(hashes, i, lit(w)))
        )
      )
    ).otherwise(array().cast("array<string>")) // < w grams → no full window, no fingerprints

  /** Multi-token phrase gazetteer tagging (E421) — the blocklist / entity /
    * PII-phrase screen a curation pipeline runs with a curated phrase list:
    * every occurrence of every gazetteer phrase, located by FIRST-TOKEN
    * BLOCKING (a broadcast equi-join on the phrase's first token prunes
    * the corpus to candidate positions; a sliced array equality verifies
    * the full phrase) — the Aho-Corasick workload expressed as one
    * broadcast join + a narrow filter instead of a per-row automaton, so
    * codegen keeps the scan fused and nothing shuffles but matches.
    *
    * @param phrases token sequences (each non-empty); single-token phrases
    *                degrade gracefully to vocabulary hits
    * @return one row per occurrence: (idCol, phrase — space-joined, pos —
    *         1-based token position)
    */
  def phraseTag(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[Seq[String]]
  ): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty), "need non-empty phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    val gaz = broadcast(
      phrases
        .map(p => (p.head, p.toArray, p.length, p.mkString(" ")))
        .toDF("_first", "_arr", "_len", "phrase")
    )
    docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), posexplode(col("_toks")).as(Seq("_p0", "_tok")))
      .filter(col("_tok") =!= "")
      .join(gaz, col("_tok") === col("_first"))
      .filter(slice(col("_toks"), col("_p0") + 1, col("_len")) === col("_arr"))
      .select(col(idCol), col("phrase"), (col("_p0") + 1).cast("long").as("pos"))
  }
}
