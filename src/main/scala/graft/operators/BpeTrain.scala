package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BPE merge learning — the vocabulary-training half of byte-pair encoding
  * (the tokenizer-side `TextAnalysis.bpeTokens` is the inference regex).
  *
  * Classic Sennrich et al. semantics — the merge table is IDENTICAL to the
  * one-merge-at-a-time argmax loop (count desc, then lexicographic left,
  * right; left-to-right non-overlapping greedy application) — but trained in
  * BATCHED ROUNDS: each round runs ONE distributed analysis job and then
  * applies up to `maxBatchPerRound` merges in a single pass. A production
  * tokenizer is 30k–100k merges; one Spark job per merge is 10⁴–10⁵
  * sequential jobs regardless of cluster size, so the job count per merge —
  * not the per-job plan — is the scale limiter this batching removes.
  *
  * Why the batch is provably identical to sequential: a round's analysis
  * aggregates SYMBOL TRIGRAMS (with a null end-of-word slot, so pair counts
  * are exact marginals of the same aggregate), and the batch is the maximal
  * PREFIX p₁..p_B of the (count desc, left, right)-sorted pair list such
  * that, for each pᵢ (i ≥ 2):
  *
  *   1. pᵢ shares no symbol with p₁..pᵢ₋₁ and references no token those
  *      merges created — merging disjoint pairs can neither destroy nor
  *      create an occurrence of pᵢ, so cnt(pᵢ) is still exact when the
  *      sequential loop reaches step i;
  *   2. cnt(pᵢ) is STRICTLY above the created-pair ceiling: every pair a
  *      batch merge (l,r) creates contains the token lr, and each created
  *      adjacency instance maps to a distinct pre-round trigram instance in
  *      the (·,l,r)/(l,r,·) family, so max trigram count over that family
  *      bounds every created pair's count — created pairs cannot outrank pᵢ
  *      (strict, so a lexicographic tie can't flip the argmax either);
  *   3. the batch stops AT (inclusive) any member whose merged token lr
  *      collides with an existing vocabulary symbol or another batch
  *      member's symbol/created token — a collision lets created
  *      adjacencies add to an existing pair's count, which invalidates the
  *      ceiling argument for LATER steps only, so the colliding merge
  *      itself is still taken.
  *
  * The prefix rule (stop at the first symbol-sharing pair, never skip past
  * it) is what makes the induction closed: every pair ranked above a batch
  * member is an earlier batch member (count now 0 — one greedy pass leaves
  * no (l,r) adjacency), every pair ranked below can only have decreased,
  * and created pairs sit under the ceiling. So the sequential argmax at
  * step i is exactly pᵢ.
  *
  * Batch width is corpus-dependent: heavy symbol sharing (natural-language
  * top pairs all touching 'e'/'</w>') ends rounds early — the algorithm
  * degrades gracefully to the sequential loop (`maxBatchPerRound = 1` IS
  * the sequential loop) and widens automatically where the pair spectrum
  * allows. Jobs per round are constant (one analysis action + one
  * localCheckpoint), so B merges in a round cost 2 jobs instead of 2B.
  *
  * The word table is localCheckpoint'ed per ROUND: each merge otherwise
  * stacks another HOF layer on the lineage and analysis cost grows
  * quadratically (same guard as connectedComponents; use reliable
  * checkpoint() on a multi-node cluster).
  *
  * Scale: state per round is the distinct-WORD table (vocabulary-sized,
  * like the tf relation in TermStats — corpus size only matters in the one
  * initial word-count aggregate), plus the vocabulary-trigram aggregate the
  * analysis job derives. Production tokenizer training batches
  * low-frequency pairs and stops on a frequency floor; `minPairCount` is
  * that floor.
  *
  * @return the learned merge table: (rank, left, right, merged, pair_count)
  */
object BpeTrain {

  /** One greedy left-to-right merge of (l, r) over a symbol-array column:
    * carry holds the previous unemitted symbol; (carry == l && x == r)
    * emits the merged token and clears the carry so overlapping occurrences
    * don't double-merge. Chaining B of these in rank order is exactly B
    * sequential merge passes.
    */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      struct(array().cast("array<string>").as("out"), lit(null).cast("string").as("carry")),
      (acc, x) =>
        when(acc("carry").isNull, struct(acc("out").as("out"), x.as("carry")))
          .when(
            acc("carry") === lit(l) && x === lit(r),
            struct(concat(acc("out"), array(lit(l + r))).as("out"),
              lit(null).cast("string").as("carry"))
          )
          .otherwise(
            struct(concat(acc("out"), array(acc("carry"))).as("out"), x.as("carry"))
          ),
      acc =>
        when(acc("carry").isNull, acc("out"))
          .otherwise(concat(acc("out"), array(acc("carry"))))
    )

  /** One analysis row: a candidate pair with its exact count, the maximum
    * trigram count over its (·,l,r)/(l,r,·) family (the created-pair
    * ceiling), and whether the merged token l+r already exists as a symbol.
    */
  private[operators] case class Candidate(
      l: String, r: String, cnt: Long, maxT: Long, collides: Boolean)

  /** Driver-side batch selection over the engine-sorted candidate window —
    * implements exactly the three conditions in the object Scaladoc. The
    * window arrives PRE-SORTED by the engine's own (cnt desc, l, r)
    * ordering, and the selection never re-sorts, so engine/JVM collation
    * differences can't flip a tie.
    */
  private[operators] def selectBatch(
      window: Seq[Candidate],
      budget: Int
  ): Seq[Candidate] = {
    val sel = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    var used = Set.empty[String] // symbols consumed by selected merges
    var made = Set.empty[String] // tokens created by selected merges
    var ceil = Long.MinValue // created-pair ceiling over selected merges
    var open = true
    val it = window.iterator
    while (open && sel.size < budget && it.hasNext) {
      val c = it.next()
      if (sel.nonEmpty && (
          c.cnt <= ceil || // a created pair could outrank (or lex-tie) c
          used.contains(c.l) || used.contains(c.r) || // count may have changed
          made.contains(c.l) || made.contains(c.r) // references a created token
        )) {
        open = false
      } else {
        sel += c
        val tok = c.l + c.r
        // a colliding created token can feed counts of EXISTING pairs from
        // the next step on — take this merge, end the round after it
        if (c.collides || used.contains(tok) || made.contains(tok)) open = false
        used ++= Set(c.l, c.r)
        made += tok
        ceil = math.max(ceil, c.maxT)
      }
    }
    sel.toSeq
  }

  /** Adjacent-symbol trigram ROWS of a word table — (a, b, nullable c,
    * freq), the shared analysis shape of both training modes. The third
    * slot is null at the word end so pair counts are exact marginals of the
    * same aggregate; a fully-merged word is ONE symbol, where
    * `sequence(1, size-1)` would count DOWN from 1 to 0, so the transform
    * is gated (explode drops the null) — the word contributes no pairs.
    */
  private def triRows(words: DataFrame): DataFrame =
    words
      .select(
        explode(
          when(
            size(col("syms")) >= 2,
            transform(
              sequence(lit(1), size(col("syms")) - 1),
              i => struct(
                element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"),
                when(i + 2 <= size(col("syms")), element_at(col("syms"), i + 2)).as("c")
              )
            )
          )
        ).as("t"),
        col("freq")
      )
      .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"), col("freq"))

  /** True when the word's symbol sequence contains (l, r) adjacent — the
    * touched-word predicate of the delta mode (a narrow scan, no explode,
    * no shuffle).
    */
  private def hasAdjacentPair(l: String, r: String): Column =
    coalesce(
      when(
        size(col("syms")) >= 2,
        exists(
          transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => element_at(col("syms"), i) === lit(l) &&
              element_at(col("syms"), i + 1) === lit(r)),
          x => x)),
      lit(false))

  /** @param deltaState maintain the trigram aggregate as ROUND-OVER-ROUND
    *   STATE instead of re-deriving it from every vocabulary word each
    *   round: a round retracts the old trigram contributions of exactly
    *   the TOUCHED words (those containing a merged pair adjacency — a
    *   narrow predicate scan) and adds their post-merge contributions, so
    *   per-round analysis input shrinks from O(vocab trigrams) to
    *   O(touched-word trigrams) — the production shape for 30k–100k-merge
    *   training where late rounds touch a sliver of the vocabulary.
    *   Provably identical to the recompute (BpeTrainSpec): merges change
    *   no untouched word, retraction is exact by (a, b, c) key, and the
    *   collision vocabulary re-derives from the state's symbol slots plus
    *   the fully-merged singles.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      minPairCount: Long = 2L,
      maxBatchPerRound: Int = 16,
      candidateWindow: Int = 64,
      deltaState: Boolean = false
  ): DataFrame = {
    require(maxBatchPerRound >= 1, "maxBatchPerRound must be >= 1")
    require(candidateWindow >= maxBatchPerRound, "window must cover the batch")
    val spark = docs.sparkSession
    import spark.implicits._

    // distinct words with frequencies; symbols start as single characters.
    // The end-of-word marker keeps suffix merges distinct from mid-word ones
    // (standard BPE practice).
    var words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .select(
        concat(split(col("w"), ""), array(lit("</w>"))).as("syms"),
        col("freq")
      )
      .localCheckpoint()

    // delta mode: the trigram aggregate initializes ONCE from the full
    // vocabulary and then evolves by touched-word retract/add deltas
    var triState: DataFrame =
      if (deltaState)
        triRows(words).groupBy("a", "b", "c").agg(sum(col("freq")).as("c3"))
          .localCheckpoint()
      else null

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // ONE analysis action per round: adjacent-symbol trigrams (see
      // triRows), the per-pair trigram-family maxima, and merged-token
      // collision flags — derived from the STATE in delta mode, re-derived
      // from every word otherwise.
      val tri =
        if (deltaState) triState
        else triRows(words).groupBy("a", "b", "c").agg(sum(col("freq")).as("c3"))
      val pairs = tri
        .groupBy("a", "b")
        .agg(
          sum(col("c3")).as("cnt"),
          max(when(col("c").isNotNull, col("c3"))).as("max_pre")
        )
      val sufMax = tri
        .filter(col("c").isNotNull)
        .groupBy(col("b").as("sa"), col("c").as("sb"))
        .agg(max(col("c3")).as("max_suf"))
      // collision vocabulary: every symbol of a >=2-symbol word appears in
      // the state's a/b slots (positions 1..n-1 in a, 2..n in b), so only
      // fully-merged single-symbol words need the extra narrow scan
      val vocabSyms =
        if (deltaState)
          triState.select(col("a").as("sym"))
            .unionByName(triState.select(col("b").as("sym")))
            .unionByName(words.filter(size(col("syms")) === 1)
              .select(element_at(col("syms"), 1).as("sym")))
            .distinct()
        else words.select(explode(col("syms")).as("sym")).distinct()
      val window = pairs
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(candidateWindow)
        .join(sufMax, col("a") === col("sa") && col("b") === col("sb"), "left")
        .join(vocabSyms, concat(col("a"), col("b")) === col("sym"), "left")
        .select(
          col("a"), col("b"), col("cnt"),
          greatest(coalesce(col("max_pre"), lit(0L)), coalesce(col("max_suf"), lit(0L)))
            .as("max_t"),
          col("sym").isNotNull.as("collides")
        )
        // the joins drop the limit's ordering — re-sort ENGINE-side so the
        // collected prefix is Spark's own total order, never a JVM re-sort
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .collect()
        .map(r => Candidate(r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
        .toSeq

      val batch = selectBatch(window, math.min(maxBatchPerRound, nMerges - rank))
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { c =>
          merges += ((rank, c.l, c.r, c.l + c.r, c.cnt))
          rank += 1
        }
        // apply the whole batch in rank order as chained folds — ONE narrow
        // pass, one lineage-truncating checkpoint per round
        val stepped = batch.foldLeft(col("syms")) { case (s, c) => mergeFold(s, c.l, c.r) }
        if (deltaState) {
          // only TOUCHED words (containing a merged adjacency) re-derive:
          // retract their old trigram contributions, add the post-merge
          // ones — exact by (a, b, c) key, untouched words contribute the
          // same rows as before by definition of "untouched"
          val hit = batch.map(c => hasAdjacentPair(c.l, c.r)).reduce(_ || _)
          val touched = words.filter(hit)
          // measurement hook (env-gated: two extra count jobs per round,
          // only for SCALING.md instrumentation runs)
          if (sys.env.contains("SPARK_GRAFT_BPE_STATS"))
            System.err.println(
              s"[bpe-delta] round ending at rank $rank: touched " +
                s"${touched.count()} of ${words.count()} vocabulary words")
          // checkpoint the merged TOUCHED rows once: the chained mergeFold
          // HOFs are codegen-expensive to COMPILE, and without the cut the
          // stepped expression would recompile inside every downstream job
          // of the round (the trigram delta AND the word-state union) —
          // measured 5× the whole round's cost at small vocabularies
          val merged = touched.select(stepped.as("syms"), col("freq")).localCheckpoint()
          val delta = triRows(touched)
            .withColumn("freq", -col("freq"))
            .unionByName(triRows(merged))
          val nextTri = triState
            .select(col("a"), col("b"), col("c"), col("c3").as("freq"))
            .unionByName(delta)
            .groupBy("a", "b", "c")
            .agg(sum(col("freq")).as("c3"))
            .filter(col("c3") =!= 0L)
            .localCheckpoint()
          // coalesce the union back to the incoming partition count: union
          // CONCATENATES partitions, so without the narrow coalesce the
          // word state's partition count doubles every round (8 → 65k by
          // round 13 — measured geometric per-round cost growth as every
          // downstream job scheduled the accumulated empty tasks)
          val nextWords = words.filter(!hit).unionByName(merged)
            .coalesce(math.max(1, words.rdd.getNumPartitions))
            .localCheckpoint()
          triState.unpersist()
          triState = nextTri
          words.unpersist()
          words = nextWords
          merged.unpersist()
        } else {
          val next = words.select(stepped.as("syms"), col("freq")).localCheckpoint()
          words.unpersist()
          words = next
        }
      }
    }
    words.unpersist()
    if (triState != null) triState.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Segment words with a learned merge table: replays the merges in rank
    * order over each word's character sequence — the deterministic encode
    * side of [[learnMerges]] (one HOF fold per merge, no shuffle).
    *
    * Scale limit: each merge nests another `aggregate` HOF into ONE column
    * expression, so this Column-API replay is for small merge tables
    * (tests, analyses — tens of merges). A production tokenizer with a
    * 30k-merge vocabulary uses [[bpeEncodeWords]] — the same semantics
    * applied imperatively per partition, where the expression tree (the
    * wrong representation at that depth, not the distribution) never
    * appears.
    */
  /** The PRODUCTION encode path: distinct words → BPE segmentation by
    * replaying `merges` imperatively per partition — the scalable sibling
    * of [[applyMerges]] for the 30k–100k-merge tables where the Column-HOF
    * replay's expression depth (one nested `aggregate` per merge) is the
    * limit. This is the one other place (beside the multimodal codecs)
    * where `mapPartitions` is the right tool: the per-word loop is
    * inherently imperative, the task closure carries only the merge table,
    * and the output stays the vocabulary-sized (word, bpe) dictionary that
    * callers join back to the corpus.
    *
    * Semantics are IDENTICAL to [[applyMerges]]' chained folds — merges
    * replay in rank order, each as a greedy left-to-right non-overlapping
    * pass — implemented as skip-absent-ranks: repeatedly find the minimal
    * surviving rank ≥ floor among the word's adjacent pairs, apply it
    * fully, advance the floor past it. Skipping a rank whose pair is
    * absent is exactly what its fold pass would have done, and a pair of
    * rank < floor CREATED by a later merge is equally dead in both replays
    * (its pass already ran), so the outputs agree word for word
    * (BpeTrainSpec proves it on learned tables). Cost per word is
    * O(len · ranks-present) instead of O(len · |merges|).
    */
  def bpeEncodeWords(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.toIndexedSeq
    val rankOf: Map[(String, String), Int] =
      table.zipWithIndex.map { case (p, i) => p -> i }.toMap
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .as[String]
      .mapPartitions { it =>
        it.map { w =>
          var syms: Array[String] = (w.map(_.toString) :+ "</w>").toArray
          var floor = 0
          var done = false
          while (!done) {
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              rankOf.get((syms(i), syms(i + 1))) match {
                case Some(r) if r >= floor && r < best => best = r
                case _ => ()
              }
              i += 1
            }
            if (best == Int.MaxValue) done = true
            else {
              val (l, r) = table(best)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                  out += l + r
                  j += 2
                } else {
                  out += syms(j)
                  j += 1
                }
              }
              syms = out.toArray
              floor = best + 1
            }
          }
          (w, syms.toSeq)
        }
      }
      .toDF("word", "bpe")
  }

  def applyMerges(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val base = docs.select(
      col("*"),
      explode(TextAnalysis.tokens(col(textCol))).as("_w")
    )
      .filter(col("_w") =!= "")
      .withColumn("_syms", concat(split(col("_w"), ""), array(lit("</w>"))))
    val folded = merges.foldLeft(col("_syms")) { case (syms, (l, r)) =>
      mergeFold(syms, l, r)
    }
    base.withColumn("_bpe", folded).drop("_syms")
  }
}
