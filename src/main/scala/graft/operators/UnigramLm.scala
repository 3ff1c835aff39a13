package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Unigram-LM tokenizer training (E413) — the OTHER tokenizer family next
  * to [[BpeTrain]]: where BPE greedily merges pairs, the unigram model
  * (Kudo 2018, the SentencePiece default) scores a candidate piece
  * vocabulary and segments each word by Viterbi under per-piece costs; EM
  * alternates segmentation (E-step, here the hard-EM / Viterbi variant)
  * with recounting piece usage (M-step). This implementation keeps every
  * statistic exact and engine-portable:
  *
  *   - candidate pieces are substring counts (frequency-weighted, with
  *     multiplicity) — a distributed explode + one keyed partial agg;
  *     ALL single characters are kept unconditionally (full coverage: every
  *     word is always segmentable), multi-char candidates keep the top-N by
  *     (count DESC, piece ASC) — a deterministic cut;
  *   - piece costs are INTEGER micro-nats: cost = round(ln(total/cnt)·10⁶)
  *     — the only libm call, quantized immediately (DETERMINISM.md policy),
  *     so the Viterbi DP itself is exact min-plus integer arithmetic;
  *   - Viterbi ties break on the lexicographically smaller segmentation
  *     string — total, reproducible, and replayable in SQL (the DuckDB twin
  *     unrolls the DP position-for-position).
  *
  * Scale shape: the piece table is vocabulary-bounded (topN + alphabet) and
  * broadcasts in the task closure; segmentation runs over the DISTINCT-word
  * dictionary (vocabulary-sized, like [[BpeTrain.bpeEncodeWords]] — this is
  * the same "inherently imperative per-word loop" class as the BPE encoder,
  * the third justified mapPartitions site); corpus size only enters through
  * the word-frequency agg.
  */
object UnigramLm {

  /** Separator used inside segmentation strings for tie-breaking — matches
    * the BPE oracle's chr(31) convention (ASCII, below every token char).
    */
  val Sep = "\u001f"

  /** Distinct words with instance frequencies. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).cast("long").as("freq"))

  /** Candidate piece table with integer micro-nat costs.
    *
    * @param words (word, freq)
    * @return (piece, cnt, cost) — all single chars + topN multi-char pieces
    */
  def candidatePieces(words: DataFrame, maxPieceLen: Int, topN: Int): DataFrame = {
    require(maxPieceLen >= 2 && topN >= 1, "need maxPieceLen>=2, topN>=1")
    // every substring of length 1..maxPieceLen, with multiplicity, weighted
    // by the word's corpus frequency — pure HOF explode, no UDF
    val subs = words
      .select(
        col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), i ->
             |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
             |    substring(word, i, j - i + 1))))""".stripMargin.replaceAll("\\s+", " ")
        )).as("piece")
      )
      .groupBy("piece")
      .agg(sum(col("freq")).cast("long").as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs
      .filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topN)
    val kept = chars.unionByName(multi)
    val total = kept.agg(sum(col("cnt")).cast("long").as("total"))
    kept
      .crossJoin(broadcast(total))
      .select(
        col("piece"),
        col("cnt"),
        round(log(col("total").cast("double") / col("cnt").cast("double")) * 1000000.0, 0)
          .cast("long")
          .as("cost")
      )
  }

  /** Viterbi-best segmentation of every word under integer piece costs:
    * minimize total cost; break exact-cost ties on the lexicographically
    * smaller chr(31)-joined segmentation string. The piece table rides the
    * task closure (vocabulary-bounded); the DP is O(len·maxPieceLen) per
    * word over the distinct-word dictionary.
    *
    * @return (word, freq, seg ARRAY<STRING>, cost LONG)
    */
  def viterbiSegment(
      words: DataFrame,
      pieces: DataFrame,
      maxPieceLen: Int
  ): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val costOf: Map[String, Long] = pieces
      .select("piece", "cost")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    words
      .select(col("word"), col("freq"))
      .as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (w, freq) =>
          val L = w.length
          // dp(i) = best (cost, seg-with-leading-sep) for prefix of length i
          val dpCost = Array.fill(L + 1)(Long.MaxValue)
          val dpSeg = Array.fill(L + 1)("")
          dpCost(0) = 0L
          var i = 1
          while (i <= L) {
            var j = math.max(0, i - maxPieceLen)
            while (j < i) {
              if (dpCost(j) != Long.MaxValue) {
                val piece = w.substring(j, i)
                costOf.get(piece) match {
                  case Some(c) =>
                    val cand = dpCost(j) + c
                    val candSeg = dpSeg(j) + Sep + piece
                    if (cand < dpCost(i) ||
                      (cand == dpCost(i) && candSeg.compareTo(dpSeg(i)) < 0)) {
                      dpCost(i) = cand
                      dpSeg(i) = candSeg
                    }
                  case None => ()
                }
              }
              j += 1
            }
            i += 1
          }
          require(dpCost(L) != Long.MaxValue,
            s"word '$w' unsegmentable — single-char coverage violated")
          (w, freq, dpSeg(L).substring(1).split(Sep, -1).toSeq, dpCost(L))
        }
      }
      .toDF("word", "freq", "seg", "cost")
  }

  /** M-step: piece usage counts from the Viterbi segmentations,
    * frequency-weighted — (piece, n_uses), the statistic the next EM round's
    * costs renormalize from.
    */
  def emRecount(segmented: DataFrame): DataFrame =
    segmented
      .select(col("freq"), explode(col("seg")).as("piece"))
      .groupBy("piece")
      .agg(sum(col("freq")).cast("long").as("n_uses"))

  /** `rounds` hard-EM iterations from the raw-count initialization: each
    * round segments the dictionary under the current costs, recounts, and
    * renormalizes costs from usage (pieces that won no segmentation drop
    * out — the unigram analogue of SentencePiece's pruning). Returns the
    * final (piece, cnt, cost) table plus the last round's corpus cost in
    * micro-nats (the hard-EM objective, non-increasing across rounds —
    * spec-asserted).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int,
      topN: Int,
      rounds: Int
  ): (DataFrame, Long) = {
    require(rounds >= 1, "need at least one EM round")
    val words = wordFreqs(docs, textCol).localCheckpoint()
    var pieces = candidatePieces(words, maxPieceLen, topN).localCheckpoint()
    var corpusCost = 0L
    for (_ <- 1 to rounds) {
      val seg = viterbiSegment(words, pieces, maxPieceLen).localCheckpoint()
      corpusCost = seg
        .agg(sum(col("cost") * col("freq")).cast("long"))
        .collect()(0)
        .getLong(0)
      val used = emRecount(seg)
      val total = used.agg(sum(col("n_uses")).cast("long").as("total"))
      pieces = used
        .crossJoin(broadcast(total))
        .select(
          col("piece"),
          col("n_uses").as("cnt"),
          round(log(col("total").cast("double") / col("n_uses").cast("double")) * 1000000.0, 0)
            .cast("long")
            .as("cost")
        )
        .localCheckpoint()
    }
    (pieces, corpusCost)
  }
}
