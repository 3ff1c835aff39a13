package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BPE merge learning — the vocabulary-training half of byte-pair encoding
  * (the tokenizer-side `TextAnalysis.bpeTokens` is the inference regex).
  *
  * Classic Sennrich et al. loop, each iteration fully distributed:
  *   1. adjacent symbol pairs from every word, weighted by word frequency —
  *      explode + hash aggregate (map-side combinable);
  *   2. the argmax pair (count desc, then lexicographic — a total order, so
  *      the learned merge table is deterministic) — ONE scalar row to the
  *      driver per iteration, the only driver involvement;
  *   3. apply the merge inside every word — a left-to-right greedy fold as a
  *      codegen'd `aggregate` HOF over the symbol array (carry semantics:
  *      non-overlapping occurrences merge once per pass), no shuffle.
  *
  * The word table is localCheckpoint'ed per iteration: each merge otherwise
  * stacks another HOF layer on the lineage and analysis cost grows
  * quadratically (same guard as connectedComponents; use reliable
  * checkpoint() on a multi-node cluster).
  *
  * Scale: state per iteration is the distinct-WORD table (vocabulary-sized,
  * like the tf relation in TermStats — corpus size only matters in the one
  * initial word-count aggregate). Production tokenizer training batches
  * low-frequency pairs and stops on a frequency floor; `minPairCount` is
  * that floor.
  *
  * @return the learned merge table: (rank, left, right, merged, pair_count)
  */
object BpeTrain {

  def learnMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      minPairCount: Long = 2L
  ): DataFrame = {
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

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val best = words
        .select(
          explode(
            transform(
              sequence(lit(1), size(col("syms")) - 1),
              i => struct(
                element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r")
              )
            )
          ).as("p"),
          col("freq")
        )
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      best.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (l, r, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, l + r, cnt))
          // left-to-right greedy merge: carry holds the previous unemitted
          // symbol; (carry == l && x == r) emits the merged token and clears
          // the carry so overlapping occurrences don't double-merge
          val stepped = aggregate(
            col("syms"),
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
          val next = words.select(stepped.as("syms"), col("freq")).localCheckpoint()
          words.unpersist()
          words = next
          rank += 1
      }
    }
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Segment words with a learned merge table: replays the merges in rank
    * order over each word's character sequence — the deterministic encode
    * side of [[learnMerges]] (one HOF fold per merge, no shuffle).
    *
    * Scale limit: each merge nests another `aggregate` HOF into ONE column
    * expression, so this Column-API replay is for small merge tables
    * (tests, analyses — tens of merges). A production tokenizer with a
    * 30k-merge vocabulary applies the table imperatively per partition
    * (`mapPartitions` with a trie/priority-queue encoder, the same shape as
    * the multimodal decode plumbing) — the expression tree is the wrong
    * representation at that depth, not the distribution.
    */
  def applyMerges(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val base = docs.select(
      col("*"),
      explode(TextAnalysis.tokens(col(textCol))).as("_w")
    )
      .filter(col("_w") =!= "")
      .withColumn("_syms", concat(split(col("_w"), ""), array(lit("</w>"))))
    val folded = merges.foldLeft(col("_syms")) { case (syms, (l, r)) =>
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
    }
    base.withColumn("_bpe", folded).drop("_syms")
  }
}
