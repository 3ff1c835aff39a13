package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SymSpell-style typo restoration: map out-of-vocabulary token forms back
  * to their dictionary word via DELETION-NEIGHBORHOOD blocking — each vocab
  * word emits its single-character-deletion variants and candidates meet on
  * an equi-join over the variant string, never an all-pairs edit-distance
  * scan (the SymSpell observation: delete-only neighborhoods cover
  * insert/delete typos at a fraction of the full edit-1 neighborhood).
  *
  * Because the synthetic corpus has no natural typos, the demo pipeline
  * INJECTS them deterministically first (md5-position decision + md5-derived
  * deletion offset, same replayable-contract as `Curation.mlmMask`), then
  * recovers them — so the whole flow is engine-replayable and the oracle
  * checks injection and restoration together.
  *
  * Vocabulary is self-calibrating: a token is a dictionary word iff its
  * observed frequency ≥ max-frequency/4 — a RELATIVE cut, so the split is
  * scale-invariant (an absolute count threshold flips between scale
  * factors; a corrupted form's frequency is ~rate/len of its source word's
  * at every sf).
  *
  * Scale shape: one partial-agg shuffle counts tokens; vocab and OOV are
  * distinct-token-sized (bounded by vocab × word length, not the corpus);
  * the restore join is equi on the variant string with a per-bad-token
  * window over ≤ len+1 candidates.
  */
object SymSpell {

  /** Deterministic corruption key for token `tok` at position `p` of doc
    * `id` — the replay contract both engines compute identically.
    */
  private def key(id: Column, p: Column, tok: Column): Column =
    concat(id.cast("string"), lit(":"), p.cast("string"), lit(":"), tok)

  /** Token stream with typos injected: tokens of length ≥ `minLen` whose
    * md5 hash position falls below `rate` lose one md5-chosen character.
    * Output column: `tok`.
    */
  def injectTypos(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double,
      minLen: Int
  ): DataFrame = {
    val toks = docs
      .select(
        col(idCol).as("_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("_p0", "_tok"))
      )
      .select(col("_id"), (col("_p0") + 1).as("_p"), col("_tok"))
      .filter(length(col("_tok")) >= minLen)
    val k = key(col("_id"), col("_p"), col("_tok"))
    toks
      .withColumn("_corrupt", Sampling.hashPosition(k) < rate)
      // second 8 hex chars of the same md5 pick the deleted offset, 1-based
      .withColumn(
        "_dp",
        conv(substring(md5(k), 9, 8), 16, 10).cast("long") % length(col("_tok")) + 1
      )
      .select(
        when(
          col("_corrupt"),
          expr(
            "concat(substring(_tok, 1, CAST(_dp - 1 AS INT))," +
              " substring(_tok, CAST(_dp + 1 AS INT)))"
          )
        ).otherwise(col("_tok")).as("tok")
      )
  }

  /** End-to-end restore: inject, split vocab/OOV on the relative frequency
    * cut, and match each OOV form to its highest-frequency deletion-variant
    * source (lexicographic tie-break). Output: (bad_tok, restored_tok,
    * n_occ, restored_freq).
    */
  def restoreTypos(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double = 0.125,
      minLen: Int = 4
  ): DataFrame = {
    val cnt = injectTypos(docs, idCol, textCol, rate, minLen)
      .groupBy("tok")
      .agg(count(lit(1)).as("freq"))
      .localCheckpoint() // vocab + OOV both consume it; don't recount the corpus
    val mx = cnt.agg(max("freq").as("m"))
    val tagged = cnt.crossJoin(broadcast(mx))
    val vocab = tagged.filter(col("freq") >= expr("m div 4")).select("tok", "freq")
    val oov = tagged.filter(col("freq") < expr("m div 4")).select("tok", "freq")
    val variants = vocab
      .select(
        col("tok").as("good"),
        col("freq").as("good_freq"),
        explode(
          expr(
            "transform(sequence(1, length(tok))," +
              " i -> concat(substring(tok, 1, i - 1), substring(tok, i + 1)))"
          )
        ).as("variant")
      )
    val w = Window.partitionBy("bad_tok").orderBy(col("good_freq").desc, col("good"))
    oov
      .toDF("bad_tok", "n_occ")
      .join(variants, col("bad_tok") === col("variant"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("bad_tok"),
        col("good").as("restored_tok"),
        col("n_occ"),
        col("good_freq").as("restored_freq")
      )
  }
}
