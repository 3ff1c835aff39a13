package graft.operators

import org.apache.spark.sql.DataFrame
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
}
