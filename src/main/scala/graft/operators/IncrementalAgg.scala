package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (IVM): keep a small per-key STATE table
  * of mergeable partial aggregates and fold each new delta into it, instead
  * of rescanning all of history — the only way a daily pipeline over a
  * 100 TB fact table stays O(delta) instead of O(history) per run.
  *
  * The state carries the classic commutative-monoid tuple (count, sum, min,
  * max): merging two states is just re-aggregating the partials with
  * (sum, sum, min, max), so merge is associative and commutative and the
  * maintained invariant is
  *
  *   merge(state(h1), …, state(hn)) ≡ state(h1 ∪ … ∪ hn)
  *
  * — exactly what the `pipe_incr_agg` driver entry pins by hash against a
  * full-recompute DuckDB oracle, and what IncrementalAggSpec replays over
  * random splits. Derived values (avg) are finalized FROM the state
  * (sum/count), never maintained directly — avg is not mergeable.
  *
  * At scale: the state table is key-cardinality-sized (not fact-sized), each
  * delta pass is one partial-agg shuffle over the delta only, and the merge
  * is a shuffle over |keys| rows. Non-mergeable aggregates (exact distinct,
  * exact median) need a sketch state instead — see the HLL/KMV/CMS operators
  * (`q_hll_merge` demonstrates the same merge identity for distincts).
  */
object IncrementalAgg {

  private val StateCols = Seq("st_cnt", "st_sum", "st_min", "st_max")

  /** Per-key mergeable state over an exact-integer value column (use integer
    * cents/ppm units so sums are exact and engine-portable — the repo-wide
    * determinism rule).
    */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "state needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("st_cnt"),
        sum(col(valueCol)).cast("long").as("st_sum"),
        min(col(valueCol)).cast("long").as("st_min"),
        max(col(valueCol)).cast("long").as("st_max")
      )
  }

  /** Merge state frames produced by [[state]] over disjoint (or not — the
    * algebra doesn't care) slices of the fact table: re-aggregate the
    * partials. Keys present in only some states merge correctly because
    * absent rows simply contribute nothing.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    states
      .reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("st_cnt").cast("long").as("st_cnt"),
        sum("st_sum").cast("long").as("st_sum"),
        min("st_min").cast("long").as("st_min"),
        max("st_max").cast("long").as("st_max")
      )
  }

  /** Finalize user-facing aggregates from the state: count, sum, min, max
    * pass through; avg is derived as sum div cnt in exact integer units —
    * TRUNCATION toward zero, the shared semantics of Spark's `div` AND
    * DuckDB 1.0's `//` (verified: `-7 // 2` = -3 in DuckDB, not floor's -4;
    * an earlier revision "corrected" toward floor on negative sums based on
    * a wrong reading of DuckDB and would have diverged engine-vs-oracle by 1
    * on refund-cents columns — pinned by the negative-sum cases in
    * IncrementalAggSpec and the signed-cents driver entry
    * `pipe_incr_agg_signed`).
    */
  def finalize(stateDf: DataFrame, keys: Seq[String]): DataFrame =
    stateDf.select(
      keys.map(col) ++ Seq(
        col("st_cnt").as("cnt"),
        col("st_sum").as("sum_units"),
        col("st_min").as("min_units"),
        col("st_max").as("max_units"),
        expr("st_sum div st_cnt").cast("long").as("avg_units")
      ): _*
    )

  /** Incremental maintenance of an inner-JOIN view — the join-side member of
    * the IVM family beside the per-key aggregate state above. For a
    * maintained view V = R ⋈ S and insert-only deltas ΔR, ΔS, the delta of
    * the view is the standard bag-algebra derivative
    *
    *   ΔV = (ΔR ⋈ S_old) ∪ (R_old ⋈ ΔS) ∪ (ΔR ⋈ ΔS)
    *
    * so the maintained view V_old ∪ ΔV ≡ (R_old ∪ ΔR) ⋈ (S_old ∪ ΔS)
    * without ever re-running the full join — which is what keeps a daily
    * orders-×-customers view over a 100 TB fact table O(delta) per run. The
    * `pipe_delta_join` driver entry pins the identity by hash against a
    * full-recompute oracle; key-overlap, delta-only-key, and no-duplicate
    * cases are in IncrementalAggSpec.
    *
    * Scale shape: deltas are small next to history, so BOTH old-side joins
    * broadcast the delta — two scans of the big tables with broadcast-hash
    * builds, no history shuffle; the ΔR ⋈ ΔS term is delta-×-delta. Insert-
    * only deltas only (the training-pipeline ingest case); deletions need
    * signed multiplicities on top of the same derivative.
    */
  def deltaJoin(
      rOld: DataFrame,
      rDelta: DataFrame,
      sOld: DataFrame,
      sDelta: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty, "deltaJoin needs at least one join key")
    rOld
      .join(broadcast(sDelta), keys)
      .unionByName(broadcast(rDelta).join(sOld, keys))
      .unionByName(broadcast(rDelta).join(broadcast(sDelta), keys))
  }

  /** [[deltaJoin]] with DELETIONS — the signed-multiplicity derivative the
    * insert-only version documents out of scope. Delta frames carry a
    * `mult` column (+1 insert, −1 delete, targeting an existing old row);
    * the three derivative terms multiply multiplicities, so compound cases
    * cancel algebraically (deleting an order AND its customer in one delta
    * nets −1 −1 +1 = −1 against the old view row — exactly one removal).
    * Apply with [[applySignedDelta]]. Same broadcast-the-delta scale shape
    * as [[deltaJoin]].
    */
  def deltaJoinSigned(
      rOld: DataFrame,
      rDelta: DataFrame,
      sOld: DataFrame,
      sDelta: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty, "deltaJoinSigned needs at least one join key")
    val r0 = rOld.withColumn("_rm", lit(1L))
    val rd = rDelta.withColumnRenamed("mult", "_rm")
    val s0 = sOld.withColumn("_sm", lit(1L))
    val sd = sDelta.withColumnRenamed("mult", "_sm")
    r0
      .join(broadcast(sd), keys)
      .unionByName(broadcast(rd).join(s0, keys))
      .unionByName(broadcast(rd).join(broadcast(sd), keys))
      .withColumn("mult", (col("_rm") * col("_sm")).cast("long"))
      .drop("_rm", "_sm")
  }

  /** Fold a signed view delta into the maintained view: rows group on
    * their full value tuple and net multiplicities; net-zero rows vanish.
    * Contract: view rows are unique (the keyed-fact shape — TPC-H orders ×
    * customers), so every net multiplicity is 0 or 1; a genuine bag view
    * would re-expand multiplicities instead. The identity
    * applySignedDelta(V_old, deltaJoinSigned(...)) ≡ (R∖D_R∪I_R) ⋈
    * (S∖D_S∪I_S) is what the `pipe_delta_join_signed` entry pins against a
    * full post-churn recompute.
    */
  def applySignedDelta(vOld: DataFrame, delta: DataFrame): DataFrame = {
    val cols = vOld.columns.toSeq
    vOld
      .withColumn("mult", lit(1L))
      .unionByName(delta.select((cols :+ "mult").map(col): _*))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("mult")).as("_m"))
      .filter(col("_m") =!= 0L)
      .select(cols.map(col): _*)
  }

  /** Per-key RETRACTABLE state — the deletion-capable subset of [[state]]:
    * (count, sum) are group homomorphisms, so a deletion is addition with
    * multiplicity −1 and merge stays plain re-aggregation; min/max are NOT
    * retractable (removing the current minimum needs a re-scan of that
    * key's rows), so this state deliberately omits them — keyed
    * recomputation of affected keys is the honest fallback when a pipeline
    * needs retractable extrema. `multCol`: +1 inserts, −1 deletes.
    */
  def signedState(df: DataFrame, keys: Seq[String], valueCol: String, multCol: String): DataFrame = {
    require(keys.nonEmpty, "signedState needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(
        sum(col(multCol)).cast("long").as("st_cnt"),
        sum(col(multCol) * col(valueCol)).cast("long").as("st_sum")
      )
  }

  /** Merge retractable states (re-aggregate the partials) and drop keys
    * whose net count reached zero — a fully-retracted key leaves the state
    * entirely, matching what a recompute over the post-deletion facts
    * would produce.
    */
  def mergeSigned(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeSigned needs at least one state frame")
    states
      .reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("st_cnt").cast("long").as("st_cnt"),
        sum("st_sum").cast("long").as("st_sum")
      )
      .filter(col("st_cnt") =!= 0L)
  }

  /** Finalize the retractable state: count, sum, truncating avg — the
    * min/max-free counterpart of [[finalize]].
    */
  def finalizeSigned(stateDf: DataFrame, keys: Seq[String]): DataFrame =
    stateDf.select(
      keys.map(col) ++ Seq(
        col("st_cnt").as("cnt"),
        col("st_sum").as("sum_units"),
        expr("st_sum div st_cnt").cast("long").as("avg_units")
      ): _*
    )

  /** Per-key TOP-K state — the rank-keeping member of the IVM family: keep
    * each key's k best (value desc, id asc tiebreak) rows. The maintained
    * identity is
    *
    *   mergeTopK(topKState(h1), …, topKState(hn)) ≡ topKState(h1 ∪ … ∪ hn)
    *
    * because any member of a key's GLOBAL top-k is necessarily in its own
    * slice's top-k — so a daily job keeps k·|keys| rows of state and folds
    * each delta with one delta-sized ranking plus one state-sized merge
    * ranking, never rescanning history. Insert-only, like [[deltaJoin]]:
    * rank state is not retractable (a deleted top member needs that key's
    * re-scan — the same honest boundary as the extrema absent from
    * [[signedState]]). Pinned by the `pipe_incr_topk` entry's full-
    * recompute oracle and random-split/tie cases in IncrementalAggSpec.
    */
  def topKState(
      df: DataFrame,
      keys: Seq[String],
      valCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    require(keys.nonEmpty && k >= 1, s"need keys and k >= 1 (got k=$k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(valCol).desc, col(idCol))
    df.select((keys :+ valCol :+ idCol).map(col): _*)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Merge top-k states (union + re-rank — the shuffle is state-sized,
    * k·|keys| + delta, never history-sized).
    */
  def mergeTopK(
      states: Seq[DataFrame],
      keys: Seq[String],
      valCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    require(states.nonEmpty, "mergeTopK needs at least one state frame")
    topKState(states.reduce(_.unionByName(_)).drop("rank"), keys, valCol, idCol, k)
  }
}
