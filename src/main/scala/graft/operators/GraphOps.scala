package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-propagation community detection (Raghavan et al. 2007) — the
  * near-linear community finder beside the connected-components fixpoint
  * ([[Dedup.connectedComponents]] merges everything reachable; LPA splits a
  * connected graph into DENSE groups): each node repeatedly adopts the most
  * common label in its neighborhood.
  *
  * This is the deterministic synchronous variant: every round, each node
  * votes over its neighbors' labels PLUS its own (self-inclusion damps the
  * 2-cycle oscillation plain synchronous LPA exhibits on symmetric pairs),
  * and adopts the (count DESC, label ASC) winner — a total order, so the
  * result is a pure function of the edge set: no randomized update order,
  * identical across engines, runs and partitionings. Rounds are fixed
  * (caller-chosen), matching the unrolled-iteration contract of the
  * PageRank/HITS entries; production depth uses more rounds under the same
  * per-round localCheckpoint lineage truncation.
  *
  * Scale shape per round: one edge-keyed join (labels ride to neighbors),
  * one (node, label) partial agg, one node-keyed min(struct) argmax agg —
  * every shuffle keyed by node, no per-node sort or window, state bounded
  * by the label table. The vote ties and argmax are exact integers.
  */
object GraphOps {

  /** @param edges undirected unique pairs (u, v), u ≠ v
    * @return (node, community) — community labels are node ids
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val fwd = edges.select(col("u").cast("long").as("src"), col("v").cast("long").as("dst"))
    val both = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = both.select(col("src").as("node")).distinct()
    // self-loop per node = the self-vote; hash-partitioned by the join key
    // ONCE (localCheckpoint preserves the physical partitioning), so past
    // the broadcast threshold every round's label join is co-partitioned
    // with the previous round's node-keyed aggregate and pays no exchange
    val e = both
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    var lbl = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      // (count DESC, label ASC) argmax as min(struct(−count, label)) — a
      // partial-aggregating shape with no per-node sort/window; identical
      // winner and tie-break to the former row_number formulation
      lbl = e
        .join(lbl.select(col("node").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min(struct((-col("c")).as("_nc"), col("lbl").as("lbl"))).as("_m"))
        .select(col("node"), col("_m.lbl").as("lbl"))
        .localCheckpoint()
    }
    lbl.select(col("node"), col("lbl").as("community"))
  }
}
