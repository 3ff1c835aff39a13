package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables._

/** Graph analytics over relationship structures latent in the relational
  * tables — here PageRank over the supplier co-occurrence graph (suppliers
  * that ship lines of the same order are linked; centrality ranks the
  * suppliers most entangled with the rest of the supply network).
  *
  * Determinism: every iteration quantizes per-edge contributions to 12
  * decimals and sums them as DECIMAL — exact and summation-order-independent
  * — then re-quantizes the damped rank. Both engines therefore walk
  * IDENTICAL rank vectors through every iteration; the final top-k is
  * bit-stable with a suppkey tie-break.
  *
  * Scale shape: edges come from an order-keyed self-join (fan-out bounded by
  * lines-per-order², ≤ 49 — never the corpus); each iteration is one
  * edge-keyed join + one partial-agg shuffle, the standard distributed
  * PageRank step. Iterations are UNROLLED (fixed k=3) — at production depth
  * use the same step under `localCheckpoint` per round like
  * [[graft.operators.Dedup.connectedComponents]].
  */
object GraphQueries {

  private val Damping = 0.85
  // NOT computed as 1.0 − Damping: that double is 0.15000000000000002,
  // while both engines' literal 0.15 is the nearest double BELOW — the
  // teleport term must be literal-identical cross-engine
  private val OneMinusD = 0.15
  private val Iters = 3

  /** One PageRank step: r' = round((1−d)/N + d·Σ_in round(r_u/outdeg_u, 12),
    * 12), with the inner sum DECIMAL-exact. `ranks` is (node, r) with r
    * DECIMAL(18,12).
    *
    * `edgesW` carries outdeg pre-joined (computed ONCE, not per iteration)
    * and the rank vector is BROADCAST: it is node-sized (≤ |supplier|, the
    * slow-growing dimension), so each iteration is a broadcast-hash join over
    * the stationary edge partitioning plus one partial agg — no edge shuffle
    * per round. At a node count past broadcast range, drop the hint and the
    * same plan degrades gracefully to a shuffle join.
    */
  private def step(
      ranks: DataFrame,
      edgesW: DataFrame,
      nodes: DataFrame,
      invN: Double
  ): DataFrame = {
    val contrib = edgesW
      .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
      .select(
        col("dst").as("node"),
        round(col("r").cast("double") / col("outdeg"), 12)
          .cast("decimal(18,12)")
          .as("c")
      )
      .groupBy("node")
      .agg(sum("c").cast("decimal(28,12)").as("inflow"))
    nodes
      .join(broadcast(contrib), Seq("node"), "left")
      .select(
        col("node"),
        round(
          lit(OneMinusD * invN) +
            lit(Damping) * coalesce(col("inflow").cast("double"), lit(0.0)),
          12
        ).cast("decimal(18,12)").as("r")
      )
  }

  val entries: Seq[QEntry] = Seq(
    // PageRank over supplier co-occurrence, 3 unrolled iterations, top-20.
    QEntry.sql(
      "q_pagerank_suppliers", {
        val invN = "CAST(1 AS DOUBLE) / nn.n"
        // one unrolled DuckDB iteration from rank table `rIn` to `rOut`
        def sqlStep(rIn: String, rOut: String) =
          s"""$rOut AS (SELECT n.node,
             |  CAST(round((CAST(0.15 AS DOUBLE) * ($invN))
             |    + CAST(0.85 AS DOUBLE) * COALESCE(CAST(f.inflow AS DOUBLE), CAST(0 AS DOUBLE)), 12)
             |    AS DECIMAL(18,12)) AS r
             |  FROM nodes n CROSS JOIN nn
             |  LEFT JOIN (SELECT e.dst AS node,
             |      CAST(sum(CAST(round(CAST(r.r AS DOUBLE) / o.outdeg, 12)
             |        AS DECIMAL(18,12))) AS DECIMAL(28,12)) AS inflow
             |    FROM edges e JOIN $rIn r ON e.src = r.node
             |    JOIN outdeg o ON e.src = o.src
             |    GROUP BY e.dst) f ON n.node = f.node)"""
        s"""WITH edges AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
           |nodes AS (SELECT s_suppkey AS node FROM supplier),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (SELECT node, CAST(round($invN, 12) AS DECIMAL(18,12)) AS r
           |  FROM nodes CROSS JOIN nn),
           |${sqlStep("r0", "r1")},
           |${sqlStep("r1", "r2")},
           |${sqlStep("r2", "r3")}
           |SELECT node AS s_suppkey, CAST(r AS DOUBLE) AS pagerank
           |FROM r3 ORDER BY r DESC, node LIMIT 20"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val edges = li
        .toDF("ok", "src")
        .join(li.toDF("ok", "dst"), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint() // reused every iteration; truncate the self-join lineage
      val nodes = supplier(s, d).select(col("s_suppkey").as("node"))
      val n = nodes.count() // one scalar: N is metadata, not data
      val invN = 1.0 / n
      // outdeg joined once, lineage truncated — without this every iteration
      // re-aggregates the edge list and re-runs the edges⋈outdeg join
      val edgesW = edges
        .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
        .localCheckpoint()
      val r0 = nodes.select(
        col("node"),
        round(lit(invN), 12).cast("decimal(18,12)").as("r")
      )
      val r3 = (1 to Iters).foldLeft(r0)((r, _) => step(r, edgesW, nodes, invN))
      r3
        .orderBy(col("r").desc, col("node"))
        .limit(20)
        .select(col("node").as("s_suppkey"), col("r").cast("double").as("pagerank"))
    }
  )
}
