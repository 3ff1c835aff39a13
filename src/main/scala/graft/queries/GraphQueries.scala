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
    },

    // Triangle census of the RECURRING part co-occurrence graph (parts that
    // share ≥ 2 orders — the threshold keeps the graph sparse where the raw
    // co-occurrence graph at sf0.1 would fan 41M wedges). Degree-ordered
    // orientation is the scale story: every edge points from its lower
    // (degree, id)-ranked endpoint, so each triangle is generated exactly
    // once from its lowest vertex and per-vertex wedge fan-out is bounded
    // by oriented out-degree — O(m^1.5) total work instead of Σdeg², the
    // textbook distributed triangle-count bound. Every stage is an
    // equi-join + partial agg over integer keys; counts are exact BIGINTs.
    QEntry.sql(
      "q_triangle_parts",
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |und AS (SELECT a.pk AS u, b.pk AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY u, v HAVING count(*) >= 2),
        |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY x),
        |rk AS (SELECT node, d * 1000000000 + node AS r FROM deg),
        |o AS (SELECT CASE WHEN ru.r < rv.r THEN und.u ELSE und.v END AS s,
        |    CASE WHEN ru.r < rv.r THEN und.v ELSE und.u END AS t,
        |    CASE WHEN ru.r < rv.r THEN rv.r ELSE ru.r END AS rt
        |  FROM und JOIN rk ru ON und.u = ru.node JOIN rk rv ON und.v = rv.node),
        |w AS (SELECT e1.t AS x, e2.t AS y FROM o e1 JOIN o e2
        |  ON e1.s = e2.s AND e1.rt < e2.rt)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w JOIN o
        |    ON w.x = o.s AND w.y = o.t) AS n_triangles"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
        .distinct() // edge weight = distinct shared orders, not line pairs
      val und = li
        .toDF("ok", "u")
        .join(li.toDF("ok", "v"), "ok")
        .filter(col("u") < col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("_w"))
        .filter(col("_w") >= 2)
        .select("u", "v")
        .localCheckpoint() // degree pass + orientation both consume it
      val deg = und
        .select(col("u").as("node"))
        .unionAll(und.select(col("v").as("node")))
        .groupBy("node")
        .agg(count(lit(1)).as("d"))
      val rk = deg.select(col("node"), (col("d") * 1000000000L + col("node")).as("r"))
      val oriented = und
        .join(rk.toDF("u", "ru"), "u")
        .join(rk.toDF("v", "rv"), "v")
        .select(
          when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("s"),
          when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("t"),
          greatest(col("ru"), col("rv")).as("rt")
        )
        .localCheckpoint() // two wedge legs + the closure probe reuse it
      val wedges = oriented
        .toDF("s", "x", "rx")
        .join(oriented.toDF("s", "y", "ry"), "s")
        .filter(col("rx") < col("ry"))
        .select("x", "y")
      val closed = wedges.join(
        oriented.toDF("x", "y", "_r").select("x", "y"),
        Seq("x", "y")
      )
      und
        .agg(count(lit(1)).as("n_edges"))
        .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
    }
  )
}
