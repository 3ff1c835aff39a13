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

  /** Recurring part co-occurrence graph shared by the triangle / k-core /
    * assortativity entries: undirected edges (u < v) between parts sharing
    * ≥ 2 distinct orders. The threshold keeps the graph sparse (the raw
    * co-occurrence graph at sf0.1 fans 41M wedges); the build is one
    * order-keyed self-join + partial agg.
    */
  private val GraphSql =
    """lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |und AS (SELECT a.pk AS u, b.pk AS v FROM lp a JOIN lp b
      |  ON a.ok = b.ok AND a.pk < b.pk GROUP BY u, v HAVING count(*) >= 2)"""
      .stripMargin

  /** Spark twin of [[GraphSql]]; caller decides whether to checkpoint. */
  private def recurringPartGraph(
      s: org.apache.spark.sql.SparkSession,
      d: String
  ): DataFrame = {
    val lp = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .distinct() // edge weight = distinct shared orders, not line pairs
    lp.toDF("ok", "u")
      .join(lp.toDF("ok", "v"), "ok")
      .filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("_w"))
      .filter(col("_w") >= 2)
      .select("u", "v")
  }

  /** Degree table of an undirected (u, v) edge list. */
  private def degrees(edges: DataFrame): DataFrame =
    edges
      .select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("d"))

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

    // HITS hubs/authorities over the customer→part bipartite purchase graph
    // (customers are hubs, parts authorities): two full update rounds
    // (h→a→h, then a again), each sum-normalized. Same exactness ladder as
    // PageRank — per-node raw scores are EXACT DECIMAL sums of quantized
    // inputs, the normalizing division is one correctly-rounded double op
    // re-quantized to 12 decimals — so both engines walk identical score
    // vectors. Each half-step is one edge-keyed join + partial agg plus a
    // scalar-broadcast normalize; top-20 per side with id tie-break.
    QEntry.sql(
      "q_hits_scores", {
        // one normalized half-step: scores `sIn(key idK)` pushed across
        // edges to the other side's key `outK`
        def sqlStep(sIn: String, idK: String, outK: String, out: String) =
          s"""${out}r AS (SELECT e.$outK AS k, CAST(sum(s.score) AS DECIMAL(28,12)) AS raw
             |  FROM edges e JOIN $sIn s ON e.$idK = s.k GROUP BY e.$outK),
             |${out}s AS (SELECT CAST(sum(raw) AS DECIMAL(38,12)) AS t FROM ${out}r),
             |$out AS (SELECT k, CAST(round(CAST(raw AS DOUBLE) / CAST(t AS DOUBLE), 12)
             |    AS DECIMAL(18,12)) AS score
             |  FROM ${out}r CROSS JOIN ${out}s)"""
        s"""WITH edges AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |hn AS (SELECT CAST(count(*) AS BIGINT) AS n
           |  FROM (SELECT DISTINCT c FROM edges)),
           |h0 AS (SELECT c AS k, CAST(round(CAST(1 AS DOUBLE) / n, 12)
           |    AS DECIMAL(18,12)) AS score
           |  FROM (SELECT DISTINCT c FROM edges) CROSS JOIN hn),
           |${sqlStep("h0", "c", "p", "a1")},
           |${sqlStep("a1", "p", "c", "h1")},
           |${sqlStep("h1", "c", "p", "a2")},
           |${sqlStep("a2", "p", "c", "h2")}
           |SELECT * FROM (SELECT 'auth' AS side, k AS node,
           |    CAST(score AS DOUBLE) AS score
           |  FROM a2 ORDER BY score DESC, node LIMIT 20)
           |UNION ALL
           |SELECT * FROM (SELECT 'hub' AS side, k AS node,
           |    CAST(score AS DOUBLE) AS score
           |  FROM h2 ORDER BY score DESC, node LIMIT 20)"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val edges = orders(s, d)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
        .join(lineitem(s, d).select(col("l_orderkey").as("ok"), col("l_partkey").as("p")), "ok")
        .select("c", "p")
        .distinct()
        .localCheckpoint() // reused by all four half-steps
      // one normalized half-step: push `sIn` (k, score) across edges from
      // side `fromK` onto side `toK`, exact-decimal sum, sum-normalize
      def step(sIn: DataFrame, fromK: String, toK: String): DataFrame = {
        val raw = edges
          .join(sIn.withColumnRenamed("k", fromK), fromK)
          .groupBy(col(toK).as("k"))
          .agg(sum(col("score")).cast("decimal(28,12)").as("raw"))
        val tot = raw.agg(sum(col("raw")).cast("decimal(38,12)").as("t"))
        raw
          .crossJoin(broadcast(tot))
          .select(
            col("k"),
            round(col("raw").cast("double") / col("t").cast("double"), 12)
              .cast("decimal(18,12)")
              .as("score")
          )
      }
      val hubs0 = edges.select(col("c")).distinct()
      val n = hubs0.count() // one scalar: hub-side cardinality is metadata
      val h0 = hubs0.select(
        col("c").as("k"),
        round(lit(1.0 / n), 12).cast("decimal(18,12)").as("score")
      )
      val a1 = step(h0, "c", "p").localCheckpoint()
      val h1 = step(a1, "p", "c").localCheckpoint()
      val a2 = step(h1, "c", "p")
      val h2 = step(a2, "p", "c")
      def top(df: DataFrame, side: String) = df
        .orderBy(col("score").desc, col("k"))
        .limit(20)
        .select(lit(side).as("side"), col("k").as("node"), col("score").cast("double").as("score"))
      top(a2, "auth").unionAll(top(h2, "hub"))
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
      s"""WITH $GraphSql,
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
      val und = recurringPartGraph(s, d)
        .localCheckpoint() // degree pass + orientation both consume it
      val deg = degrees(und)
      val rk = deg.select(col("node"), (col("d") * 1000000000L + col("node")).as("r"))
      val oriented = und
        .join(broadcast(rk.toDF("u", "ru")), "u")
        .join(broadcast(rk.toDF("v", "rv")), "v")
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
    },

    // k-core decomposition, k=3, three unrolled prune rounds: drop nodes
    // of degree < 3, keep edges whose endpoints both survive, repeat. Each
    // round is one partial-agg (degrees) plus two semi-join-shaped equi
    // joins — the standard distributed peel step; rounds are UNROLLED here
    // (fixed 3) and at production depth run under localCheckpoint per
    // round like Dedup.connectedComponents, converging when the node count
    // fixes. Per-round (nodes, edges) census output; all counts exact.
    QEntry.sql(
      "q_kcore_parts",
      s"""WITH $GraphSql,
        |d1 AS (SELECT x AS node, count(*) AS d FROM
        |  (SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY x),
        |n1 AS (SELECT node FROM d1 WHERE d >= 3),
        |e1 AS (SELECT u, v FROM und JOIN n1 a ON und.u = a.node JOIN n1 b ON und.v = b.node),
        |d2 AS (SELECT x AS node, count(*) AS d FROM
        |  (SELECT u AS x FROM e1 UNION ALL SELECT v AS x FROM e1) GROUP BY x),
        |n2 AS (SELECT node FROM d2 WHERE d >= 3),
        |e2 AS (SELECT u, v FROM e1 JOIN n2 a ON e1.u = a.node JOIN n2 b ON e1.v = b.node),
        |d3 AS (SELECT x AS node, count(*) AS d FROM
        |  (SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2) GROUP BY x),
        |n3 AS (SELECT node FROM d3 WHERE d >= 3),
        |e3 AS (SELECT u, v FROM e2 JOIN n3 a ON e2.u = a.node JOIN n3 b ON e2.v = b.node)
        |SELECT 1 AS round,
        |  (SELECT CAST(count(*) AS BIGINT) FROM n1) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
        |UNION ALL SELECT 2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM n2),
        |  (SELECT CAST(count(*) AS BIGINT) FROM e2)
        |UNION ALL SELECT 3,
        |  (SELECT CAST(count(*) AS BIGINT) FROM n3),
        |  (SELECT CAST(count(*) AS BIGINT) FROM e3)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val e0 = recurringPartGraph(s, d).localCheckpoint()
      // one peel: survivors have degree >= k among current edges
      def peel(edges: DataFrame): (DataFrame, DataFrame) = {
        val keep = degrees(edges).filter(col("d") >= 3).select("node")
        val pruned = edges
          .join(broadcast(keep.toDF("u")), Seq("u"), "left_semi")
          .join(broadcast(keep.toDF("v")), Seq("v"), "left_semi")
          .select("u", "v")
          .localCheckpoint() // next round + census both consume it
        (keep, pruned)
      }
      val (n1, e1) = peel(e0)
      val (n2, e2) = peel(e1)
      val (n3, e3) = peel(e2)
      def census(round: Int, nodes: DataFrame, edges: DataFrame): DataFrame =
        nodes
          .agg(count(lit(1)).as("n_nodes"))
          .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
          .select(lit(round).as("round"), col("n_nodes"), col("n_edges"))
      census(1, n1, e1).unionAll(census(2, n2, e2)).unionAll(census(3, n3, e3))
    },

    // Degree assortativity (Newman's r): Pearson correlation of endpoint
    // degrees over the symmetrized edge-end list. All sufficient
    // statistics (m, Σx, Σx², Σxy) are exact BIGINT sums — symmetry makes
    // Σy = Σx — and r is a single fixed-parenthesization double division,
    // so it ships unrounded. Degenerate regular-graph denominator guarded
    // identically on both engines (CASE, not try_divide, so the oracle
    // text matches semantics literally).
    QEntry.sql(
      "q_degree_assortativity",
      s"""WITH $GraphSql,
        |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY x),
        |ends AS (SELECT du.d AS x, dv.d AS y FROM und
        |    JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node
        |  UNION ALL SELECT dv.d, du.d FROM und
        |    JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM ends)
        |SELECT m AS m_ends,
        |  CASE WHEN m * sxx - sx * sx = 0 THEN 0.0
        |    ELSE CAST(m * sxy - sx * sx AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE)
        |  END AS r_assort
        |FROM s""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val und = recurringPartGraph(s, d).localCheckpoint() // degrees + both end joins
      val deg = degrees(und)
      val withDeg = und
        .join(broadcast(deg.toDF("u", "du")), "u")
        .join(broadcast(deg.toDF("v", "dv")), "v")
      val ends = withDeg
        .select(col("du").as("x"), col("dv").as("y"))
        .unionAll(withDeg.select(col("dv").as("x"), col("du").as("y")))
      ends
        .agg(
          count(lit(1)).as("m"),
          sum("x").cast("long").as("sx"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("x") * col("y")).cast("long").as("sxy")
        )
        .select(
          col("m").as("m_ends"),
          when(col("m") * col("sxx") - col("sx") * col("sx") === 0L, lit(0.0))
            .otherwise(
              (col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
                (col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
            )
            .as("r_assort")
        )
    },

    // Newman modularity of the brand partition over the recurring-part
    // graph: Q = Σ_c (m_c/m − (d_c/2m)²), held EXACT over the common
    // denominator 4m² — Q_ppm = (4m·intra − Σ_c d_c²)·10⁶ div (4m²), one
    // HUGEINT/DECIMAL integral division over exact BIGINT edge/degree
    // sums. The "is this partition a real community structure" number a
    // graph-curation pass reports alongside E158's k-core and E159's
    // assortativity. Brand lookup is a broadcast dim join; intra-edge and
    // degree-mass sums are partial aggs on the shared sparse edge list.
    QEntry.sql(
      "q_modularity",
      s"""WITH $GraphSql,
         |bu AS (SELECT p_partkey AS pk, p_brand AS b FROM part),
         |eb AS (SELECT e.u, e.v, a.b AS ub, c.b AS vb FROM und e
         |  JOIN bu a ON e.u = a.pk JOIN bu c ON e.v = c.pk),
         |m_ AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN ub = vb THEN 1 ELSE 0 END) AS BIGINT) AS intra
         |  FROM eb),
         |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) x
         |  GROUP BY node),
         |dc AS (SELECT bu.b, CAST(sum(dg.d) AS BIGINT) AS dsum
         |  FROM dg JOIN bu ON dg.node = bu.pk GROUP BY bu.b),
         |sq AS (SELECT CAST(sum(CAST(dsum AS HUGEINT) * dsum) AS HUGEINT) AS dsq,
         |    CAST(count(*) AS BIGINT) AS n_comm FROM dc)
         |SELECT m_.m AS m_edges, m_.intra AS intra_edges, sq.n_comm,
         |  CAST((CAST(4 AS HUGEINT) * m_.m * m_.intra - sq.dsq) * 1000000
         |    // (CAST(4 AS HUGEINT) * m_.m * m_.m) AS BIGINT) AS q_ppm
         |FROM m_ CROSS JOIN sq""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val edges = recurringPartGraph(s, d).localCheckpoint()
      val bu = part(s, d).select(col("p_partkey").as("pk"), col("p_brand").as("b"))
      val eb = edges
        .join(broadcast(bu.toDF("pk", "ub")), col("u") === col("pk"))
        .drop("pk")
        .join(broadcast(bu.toDF("pk", "vb")), col("v") === col("pk"))
      val mRow = eb.agg(
        count(lit(1)).as("m"),
        sum(when(col("ub") === col("vb"), 1L).otherwise(0L)).cast("long").as("intra")
      )
      val dg = degrees(edges)
      val dc = dg
        .join(broadcast(bu), col("node") === col("pk"))
        .groupBy("b")
        .agg(sum("d").cast("long").as("dsum"))
      val sq = dc.agg(
        sum(col("dsum").cast("decimal(38,0)") * col("dsum")).cast("decimal(38,0)").as("dsq"),
        count(lit(1)).as("n_comm")
      )
      mRow
        .crossJoin(broadcast(sq))
        .select(
          col("m").as("m_edges"),
          col("intra").as("intra_edges"),
          col("n_comm"),
          expr(
            "CAST((CAST(4 AS DECIMAL(38,0)) * m * intra - dsq) * 1000000" +
              " div (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"
          ).as("q_ppm")
        )
    },

    // Adamic–Adar link prediction on the recurring part graph: for each
    // NON-adjacent pair (u, v), score = Σ_z 1/ln(deg z) over common
    // neighbors z, top-50. The scale story is the hub cap: wedges fan out
    // only from common neighbors of degree ≤ 64 (their AA weight ≈ 0
    // anyway — 1/ln d vanishes as hubs grow), so per-node wedge work is
    // bounded by cap² instead of Σdeg², the standard production bound for
    // neighborhood-intersection scoring. Determinism ladder as PageRank:
    // per-term round-12 DECIMAL, exact decimal sum (order-independent),
    // round-4 report, (u, v) tiebreak total order.
    QEntry.sql(
      "q_adamic_adar",
      s"""WITH $GraphSql,
        |deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS d FROM
        |  (SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY x),
        |adj AS (SELECT u AS z, v AS n FROM und UNION ALL SELECT v, u FROM und),
        |capped AS (SELECT adj.z, adj.n, deg.d FROM adj
        |  JOIN deg ON adj.z = deg.node WHERE deg.d <= 64),
        |wz AS (SELECT a.n AS u, b.n AS v,
        |    CAST(round(1.0 / ln(a.d), 12) AS DECIMAL(18,12)) AS wt
        |  FROM capped a JOIN capped b ON a.z = b.z AND a.n < b.n),
        |sc AS (SELECT u, v,
        |    round(CAST(sum(CAST(wt AS DECIMAL(28,12))) AS DOUBLE), 4) AS aa_score
        |  FROM wz GROUP BY u, v)
        |SELECT sc.u, sc.v, sc.aa_score FROM sc
        |LEFT JOIN und ON sc.u = und.u AND sc.v = und.v
        |WHERE und.u IS NULL
        |ORDER BY sc.aa_score DESC, sc.u, sc.v LIMIT 50"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val und = recurringPartGraph(s, d)
        .localCheckpoint() // degree pass, both wedge legs, and the anti-join probe reuse it
      val deg = degrees(und)
      val adj = und
        .select(col("u").as("z"), col("v").as("n"))
        .unionAll(und.select(col("v").as("z"), col("u").as("n")))
      val capped = adj
        .join(broadcast(deg.filter(col("d") <= 64).toDF("z", "d")), "z")
        .localCheckpoint() // both wedge legs consume it — don't rebuild adj⋈deg twice
      val wedges = capped
        .toDF("z", "u", "du")
        .join(capped.toDF("z", "v", "dv"), "z")
        .filter(col("u") < col("v"))
        .select(
          col("u"),
          col("v"),
          round(lit(1.0) / log(col("du").cast("double")), 12)
            .cast("decimal(18,12)")
            .as("wt")
        )
      wedges
        .groupBy("u", "v")
        .agg(round(sum(col("wt").cast("decimal(28,12)")).cast("double"), 4).as("aa_score"))
        .join(und, Seq("u", "v"), "left_anti")
        .orderBy(col("aa_score").desc, col("u"), col("v"))
        .limit(50)
    },

    // Label propagation (2 unrolled rounds, synchronous): every node starts
    // as its own community; each round it adopts the MODE of its neighbors'
    // labels, ties to the smallest label — fully deterministic (no RNG, no
    // visit order: synchronous update + total tie order). Community census
    // output. Each round is one edge-keyed equi-join + two partial aggs —
    // the same shuffle shape as a PageRank step; the argmax is
    // max(struct(cnt, −label)) so no window. At production depth, rounds
    // run under localCheckpoint until the label fingerprint fixes (the
    // connectedComponents convergence pattern).
    QEntry.sql(
      "q_label_propagation", {
        def roundSql(lIn: String, k: Int) =
          s"""cnt$k AS (SELECT a.node, l.lab, count(*) AS c
             |  FROM adj a JOIN $lIn l ON a.nbr = l.node GROUP BY a.node, l.lab),
             |pick$k AS (SELECT node, min(lab) AS lab FROM cnt$k c1
             |  WHERE c = (SELECT max(c) FROM cnt$k c2 WHERE c2.node = c1.node)
             |  GROUP BY node),
             |lab$k AS (SELECT n.node, COALESCE(p.lab, n.node) AS lab
             |  FROM nodes n LEFT JOIN pick$k p ON n.node = p.node)"""
        s"""WITH $GraphSql,
           |adj AS (SELECT u AS node, v AS nbr FROM und
           |  UNION ALL SELECT v, u FROM und),
           |nodes AS (SELECT DISTINCT node FROM adj),
           |lab0 AS (SELECT node, node AS lab FROM nodes),
           |${roundSql("lab0", 1)},
           |${roundSql("lab1", 2)}
           |SELECT lab AS community, CAST(count(*) AS BIGINT) AS size
           |FROM lab2 GROUP BY lab HAVING count(*) >= 2
           |ORDER BY size DESC, community LIMIT 25"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val und = recurringPartGraph(s, d).localCheckpoint()
      val adj = und
        .select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
        .localCheckpoint() // both rounds join against it
      val nodes = adj.select("node").distinct().localCheckpoint()
      def round1(labels: DataFrame): DataFrame = {
        val cnt = adj
          .join(labels.toDF("nbr", "lab"), "nbr")
          .groupBy("node", "lab")
          .agg(count(lit(1)).as("c"))
        // mode with min-label ties: max over (count, −label) packs the
        // argmax into one agg — no per-node window at any scale
        val pick = cnt
          .groupBy("node")
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("lab"))
        nodes
          .join(pick, Seq("node"), "left")
          .select(col("node"), coalesce(col("lab"), col("node")).as("lab"))
      }
      val lab2 = round1(round1(nodes.select(col("node"), col("node").as("lab"))))
      lab2
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("size"))
        .filter(col("size") >= 2)
        .orderBy(col("size").desc, col("community"))
        .limit(25)
    },

    // E379 TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    // over the corpus WORD-ADJACENCY graph — undirected edges between
    // consecutive ≥4-char words, 3 unrolled damped iterations with the
    // SAME 12-decimal DECIMAL-quantized step as q_pagerank_suppliers (one
    // shared `step` implementation), top-20 words. The graph-centrality
    // keyphrase ranker beside txt_rake_keywords' frequency heuristic and
    // txt_tfidf's contrastive weighting; the symmetric graph has no
    // dangling nodes, so the rank mass argument is exact. Edge build is
    // one bigram explode + distinct; each iteration broadcasts the
    // node-sized rank vector over the stationary edge partitioning.
    QEntry.sql(
      "txt_textrank", {
        val invN = "CAST(1 AS DOUBLE) / nn.n"
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
        s"""WITH w AS (SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents),
           |bgs AS (SELECT unnest(list_transform(range(2, len(ws) + 1),
           |    i -> struct_pack(prev := ws[i-1], cur := ws[i]))) AS bp
           |  FROM w WHERE len(ws) >= 2),
           |und AS (SELECT DISTINCT least(bp.prev, bp.cur) AS u,
           |    greatest(bp.prev, bp.cur) AS v
           |  FROM bgs WHERE len(bp.prev) >= 4 AND len(bp.cur) >= 4
           |    AND bp.prev <> bp.cur),
           |edges AS (SELECT u AS src, v AS dst FROM und
           |  UNION ALL SELECT v, u FROM und),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (SELECT node, CAST(round($invN, 12) AS DECIMAL(18,12)) AS r
           |  FROM nodes CROSS JOIN nn),
           |${sqlStep("r0", "r1")},
           |${sqlStep("r1", "r2")},
           |${sqlStep("r2", "r3")}
           |SELECT node AS term, CAST(r AS DOUBLE) AS textrank
           |FROM r3 ORDER BY r DESC, node LIMIT 20"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val bg = documents(s, d)
        .select(graft.functions.TextAnalysis.tokens(col("text")).as("_ws"))
        .filter(size(col("_ws")) >= 2)
        .select(
          explode(
            expr("transform(sequence(2, size(_ws)), i -> struct(_ws[i-2] AS prev, _ws[i-1] AS cur))")
          ).as("_bg")
        )
        .select(col("_bg.prev").as("prev"), col("_bg.cur").as("cur"))
        .filter(length(col("prev")) >= 4 && length(col("cur")) >= 4 &&
          col("prev") =!= col("cur"))
      val und = bg
        .select(least(col("prev"), col("cur")).as("u"), greatest(col("prev"), col("cur")).as("v"))
        .distinct()
      val edges = und
        .select(col("u").as("src"), col("v").as("dst"))
        .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
        .localCheckpoint() // reused every iteration
      val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
      val n = nodes.count()
      val invN = 1.0 / n
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
        .select(col("node").as("term"), col("r").cast("double").as("textrank"))
    },

    // Multi-source BFS hop levels over the recurring part graph: every node
    // reachable within 3 hops of a seed (partkey ≡ 0 mod 100) gets its exact
    // BFS distance. Spark side is the standard distributed frontier
    // expansion — per iteration one edge-keyed join + a min-level partial
    // agg, lineage truncated per round, so depth extends linearly at any
    // scale; min-level makes the result order-independent (a node reached
    // twice in one wave keeps the smaller level). The DuckDB twin is a
    // recursive CTE — same fixpoint, declarative form. All levels exact
    // BIGINTs.
    QEntry.sql(
      "q_bfs_levels",
      s"""WITH RECURSIVE $GraphSql,
         |edges AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
         |bfs AS (
         |  SELECT u AS node, 0 AS lvl FROM (SELECT DISTINCT u FROM edges)
         |    WHERE u % 100 = 0
         |  UNION
         |  SELECT e.v AS node, b.lvl + 1 AS lvl
         |  FROM bfs b JOIN edges e ON e.u = b.node WHERE b.lvl < 3)
         |SELECT CAST(node AS BIGINT) AS node, CAST(min(lvl) AS BIGINT) AS lvl
         |FROM bfs GROUP BY node""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val und = recurringPartGraph(s, d)
      val edges = und
        .unionAll(und.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")) // co-partitions every wave's frontier join
        .localCheckpoint() // joined every wave; truncate the self-join lineage
      val seeds = edges
        .select(col("u").as("node"))
        .distinct()
        .filter(col("node") % 100 === 0)
        .withColumn("lvl", lit(0L))
      val levels = (1 to 3).foldLeft(seeds) { (lv, depth) =>
        val frontier = lv.filter(col("lvl") === (depth - 1)).select(col("node").as("u"))
        val next = edges
          .join(frontier, "u")
          .select(col("v").as("node"), lit(depth.toLong).as("lvl"))
        lv.unionAll(next)
          .groupBy("node")
          .agg(min("lvl").as("lvl"))
          .localCheckpoint()
      }
      levels.select(col("node"), col("lvl"))
    },

    // E434 label-propagation communities ([[graft.operators.GraphOps
    // .labelPropagation]]): 3 deterministic synchronous rounds over the
    // recurring-part graph — each node adopts the (count DESC, label ASC)
    // winner among its neighbors' labels plus its own. Where connected
    // components would merge the whole giant component, LPA splits it into
    // dense part-families. Output is the community census; the twin unrolls
    // all three vote/argmax rounds CTE-for-CTE, so one wrong tie-break in
    // one round shifts the hash.
    QEntry.sql(
      "q_label_prop", {
        val rounds = (1 to 3).map { k =>
          s""",
             |c$k AS (SELECT e.v AS node, l${k - 1}.lbl, count(*) AS c
             |  FROM edges e JOIN l${k - 1} ON e.u = l${k - 1}.node
             |  GROUP BY e.v, l${k - 1}.lbl),
             |l$k AS (SELECT node, lbl FROM (SELECT node, lbl,
             |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
             |  FROM c$k) t WHERE rn = 1)"""
        }.mkString
        s"""WITH $GraphSql,
           |edges AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
           |  UNION ALL SELECT n AS u, n AS v
           |    FROM (SELECT DISTINCT u AS n FROM (SELECT u FROM und
           |          UNION ALL SELECT v FROM und) x) nn),
           |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)$rounds
           |SELECT CAST(lbl AS BIGINT) AS community,
           |  CAST(count(*) AS BIGINT) AS n_nodes
           |FROM l3 GROUP BY lbl""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      graft.operators.GraphOps
        .labelPropagation(recurringPartGraph(s, d).localCheckpoint(), rounds = 3)
        .groupBy(col("community"))
        .agg(count(lit(1)).cast("long").as("n_nodes"))
    }
  )
}
