package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{GeoJoin, Profiling, QualityChecks, Selection, TermStats}

/** Statistical-analytics inventory: per-group linear regression, distribution
  * entropy, frequency heavy hitters, rolling medians, bitmap aggregates and
  * grid-bucketed proximity joins.
  *
  * Determinism strategy (see [[QEntry]]): wherever a formula can be expressed
  * over EXACT integer sums (counts, cents, scaled units), it is — the final
  * double combination is then correctly-rounded arithmetic on identical
  * inputs, so results are bit-identical across engines and ship UNROUNDED.
  * Only ln/log2-based scores (entropy) round, and only to absorb libm
  * last-ulp drift.
  */
object StatQueries {

  private val wordsSql = """string_split_regex(trim(text), '\s+')"""

  /** Shared slope-numerator/denominator SQL for the regression twin —
    * identical parenthesization to the Spark side.
    */
  private val numSql = "((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy))"
  private val denSql = "((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * sx))"
  private val denYSql = "((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy))"

  val entries: Seq[QEntry] = Seq(
    // Per-group least-squares regression + Pearson correlation of extended
    // price against quantity, from exact integer sums (price in cents):
    // the five sufficient statistics are bigint/decimal-exact, the closed-form
    // combination is correctly-rounded double math → bit-identical output,
    // no rounding needed. One partial-aggregated pass over lineitem.
    QEntry.sql(
      "q_regr_per_group",
      s"""WITH b AS (SELECT l_returnflag AS flag,
         |    CAST(round(l_quantity) AS BIGINT) AS qx,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS py
         |  FROM lineitem),
         |s AS (SELECT flag, count(*) AS n,
         |    CAST(sum(qx) AS BIGINT) AS sx, CAST(sum(py) AS BIGINT) AS sy,
         |    CAST(sum(qx * qx) AS BIGINT) AS sxx, CAST(sum(qx * py) AS BIGINT) AS sxy,
         |    CAST(sum(py * py) AS DOUBLE) AS syy
         |  FROM b GROUP BY flag)
         |SELECT flag, n,
         |  (($numSql / $denSql) / 100.0) AS slope,
         |  (((CAST(sy AS DOUBLE) - ($numSql / $denSql) * CAST(sx AS DOUBLE))
         |     / CAST(n AS DOUBLE)) / 100.0) AS intercept,
         |  round($numSql / (sqrt($denSql) * sqrt($denYSql)), 6) AS corr
         |FROM s""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val b = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_quantity")).cast("long").as("qx"),
        round(col("l_extendedprice") * 100).cast("long").as("py")
      )
      val sums = b
        .groupBy(col("flag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("qx")).as("sx"),
          sum(col("py")).as("sy"),
          sum(col("qx") * col("qx")).as("sxx"),
          sum(col("qx") * col("py")).as("sxy"),
          // per-row squares fit a long; only the SUM needs decimal headroom
          sum((col("py") * col("py")).cast("decimal(38,0)")).cast("double").as("syy")
        )
      val nD = col("n").cast("double")
      val num = (nD * col("sxy")) - (col("sx").cast("double") * col("sy"))
      val den = (nD * col("sxx")) - (col("sx").cast("double") * col("sx"))
      val denY = (nD * col("syy")) - (col("sy").cast("double") * col("sy"))
      val slope100 = num / den
      sums.select(
        col("flag"),
        col("n"),
        (slope100 / 100.0).as("slope"),
        (((col("sy").cast("double") - slope100 * col("sx").cast("double")) / nD) / 100.0)
          .as("intercept"),
        // corr rounds to 6: denY's syy statistic exceeds int64 at sf0.1+,
        // and the decimal/hugeint→double casts can differ by one ulp
        // between engines (see q_covariance_matrix / DETERMINISM.md);
        // slope/intercept touch only sub-2^53 sums and stay unrounded
        round(num / (sqrt(den) * sqrt(denY)), 6).as("corr")
      )
    },

    // Shannon entropy (bits) of the event-type distribution per user bucket:
    // two-level hash aggregate, broadcast totals join, log2 rounded to absorb
    // libm ulp drift.
    QEntry.sql(
      "q_entropy_groups",
      """WITH c AS (SELECT user_id % 10 AS bucket, event_type, count(*) AS cnt
        |  FROM events GROUP BY bucket, event_type),
        |t AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS n_types
        |  FROM c GROUP BY bucket)
        |SELECT c.bucket, t.tot AS n_events, t.n_types,
        |  round(-sum((CAST(cnt AS DOUBLE) / tot) * log2(CAST(cnt AS DOUBLE) / tot)), 4)
        |    AS entropy
        |FROM c JOIN t ON c.bucket = t.bucket
        |GROUP BY c.bucket, t.tot, t.n_types""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val c = events(s, d)
        .groupBy((col("user_id") % 10).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val t = c.groupBy(col("bucket")).agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_types"))
      val p = col("cnt").cast("double") / col("tot")
      c.join(broadcast(t), "bucket")
        .groupBy(col("bucket"), col("tot").as("n_events"), col("n_types"))
        .agg(round(-sum(p * log2(p)), 4).as("entropy"))
    },

    // Frequency heavy hitters over corpus tokens: terms above a 2% support
    // threshold of all tokens. Exact counts + one broadcast total — the
    // distributed analogue of a Misra-Gries pass with exact output.
    QEntry.sql(
      "q_heavy_hitters_tokens",
      s"""WITH toks AS (SELECT t.term FROM (SELECT unnest($wordsSql) AS term
         |    FROM documents) t WHERE t.term <> ''),
         |tot AS (SELECT count(*) AS t FROM toks),
         |cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY term)
         |SELECT term, c AS cnt, CAST(c AS DOUBLE) / t AS ratio
         |FROM cnt, tot WHERE c >= 0.02 * t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tot = toks.agg(count(lit(1)).as("t"))
      toks
        .groupBy(col("term"))
        .agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot))
        .filter(col("c") >= lit(0.02) * col("t"))
        .select(col("term"), col("c").as("cnt"), (col("c").cast("double") / col("t")).as("ratio"))
    },

    // 7-day rolling median of daily revenue per return flag. Revenue is
    // aggregated to exact integer cents FIRST, so the median interpolation
    // ((a+b)/2 on integer-valued doubles) is exact and ships unrounded.
    // Spark has no median window function — the rolling frame materializes
    // as a sorted 7-element array (bounded state) with explicit middle-pick.
    QEntry.sql(
      "q_rolling_median_rev",
      """WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
        |    CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)
        |      AS rev_cents
        |  FROM lineitem GROUP BY flag, d)
        |SELECT flag, strftime(d, '%Y-%m-%d') AS day, rev_cents,
        |  (median(rev_cents) OVER (PARTITION BY flag ORDER BY d
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) / 100.0 AS med7
        |FROM daily""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("d"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 100)
            .cast("long")
            .as("rev_cents")
        )
      val w = Window.partitionBy(col("flag")).orderBy(col("d")).rowsBetween(-6, 0)
      val arr = array_sort(collect_list(col("rev_cents")).over(w))
      val n = size(arr)
      val med = when(
        pmod(n, lit(2)) === 1,
        element_at(arr, ((n + lit(1)) / lit(2)).cast("int")).cast("double")
      ).otherwise(
        (element_at(arr, (n / lit(2)).cast("int")) +
          element_at(arr, ((n / lit(2)) + lit(1)).cast("int"))) / lit(2.0)
      )
      daily.select(
        col("flag"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("rev_cents"),
        (med / 100.0).as("med7")
      )
    },

    // Bitmap aggregate: which ship months a (flag, status) group covers, as a
    // single bigint bitmask via bit_or — the cheapest "distinct small ints
    // per group" representation (no distinct shuffle, map-side combinable).
    QEntry.sql(
      "q_bitmap_months",
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  bit_or(CAST(1 AS BIGINT) << month(l_shipdate)) AS month_bitmap,
        |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << month(l_shipdate))) AS BIGINT)
        |    AS n_months
        |FROM lineitem GROUP BY flag, status""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      // functions.shiftleft only takes a literal Int shift — SQL form allows
      // a column amount
      val bit = expr("shiftleft(CAST(1 AS BIGINT), month(l_shipdate))")
      lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .agg(
          bit_or(bit).as("month_bitmap"),
          bit_count(bit_or(bit)).cast("long").as("n_months")
        )
    },

    // Grid-bucketed proximity join (GeoJoin operator): customer and supplier
    // points on a synthetic coordinate plane, pairs within 10 units. The
    // oracle replays the naive cross-join form — same rows by construction;
    // the Spark plan is the 3×3-neighbor-cell equi-join (asserted no
    // nested-loop in PlanQualitySpec).
    QEntry.sql(
      "q_geo_grid_join",
      """WITH a AS (SELECT c_custkey,
        |    (c_custkey % 1800) / 10.0 - 90.0 AS lat,
        |    ((c_custkey * 7) % 3600) / 10.0 - 180.0 AS lon FROM customer),
        |b AS (SELECT s_suppkey,
        |    ((s_suppkey * 13) % 1800) / 10.0 - 90.0 AS lat,
        |    ((s_suppkey * 29) % 3600) / 10.0 - 180.0 AS lon FROM supplier)
        |SELECT c_custkey, s_suppkey,
        |  sqrt(((a.lat - b.lat) * (a.lat - b.lat)) + ((a.lon - b.lon) * (a.lon - b.lon)))
        |    AS dist
        |FROM a, b
        |WHERE sqrt(((a.lat - b.lat) * (a.lat - b.lat)) + ((a.lon - b.lon) * (a.lon - b.lon)))
        |  <= 10.0""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val c = customer(s, d).select(
        col("c_custkey"),
        ((col("c_custkey") % 1800) / lit(10.0) - lit(90.0)).as("lat"),
        (((col("c_custkey") * 7) % 3600) / lit(10.0) - lit(180.0)).as("lon")
      )
      val sup = supplier(s, d).select(
        col("s_suppkey"),
        (((col("s_suppkey") * 13) % 1800) / lit(10.0) - lit(90.0)).as("lat"),
        (((col("s_suppkey") * 29) % 3600) / lit(10.0) - lit(180.0)).as("lon")
      )
      GeoJoin.gridProximityJoin(c, "c_custkey", sup, "s_suppkey", "lat", "lon", 10.0)
    },

    // Column profiling over orders: one row per column with row/null/distinct
    // counts and stringified min/max — the drop-gate summary (Profiling
    // operator; single scan, multi-count-distinct Expand).
    QEntry.sql(
      "q_profile_orders", {
        val cols =
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        cols
          .map(c => s"""SELECT '$c' AS col_name, count(*) AS n_rows,
            |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
            |FROM orders""".stripMargin.replaceAll("\\s+", " "))
          .mkString(" UNION ALL ")
      }
    ) { (s, d) =>
      Profiling.profile(
        orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      )
    },

    // Per-group z-score anomaly detection over event values: flag |z| >= 3
    // within each event type. Double sufficient statistics with identical
    // parenthesization; z rounds to 4 to absorb sum-order noise, and the
    // nearest |z| to the cut sits 1.6e-3 away at sf0.01 — far beyond the
    // ~1e-12 noise floor, so membership cannot flip cross-engine.
    QEntry.sql(
      "q_zscore_outliers",
      """WITH b AS (SELECT event_id, event_type, value AS v FROM events
        |  WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n, sum(v) AS sy, sum(v * v) AS syy
        |  FROM b GROUP BY event_type)
        |SELECT event_id, event_type, v AS value,
        |  round((v - (sy / CAST(n AS DOUBLE)))
        |    / sqrt(((CAST(n AS DOUBLE) * syy) - (sy * sy))
        |           / (CAST(n AS DOUBLE) * (n - 1))), 4) AS z
        |FROM b JOIN s USING (event_type)
        |WHERE abs((v - (sy / CAST(n AS DOUBLE)))
        |    / sqrt(((CAST(n AS DOUBLE) * syy) - (sy * sy))
        |           / (CAST(n AS DOUBLE) * (n - 1)))) >= 3.0"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val b = events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value").as("v"))
      val st = b
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sy"), sum(col("v") * col("v")).as("syy"))
      val nD = col("n").cast("double")
      val z = (col("v") - (col("sy") / nD)) /
        sqrt(((nD * col("syy")) - (col("sy") * col("sy"))) / (nD * (col("n") - 1)))
      b.join(broadcast(st), "event_type")
        .filter(abs(z) >= 3.0)
        .select(col("event_id"), col("event_type"), col("v").as("value"), round(z, 4).as("z"))
    },

    // E337 HBOS outliers ([[QualityChecks.hbosScores]]): histogram-based
    // outlier score over two discretized features (value band, hour of
    // day) — Σ −ln(bin frequency), the no-distances no-iterations
    // unsupervised screen (Goldstein & Dengel 2012) that runs before the
    // per-group z-score fence. Per-term −ln quantizes to 9-dp DECIMAL
    // before the sum; top-20 cut ties on event_id; twin replays the
    // identical joins and ladder.
    QEntry.sql(
      "q_hbos_outliers",
      """WITH e AS (SELECT event_id, CAST(floor(value / 20) AS BIGINT) AS vb,
        |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod FROM events),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM e),
        |f1 AS (SELECT vb, CAST(count(*) AS BIGINT) AS n1 FROM e GROUP BY vb),
        |f2 AS (SELECT hod, CAST(count(*) AS BIGINT) AS n2 FROM e GROUP BY hod),
        |sc AS (SELECT e.event_id, e.vb, e.hod,
        |    round(CAST(
        |      CAST(round(-ln(CAST(n1 AS DOUBLE) / nt), 9) AS DECIMAL(18,9)) +
        |      CAST(round(-ln(CAST(n2 AS DOUBLE) / nt), 9) AS DECIMAL(18,9))
        |      AS DOUBLE), 6) AS hbos
        |  FROM e CROSS JOIN t JOIN f1 USING (vb) JOIN f2 USING (hod))
        |SELECT event_id, vb, hod, hbos FROM (
        |  SELECT event_id, vb, hod, hbos,
        |    row_number() OVER (ORDER BY hbos DESC, event_id) AS rn FROM sc) q
        |WHERE rn <= 20""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      QualityChecks
        .hbosScores(
          events(s, d).select(
            col("event_id"),
            floor(col("value") / 20).cast("long").as("vb"),
            hour(col("ts")).cast("long").as("hod")
          ),
          "event_id",
          Seq("vb", "hod")
        )
        .orderBy(col("hbos").desc, col("event_id"))
        .limit(20)
    },

    // Rolling 7-day distinct active users per event type. Spark lacks
    // DISTINCT window aggregates — size(collect_set) over a RANGE frame is
    // the equivalent (bounded by the window's user count); the day-grain
    // pre-distinct keeps the frame state one row per (type, day, user).
    QEntry.sql(
      "q_window_distinct_users",
      """WITH base AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id
        |  FROM events),
        |wn AS (SELECT event_type, d,
        |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day_num, user_id
        |  FROM base)
        |SELECT DISTINCT event_type, strftime(d, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY day_num
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS users7
        |FROM wn""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val w = Window
        .partitionBy(col("event_type"))
        .orderBy(col("day_num"))
        .rangeBetween(-6, 0)
      base
        .withColumn("day_num", datediff(col("d"), to_date(lit("1970-01-01"))).cast("long"))
        .withColumn("users7", size(collect_set(col("user_id")).over(w)).cast("long"))
        .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"), col("users7"))
        .distinct()
    },

    // Unigram-LM cross-entropy per document (bits/token): how surprising a
    // doc is under the corpus's own unigram distribution — the cheap
    // perplexity-style quality signal. Corpus term stats broadcast back to
    // the token stream; one keyed aggregate per doc.
    QEntry.sql(
      "txt_lm_cross_entropy",
      s"""WITH toks AS (SELECT doc_id, t.term FROM (SELECT doc_id, unnest($wordsSql) AS term
         |    FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
         |tot AS (SELECT count(*) AS t FROM toks)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round((-sum(log2(CAST(c AS DOUBLE) / t))) / count(*), 4) AS cross_entropy
         |FROM toks JOIN tf USING (term) CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val tot = toks.agg(count(lit(1)).as("t"))
      toks
        .join(broadcast(tf), "term")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          round(
            (-sum(log2(col("c").cast("double") / col("t")))) / count(lit(1)),
            4
          ).as("cross_entropy")
        )
    },

    // Interpolated add-one bigram cross-entropy per doc
    // ([[TermStats.bigramCrossEntropy]]): the KenLM-class perplexity filter
    // one order above txt_lm_cross_entropy. All counts exact BIGINTs; the
    // per-bigram bits quantize to 9 decimals → DECIMAL before the per-doc
    // sum (order-free), final bits/bigram one rounded double division.
    QEntry.sql(
      "txt_bigram_perplexity",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
         |tk AS (SELECT doc_id, t.term FROM
         |  (SELECT doc_id, unnest(words) AS term FROM w) t WHERE t.term <> ''),
         |uni AS (SELECT term, count(*) AS cu FROM tk GROUP BY term),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
         |  FROM uni),
         |bgs AS (SELECT doc_id, unnest(list_transform(range(2, len(words) + 1),
         |    i -> struct_pack(prev := words[i-1], cur := words[i]))) AS bp
         |  FROM w WHERE len(words) >= 2),
         |bstream AS (SELECT doc_id, bp.prev AS prev, bp.cur AS cur FROM bgs),
         |bg AS (SELECT prev, cur, count(*) AS c2 FROM bstream GROUP BY prev, cur),
         |ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY prev),
         |ratio AS (SELECT bg.prev, bg.cur,
         |    CAST(round(-log2(0.75 * (CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
         |      + 0.25 * (CAST(cu + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))), 9)
         |      AS DECIMAL(18,9)) AS bits
         |  FROM bg JOIN ctx ON bg.prev = ctx.prev
         |  JOIN uni ON bg.cur = uni.term CROSS JOIN tot)
         |SELECT s.doc_id, count(*) AS n_bigrams,
         |  round(CAST(CAST(sum(bits) AS DECIMAL(28,9)) AS DOUBLE) / count(*), 6)
         |    AS bigram_entropy
         |FROM bstream s JOIN ratio ON s.prev = ratio.prev AND s.cur = ratio.cur
         |GROUP BY s.doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      TermStats.bigramCrossEntropy(documents(s, d), "doc_id", "text", 0.75)
    },

    // E362 Good-Turing count re-estimation ([[TermStats.goodTuringTable]]):
    // the frequency-of-frequencies table under every classical smoother —
    // per unigram count class r: the type count N_r and the adjusted count
    // r* = (r+1)·N_{r+1}/N_r (raw estimator; classes without a successor
    // are excluded, as raw GT is undefined across N gaps). Two map-side
    // combining aggregates + a self-join over the CLASS table (≤ max-count
    // rows — metadata-sized at any corpus scale).
    QEntry.sql(
      "txt_good_turing",
      s"""WITH toks AS (SELECT t.term FROM (SELECT unnest($wordsSql) AS term
         |    FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY term),
         |cls AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY r)
         |SELECT a.r, a.n_r,
         |  round((a.r + 1) * (CAST(b.n_r AS DOUBLE) / a.n_r), 6) AS r_star
         |FROM cls a JOIN cls b ON b.r = a.r + 1
         |ORDER BY a.r LIMIT 20""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => TermStats.goodTuringTable(documents(s, d), "doc_id", "text", topN = 20) },

    // E363 Good-Turing missing mass ([[TermStats.goodTuringUnseenMass]]):
    // P₀ = N₁/N — the probability the NEXT token is a never-seen type, the
    // coverage scalar GT smoothing reserves for unseen events — with its
    // auditable ingredients (type/token/singleton/doubleton counts), exact
    // ppm integral division plus one rounded double.
    QEntry.sql(
      "txt_gt_unseen_mass",
      s"""WITH toks AS (SELECT t.term FROM (SELECT unnest($wordsSql) AS term
         |    FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY term)
         |SELECT CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(r) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  CAST(CASE WHEN sum(r) = 0 THEN 0 ELSE
         |    sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) * 1000000 // sum(r) END AS BIGINT)
         |    AS p0_ppm,
         |  CASE WHEN sum(r) = 0 THEN 0.0 ELSE
         |    round(CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS DOUBLE) / sum(r), 6) END
         |    AS p_unseen
         |FROM tf""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => TermStats.goodTuringUnseenMass(documents(s, d), "doc_id", "text") },

    // E371 Witten-Bell smoothing per source ([[TermStats.wittenBellTable]]):
    // the escape-probability smoother (PPM method C) completing the
    // classical ladder beside Good-Turing and Kneser-Ney — per domain with
    // N tokens and T types, P_wb(w) = c(w)/(N+T) and escape mass T/(N+T)
    // (first-occurrence events stand in for the unseen count the way GT
    // uses singletons). Per-source rows with the top term's raw and
    // smoothed mass; exact integer ppm divisions throughout.
    QEntry.sql(
      "txt_witten_bell",
      s"""WITH toks AS (SELECT source, t.term FROM (SELECT source,
         |    unnest($wordsSql) AS term FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY source, term),
         |stats AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_types FROM tf GROUP BY source),
         |top AS (SELECT source, term AS top_term, c AS top_count FROM (
         |    SELECT source, term, c, row_number() OVER
         |      (PARTITION BY source ORDER BY c DESC, term) AS rn FROM tf) r
         |  WHERE rn = 1)
         |SELECT stats.source, n_tokens, n_types,
         |  CAST(n_types * 1000000 // (n_tokens + n_types) AS BIGINT) AS escape_ppm,
         |  top_term, top_count,
         |  CAST(top_count * 1000000 // (n_tokens + n_types) AS BIGINT) AS p_top_ppm
         |FROM stats JOIN top USING (source)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      TermStats.wittenBellTable(documents(s, d), "doc_id", "text", Seq("source"))
    },

    // E395 pairwise Jensen-Shannon divergence between source unigram
    // distributions — the SYMMETRIC, √-metrizable, [0,1]-bounded
    // distribution distance beside txt_kl_sources' asymmetric KL (JSD is
    // what mixture/dedup audits compare corpora with: no infinities on
    // disjoint support). Decomposed so NO outer join is needed: shared
    // terms contribute ½p·log₂(2p/(p+q)) + ½q·log₂(2q/(p+q)) (9-dp DECIMAL
    // sums), and each side's UNSHARED mass contributes exactly (1−Σp)/2 —
    // with Σp over shared terms an exact integer ratio. The pair stage is a
    // term-keyed self-join (sources² pairs per term at most; the shuffle
    // carries term TYPES).
    QEntry.sql(
      "txt_jsd_sources",
      s"""WITH toks AS (SELECT source, t.term FROM (SELECT source,
         |    unnest($wordsSql) AS term FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY source, term),
         |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM tf GROUP BY source),
         |pr AS (SELECT a.source AS s1, b.source AS s2, a.term,
         |    a.c AS c1, b.c AS c2, ta.tot AS t1, tb.tot AS t2,
         |    CAST(a.c AS DOUBLE) / ta.tot AS pp,
         |    CAST(b.c AS DOUBLE) / tb.tot AS qq
         |  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
         |  JOIN tt ta ON a.source = ta.source JOIN tt tb ON b.source = tb.source),
         |contrib AS (SELECT s1, s2,
         |    CAST(sum(CAST(round(0.5 * pp * log2(2.0 * pp / (pp + qq))
         |      + 0.5 * qq * log2(2.0 * qq / (pp + qq)), 9) AS DECIMAL(18,9)))
         |      AS DECIMAL(28,9)) AS shared_bits,
         |    CAST(count(*) AS BIGINT) AS n_shared,
         |    CAST(sum(c1) AS BIGINT) AS sc1, CAST(sum(c2) AS BIGINT) AS sc2,
         |    CAST(max(t1) AS BIGINT) AS t1, CAST(max(t2) AS BIGINT) AS t2
         |  FROM pr GROUP BY s1, s2)
         |SELECT s1 AS source_a, s2 AS source_b, n_shared,
         |  round(CAST(shared_bits AS DOUBLE)
         |    + (1.0 - CAST(sc1 AS DOUBLE) / t1) / 2.0
         |    + (1.0 - CAST(sc2 AS DOUBLE) / t2) / 2.0, 6) AS jsd_bits
         |FROM contrib""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(col("source"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy("source", "term").agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint() // both join sides and the totals re-read it
      val tt = tf.groupBy("source").agg(sum("c").cast("long").as("tot"))
      val a = tf.select(col("source").as("s1"), col("term"), col("c").as("c1"))
      val b = tf.select(col("source").as("s2"), col("term"), col("c").as("c2"))
      val pr = a
        .join(b, Seq("term"))
        .filter(col("s1") < col("s2"))
        .join(broadcast(tt.select(col("source").as("s1"), col("tot").as("t1"))), "s1")
        .join(broadcast(tt.select(col("source").as("s2"), col("tot").as("t2"))), "s2")
        .withColumn("pp", col("c1").cast("double") / col("t1"))
        .withColumn("qq", col("c2").cast("double") / col("t2"))
      pr.groupBy("s1", "s2")
        .agg(
          sum(
            round(
              lit(0.5) * col("pp") * log2(lit(2.0) * col("pp") / (col("pp") + col("qq"))) +
                lit(0.5) * col("qq") * log2(lit(2.0) * col("qq") / (col("pp") + col("qq"))),
              9
            ).cast("decimal(18,9)")
          ).cast("decimal(28,9)").as("shared_bits"),
          count(lit(1)).cast("long").as("n_shared"),
          sum("c1").cast("long").as("sc1"),
          sum("c2").cast("long").as("sc2"),
          max("t1").cast("long").as("t1"),
          max("t2").cast("long").as("t2")
        )
        .select(
          col("s1").as("source_a"),
          col("s2").as("source_b"),
          col("n_shared"),
          round(
            col("shared_bits").cast("double") +
              (lit(1.0) - col("sc1").cast("double") / col("t1")) / lit(2.0) +
              (lit(1.0) - col("sc2").cast("double") / col("t2")) / lit(2.0),
            6
          ).as("jsd_bits")
        )
    },

    // E389 conditional bigram entropy ([[TermStats.conditionalEntropy]]):
    // H(cur|prev) = H(prev,cur) − H(prev) over the SAME bigram stream (the
    // chain rule holds exactly) — the entropy-rate estimate under every
    // perplexity number here; the gap to the unigram entropy is the
    // predictability bigram LMs monetize. 9-dp DECIMAL term sums, exact
    // decimal subtraction, bigram-TYPE shuffles only.
    QEntry.sql(
      "txt_cond_entropy",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
         |bgs AS (SELECT unnest(list_transform(range(2, len(words) + 1),
         |    i -> struct_pack(prev := words[i-1], cur := words[i]))) AS bp
         |  FROM w WHERE len(words) >= 2),
         |bg AS (SELECT bp.prev AS prev, bp.cur AS cur, CAST(count(*) AS BIGINT) AS c2
         |  FROM bgs GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c2) AS BIGINT) AS bt FROM bg),
         |hj AS (SELECT CAST(sum(CAST(round(
         |      -(CAST(c2 AS DOUBLE) / bt) * log2(CAST(c2 AS DOUBLE) / bt), 9)
         |    AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS hj FROM bg CROSS JOIN tot),
         |mrg AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY prev),
         |hp AS (SELECT CAST(sum(CAST(round(
         |      -(CAST(c1 AS DOUBLE) / bt) * log2(CAST(c1 AS DOUBLE) / bt), 9)
         |    AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS hp,
         |    CAST(max(bt) AS BIGINT) AS n_bigrams FROM mrg CROSS JOIN tot)
         |SELECT hp.n_bigrams, round(CAST(hj.hj AS DOUBLE), 6) AS h_joint,
         |  round(CAST(hp.hp AS DOUBLE), 6) AS h_prev,
         |  round(CAST(hj.hj - hp.hp AS DOUBLE), 6) AS h_cond
         |FROM hp CROSS JOIN hj""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => TermStats.conditionalEntropy(documents(s, d), "doc_id", "text") },

    // E382 Min-K% probability score (Shi et al. 2023's membership-inference
    // / contamination signal, unigram instantiation): per document, the
    // mean surprisal of its K% = 20% LEAST-probable tokens under the
    // corpus's own LM — memorized/duplicated text scores low (no surprising
    // tokens), novel text high; the detection statistic behind
    // "was this eval doc in the training set" audits. Per-token surprisal
    // quantizes to 9-dp DECIMAL; the top-k cut is a doc-keyed window
    // (partition = doc_id, the scalable direction), and boundary ties have
    // EQUAL bits values so the sum is tie-order independent.
    QEntry.sql(
      "txt_min_k_prob",
      s"""WITH toks AS (SELECT doc_id, t.term FROM (SELECT doc_id,
         |    unnest($wordsSql) AS term FROM documents) t WHERE t.term <> ''),
         |tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
         |tot AS (SELECT count(*) AS t FROM toks),
         |bits AS (SELECT doc_id,
         |    CAST(round(-log2(CAST(c AS DOUBLE) / t), 9) AS DECIMAL(18,9)) AS b
         |  FROM toks JOIN tf USING (term) CROSS JOIN tot),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM bits GROUP BY doc_id),
         |rk AS (SELECT doc_id, b, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY b DESC) AS rn FROM bits),
         |topk AS (SELECT rk.doc_id, CAST(sum(rk.b) AS DECIMAL(28,9)) AS s,
         |    CAST(count(*) AS BIGINT) AS k
         |  FROM rk JOIN dl USING (doc_id)
         |  WHERE rk.rn <= greatest(1, dl.n // 5) GROUP BY rk.doc_id)
         |SELECT topk.doc_id, dl.n AS n_tokens, topk.k,
         |  round(CAST(topk.s AS DOUBLE) / topk.k, 6) AS min_k_bits
         |FROM topk JOIN dl USING (doc_id)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val toks = documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy("term").agg(count(lit(1)).as("c"))
      val tot = toks.agg(count(lit(1)).as("t"))
      val bits = toks
        .join(broadcast(tf), "term")
        .crossJoin(broadcast(tot))
        .select(
          col("doc_id"),
          round(-log2(col("c").cast("double") / col("t")), 9)
            .cast("decimal(18,9)").as("b")
        )
        .localCheckpoint() // length table and ranked cut both re-read it
      val dl = bits.groupBy("doc_id").agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("b").desc)
      bits
        .withColumn("rn", row_number().over(w))
        .join(dl, "doc_id")
        .filter(col("rn") <= greatest(lit(1L), expr("n div 5")))
        .groupBy("doc_id")
        .agg(
          sum("b").cast("decimal(28,9)").as("s"),
          count(lit(1)).cast("long").as("k"),
          max("n").as("n_tokens")
        )
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("k"),
          round(col("s").cast("double") / col("k"), 6).as("min_k_bits")
        )
    },

    // E361 interpolated Kneser-Ney bigram table ([[TermStats.knBigramTable]]):
    // the smoothing the add-k / stupid-backoff tiers approximate — top-30
    // bigrams with P_KN = max(c2−D,0)/c1 + D·N₁₊(prev,·)/c1 · P_cont(cur),
    // D = n₁/(n₁+2n₂), P_cont = distinct-predecessor share of bigram types.
    // Pure count algebra: three grouped aggregates over the bigram stream +
    // one broadcast scalar row; the twin replays the identical
    // integer-count ratios in double and rounds once.
    QEntry.sql(
      "txt_kn_bigram",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
         |bgs AS (SELECT unnest(list_transform(range(2, len(words) + 1),
         |    i -> struct_pack(prev := words[i-1], cur := words[i]))) AS bp
         |  FROM w WHERE len(words) >= 2),
         |bg AS (SELECT bp.prev AS prev, bp.cur AS cur, CAST(count(*) AS BIGINT) AS c2
         |  FROM bgs GROUP BY 1, 2),
         |ctx AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1,
         |    CAST(count(*) AS BIGINT) AS nf FROM bg GROUP BY prev),
         |cont AS (SELECT cur, CAST(count(*) AS BIGINT) AS np FROM bg GROUP BY cur),
         |disc AS (SELECT CAST(sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(count(*) AS BIGINT) AS bt FROM bg)
         |SELECT prev, cur, c2, c1,
         |  round(greatest(c2 - d, 0.0) / c1 + ((d * nf) / c1) * (CAST(np AS DOUBLE) / bt), 6)
         |    AS p_kn
         |FROM (SELECT bg.prev, bg.cur, bg.c2, ctx.c1, ctx.nf, cont.np, disc.bt,
         |    CASE WHEN disc.n1 + 2 * disc.n2 = 0 THEN 0.0
         |      ELSE CAST(disc.n1 AS DOUBLE) / (disc.n1 + 2 * disc.n2) END AS d
         |  FROM bg JOIN ctx USING (prev) JOIN cont USING (cur) CROSS JOIN disc) t
         |ORDER BY c2 DESC, prev, cur LIMIT 30"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) => TermStats.knBigramTable(documents(s, d), "doc_id", "text", topN = 30) },

    // Stupid-backoff trigram cross-entropy ([[TermStats.stupidBackoffEntropy]])
    // under a held-out split: even docs are the model, odd docs get scored —
    // the split is what makes the α-backoff chain REAL (a corpus scored
    // under its own counts never leaves the trigram tier). Per-tier hit
    // counts are exact BIGINTs; per-trigram-type bits go through the
    // 9-decimal quantize → DECIMAL-sum ladder. α = 0.4 is CAST to DOUBLE in
    // the twin (a bare 0.4 literal is DECIMAL in DuckDB and 0.4 isn't
    // binary-exact — the one cross-engine trap this entry adds).
    QEntry.sql(
      "txt_backoff_trigram",
      s"""WITH w AS (SELECT doc_id, $wordsSql AS words FROM documents),
         |mt AS (SELECT t.term FROM (SELECT unnest(words) AS term FROM w
         |    WHERE doc_id % 2 = 0) t WHERE t.term <> ''),
         |cu AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM mt GROUP BY term),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
         |  FROM cu),
         |mw AS (SELECT words FROM w WHERE doc_id % 2 = 0),
         |bgs AS (SELECT unnest(list_transform(range(2, len(words) + 1),
         |    i -> struct_pack(p := words[i-1], c := words[i]))) AS bp
         |  FROM mw WHERE len(words) >= 2),
         |bg AS (SELECT bp.p AS p, bp.c AS c, CAST(count(*) AS BIGINT) AS c2
         |  FROM bgs GROUP BY bp.p, bp.c),
         |tgs AS (SELECT unnest(list_transform(range(3, len(words) + 1),
         |    i -> struct_pack(p2 := words[i-2], p1 := words[i-1], cur := words[i]))) AS tp
         |  FROM mw WHERE len(words) >= 3),
         |tg AS (SELECT tp.p2 AS p2, tp.p1 AS p1, tp.cur AS cur,
         |    CAST(count(*) AS BIGINT) AS c3
         |  FROM tgs GROUP BY tp.p2, tp.p1, tp.cur),
         |sts AS (SELECT doc_id, unnest(list_transform(range(3, len(words) + 1),
         |    i -> struct_pack(p2 := words[i-2], p1 := words[i-1], cur := words[i]))) AS tp
         |  FROM w WHERE doc_id % 2 = 1 AND len(words) >= 3),
         |ss AS (SELECT doc_id, tp.p2 AS p2, tp.p1 AS p1, tp.cur AS cur FROM sts),
         |ty AS (SELECT DISTINCT p2, p1, cur FROM ss),
         |sc AS (SELECT ty.p2, ty.p1, ty.cur,
         |    CASE WHEN t3.c3 IS NOT NULL THEN CAST(t3.c3 AS DOUBLE) / d3.c2
         |         WHEN n2.c2 IS NOT NULL THEN CAST(0.4 AS DOUBLE)
         |           * (CAST(n2.c2 AS DOUBLE) / d2.c1)
         |         ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
         |           * (CAST(COALESCE(u1.c1, 0) + 1 AS DOUBLE) / (tot.n + tot.v)) END
         |      AS s_val,
         |    CASE WHEN t3.c3 IS NOT NULL THEN 3
         |         WHEN n2.c2 IS NOT NULL THEN 2 ELSE 1 END AS tier
         |  FROM ty
         |  LEFT JOIN tg t3 ON t3.p2 = ty.p2 AND t3.p1 = ty.p1 AND t3.cur = ty.cur
         |  LEFT JOIN bg d3 ON d3.p = ty.p2 AND d3.c = ty.p1
         |  LEFT JOIN bg n2 ON n2.p = ty.p1 AND n2.c = ty.cur
         |  LEFT JOIN cu d2 ON d2.term = ty.p1
         |  LEFT JOIN cu u1 ON u1.term = ty.cur
         |  CROSS JOIN tot),
         |bits AS (SELECT p2, p1, cur, tier,
         |    CAST(round(-log2(s_val), 9) AS DECIMAL(18,9)) AS bits FROM sc)
         |SELECT ss.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |  CAST(sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hit,
         |  CAST(sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_hit,
         |  CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
         |  round(CAST(CAST(sum(bits) AS DECIMAL(28,9)) AS DOUBLE) / count(*), 6)
         |    AS backoff_entropy
         |FROM ss JOIN bits ON ss.p2 = bits.p2 AND ss.p1 = bits.p1
         |  AND ss.cur = bits.cur
         |GROUP BY ss.doc_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val docs = documents(s, d)
      TermStats.stupidBackoffEntropy(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id",
        "text",
        alpha = 0.4
      )
    },

    // Pairwise covariance/correlation matrix of (quantity, price-cents,
    // discount-bp) — all three integer-scalable, so the sufficient
    // statistics are exact and every matrix cell ships unrounded
    // bit-identical. One partial-aggregated pass; cells unpivot to rows for
    // the scalar-hashing verify contract. Covariances are in the SCALED
    // integer units (cents / basis points — divide by the scale product for
    // natural units); correlations are unit-free.
    QEntry.sql(
      "q_covariance_matrix", {
        def cell(pair: String, sx: String, sy: String, sxy: String, sxx: String, syy: String) =
          s"""SELECT '$pair' AS pair,
             |  ((CAST(n AS DOUBLE) * $sxy) - (CAST($sx AS DOUBLE) * $sy))
             |    / (CAST(n AS DOUBLE) * (n - 1)) AS cov,
             |  round(((CAST(n AS DOUBLE) * $sxy) - (CAST($sx AS DOUBLE) * $sy))
             |    / (sqrt((CAST(n AS DOUBLE) * $sxx) - (CAST($sx AS DOUBLE) * $sx))
             |       * sqrt((CAST(n AS DOUBLE) * $syy) - (CAST($sy AS DOUBLE) * $sy))), 6)
             |    AS corr
             |FROM s""".stripMargin
        s"""WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
           |    CAST(round(l_discount * 10000) AS BIGINT) AS d0
           |  FROM lineitem),
           |s AS (SELECT count(*) AS n,
           |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
           |    CAST(sum(d0) AS BIGINT) AS sd,
           |    CAST(sum(q * q) AS DOUBLE) AS sqx, CAST(sum(p * p) AS DOUBLE) AS spy,
           |    CAST(sum(d0 * d0) AS DOUBLE) AS sdy,
           |    CAST(sum(q * p) AS BIGINT) AS sqp, CAST(sum(q * d0) AS BIGINT) AS sqd,
           |    CAST(sum(p * d0) AS DOUBLE) AS spd
           |  FROM b)
           |SELECT pair, cov, corr FROM (
           |${cell("q_p", "sq", "sp", "sqp", "sqx", "spy")} UNION ALL
           |${cell("q_d", "sq", "sd", "sqd", "sqx", "sdy")} UNION ALL
           |${cell("p_d", "sp", "sd", "spd", "spy", "sdy")}) t"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val b = lineitem(s, d).select(
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"),
        round(col("l_discount") * 10000).cast("long").as("d0")
      )
      val sums = b.agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"),
        sum(col("p")).as("sp"),
        sum(col("d0")).as("sd"),
        sum(col("q") * col("q")).cast("double").as("sqx"),
        sum((col("p") * col("p")).cast("decimal(38,0)")).cast("double").as("spy"),
        sum(col("d0") * col("d0")).cast("double").as("sdy"),
        sum(col("q") * col("p")).as("sqp"),
        sum(col("q") * col("d0")).as("sqd"),
        sum((col("p") * col("d0")).cast("decimal(38,0)")).cast("double").as("spd")
      )
      val nD = col("n").cast("double")
      def cell(name: String, sx: Column, sy: Column, sxy: Column, sxx: Column, syy: Column) = {
        val num = (nD * sxy) - (sx.cast("double") * sy)
        sums.select(
          lit(name).as("pair"),
          (num / (nD * (col("n") - 1))).as("cov"),
          // corr rounds to 6: the Σp² sufficient statistic exceeds 2^53, and
          // DuckDB's hugeint→double cast can differ from Spark's
          // decimal→double by one ulp (observed 1e-19 at sf0.1) — same
          // mitigation class as libm scores. cov never touches an
          // over-2^53 statistic and stays unrounded.
          round(
            num / (sqrt((nD * sxx) - (sx.cast("double") * sx)) *
              sqrt((nD * syy) - (sy.cast("double") * sy))),
            6
          ).as("corr")
        )
      }
      cell("q_p", col("sq"), col("sp"), col("sqp"), col("sqx"), col("spy"))
        .unionByName(cell("q_d", col("sq"), col("sd"), col("sqd"), col("sqx"), col("sdy")))
        .unionByName(cell("p_d", col("sp"), col("sd"), col("spd"), col("spy"), col("sdy")))
    },

    // Median absolute deviation per group — the robust scale estimate
    // outlier-heavy pipelines prefer over stddev. Doubling to half-cent
    // integers keeps both medians' interpolation exact (deviations are
    // integer multiples of 0.5 cent), so median and MAD ship unrounded
    // bit-identical. Two keyed aggregates + a broadcast join of the 3-row
    // median table.
    QEntry.sql(
      "q_mad_per_group",
      """WITH b AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
        |med AS (SELECT flag, quantile_cont(c, 0.5) AS m FROM b GROUP BY flag),
        |dev AS (SELECT b.flag, abs(b.c * 2 - med.m * 2) AS dev2
        |  FROM b JOIN med USING (flag))
        |SELECT dev.flag, med.m / 100.0 AS median,
        |  (quantile_cont(dev2, 0.5) / 2.0) / 100.0 AS mad
        |FROM dev JOIN med USING (flag) GROUP BY dev.flag, med.m"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val b = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("c")
      )
      val med = b.groupBy(col("flag")).agg(expr("percentile(c, 0.5D)").as("m"))
      b.join(broadcast(med), "flag")
        .select(col("flag"), col("m"), abs(col("c") * 2 - col("m") * 2).as("dev2"))
        .groupBy(col("flag"), col("m"))
        .agg((expr("percentile(dev2, 0.5D)") / 2.0 / 100.0).as("mad"))
        .select(col("flag"), (col("m") / 100.0).as("median"), col("mad"))
    },

    // Rolling z-score anomalies: each day's revenue against its OWN trailing
    // 28-day baseline (frame excludes the current row — a spike must not
    // defend itself). Window sums over exact integer cents → z is
    // bit-deterministic unrounded; n >= 14 guards cold starts. The
    // continuous-monitoring twin of the global q_zscore_outliers.
    QEntry.sql(
      "q_rolling_zscore_anomalies",
      """WITH daily AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
        |    CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS c
        |  FROM lineitem GROUP BY flag, d),
        |wn AS (SELECT flag, d, c,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(c) OVER w AS BIGINT) AS sy,
        |    CAST(sum(c * c) OVER w AS DOUBLE) AS syy
        |  FROM daily WINDOW w AS (PARTITION BY flag ORDER BY d
        |    ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
        |SELECT flag, strftime(d, '%Y-%m-%d') AS day, c / 100.0 AS rev,
        |  ((CAST(c AS DOUBLE) - (CAST(sy AS DOUBLE) / n))
        |   / sqrt(((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy))
        |          / (CAST(n AS DOUBLE) * (n - 1)))) AS z
        |FROM wn WHERE n >= 14
        |  AND abs((CAST(c AS DOUBLE) - (CAST(sy AS DOUBLE) / n))
        |   / sqrt(((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy))
        |          / (CAST(n AS DOUBLE) * (n - 1)))) >= 2.0"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val daily = lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("d"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 100)
            .cast("long")
            .as("c")
        )
      val w = Window.partitionBy(col("flag")).orderBy(col("d")).rowsBetween(-28, -1)
      val wn = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sy", sum(col("c")).over(w))
        .withColumn("syy", sum(col("c") * col("c")).over(w).cast("double"))
      val nD = col("n").cast("double")
      val z = (col("c").cast("double") - (col("sy").cast("double") / col("n"))) /
        sqrt(((nD * col("syy")) - (col("sy").cast("double") * col("sy"))) /
          (nD * (col("n") - 1)))
      wn.filter(col("n") >= 14)
        .filter(abs(z) >= 2.0)
        .select(
          col("flag"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          (col("c") / 100.0).as("rev"),
          z.as("z")
        )
    },

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL bucket
    // (here status 'P' nulled out) MATCHES itself — a plain equi-join would
    // silently drop it, the classic bug when joining on nullable derived
    // keys.
    QEntry.sql(
      "q_null_safe_join",
      """WITH g AS (SELECT NULLIF(o_orderstatus, 'P') AS k, count(*) AS n
        |  FROM orders GROUP BY NULLIF(o_orderstatus, 'P'))
        |SELECT a.k, a.n AS n_left, b.n AS n_right
        |FROM g a JOIN g b ON a.k IS NOT DISTINCT FROM b.k"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val g = orders(s, d)
        .groupBy(nullif(col("o_orderstatus"), lit("P")).as("k"))
        .agg(count(lit(1)).as("n"))
      g.as("a")
        .join(g.as("b"), col("a.k") <=> col("b.k"))
        .select(col("a.k").as("k"), col("a.n").as("n_left"), col("b.n").as("n_right"))
    },

    // Order-independent table checksum — the migration/replication diff
    // primitive at 100 TB: fingerprint a table WITHOUT sorting it by
    // summing per-row 52-bit digest slices (addition commutes, so any
    // partitioning/ordering yields the same checksum, and two sides of a
    // copy compare with one number each). Floats are rendered through
    // DECIMAL(18,2) so both engines hash identical strings; the sum rides
    // DECIMAL(38,0) (2^52 × corpus overflows int64). One narrow scan +
    // single partial agg.
    QEntry.sql(
      "q_table_checksum",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
        |    CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)), 1, 13)) AS BIGINT))
        |    AS DECIMAL(38,0)) AS VARCHAR) AS checksum
        |FROM orders""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      orders(s, d)
        .select(
          conv(
            substring(
              md5(
                concat_ws(
                  "|",
                  col("o_orderkey").cast("string"),
                  col("o_custkey").cast("string"),
                  col("o_orderstatus"),
                  col("o_totalprice").cast("decimal(18,2)").cast("string"),
                  col("o_orderdate").cast("date").cast("string"),
                  col("o_orderpriority")
                )
              ),
              1,
              13
            ),
            16,
            10
          ).cast("long").as("_h")
        )
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("_h").cast("decimal(38,0)")).cast("decimal(38,0)").cast("string").as("checksum")
        )
    },

    // Recency-decayed engagement per user: each event contributes
    // cents // 2^(age-weeks) relative to the corpus's newest event — the
    // exact integer formulation of exponential decay (binary halving per
    // week; truncating division is identical on both engines), so scores
    // replay bit-for-bit with no float powers. One broadcast 1-row max-ts,
    // one user-keyed partial agg.
    QEntry.sql(
      "q_decayed_engagement",
      """WITH ref AS (SELECT max(ts) AS mts FROM events),
        |e AS (SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    least(CAST(date_diff('day', CAST(ts AS DATE), CAST(mts AS DATE)) AS BIGINT) // 7,
        |          40) AS wk
        |  FROM events CROSS JOIN ref)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents // (CAST(1 AS BIGINT) << CAST(wk AS INT))) AS BIGINT)
        |    AS decayed_cents,
        |  CAST(min(wk) AS BIGINT) AS freshest_week
        |FROM e GROUP BY user_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ref = events(s, d).agg(max("ts").as("mts"))
      events(s, d)
        .crossJoin(broadcast(ref))
        .select(
          col("user_id"),
          round(col("value") * 100).cast("long").as("cents"),
          least(
            expr("CAST(datediff(CAST(mts AS DATE), CAST(ts AS DATE)) AS BIGINT) div 7"),
            lit(40L)
          ).as("wk")
        )
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum(expr("cents div shiftleft(1L, CAST(wk AS INT))")).cast("long").as("decayed_cents"),
          min("wk").cast("long").as("freshest_week")
        )
    },

    // Data-quality gate (QualityChecks operator): uniqueness, non-null,
    // accepted values, row predicate and FK integrity over orders, one
    // violations row per check — the dbt-test/Deequ shape a pipeline runs
    // before promoting a drop.
    QEntry.sql(
      "q_dq_report",
      """SELECT 'unique_o_orderkey' AS check_name,
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
        |  (count(*) - count(DISTINCT o_orderkey)) = 0 AS pass FROM orders
        |UNION ALL SELECT 'non_null_o_custkey',
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
        |UNION ALL SELECT 'accepted_values_o_orderstatus',
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |                  OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |           OR o_orderstatus IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
        |UNION ALL SELECT 'positive_totalprice',
        |  CAST(sum(CASE WHEN NOT (o_totalprice > 0)
        |                  OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN NOT (o_totalprice > 0)
        |           OR o_totalprice IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
        |UNION ALL SELECT 'fk_o_custkey_in_c_custkey',
        |  CAST((SELECT count(*) FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                          WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey)) = 0"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d)
      QualityChecks.reportAll(Seq(
        QualityChecks.unique(o, "o_orderkey"),
        QualityChecks.nonNull(o, "o_custkey"),
        QualityChecks.acceptedValues(o, "o_orderstatus", Seq("O", "F", "P")),
        QualityChecks.expression(o, "positive_totalprice", col("o_totalprice") > 0),
        QualityChecks.referential(o, "o_custkey", customer(s, d), "c_custkey")
      ))
    },

    // ROLLUP with GROUPING() markers — the standard way to tell a subtotal
    // row's NULL from a data NULL.
    QEntry.sql(
      "q_rollup_grouping_id",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n")
        )
    },

    // Interpolated quartiles over exact integer cents: the (n-1)*p index has
    // an exact binary fraction for p in {.25, .5, .75}, and a + (b-a)*frac
    // on integer-valued doubles is exact — so the interpolated values are
    // bit-identical cross-engine and ship unrounded (same argument as the
    // rolling median).
    QEntry.sql(
      "q_percentile_cont_quartiles",
      """WITH b AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem)
        |SELECT flag,
        |  quantile_cont(cents, 0.25) / 100.0 AS q1,
        |  quantile_cont(cents, 0.5) / 100.0 AS q2,
        |  quantile_cont(cents, 0.75) / 100.0 AS q3
        |FROM b GROUP BY flag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .select(
          col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")
        )
        .groupBy(col("flag"))
        // one percentile(..., array) aggregate, not three WITHIN GROUP
        // calls: each percentile buffers the whole group, so fusing them
        // shares ONE buffer (measured 2.5 s → one-buffer cost at sf0.1);
        // same type-7 interpolation as percentile_cont/quantile_cont
        .agg(expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").as("_q"))
        .select(
          col("flag"),
          (element_at(col("_q"), 1) / 100.0).as("q1"),
          (element_at(col("_q"), 2) / 100.0).as("q2"),
          (element_at(col("_q"), 3) / 100.0).as("q3")
        )
    },

    // Winsorized mean per group: clamp to the exact [p5, p95] discrete
    // percentiles (percentile_disc semantics — the ⌈p·n⌉-th value, type-
    // preserving, no interpolation) and average the clamped cents. Bounds
    // come from one keyed sort window; the mean is an exact BIGINT sum with
    // ONE correctly-rounded division (sum < 2^53 at oracle scales; at larger
    // scales route the sum through decimal before the divide). The robust
    // location estimate a metrics pipeline ships when MAD is too aggressive.
    QEntry.sql(
      "q_winsorize_clip",
      """WITH b AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |r AS (SELECT flag, cents,
        |    CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n
        |  FROM b),
        |p AS (SELECT flag,
        |    max(CASE WHEN rn = (n + 19) // 20 THEN cents END) AS lo,
        |    max(CASE WHEN rn = (n * 19 + 19) // 20 THEN cents END) AS hi,
        |    CAST(max(n) AS BIGINT) AS n
        |  FROM r GROUP BY flag)
        |SELECT b.flag, p.n, p.lo, p.hi,
        |  CAST(sum(CASE WHEN b.cents < p.lo THEN p.lo
        |                WHEN b.cents > p.hi THEN p.hi
        |                ELSE b.cents END) AS DOUBLE) / (CAST(p.n AS DOUBLE) * 100)
        |    AS winsor_mean
        |FROM b JOIN p ON b.flag = p.flag
        |GROUP BY b.flag, p.n, p.lo, p.hi""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val b = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents")
      )
      val wOrd = Window.partitionBy("flag").orderBy("cents")
      val wAll = Window.partitionBy("flag")
      val r = b
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
      val p = r
        .groupBy("flag")
        .agg(
          max(when(col("rn") === expr("(n + 19) div 20"), col("cents"))).as("lo"),
          max(when(col("rn") === expr("(n * 19 + 19) div 20"), col("cents"))).as("hi"),
          max("n").cast("long").as("n")
        )
      val clamped = when(col("cents") < col("lo"), col("lo"))
        .when(col("cents") > col("hi"), col("hi"))
        .otherwise(col("cents"))
      b.join(broadcast(p), "flag")
        .groupBy("flag", "n", "lo", "hi")
        .agg(
          (sum(clamped).cast("double") / (col("n").cast("double") * 100))
            .as("winsor_mean")
        )
    },

    // Approximate-quantile GUARANTEE gate: the sketch value itself is not
    // oracle-replayable (DuckDB has no GK sketch), but its rank-error BOUND
    // is — approx_percentile(·, 0.5, a) must return a value whose rank is
    // within n/a (+1 slack for rank conventions) of the true median rank,
    // for ANY partitioning/merge order. The entry outputs the exact lower
    // median (value-oracled the usual way) plus the bound check as a
    // boolean; the oracle asserts TRUE, so a sketch regression flips the
    // row red. This is how an approximate operator earns a hard oracle.
    QEntry.sql(
      "q_approx_quantile_guard",
      """WITH b AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |r AS (SELECT flag, cents,
        |    CAST(row_number() OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n
        |  FROM b)
        |SELECT flag, CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS exact_median_cents,
        |  TRUE AS approx_within_bound
        |FROM r GROUP BY flag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val acc = 10000
      val b = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents")
      )
      val approx = b
        .groupBy("flag")
        .agg(expr(s"approx_percentile(cents, 0.5D, $acc)").as("v"))
      val wOrd = Window.partitionBy("flag").orderBy("cents")
      val wAll = Window.partitionBy("flag")
      val exact = b
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("flag")
        .agg(
          max("n").cast("long").as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
            .as("exact_median_cents")
        )
      val ranks = b
        .join(broadcast(approx), "flag")
        .groupBy("flag")
        .agg(
          sum(when(col("cents") < col("v"), 1L).otherwise(0L)).as("c_lt"),
          sum(when(col("cents") <= col("v"), 1L).otherwise(0L)).as("c_le")
        )
      exact
        .join(broadcast(ranks), "flag")
        .select(
          col("flag"),
          col("n"),
          col("exact_median_cents"),
          ((col("c_lt") + 1 <= expr(s"(n + 1) div 2") + expr(s"n div $acc") + 1) &&
            (col("c_le") >= expr(s"(n + 1) div 2") - expr(s"n div $acc") - 1))
            .as("approx_within_bound")
        )
    },

    // Weighted median: per return flag, the price at which CUMULATIVE
    // QUANTITY first crosses half the flag's total quantity — the
    // inventory-weighted center no unweighted percentile gives. The
    // cumulative sum runs over a (cents, orderkey, linenumber) total order
    // (exact BIGINTs, keyed by flag — the q_mad_per_group posture), and
    // the crossing pick is a rank-1 filter, not an interpolation.
    QEntry.sql(
      "q_weighted_median",
      """WITH l AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS q, l_orderkey, l_linenumber FROM lineitem),
        |c AS (SELECT flag, cents, q,
        |    CAST(sum(q) OVER (PARTITION BY flag
        |      ORDER BY cents, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |    CAST(sum(q) OVER (PARTITION BY flag) AS BIGINT) AS tw FROM l),
        |m AS (SELECT flag, cents, cw, tw,
        |    row_number() OVER (PARTITION BY flag ORDER BY cw, cents) AS rk
        |  FROM c WHERE 2 * cw >= tw)
        |SELECT flag, cents AS wmedian_cents, tw AS total_qty FROM m WHERE rk = 1"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val l = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("q"),
        col("l_orderkey"),
        col("l_linenumber")
      )
      val wf = Window.partitionBy("flag")
      val c = l.select(
        col("flag"),
        col("cents"),
        sum("q")
          .over(
            wf.orderBy("cents", "l_orderkey", "l_linenumber")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          )
          .cast("long")
          .as("cw"),
        sum("q").over(wf).cast("long").as("tw")
      )
      c.filter(lit(2L) * col("cw") >= col("tw"))
        .withColumn("rk", row_number().over(wf.orderBy("cw", "cents")))
        .filter(col("rk") === 1)
        .select(col("flag"), col("cents").as("wmedian_cents"), col("tw").as("total_qty"))
    },

    // One-way ANOVA F across priority groups on order value (dollars —
    // pre-quantized so Σv² stays inside int64 through sf10). Sufficient
    // statistics per group are exact BIGINTs; the between-group term
    // Σ S_g²/n_g is an IEEE-deterministic double chain (int64→double
    // conversions exact below 2^53, each op correctly rounded in a fixed
    // order) quantized to 6 dp per group and summed as DECIMAL so group
    // order can't perturb it. F ships rounded 6.
    QEntry.sql(
      "q_anova_f",
      """WITH o AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v FROM orders),
        |gr AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(v * v) AS BIGINT) AS ss FROM o GROUP BY g),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS stot, CAST(sum(ss) AS BIGINT) AS sstot,
        |    CAST(sum(CAST(round(CAST(s AS DOUBLE) * s / n, 6) AS DECIMAL(30,6)))
        |      AS DECIMAL(32,6)) AS sgr
        |  FROM gr)
        |SELECT k, nn,
        |  round((CAST(sgr AS DOUBLE) - CAST(stot AS DOUBLE) * stot / nn) / (k - 1) /
        |    ((CAST(sstot AS DOUBLE) - CAST(sgr AS DOUBLE)) / (nn - k)), 6) AS f_stat
        |FROM t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("v")
      )
      val gr = o
        .groupBy("g")
        .agg(
          count(lit(1)).as("n"),
          sum("v").cast("long").as("s"),
          sum(col("v") * col("v")).cast("long").as("ss")
        )
      gr.agg(
        count(lit(1)).as("k"),
        sum("n").cast("long").as("nn"),
        sum("s").cast("long").as("stot"),
        sum("ss").cast("long").as("sstot"),
        sum(round(col("s").cast("double") * col("s") / col("n"), 6).cast("decimal(30,6)"))
          .cast("decimal(32,6)")
          .as("sgr")
      ).select(
        col("k"),
        col("nn"),
        round(
          (col("sgr").cast("double") - col("stot").cast("double") * col("stot") / col("nn")) /
            (col("k") - 1) /
            ((col("sstot").cast("double") - col("sgr").cast("double")) / (col("nn") - col("k"))),
          6
        ).as("f_stat")
      )
    },

    // Count-Min sketch, FULLY DETERMINISTIC: the d=4 hash rows are
    // md5-derived, so both engines build the identical 4×64 counter table
    // and the point estimate (min over rows) is exactly oracled — no
    // tolerance band needed, unlike engine-internal sketches (E26). The
    // top-10 heaviest users are probed against the sketch; the one-sided
    // error (est ≥ true, overestimates from bucket collisions) is visible
    // in the output. Build = one ×4 row expansion + partial agg into 256
    // cells — the fixed-size summary a 100 TB stream reduces to.
    QEntry.sql(
      "q_cms_estimate", {
        def hexval(key: String) =
          s"""CAST(list_sum(list_transform(range(1, 9), i ->
             |  (strpos('0123456789abcdef', substr(md5($key), CAST(i AS INT), 1)) - 1)
             |  * pow(16, 8 - i))) AS BIGINT)""".stripMargin
        s"""WITH rows_ AS (SELECT u.k AS j FROM unnest(range(0, 4)) AS u(k)),
           |x AS (SELECT r.j,
           |    (${hexval("CAST(r.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}) % 64
           |      AS bucket
           |  FROM events e CROSS JOIN rows_ r),
           |cms AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY j, bucket),
           |tru AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
           |  FROM events GROUP BY user_id),
           |top AS (SELECT user_id, true_cnt FROM tru
           |  ORDER BY true_cnt DESC, user_id LIMIT 10),
           |probe AS (SELECT r.j, t.user_id, t.true_cnt,
           |    (${hexval("CAST(r.j AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)")}) % 64
           |      AS bucket
           |  FROM top t CROSS JOIN rows_ r)
           |SELECT p.user_id, p.true_cnt, CAST(min(cms.c) AS BIGINT) AS cms_est
           |FROM probe p JOIN cms ON p.j = cms.j AND p.bucket = cms.bucket
           |GROUP BY p.user_id, p.true_cnt"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      def bucket(j: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(
          substring(md5(concat(j.cast("string"), lit(":"), key.cast("string"))), 1, 8),
          16,
          10
        ).cast("long") % 64
      val rows = s.range(0, 4).toDF("j")
      val ev = events(s, d).select("user_id")
      val cms = ev
        .crossJoin(broadcast(rows))
        .select(col("j"), bucket(col("j"), col("user_id")).as("bucket"))
        .groupBy("j", "bucket")
        .agg(count(lit(1)).as("c"))
      val top = ev
        .groupBy("user_id")
        .agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("user_id"))
        .limit(10)
      top
        .crossJoin(broadcast(rows))
        .select(
          col("user_id"),
          col("true_cnt"),
          col("j"),
          bucket(col("j"), col("user_id")).as("bucket")
        )
        .join(broadcast(cms), Seq("j", "bucket"))
        .groupBy("user_id", "true_cnt")
        .agg(min("c").cast("long").as("cms_est"))
    },

    // K-minimum-values (KMV / bottom-k) distinct sketch over the order
    // keys — the ORDER-STATISTICS mergeable sketch, complementing the
    // register-based HLL below: keep the k smallest 52-bit hashes; the
    // k-th smallest h_k estimates density k/n, so n̂ = (k−1)·2⁵²/h_k
    // (Beyer et al.'s unbiased form), one exact integral division. Bottom-k
    // sets merge by union+truncate, so 1000 executors sketch partitions
    // independently — same mergeability story as HLL but with an exact,
    // RNG-free, engine-portable state (md5 hashes, TakeOrdered k; never a
    // global sort).
    QEntry.sql(
      "q_kmv_distinct",
      """WITH h AS (SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
        |  FROM orders),
        |kth AS (SELECT max(hv) AS hk FROM (SELECT hv FROM h ORDER BY hv LIMIT 64) t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM h)
        |SELECT n.n_true, CAST(63 AS BIGINT) * 4503599627370496 // kth.hk AS kmv_est,
        |  CAST((CAST(63 AS BIGINT) * 4503599627370496 // kth.hk - n.n_true) * 1000000
        |    // n.n_true AS BIGINT) AS err_ppm
        |FROM n CROSS JOIN kth""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val h = orders(s, d)
        .select(
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 13), 16, 10)
            .cast("long")
            .as("hv")
        )
        .distinct()
        .localCheckpoint() // kth and n_true both consume it
      val kth = h.orderBy(col("hv")).limit(64).agg(max("hv").as("hk"))
      val n = h.agg(count(lit(1)).as("n_true"))
      n.crossJoin(broadcast(kth))
        .select(
          col("n_true"),
          expr("63L * 4503599627370496L div hk").cast("long").as("kmv_est"),
          expr("(63L * 4503599627370496L div hk - n_true) * 1000000 div n_true")
            .cast("long")
            .as("err_ppm")
        )
    },

    // E324 KMV set-operation sketches: distinct/union/intersection
    // estimates for two event-id sets from k = 128 bottom-hash sketches —
    // the mergeable-sketch algebra (union = merge bottom-k's; ∩ via the
    // union sketch's membership ratio, Beyer et al. 2007) that answers
    // audience-overlap questions without ever joining the full sets. The
    // small-set regime degrades to EXACT counts (sketch < k ⇒ the sketch
    // IS the set — the CASE arms), so the entry is meaningful at every sf.
    // All integer: 13-hex-digit md5 keys, (k−1)·16¹³ div h_k estimators,
    // est_∩ = k_∩·est_∪ div |sketch_∪|.
    QEntry.sql(
      "q_kmv_setops", {
        val hv = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13)) AS BIGINT)"
        s"""WITH a AS (SELECT DISTINCT $hv AS hv FROM events
           |  WHERE event_type IN ('click', 'view')),
           |b AS (SELECT DISTINCT $hv AS hv FROM events WHERE event_id % 3 <> 0),
           |ska AS (SELECT hv FROM a ORDER BY hv LIMIT 128),
           |skb AS (SELECT hv FROM b ORDER BY hv LIMIT 128),
           |sku AS (SELECT hv FROM (SELECT hv FROM a UNION SELECT hv FROM b) u
           |  ORDER BY hv LIMIT 128),
           |sta AS (SELECT CAST(count(*) AS BIGINT) AS ka, max(hv) AS hka FROM ska),
           |stb AS (SELECT CAST(count(*) AS BIGINT) AS kb, max(hv) AS hkb FROM skb),
           |stu AS (SELECT CAST(count(*) AS BIGINT) AS ku, max(hv) AS hku FROM sku),
           |ki AS (SELECT CAST(count(*) AS BIGINT) AS k_inter FROM sku
           |  WHERE hv IN (SELECT hv FROM a) AND hv IN (SELECT hv FROM b)),
           |ex AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
           |    (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
           |    (SELECT CAST(count(*) AS BIGINT) FROM a WHERE hv IN
           |      (SELECT hv FROM b)) AS n_inter)
           |SELECT ex.n_a, ex.n_b, ex.n_inter,
           |  CASE WHEN ka < 128 THEN ka
           |       ELSE 127 * 4503599627370496 // hka END AS est_a,
           |  CASE WHEN kb < 128 THEN kb
           |       ELSE 127 * 4503599627370496 // hkb END AS est_b,
           |  CASE WHEN ku < 128 THEN ku
           |       ELSE 127 * 4503599627370496 // hku END AS est_union,
           |  k_inter * (CASE WHEN ku < 128 THEN ku
           |       ELSE 127 * 4503599627370496 // hku END) // ku AS est_inter
           |FROM ex CROSS JOIN sta CROSS JOIN stb CROSS JOIN stu CROSS JOIN ki"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val hv = conv(substring(md5(col("event_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .as("hv")
      val ev = events(s, d)
      val a = ev
        .filter(col("event_type").isin("click", "view"))
        .select(hv)
        .distinct()
        .localCheckpoint() // sketch, exact count and memberships all consume it
      val b = ev
        .filter(col("event_id") % 3 =!= 0)
        .select(hv)
        .distinct()
        .localCheckpoint()
      def sk(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("hv")).limit(128)
      val sku = sk(a.unionByName(b).distinct()).localCheckpoint()
      val sta = sk(a).agg(count(lit(1)).as("ka"), max("hv").as("hka"))
      val stb = sk(b).agg(count(lit(1)).as("kb"), max("hv").as("hkb"))
      val stu = sku.agg(count(lit(1)).as("ku"), max("hv").as("hku"))
      val ki = sku
        .join(a, "hv", "left_semi")
        .join(b, "hv", "left_semi")
        .agg(count(lit(1)).as("k_inter"))
      val ex = a
        .agg(count(lit(1)).as("n_a"))
        .crossJoin(b.agg(count(lit(1)).as("n_b")))
        .crossJoin(a.join(b, "hv", "left_semi").agg(count(lit(1)).as("n_inter")))
      val estU = "CASE WHEN ku < 128 THEN ku ELSE 127L * 4503599627370496L div hku END"
      ex.crossJoin(broadcast(sta))
        .crossJoin(broadcast(stb))
        .crossJoin(broadcast(stu))
        .crossJoin(broadcast(ki))
        .select(
          col("n_a"),
          col("n_b"),
          col("n_inter"),
          expr("CASE WHEN ka < 128 THEN ka ELSE 127L * 4503599627370496L div hka END")
            .cast("long").as("est_a"),
          expr("CASE WHEN kb < 128 THEN kb ELSE 127L * 4503599627370496L div hkb END")
            .cast("long").as("est_b"),
          expr(estU).cast("long").as("est_union"),
          expr(s"k_inter * ($estU) div ku").cast("long").as("est_inter")
        )
    },

    // Fully deterministic HyperLogLog (m = 64 registers) over the yearly
    // order-key sets — unlike q_sketch_distinct_users' engine-internal
    // HLL++ (rows-gated, tolerance-banded), every register and the
    // estimate itself are EXACTLY oracled: the hash is the first 13 hex
    // chars of md5 (52 bits — within double-exact range for the oracle's
    // digit-fold), register = top 6 bits, ρ = 47 − bitlength(low 46 bits)
    // via the engines' shared bin() string (no libm log2 at a power-of-2
    // boundary), Z's harmonic sum is held as Σ 2^(47−M) in exact BIGINT
    // shifts, and E = α·m²·2⁴⁷ / Z is one HUGEINT/DECIMAL(38,0) integral
    // division with α = 709/1000 literal on both engines. One partial
    // agg per (year, register); 64-row groups thereafter. The one-sided
    // raw-estimator bias below 2.5m shows up at sf0.001 (documented —
    // the small-range linear-counting branch needs ln, deliberately
    // omitted to keep the estimate exactly reproducible).
    QEntry.sql(
      "q_hll_estimate", {
        val hexFold =
          """CAST(list_sum(list_transform(range(1, 14), i ->
            |  (strpos('0123456789abcdef',
            |     substr(md5(CAST(o_orderkey AS VARCHAR)), CAST(i AS INT), 1)) - 1)
            |  * pow(16, 13 - i))) AS BIGINT)""".stripMargin
        s"""WITH h AS (SELECT strftime(o_orderdate, '%Y') AS yr,
           |    $hexFold AS hv FROM orders),
           |reg AS (SELECT yr, hv // 70368744177664 AS idx,
           |    max(CASE WHEN hv % 70368744177664 = 0 THEN 47
           |      ELSE 47 - length(bin(hv % 70368744177664)) END) AS m
           |  FROM h GROUP BY yr, idx),
           |z AS (SELECT yr,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(47 - m AS INT)) AS BIGINT)
           |      + (64 - CAST(count(*) AS BIGINT)) * 140737488355328 AS zn
           |  FROM reg GROUP BY yr),
           |tru AS (SELECT strftime(o_orderdate, '%Y') AS yr,
           |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_true
           |  FROM orders GROUP BY yr),
           |e AS (SELECT tru.yr, tru.n_true,
           |    CAST((CAST(2904064 AS HUGEINT) * 140737488355328) // (1000 * z.zn)
           |      AS BIGINT) AS hll_est
           |  FROM tru JOIN z ON tru.yr = z.yr)
           |SELECT yr, n_true, hll_est,
           |  CAST((hll_est - n_true) * 1000000 // n_true AS BIGINT) AS err_ppm
           |FROM e""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val h = orders(s, d).select(
        date_format(col("o_orderdate"), "yyyy").as("yr"),
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 13), 16, 10)
          .cast("long")
          .as("hv")
      )
      val reg = h
        .groupBy(col("yr"), expr("hv div 70368744177664").as("idx"))
        .agg(
          max(
            when(expr("hv % 70368744177664") === 0, lit(47))
              .otherwise(lit(47) - length(expr("bin(hv % 70368744177664)")))
          ).as("m")
        )
      val z = reg
        .groupBy("yr")
        .agg(
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(47 - m AS INT))")).cast("long").as("s"),
          count(lit(1)).as("nreg")
        )
        .select(col("yr"), (col("s") + (lit(64L) - col("nreg")) * 140737488355328L).as("zn"))
      val tru = orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("yr"))
        .agg(countDistinct("o_orderkey").as("n_true"))
      tru
        .join(z, "yr")
        .withColumn(
          "hll_est",
          expr("CAST((CAST(2904064 AS DECIMAL(38,0)) * 140737488355328) div (1000 * zn) AS BIGINT)")
        )
        .select(
          col("yr"),
          col("n_true"),
          col("hll_est"),
          expr("(hll_est - n_true) * 1000000L div n_true").cast("long").as("err_ppm")
        )
    },

    // HLL MERGEABILITY — the property that makes the sketch distributed:
    // per-priority customer registers union via element-wise max (no
    // re-scan of the data), and a pairwise intersection estimate falls out
    // of inclusion-exclusion over three register unions. Every register,
    // union, estimate AND signed error is exact integer arithmetic on the
    // q_hll_estimate machinery (64 regs, 46-bit ranks, α·m² fixed-point),
    // so all 7 rows hash-match. Register state: 6 sets × 64 rows.
    QEntry.sql(
      "q_hll_merge", {
        val hexFold =
          """CAST(list_sum(list_transform(range(1, 14), i ->
            |  (strpos('0123456789abcdef',
            |     substr(md5(CAST(o_custkey AS VARCHAR)), CAST(i AS INT), 1)) - 1)
            |  * pow(16, 13 - i))) AS BIGINT)""".stripMargin
        s"""WITH h AS (SELECT o_orderpriority AS grp, $hexFold AS hv FROM orders),
           |reg AS (SELECT grp, hv // 70368744177664 AS idx,
           |    max(CASE WHEN hv % 70368744177664 = 0 THEN 47
           |      ELSE 47 - length(bin(hv % 70368744177664)) END) AS m
           |  FROM h GROUP BY grp, idx),
           |allreg AS (
           |  SELECT grp, idx, m FROM reg
           |  UNION ALL SELECT '__union__' AS grp, idx, max(m) AS m FROM reg GROUP BY idx
           |  UNION ALL SELECT '__uAB__' AS grp, idx, max(m) AS m FROM reg
           |    WHERE grp IN ('1-URGENT', '5-LOW') GROUP BY idx),
           |est AS (SELECT grp,
           |    CAST((CAST(2904064 AS HUGEINT) * 140737488355328) // (1000 *
           |      (CAST(sum(CAST(1 AS BIGINT) << CAST(47 - m AS INT)) AS BIGINT)
           |       + (64 - CAST(count(*) AS BIGINT)) * 140737488355328)) AS BIGINT) AS hll_est
           |  FROM allreg GROUP BY grp),
           |tru AS (
           |  SELECT o_orderpriority AS grp,
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_true FROM orders GROUP BY grp
           |  UNION ALL SELECT '__union__' AS grp,
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_true FROM orders
           |  UNION ALL SELECT '__intersect__' AS grp, CAST(count(*) AS BIGINT) AS n_true
           |  FROM (SELECT o_custkey FROM orders GROUP BY o_custkey
           |    HAVING max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) = 1
           |       AND max(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) = 1) t),
           |fin AS (
           |  SELECT grp, hll_est FROM est WHERE grp <> '__uAB__'
           |  UNION ALL SELECT '__intersect__' AS grp,
           |    (SELECT hll_est FROM est WHERE grp = '1-URGENT')
           |    + (SELECT hll_est FROM est WHERE grp = '5-LOW')
           |    - (SELECT hll_est FROM est WHERE grp = '__uAB__') AS hll_est)
           |SELECT tru.grp, tru.n_true, fin.hll_est,
           |  CAST((fin.hll_est - tru.n_true) * 1000000 // tru.n_true AS BIGINT) AS err_ppm
           |FROM tru JOIN fin ON tru.grp = fin.grp"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val h = orders(s, d).select(
        col("o_orderpriority").as("grp"),
        conv(substring(md5(col("o_custkey").cast("string")), 1, 13), 16, 10)
          .cast("long")
          .as("hv")
      )
      val reg = h
        .groupBy(col("grp"), expr("hv div 70368744177664").as("idx"))
        .agg(
          max(
            when(expr("hv % 70368744177664") === 0, lit(47))
              .otherwise(lit(47) - length(expr("bin(hv % 70368744177664)")))
          ).as("m")
        )
        .localCheckpoint() // three register unions + the estimate scan reuse it
      val regU = reg
        .groupBy("idx")
        .agg(max("m").as("m"))
        .select(lit("__union__").as("grp"), col("idx"), col("m"))
      val regAB = reg
        .filter(col("grp").isin("1-URGENT", "5-LOW"))
        .groupBy("idx")
        .agg(max("m").as("m"))
        .select(lit("__uAB__").as("grp"), col("idx"), col("m"))
      val est = reg
        .unionByName(regU)
        .unionByName(regAB)
        .groupBy("grp")
        .agg(
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(47 - m AS INT))")).cast("long").as("s"),
          count(lit(1)).as("nreg")
        )
        .select(col("grp"), (col("s") + (lit(64L) - col("nreg")) * 140737488355328L).as("zn"))
        .withColumn(
          "hll_est",
          expr("CAST((CAST(2904064 AS DECIMAL(38,0)) * 140737488355328) div (1000 * zn) AS BIGINT)")
        )
        .select("grp", "hll_est")
        .localCheckpoint() // consumed by the direct rows AND the I-E pivot
      val estI = est
        .agg(
          sum(when(col("grp") === "1-URGENT", col("hll_est"))).as("ea"),
          sum(when(col("grp") === "5-LOW", col("hll_est"))).as("eb"),
          sum(when(col("grp") === "__uAB__", col("hll_est"))).as("eab")
        )
        .select(
          lit("__intersect__").as("grp"),
          (col("ea") + col("eb") - col("eab")).cast("long").as("hll_est")
        )
      val fin = est.filter(col("grp") =!= "__uAB__").unionByName(estI)
      val truG = orders(s, d)
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(countDistinct("o_custkey").as("n_true"))
      val truU = orders(s, d)
        .agg(countDistinct("o_custkey").as("n_true"))
        .select(lit("__union__").as("grp"), col("n_true"))
      val truI = orders(s, d)
        .groupBy("o_custkey")
        .agg(
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("a"),
          max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("b")
        )
        .filter(col("a") === 1 && col("b") === 1)
        .agg(count(lit(1)).as("n_true"))
        .select(lit("__intersect__").as("grp"), col("n_true"))
      truG
        .unionByName(truU)
        .unionByName(truI)
        .join(fin, "grp")
        .select(
          col("grp"),
          col("n_true"),
          col("hll_est"),
          expr("(hll_est - n_true) * 1000000L div n_true").cast("long").as("err_ppm")
        )
    },

    // Hill tail-index of the customer-spend distribution — α̂ = k / Σ
    // ln(xᵢ/x_k) over the top-k order statistics: the heavy-tail
    // exponent behind "do whales dominate revenue", complementing
    // E154's Gini with an extreme-value view. Top-(k+1) is a TakeOrdered
    // (k-bounded — no global window on data); each ln term is libm so it
    // takes the E160 quantize-12dp → DECIMAL-sum ladder; α rounds to 6.
    // Spend totals are exact cents; ties with the threshold contribute
    // exact zeros.
    QEntry.sql(
      "q_hill_tail_index",
      """WITH sp AS (SELECT o_custkey AS ck,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |top AS (SELECT cents, ck FROM sp ORDER BY cents DESC, ck LIMIT 101),
        |rk AS (SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents DESC, ck) AS BIGINT) AS rn
        |  FROM top),
        |xk AS (SELECT cents AS thr FROM rk WHERE rn = 101),
        |terms AS (SELECT CAST(round(ln(CAST(rk.cents AS DOUBLE) / xk.thr), 12)
        |      AS DECIMAL(16,12)) AS term
        |  FROM rk CROSS JOIN xk WHERE rk.rn <= 100)
        |SELECT CAST(100 AS BIGINT) AS k, max(xk.thr) AS xk_cents,
        |  round(100 / CAST((SELECT CAST(sum(term) AS DECIMAL(20,12)) FROM terms)
        |    AS DOUBLE), 6) AS hill_alpha
        |FROM xk"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val sp = orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("cents"))
      val top = sp.orderBy(col("cents").desc, col("ck")).limit(101)
      val rk = top.select(
        col("cents"),
        row_number()
          .over(Window.partitionBy(pmod(col("ck"), lit(1))).orderBy(col("cents").desc, col("ck")))
          .cast("long")
          .as("rn")
      )
      val xk = rk.filter(col("rn") === 101).select(col("cents").as("thr"))
      val terms = rk
        .filter(col("rn") <= 100)
        .crossJoin(broadcast(xk))
        .select(
          round(log(col("cents").cast("double") / col("thr")), 12)
            .cast("decimal(16,12)")
            .as("term")
        )
      val tsum = terms.agg(sum("term").cast("decimal(20,12)").as("tsum"))
      xk.agg(max(col("thr")).as("xk_cents"))
        .crossJoin(broadcast(tsum))
        .select(
          lit(100L).as("k"),
          col("xk_cents"),
          round(lit(100) / col("tsum").cast("double"), 6).as("hill_alpha")
        )
    },

    // Deterministic Bloom filter with its EXACT measured false-positive
    // rate — the fourth deterministic sketch (E177 counts, E192
    // cardinality, E200 quantiles, this one membership). m = 1024 bits
    // as 32 OR-aggregated 32-bit words (NOT 64-bit: DuckDB's BIGINT <<
    // throws on a shift into the sign bit), k = 2 md5-derived positions per
    // key (engine-portable, like the CMS rows); members are nation-0..4
    // customers, probes the rest, so false positives are exactly
    // countable — no tolerance band, the fill ratio (bits_set) and
    // fpr_ppm are hash-checked verbatim. Probe side joins the BROADCAST
    // 16-word table; everything else is partial aggs. The theory-side
    // (1−e^(−kn/m))^k check needs libm exp and is deliberately left to
    // the spec, keeping the entry bit-exact.
    QEntry.sql(
      "q_bloom_fpr", {
        def pos(i: Int, key: String) =
          s"""CAST(list_sum(list_transform(range(1, 9), ii ->
             |  (strpos('0123456789abcdef', substr(md5('$i:' || $key),
             |     CAST(ii AS INT), 1)) - 1) * pow(16, 8 - ii))) AS BIGINT) % 1024"""
            .stripMargin
        s"""WITH mem AS (SELECT c_custkey AS ck FROM customer WHERE c_nationkey < 5),
           |pb AS (SELECT c_custkey AS ck FROM customer WHERE c_nationkey >= 5),
           |mp AS (SELECT u.i, CASE WHEN u.i = 0
           |      THEN ${pos(0, "CAST(ck AS VARCHAR)")}
           |      ELSE ${pos(1, "CAST(ck AS VARCHAR)")} END AS p
           |  FROM mem CROSS JOIN (SELECT unnest(range(0, 2)) AS i) u),
           |w AS (SELECT p // 32 AS word,
           |    CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS BIGINT) AS mask
           |  FROM mp GROUP BY p // 32),
           |pp AS (SELECT pb.ck, u.i, CASE WHEN u.i = 0
           |      THEN ${pos(0, "CAST(pb.ck AS VARCHAR)")}
           |      ELSE ${pos(1, "CAST(pb.ck AS VARCHAR)")} END AS p
           |  FROM pb CROSS JOIN (SELECT unnest(range(0, 2)) AS i) u),
           |hit AS (SELECT pp.ck,
           |    CAST(sum(CASE WHEN w.mask IS NOT NULL
           |      AND (w.mask >> CAST(pp.p % 32 AS INT)) & 1 = 1
           |      THEN 1 ELSE 0 END) AS BIGINT) AS hits
           |  FROM pp LEFT JOIN w ON pp.p // 32 = w.word GROUP BY pp.ck),
           |st AS (SELECT CAST(sum(bit_count(mask)) AS BIGINT) AS bits_set FROM w),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
           |    CAST(sum(CASE WHEN hits = 2 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
           |  FROM hit),
           |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM mem)
           |SELECT nm.n_members, st.bits_set, agg.n_probes, agg.false_pos,
           |  CAST(agg.false_pos * 1000000 // agg.n_probes AS BIGINT) AS fpr_ppm
           |FROM nm CROSS JOIN st CROSS JOIN agg"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      def pos(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
        conv(
          substring(md5(concat(i.cast("string"), lit(":"), key.cast("string"))), 1, 8),
          16,
          10
        ).cast("long") % 1024
      val two = broadcast(s.range(0, 2).toDF("i"))
      val mem = customer(s, d).filter(col("c_nationkey") < 5).select(col("c_custkey").as("ck"))
      val pb = customer(s, d).filter(col("c_nationkey") >= 5).select(col("c_custkey").as("ck"))
      val w = mem
        .crossJoin(two)
        .select(pos(col("i"), col("ck")).as("p"))
        .groupBy(expr("p div 32").as("word"))
        .agg(
          expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))")
            .cast("long")
            .as("mask")
        )
      val hit = pb
        .crossJoin(two)
        .select(col("ck"), pos(col("i"), col("ck")).as("p"))
        .join(broadcast(w), expr("p div 32") === col("word"), "left")
        .groupBy("ck")
        .agg(
          sum(
            when(
              col("mask").isNotNull
                && expr("(shiftright(mask, CAST(p % 32 AS INT))) & 1") === 1,
              1L
            ).otherwise(0L)
          ).cast("long").as("hits")
        )
      val st = w.agg(sum(expr("bit_count(mask)")).cast("long").as("bits_set"))
      val agg = hit.agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("hits") === 2L, 1L).otherwise(0L)).cast("long").as("false_pos")
      )
      val nm = mem.agg(count(lit(1)).as("n_members"))
      nm.crossJoin(broadcast(st))
        .crossJoin(broadcast(agg))
        .select(
          col("n_members"),
          col("bits_set"),
          col("n_probes"),
          col("false_pos"),
          expr("false_pos * 1000000L div n_probes").cast("long").as("fpr_ppm")
        )
    },

    // Sample-based quantile estimation with its exact error — the third
    // member of the deterministic-sketch family (E177 CMS counts, E192
    // HLL cardinality, this one quantiles): per priority, the 256
    // md5-smallest orderkeys form a reproducible uniform sample; both the
    // sample estimate and the exact population quantile use the E136
    // ceil-rank pick at q ∈ {25, 50, 75, 90}, so est, truth AND err_ppm
    // are all exact BIGINTs (rank-boundary ties pick a well-defined VALUE
    // whatever the tie order). The quantile grid joins on the rank match —
    // boundary rows only, no 4× fan-out of the fact scan. Windows
    // priority-keyed throughout.
    QEntry.sql(
      "q_sample_quantile_err",
      """WITH o AS (SELECT o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey AS ok,
        |    md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders),
        |sr AS (SELECT pri, cents,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY h, ok) AS BIGINT)
        |      AS hr FROM o),
        |sq_ AS (SELECT pri, cents,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS sn
        |  FROM sr WHERE hr <= 256),
        |tq AS (SELECT pri, cents,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY cents, ok) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n FROM o),
        |g AS (SELECT CAST(u.q AS BIGINT) AS q FROM unnest([25, 50, 75, 90]) AS u(q)),
        |est AS (SELECT s.pri, g.q, s.cents AS est_cents
        |  FROM sq_ s JOIN g ON s.rn = (s.sn * g.q + 99) // 100),
        |tru AS (SELECT t.pri, g.q, t.cents AS true_cents
        |  FROM tq t JOIN g ON t.rn = (t.n * g.q + 99) // 100)
        |SELECT est.pri, est.q, est.est_cents, tru.true_cents,
        |  CAST((est.est_cents - tru.true_cents) * 1000000 // tru.true_cents
        |    AS BIGINT) AS err_ppm
        |FROM est JOIN tru ON est.pri = tru.pri AND est.q = tru.q"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey").as("ok"),
        md5(col("o_orderkey").cast("string")).as("h")
      )
      val wp = Window.partitionBy("pri")
      val sq = o
        .select(
          col("pri"),
          col("cents"),
          row_number().over(wp.orderBy("h", "ok")).cast("long").as("hr")
        )
        .filter(col("hr") <= 256)
        .select(
          col("pri"),
          col("cents"),
          row_number().over(wp.orderBy("cents")).cast("long").as("rn"),
          count(lit(1)).over(wp).cast("long").as("sn")
        )
      val tq = o.select(
        col("pri"),
        col("cents"),
        row_number().over(wp.orderBy("cents", "ok")).cast("long").as("rn"),
        count(lit(1)).over(wp).cast("long").as("n")
      )
      val g = s.range(0, 4).select(expr("element_at(array(25L, 50L, 75L, 90L), CAST(id + 1 AS INT))").as("q"))
      val est = sq
        .join(broadcast(g), expr("rn = (sn * q + 99) div 100"))
        .select(col("pri"), col("q"), col("cents").as("est_cents"))
      val tru = tq
        .join(broadcast(g), expr("rn = (n * q + 99) div 100"))
        .select(col("pri").as("tpri"), col("q").as("tquant"), col("cents").as("true_cents"))
      est
        .join(tru, col("pri") === col("tpri") && col("q") === col("tquant"))
        .select(
          col("pri"),
          col("q"),
          col("est_cents"),
          col("true_cents"),
          expr("(est_cents - true_cents) * 1000000L div true_cents").cast("long").as("err_ppm")
        )
    },

    // Welch's unequal-variance t between urgent (1-URGENT/2-HIGH) and
    // regular orders per status, with the Welch–Satterthwaite df. All
    // sufficient statistics are exact (BIGINT sums, DECIMAL(38,0) squared
    // sums — cents² × corpus overflows int64 at sf0.1); the float tail is
    // IEEE-exact-rounded ops only (casts, +−×÷, sqrt — no libm pow/ln), so
    // the identical expression tree is bit-stable cross-engine before the
    // courtesy round. One partial-agg shuffle into ≤ |status| rows.
    QEntry.sql(
      "q_welch_ttest",
      """WITH o AS (SELECT o_orderstatus AS st,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS hi,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM orders),
        |g AS (SELECT st,
        |    CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN hi = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN hi = 0 THEN cents ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN hi = 1 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |      AS DECIMAL(38,0)) AS q1,
        |    CAST(sum(CASE WHEN hi = 0 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |      AS DECIMAL(38,0)) AS q2
        |  FROM o GROUP BY st),
        |v AS (SELECT st, n1, n2,
        |    s1 * 1000 // n1 - s2 * 1000 // n2 AS mean_diff_milli,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2,
        |    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
        |  FROM g WHERE n1 >= 2 AND n2 >= 2)
        |SELECT st AS o_orderstatus, n1, n2, CAST(mean_diff_milli AS BIGINT) AS mean_diff_milli,
        |  round(md / sqrt(v1 / n1 + v2 / n2), 4) AS welch_t,
        |  round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
        |    / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2)
        |    AS welch_df
        |FROM v""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_orderstatus").as("st"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).as("hi"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents")
      )
      val g = o
        .groupBy("st")
        .agg(
          sum(when(col("hi") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
          sum(when(col("hi") === 0, 1L).otherwise(0L)).cast("long").as("n2"),
          sum(when(col("hi") === 1, col("cents")).otherwise(0L)).cast("long").as("s1"),
          sum(when(col("hi") === 0, col("cents")).otherwise(0L)).cast("long").as("s2"),
          sum(
            when(col("hi") === 1, (col("cents") * col("cents")).cast("decimal(38,0)"))
              .otherwise(lit(0).cast("decimal(38,0)"))
          ).cast("decimal(38,0)").as("q1"),
          sum(
            when(col("hi") === 0, (col("cents") * col("cents")).cast("decimal(38,0)"))
              .otherwise(lit(0).cast("decimal(38,0)"))
          ).cast("decimal(38,0)").as("q2")
        )
        .filter(col("n1") >= 2 && col("n2") >= 2)
      g.select(
        col("st").as("o_orderstatus"),
        col("n1"),
        col("n2"),
        expr("s1 * 1000 div n1 - s2 * 1000 div n2").cast("long").as("mean_diff_milli"),
        expr(
          "round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / sqrt(" +
            "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1 + " +
            "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2), 4)"
        ).as("welch_t"),
        expr(
          "round(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1 + " +
            "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2) * " +
            "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1 + " +
            "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2) / (" +
            "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1) * " +
            "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1) / (n1 - 1) + " +
            "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2) * " +
            "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2) / (n2 - 1)), 2)"
        ).as("welch_df")
      )
    },

    // Join-cardinality estimation audit — the textbook optimizer estimate
    // |R ⋈ S| ≈ |R|·|S| / max(ndv_R(k), ndv_S(k)) measured against the
    // ACTUAL join count for the two fact joins, with signed error in ppm.
    // The System-R assumption check a cost model regression-tests against
    // real data; every term (counts, NDVs, the estimate's integral
    // division) is an exact BIGINT. Three scans + two partial-agg'd joins,
    // two rows out at any scale.
    QEntry.sql(
      "q_join_card_est",
      """WITH oc AS (SELECT count(*) AS n, count(DISTINCT o_custkey) AS d FROM orders),
        |cc AS (SELECT count(*) AS n, count(DISTINCT c_custkey) AS d FROM customer),
        |lo AS (SELECT count(*) AS n, count(DISTINCT l_orderkey) AS d FROM lineitem),
        |oo AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS d FROM orders),
        |a1 AS (SELECT count(*) AS actual FROM orders
        |  JOIN customer ON o_custkey = c_custkey),
        |a2 AS (SELECT count(*) AS actual FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey),
        |r AS (
        |  SELECT 'orders_customer' AS join_name,
        |    CAST(oc.n AS BIGINT) AS n_left, CAST(cc.n AS BIGINT) AS n_right,
        |    CAST(oc.d AS BIGINT) AS ndv_left, CAST(cc.d AS BIGINT) AS ndv_right,
        |    CAST(oc.n * cc.n // greatest(oc.d, cc.d) AS BIGINT) AS est,
        |    CAST(a1.actual AS BIGINT) AS actual
        |  FROM oc, cc, a1
        |  UNION ALL
        |  SELECT 'lineitem_orders',
        |    CAST(lo.n AS BIGINT), CAST(oo.n AS BIGINT),
        |    CAST(lo.d AS BIGINT), CAST(oo.d AS BIGINT),
        |    CAST(lo.n * oo.n // greatest(lo.d, oo.d) AS BIGINT),
        |    CAST(a2.actual AS BIGINT)
        |  FROM lo, oo, a2)
        |SELECT join_name, n_left, n_right, ndv_left, ndv_right, est, actual,
        |  CAST((est - actual) * 1000000 // actual AS BIGINT) AS err_ppm
        |FROM r""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      def stats(df: org.apache.spark.sql.DataFrame, k: String) =
        df.agg(count(lit(1)).cast("long").as("n"), countDistinct(col(k)).cast("long").as("dv"))
      def audit(name: String, left: org.apache.spark.sql.DataFrame, lk: String,
                right: org.apache.spark.sql.DataFrame, rk: String) = {
        val actual = left.join(right, col(lk) === col(rk))
          .agg(count(lit(1)).cast("long").as("actual"))
        stats(left, lk).toDF("n_left", "ndv_left")
          .crossJoin(broadcast(stats(right, rk).toDF("n_right", "ndv_right")))
          .crossJoin(broadcast(actual))
          .select(
            lit(name).as("join_name"),
            col("n_left"), col("n_right"), col("ndv_left"), col("ndv_right"),
            expr("n_left * n_right div greatest(ndv_left, ndv_right)")
              .cast("long").as("est"),
            col("actual")
          )
          .withColumn("err_ppm", expr("(est - actual) * 1000000L div actual").cast("long"))
      }
      audit("orders_customer", orders(s, d), "o_custkey", customer(s, d), "c_custkey")
        .unionAll(
          audit("lineitem_orders", lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"))
    },

    // E254 exact global median by TWO-PHASE SELECTION — no global sort, no
    // window, no sketch: a coarse (value >> 16) histogram locates the rank-k
    // bucket, an exact value histogram inside that one bucket (≤ 2^16 rows
    // by construction) finishes. Driver traffic is bounded by CONFIG, not
    // data, so the exact median of a 100 TB cents column costs two
    // partial-agg scans. The twin ranks with a window — the oracle may sort,
    // the engine must not; SelectionSpec pins kth-vs-sorted-array ground
    // truth incl. ties, negatives, and rank edges.
    QEntry.sql(
      "q_kth_element",
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c),
        |o AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
        |SELECT n.n_rows, CAST((n.n_rows + 1) // 2 AS BIGINT) AS k,
        |  o.cents AS kth_cents
        |FROM n JOIN o ON o.rn = (n.n_rows + 1) // 2"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val cents = orders(s, d).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      val (n, med) = Selection.exactMedian(cents, "cents")
      import s.implicits._
      Seq((n, (n + 1) / 2, med)).toDF("n_rows", "k", "kth_cents")
    },

    // E296 exact median from MAINTAINED histogram state — the daily-median
    // IVM composition: per-slice coarse (bucket, cnt) histograms merge by
    // plain summation (the E250 algebra applied to selection's phase 1),
    // so a repeated exact-median job pays O(delta) maintenance plus ONE
    // scan scoped to the winning bucket's value range at query time —
    // never the fresh path's two full passes. Same twin as q_kth_element:
    // the answer must be the same number through the state-merged path.
    QEntry.sql(
      "pipe_incr_median",
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c),
        |o AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
        |SELECT n.n_rows, CAST((n.n_rows + 1) // 2 AS BIGINT) AS k,
        |  o.cents AS kth_cents
        |FROM n JOIN o ON o.rn = (n.n_rows + 1) // 2"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = orders(s, d).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
        col("o_orderdate").cast("date").as("od")
      )
      val history = Selection.histogramState(base.filter(col("od") < "1997-01-01"), "cents")
      val delta = Selection.histogramState(base.filter(col("od") >= "1997-01-01"), "cents")
      val n = history.unionByName(delta).agg(sum("cnt").cast("long")).head().getLong(0)
      val k = (n + 1) / 2
      val med = Selection.kthFromHistogramState(base, "cents", Seq(history, delta), k)
      import s.implicits._
      Seq((n, k, med)).toDF("n_rows", "k", "kth_cents")
    },

    // E255 exact global quantile SET by shared-histogram selection: p25/p50/
    // p75/p99 (rank = ceil(pct·n/100)) from ONE coarse histogram pass plus
    // one in-bucket pass per distinct winning bucket — ≤ 5 partial-agg
    // scans for four exact quantiles of a 100 TB column, vs the sketch
    // entries' approximate one-pass and a sort's terabyte shuffle. Twin
    // ranks with a window and picks the same ceil ranks.
    QEntry.sql(
      "q_exact_quartiles",
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c),
        |o AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
        |SELECT n.n_rows,
        |  (SELECT cents FROM o WHERE rn = (25 * n.n_rows + 99) // 100) AS p25_cents,
        |  (SELECT cents FROM o WHERE rn = (50 * n.n_rows + 99) // 100) AS p50_cents,
        |  (SELECT cents FROM o WHERE rn = (75 * n.n_rows + 99) // 100) AS p75_cents,
        |  (SELECT cents FROM o WHERE rn = (99 * n.n_rows + 99) // 100) AS p99_cents
        |FROM n"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val cents = orders(s, d).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      val (n, q) = Selection.quantiles(cents, "cents", Seq(25, 50, 75, 99))
      import s.implicits._
      Seq((n, q(25), q(50), q(75), q(99)))
        .toDF("n_rows", "p25_cents", "p50_cents", "p75_cents", "p99_cents")
    },

    // E265 exact order statistics on a WIDE-domain column — the adaptive
    // refinement path the money-like entries never exercise: a signed
    // md5-derived value spanning ±2^60 (the hash/id-column shape), where a
    // fixed value>>16 histogram would be 2^45 buckets. The range-derived
    // coarse shift + per-bucket recursion keeps every driver payload under
    // the 2^16 config bound while still answering exactly; the twin ranks
    // with a window over the identically-derived values. (Portable value:
    // 15 md5 hex chars → [0, 2^60), sign from the 16th nibble's parity —
    // both engines reproduce it bit-for-bit.)
    QEntry.sql(
      "q_kth_wide_domain",
      """WITH c AS (SELECT CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 16, 1)
        |      AS BIGINT) % 2 = 1
        |    THEN -CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
        |    ELSE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
        |    END AS v FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c)
        |SELECT n.n_rows,
        |  (SELECT v FROM o WHERE rn = (25 * n.n_rows + 99) // 100) AS p25_v,
        |  (SELECT v FROM o WHERE rn = (50 * n.n_rows + 99) // 100) AS p50_v,
        |  (SELECT v FROM o WHERE rn = (99 * n.n_rows + 99) // 100) AS p99_v
        |FROM n"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val sign = conv(substring(md5(col("o_orderkey").cast("string")), 16, 1), 16, 10)
        .cast("long") % 2
      // pin the derived column: the multi-level selection scans the frame
      // once per refinement pass (its designed shape — at scale each pass
      // is a cheap columnar re-scan), and without the checkpoint every
      // pass would re-run the md5 derivation (measured 9.3 s → ~1 s at
      // sf0.1). The materialized frame is one long per row.
      val v = orders(s, d)
        .select(when(sign === 1, -base).otherwise(base).as("v"))
        .localCheckpoint()
      val (n, q) = Selection.quantiles(v, "v", Seq(25, 50, 99))
      import s.implicits._
      Seq((n, q(25), q(50), q(99))).toDF("n_rows", "p25_v", "p50_v", "p99_v")
    },

    // CPU-scaling SENTINEL (round-18 harness contract): an embarrassingly
    // parallel md5-chain checksum whose wall time MUST track core count —
    // the reference point that lets a scaling-lap reader separate
    // "barrier-bound operator" from "host throughput swing" (the round-17
    // c8/c32 lap pair was uninterpretable because every entry ratio ≈ 1 and
    // nothing pinned the cause). 256 work items per document, each hashing
    // a 32-deep md5 chain; the one shuffle (the doc-id repartition —
    // partition count follows spark.sql.shuffle.partitions, so the lap's
    // core count sets the parallelism) carries two longs per item, and the
    // chain runs post-shuffle, so task compute dominates at any core count.
    // Deterministic, data-derived (doc_id seeds), oracle-replayable. The
    // doc ids are shuffled FIRST (a 2-long-per-row exchange) and the
    // 256-way explode plus the chain run post-shuffle, so the heavy stage
    // is always `shuffle.partitions`-wide — a single-file scan can never
    // serialize the work generation.
    QEntry.sql(
      "q_cpu_scaling_sentinel", {
        val chain = (1 to 32).foldLeft(
          "CAST(doc_id AS VARCHAR) || '|' || CAST(rep AS VARCHAR)")((c, _) => s"md5($c)")
        s"""WITH work AS (SELECT doc_id, rep FROM documents,
           |    (SELECT unnest(range(0, 256)) AS rep) r),
           |h AS (SELECT $chain AS hh FROM work)
           |SELECT CAST(count(*) AS BIGINT) AS n_items,
           |  CAST(sum(CAST(list_sum(list_transform(range(1, 9), ii ->
           |    (strpos('0123456789abcdef', substr(hh, CAST(ii AS INT), 1)) - 1)
           |      * pow(16, 8 - ii))) AS BIGINT)) AS BIGINT) AS checksum
           |FROM h""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      // the partition count is PINNED to the session's shuffle parallelism:
      // an unpinned repartition of a 5000-row (80 KB) exchange is AQE-
      // coalesced to ONE partition — the per-row work behind it is invisible
      // to size-based coalescing, and the whole chain would serialize into
      // a single task (measured: flat 13 s at c8 AND c32). Pinning restores
      // the property the sentinel exists for: parallelism = core count.
      val work = documents(s, d)
        .select(col("doc_id"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
        .select(col("doc_id"), explode(sequence(lit(0L), lit(255L))).as("rep"))
      val h0 = concat(col("doc_id").cast("string"), lit("|"), col("rep").cast("string"))
      val hK = (1 to 32).foldLeft(h0)((c, _) => md5(c))
      work
        .select(conv(substring(hK, 1, 8), 16, 10).cast("long").as("_hv"))
        .agg(
          count(lit(1)).cast("long").as("n_items"),
          sum(col("_hv")).cast("long").as("checksum")
        )
    }
  )
}
