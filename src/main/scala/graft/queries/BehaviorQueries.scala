package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Behavioral / event-sequence analytics battery: gaps-and-islands streaks,
  * ordered-sequence pattern matching (MATCH_RECOGNIZE-lite), time-weighted
  * averages, and percent-of-total reporting. The queries a product-analytics
  * user runs daily over an event log — each built as keyed (per-user /
  * per-month) shuffles that stay parallel at 100 TB, and each deterministic
  * cross-engine (integer date/µs arithmetic; exact integer numerators with a
  * single correctly-rounded division where a ratio is reported).
  */
object BehaviorQueries {

  val entries: Seq[QEntry] = Seq(
    // Gaps-and-islands: longest run of CONSECUTIVE active days per user.
    // Classic trick: within each user, row_number over distinct active days
    // minus the day index is constant across a consecutive run — group on
    // that anchor date. All date/integer arithmetic (no floats); the window
    // is keyed by user_id so the shuffle stays parallel (distinct days per
    // user is bounded by the calendar, not the corpus).
    QEntry.sql(
      "q_gaps_islands",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |seq AS (SELECT user_id, d,
        |          CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS rn
        |        FROM days),
        |lens AS (SELECT user_id, d - rn AS anchor, count(*) AS len
        |         FROM seq GROUP BY user_id, anchor)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_islands
        |FROM lens GROUP BY user_id""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val days = events(s, d).select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val rn = row_number().over(Window.partitionBy("user_id").orderBy("d"))
      days
        .withColumn("_rn", rn)
        .withColumn("_anchor", expr("date_sub(d, _rn)"))
        .groupBy("user_id", "_anchor")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"), count(lit(1)).as("n_islands"))
    },

    // Ordered-sequence pattern match (MATCH_RECOGNIZE-lite): encode each
    // user's event history as a code string in (ts, event_id) order and run
    // a regex over it — here "an error later followed by a purchase with no
    // signup in between". One keyed collect per user (state bounded by that
    // user's history, the same contract as any sessionizer); the regex scan
    // is then a narrow per-row op. (ts, event_id) makes the order total, so
    // both engines build the identical string.
    QEntry.sql(
      "q_event_pattern_match",
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS codes
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(codes) AS BIGINT) AS seq_len,
        |  regexp_matches(codes, 'e[^s]*p') AS recovered
        |FROM seqs""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      events(s, d)
        .select(
          col("user_id"),
          struct(
            unix_micros(col("ts")).as("us"),
            col("event_id"),
            substring(col("event_type"), 1, 1).as("code")
          ).as("ev")
        )
        .groupBy("user_id")
        .agg(array_sort(collect_list(col("ev"))).as("evs"))
        .select(
          col("user_id"),
          array_join(expr("transform(evs, x -> x.code)"), "").as("codes")
        )
        .select(
          col("user_id"),
          length(col("codes")).cast("bigint").as("seq_len"),
          col("codes").rlike("e[^s]*p").as("recovered")
        )
    },

    // Time-weighted average of `value` per user: each reading holds until the
    // next event, so its weight is the gap duration. Keyed lead() window
    // (parallel across users); the weighted sum is EXACT — value quantized to
    // integer cents via floor(value*100) (the same single IEEE multiply in
    // both engines), durations in integer µs, products summed as BIGINT
    // (56021 cents × 2.6e12 µs total ≈ 1.5e17, far under 2^63 — staying in
    // int64 matters because int64→double is a correctly-rounded single
    // instruction in BOTH engines, whereas DuckDB's HUGEINT→double goes
    // through two float ops and disagrees with Spark's decimal→double in the
    // last ulp — observed here at sf0.01). One double division at the end —
    // the float-determinism ladder's "numerator exact, ONE div" rung.
    QEntry.sql(
      "q_time_weighted_avg",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |             CAST(floor(value * 100) AS BIGINT) AS vu FROM events),
        |g AS (SELECT user_id, vu,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur
        |      FROM e),
        |a AS (SELECT user_id, CAST(sum(vu * dur) AS BIGINT) AS num,
        |        CAST(sum(dur) AS BIGINT) AS den
        |      FROM g WHERE dur IS NOT NULL GROUP BY user_id)
        |SELECT user_id, den AS total_dur_us,
        |  CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * 100) AS tw_avg
        |FROM a""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * lit(100)).cast("bigint").as("vu")
        )
        .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dur").isNotNull)
        .groupBy("user_id")
        .agg(
          sum(col("vu") * col("dur")).as("num"),
          sum("dur").cast("bigint").as("den")
        )
        .select(
          col("user_id"),
          col("den").as("total_dur_us"),
          (col("num").cast("double") / (col("den").cast("double") * lit(100))).as("tw_avg")
        )
    },

    // Percent-of-total (ratio_to_report): each order priority's share of its
    // month's revenue. Facts pre-aggregate to (month, priority) integer-cent
    // sums BEFORE the window — the share window then runs over ~5 rows per
    // month partition, never over raw orders. Share = one double division of
    // two exact integers.
    QEntry.sql(
      "q_ratio_to_report",
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY month, o_orderpriority)
        |SELECT month, o_orderpriority, cents,
        |  CAST(cents AS DOUBLE) /
        |    CAST(sum(cents) OVER (PARTITION BY month) AS DOUBLE) AS share
        |FROM m""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
      val m = orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_orderpriority"), cents.as("_c"))
        .groupBy("month", "o_orderpriority")
        .agg(sum("_c").cast("bigint").as("cents"))
      m.select(
        col("month"),
        col("o_orderpriority"),
        col("cents"),
        (col("cents").cast("double") /
          sum("cents").over(Window.partitionBy("month")).cast("double")).as("share")
      )
    },

    // First-order Markov transition matrix over each user's event stream:
    // lag(event_type) within (user, ts, event_id) order pairs every event
    // with its predecessor, a global count per (prev, cur) follows, and the
    // row-conditional probability is ONE double division of two exact BIGINT
    // counts (correctly rounded, bit-identical cross-engine). The lag window
    // is keyed by user — per-user history bounds the state, the transition
    // count aggregation is an ordinary partial-agg shuffle over ≤|types|²
    // keys. (ts, event_id) is a total order, so both engines pair
    // identically.
    QEntry.sql(
      "q_markov_transitions",
      """WITH steps AS (
        |  SELECT user_id, event_type AS cur,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |t AS (SELECT prev, cur, count(*) AS cnt FROM steps
        |      WHERE prev IS NOT NULL GROUP BY prev, cur)
        |SELECT prev, cur, cnt,
        |  CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY prev) AS DOUBLE) AS p
        |FROM t""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_type").as("cur"), lag("event_type", 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "cur")
        .agg(count(lit(1)).as("cnt"))
        .withColumn(
          "p",
          col("cnt").cast("double") /
            sum("cnt").over(Window.partitionBy("prev")).cast("double")
        )
    },

    // E338 sequential pattern support: contiguous length-3 event-type
    // patterns per user stream (the GSP/PrefixSpan screening pass restricted
    // to contiguous windows — the variant whose candidate count stays LINEAR
    // in the stream instead of exploding combinatorially), ranked by
    // distinct-USER support (how many users exhibit it at least once, the
    // pattern-mining support notion) with raw occurrences alongside. Two
    // leads in one keyed window, one partial-agg shuffle over ≤|types|³
    // keys, TakeOrdered top-15 (support, occurrences, pattern — total
    // order).
    QEntry.sql(
      "q_seq_patterns",
      """WITH tri AS (
        |  SELECT user_id,
        |    event_type AS t1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        |  FROM events),
        |p AS (SELECT user_id, t1 || '>' || t2 || '>' || t3 AS pattern FROM tri
        |  WHERE t2 IS NOT NULL AND t3 IS NOT NULL),
        |a AS (SELECT pattern, CAST(count(DISTINCT user_id) AS BIGINT) AS support_users,
        |    CAST(count(*) AS BIGINT) AS occurrences
        |  FROM p GROUP BY pattern)
        |SELECT pattern, support_users, occurrences FROM a
        |ORDER BY support_users DESC, occurrences DESC, pattern LIMIT 15"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(
          col("user_id"),
          col("event_type").as("t1"),
          lead("event_type", 1).over(w).as("t2"),
          lead("event_type", 2).over(w).as("t3")
        )
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .select(col("user_id"), concat_ws(">", col("t1"), col("t2"), col("t3")).as("pattern"))
        .groupBy("pattern")
        .agg(
          countDistinct(col("user_id")).cast("long").as("support_users"),
          count(lit(1)).cast("long").as("occurrences")
        )
        .orderBy(col("support_users").desc, col("occurrences").desc, col("pattern"))
        .limit(15)
    },

    // Skyline (Pareto frontier) per priority class: orders not dominated on
    // (price, date) — dominated means some STRICTLY pricier order in the
    // class is also at least as recent. The classic quadratic NOT EXISTS is
    // replaced by one keyed sort: with integer cents ordered DESC, a RANGE
    // frame ending at 1 PRECEDING is exactly "all strictly pricier rows",
    // and a running max(date) over it decides domination in O(n log n) per
    // partition — the scale-safe skyline shape. Integer cents/epoch-day
    // arithmetic throughout.
    QEntry.sql(
      "q_skyline_pareto",
      """WITH o AS (
        |  SELECT o_orderpriority AS pri, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dday
        |  FROM orders),
        |m AS (SELECT pri, o_orderkey, cents, dday,
        |        max(dday) OVER (PARTITION BY pri ORDER BY cents DESC
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_d
        |      FROM o)
        |SELECT pri, o_orderkey, cents, dday
        |FROM m WHERE best_d IS NULL OR dday > best_d"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_orderpriority").as("pri"),
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("bigint").as("dday")
      )
      val pricier = Window
        .partitionBy("pri")
        .orderBy(col("cents").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      o.withColumn("best_d", max("dday").over(pricier))
        .filter(col("best_d").isNull || col("dday") > col("best_d"))
        .select("pri", "o_orderkey", "cents", "dday")
    },

    // Exponentially-weighted moving average with half-life 1 over each
    // customer's most recent ≤16 orders. Floats make EWMA order-dependent;
    // with α = 1/2 every weight is a power of two, so numerator and
    // denominator are EXACT BIGINTs (cents < 2^26, weights ≤ 2^15, 16 terms
    // → < 2^45) and the reported average is one correctly-rounded division —
    // bit-identical cross-engine. Keyed window (customer), bounded frame:
    // state per key is 16 rows regardless of corpus size.
    QEntry.sql(
      "q_ewma_halflife",
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS BIGINT) AS rn
        |  FROM orders)
        |SELECT o_custkey,
        |  CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(16 - rn AS INT))) AS BIGINT) AS num,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(16 - rn AS INT)) AS BIGINT) AS den,
        |  CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(16 - rn AS INT))) AS DOUBLE) /
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(16 - rn AS INT)) AS DOUBLE) AS ewma
        |FROM r WHERE rn <= 16 GROUP BY o_custkey"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val weight = expr("shiftleft(1L, cast(16 - rn as int))")
      orders(s, d)
        .select(
          col("o_custkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
          row_number().over(w).cast("bigint").as("rn")
        )
        .filter(col("rn") <= 16)
        .groupBy("o_custkey")
        .agg(
          sum(col("cents") * weight).as("num"),
          sum(weight).as("den")
        )
        .withColumn("ewma", col("num").cast("double") / col("den").cast("double"))
    },

    // Statistical mode with a deterministic tie-break: each customer's most
    // frequent order priority, ties resolved lexicographically — the
    // argmax-per-group idiom as a keyed count + one max(struct) partial agg
    // (no window, no second shuffle: the struct packs (cnt, reversed-rank
    // key) so max() is the tie-broken argmax). DuckDB twin spells the same
    // rule with row_number.
    QEntry.sql(
      "q_mode_per_group",
      """WITH c AS (
        |  SELECT o_custkey, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY o_custkey, o_orderpriority),
        |r AS (SELECT o_custkey, o_orderpriority, cnt,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        |      FROM c)
        |SELECT o_custkey, o_orderpriority AS mode_priority, cnt
        |FROM r WHERE rn = 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      // argmax via max(struct): higher cnt wins; on equal cnt the LOWER
      // priority string must win, so compare on a per-char reversed key
      // (translate swaps the '1'-'5' priority prefix ordering).
      orders(s, d)
        .groupBy("o_custkey", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("_inv", translate(col("o_orderpriority"), "12345", "54321"))
        .groupBy("o_custkey")
        .agg(max(struct(col("cnt"), col("_inv"), col("o_orderpriority"))).as("_b"))
        .select(
          col("o_custkey"),
          col("_b.o_orderpriority").as("mode_priority"),
          col("_b.cnt").as("cnt")
        )
    },

    // Interval coalescing: merge each supplier's overlapping-or-touching
    // busy windows ([shipdate, shipdate + quantity days] — quantity is
    // integral, so the end is exact integer arithmetic) and report merged
    // count + covered days. Island rule: an interval opens a new island iff
    // its start exceeds the running max(end) of all prior intervals (ROWS …
    // 1 PRECEDING frame, ordered by start) — tied starts always merge
    // (end ≥ start), so island COUNTS are order-stable under ties. All
    // integer epoch-day arithmetic; windows keyed by supplier (state
    // bounded by one supplier's lineitems).
    QEntry.sql(
      "q_merge_intervals",
      """WITH iv AS (SELECT l_suppkey AS supp,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + CAST(l_quantity AS BIGINT) AS e
        |  FROM lineitem),
        |m AS (SELECT supp, s, e,
        |    max(e) OVER (PARTITION BY supp ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |f AS (SELECT supp, s, e,
        |    CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS opn
        |  FROM m),
        |g AS (SELECT supp, s, e,
        |    sum(opn) OVER (PARTITION BY supp ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |isl AS (SELECT supp, island,
        |    min(s) AS lo, max(e) AS hi FROM g GROUP BY supp, island)
        |SELECT supp, count(*) AS n_merged,
        |  CAST(sum(hi - lo + 1) AS BIGINT) AS days_covered
        |FROM isl GROUP BY supp""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val iv = lineitem(s, d).select(
        col("l_suppkey").as("supp"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("bigint").as("s"),
        (datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("bigint")
          + col("l_quantity").cast("bigint")).as("e")
      )
      val wPrev = Window
        .partitionBy("supp")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window
        .partitionBy("supp")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv
        .withColumn("prev_max", max("e").over(wPrev))
        .withColumn(
          "opn",
          when(col("prev_max").isNull || col("s") > col("prev_max"), 1L).otherwise(0L)
        )
        .withColumn("island", sum("opn").over(wRun))
        .groupBy("supp", "island")
        .agg(min("s").as("lo"), max("e").as("hi"))
        .groupBy("supp")
        .agg(
          count(lit(1)).as("n_merged"),
          sum(col("hi") - col("lo") + 1).cast("bigint").as("days_covered")
        )
    },

    // SCD Type-2 dimension build from the event log: each user's event_type
    // history collapses to effective-dated rows (valid_from, valid_to,
    // version, is_current) — change detection via lag over the (ts,
    // event_id) total order, interval close via lead, literal far-future
    // sentinel on the open row. Both windows are USER-KEYED: state is one
    // user's history, so the build parallelizes by entity at warehouse
    // scale (vs the serial MERGE-loop formulation).
    QEntry.sql(
      "q_scd2_intervals",
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us, event_id FROM events),
        |o AS (SELECT user_id, event_type, us, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS vt,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS BIGINT) AS version
        |  FROM ch)
        |SELECT user_id, event_type,
        |  strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  COALESCE(strftime(make_timestamp(vt), '%Y-%m-%d %H:%M:%S.%f'),
        |    '9999-12-31 00:00:00.000000') AS valid_to,
        |  version, CAST(vt IS NULL AS INT) AS is_current
        |FROM v""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      graft.operators.Scd2.buildType2(
        events(s, d).select("user_id", "event_type", "ts", "event_id"),
        keyCols = Seq("user_id"),
        attrCols = Seq("event_type"),
        orderCol = "ts",
        tieCol = "event_id"
      )
    },

    // Position-based multi-touch attribution (40/40/20): every purchase
    // distributes EXACTLY 100 integer credit points over the user's clicks
    // in a 7-day lookback — first and last touch get 40 each, middles share
    // 20 by largest remainder (earliest middles take the residue), n=1→100,
    // n=2→50/50. Pure integer arithmetic, so Σcredit = purchases·100 by
    // construction (the float version never balances). The click⋈purchase
    // bracket is a USER-keyed join with a µs range predicate, and the
    // position windows are purchase-keyed — both bounded by one user's
    // 7-day activity, never the event corpus.
    // E351 data-driven Shapley attribution ([[graft.operators.Attribution
    // .shapleyCreditFromExposures]]): per-channel average marginal
    // contribution to the observed conversion rate across all channel-set
    // orderings — exact factorial weights on the 2⁴ coalition table,
    // v(S) = conversion rate of users exposed to exactly S in integer ppm,
    // unobserved coalitions v = 0. Exposure here = the channel is
    // OVER-REPRESENTED in the user's stream (5·count > total — presence
    // alone is vacuous on this synthetic log where every user touches every
    // type); same rule defines conversion. One user-keyed aggregate touches
    // the log; everything after is a 16-row grid.
    QEntry.sql(
      "q_shapley_credit",
      """WITH um AS (SELECT user_id,
        |    (CASE WHEN 5 * sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |          > count(*) THEN 1 ELSE 0 END)
        |    + (CASE WHEN 5 * sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |          > count(*) THEN 2 ELSE 0 END)
        |    + (CASE WHEN 5 * sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |          > count(*) THEN 4 ELSE 0 END)
        |    + (CASE WHEN 5 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |          > count(*) THEN 8 ELSE 0 END) AS mask,
        |    CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         > count(*) THEN 1 ELSE 0 END AS c
        |  FROM events GROUP BY user_id),
        |v AS (SELECT mask, CAST(count(*) AS BIGINT) AS nu,
        |       CAST(sum(c) * 1000000 // count(*) AS BIGINT) AS v_ppm
        |      FROM um GROUP BY mask),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2), ('signup', 4),
        |       ('error', 8)) AS t(channel, bit)),
        |ms AS (SELECT unnest(range(0, 16)) AS s),
        |grid AS (SELECT ch.channel,
        |    COALESCE(v0.v_ppm, 0) AS v0, COALESCE(v1.v_ppm, 0) AS v1,
        |    CASE bit_count(ms.s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
        |         WHEN 3 THEN 6 END AS wn
        |  FROM ch JOIN ms ON (ms.s & ch.bit) = 0
        |  LEFT JOIN v v0 ON v0.mask = ms.s
        |  LEFT JOIN v v1 ON v1.mask = ms.s + ch.bit),
        |phi AS (SELECT channel, CAST(sum((v1 - v0) * wn) // 24 AS BIGINT) AS phi_ppm
        |        FROM grid GROUP BY channel),
        |ex AS (SELECT ch.channel, CAST(sum(v.nu) AS BIGINT) AS exposed_users
        |       FROM ch JOIN v ON (v.mask & ch.bit) <> 0 GROUP BY ch.channel)
        |SELECT phi.channel, phi.phi_ppm, COALESCE(ex.exposed_users, 0) AS exposed_users
        |FROM phi LEFT JOIN ex ON phi.channel = ex.channel"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      def over(t: String) =
        (lit(5) * sum(when(col("event_type") === t, 1L).otherwise(0L)) >
          count(lit(1)))
      val exposures = events(s, d)
        .groupBy(col("user_id"))
        .agg(
          over("click").as("click"),
          over("view").as("view"),
          over("signup").as("signup"),
          over("error").as("error"),
          over("purchase").as("_conv")
        )
      graft.operators.Attribution
        .shapleyCreditFromExposures(exposures, Seq("click", "view", "signup", "error"), "_conv")
    },

    QEntry.sql(
      "q_attribution_credit",
      """WITH p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.pid, c.cid,
        |    CAST(row_number() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid)
        |      AS BIGINT) AS pos,
        |    CAST(count(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts < p.pts AND c.cts >= p.pts - 604800000000),
        |cr AS (SELECT user_id, pid, cid,
        |    CASE WHEN n = 1 THEN 100 WHEN n = 2 THEN 50
        |         WHEN pos = 1 OR pos = n THEN 40
        |         ELSE 20 // (n - 2)
        |           + (CASE WHEN pos - 1 <= 20 % (n - 2) THEN 1 ELSE 0 END)
        |    END AS credit FROM j)
        |SELECT user_id, CAST(count(DISTINCT pid) AS BIGINT) AS purchases,
        |  CAST(count(*) AS BIGINT) AS credited_clicks,
        |  CAST(sum(credit) AS BIGINT) AS credit_total
        |FROM cr GROUP BY user_id"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("us").as("pts"))
      val c = ev
        .filter(col("event_type") === "click")
        .select(col("user_id").as("cuser"), col("event_id").as("cid"), col("us").as("cts"))
      val wp = Window.partitionBy("pid")
      val j = p
        .join(
          c,
          col("user_id") === col("cuser") &&
            col("cts") < col("pts") && col("cts") >= col("pts") - lit(604800000000L)
        )
        .select(
          col("user_id"),
          col("pid"),
          col("cid"),
          row_number().over(wp.orderBy("cts", "cid")).cast("long").as("pos"),
          count(lit(1)).over(wp).cast("long").as("n")
        )
      j.select(
        col("user_id"),
        col("pid"),
        when(col("n") === 1L, 100L)
          .when(col("n") === 2L, 50L)
          .when(col("pos") === 1L || col("pos") === col("n"), 40L)
          .otherwise(
            expr("20L div (n - 2) + (CASE WHEN pos - 1 <= 20L % (n - 2) THEN 1 ELSE 0 END)")
          )
          .as("credit")
      ).groupBy("user_id")
        .agg(
          countDistinct("pid").cast("long").as("purchases"),
          count(lit(1)).as("credited_clicks"),
          sum("credit").cast("long").as("credit_total")
        )
    },

    // Point-in-time snapshot over the SCD2 dimension (E156): each user's
    // state AT an instant is the unique version whose [valid_from,
    // valid_to) interval brackets it — the dimensional lookup every
    // effective-dated warehouse read performs. Exactly one row per user
    // active before the snapshot (intervals tile by construction; the
    // far-future sentinel keeps the open row match null-free). Same
    // user-keyed windows as the builder; the snapshot filter prunes to
    // one row per user before any further join.
    QEntry.sql(
      "q_scd2_snapshot",
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us, event_id FROM events),
        |o AS (SELECT user_id, event_type, us, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, us AS vf,
        |    COALESCE(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
        |      253402300800000000) AS vt FROM ch)
        |SELECT user_id, event_type AS state_at_snapshot
        |FROM v WHERE vf <= epoch_us(TIMESTAMP '2024-01-15 12:00:00')
        |  AND epoch_us(TIMESTAMP '2024-01-15 12:00:00') < vt"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val snapUs = 1705320000000000L // 2024-01-15T12:00:00Z in epoch micros
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val e = events(s, d).select(
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        col("event_id")
      )
      e.withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(
          col("user_id"),
          col("event_type"),
          col("us").as("vf"),
          coalesce(lead(col("us"), 1).over(w), lit(253402300800000000L)).as("vt")
        )
        .filter(col("vf") <= snapUs && lit(snapUs) < col("vt"))
        .select(col("user_id"), col("event_type").as("state_at_snapshot"))
    },

    // Inter-purchase gap distribution: consecutive order-date gaps per
    // customer (lag over a customer-keyed (date, orderkey) total order —
    // deterministic under same-day orders), histogrammed by gap week.
    // The purchase-cadence curve behind churn/LTV models, reduced to
    // exact integer epoch-day arithmetic: gap days, floor-week bucket,
    // counts and day totals all BIGINT — bit-identical cross-engine.
    // Customer-keyed window + one partial agg; scales as orders/customers.
    QEntry.sql(
      "q_interpurchase_gaps",
      """WITH d AS (SELECT o_custkey AS ck,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ad,
        |    o_orderkey AS ok FROM orders),
        |g AS (SELECT ad - lag(ad) OVER (PARTITION BY ck ORDER BY ad, ok) AS gap
        |  FROM d)
        |SELECT CAST(gap // 7 AS BIGINT) AS gap_week,
        |  CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS total_days
        |FROM g WHERE gap IS NOT NULL GROUP BY gap_week"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = orders(s, d).select(
        col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("ad"),
        col("o_orderkey").as("ok")
      )
      base
        .withColumn(
          "gap",
          col("ad") - lag("ad", 1).over(Window.partitionBy("ck").orderBy("ad", "ok"))
        )
        .filter(col("gap").isNotNull)
        .groupBy(expr("gap div 7").as("gap_week"))
        .agg(count(lit(1)).as("n_gaps"), sum("gap").cast("long").as("total_days"))
    },

    // Funnel stage latency: the MEDIAN time users take between funnel
    // stages (view→click, click→purchase), by cohort month of the first
    // view — q_events_funnel counts who converts; this measures HOW
    // LONG, the number a UX team actually moves. Earliest-qualifying
    // stage times via the same keyed min-agg chain (no windows over
    // event history); gaps are exact epoch-second integers and the
    // median is an exact ceil-rank pick over (month, stage)-keyed
    // windows, so each partition holds one cohort month's converters.
    QEntry.sql(
      "q_funnel_latency",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id),
        |g AS (SELECT strftime(v.t1, '%Y-%m') AS month, 'view_to_click' AS stage,
        |    (epoch_us(c.t2) - epoch_us(v.t1)) // 1000000 AS gap_s
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  UNION ALL
        |  SELECT strftime(v.t1, '%Y-%m'), 'click_to_purchase',
        |    (epoch_us(p.t3) - epoch_us(c.t2)) // 1000000
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  JOIN p ON c.user_id = p.user_id),
        |r AS (SELECT month, stage, gap_s,
        |    CAST(row_number() OVER (PARTITION BY month, stage ORDER BY gap_s)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY month, stage) AS BIGINT) AS n
        |  FROM g)
        |SELECT month, stage, max(n) AS n_users,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END) AS median_gap_s
        |FROM r GROUP BY month, stage"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val v = ev
        .filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(min("ts").as("t1"))
      val c = ev
        .filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") >= col("t1"))
        .groupBy("user_id")
        .agg(min("ts").as("t2"))
      val p = ev
        .filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") >= col("t2"))
        .groupBy("user_id")
        .agg(min("ts").as("t3"))
      val g1 = v
        .join(c, "user_id")
        .select(
          date_format(col("t1"), "yyyy-MM").as("month"),
          lit("view_to_click").as("stage"),
          expr("(unix_micros(t2) - unix_micros(t1)) div 1000000").as("gap_s")
        )
      val g2 = v
        .join(c, "user_id")
        .join(p, "user_id")
        .select(
          date_format(col("t1"), "yyyy-MM").as("month"),
          lit("click_to_purchase").as("stage"),
          expr("(unix_micros(t3) - unix_micros(t2)) div 1000000").as("gap_s")
        )
      val wms = Window.partitionBy("month", "stage")
      g1.unionAll(g2)
        .select(
          col("month"),
          col("stage"),
          col("gap_s"),
          row_number().over(wms.orderBy("gap_s")).cast("long").as("rn"),
          count(lit(1)).over(wms).cast("long").as("n")
        )
        .groupBy("month", "stage")
        .agg(
          max("n").as("n_users"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s"))).as("median_gap_s")
        )
    },

    // DAU/MAU stickiness per month — "how many of the month's users show
    // up on an average day", the engagement ratio product analytics
    // tracks beside q_growth_accounting's ledger. Distinct-user state is
    // (month, day)-keyed partial aggs (never a running distinct);
    // avg-DAU and the stickiness ratio ship as exact milli/ppm integral
    // divisions over active-day counts (days with zero events don't
    // exist in the log and are excluded by definition — documented).
    QEntry.sql(
      "q_dau_stickiness",
      """WITH dd AS (SELECT strftime(ts, '%Y-%m') AS month,
        |    strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
        |dau AS (SELECT month, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM dd GROUP BY month, day),
        |mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM dd GROUP BY month),
        |da AS (SELECT month, CAST(sum(dau) AS BIGINT) AS sdau,
        |    CAST(count(*) AS BIGINT) AS ndays FROM dau GROUP BY month)
        |SELECT da.month, mau.mau, da.ndays,
        |  CAST(da.sdau * 1000 // da.ndays AS BIGINT) AS avg_dau_milli,
        |  CAST(da.sdau * 1000000 // (da.ndays * mau.mau) AS BIGINT)
        |    AS stickiness_ppm
        |FROM da JOIN mau ON da.month = mau.month"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dd = events(s, d).select(
        date_format(col("ts"), "yyyy-MM").as("month"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id")
      )
      val dau = dd.groupBy("month", "day").agg(countDistinct("user_id").as("dau"))
      val mau = dd.groupBy("month").agg(countDistinct("user_id").as("mau"))
      val da = dau
        .groupBy("month")
        .agg(sum("dau").cast("long").as("sdau"), count(lit(1)).as("ndays"))
      da.join(mau, "month")
        .select(
          col("month"),
          col("mau"),
          col("ndays"),
          expr("CAST(sdau * 1000 div ndays AS BIGINT)").as("avg_dau_milli"),
          expr("CAST(sdau * 1000000 div (ndays * mau) AS BIGINT)").as("stickiness_ppm")
        )
    },

    // Growth accounting — the monthly active-customer ledger every
    // product-analytics stack reports: each (customer, active-month) pair
    // classifies as new (first month ever), retained (also active the
    // previous month), or resurrected (active before, but not last
    // month); churned counts customers active last month who went
    // silent. The classification needs only a customer-keyed lag over
    // the distinct (customer, month-index) frame — integer month
    // arithmetic, no engine calendar conventions past the initial
    // strftime. Identity new+retained+resurrected = MAU holds by
    // construction and is spec-asserted. One distinct partial agg + one
    // keyed window; scales as active pairs.
    QEntry.sql(
      "q_growth_accounting",
      """WITH am AS (SELECT DISTINCT o_custkey AS ck,
        |    CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
        |      + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS mi
        |  FROM orders),
        |lg AS (SELECT ck, mi,
        |    lag(mi) OVER (PARTITION BY ck ORDER BY mi) AS pmi FROM am),
        |cls AS (SELECT mi,
        |    CASE WHEN pmi IS NULL THEN 'new'
        |         WHEN pmi = mi - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS st FROM lg),
        |act AS (SELECT mi, st, CAST(count(*) AS BIGINT) AS c
        |  FROM cls GROUP BY mi, st),
        |ch AS (SELECT l.mi + 1 AS mi, 'churned' AS st,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT ck, mi,
        |      lead(mi) OVER (PARTITION BY ck ORDER BY mi) AS nmi FROM am) l
        |  WHERE l.nmi IS NULL OR l.nmi > l.mi + 1 GROUP BY l.mi + 1),
        |u AS (SELECT * FROM act UNION ALL SELECT * FROM ch)
        |SELECT CAST(mi // 12 AS BIGINT) || '-' ||
        |    CASE WHEN mi % 12 + 1 < 10 THEN '0' ELSE '' END ||
        |    CAST(mi % 12 + 1 AS BIGINT) AS month, st AS status, c AS n_customers
        |FROM u"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val am = orders(s, d)
        .select(
          col("o_custkey").as("ck"),
          (date_format(col("o_orderdate"), "yyyy").cast("long") * 12
            + date_format(col("o_orderdate"), "MM").cast("long") - 1).as("mi")
        )
        .distinct()
      val wc = Window.partitionBy("ck").orderBy("mi")
      val cls = am
        .withColumn("pmi", lag("mi", 1).over(wc))
        .select(
          col("mi"),
          when(col("pmi").isNull, "new")
            .when(col("pmi") === col("mi") - 1, "retained")
            .otherwise("resurrected")
            .as("st")
        )
      val act = cls.groupBy("mi", "st").agg(count(lit(1)).as("c"))
      val ch = am
        .withColumn("nmi", lead("mi", 1).over(wc))
        .filter(col("nmi").isNull || col("nmi") > col("mi") + 1)
        .groupBy((col("mi") + 1).as("mi"))
        .agg(count(lit(1)).as("c"))
        .select(col("mi"), lit("churned").as("st"), col("c"))
      act
        .unionAll(ch)
        .select(
          concat(
            expr("CAST(mi div 12 AS BIGINT)").cast("string"),
            lit("-"),
            when(col("mi") % 12 + 1 < 10, "0").otherwise(""),
            (col("mi") % 12 + 1).cast("string")
          ).as("month"),
          col("st").as("status"),
          col("c").as("n_customers")
        )
    },

    // Cumulative reach curve: distinct customers ever seen, by month —
    // "running COUNT(DISTINCT)" WITHOUT carrying distinct state down the
    // stream: each customer collapses to a first-seen month (one partial
    // agg), then new-per-month counts take one cumulative window over
    // the ≤ calendar-months frame. The audience-saturation curve next to
    // q_growth_accounting's monthly ledger. All exact BIGINTs.
    QEntry.sql(
      "q_cumulative_reach",
      """WITH fs AS (SELECT o_custkey AS ck,
        |    min(CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
        |      + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1) AS mi
        |  FROM orders GROUP BY o_custkey),
        |nm AS (SELECT mi, CAST(count(*) AS BIGINT) AS new_cust
        |  FROM fs GROUP BY mi)
        |SELECT CAST(mi // 12 AS BIGINT) || '-' ||
        |    CASE WHEN mi % 12 + 1 < 10 THEN '0' ELSE '' END ||
        |    CAST(mi % 12 + 1 AS BIGINT) AS month, new_cust,
        |  CAST(sum(new_cust) OVER (ORDER BY mi ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cumulative_reach
        |FROM nm"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val fs = orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(
          min(
            date_format(col("o_orderdate"), "yyyy").cast("long") * 12
              + date_format(col("o_orderdate"), "MM").cast("long") - 1
          ).as("mi")
        )
      val nm = fs.groupBy("mi").agg(count(lit(1)).as("new_cust"))
      nm.select(
        concat(
          expr("CAST(mi div 12 AS BIGINT)").cast("string"),
          lit("-"),
          when(col("mi") % 12 + 1 < 10, "0").otherwise(""),
          (col("mi") % 12 + 1).cast("string")
        ).as("month"),
        col("new_cust"),
        sum("new_cust")
          .over(
            Window
              .partitionBy(pmod(col("mi"), lit(1)))
              .orderBy("mi")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          )
          .cast("long")
          .as("cumulative_reach")
      )
    },

    // Kaplan-Meier survival of time-to-second-purchase, right-censored at
    // the corpus horizon: S(t) = Π_{u≤t} (n_u − d_u)/n_u over the weekly
    // event table. The fact table reduces to ≤ calendar-weeks rows BEFORE
    // any quadratic work, so the global windows and the one-row list agg
    // are calendar-bounded (the q_theilsen_trend posture). The product is
    // a SEQUENTIAL integer fold seeded at 10¹² — each step the exact
    // identity (acc div n)·(n−d) + ((acc mod n)·(n−d)) div n, which never
    // exceeds max(10¹², n²) < 2⁶³ — replayed per week over a list slice
    // (O(weeks²) on ≤ ~400 encoded BIGINTs). Encoding t·2⁴⁸ + n·2²⁴ + d
    // keeps the fold input one sorted BIGINT list; n < 2²⁴ holds through
    // sf10 (documented bound). Bit-identical cross-engine, no rounding.
    QEntry.sql(
      "q_kaplan_meier", {
        val nx = "((x // 16777216) % 16777216)"
        val dx = "(x % 16777216)"
        s"""WITH o AS (SELECT o_custkey AS ck,
           |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ad,
           |    o_orderkey AS ok FROM orders),
           |r AS (SELECT ck, ad,
           |    row_number() OVER (PARTITION BY ck ORDER BY ad, ok) AS rn FROM o),
           |f AS (SELECT ck, min(CASE WHEN rn = 1 THEN ad END) AS ad1,
           |    min(CASE WHEN rn = 2 THEN ad END) AS ad2
           |  FROM r WHERE rn <= 2 GROUP BY ck),
           |mx AS (SELECT max(ad) AS m FROM o),
           |ev AS (SELECT CASE WHEN f.ad2 IS NOT NULL THEN (f.ad2 - f.ad1) // 7
           |      ELSE (mx.m - f.ad1) // 7 END AS t,
           |    CASE WHEN f.ad2 IS NOT NULL THEN 1 ELSE 0 END AS e
           |  FROM f CROSS JOIN mx),
           |wk AS (SELECT t, CAST(sum(e) AS BIGINT) AS d,
           |    CAST(count(*) AS BIGINT) AS m FROM ev GROUP BY t),
           |rk AS (SELECT t, d,
           |    CAST(sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS n,
           |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS k FROM wk),
           |ar AS (SELECT list_sort(list(t * 281474976710656 + n * 16777216 + d))
           |    AS arr FROM rk)
           |SELECT rk.t AS t_week, rk.n AS n_risk, rk.d AS d_events,
           |  list_reduce(
           |    list_prepend(CAST(1000000000000 AS BIGINT), list_slice(ar.arr, 1, rk.k)),
           |    (acc, x) -> (acc // $nx) * ($nx - $dx)
           |      + ((acc % $nx) * ($nx - $dx)) // $nx) AS surv_e12
           |FROM rk CROSS JOIN ar""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val nx = "((x div 16777216) % 16777216)"
      val dx = "(x % 16777216)"
      val o = orders(s, d).select(
        col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("ad"),
        col("o_orderkey").as("ok")
      )
      val r = o
        .withColumn("rn", row_number().over(Window.partitionBy("ck").orderBy("ad", "ok")))
        .filter(col("rn") <= 2)
      val f = r
        .groupBy("ck")
        .agg(
          min(when(col("rn") === 1, col("ad"))).as("ad1"),
          min(when(col("rn") === 2, col("ad"))).as("ad2")
        )
      val mx = o.agg(max("ad").as("m"))
      val ev = f
        .crossJoin(broadcast(mx))
        .select(
          when(col("ad2").isNotNull, expr("(ad2 - ad1) div 7"))
            .otherwise(expr("(m - ad1) div 7"))
            .as("t"),
          when(col("ad2").isNotNull, 1L).otherwise(0L).as("e")
        )
      val wk = ev.groupBy("t").agg(sum("e").cast("long").as("d"), count(lit(1)).as("m"))
      val one = pmod(col("t"), lit(1)) // single-partition key for the calendar-sized frame
      val rk = wk.select(
        col("t"),
        col("d"),
        sum("m")
          .over(
            Window
              .partitionBy(one)
              .orderBy(col("t").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          )
          .cast("long")
          .as("n"),
        row_number().over(Window.partitionBy(one).orderBy("t")).cast("long").as("k")
      )
      val ar = rk.agg(
        sort_array(
          collect_list(col("t") * lit(281474976710656L) + col("n") * 16777216L + col("d"))
        ).as("arr")
      )
      rk.crossJoin(broadcast(ar))
        .select(
          col("t").as("t_week"),
          col("n").as("n_risk"),
          col("d").as("d_events"),
          expr(
            s"aggregate(slice(arr, 1, k), CAST(1000000000000 AS BIGINT)," +
              s" (acc, x) -> (acc div $nx) * ($nx - $dx)" +
              s" + ((acc % $nx) * ($nx - $dx)) div $nx)"
          ).as("surv_e12")
        )
    },

    // E391 Nelson-Aalen cumulative hazard: the SUM-form survival estimator
    // beside q_kaplan_meier's product-limit (H(t) = Σ d_i/n_i — preferred
    // when hazards are the modeling target and the basis of every
    // Cox-model baseline; −ln S_KM ≈ H, so the pair cross-checks). Same
    // repeat-purchase risk table (weeks to second order, censored at the
    // horizon); the per-week hazard is an exact ppm integral division and
    // the cumulative sum runs over the calendar-sized week table.
    QEntry.sql(
      "q_nelson_aalen",
      s"""WITH o AS (SELECT o_custkey AS ck,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ad,
         |    o_orderkey AS ok FROM orders),
         |r AS (SELECT ck, ad,
         |    row_number() OVER (PARTITION BY ck ORDER BY ad, ok) AS rn FROM o),
         |f AS (SELECT ck, min(CASE WHEN rn = 1 THEN ad END) AS ad1,
         |    min(CASE WHEN rn = 2 THEN ad END) AS ad2
         |  FROM r WHERE rn <= 2 GROUP BY ck),
         |mx AS (SELECT max(ad) AS m FROM o),
         |ev AS (SELECT CASE WHEN f.ad2 IS NOT NULL THEN (f.ad2 - f.ad1) // 7
         |      ELSE (mx.m - f.ad1) // 7 END AS t,
         |    CASE WHEN f.ad2 IS NOT NULL THEN 1 ELSE 0 END AS e
         |  FROM f CROSS JOIN mx),
         |wk AS (SELECT t, CAST(sum(e) AS BIGINT) AS d,
         |    CAST(count(*) AS BIGINT) AS m FROM ev GROUP BY t),
         |rk AS (SELECT t, d,
         |    CAST(sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS n FROM wk),
         |hz AS (SELECT t, d, n, CAST(d * 1000000 // n AS BIGINT) AS h_ppm FROM rk)
         |SELECT t AS t_week, n AS n_risk, d AS d_events, h_ppm,
         |  CAST(sum(h_ppm) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS cum_hazard_ppm
         |FROM hz""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d).select(
        col("o_custkey").as("ck"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("ad"),
        col("o_orderkey").as("ok")
      )
      val r = o
        .withColumn("rn", row_number().over(Window.partitionBy("ck").orderBy("ad", "ok")))
        .filter(col("rn") <= 2)
      val f = r
        .groupBy("ck")
        .agg(
          min(when(col("rn") === 1, col("ad"))).as("ad1"),
          min(when(col("rn") === 2, col("ad"))).as("ad2")
        )
      val mx = o.agg(max("ad").as("m"))
      val ev = f
        .crossJoin(broadcast(mx))
        .select(
          when(col("ad2").isNotNull, expr("(ad2 - ad1) div 7"))
            .otherwise(expr("(m - ad1) div 7"))
            .as("t"),
          when(col("ad2").isNotNull, 1L).otherwise(0L).as("e")
        )
      val wk = ev.groupBy("t").agg(sum("e").cast("long").as("d"), count(lit(1)).as("m"))
      val one = pmod(col("t"), lit(1)) // single-partition key, calendar-sized frame
      val rk = wk.select(
        col("t"),
        col("d"),
        sum("m")
          .over(
            Window
              .partitionBy(one)
              .orderBy(col("t").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          )
          .cast("long")
          .as("n")
      )
      rk.withColumn("h_ppm", expr("CAST(d * 1000000 div n AS BIGINT)"))
        .select(
          col("t").as("t_week"),
          col("n").as("n_risk"),
          col("d").as("d_events"),
          col("h_ppm"),
          sum("h_ppm")
            .over(
              Window
                .partitionBy(pmod(col("t"), lit(1)))
                .orderBy("t")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long")
            .as("cum_hazard_ppm")
        )
    },

    // SAX-style symbolic discretization of each nation's monthly-revenue
    // series: every month is mapped to a quartile letter a–d (ntile(4) over
    // exact cent totals, month tie-break → total order, so both engines
    // assign identical tiles) and the letters concatenate in month order
    // into one symbolic word per nation — the alphabet form used for motif
    // mining / symbolic anomaly matching over time series. Shuffles are
    // nation-keyed; the per-key window is calendar-sized (≤ ~80 months)
    // regardless of corpus size, so the shape holds at 100 TB.
    QEntry.sql(
      "q_sax_symbols",
      """WITH m AS (
        |  SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, month),
        |t AS (SELECT n_name, month,
        |    ntile(4) OVER (PARTITION BY n_name ORDER BY cents, month) AS tile
        |  FROM m)
        |SELECT n_name, string_agg(chr(CAST(96 + tile AS INT)), '' ORDER BY month) AS sax
        |FROM t GROUP BY n_name""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val monthly = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(
          col("n_name"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month")
        )
        .agg(
          sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
            .cast("bigint")
            .as("cents")
        )
      val tile = ntile(4).over(
        Window.partitionBy("n_name").orderBy(col("cents"), col("month"))
      )
      monthly
        .withColumn("tile", tile)
        .select(col("n_name"), col("month"), expr("char(96 + tile)").as("letter"))
        .groupBy("n_name")
        .agg(
          expr(
            "array_join(transform(sort_array(collect_list(struct(month, letter)))," +
              " x -> x.letter), '')"
          ).as("sax")
        )
    },

    // Customer–customer Jaccard similarity on distinct purchased parts —
    // the pair-similarity primitive behind collaborative filtering and
    // record blocking, formulated the scalable way: candidate pairs come
    // from a PART-keyed equi-join (never an all-pairs product) with a
    // frequency cap (parts held by > 50 customers are dropped, exactly the
    // stop-word cut MinHash banding literature applies) that bounds fan-out
    // per part at 50²/2 rows independent of corpus size. Jaccard is exact
    // integer ppm: |A∩B|·10⁶ // (|A|+|B|−|A∩B|); top-100 by (ppm, pair) is
    // a total order, TakeOrdered on the Spark side.
    QEntry.sql(
      "q_jaccard_customer_pairs",
      """WITH lp AS (
        |  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |pc AS (SELECT pk FROM lp GROUP BY pk HAVING count(*) <= 50),
        |lpf AS (SELECT ck, lp.pk FROM lp JOIN pc ON lp.pk = pc.pk),
        |sz AS (SELECT ck, CAST(count(*) AS BIGINT) AS n FROM lpf GROUP BY ck),
        |pairs AS (
        |  SELECT a.ck AS ca, b.ck AS cb, CAST(count(*) AS BIGINT) AS shared
        |  FROM lpf a JOIN lpf b ON a.pk = b.pk AND a.ck < b.ck
        |  GROUP BY ca, cb HAVING count(*) >= 3)
        |SELECT ca, cb, shared,
        |  CAST(shared * 1000000 // (sa.n + sb.n - shared) AS BIGINT) AS jaccard_ppm
        |FROM pairs JOIN sz sa ON ca = sa.ck JOIN sz sb ON cb = sb.ck
        |ORDER BY jaccard_ppm DESC, ca, cb LIMIT 100"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val lp = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .distinct()
      val pc = lp.groupBy("pk").agg(count(lit(1)).as("_c")).filter(col("_c") <= 50).select("pk")
      val lpf = lp.join(pc, "pk").localCheckpoint() // scanned by sz + both join sides
      val sz = lpf.groupBy("ck").agg(count(lit(1)).as("n"))
      val pairs = lpf
        .toDF("pk", "ca")
        .join(lpf.toDF("pk", "cb"), "pk")
        .filter(col("ca") < col("cb"))
        .groupBy("ca", "cb")
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
      pairs
        .join(sz.toDF("ca", "na"), "ca")
        .join(sz.toDF("cb", "nb"), "cb")
        .select(
          col("ca"),
          col("cb"),
          col("shared"),
          expr("shared * 1000000 div (na + nb - shared)").as("jaccard_ppm")
        )
        .orderBy(col("jaccard_ppm").desc, col("ca"), col("cb"))
        .limit(100)
    }
  )
}
