package graft.queries

import org.apache.spark.sql.functions._

import graft.RangeBuckets
import graft.Tables._
import graft.operators.Fragmentation
import graft.operators.FragmentEngine.bucketExpr

/** Fragmentation-parity inventory (SURVEY.md §2.1) re-expressed over the
  * driver's TPC-H-ish testdata: `lineitem` stands in for `ratings` with
  * `l_orderkey→userid, l_partkey→movieid, l_quantity→rating` and the rating
  * domain [0, 50] fixed-width-bucketed exactly like the reference's
  * `rangePartition` (reference `Interface1.py:122-137`: bucket 0 closed-closed,
  * bucket i>0 open-closed, boundary value → lower bucket).
  *
  * Scale notes: bucket assignment is a narrow codegen'd `when`-chain (one
  * distributed pass, no shuffle — vs the reference's O(n·rows) driver loop);
  * the round-robin oracle's global `row_number()` window is the reference's
  * *semantic* (load-order mod n) and is inherently a total order — production
  * path uses `zipWithIndex` at load (see FragmentEngine.loadRatings), these
  * entries only recompute the oracle's assignment for verification.
  */
object FragQueries {
  private val B5 = RangeBuckets(5, 0.0, 50.0)

  /** DuckDB CASE expression mirroring the reference bucket rule for [0,50]/n=5
    * — bounds are exact binary doubles here, so the accumulated-float subtlety
    * (SURVEY §7.4.1) cannot diverge.
    */
  private val bucketSql =
    """CASE WHEN l_quantity >= 0.0 AND l_quantity <= 10.0 THEN 0
      |     WHEN l_quantity > 10.0 AND l_quantity <= 20.0 THEN 1
      |     WHEN l_quantity > 20.0 AND l_quantity <= 30.0 THEN 2
      |     WHEN l_quantity > 30.0 AND l_quantity <= 40.0 THEN 3
      |     WHEN l_quantity > 40.0 AND l_quantity <= 50.0 THEN 4
      |END""".stripMargin.replaceAll("\\s+", " ")

  val entries: Seq[QEntry] = Seq(
    // loadRatings analog: scan + 3-column projection (timestamp-ish columns
    // dropped at load — reference Interface1.py:29-30). Column pruning reaches
    // the parquet scan: only 3 of 11 lineitem columns are read.
    QEntry.sql(
      "frag_load_project",
      "SELECT l_orderkey AS userid, l_partkey AS movieid, l_quantity AS rating FROM lineitem"
    ) { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey").as("userid"),
        col("l_partkey").as("movieid"),
        col("l_quantity").as("rating")
      )
    },

    // rangePartition: fixed-width bucket assignment + per-fragment cardinality
    // (the invariant the reference's count oracle checks, testHelper1.py:59-82).
    QEntry.sql(
      "frag_range_assign_counts",
      s"SELECT $bucketSql AS part, count(*) AS cnt FROM lineitem GROUP BY 1"
    ) { (s, d) =>
      lineitem(s, d)
        .withColumn("part", bucketExpr(B5, col("l_quantity")))
        .groupBy("part")
        .agg(count(lit(1)).as("cnt"))
    },

    // roundRobinPartition: row k (0-based, load order) → fragment k mod n.
    // Load order here = the deterministic (l_orderkey, l_linenumber) key.
    // The oracle DEFINES the assignment with a global row_number; the Spark
    // side computes the same total order via the two-phase rank (parallel
    // range-partitioned sort + per-partition count offsets) — no
    // single-reducer window anywhere in the plan.
    QEntry.sql(
      "frag_rr_assign_counts",
      """SELECT part, count(*) AS cnt FROM (
        |  SELECT (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) % 7 AS part
        |  FROM lineitem) t GROUP BY part""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Fragmentation
        .roundRobinFragment(lineitem(s, d), Seq("l_orderkey", "l_linenumber"), 7)
        .select(col("part").cast("bigint").as("part"))
        .groupBy("part")
        .agg(count(lit(1)).as("cnt"))
    },

    // rangeQuery: between-filter over the fragmented domain + the reference's
    // literal fragment-name projection (SELECT '{table}', * — Interface1.py:281).
    // The part filter is implied by the rating filter (assignment is a function
    // of rating), matching the selectMode pruning semantics.
    QEntry.sql(
      "frag_range_query",
      s"""SELECT 'range_lineitem_part' || CAST(part AS VARCHAR) AS tablename,
         |       userid, movieid, rating FROM (
         |  SELECT $bucketSql AS part, l_orderkey AS userid, l_partkey AS movieid,
         |         l_quantity AS rating
         |  FROM lineitem WHERE l_quantity >= 10.5 AND l_quantity <= 30.5) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") >= 10.5 && col("l_quantity") <= 30.5)
        .withColumn("part", bucketExpr(B5, col("l_quantity")))
        .select(
          concat(lit("range_lineitem_part"), col("part").cast("string")).as("tablename"),
          col("l_orderkey").as("userid"),
          col("l_partkey").as("movieid"),
          col("l_quantity").as("rating")
        )
    },

    // pointQuery: float equality prunes to exactly one range fragment.
    QEntry.sql(
      "frag_point_query",
      s"""SELECT 'range_lineitem_part' || CAST(part AS VARCHAR) AS tablename,
         |       userid, movieid, rating FROM (
         |  SELECT $bucketSql AS part, l_orderkey AS userid, l_partkey AS movieid,
         |         l_quantity AS rating
         |  FROM lineitem WHERE l_quantity = 25.0) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") === 25.0)
        .withColumn("part", bucketExpr(B5, col("l_quantity")))
        .select(
          concat(lit("range_lineitem_part"), col("part").cast("string")).as("tablename"),
          col("l_orderkey").as("userid"),
          col("l_partkey").as("movieid"),
          col("l_quantity").as("rating")
        )
    },

    // Fragmentation correctness triple (completeness/disjointness/
    // reconstruction — testHelper1.py:116-150): UNION ALL of all fragments
    // must have exactly the master cardinality.
    QEntry.sql(
      "frag_reconstruction",
      s"""SELECT (SELECT count(*) FROM lineitem) AS master_cnt, count(*) AS union_cnt
         |FROM (SELECT $bucketSql AS part FROM lineitem) t WHERE part IS NOT NULL"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val li = lineitem(s, d)
      val parts = (0 until B5.n)
        .map(i => li.filter(bucketExpr(B5, col("l_quantity")) === i))
        .reduce(_ union _)
      li.agg(count(lit(1)).as("master_cnt"))
        .crossJoin(parts.agg(count(lit(1)).as("union_cnt")))
    },

    // rangeInsert routing: the bucket every possible rating value routes to
    // (reference Interface1.py:238-247 recomputes interval and scans buckets).
    QEntry.sql(
      "frag_insert_route",
      s"SELECT DISTINCT l_quantity AS rating, $bucketSql AS part FROM lineitem"
    ) { (s, d) =>
      lineitem(s, d)
        .select(col("l_quantity").as("rating"))
        .distinct()
        .withColumn("part", bucketExpr(B5, col("rating")))
    },

    // Generalized fragmentation (extension): hash scheme — md5-derived
    // bucket, engine-portable, the default co-location scheme for big joins.
    QEntry.sql(
      "frag_hash_assign_counts",
      """SELECT CAST(list_sum(list_transform(range(1, 9), i ->
        |  (strpos('0123456789abcdef',
        |          substr(md5(CAST(l_orderkey AS VARCHAR)), CAST(i AS INT), 1)) - 1)
        |  * pow(16, 8 - i))) AS BIGINT) % 5 AS part, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      Fragmentation
        .hashFragment(lineitem(s, d), "l_orderkey", 5)
        .groupBy(col("part").cast("bigint").as("part"))
        .agg(count(lit(1)).as("cnt"))
    },

    // Generalized fragmentation (extension): range scheme over a
    // data-derived domain (closed-form width bucket, IEEE-identical across
    // engines), vs the reference's hard-coded [0,5].
    QEntry.sql(
      "frag_range_auto_counts",
      """SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 8)), 7) AS INT) AS part,
        |  count(*) AS cnt
        |FROM lineitem, (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |                FROM lineitem) b
        |GROUP BY 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val (fragged, _) = Fragmentation.rangeFragmentAuto(lineitem(s, d), "l_extendedprice", 8)
      fragged.groupBy("part").agg(count(lit(1)).as("cnt"))
    }
  )
}
