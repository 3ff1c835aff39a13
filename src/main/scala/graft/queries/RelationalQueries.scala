package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{AsOfJoin, Bucketing, Dedup, Fragmentation, SemiReduce, SkewJoin, Skyline, ZOrder}

/** SQL-operator inventory (SURVEY.md §2.3) plus the general analytics layer a
  * complete engine needs: scans, literal projection, range/equality
  * predicates, sort, top-k, count, group-by aggregation, distinct, union all,
  * window functions, modulo arithmetic, broadcast + shuffle + semi + anti
  * joins, date-range pushdown, JSON field extraction, and time-bucketed event
  * aggregation.
  *
  * Scale posture per entry is noted inline; PlanQualitySpec asserts the
  * plan-shape claims (pushed filters, broadcast exchange, partial aggregation).
  */
object RelationalQueries {

  val entries: Seq[QEntry] = Seq(
    // Top-k: sort + limit with a unique tiebreaker (deterministic across
    // engines). Spark executes as TakeOrderedAndProject — no global sort
    // materialization, O(k) per partition then driver-side merge: the only
    // sane global-sort shape at 100 TB.
    QEntry.sql(
      "q_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // E354 aggregate materialized-view rewrite ([[graft.plans.MvRewrite]] +
    // the injected MvRewriteRule): a (returnflag, linestatus) SUM/COUNT
    // rollup is materialized once, then a returnflag-only query is
    // REWRITTEN by the optimizer to re-aggregate the 6-row MV — the entry
    // asserts the rewrite actually fired (physical plan reads the MV path,
    // not the fact table) and the oracle checks the rewritten answer
    // against DuckDB's scan of the BASE data: the strongest possible
    // "rewrite is invisible" claim. The fact table is a private temp copy
    // so the registry can't leak into other entries' plans; sums are over
    // integral-valued l_quantity, so sum-of-sums is order-exact.
    QEntry.sql(
      "q_mv_rewrite",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq").toString
      val fact = s"$dir/fact.parquet"
      lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.register(s, defn)
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).cast("long").as("n_rows"))
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "MV rewrite did not fire — the entry would silently test a plain aggregate"
      )
      out
    },

    // E355 MIN/MAX/AVG derivability through the MV rewrite: the rollup
    // additionally materializes per-group min/max, so min-of-min /
    // max-of-max re-aggregation is exact, and AVG re-derives as
    // total-sum ÷ total-count (bit-exact here — l_quantity is integral, so
    // every sum is an exact double). Same private-fact-copy discipline as
    // q_mv_rewrite; the oracle recomputes all four aggregates from the BASE
    // rows, so a wrong derivation cannot hash-match.
    QEntry.sql(
      "q_mv_rewrite_minmax",
      """SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq2").toString
      val fact = s"$dir/fact.parquet"
      lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        // AVG's denominator: the materialized NON-NULL count of the measure
        // itself (COUNT(*) never substitutes — it overcounts null measures)
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.register(s, defn)
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          avg("l_quantity").as("avg_qty"),
          sum("l_quantity").as("sum_qty")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "MV min/max/avg rewrite did not fire"
      )
      out
    },

    // E356 grouping-column filter pushdown through the MV rewrite: a
    // predicate over MV grouping columns commutes with the rollup
    // (filtering base rows by group key ≡ filtering MV rows by the same
    // key), so the filtered dashboard tile STILL never touches the fact
    // table — l_linestatus is an MV grouping column that is absent from the
    // query's own grouping. The oracle applies the same predicate to the
    // base rows.
    QEntry.sql(
      "q_mv_rewrite_filter",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq3").toString
      val fact = s"$dir/fact.parquet"
      lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.register(s, defn)
      val out = s.read
        .parquet(fact)
        .filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).cast("long").as("n_rows"))
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "MV filter-pushdown rewrite did not fire"
      )
      out
    },

    // E355 continuation — COUNT(col) derivability: the rollup materializes a
    // per-group NON-NULL count of a genuinely nullable measure (qty_hi is
    // NULL for quantities ≤ 25), so sum-of-counts re-aggregation preserves
    // COUNT(col) semantics exactly; substituting COUNT(*) would overcount
    // and hash-mismatch — the oracle recomputes both counts from BASE rows,
    // and n_hi < n_rows in every group makes the distinction observable.
    QEntry.sql(
      "q_mv_rewrite_countcol",
      """SELECT l_returnflag,
        |  CAST(count(CASE WHEN l_quantity > 25 THEN l_quantity END) AS BIGINT) AS n_hi,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq4").toString
      val fact = s"$dir/fact.parquet"
      lineitem(s, d)
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          when(col("l_quantity") > 25, col("l_quantity")).as("qty_hi")
        )
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map.empty,
        Some("cnt"),
        counts = Map("cnt_hi" -> "qty_hi")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.register(s, defn)
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(count(col("qty_hi")).as("n_hi"), count(lit(1)).cast("long").as("n_rows"))
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "MV COUNT(col) rewrite did not fire"
      )
      out
    },

    // E366 incremental MV refresh: the base table is APPENDED to after the
    // MV was persisted (a new slice of lineitem lands as new parquet files
    // under the same directory — the old part files untouched), and
    // loadCatalog, instead of dropping the now-stale MV, detects the
    // append-only churn from its per-file manifest and REFRESHES it by
    // aggregating the appended files alone and merging into the old rollup
    // (sums/counts add, mins min, maxs max — O(delta), never the fact
    // table). The dashboard tile survives ingest. The oracle recomputes the
    // full aggregate over base ∪ appended slice, so a refresh that missed
    // rows, double-counted the old files, or broke the merge algebra
    // hash-mismatches.
    QEntry.sql(
      "q_mv_incremental",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty, CAST(count(*) AS BIGINT) AS n_rows
        |FROM (SELECT l_returnflag, l_quantity FROM lineitem
        |      UNION ALL SELECT l_returnflag, l_quantity FROM lineitem
        |      WHERE l_orderkey % 7 = 0)
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq5").toString
      val fact = s"$dir/fact.parquet"
      val cat = s"$dir/mvcatalog"
      lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.persist(s, cat, defn)
      // ingest: a new slice appends as NEW part files
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("append").parquet(fact)
      val loaded = graft.plans.MvRewrite.loadCatalog(s, cat)
      require(loaded.map(_.mvPath).contains(s"$dir/mv.parquet"),
        "append-only refresh did not re-register the MV")
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).cast("long").as("n_rows")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "refreshed MV rewrite did not fire"
      )
      out
    },

    // E399 delete-only MV refresh: retention expiry removes the appended
    // slice's parquet files AFTER the MV was persisted over base ∪ slice;
    // loadCatalog classifies the churn as delete-only (every survivor
    // byte+mtime identical) and REBUILDS the rollup from the per-file
    // partial-aggregate sidecar of the SURVIVING files — O(files×groups),
    // never the fact table, and exact for MIN/MAX because the sidecar holds
    // per-file extrema (no retraction). The dashboard tile survives TTL
    // cleanup the way q_mv_incremental shows it surviving ingest. The
    // oracle recomputes the aggregate over exactly the surviving slice, so
    // a refresh that kept deleted rows, dropped surviving ones, or broke
    // the partial re-merge hash-mismatches.
    QEntry.sql(
      "q_mv_incremental_delete",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty, CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_orderkey % 7 <> 0
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq6").toString
      val fact = s"$dir/fact.parquet"
      val cat = s"$dir/mvcatalog"
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(s.sessionState.newHadoopConf())
      val factPath = new org.apache.hadoop.fs.Path(fact)
      def dataFiles(): Set[String] = fs.listStatus(factPath).iterator
        .map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .map(_.toString).toSet
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 =!= 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val keepers = dataFiles()
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("append").parquet(fact)
      val expiring = dataFiles() -- keepers
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.persist(s, cat, defn)
      // retention expiry: the second slice's files age out
      expiring.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
      val loaded = graft.plans.MvRewrite.loadCatalog(s, cat)
      require(loaded.map(_.mvPath).contains(s"$dir/mv.parquet"),
        "delete-only refresh did not re-register the MV")
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).cast("long").as("n_rows")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "refreshed MV rewrite did not fire after delete-only churn"
      )
      out
    },

    // E406 mixed-churn MV refresh — the real retention+ingest epoch: ONE
    // churn removes the expiring slice's files AND lands a new slice's
    // files, every survivor byte+mtime identical. loadCatalog composes the
    // two incremental paths (prune the per-file sidecar to survivors and
    // rebuild the rollup from their partials — E399's delete half — then
    // fold the appended files' delta in and append their partials — E366's
    // append half), so the MV survives the churn class that used to drop
    // it, still O(files×groups + delta), never the fact table. The oracle
    // recomputes the aggregate over exactly (survivors ∪ new slice), so a
    // refresh that kept expired rows, missed appended ones, or broke the
    // compose order hash-mismatches.
    QEntry.sql(
      "q_mv_incremental_mixed",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty, CAST(count(*) AS BIGINT) AS n_rows
        |FROM (SELECT l_returnflag, l_quantity FROM lineitem WHERE l_orderkey % 7 <> 0
        |      UNION ALL SELECT l_returnflag, l_quantity FROM lineitem
        |      WHERE l_orderkey % 5 = 0)
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq7").toString
      val fact = s"$dir/fact.parquet"
      val cat = s"$dir/mvcatalog"
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(s.sessionState.newHadoopConf())
      val factPath = new org.apache.hadoop.fs.Path(fact)
      def dataFiles(): Set[String] = fs.listStatus(factPath).iterator
        .map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .map(_.toString).toSet
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 =!= 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val keepers = dataFiles()
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("append").parquet(fact)
      val expiring = dataFiles() -- keepers
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.persist(s, cat, defn)
      // ONE churn epoch: retention expires the second slice while ingest
      // lands a third — removed AND added files in the same manifest diff
      expiring.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
      lineitem(s, d)
        .filter(col("l_orderkey") % 5 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("append").parquet(fact)
      val loaded = graft.plans.MvRewrite.loadCatalog(s, cat)
      require(loaded.map(_.mvPath).contains(s"$dir/mv.parquet"),
        "mixed-churn refresh did not re-register the MV")
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).cast("long").as("n_rows")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "refreshed MV rewrite did not fire after mixed churn"
      )
      out
    },

    // E422 compaction-aware MV refresh: the base directory is rewritten by
    // the engine's OWN small-file compaction (every data file replaced,
    // rows provably identical — the in-directory compaction manifest
    // records the replaced/produced names and a content stat that
    // loadCatalog re-verifies over the produced files). The churn class
    // that used to DROP the MV (full-file-set replacement fails every
    // listing-diff check) now remaps the per-file sidecar over the
    // produced files and keeps the rollup untouched (the follow-up
    // delete-churn that refreshes FROM the remapped sidecar is pinned in
    // MvCompactionSpec — file boundaries aren't SQL-expressible). The
    // oracle recomputes the aggregate over the slice, so a refresh that
    // lost rows or broke the rollup hash-mismatches; the plan `require`
    // proves the MV (not a direct scan) answered.
    QEntry.sql(
      "q_mv_compaction_refresh",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_orderkey % 3 = 0
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq8").toString
      val fact = s"$dir/fact.parquet"
      val cat = s"$dir/mvcatalog"
      lineitem(s, d)
        .filter(col("l_orderkey") % 3 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .repartition(6) // several small files for the compaction to merge
        .write.mode("overwrite").parquet(fact)
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.persist(s, cat, defn)
      // the engine's own compaction rewrites the WHOLE file set
      val (nBefore, nAfter) =
        graft.operators.Compaction.compactParquet(s, fact, targetBytes = 1L << 30)
      require(nBefore > nAfter, s"compaction must merge files ($nBefore -> $nAfter)")
      val loaded = graft.plans.MvRewrite.loadCatalog(s, cat)
      require(loaded.map(_.mvPath).contains(s"$dir/mv.parquet"),
        "compaction epoch did not re-register the MV (sidecar remap failed)")
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          count(lit(1)).cast("long").as("n_rows")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "MV rewrite did not fire after the compaction refresh"
      )
      out
    },

    // E408 MV sidecar BACKFILL, end-to-end: an MV persisted WITHOUT the
    // per-file partial-agg sidecar (the pre-E399 layout — simulated by
    // deleting the `<mv>_files` dir the modern build writes) would drop on
    // any delete churn. The one-time backfill — a single base scan grouped
    // by input_file_name(), run while the MV is fresh — retrofits the
    // sidecar, after which the SAME retention expiry that used to drop the
    // MV refreshes it incrementally. The oracle recomputes the aggregate
    // over exactly the surviving slice, so a backfill that recorded wrong
    // partials (or a refresh that trusted a stale one) hash-mismatches.
    QEntry.sql(
      "q_mv_backfill_refresh",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  avg(l_quantity) AS avg_qty, CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_orderkey % 7 <> 0
        |GROUP BY l_returnflag""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvq8").toString
      val fact = s"$dir/fact.parquet"
      val cat = s"$dir/mvcatalog"
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(s.sessionState.newHadoopConf())
      val factPath = new org.apache.hadoop.fs.Path(fact)
      def dataFiles(): Set[String] = fs.listStatus(factPath).iterator
        .map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .map(_.toString).toSet
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 =!= 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").parquet(fact)
      val keepers = dataFiles()
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("append").parquet(fact)
      val expiring = dataFiles() -- keepers
      val defn = graft.plans.MvRewrite.MvDef(
        fact,
        s"$dir/mv.parquet",
        Seq("l_returnflag", "l_linestatus"),
        Map("sum_qty" -> "l_quantity"),
        Some("cnt"),
        mins = Map("min_qty" -> "l_quantity"),
        maxs = Map("max_qty" -> "l_quantity"),
        counts = Map("cnt_qty" -> "l_quantity")
      )
      graft.plans.MvRewrite.build(s, defn)
      graft.plans.MvRewrite.persist(s, cat, defn)
      // simulate the pre-sidecar layout: the MV exists, its sidecar doesn't
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/mv.parquet_files"), true)
      // the one-time retrofit, run while the MV is still fresh
      graft.plans.MvRewrite.backfillSidecar(s, defn)
      // NOW the churn: retention expires the second slice's files
      expiring.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
      val loaded = graft.plans.MvRewrite.loadCatalog(s, cat)
      require(loaded.map(_.mvPath).contains(s"$dir/mv.parquet"),
        "backfilled MV did not delete-refresh — sidecar retrofit failed")
      val out = s.read
        .parquet(fact)
        .groupBy("l_returnflag")
        .agg(
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).cast("long").as("n_rows")
        )
      require(
        out.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "refreshed MV rewrite did not fire after backfill + delete churn"
      )
      out
    },

    // TPC-H Q1 shape: the canonical scan→partial-agg→shuffle→final-agg. Six
    // groups total, so the shuffle moves ~6 rows per map task regardless of
    // input size — map-side combine is what makes this 100 TB-safe.
    QEntry.sql(
      "q_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt")
        )
    },

    // Star join over two tiny dims — explicitly broadcast: zero shuffle of the
    // fact side, the only viable shape when `customer` is 100 TB-scale.
    QEntry.sql(
      "q_join_broadcast_dims",
      """SELECT r_name, n_name, count(*) AS customers,
        |  round(sum(c_acctbal), 2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("customers"), round(sum("c_acctbal"), 2).as("acctbal"))
    },

    // Fact-fact shuffle join (orders ⋈ lineitem ⋈ broadcast customer-dim
    // path): revenue rollup. AQE handles skew/coalesce at runtime.
    QEntry.sql(
      "q_join_revenue_rollup",
      """SELECT o_orderpriority, l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS line_cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority, l_returnflag"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("line_cnt")
        )
    },

    // Semi join (EXISTS): TPC-H Q4 shape — dedup-free existence check, no
    // row multiplication, safe under skew.
    QEntry.sql(
      "q_semi_join_priority",
      """SELECT o_orderpriority, count(*) AS order_cnt FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |GROUP BY o_orderpriority"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      orders(s, d)
        .join(
          lineitem(s, d).filter(col("l_quantity") > 45).select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_cnt"))
    },

    // Anti join: customers with no orders.
    QEntry.sql(
      "q_anti_join_no_orders",
      """SELECT count(*) AS cnt FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt"))
    },

    // MERGE / CDC upsert (latest-wins): base ∪ updates reduced to one row per
    // key by version. The winner is `max(struct(version, ...))` under a
    // groupBy — partial (map-side) aggregation, so a hot key's update burst
    // collapses before the shuffle; the row_number()-window formulation the
    // twin uses would funnel every version of a key through one reducer.
    QEntry.sql(
      "q_upsert_latest_wins",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
        |         1 AS version
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(version AS INT) AS version
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY version DESC, o_totalprice DESC, o_orderstatus DESC) AS rn
        |      FROM allv) t
        |WHERE rn = 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), lit(0).as("version"))
      val upd = orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1.0).as("o_totalprice"),
          lit(1).as("version")
        )
      base
        .union(upd)
        .groupBy("o_orderkey")
        .agg(max(struct(col("version"), col("o_totalprice"), col("o_orderstatus"))).as("_w"))
        .select(
          col("o_orderkey"),
          col("_w")("o_orderstatus").as("o_orderstatus"),
          col("_w")("o_totalprice").as("o_totalprice"),
          col("_w")("version").as("version")
        )
    },

    // CDC apply incl. tombstones: base ∪ updates ∪ deletes, latest version
    // wins per key, keys whose final operation is a delete disappear. Same
    // partial-aggregated max(struct) shape as q_upsert_latest_wins — a hot
    // key's change burst collapses map-side; no window over the full
    // history. Delete rows carry the base values (no nulls inside the
    // comparison struct, so the cross-engine ordering is total).
    QEntry.sql(
      "q_cdc_apply",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version, 'I' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
        |         1 AS version, 'U' AS op
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |del AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 2 AS version, 'D' AS op
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM upd
        |         UNION ALL SELECT * FROM del)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(version AS INT) AS version
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |        ORDER BY version DESC, op DESC, o_totalprice DESC, o_orderstatus DESC) AS rn
        |      FROM allv) t
        |WHERE rn = 1 AND op <> 'D'""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d)
      val base = o.select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lit(0).as("version"), lit("I").as("op"))
      val upd = o
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1.0).as("o_totalprice"),
          lit(1).as("version"), lit("U").as("op"))
      val del = o
        .filter(col("o_orderkey") % 7 === 0)
        .select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          lit(2).as("version"), lit("D").as("op"))
      base
        .union(upd)
        .union(del)
        .groupBy("o_orderkey")
        .agg(
          max(
            struct(col("version"), col("op"), col("o_totalprice"), col("o_orderstatus"))
          ).as("_w")
        )
        .filter(col("_w")("op") =!= "D")
        .select(
          col("o_orderkey"),
          col("_w")("o_orderstatus").as("o_orderstatus"),
          col("_w")("o_totalprice").as("o_totalprice"),
          col("_w")("version").as("version")
        )
    },

    // Distinct (shuffle-dedup with partial aggregation).
    QEntry.sql(
      "q_distinct_flags",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
    ) { (s, d) => lineitem(s, d).select("l_returnflag", "l_linestatus").distinct() },

    // UNION ALL + count (reconstruction-style concatenation, no dedup).
    QEntry.sql(
      "q_union_all_count",
      """SELECT count(*) AS cnt FROM (
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 49
        |  UNION ALL
        |  SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 400000) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") >= 49)
        .select(col("l_orderkey").as("k"))
        .union(
          orders(s, d).filter(col("o_totalprice") > 400000).select(col("o_orderkey").as("k"))
        )
        .agg(count(lit(1)).as("cnt"))
    },

    // Window function: per-customer top order (row_number partitioned —
    // scales because the window key is the shuffle key; no global sort).
    QEntry.sql(
      "q_window_top_order_per_cust",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },

    // rank() ≤ k with REAL ties (order-year, so whole tie-buckets survive
    // together): per customer, every order in their 2 most recent order
    // years. Exercises the E241 top-k physical operator's rank mode on a
    // driver entry — the tie-bucket heap bounds the shuffle at the k
    // smallest distinct keys plus tie mass instead of WindowExec's full
    // per-key sort; survivor SET is tie-stable, so the hash compare is
    // deterministic (TopKPerKeySpec asserts the plan substitution).
    QEntry.sql(
      "q_window_rank_topk",
      """SELECT o_custkey, o_orderkey, yr, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(rank() OVER (PARTITION BY o_custkey
        |                      ORDER BY year(CAST(o_orderdate AS DATE)) DESC)
        |      AS BIGINT) AS rnk
        |  FROM orders) t WHERE rnk <= 2"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("yr").desc)
      orders(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          year(col("o_orderdate").cast("date")).cast("long").as("yr")
        )
        .withColumn("rnk", rank().over(w).cast("bigint"))
        .filter(col("rnk") <= 2)
    },

    // Date-range predicate — pushed to the parquet scan (row-group min/max
    // skipping); the 100 TB equivalent of the reference's fragment pruning.
    QEntry.sql(
      "q_date_range_revenue",
      """SELECT count(*) AS cnt,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        )
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue")
        )
    },

    // Time-bucketed event aggregation (batch twin of the streaming windowed
    // agg in graft.streaming): tumbling 1h windows, formatted as UTC strings
    // so both engines hash identically.
    QEntry.sql(
      "q_events_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type")
        )
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    },

    // Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    // event lands in exactly 2 overlapping windows (the Generate fans out
    // BEFORE the partial agg, so the shuffle still carries group rows).
    // Both engines bucket on the same epoch-aligned 30-minute grid.
    QEntry.sql(
      "q_hopping_window_counts",
      """SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type, count(*) AS cnt
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
        |             event_type FROM events) t
        |GROUP BY 1, 2""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
          col("event_type"),
          col("cnt")
        )
    },

    // Plain-SQL surface: the same engine through spark.sql over registered
    // views (with graft custom functions installed) — users can bring SQL
    // text instead of the DataFrame API.
    QEntry.sql(
      "q_sql_interface",
      """SELECT n_name, count(*) AS suppliers, round(sum(s_acctbal), 2) AS acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      graft.GraftSQL.sql(
        s,
        d,
        """SELECT n_name, count(*) AS suppliers, round(sum(s_acctbal), 2) AS acctbal
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin
      )
    },

    // Backward as-of join (operator Spark lacks; DuckDB ASOF JOIN oracles
    // it): for every error event, the latest preceding click of the same
    // user. Union-sort-carry composition — one shuffle, no candidate-pair
    // materialization (see graft.operators.AsOfJoin).
    QEntry.sql(
      "q_asof_click_before_error",
      """SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |ON e.user_id = c.user_id AND e.ts >= c.ts"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      AsOfJoin
        .asOfBackward(errors, clicks, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          date_format(col("asof_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts")
        )
    },

    // Forward as-of: each error attached to the NEXT click at-or-after it —
    // the mirror traversal, same one-shuffle plan (DuckDB ASOF with the
    // comparison flipped is the oracle).
    QEntry.sql(
      "q_asof_click_after_error",
      """SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |ON e.user_id = c.user_id AND e.ts <= c.ts"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      AsOfJoin
        .asOfForward(errors, clicks, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          date_format(col("asof_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts")
        )
    },

    // Nearest as-of: each error attached to the CLOSEST click either side
    // (sensor-alignment shape). One-shuffle two-window composition; exact
    // integer microsecond distances; tie → preceding click, equal-timestamp
    // candidates → max click_id (mirrored in the twin's ORDER BY). The
    // DuckDB twin ranks the per-user candidate pairs directly — same rows by
    // construction, quadratic only in the oracle.
    QEntry.sql(
      "q_asof_nearest_click",
      """WITH err AS (SELECT event_id AS error_id, user_id, ts FROM events
        |  WHERE event_type = 'error'),
        |clk AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
        |  WHERE event_type = 'click'),
        |cand AS (SELECT e.error_id, e.user_id, e.ts, c.click_id,
        |    abs(epoch_us(c.cts) - epoch_us(e.ts)) AS dt, epoch_us(c.cts) AS cus
        |  FROM err e JOIN clk c ON e.user_id = c.user_id)
        |SELECT error_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  click_id, CAST(dt AS BIGINT) AS asof_dt_us
        |FROM (SELECT cand.*, row_number() OVER (PARTITION BY error_id
        |        ORDER BY dt, cus, click_id DESC) AS rn FROM cand) t
        |WHERE rn = 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      AsOfJoin
        .asOfNearest(errors, clicks, Seq("user_id"), "ts", "cts", Seq("click_id"))
        .select(
          col("error_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          col("asof_click_id").as("click_id"),
          col("asof_dt_us")
        )
    },

    // Left-outer time-bracket join — the BATCH run of the streaming
    // operator (StreamingOps.timeBracketLeftJoin works on batch frames
    // unchanged; the watermark is a no-op there): every error keeps its
    // clicks in the preceding hour, errors with none emit with nulls — the
    // organic-traffic rows an inner attribution join drops.
    QEntry.sql(
      "q_time_bracket_left_join",
      """SELECT l.event_id AS error_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  r.event_id AS click_id,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
        |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') r
        |ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.streaming.StreamingOps
        .timeBracketLeftJoin(errors, clicks, "user_id", "interval 1 hour")
        .select(
          col("l.event_id").as("error_id"),
          date_format(col("l.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          col("r.event_id").as("click_id"),
          date_format(col("r.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts")
        )
    },

    // E50 inner time-bracket join — the BATCH run of the streaming
    // attribution join (StreamingOps.timeBracketJoin; watermarks are no-ops
    // on batch frames): every (error, click-in-preceding-hour) pair, the
    // state-bounded stream-stream join's exact output on complete data.
    // Same construction as the already-oracled left/full variants — only
    // the join type differs.
    QEntry.sql(
      "q_time_bracket_inner_join",
      """SELECT l.event_id AS error_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  r.event_id AS click_id,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
        |JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') r
        |ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.streaming.StreamingOps
        .timeBracketJoin(errors, clicks, "user_id", "interval 1 hour")
        .select(
          col("l.event_id").as("error_id"),
          date_format(col("l.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          col("r.event_id").as("click_id"),
          date_format(col("r.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts")
        )
    },

    // E21 running totals — the BATCH run of the mapGroupsWithState custom-
    // state operator (on a complete batch each key's iterator folds every
    // row, so the emitted state IS the final per-type total): values fed as
    // integer cents carried in doubles (exact and ORDER-INDEPENDENT under
    // addition below 2^53 — the fold order inside a group iterator is not
    // guaranteed), so the twin is a plain exact group sum.
    QEntry.sql(
      "q_running_totals",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      import s.implicits._
      val evs = events(s, d)
        .select(
          col("ts"),
          col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("bigint").cast("double").as("value")
        )
        .as[graft.streaming.StreamingOps.EventRow]
      graft.streaming.StreamingOps
        .runningTotals(evs)
        .toDF()
        .select(
          col("event_type"),
          col("cnt"),
          col("sum_value").cast("bigint").as("sum_cents")
        )
    },

    // Full-outer time-bracket join — the audit variant: organic errors
    // (no click in the preceding hour) AND dead clicks (no error in the
    // following hour) surface in one result with nulls on the other side.
    // Batch run of StreamingOps.timeBracketFullJoin (the one streaming
    // outer join needing BOTH watermarks); same bounded-state story.
    QEntry.sql(
      "q_time_bracket_full_join",
      """SELECT l.event_id AS error_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |  r.event_id AS click_id,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
        |FULL JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') r
        |ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ev = events(s, d)
      val errors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.streaming.StreamingOps
        .timeBracketFullJoin(errors, clicks, "user_id", "interval 1 hour")
        .select(
          col("l.event_id").as("error_id"),
          date_format(col("l.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          col("r.event_id").as("click_id"),
          date_format(col("r.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts")
        )
    },

    // Approximate sketches, made deterministically oracle-able: the output
    // carries the EXACT statistic (portable) plus a boolean asserting the
    // sketch estimate landed within tolerance — so the DuckDB twin is the
    // exact computation + literal true. Raw sketch estimates stay
    // engine-specific and are additionally accuracy-asserted in
    // PipelineOpsSpec.
    QEntry.sql(
      "q_sketch_distinct_users",
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS approx_within_5pct
        |FROM events GROUP BY event_type""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      // rsd 0.01 → HLL++ stderr ~1%; the 5% gate leaves ~5 sigma of headroom,
      // so the boolean is deterministic-in-practice at any sf.
      // Two-level aggregate, not countDistinct+HLL in one agg: mixing a
      // distinct aggregate with a non-distinct one makes Catalyst Expand
      // every input row; pre-distincting the pairs keeps both levels plain
      // partial-agg shuffles (HLL over distinct ids = HLL over raw ids —
      // duplicate-insensitive by construction).
      events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("_dup"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("_approx")
        )
        .select(
          col("event_type"),
          col("exact_users"),
          (abs(col("_approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_within_5pct")
        )
    },
    QEntry.sql(
      "q_sketch_value_quantiles",
      // Exact interpolated quantiles match Spark's `percentile` definition
      // (linear interpolation at p*(n-1)); one UNION ALL branch per p keeps
      // the quantile parameter constant as DuckDB requires.
      Seq(0.5, 0.95, 0.99)
        .map(p =>
          s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
             |  round(quantile_cont(value, $p), 4) AS exact_q,
             |  true AS approx_ok
             |FROM events GROUP BY event_type""".stripMargin.replaceAll("\\s+", " ")
        )
        .mkString(" UNION ALL ")
    ) { (s, d) =>
      // percentile_approx(accuracy=10000) has rank error <= n/10000 — at most
      // a handful of ranks at bench scale — so the estimate sits within a
      // whisker of the exact quantile; assert 5% relative (or 1e-6 absolute
      // for near-zero quantiles) and output rows, never arrays (array-typed
      // outputs crash the driver's pandas sort).
      val ps = array(lit(0.5), lit(0.95), lit(0.99))
      events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("_n"),
          percentile_approx(col("value"), ps, lit(10000)).as("_aq"),
          expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("_eq")
        )
        .select(
          col("event_type"),
          posexplode(col("_eq")).as(Seq("_i", "_exact")),
          col("_aq"),
          col("_n")
        )
        .select(
          col("event_type"),
          element_at(ps, col("_i") + 1).as("p"),
          round(col("_exact"), 4).as("exact_q"),
          // tolerance claim needs TAIL SUPPORT: with (1-p)*n < 2 rows past
          // the quantile, the interpolated exact value and the sketch's
          // actual-data value legitimately differ by the local order-stat
          // gap (>5% on tiny groups) — the check is vacuous there, true by
          // definition, and real from ~200 rows/group up (the verification
          // sf and beyond)
          ((lit(1.0) - element_at(ps, col("_i") + 1)) * col("_n") < 2.0 ||
            abs(element_at(col("_aq"), col("_i") + 1) - col("_exact")) <=
            greatest(abs(col("_exact")) * 0.05, lit(1e-6))).as("approx_ok")
        )
    },

    // Semi-structured extraction: pull an int field out of the JSON props
    // column with a portable regex (codegen'd, no UDF).
    QEntry.sql(
      "q_events_json_extract",
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(
          sum(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("bigint")).as("sum_k"),
          count(lit(1)).as("cnt")
        )
    },

    // Left outer join with null-handling: every customer, with the count of
    // their high-value orders — zero (not absent) for customers with none.
    // count(o_orderkey) counts non-null matches only; the sum coalesces to 0.
    QEntry.sql(
      "q_left_join_order_counts",
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS order_cnt,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS spend
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      customer(s, d)
        .join(
          orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"),
          "left"
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend")
        )
    },

    // Full outer join over partially-overlapping key sets: high-balance
    // customers vs customers with any 350k+ order — rows survive with a null
    // side in BOTH directions (the using-join coalesces the key).
    QEntry.sql(
      "q_full_outer_balance_orders",
      """SELECT coalesce(a.k, b.k) AS custkey, a.acctbal, b.big_orders
        |FROM (SELECT c_custkey AS k, round(c_acctbal, 2) AS acctbal
        |      FROM customer WHERE c_acctbal > 9000) a
        |FULL OUTER JOIN (SELECT o_custkey AS k, count(*) AS big_orders
        |                 FROM orders WHERE o_totalprice > 350000 GROUP BY o_custkey) b
        |ON a.k = b.k"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val rich = customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"), round(col("c_acctbal"), 2).as("acctbal"))
      val spenders = orders(s, d)
        .filter(col("o_totalprice") > 350000)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("big_orders"))
      rich
        .join(spenders, Seq("k"), "full_outer")
        .select(col("k").as("custkey"), col("acctbal"), col("big_orders"))
    },

    // Bucketed co-located fact-fact join: both sides written bucketed+sorted
    // by the join key, so the join needs no Exchange on either side (plan
    // asserted in PlanQualitySpec) — results are identical to the plain join,
    // which is exactly what the twin runs.
    QEntry.sql(
      "q_bucketed_join_rollup",
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val (bo, bl) = Bucketing.coBucket(
        s,
        orders(s, d).select("o_orderkey", "o_orderstatus"),
        lineitem(s, d).select("l_orderkey", "l_quantity"),
        "graft_q_b_orders",
        "graft_q_b_lineitem",
        "o_orderkey",
        "l_orderkey",
        8,
        sourceTag = Some(d)
      )
      bo.join(bl, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
    },

    // Star-schema multi-join rollup (TPC-H Q5 shape): fact ⋈ orders ⋈
    // customer ⋈ nation ⋈ region with two dim broadcasts — exercises join
    // reordering and mixed broadcast/shuffle strategies in one plan.
    QEntry.sql(
      "q_star_join_rollup",
      """SELECT n_name, count(*) AS cnt,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")
        )
    },

    // Z-order (Morton) values — the two-dimensional data-skipping sort key
    // (Delta/Iceberg OPTIMIZE ZORDER BY). Pure bit arithmetic, replayed
    // shift-for-shift by the twin; the layout op itself (range partition +
    // sort by this key) is ZOrder.cluster2, bbox-compactness asserted in
    // PipelineOpsSpec.
    QEntry.sql(
      "q_zorder_values", {
        val terms = (0 until 10)
          .flatMap(i =>
            Seq(
              s"((((o_custkey & 1023) >> $i) & 1) << ${2 * i})",
              s"((((o_orderkey & 1023) >> $i) & 1) << ${2 * i + 1})"
            )
          )
          .mkString(" | ")
        s"SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM orders"
      }
    ) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        graft.operators.ZOrder.zValue2(col("o_custkey"), col("o_orderkey"), 10).as("zval")
      )
    },

    // Zone-map data-skipping audit: per-zone (ingest-order blocks of 4096
    // orderkeys — the file-level granule a lakehouse writes) min/max
    // shipdate stats, then the fraction of zones and rows a 1995 range
    // predicate can prove away WITHOUT reading them — the measured
    // effectiveness of min/max pruning on the actual layout, read before
    // deciding whether a Z-order rewrite (q_zorder_values) pays. Zone key
    // is pure arithmetic on the sort key (no windows, no global sort);
    // state is zone-cardinality.
    QEntry.sql(
      "q_zonemap_prune",
      """WITH z AS (SELECT l_orderkey // 4096 AS zone,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d
        |  FROM lineitem),
        |m AS (SELECT zone, count(*) AS n_rows, min(d) AS min_day, max(d) AS max_day
        |  FROM z GROUP BY zone),
        |lim AS (SELECT date_diff('day', DATE '1970-01-01', DATE '1995-01-01') AS lo,
        |               date_diff('day', DATE '1970-01-01', DATE '1995-12-31') AS hi)
        |SELECT CAST(count(*) AS BIGINT) AS n_zones,
        |  CAST(sum(CASE WHEN max_day < lo OR min_day > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pruned_zones,
        |  CAST(sum(CASE WHEN max_day < lo OR min_day > hi THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS zone_prune_ppm,
        |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN max_day < lo OR min_day > hi THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS skipped_rows,
        |  CAST(sum(CASE WHEN max_day < lo OR min_day > hi THEN n_rows ELSE 0 END)
        |    * 1000000 // sum(n_rows) AS BIGINT) AS row_skip_ppm
        |FROM m CROSS JOIN lim""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val zones = lineitem(s, d)
        .select(
          expr("l_orderkey div 4096").as("zone"),
          datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date")).as("d")
        )
        .groupBy("zone")
        .agg(count(lit(1)).as("n_rows"), min("d").as("min_day"), max("d").as("max_day"))
      val lo = datediff(lit("1995-01-01").cast("date"), lit("1970-01-01").cast("date"))
      val hi = datediff(lit("1995-12-31").cast("date"), lit("1970-01-01").cast("date"))
      val pruned = col("max_day") < lo || col("min_day") > hi
      zones.agg(
        count(lit(1)).cast("long").as("n_zones"),
        sum(when(pruned, 1L).otherwise(0L)).cast("long").as("pruned_zones"),
        sum(col("n_rows")).cast("long").as("n_rows"),
        sum(when(pruned, col("n_rows")).otherwise(0L)).cast("long").as("skipped_rows")
      )
      .withColumn("zone_prune_ppm", expr("pruned_zones * 1000000L div n_zones").cast("long"))
      .withColumn("row_skip_ppm", expr("skipped_rows * 1000000L div n_rows").cast("long"))
      .select("n_zones", "pruned_zones", "zone_prune_ppm", "n_rows", "skipped_rows",
        "row_skip_ppm")
    },

    // E431 per-zone Bloom-filter data skipping ([[BloomSkip]]): the sidecar
    // read zone maps cannot make — l_partkey is uncorrelated with ingest
    // order, so every zone's (min, max) spans the whole part domain and
    // minmax_pruned_zones lands at 0, while the per-zone 1024-bit Bloom
    // prunes the overwhelming majority of zones for the l_partkey = 1 point
    // lookup. false_negative_zones is STRUCTURALLY 0 (a Bloom never drops a
    // member) and the oracle proves it; the twin rebuilds every mask and
    // replays both probe bits md5-digit-for-digit.
    QEntry.sql(
      "q_bloom_zone_skip", {
        def pos(i: Int, key: String) =
          s"""CAST(list_sum(list_transform(range(1, 9), ii ->
             |  (strpos('0123456789abcdef', substr(md5('$i:' || $key),
             |     CAST(ii AS INT), 1)) - 1) * pow(16, 8 - ii))) AS BIGINT) % 1024"""
            .stripMargin
        s"""WITH base AS (SELECT l_orderkey // 32 AS zone, l_partkey AS pk
           |  FROM lineitem),
           |mp AS (SELECT zone, CASE WHEN u.i = 0
           |      THEN ${pos(0, "CAST(pk AS VARCHAR)")}
           |      ELSE ${pos(1, "CAST(pk AS VARCHAR)")} END AS p
           |  FROM base CROSS JOIN (SELECT unnest(range(0, 2)) AS i) u),
           |w AS (SELECT zone, p // 32 AS word,
           |    CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS BIGINT) AS mask
           |  FROM mp GROUP BY zone, p // 32),
           |pr AS (SELECT CASE WHEN u.i = 0 THEN ${pos(0, "'100'")}
           |    ELSE ${pos(1, "'100'")} END AS p
           |  FROM (SELECT unnest(range(0, 2)) AS i) u),
           |hit AS (SELECT w.zone, CAST(sum(CASE WHEN
           |      (w.mask >> CAST(pr.p % 32 AS INT)) & 1 = 1 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS hits
           |  FROM w JOIN pr ON pr.p // 32 = w.word GROUP BY w.zone),
           |surv AS (SELECT zone FROM hit WHERE hits = 2),
           |zs AS (SELECT zone, count(*) AS n_rows, min(pk) AS min_pk,
           |    max(pk) AS max_pk,
           |    CAST(sum(CASE WHEN pk = 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
           |  FROM base GROUP BY zone),
           |j AS (SELECT zs.n_rows, zs.min_pk, zs.max_pk, zs.n_true,
           |    (surv.zone IS NOT NULL) AS kept
           |  FROM zs LEFT JOIN surv ON zs.zone = surv.zone)
           |SELECT CAST(count(*) AS BIGINT) AS n_zones,
           |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
           |    AS bloom_pruned_zones,
           |  CAST(sum(CASE WHEN NOT kept THEN n_rows ELSE 0 END) AS BIGINT)
           |    AS skipped_rows,
           |  CAST(sum(CASE WHEN NOT kept THEN n_rows ELSE 0 END) * 1000000
           |    // sum(n_rows) AS BIGINT) AS row_skip_ppm,
           |  CAST(sum(CASE WHEN n_true > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS true_zones,
           |  CAST(sum(CASE WHEN n_true > 0 AND NOT kept THEN 1 ELSE 0 END)
           |    AS BIGINT) AS false_negative_zones,
           |  CAST(sum(CASE WHEN 100 < min_pk OR 100 > max_pk THEN 1 ELSE 0 END)
           |    AS BIGINT) AS minmax_pruned_zones
           |FROM j""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val base = lineitem(s, d)
        .select(expr("l_orderkey div 32").as("zone"), col("l_partkey").as("pk"))
      val blooms = graft.operators.BloomSkip.buildZoneBlooms(base, "zone", "pk")
      val surv = graft.operators.BloomSkip
        .zonesMaybeContaining(blooms, lit(100L))
        .withColumn("kept", lit(true))
      val zs = base
        .groupBy("zone")
        .agg(
          count(lit(1)).as("n_rows"),
          min("pk").as("min_pk"),
          max("pk").as("max_pk"),
          sum(when(col("pk") === 100L, 1L).otherwise(0L)).cast("long").as("n_true")
        )
      zs.join(surv, Seq("zone"), "left")
        .withColumn("kept", coalesce(col("kept"), lit(false)))
        .agg(
          count(lit(1)).cast("long").as("n_zones"),
          sum("n_rows").cast("long").as("n_rows"),
          sum(when(!col("kept"), 1L).otherwise(0L)).cast("long").as("bloom_pruned_zones"),
          sum(when(!col("kept"), col("n_rows")).otherwise(0L)).cast("long").as("skipped_rows"),
          sum(when(col("n_true") > 0L, 1L).otherwise(0L)).cast("long").as("true_zones"),
          sum(when(col("n_true") > 0L && !col("kept"), 1L).otherwise(0L))
            .cast("long").as("false_negative_zones"),
          sum(when(lit(100L) < col("min_pk") || lit(100L) > col("max_pk"), 1L).otherwise(0L))
            .cast("long").as("minmax_pruned_zones")
        )
        .withColumn("row_skip_ppm", expr("skipped_rows * 1000000L div n_rows").cast("long"))
        .select("n_zones", "n_rows", "bloom_pruned_zones", "skipped_rows", "row_skip_ppm",
          "true_zones", "false_negative_zones", "minmax_pruned_zones")
    },

    // Z-order pruning GAIN — the payoff measurement E240's audit is the
    // read for: the same 1024-row zones + min/max stats + a 2-D box
    // predicate (customer band × order-date band), once on the linear
    // (ingest-order) layout and once on the Morton-clustered layout, in one
    // row. Linear zones span all customers so only the date dimension ever
    // prunes; Z-order zones are compact rectangles in (cx, dy), so BOTH
    // dimensions prune — z_skipped_rows ≥ lin_skipped_rows is the measured
    // case for an OPTIMIZE ZORDER rewrite (the physical rewrite itself is
    // ZOrder.writeClustered, spec-held with a persisted zone-stats sidecar).
    // Both global orders come from the two-phase rank (range-partitioned
    // sort + per-partition offsets) — no single-reducer window; the twin
    // replays the interleave shift-for-shift and the rank as a window.
    QEntry.sql(
      "q_zorder_prune_gain", {
        val terms = (0 until 14)
          .flatMap(i =>
            Seq(
              s"(((cx >> $i) & 1) << ${2 * i})",
              s"(((dy >> $i) & 1) << ${2 * i + 1})"
            )
          )
          .mkString(" | ")
        s"""WITH base AS (SELECT o_orderkey,
           |    (o_custkey & 16383) AS cx,
           |    (date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 16383)
           |      AS dy
           |  FROM orders),
           |zv AS (SELECT o_orderkey, cx, dy, CAST($terms AS BIGINT) AS zval FROM base),
           |lin AS (SELECT ((row_number() OVER (ORDER BY o_orderkey)) - 1) // 1024 AS zone,
           |    cx, dy FROM zv),
           |zz AS (SELECT ((row_number() OVER (ORDER BY zval, o_orderkey)) - 1) // 1024
           |    AS zone, cx, dy FROM zv),
           |lm AS (SELECT zone, count(*) AS n_rows, min(cx) AS min_cx, max(cx) AS max_cx,
           |    min(dy) AS min_dy, max(dy) AS max_dy FROM lin GROUP BY zone),
           |zm AS (SELECT zone, count(*) AS n_rows, min(cx) AS min_cx, max(cx) AS max_cx,
           |    min(dy) AS min_dy, max(dy) AS max_dy FROM zz GROUP BY zone),
           |lr AS (SELECT CAST(count(*) AS BIGINT) AS n_zones,
           |    CAST(sum(n_rows) AS BIGINT) AS n_rows,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN 1 ELSE 0 END) AS BIGINT) AS lin_pruned_zones,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN n_rows ELSE 0 END) AS BIGINT) AS lin_skipped_rows
           |  FROM lm),
           |zr AS (SELECT
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN 1 ELSE 0 END) AS BIGINT) AS z_pruned_zones,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN n_rows ELSE 0 END) AS BIGINT) AS z_skipped_rows
           |  FROM zm)
           |SELECT n_zones, n_rows, lin_pruned_zones, lin_skipped_rows,
           |  CAST(lin_skipped_rows * 1000000 // n_rows AS BIGINT) AS lin_skip_ppm,
           |  z_pruned_zones, z_skipped_rows,
           |  CAST(z_skipped_rows * 1000000 // n_rows AS BIGINT) AS z_skip_ppm
           |FROM lr CROSS JOIN zr""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val base = orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_custkey").bitwiseAND(lit(16383L)).as("cx"),
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long")
            .bitwiseAND(lit(16383L))
            .as("dy")
        )
        .withColumn("zval", ZOrder.zValue2(col("cx"), col("dy"), 14))
      def zoneStats(ord: Seq[String]) =
        Fragmentation
          .globalRowNumber(base, ord, "rn")
          .withColumn("zone", expr("(rn - 1) div 1024"))
          .groupBy("zone")
          .agg(
            count(lit(1)).as("n_rows"),
            min("cx").as("min_cx"),
            max("cx").as("max_cx"),
            min("dy").as("min_dy"),
            max("dy").as("max_dy")
          )
      val pruned = col("max_cx") < 10 || col("min_cx") > 80 ||
        col("max_dy") < 1095 || col("min_dy") > 1460
      val lr = zoneStats(Seq("o_orderkey")).agg(
        count(lit(1)).cast("long").as("n_zones"),
        sum(col("n_rows")).cast("long").as("n_rows"),
        sum(when(pruned, 1L).otherwise(0L)).cast("long").as("lin_pruned_zones"),
        sum(when(pruned, col("n_rows")).otherwise(0L)).cast("long").as("lin_skipped_rows")
      )
      val zr = zoneStats(Seq("zval", "o_orderkey")).agg(
        sum(when(pruned, 1L).otherwise(0L)).cast("long").as("z_pruned_zones"),
        sum(when(pruned, col("n_rows")).otherwise(0L)).cast("long").as("z_skipped_rows")
      )
      lr.crossJoin(zr)
        .withColumn("lin_skip_ppm", expr("lin_skipped_rows * 1000000L div n_rows").cast("long"))
        .withColumn("z_skip_ppm", expr("z_skipped_rows * 1000000L div n_rows").cast("long"))
        .select("n_zones", "n_rows", "lin_pruned_zones", "lin_skipped_rows", "lin_skip_ppm",
          "z_pruned_zones", "z_skipped_rows", "z_skip_ppm")
    },

    // E410 Hilbert-curve values — the locality-optimal sibling of
    // q_zorder_values: the classic xy2d rotate/reflect walk computes the
    // index under which CONSECUTIVE cells are always grid neighbours
    // (Manhattan distance 1 — the property Morton seams break, asserted in
    // HilbertCurveSpec), so equal-count index ranges tile the plane into
    // tighter bounding boxes. One chained projection per bit level, pure
    // CASE/bit arithmetic, no UDF; the twin replays the walk CTE-for-CTE
    // with alternating state names (DuckDB lateral-alias safety).
    QEntry.sql(
      "q_hilbert_values", {
        val chain = graft.operators.HilbertCurve
          .oracleCteChain(10, Seq("o_orderkey"))
        s"""WITH h0 AS (SELECT o_orderkey, (o_custkey & 1023) AS _hx,
           |  (o_orderkey & 1023) AS _hy, CAST(0 AS BIGINT) AS _hd FROM orders)$chain
           |SELECT o_orderkey, CAST(_hd AS BIGINT) AS hval FROM h10"""
          .stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      graft.operators.HilbertCurve
        .withHilbert(
          orders(s, d).select("o_orderkey", "o_custkey"),
          "o_custkey", "o_orderkey", "hval", bits = 10)
        .select(col("o_orderkey"), col("hval").cast("long").as("hval"))
    },

    // E410 Hilbert pruning GAIN over Z-order — the head-to-head that decides
    // which OPTIMIZE layout a 100 TB table should pay for: the same
    // 1024-row zones + min/max stats + 2-D box predicate as
    // q_zorder_prune_gain, once on the Morton-clustered layout and once on
    // the Hilbert-clustered layout, in one row. Hilbert's neighbour-step
    // walk gives zones tighter bounding boxes, so h_skipped_rows ≥
    // z_skipped_rows is the expected (measured, not assumed) outcome. Both
    // global orders come from the two-phase rank — no single-reducer
    // window; the twin replays interleave and walk bit-for-bit.
    QEntry.sql(
      "q_hilbert_prune_gain", {
        val zterms = (0 until 14)
          .flatMap(i =>
            Seq(
              s"(((cx >> $i) & 1) << ${2 * i})",
              s"(((dy >> $i) & 1) << ${2 * i + 1})"
            )
          )
          .mkString(" | ")
        val chain = graft.operators.HilbertCurve
          .oracleCteChain(14, Seq("o_orderkey", "cx", "dy", "zval"))
        s"""WITH base AS (SELECT o_orderkey,
           |    (o_custkey & 16383) AS cx,
           |    (date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 16383)
           |      AS dy
           |  FROM orders),
           |h0 AS (SELECT o_orderkey, cx, dy, CAST($zterms AS BIGINT) AS zval,
           |    cx AS _hx, dy AS _hy, CAST(0 AS BIGINT) AS _hd FROM base)$chain,
           |hv AS (SELECT o_orderkey, cx, dy, zval, _hd AS hval FROM h14),
           |zz AS (SELECT ((row_number() OVER (ORDER BY zval, o_orderkey)) - 1) // 1024
           |    AS zone, cx, dy FROM hv),
           |hh AS (SELECT ((row_number() OVER (ORDER BY hval, o_orderkey)) - 1) // 1024
           |    AS zone, cx, dy FROM hv),
           |zm AS (SELECT zone, count(*) AS n_rows, min(cx) AS min_cx, max(cx) AS max_cx,
           |    min(dy) AS min_dy, max(dy) AS max_dy FROM zz GROUP BY zone),
           |hm AS (SELECT zone, count(*) AS n_rows, min(cx) AS min_cx, max(cx) AS max_cx,
           |    min(dy) AS min_dy, max(dy) AS max_dy FROM hh GROUP BY zone),
           |zr AS (SELECT CAST(count(*) AS BIGINT) AS n_zones,
           |    CAST(sum(n_rows) AS BIGINT) AS n_rows,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN 1 ELSE 0 END) AS BIGINT) AS z_pruned_zones,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN n_rows ELSE 0 END) AS BIGINT) AS z_skipped_rows
           |  FROM zm),
           |hr AS (SELECT
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN 1 ELSE 0 END) AS BIGINT) AS h_pruned_zones,
           |    CAST(sum(CASE WHEN max_cx < 10 OR min_cx > 80 OR max_dy < 1095
           |      OR min_dy > 1460 THEN n_rows ELSE 0 END) AS BIGINT) AS h_skipped_rows
           |  FROM hm)
           |SELECT n_zones, n_rows, z_pruned_zones, z_skipped_rows,
           |  CAST(z_skipped_rows * 1000000 // n_rows AS BIGINT) AS z_skip_ppm,
           |  h_pruned_zones, h_skipped_rows,
           |  CAST(h_skipped_rows * 1000000 // n_rows AS BIGINT) AS h_skip_ppm
           |FROM zr CROSS JOIN hr""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      val base = orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_custkey").bitwiseAND(lit(16383L)).as("cx"),
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long")
            .bitwiseAND(lit(16383L))
            .as("dy")
        )
        .withColumn("zval", ZOrder.zValue2(col("cx"), col("dy"), 14))
      // pin the (zval, hval) frame: BOTH layouts' zone stats consume it, and
      // without the cut each global rank would recompute the 14-level walk
      // and the interleave from the scan (measured 7.9 s → the suite's
      // normal band once shared)
      val hv = graft.operators.HilbertCurve
        .withHilbert(base, "cx", "dy", "hval", bits = 14)
        .localCheckpoint()
      def zoneStats(ord: Seq[String]) =
        Fragmentation
          .globalRowNumber(hv, ord, "rn")
          .withColumn("zone", expr("(rn - 1) div 1024"))
          .groupBy("zone")
          .agg(
            count(lit(1)).as("n_rows"),
            min("cx").as("min_cx"),
            max("cx").as("max_cx"),
            min("dy").as("min_dy"),
            max("dy").as("max_dy")
          )
      val pruned = col("max_cx") < 10 || col("min_cx") > 80 ||
        col("max_dy") < 1095 || col("min_dy") > 1460
      val zr = zoneStats(Seq("zval", "o_orderkey")).agg(
        count(lit(1)).cast("long").as("n_zones"),
        sum(col("n_rows")).cast("long").as("n_rows"),
        sum(when(pruned, 1L).otherwise(0L)).cast("long").as("z_pruned_zones"),
        sum(when(pruned, col("n_rows")).otherwise(0L)).cast("long").as("z_skipped_rows")
      )
      val hr = zoneStats(Seq("hval", "o_orderkey")).agg(
        sum(when(pruned, 1L).otherwise(0L)).cast("long").as("h_pruned_zones"),
        sum(when(pruned, col("n_rows")).otherwise(0L)).cast("long").as("h_skipped_rows")
      )
      zr.crossJoin(hr)
        .withColumn("z_skip_ppm", expr("z_skipped_rows * 1000000L div n_rows").cast("long"))
        .withColumn("h_skip_ppm", expr("h_skipped_rows * 1000000L div n_rows").cast("long"))
        .select("n_zones", "n_rows", "z_pruned_zones", "z_skipped_rows", "z_skip_ppm",
          "h_pruned_zones", "h_skipped_rows", "h_skip_ppm")
    },

    // E293 clustered-layout INGEST: the persisted Z-layout (E252) gains its
    // append path — history is clustered once, two later ingests cluster
    // ONLY THEMSELVES into fresh zone directories and extend the sidecar,
    // and the box query answered through the fragmented layout still
    // matches the plain full-scan filter exactly (zone stats stay true
    // bounds through any append sequence — losslessness is what this
    // oracle pins; the degraded-pruning measurement and the reoptimize
    // rewrite that restores it are ZOrderLayoutSpec's half).
    QEntry.sql(
      "q_zorder_append_read",
      """SELECT o_orderkey, o_custkey AS custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 500
        |  AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      BETWEEN 10000000 AND 20000000"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = orders(s, d).select(
        col("o_orderkey"),
        col("o_custkey").as("custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents")
      )
      val dir = java.nio.file.Files
        .createTempDirectory("graft-zapp").resolve("zl").toString
      ZOrder.writeClustered(base.filter(col("o_orderkey") % 10 < 8), "custkey", "cents", dir, 8)
      ZOrder.appendClustered(base.filter(col("o_orderkey") % 10 === 8), "custkey", "cents", dir, 2)
      ZOrder.appendClustered(base.filter(col("o_orderkey") % 10 === 9), "custkey", "cents", dir, 2)
      ZOrder
        .prunedRead(s, dir, "custkey", "cents", 100L, 500L, 10000000L, 20000000L)
        .select("o_orderkey", "custkey", "cents")
    },

    // Salted skew join: the build side (supplier) is replicated `salt` ways
    // and the probe's hot keys spread across salt sub-keys — identical
    // results to the plain equi-join (the twin), minus the straggler reducer.
    QEntry.sql(
      "q_skew_join_salted",
      """SELECT s_nationkey, count(*) AS cnt, round(sum(l_extendedprice), 2) AS price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      SkewJoin
        .saltedEquiJoin(
          lineitem(s, d).select("l_suppkey", "l_extendedprice"),
          supplier(s, d).select("s_suppkey", "s_nationkey"),
          "l_suppkey",
          "s_suppkey",
          8
        )
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("price"))
    },

    // Dense-grid zero-fill: complete nation × order-status matrix with
    // absent combinations reported as 0 — the one legitimate cross-join
    // shape (BOUNDED dims only: the product is |nations|×|statuses|, never
    // fact-sized). Both dims broadcast, the fact side is pre-aggregated to
    // dim cardinality before the left join, so nothing here grows with the
    // fact table.
    QEntry.sql(
      "q_cross_grid_zero_fill",
      """SELECT n_name, status, coalesce(cnt, 0) AS orders_cnt
        |FROM (SELECT n_nationkey, n_name FROM nation) n
        |CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) st
        |LEFT JOIN (SELECT c_nationkey, o_orderstatus, count(*) AS cnt
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |           GROUP BY c_nationkey, o_orderstatus) f
        |ON n.n_nationkey = f.c_nationkey AND st.status = f.o_orderstatus"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dims = nation(s, d).select("n_nationkey", "n_name")
      val statuses = orders(s, d).select(col("o_orderstatus").as("status")).distinct()
      val grid = broadcast(dims).crossJoin(broadcast(statuses))
      val counts = orders(s, d)
        .select("o_custkey", "o_orderstatus")
        .join(
          customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey")
        )
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      grid
        .join(
          counts,
          col("n_nationkey") === col("c_nationkey") && col("status") === col("o_orderstatus"),
          "left"
        )
        .select(col("n_name"), col("status"), coalesce(col("cnt"), lit(0L)).as("orders_cnt"))
    },

    // Bloom semi-join reduction: the probe side is prefiltered by a KB-scale
    // sketch of the qualifying suppliers BEFORE any shuffle, then the exact
    // semi join removes the sketch's false positives — so results equal the
    // plain semi join (the twin) by construction, while at scale the shuffle
    // carries only rows that might match.
    QEntry.sql(
      "q_bloom_semi_reduce",
      """SELECT l_suppkey, count(*) AS cnt, round(sum(l_extendedprice), 2) AS price
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY l_suppkey""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val dim = supplier(s, d).filter(col("s_nationkey") < 5).select("s_suppkey")
      val pre = SemiReduce.bloomPrefilter(
        lineitem(s, d).select("l_suppkey", "l_extendedprice"),
        "l_suppkey",
        dim,
        "s_suppkey",
        expectedItems = 10000L,
        numBits = 1L << 17
      )
      pre
        .join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("price"))
    },

    // Largest-remainder proration: allocate a per-order fee pot (1% of the
    // order total, in cents) across the order's line items proportionally
    // to extended price, with the rounding residue distributed one cent at
    // a time to the largest remainders — so Σalloc == pot EXACTLY per
    // order (the invariant float proration can't give). Every step is
    // BIGINT: base = pot·v // V, remainder rank = (pot·v mod V) desc with
    // linenumber tie-break. All three windows are ORDER-KEYED (≤ 7 rows of
    // state); products stay under 2^46. The textbook financial-allocation
    // kernel, embarrassingly parallel by order.
    QEntry.sql(
      "q_prorate_fee",
      """WITH l AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
        |o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS pot FROM orders),
        |j AS (SELECT l.l_orderkey, l.ln, l.v, o.pot,
        |    CAST(sum(l.v) OVER (PARTITION BY l.l_orderkey) AS BIGINT) AS tv
        |  FROM l JOIN o ON l.l_orderkey = o.o_orderkey),
        |b AS (SELECT l_orderkey, ln, pot, tv,
        |    pot * v // tv AS base, pot * v % tv AS rem FROM j),
        |r AS (SELECT l_orderkey, ln, pot, base,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, ln) AS BIGINT) AS rk,
        |    CAST(sum(base) OVER (PARTITION BY l_orderkey) AS BIGINT) AS sb
        |  FROM b)
        |SELECT l_orderkey, ln AS l_linenumber,
        |  CAST(base + CASE WHEN rk <= pot - sb THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_cents
        |FROM r""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val wOrd = Window.partitionBy("l_orderkey")
      val l = lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("ln"),
        round(col("l_extendedprice") * 100).cast("long").as("v")
      )
      val o = orders(s, d).select(
        col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("pot")
      )
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("tv", sum("v").over(wOrd).cast("long"))
        .select(
          col("l_orderkey"),
          col("ln"),
          col("pot"),
          expr("pot * v div tv").as("base"),
          expr("pot * v % tv").as("rem")
        )
        .withColumn(
          "rk",
          row_number().over(wOrd.orderBy(col("rem").desc, col("ln"))).cast("long")
        )
        .withColumn("sb", sum("base").over(wOrd).cast("long"))
        .select(
          col("l_orderkey"),
          col("ln").as("l_linenumber"),
          (col("base") + when(col("rk") <= col("pot") - col("sb"), 1L).otherwise(0L))
            .cast("long")
            .as("alloc_cents")
        )
    },

    // Order→ship latency in BUSINESS DAYS per month — weekday arithmetic as
    // pure integer epoch-day math (day 0 = Thursday ⇒ dow 2/3 = Sat/Sun,
    // the q_ab_test_z convention; no engine calendar functions whose week
    // conventions differ): busdays(a,b) = (b−a) − #Sat − #Sun in [a,b),
    // each weekend count one closed-form division (validated against a
    // day-by-day reference). One fact join + one partial agg; the average
    // ships as an exact milli-day integer division.
    QEntry.sql(
      "q_busday_latency", {
        def cnt(c: Int) =
          s"greatest(0, (days - (($c + 7 - (ad % 7)) % 7) + 6) // 7)"
        s"""WITH x AS (SELECT
           |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ad,
           |    CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) -
           |      CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS days,
           |    strftime(o.o_orderdate, '%Y-%m') AS month
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
           |b AS (SELECT month, days - ${cnt(2)} - ${cnt(3)} AS bd
           |  FROM x WHERE days >= 0)
           |SELECT month, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(bd) * 1000 // count(*) AS BIGINT) AS avg_bd_milli
           |FROM b GROUP BY month""".stripMargin.replaceAll("\\s+", " ")
      }
    ) { (s, d) =>
      def cnt(c: Int) =
        s"greatest(0L, (days - (($c + 7 - (ad % 7)) % 7) + 6) div 7)"
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("ad"),
          (datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long") -
            datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")).as("days"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month")
        )
        .filter(col("days") >= 0)
        .select(col("month"), expr(s"days - ${cnt(2)} - ${cnt(3)}").as("bd"))
        .groupBy("month")
        .agg(
          count(lit(1)).as("n"),
          expr("sum(bd) * 1000L div count(*)").cast("long").as("avg_bd_milli")
        )
    },

    // Correlated LATERAL subquery — the SQL-surface top-N-per-group
    // idiom (each nation's top-2 spenders via a per-row correlated
    // ORDER BY … LIMIT subquery, run as the SAME SQL text through
    // spark.sql): the "switch your BI tool over" proof that Spark's
    // lateral join decorrelation handles what the window formulation
    // (q_topk) expresses relationally. Deterministic (cents DESC, ck)
    // total order inside the lateral.
    QEntry.sql(
      "q_lateral_topn",
      """SELECT n.n_name AS nation, t.ck, t.cents
        |FROM nation n, LATERAL (
        |  SELECT c.c_custkey AS ck,
        |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  GROUP BY c.c_custkey ORDER BY cents DESC, ck LIMIT 2) t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      graft.GraftSQL.sql(
        s,
        d,
        """SELECT n.n_name AS nation, t.ck, t.cents
          |FROM nation n JOIN LATERAL (
          |  SELECT c.c_custkey AS ck,
          |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
          |  WHERE c.c_nationkey = n.n_nationkey
          |  GROUP BY c.c_custkey ORDER BY cents DESC, ck LIMIT 2) t"""
          .stripMargin
      )
    },

    // OTIF (on-time-in-full) per order month: orders whose EVERY line
    // shipped within 30 days — max(shipdate) is the binding line, so the
    // all-lines predicate collapses to one per-order max agg, no
    // per-line bookkeeping. The fulfillment KPI next to q_busday_latency.
    // Exact epoch-day arithmetic; the rate one ppm integral division.
    QEntry.sql(
      "q_otif_rate",
      """WITH x AS (SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m') AS month,
        |    CAST(max(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE))
        |      AS BIGINT) AS worst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey, month)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN worst <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
        |  CAST(sum(CASE WHEN worst <= 30 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |    AS BIGINT) AS otif_ppm
        |FROM x GROUP BY month"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val x = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(
          max(
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          ).cast("long").as("worst")
        )
      x.groupBy("month")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("worst") <= 30, 1L).otherwise(0L)).cast("long").as("n_otif"),
          expr(
            "CAST(sum(CASE WHEN worst <= 30 THEN 1 ELSE 0 END) * 1000000 div count(*)" +
              " AS BIGINT)"
          ).as("otif_ppm")
        )
    },

    // Return-rate per brand with the Wilson 95% score interval — the
    // shrinkage-aware CI a quality dashboard ranks brands by (small
    // brands don't dominate on noise, unlike the raw rate). Counts and
    // the point rate are exact BIGINT/ppm; the interval is the one
    // fixed-parenthesization double expression over exact integers
    // (z = 1.96 literal-identical on both engines), shipped UNROUNDED.
    // One fact partial agg, broadcast part dim.
    QEntry.sql(
      "q_return_rate_wilson",
      """WITH b AS (SELECT p.p_brand AS brand,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS r
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand)
        |SELECT brand, n, r,
        |  CAST(r * 1000000 // n AS BIGINT) AS rate_ppm,
        |  ((CAST(r AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
        |    - 1.96 * sqrt((CAST(r AS DOUBLE) / n) * (1 - CAST(r AS DOUBLE) / n) / n
        |        + 1.96 * 1.96 / (4 * CAST(n AS DOUBLE) * n)))
        |    / (1 + 1.96 * 1.96 / n) AS wilson_lo,
        |  ((CAST(r AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
        |    + 1.96 * sqrt((CAST(r AS DOUBLE) / n) * (1 - CAST(r AS DOUBLE) / n) / n
        |        + 1.96 * 1.96 / (4 * CAST(n AS DOUBLE) * n)))
        |    / (1 + 1.96 * 1.96 / n) AS wilson_hi
        |FROM b"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val b = lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).cast("long").as("r")
        )
      val p = col("r").cast("double") / col("n")
      val z2 = lit(1.96) * lit(1.96)
      val center = p + z2 / (lit(2) * col("n"))
      val spread = lit(1.96) * sqrt(
        p * (lit(1) - p) / col("n") + z2 / (lit(4) * col("n").cast("double") * col("n"))
      )
      val denom = lit(1) + z2 / col("n")
      b.select(
        col("brand"),
        col("n"),
        col("r"),
        expr("CAST(r * 1000000 div n AS BIGINT)").as("rate_ppm"),
        ((center - spread) / denom).as("wilson_lo"),
        ((center + spread) / denom).as("wilson_hi")
      )
    },

    // Single-source supply risk per part type: parts where one supplier
    // holds > 50% of shipped units — the procurement-risk gate beside
    // E179's blend-concentration HHI. Unit counts are exact BIGINTs
    // (TPC-H quantities are integer-valued; round() pins the double),
    // the dominant share is max-units over total-units per part (value
    // well-defined under supplier ties), and the 50% test is one exact
    // ppm integral division. Two partial aggs + a type rollup — no
    // windows at all.
    QEntry.sql(
      "q_single_source_risk",
      """WITH ps AS (SELECT p.p_type AS t, l.l_partkey AS pk, l.l_suppkey AS sk,
        |    CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS units
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_type, l.l_partkey, l.l_suppkey),
        |pa AS (SELECT t, pk, CAST(max(units) AS BIGINT) AS mx,
        |    CAST(sum(units) AS BIGINT) AS tot FROM ps GROUP BY t, pk),
        |sh AS (SELECT t, CAST(CAST(mx AS HUGEINT) * 1000000 // tot AS BIGINT)
        |    AS share_ppm FROM pa)
        |SELECT t AS part_type, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CASE WHEN share_ppm > 500000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_single_source,
        |  CAST(max(share_ppm) AS BIGINT) AS worst_share_ppm
        |FROM sh GROUP BY t"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ps = lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type").as("t"), col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(round(col("l_quantity")).cast("long")).cast("long").as("units"))
      val pa = ps
        .groupBy("t", "pk")
        .agg(max("units").cast("long").as("mx"), sum("units").cast("long").as("tot"))
      pa.select(
        col("t"),
        expr("CAST(CAST(mx AS DECIMAL(38,0)) * 1000000 div tot AS BIGINT)").as("share_ppm")
      ).groupBy(col("t").as("part_type"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(when(col("share_ppm") > 500000, 1L).otherwise(0L)).cast("long").as("n_single_source"),
          max("share_ppm").cast("long").as("worst_share_ppm")
        )
    },

    // Open-orders backlog series: average concurrently-open orders per
    // month, from exact interval-overlap day counts — the Little's-law
    // denominator an ops dashboard tracks. Each order is open from order
    // date to its last ship date (one fact partial agg); the month grid
    // (≤ calendar months, BROADCAST) joins on the interval-overlap range
    // predicate, so the non-equi join fans out only to the months an
    // order actually touches. Month bounds via make_date — pure calendar
    // construction, no week conventions; overlap day counts and the
    // milli-order average are exact BIGINT arithmetic.
    QEntry.sql(
      "q_open_orders_series",
      """WITH se AS (SELECT o.o_orderkey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS sd,
        |    CAST(max(CAST(l.l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) + 1
        |      AS ed
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderdate),
        |mg AS (SELECT DISTINCT
        |    CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS y,
        |    CAST(strftime(o_orderdate, '%m') AS INTEGER) AS m FROM orders),
        |mb AS (SELECT y, m,
        |    CAST(make_date(y, m, 1) - DATE '1970-01-01' AS BIGINT) AS ms,
        |    CAST(make_date(y + m // 12, m % 12 + 1, 1) - DATE '1970-01-01'
        |      AS BIGINT) AS me FROM mg),
        |ov AS (SELECT mb.y, mb.m, mb.ms, mb.me,
        |    least(se.ed, mb.me) - greatest(se.sd, mb.ms) AS od
        |  FROM se JOIN mb ON se.sd < mb.me AND se.ed > mb.ms)
        |SELECT CAST(y AS BIGINT) || '-' ||
        |    CASE WHEN m < 10 THEN '0' ELSE '' END || CAST(m AS BIGINT) AS month,
        |  CAST(count(*) AS BIGINT) AS n_touching,
        |  CAST(sum(od) AS BIGINT) AS open_days,
        |  CAST(sum(od) * 1000 // (max(me) - max(ms)) AS BIGINT) AS avg_open_milli
        |FROM ov GROUP BY y, m"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val se = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("sd")
        )
        .agg(
          (max(datediff(to_date(col("l_shipdate")), lit("1970-01-01"))).cast("long") + 1)
            .as("ed")
        )
      val mg = orders(s, d)
        .select(
          date_format(col("o_orderdate"), "yyyy").cast("int").as("y"),
          date_format(col("o_orderdate"), "MM").cast("int").as("m")
        )
        .distinct()
      val mb = mg.select(
        col("y"),
        col("m"),
        datediff(make_date(col("y"), col("m"), lit(1)), lit("1970-01-01"))
          .cast("long")
          .as("ms"),
        datediff(
          make_date(col("y") + expr("m div 12"), expr("m % 12 + 1"), lit(1)),
          lit("1970-01-01")
        ).cast("long").as("me")
      )
      val ov = se
        .join(broadcast(mb), col("sd") < col("me") && col("ed") > col("ms"))
        .select(
          col("y"),
          col("m"),
          col("ms"),
          col("me"),
          (least(col("ed"), col("me")) - greatest(col("sd"), col("ms"))).as("od")
        )
      ov.groupBy("y", "m")
        .agg(
          count(lit(1)).as("n_touching"),
          sum("od").cast("long").as("open_days"),
          expr("CAST(sum(od) * 1000 div (max(me) - max(ms)) AS BIGINT)").as("avg_open_milli")
        )
        .select(
          concat(
            col("y").cast("string"),
            lit("-"),
            when(col("m") < 10, "0").otherwise(""),
            col("m").cast("string")
          ).as("month"),
          col("n_touching"),
          col("open_days"),
          col("avg_open_milli")
        )
    },

    // Cross-table orphan/coverage audit — the anti-join sweep that
    // complements q_dq_report's single-table constraint gate (E111): the
    // checks a snapshot promotion needs that dq_report does NOT carry —
    // fact-side orphans (lineitems whose order vanished) and the
    // dimension-coverage stats (customers with no orders, parts never
    // ordered, suppliers never used) that catch silently-empty joins
    // before a dashboard reads zero rows. Each check is one anti-join +
    // count, no row data to the driver; UNION ALL keeps one
    // deterministic 4-row frame of exact BIGINTs.
    QEntry.sql(
      "q_orphan_coverage",
      """SELECT 'lineitem_orphan_orderkey' AS chk, CAST(count(*) AS BIGINT) AS n_bad
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'customers_no_orders', CAST(count(*) AS BIGINT)
        |FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'parts_never_ordered', CAST(count(*) AS BIGINT)
        |FROM part p WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |UNION ALL
        |SELECT 'suppliers_never_used', CAST(count(*) AS BIGINT)
        |FROM supplier s WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      def cnt(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_bad")).select(lit(name).as("chk"), col("n_bad"))
      val li = lineitem(s, d)
      cnt(
        li.join(orders(s, d), col("l_orderkey") === col("o_orderkey"), "left_anti"),
        "lineitem_orphan_orderkey"
      ).unionAll(
        cnt(
          customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti"),
          "customers_no_orders"
        )
      ).unionAll(
        cnt(
          part(s, d).join(li, col("p_partkey") === col("l_partkey"), "left_anti"),
          "parts_never_ordered"
        )
      ).unionAll(
        cnt(
          supplier(s, d).join(li, col("s_suppkey") === col("l_suppkey"), "left_anti"),
          "suppliers_never_used"
        )
      )
    },

    // Blocked record-linkage scoring (the Fellegi-Sunter shape): candidate
    // customer pairs from equi-join blocks on (nation, segment, $2000
    // balance band) — NEVER all-pairs; the block key bounds the quadratic
    // term and is the standard recall tradeoff (near-$100 agreement across
    // a band boundary is missed — documented). Each pair scores integer
    // agreement weights over three derived fields: balance within $100
    // (+32), same first-order year (+16, only when both present — the FS
    // missing-field convention), same order count (+8). Output is the
    // exact score histogram. All BIGINT; per-customer order features come
    // from one partial agg, pairs from one shuffle join on the block key.
    QEntry.sql(
      "q_record_linkage",
      """WITH c AS (SELECT c_custkey AS ck, c_nationkey AS nk,
        |    c_mktsegment AS seg, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |oa AS (SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS n_ord,
        |    CAST(min(CAST(strftime(o_orderdate, '%Y') AS INTEGER)) AS BIGINT) AS yr1
        |  FROM orders GROUP BY o_custkey),
        |p AS (SELECT c.ck, c.nk, c.seg, c.cents, c.cents // 200000 AS band,
        |    COALESCE(oa.n_ord, 0) AS n_ord, oa.yr1
        |  FROM c LEFT JOIN oa ON c.ck = oa.ck),
        |s AS (SELECT
        |    (CASE WHEN abs(a.cents - b.cents) <= 10000 THEN 32 ELSE 0 END)
        |    + (CASE WHEN a.yr1 IS NOT NULL AND b.yr1 IS NOT NULL
        |        AND a.yr1 = b.yr1 THEN 16 ELSE 0 END)
        |    + (CASE WHEN a.n_ord = b.n_ord THEN 8 ELSE 0 END) AS score
        |  FROM p a JOIN p b ON a.nk = b.nk AND a.seg = b.seg
        |    AND a.band = b.band AND a.ck < b.ck)
        |SELECT CAST(score AS BIGINT) AS score, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM s GROUP BY score"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val c = customer(s, d).select(
        col("c_custkey").as("ck"),
        col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("cents")
      )
      val oa = orders(s, d)
        .groupBy(col("o_custkey").as("ock"))
        .agg(
          count(lit(1)).as("n_ord"),
          min(date_format(col("o_orderdate"), "yyyy").cast("int")).cast("long").as("yr1")
        )
      val p = c
        .join(oa, col("ck") === col("ock"), "left")
        .select(
          col("ck"),
          col("nk"),
          col("seg"),
          col("cents"),
          expr("cents div 200000").as("band"),
          coalesce(col("n_ord"), lit(0L)).as("n_ord"),
          col("yr1")
        )
      val a = p.toDF("ack", "nk", "seg", "acents", "band", "an", "ay")
      val b = p.toDF("bck", "nk2", "seg2", "bcents", "band2", "bn", "by")
      a.join(
        b,
        col("nk") === col("nk2") && col("seg") === col("seg2")
          && col("band") === col("band2") && col("ack") < col("bck")
      ).select(
        (when(abs(col("acents") - col("bcents")) <= 10000, 32L).otherwise(0L)
          + when(col("ay").isNotNull && col("by").isNotNull && col("ay") === col("by"), 16L)
            .otherwise(0L)
          + when(col("an") === col("bn"), 8L).otherwise(0L)).as("score")
      ).groupBy("score")
        .agg(count(lit(1)).as("n_pairs"))
    },

    // E335 sorted-neighborhood linkage pass ([[Dedup.sortedNeighborPairs]]):
    // the blocking complement that recovers exactly what q_record_linkage's
    // $2000 band-blocking documents as lost — near-balance pairs straddling
    // a band boundary. Blocks on (nation, segment), sorts by exact cents,
    // pairs each row with its 2 sort neighbors via lead() (one keyed
    // window, ≤ 2n pairs); the rollup counts close pairs (≤ $100) and how
    // many of those CROSS a band edge — the recall the equi-join blocks
    // cannot see.
    QEntry.sql(
      "q_snm_pairs",
      """WITH c AS (SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |l AS (SELECT nk, seg, ck AS id1, cents AS cents_1,
        |    lead(ck, 1) OVER w AS i2a, lead(cents, 1) OVER w AS c2a,
        |    lead(ck, 2) OVER w AS i2b, lead(cents, 2) OVER w AS c2b
        |  FROM c WINDOW w AS (PARTITION BY nk, seg ORDER BY cents, ck)),
        |p AS (SELECT id1, i2a AS id2, cents_1, c2a AS cents_2 FROM l WHERE i2a IS NOT NULL
        |  UNION ALL
        |  SELECT id1, i2b, cents_1, c2b FROM l WHERE i2b IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN abs(cents_1 - cents_2) <= 10000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_close,
        |  CAST(sum(CASE WHEN abs(cents_1 - cents_2) <= 10000
        |    AND cents_1 // 200000 != cents_2 // 200000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cross_band_close
        |FROM p""".stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val c = customer(s, d).select(
        col("c_custkey").as("ck"),
        col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("cents")
      )
      Dedup
        .sortedNeighborPairs(c, "ck", Seq("nk", "seg"), Seq("cents"), w = 2,
          carryCols = Seq("cents"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(when(abs(col("cents_1") - col("cents_2")) <= 10000, 1L).otherwise(0L))
            .cast("long")
            .as("n_close"),
          sum(
            when(
              abs(col("cents_1") - col("cents_2")) <= 10000 &&
                expr("cents_1 div 200000") =!= expr("cents_2 div 200000"),
              1L
            ).otherwise(0L)
          ).cast("long").as("n_cross_band_close")
        )
    },

    // Snapshot reconciliation: classify every key across two table
    // versions as added / removed / changed / unchanged — the audit query
    // every CDC or backfill pipeline runs before switching readers. The
    // two "versions" are date-windowed views of orders (old < 2000, new
    // ≥ 1996) with a deterministic status mutation so all four classes
    // appear at every sf. One full-outer join on the key + a 4-row
    // partial agg; at scale this is the one-pass diff that replaces
    // row-by-row comparison scripts.
    QEntry.sql(
      "q_snapshot_diff",
      """WITH old AS (SELECT o_orderkey AS k, o_orderstatus AS s,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
        |new_ AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1997-01-01'
        |      THEN 'F' ELSE o_orderstatus END AS s,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
        |j AS (SELECT COALESCE(o.k, n.k) AS k,
        |    CASE WHEN o.k IS NULL THEN 'added'
        |         WHEN n.k IS NULL THEN 'removed'
        |         WHEN o.s <> n.s OR o.v <> n.v THEN 'changed'
        |         ELSE 'unchanged' END AS cls
        |  FROM old o FULL OUTER JOIN new_ n ON o.k = n.k)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY cls"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val base = orders(s, d).select(
        col("o_orderkey").as("k"),
        col("o_orderstatus").as("s"),
        round(col("o_totalprice") * 100).cast("long").as("v"),
        col("o_orderdate")
      )
      val old = base
        .filter(expr("o_orderdate < TIMESTAMP '2000-01-01'"))
        .select(col("k").as("ok"), col("s").as("os"), col("v").as("ov"))
      val neu = base
        .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01'"))
        .select(
          col("k").as("nk"),
          when(
            col("s") === "O" && expr("o_orderdate < TIMESTAMP '1997-01-01'"),
            lit("F")
          ).otherwise(col("s")).as("ns"),
          col("v").as("nv")
        )
      old
        .join(neu, col("ok") === col("nk"), "full_outer")
        .select(
          when(col("ok").isNull, "added")
            .when(col("nk").isNull, "removed")
            .when(col("os") =!= col("ns") || col("ov") =!= col("nv"), "changed")
            .otherwise("unchanged")
            .as("cls")
        )
        .groupBy("cls")
        .agg(count(lit(1)).as("n"))
    },

    // Accumulating-snapshot fact: collapse each order's line milestones
    // (first ship, last ship) into one row, then report per-month average
    // order→first-ship lead and first→last ship span — the milestone
    // durations an accumulating snapshot tracks. All integer epoch-day
    // arithmetic, exact milli-day averages; one line-fact partial agg +
    // one order join.
    QEntry.sql(
      "q_order_lifecycle",
      """WITH ls AS (SELECT l_orderkey AS k,
        |    CAST(min(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS first_ship,
        |    CAST(max(CAST(l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS last_ship
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(ls.first_ship - (CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'))
        |    * 1000 // count(*) AS BIGINT) AS avg_to_first_milli,
        |  CAST(sum(ls.last_ship - ls.first_ship) * 1000 // count(*) AS BIGINT)
        |    AS avg_span_milli
        |FROM orders o JOIN ls ON o.o_orderkey = ls.k GROUP BY month"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val ls = lineitem(s, d)
        .groupBy(col("l_orderkey").as("k"))
        .agg(
          datediff(to_date(min("l_shipdate")), lit("1970-01-01")).cast("long").as("first_ship"),
          datediff(to_date(max("l_shipdate")), lit("1970-01-01")).cast("long").as("last_ship")
        )
      orders(s, d)
        .join(ls, col("o_orderkey") === col("k"))
        .select(
          date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          (col("first_ship") -
            datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")).as("lead_d"),
          (col("last_ship") - col("first_ship")).as("span_d")
        )
        .groupBy("month")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("sum(lead_d) * 1000L div count(*)").cast("long").as("avg_to_first_milli"),
          expr("sum(span_d) * 1000L div count(*)").cast("long").as("avg_span_milli")
        )
    },

    // E427 distributed 2-D skyline ([[Skyline.skyline2D]]): the Pareto
    // frontier of urgent orders maximizing (price, recency) — every order
    // no other urgent order beats on both axes. The oracle is the
    // DEFINITIONAL quadratic NOT EXISTS (9M dominance tests at sf0.01), so
    // the hash match proves the sweep identity — per-x group max + strict-
    // prefix max over x desc ≡ "no dominator exists" — including duplicate-
    // point ties (neither dominates; both survive). Spark side: one keyed
    // aggregate + the two-phase prefix-max window; nothing quadratic,
    // nothing single-reducer over data.
    QEntry.sql(
      "q_skyline_orders",
      """WITH o AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT p.o_orderkey, p.cents, p.day FROM o p
        |WHERE NOT EXISTS (SELECT 1 FROM o q
        |  WHERE q.cents >= p.cents AND q.day >= p.day
        |    AND (q.cents > p.cents OR q.day > p.day))"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      val o = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(
          col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("day")
        )
      Skyline.skyline2D(o, "cents", "day")
    }
  )
}
