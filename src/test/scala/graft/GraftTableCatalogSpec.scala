package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FragmentEngine

/** The DataSource-V2 table surface (graft.catalog.GraftTableCatalog): the
  * fragment datasets must be reachable as `spark.table("graft.<name>")` /
  * plain SQL with BOTH pruning tiers intact — literal `part` predicates
  * prune at the FileIndex, and value predicates are rewritten by
  * DeriveFragmentPruning into fragment predicates THROUGH the catalog
  * surface (the catalog publishes the bucket metadata itself when serving
  * the range dataset, so a pure-SQL consumer never touches the engine API).
  * The catalog is read-only; writes must route through the engine.
  *
  * Each test registers the catalog under a UNIQUE name: Spark's
  * CatalogManager caches plugin instances per name per session, so reusing
  * one name across tests with different warehouse roots would silently keep
  * serving the first root (and pass or fail for the wrong reason).
  */
class GraftTableCatalogSpec extends SparkSpec {

  private def withoutAqe[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def finalPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  /** Distinct fragment directories the executed scan actually reads — the
    * catalog surface plans a v2 BatchScan, so count `part=` dirs across its
    * planned input files (v1 FileSourceScan kept for completeness).
    */
  private def scannedPartitions(df: DataFrame): Option[Int] =
    finalPlan(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.urlEncodedPath)
          case _ => Seq.empty[String]
        }.flatMap(p => "part=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)))
          .distinct.size
    }.headOption

  /** fragment warehouse + catalog conf under `cat`, torn down after `f`. */
  private def withCatalog[A](cat: String)(f: FragmentEngine => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val e = new FragmentEngine(spark, root)
    e.loadRatings("ratings", "/root/reference/test_data1.txt")
    e.rangePartition("ratings", 5)
    e.roundRobinPartition("ratings", 5)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    try f(e)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      // the meta published by loadTable names this test's tempdir — drop it
      spark.conf.unset(graft.plans.DeriveFragmentPruning.MetaKey)
    }
  }

  test("fragment datasets resolve through spark.table and plain SQL") {
    withCatalog("graft") { e =>
      val viaCatalog = spark.table("graft.range_ratings")
      val direct = e.rangeFragments()
      assert(viaCatalog.count() == direct.count())
      assert(viaCatalog.columns.sorted.toSeq == direct.columns.sorted.toSeq)
      val sqlCount = spark
        .sql("SELECT count(*) AS n FROM graft.round_robin_ratings")
        .collect().head.getLong(0)
      assert(sqlCount == direct.count(), "round-robin rows = range rows = master rows")
      // SHOW TABLES-level listing
      val names = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
      assert(names.contains("range_ratings") && names.contains("round_robin_ratings"), names)
    }
  }

  test("a literal part predicate through the table surface prunes at the FileIndex") {
    withCatalog("graft_c2") { _ => withoutAqe {
      val one = spark.sql("SELECT * FROM graft_c2.range_ratings WHERE part = 3")
      assert(scannedPartitions(one).contains(1), s"got ${scannedPartitions(one)}")
    } }
  }

  test("a rating predicate through the table surface reads only surviving fragment dirs") {
    withCatalog("graft_c3") { _ => withoutAqe {
      // DeriveFragmentPruning: rating ∈ [1.5, 3.5] overlaps fragments 1..3.
      // No engine API call anywhere — the catalog published the bucket meta.
      val range = spark
        .table("graft_c3.range_ratings")
        .filter(col("rating") >= 1.5 && col("rating") <= 3.5)
      assert(scannedPartitions(range).contains(3), s"got ${scannedPartitions(range)}")
      // equality → exactly one fragment directory, via SQL text
      val point = spark.sql("SELECT * FROM graft_c3.range_ratings WHERE rating = 4.5")
      assert(scannedPartitions(point).contains(1), s"got ${scannedPartitions(point)}")
      // and the rows are the same as the direct path (pruning is invisible)
      val viaEngine = spark.read
        .parquet(s"${spark.conf.get("spark.sql.catalog.graft_c3.warehouse")}/range_ratings")
        .filter(col("rating") === 4.5).count()
      assert(point.count() == viaEngine)
    } }
  }

  test("the catalog surface is read-only; unknown tables raise cleanly") {
    withCatalog("graft_c4") { _ =>
      intercept[UnsupportedOperationException] {
        spark.sql("DROP TABLE graft_c4.range_ratings")
      }
      val err = intercept[Exception] {
        spark.table("graft_c4.no_such_dataset").collect()
      }
      assert(err.getMessage.toLowerCase.contains("no_such_dataset"), err.getMessage)
    }
  }

  test("committed indexes are SQL tables with VERSION AS OF / TIMESTAMP AS OF time travel") {
    withCatalog("graft_tt") { _ =>
      val root = spark.conf.get("spark.sql.catalog.graft_tt.warehouse")
      val s = spark
      import s.implicits._
      // an IndexCommit-rooted dataset inside the warehouse: v1 then v2
      val idx = s"$root/bands_index"
      graft.operators.IndexCommit.commit(spark, idx, "w0") { _ =>
        Seq(1L, 2L).toDF("id")
      }
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      val m1 = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$idx/manifest/commit-1")).getModificationTime
      Thread.sleep(20)
      graft.operators.IndexCommit.commit(spark, idx, "w0") { base =>
        base.get.unionByName(Seq(3L).toDF("id"))
      }
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("id").collect().map(_.getLong(0)).toSet
      // bare read = newest committed snapshot
      assert(ids(spark.table("graft_tt.bands_index")) == Set(1L, 2L, 3L))
      // exact-version travel through plain SQL
      assert(ids(spark.sql("SELECT * FROM graft_tt.bands_index VERSION AS OF 1"))
        == Set(1L, 2L))
      assert(ids(spark.sql("SELECT * FROM graft_tt.bands_index VERSION AS OF 2"))
        == Set(1L, 2L, 3L))
      // timestamp travel: an instant between the two commits resolves to v1
      val t1 = java.time.Instant.ofEpochMilli(m1).toString
      assert(ids(spark.sql(
        s"SELECT * FROM graft_tt.bands_index TIMESTAMP AS OF '$t1'")) == Set(1L, 2L))
      // non-index datasets refuse to time-travel with a clear error
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM graft_tt.range_ratings VERSION AS OF 1").collect()
      }
      assert(err.getMessage.contains("not a committed index"), err.getMessage)
    }
  }

  test("INSERT INTO the fragment datasets routes through the dual-write semantics") {
    withCatalog("graft_w1") { e =>
      val root = spark.conf.get("spark.sql.catalog.graft_w1.warehouse")
      val before = e.master("ratings").count()
      // boundary rating 2.0 (Interface1.py:238-247 rule): buckets are
      // (lo, hi] except the first, so 2.0 lands in fragment 1 — not 2
      spark.sql("INSERT INTO graft_w1.range_ratings VALUES (99, 777, 2.0, NULL, NULL)")
      assert(e.master("ratings").count() == before + 1, "dual write: master row missing")
      val frag1 = spark.read.parquet(s"$root/range_ratings/part=1")
        .filter(col("userid") === 99 && col("movieid") === 777).count()
      assert(frag1 == 1, "boundary rating 2.0 must land in fragment 1 ((1,2])")
      assert(spark.table("graft_w1.range_ratings").filter(col("userid") === 99).count() == 1,
        "the row must exist in exactly one fragment directory")
      // _rowid continues the master insert sequence
      val rid = spark.read.parquet(s"$root/ratings")
        .filter(col("userid") === 99).select("_rowid").head().getLong(0)
      assert(rid == before, s"rowid $rid should continue the sequence at $before")
      // round-robin INSERT: master + counter-routed fragment
      spark.sql("INSERT INTO graft_w1.round_robin_ratings VALUES (98, 776, 4.5, NULL, NULL)")
      assert(e.master("ratings").count() == before + 2)
      assert(spark.table("graft_w1.round_robin_ratings")
        .filter(col("userid") === 98).count() == 1)
      // explicit engine-derived values are rejected — and NOTHING lands
      // (buffer-then-route: a failed statement leaves master untouched)
      val beforeRej = e.master("ratings").count()
      intercept[Exception] {
        spark.sql("INSERT INTO graft_w1.range_ratings VALUES (97, 775, 3.0, 123, 2)")
      }
      assert(e.master("ratings").count() == beforeRej, "failed INSERT must land nothing")
      assert(spark.table("graft_w1.range_ratings").filter(col("userid") === 97).count() == 0)
    }
  }

  test("multi-row INSERT is all-or-nothing and routes identically to sequential inserts") {
    withCatalog("graft_w2") { e =>
      val root = spark.conf.get("spark.sql.catalog.graft_w2.warehouse")
      val before = e.master("ratings").count()
      // a multi-row statement with ONE invalid row (explicit _rowid on the
      // third) must land NOTHING — not the valid prefix
      intercept[Exception] {
        spark.sql(
          "INSERT INTO graft_w2.range_ratings VALUES " +
            "(90, 700, 1.0, NULL, NULL), (91, 701, 3.0, NULL, NULL), (92, 702, 4.0, 55, NULL)")
      }
      assert(e.master("ratings").count() == before, "partial multi-row INSERT landed a prefix")
      assert(spark.table("graft_w2.range_ratings")
        .filter(col("userid").isin(90, 91, 92)).count() == 0)

      // the valid multi-row statement lands every row, each routed to the
      // fragment its rating selects — batch path ≡ per-row routing
      spark.sql(
        "INSERT INTO graft_w2.range_ratings VALUES " +
          "(90, 700, 0.5, NULL, NULL), (91, 701, 2.0, NULL, NULL), (92, 702, 4.5, NULL, NULL)")
      assert(e.master("ratings").count() == before + 3)
      def fragOf(u: Int): Int =
        spark.table("graft_w2.range_ratings").filter(col("userid") === u)
          .select("part").head().getInt(0)
      assert(fragOf(90) == 0, "0.5 lands in fragment 0 ([0,1])")
      assert(fragOf(91) == 1, "boundary 2.0 lands in fragment 1 ((1,2])")
      assert(fragOf(92) == 4, "4.5 lands in fragment 4 ((4,5])")

      // round-robin multi-row: the counter advances ONCE by the row count,
      // and per-row fragments match the sequential (lastInserted+1+i) mod n
      val rrBefore = e.catalog.readRoundRobinMeta().get.lastInserted
      val n = e.catalog.readRoundRobinMeta().get.totalPartitions
      spark.sql(
        "INSERT INTO graft_w2.round_robin_ratings VALUES " +
          "(80, 800, 1.5, NULL, NULL), (81, 801, 2.5, NULL, NULL), (82, 802, 3.5, NULL, NULL)")
      val rrAfter = e.catalog.readRoundRobinMeta().get.lastInserted
      assert(rrAfter == (rrBefore + 3) % n, s"counter $rrBefore -> $rrAfter (n=$n)")
      Seq(80, 81, 82).zipWithIndex.foreach { case (u, i) =>
        val p = spark.table("graft_w2.round_robin_ratings")
          .filter(col("userid") === u).select("part").head().getInt(0)
        assert(p == ((rrBefore + 1 + i) % n).toInt, s"user $u routed to $p")
      }
      val _ = root
    }
  }

  test("DELETE FROM a fragment dataset removes rows from master and exactly the routed fragment") {
    withCatalog("graft_d1") { e =>
      val root = spark.conf.get("spark.sql.catalog.graft_d1.warehouse")
      val masterBefore = e.master("ratings").count()
      val hits = spark.table("graft_d1.range_ratings")
        .filter(col("rating") === 4.5)
      val nHit = hits.count()
      assert(nHit > 0, "fixture must contain 4.5 ratings")
      val hitParts = hits.select("part").distinct().collect().map(_.getInt(0)).toSet
      assert(hitParts == Set(4), "4.5 routes to fragment 4 ((4,5])")
      val otherFragBefore = spark.read.parquet(s"$root/range_ratings/part=2").count()
      val rrBefore = spark.table("graft_d1.round_robin_ratings").count()

      spark.sql("DELETE FROM graft_d1.range_ratings WHERE rating = 4.5")

      // master mirror: the same rows are gone by _rowid
      assert(e.master("ratings").count() == masterBefore - nHit,
        "master must lose exactly the deleted rows")
      assert(e.master("ratings").filter(col("rating") === 4.5).count() == 0)
      // the routed fragment lost them; untouched fragments stay identical
      assert(spark.table("graft_d1.range_ratings").filter(col("rating") === 4.5).count() == 0)
      assert(spark.read.parquet(s"$root/range_ratings/part=2").count() == otherFragBefore,
        "a fragment without matches must not be rewritten")
      // the OTHER fragmentation scheme is untouched (symmetric with INSERT)
      assert(spark.table("graft_d1.round_robin_ratings").count() == rrBefore)
      // the round-robin counter did not move
      assert(e.catalog.readRoundRobinMeta().get.lastInserted ==
        (rrBefore - 1) % e.catalog.readRoundRobinMeta().get.totalPartitions)

      // a DELETE that empties a fragment removes its directory outright and
      // partition pruning over the survivors still works
      spark.sql("DELETE FROM graft_d1.range_ratings WHERE part = 2")
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/range_ratings/part=2")),
        "an emptied fragment directory must be removed")
      assert(spark.table("graft_d1.range_ratings")
        .select("part").distinct().collect().map(_.getInt(0)).toSet == Set(0, 1, 3, 4))

      // a condition the metadata path can't translate (canDeleteWhere =
      // false) FALLS BACK to the row-level rewrite — complex deletes still
      // work, with the same dual-write semantics
      val before = spark.table("graft_d1.range_ratings").count()
      val complexHits = spark.table("graft_d1.range_ratings")
        .filter(col("rating") * 2 === 3.0).count()
      assert(complexHits > 0, "fixture must contain 1.5 ratings")
      spark.sql("DELETE FROM graft_d1.range_ratings WHERE rating * 2 = 3.0")
      assert(spark.table("graft_d1.range_ratings").count() == before - complexHits)
      assert(e.master("ratings").filter(col("rating") === 1.5).count() == 0,
        "the rewrite fallback must mirror master too")
    }
  }

  test("an unconditional DELETE leaves an empty but readable dataset; inserts resume") {
    withCatalog("graft_d2") { e =>
      spark.sql("DELETE FROM graft_d2.range_ratings")
      // the emptied dataset must stay selectable (schema survives) and the
      // master mirror must be empty too
      assert(spark.table("graft_d2.range_ratings").count() == 0)
      assert(spark.sql("SELECT rating FROM graft_d2.range_ratings WHERE rating > 0").count() == 0)
      assert(e.master("ratings").count() == 0)
      // life goes on: a routed INSERT lands normally afterwards
      spark.sql("INSERT INTO graft_d2.range_ratings VALUES (7, 8, 3.5, NULL, NULL)")
      assert(spark.table("graft_d2.range_ratings").count() == 1)
      assert(spark.table("graft_d2.range_ratings").head().getAs[Int]("part") == 3)
      assert(e.master("ratings").count() == 1)
    }
  }

  test("UPDATE through the catalog re-routes across fragment boundaries and mirrors master") {
    withCatalog("graft_u1") { e =>
      val root = spark.conf.get("spark.sql.catalog.graft_u1.warehouse")
      val victims = spark.table("graft_u1.range_ratings")
        .filter(col("rating") === 3.0)
        .select("_rowid").collect().map(_.getLong(0)).toSet
      assert(victims.nonEmpty, "fixture must contain 3.0 ratings (fragment 2)")
      val total = spark.table("graft_u1.range_ratings").count()

      // 3.0 lives in fragment 2 ((2,3]); 0.5 routes to fragment 0 ([0,1])
      spark.sql("UPDATE graft_u1.range_ratings SET rating = 0.5 WHERE rating = 3.0")

      val moved = spark.table("graft_u1.range_ratings")
        .filter(col("_rowid").isin(victims.toSeq: _*))
      assert(moved.count() == victims.size, "updated rows must survive the rewrite")
      assert(moved.select("part").distinct().collect().map(_.getInt(0)).toSeq == Seq(0),
        "an update across the boundary must MOVE the row to the routed fragment")
      assert(moved.select("rating").distinct().head().getDouble(0) == 0.5)
      assert(spark.table("graft_u1.range_ratings").count() == total, "no row gained or lost")
      // master mirror carries the new value under the SAME _rowid
      val inMaster = e.master("ratings").filter(col("_rowid").isin(victims.toSeq: _*))
      assert(inMaster.count() == victims.size)
      assert(inMaster.select("rating").distinct().head().getDouble(0) == 0.5)

      // an update to an OUT-OF-DOMAIN rating leaves the row master-only
      // (rangeInsert's contract run through UPDATE)
      val v1 = victims.head
      spark.sql(s"UPDATE graft_u1.range_ratings SET rating = 7.5 WHERE _rowid = $v1")
      assert(spark.table("graft_u1.range_ratings").filter(col("_rowid") === v1).count() == 0)
      assert(e.master("ratings").filter(col("_rowid") === v1).select("rating")
        .head().getDouble(0) == 7.5)

      // identity is engine-derived: SET _rowid is rejected and nothing lands
      val snapshot = spark.table("graft_u1.range_ratings").count()
      intercept[Exception] {
        spark.sql("UPDATE graft_u1.range_ratings SET _rowid = 9999 WHERE rating = 0.5")
      }
      assert(spark.table("graft_u1.range_ratings").count() == snapshot)
      val _ = root
    }
  }

  test("round-robin dataset: DELETE mirrors master, MERGE keeps positional routing") {
    withCatalog("graft_rr1") { e =>
      val s = spark
      import s.implicits._
      val masterBefore = e.master("ratings").count()
      val hits = spark.table("graft_rr1.round_robin_ratings").filter(col("rating") === 4.5)
      val nHit = hits.count()
      assert(nHit > 0)
      spark.sql("DELETE FROM graft_rr1.round_robin_ratings WHERE rating = 4.5")
      assert(e.master("ratings").count() == masterBefore - nHit)
      assert(spark.table("graft_rr1.round_robin_ratings")
        .filter(col("rating") === 4.5).count() == 0)
      // the range scheme is untouched (symmetric independence)
      assert(spark.table("graft_rr1.range_ratings").filter(col("rating") === 4.5).count() > 0)

      // MERGE on round-robin: matched rows keep their POSITIONAL fragment
      // even when the rating changes (RR routing is insertion-order, not
      // value); inserts advance the counter
      val anyRow = spark.table("graft_rr1.round_robin_ratings")
        .orderBy("_rowid").limit(1).head()
      val (u0, m0, oldPart) =
        (anyRow.getAs[Int]("userid"), anyRow.getAs[Int]("movieid"), anyRow.getAs[Int]("part"))
      val rrMetaBefore = e.catalog.readRoundRobinMeta().get
      Seq((u0, m0, 0.5), (777, 888, 1.5)).toDF("u", "m", "r")
        .createOrReplaceTempView("rr_merge_src")
      spark.sql(
        """MERGE INTO graft_rr1.round_robin_ratings t USING rr_merge_src s
          |ON t.userid = s.u AND t.movieid = s.m
          |WHEN MATCHED THEN UPDATE SET rating = s.r
          |WHEN NOT MATCHED THEN
          |  INSERT (userid, movieid, rating, _rowid, part) VALUES (s.u, s.m, s.r, NULL, NULL)
          |""".stripMargin)
      val upd = spark.table("graft_rr1.round_robin_ratings")
        .filter(col("userid") === u0 && col("movieid") === m0)
      assert(upd.count() == 1 && upd.head().getAs[Double]("rating") == 0.5)
      assert(upd.head().getAs[Int]("part") == oldPart, "RR update must not move the row")
      val ins = spark.table("graft_rr1.round_robin_ratings").filter(col("userid") === 777)
      assert(ins.count() == 1)
      val rrMetaAfter = e.catalog.readRoundRobinMeta().get
      assert(rrMetaAfter.lastInserted ==
        (rrMetaBefore.lastInserted + 1) % rrMetaBefore.totalPartitions,
        "one insert advances the counter once")
      assert(ins.head().getAs[Int]("part") ==
        ((rrMetaBefore.lastInserted + 1) % rrMetaBefore.totalPartitions).toInt)
      assert(e.master("ratings").filter(col("userid") === 777).count() == 1)
    }
  }

  test("MERGE INTO routes matched updates and unmatched inserts through the dual-write") {
    withCatalog("graft_m1") { e =>
      val s = spark
      import s.implicits._
      val masterBefore = e.master("ratings").count()
      val fragBefore = spark.table("graft_m1.range_ratings").count()
      val nextIdBefore = e.master("ratings")
        .agg(org.apache.spark.sql.functions.max("_rowid")).head().getLong(0) + 1
      // source: one row matching an existing (userid, movieid) (1, 122) with
      // a rating that crosses a boundary, one brand-new row
      Seq((1, 122, 2.0), (555, 666, 4.5)).toDF("u", "m", "r")
        .createOrReplaceTempView("merge_src")
      val old = spark.table("graft_m1.range_ratings")
        .filter(col("userid") === 1 && col("movieid") === 122)
        .select("_rowid", "part").head()
      val (oldId, oldPart) = (old.getLong(0), old.getInt(1))

      spark.sql(
        """MERGE INTO graft_m1.range_ratings t USING merge_src s
          |ON t.userid = s.u AND t.movieid = s.m
          |WHEN MATCHED THEN UPDATE SET rating = s.r
          |WHEN NOT MATCHED THEN
          |  INSERT (userid, movieid, rating, _rowid, part) VALUES (s.u, s.m, s.r, NULL, NULL)
          |""".stripMargin)

      // matched: same _rowid, new rating, re-routed to the boundary fragment
      val updated = spark.table("graft_m1.range_ratings").filter(col("_rowid") === oldId)
      assert(updated.count() == 1)
      assert(updated.head().getAs[Double]("rating") == 2.0)
      assert(updated.head().getAs[Int]("part") == 1, "boundary 2.0 must land in ((1,2])")
      assert(oldPart != 1, "fixture row must actually move (1::122 was 5.0 -> part 4)")
      // unmatched: inserted with a FRESH _rowid, routed, mirrored in master
      val inserted = spark.table("graft_m1.range_ratings").filter(col("userid") === 555)
      assert(inserted.count() == 1)
      assert(inserted.head().getAs[Long]("_rowid") == nextIdBefore, "fresh load id")
      assert(inserted.head().getAs[Int]("part") == 4, "4.5 routes to ((4,5])")
      assert(spark.table("graft_m1.range_ratings").count() == fragBefore + 1)
      assert(e.master("ratings").count() == masterBefore + 1)
      assert(e.master("ratings").filter(col("userid") === 555).count() == 1)
      assert(e.master("ratings").filter(col("_rowid") === oldId)
        .head().getAs[Double]("rating") == 2.0, "master mirrors the matched update")
    }
  }

  test("a bulk UPDATE (>10k-row rewrite stream) runs distributed through the SQL surface") {
    // the round-15 surface REFUSED any rewrite whose stream exceeded 10k
    // rows per task (AQE coalesces small exchanges to one task, so
    // effectively per statement); the distributed spill-file path must
    // absorb a stream bigger than that cap with routing intact
    val root = java.nio.file.Files.createTempDirectory("graft-bulk").toString
    val txt = s"$root/ratings.txt"
    val n = 12345
    java.nio.file.Files.write(
      java.nio.file.Paths.get(txt),
      (0 until n).map(i => s"$i::${i % 997}::${(i % 50) / 10.0}::0")
        .mkString("\n").getBytes("UTF-8"))
    val e = new FragmentEngine(spark, root)
    e.loadRatings("ratings", txt)
    e.rangePartition("ratings", 5)
    spark.conf.set("spark.sql.catalog.graft_bulk",
      classOf[graft.catalog.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_bulk.warehouse", root)
    try {
      val before = spark.table("graft_bulk.range_ratings").count()
      val toMove = spark.table("graft_bulk.range_ratings")
        .filter(col("rating") > 2.5).count()
      assert(before > 10000 && toMove > 1000, s"fixture: $before rows, $toMove movers")
      spark.sql("UPDATE graft_bulk.range_ratings SET rating = 0.5 WHERE rating > 2.5")
      val after = spark.table("graft_bulk.range_ratings")
      assert(after.count() == before, "no row gained or lost")
      assert(after.filter(col("rating") > 2.5).count() == 0)
      // every mover re-routed to fragment 0 ([0,1]) and mirrors master
      assert(after.filter(col("rating") === 0.5 && col("part") =!= 0).count() == 0)
      assert(e.master("ratings").filter(col("rating") > 2.5).count() == 0)
      assert(e.master("ratings").count() == before)
      // the rewrite's staging spill is swept after the commit
      assert(!new java.io.File(s"$root/_rewrite_staging").exists() ||
        new java.io.File(s"$root/_rewrite_staging").listFiles().isEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_bulk")
      spark.conf.unset("spark.sql.catalog.graft_bulk.warehouse")
      spark.conf.unset(graft.plans.DeriveFragmentPruning.MetaKey)
    }
  }

  test("an UPDATE that moves every row out-of-domain empties the dataset but keeps it readable") {
    withCatalog("graft_u2") { e =>
      val total = spark.table("graft_u2.range_ratings").count()
      assert(total > 0)
      // 7.5 is outside [0, 5]: every row becomes master-only (rangeInsert's
      // contract run through UPDATE) and the fragment dataset empties —
      // which must leave a schema-carrying, readable dataset, not a bare
      // directory that bricks every subsequent read and DML
      spark.sql("UPDATE graft_u2.range_ratings SET rating = 7.5")
      assert(spark.table("graft_u2.range_ratings").count() == 0)
      assert(spark.sql("SELECT rating FROM graft_u2.range_ratings WHERE rating > 0").count() == 0)
      assert(e.master("ratings").count() == total, "rows survive master-only")
      assert(e.master("ratings").filter(col("rating") === 7.5).count() == total)
      // life goes on: insert and a second UPDATE both work on the emptied set
      spark.sql("INSERT INTO graft_u2.range_ratings VALUES (7, 8, 3.5, NULL, NULL)")
      assert(spark.table("graft_u2.range_ratings").count() == 1)
      spark.sql("UPDATE graft_u2.range_ratings SET rating = 1.5 WHERE userid = 7")
      assert(spark.table("graft_u2.range_ratings").head().getAs[Int]("part") == 1)
    }
  }

  test("UPDATE ... SET part is rejected on both schemes — placement is engine-derived") {
    withCatalog("graft_u3") { e =>
      // round-robin: part is POSITIONAL; an assignable part would let a
      // statement relocate rows to arbitrary (even out-of-range) fragments
      // and corrupt the routing invariant
      val rrBefore = spark.table("graft_u3.round_robin_ratings")
        .groupBy("part").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      intercept[Exception] {
        spark.sql("UPDATE graft_u3.round_robin_ratings SET part = 99 WHERE part = 1")
      }
      val rrAfter = spark.table("graft_u3.round_robin_ratings")
        .groupBy("part").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rrAfter == rrBefore, "nothing lands on a rejected statement")
      // range: part is VALUE-derived; a SET part that disagrees with the
      // row's fragment is equally rejected (a no-op SET rating keeps part
      // consistent and still passes — covered by the UPDATE tests above)
      intercept[Exception] {
        spark.sql("UPDATE graft_u3.range_ratings SET part = 0 WHERE part = 4")
      }
      assert(spark.table("graft_u3.range_ratings").filter(col("part") === 4).count() > 0)
      val _ = e
    }
  }
}
