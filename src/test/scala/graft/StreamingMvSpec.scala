package graft

import org.apache.spark.sql.functions._

import graft.plans.MvRewrite
import graft.streaming.StreamingOps

/** E414 streaming MV maintenance: the foreachBatch loop keeps a persisted
  * MV fresh under ingest — incremental fold-in on the happy path, idempotent
  * base appends under replay, and the rebuild fallback when a replay
  * rewrites already-manifested files.
  */
class StreamingMvSpec extends SparkSpec {

  private def mkDefn(dir: String) = MvRewrite.MvDef(
    s"$dir/base.parquet",
    s"$dir/mv.parquet",
    Seq("k"),
    Map("sum_v" -> "v"),
    Some("cnt"),
    mins = Map("min_v" -> "v"),
    maxs = Map("max_v" -> "v"),
    counts = Map("cnt_v" -> "v")
  )

  private def batchDF(lo: Int, hi: Int) = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
  }

  /** MV parquet contents must equal the base recompute — freshness, the
    * whole contract.
    */
  private def assertFresh(defn: MvRewrite.MvDef): Unit = {
    val mv = spark.read.parquet(defn.mvPath)
      .select("k", "sum_v", "min_v", "max_v", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val base = spark.read.parquet(defn.basePath)
      .groupBy("k")
      .agg(sum("v").cast("long").as("s"), min("v").cast("long").as("mn"),
        max("v").cast("long").as("mx"), count(lit(1)).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(mv == base, s"MV stale:\n  mv   $mv\n  base $base")
  }

  test("epochs fold in incrementally; replay appends nothing and self-heals") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkDefn(dir)
      batchDF(0, 30).write.parquet(defn.basePath)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      val loop = StreamingOps.mvMaintainLoop(s"$dir/cat", defn)

      loop(batchDF(30, 50), 0L)
      assertFresh(defn)
      loop(batchDF(50, 90).repartition(3), 1L) // multi-file batch
      assertFresh(defn)
      val rows = spark.read.parquet(defn.basePath).count()
      assert(rows == 90L)

      // replay epoch 1 (the at-least-once case): deterministic file names
      // mean the rewrite replaces its own files — no duplicate rows ever;
      // the rewritten mtimes fail the survivor check, so the loop's rebuild
      // fallback must land a fresh MV rather than a dropped one
      loop(batchDF(50, 90).repartition(3), 1L)
      assert(spark.read.parquet(defn.basePath).count() == 90L,
        "epoch replay must not append duplicate rows")
      assertFresh(defn)

      // and the stream continues incrementally after the self-heal
      loop(batchDF(90, 100), 2L)
      assert(spark.read.parquet(defn.basePath).count() == 100L)
      assertFresh(defn)
    }
  }

  test("a replay that writes FEWER files than the original attempt leaves no stale files") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkDefn(dir)
      batchDF(0, 10).write.parquet(defn.basePath)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      val loop = StreamingOps.mvMaintainLoop(s"$dir/cat", defn)

      // original attempt lands epoch 0 as 4 files
      loop(batchDF(10, 50).repartition(4), 0L)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      def epochFiles(): Seq[String] = fs
        .listStatus(new org.apache.hadoop.fs.Path(defn.basePath))
        .map(_.getPath.getName)
        .filter(n => n.startsWith("batch0-") && n.endsWith(".parquet"))
        .toSeq.sorted
      assert(epochFiles().size == 4)

      // replay the SAME epoch as 1 file (different partitioning between
      // attempts — the AQE/shuffle case): the original's higher-k files
      // must be deleted, not left serving duplicate rows
      loop(batchDF(10, 50).repartition(1), 0L)
      assert(epochFiles().size == 1,
        s"replay must clear the original attempt's whole file set, got ${epochFiles()}")
      assert(spark.read.parquet(defn.basePath).count() == 50L,
        "a narrower replay must not leave duplicate rows behind")
      assertFresh(defn)
    }
  }

  test("the happy path is the incremental one: MV bytes change without a full rebuild signature") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkDefn(dir)
      batchDF(0, 20).write.parquet(defn.basePath)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      val loop = StreamingOps.mvMaintainLoop(s"$dir/cat", defn)
      // tag the sidecar dir's file set before the epoch
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      loop(batchDF(20, 40), 0L)
      assertFresh(defn)
      // the sidecar must now carry partials for the appended files too —
      // the evidence the refresh went through the incremental path (a drop
      // + rebuild would also produce them, but the replay test above pins
      // that path separately; here we pin that a PLAIN epoch refreshes)
      val sidecarFiles = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/mv.parquet_files"))
      assert(sidecarFiles.nonEmpty)
      val loaded = MvRewrite.loadCatalog(spark, s"$dir/cat")
      assert(loaded.exists(_.mvPath == defn.mvPath),
        "MV must be registered fresh after the epoch")
    }
  }
}
