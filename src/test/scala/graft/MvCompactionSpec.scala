package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction
import graft.plans.MvRewrite
import graft.plans.MvRewrite.MvDef

/** E422 compaction-aware MV refresh: the engine's own compaction replaces
  * a base directory's whole file set without changing a row; the MV must
  * survive the epoch (sidecar remapped over the produced files, rollup
  * untouched) instead of dropping, the remapped sidecar must power the
  * NEXT delete-churn refresh, and a full replacement WITHOUT compaction
  * provenance must still drop.
  */
class MvCompactionSpec extends SparkSpec {

  private def mkBase(dir: String): MvDef = {
    val s = spark
    import s.implicits._
    val rows = for { i <- 1 to 300 } yield (s"g${i % 4}", i.toLong)
    rows.toDF("g", "v").repartition(6).write.mode("overwrite").parquet(s"$dir/base.parquet")
    MvDef(s"$dir/base.parquet", s"$dir/mv.parquet", Seq("g"),
      Map("sum_v" -> "v"), Some("cnt"),
      mins = Map("min_v" -> "v"), maxs = Map("max_v" -> "v"),
      counts = Map("cnt_v" -> "v"))
  }

  private def mvBytes(defn: MvDef): Map[String, (Long, Long)] = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(defn.mvPath))
      .filter(_.isFile)
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime))
      .toMap
  }

  test("compaction writes a self-verified manifest naming replaced and produced files") {
    withTempDir { dir =>
      val defn = mkBase(dir)
      val (nb, na) = Compaction.compactParquet(spark, defn.basePath, 1L << 30)
      assert(nb == 6 && na == 1)
      val m = Compaction.readManifest(spark, defn.basePath).get
      assert(m.replaced.size == 6 && m.produced.size == 1)
      assert(m.rows == 300L)
      // the recorded content stat re-verifies over the live directory
      val (rows, hash) = Compaction.contentStat(spark, Seq(defn.basePath))
      assert(rows == m.rows && hash == m.contentHash)
    }
  }

  test("a compaction epoch keeps the MV: rollup untouched, sidecar remapped, next churn works") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkBase(dir)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      val rollupBefore = mvBytes(defn)

      Compaction.compactParquet(spark, defn.basePath, 1L << 30)
      val loaded = MvRewrite.loadCatalog(spark, s"$dir/cat")
      assert(loaded.exists(_.mvPath == defn.mvPath),
        "the MV must survive the engine's own compaction")
      assert(mvBytes(defn) == rollupBefore,
        "the rollup is provably unchanged — its files must not be rewritten")

      // the remapped sidecar must describe the PRODUCED files only
      val sidecar = spark.read.parquet(defn.mvPath + "_files")
      val files = sidecar.select("_file").distinct().collect().map(_.getString(0))
      assert(files.length == 1, s"one produced file -> one sidecar key, got ${files.toSeq}")

      // append an epoch, then expire it: BOTH incremental paths must run
      // off the remapped sidecar
      val s = spark
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      def dataFiles(): Set[String] = fs
        .listStatus(new org.apache.hadoop.fs.Path(defn.basePath))
        .map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .map(_.toString).toSet
      val keepers = dataFiles()
      (301 to 400).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
        .write.mode("append").parquet(defn.basePath)
      assert(MvRewrite.loadCatalog(spark, s"$dir/cat").exists(_.mvPath == defn.mvPath),
        "append epoch after the remap must refresh")
      val expiring = dataFiles() -- keepers
      expiring.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
      assert(MvRewrite.loadCatalog(spark, s"$dir/cat").exists(_.mvPath == defn.mvPath),
        "delete epoch running off the remapped sidecar must refresh")
      // freshness: MV content equals the direct recompute
      val mv = spark.read.parquet(defn.mvPath)
        .select("g", "sum_v", "min_v", "max_v", "cnt")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val direct = spark.read.parquet(defn.basePath)
        .groupBy("g")
        .agg(sum("v").cast("long").as("s"), min("v").cast("long").as("mn"),
          max("v").cast("long").as("mx"), count(lit(1)).cast("long").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(mv == direct, s"MV stale after the churn chain:\n  mv $mv\n  base $direct")
    }
  }

  test("a full replacement WITHOUT compaction provenance still drops the MV") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkBase(dir)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      // overwrite the base with DIFFERENT rows — no manifest, no proof
      val s = spark
      import s.implicits._
      (1 to 100).map(i => (s"g${i % 4}", i.toLong * 1000)).toDF("g", "v")
        .repartition(2).write.mode("overwrite").parquet(defn.basePath)
      val loaded = MvRewrite.loadCatalog(spark, s"$dir/cat")
      assert(!loaded.exists(_.mvPath == defn.mvPath),
        "an unproven full replacement must keep the DROP semantics")
    }
  }

  test("a tampered produced file fails the content re-verification and drops") {
    withTempDir { dir =>
      MvRewrite.clear()
      val defn = mkBase(dir)
      MvRewrite.build(spark, defn)
      MvRewrite.persist(spark, s"$dir/cat", defn)
      Compaction.compactParquet(spark, defn.basePath, 1L << 30)
      // tamper: swap the produced file for one with different rows while
      // keeping the manifest — the content stat must catch it
      val s = spark
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
      val produced = fs.listStatus(new org.apache.hadoop.fs.Path(defn.basePath))
        .map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
        .head
      val tmp = s"$dir/tamper.parquet"
      (1 to 5).map(i => (s"g$i", i.toLong)).toDF("g", "v")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val tfile = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      assert(fs.delete(produced, false))
      assert(fs.rename(tfile, produced))
      val loaded = MvRewrite.loadCatalog(spark, s"$dir/cat")
      assert(!loaded.exists(_.mvPath == defn.mvPath),
        "a produced set failing the content stat must not be served")
    }
  }
}
