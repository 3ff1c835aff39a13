package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.operators.{IndexCommit, IndexMaintenance}

/** The optimistic commit protocol for persisted indexes: atomic pointer
  * swap, reader isolation mid-write, rebase on a lost race, interleaved
  * appenders without lost updates, versioned delete/compact, vacuum.
  * Filesystem-effect tier — no DuckDB oracle (like E252's layout specs).
  */
class IndexCommitSpec extends SparkSpec {
  import spark.implicits._

  private def ids(root: String): Set[Long] =
    IndexCommit
      .readCommitted(spark, root)
      .get
      ._2
      .select("id")
      .collect()
      .map(_.getLong(0))
      .toSet

  test("first commit lands v=1 and is readable through the pointer") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      assert(IndexCommit.committedVersion(spark, root).isEmpty)
      assert(IndexCommit.readCommitted(spark, root).isEmpty)
      val v = IndexMaintenance.appendVersioned(
        spark, Seq(1L, 2L).toDF("id"), root, writerId = "w0")
      assert(v == 1L)
      assert(IndexCommit.committedVersion(spark, root).contains(1L))
      assert(ids(root) == Set(1L, 2L))
    }
  }

  test("a reader mid-write sees the previous committed version until the marker lands") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L).toDF("id"), root, "w0")
      // a compaction/writer in flight: full snapshot staged, marker not yet
      val staged = "v2-w1-1"
      Seq(1L, 99L).toDF("id").write.parquet(s"$root/data/$staged")
      assert(IndexCommit.committedVersion(spark, root).contains(1L))
      assert(ids(root) == Set(1L), "reader must stay on v=1 while v=2 is unpublished")
      // the marker rename is the publication point
      assert(IndexCommit.tryCommitMarker(spark, root, 2L, staged, "w1"))
      assert(ids(root) == Set(1L, 99L))
    }
  }

  test("exactly one of two writers wins a version; the loser's marker attempt fails") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      Seq(1L).toDF("id").write.parquet(s"$root/data/v1-a-1")
      Seq(2L).toDF("id").write.parquet(s"$root/data/v1-b-1")
      assert(IndexCommit.tryCommitMarker(spark, root, 1L, "v1-a-1", "a"))
      assert(!IndexCommit.tryCommitMarker(spark, root, 1L, "v1-b-1", "b"))
      assert(ids(root) == Set(1L))
    }
  }

  test("two interleaved appenders both land — no lost update, any interleaving") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(0L).toDF("id"), root, "seed")
      val fa = Future(
        IndexMaintenance.appendVersioned(spark, Seq(101L).toDF("id"), root, "wa"))
      val fb = Future(
        IndexMaintenance.appendVersioned(spark, Seq(202L).toDF("id"), root, "wb"))
      val (va, vb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
      assert(Set(va, vb) == Set(2L, 3L), s"each appender owns one version: $va, $vb")
      assert(IndexCommit.committedVersion(spark, root).contains(3L))
      assert(ids(root) == Set(0L, 101L, 202L), "the rebased loser must carry the winner's rows")
    }
  }

  test("versioned delete publishes survivors; the prior snapshot stays on disk until vacuum") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L, 2L, 3L).toDF("id"), root, "w0")
      val v = IndexMaintenance.deleteRowsVersioned(
        spark, Seq(2L).toDF("id"), root, "id", "w0")
      assert(v == 2L && ids(root) == Set(1L, 3L))
      // time-travel read of the superseded version still works pre-vacuum
      val v1 = spark.read.parquet(s"$root/data/v1-w0-1").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(v1 == Set(1L, 2L, 3L))
    }
  }

  test("vacuum drops superseded snapshots, abandoned stagings, and their markers") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L).toDF("id"), root, "w0")
      IndexMaintenance.appendVersioned(spark, Seq(2L).toDF("id"), root, "w0")
      IndexMaintenance.appendVersioned(spark, Seq(3L).toDF("id"), root, "w0")
      // an outraced writer's abandoned staging dir — swept only once it is
      // older than the grace window (zero here to simulate age)
      Seq(9L).toDF("id").write.parquet(s"$root/data/v9-crashed-1")
      IndexCommit.vacuum(spark, root, keep = 2, unreferencedGraceMs = 0L)
      val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName).toSet
      assert(dataDirs == Set("v2-w0-1", "v3-w0-1"), s"got $dataDirs")
      val markers = new java.io.File(s"$root/manifest").listFiles().map(_.getName)
        .filter(_.startsWith("commit-")).toSet
      assert(markers == Set("commit-2", "commit-3"))
      assert(IndexCommit.committedVersion(spark, root).contains(3L))
      assert(ids(root) == Set(1L, 2L, 3L))
    }
  }

  test("vacuum spares an in-flight writer's fresh staging; its commit then lands intact") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L).toDF("id"), root, "w0")
      IndexMaintenance.appendVersioned(spark, Seq(2L).toDF("id"), root, "w0")
      // a concurrent writer has staged v3 but not yet attempted the marker
      val staged = "v3-inflight-1"
      Seq(1L, 2L, 3L).toDF("id").write.parquet(s"$root/data/$staged")
      // default grace window: the unreferenced-but-fresh staging survives
      IndexCommit.vacuum(spark, root, keep = 1)
      assert(new java.io.File(s"$root/data/$staged").exists(),
        "vacuum deleted a concurrent writer's in-flight snapshot")
      // the in-flight writer publishes; its pointer references intact data
      assert(IndexCommit.tryCommitMarker(spark, root, 3L, staged, "inflight"))
      assert(ids(root) == Set(1L, 2L, 3L))
    }
  }

  test("losing a marker race leaves no marker debris and the winner's pointer intact") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      Seq(1L).toDF("id").write.parquet(s"$root/data/v1-a-1")
      Seq(2L).toDF("id").write.parquet(s"$root/data/v1-b-1")
      assert(IndexCommit.tryCommitMarker(spark, root, 1L, "v1-a-1", "a"))
      assert(!IndexCommit.tryCommitMarker(spark, root, 1L, "v1-b-1", "b"))
      // ignore Hadoop's checksum sidecars (.commit-1.crc) — only real files count
      val names = new java.io.File(s"$root/manifest").listFiles()
        .map(_.getName).filterNot(_.startsWith(".")).toSet
      assert(names == Set("commit-1"), s"loser left debris: $names")
      assert(ids(root) == Set(1L), "the loser's attempt must not disturb the winner's pointer")
    }
  }

  test("a dead claim (empty marker) never wedges readers, writers, or vacuum") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L).toDF("id"), root, "w0")
      // simulate a writer that died between the exclusive create and the
      // pointer write: an empty commit-2 marker at the head of the chain
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      val marker = new org.apache.hadoop.fs.Path(s"$root/manifest/commit-2")
      fs.create(marker, false).close()
      // readers: the head resolves PAST the dead claim to v=1 — no throw
      assert(IndexCommit.committedVersion(spark, root).contains(1L))
      assert(ids(root) == Set(1L))
      // vacuum: does not throw; the young husk survives (grace), data intact
      IndexCommit.vacuum(spark, root, keep = 1)
      assert(fs.exists(marker), "young empty marker must survive vacuum")
      assert(ids(root) == Set(1L))
      // a writer with grace 0 reclaims the husk and lands ITS v=2
      val v = IndexCommit.commit(spark, root, "w1", emptyMarkerGraceMs = 0L) { base =>
        base.get.unionByName(Seq(7L).toDF("id"))
      }
      assert(v == 2L, s"reclaimed version expected 2, got $v")
      assert(ids(root) == Set(1L, 7L))
      // vacuum past grace sweeps any remaining husk without touching commits
      fs.create(new org.apache.hadoop.fs.Path(s"$root/manifest/commit-9"), false).close()
      IndexCommit.vacuum(spark, root, keep = 2, emptyMarkerGraceMs = 0L)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/manifest/commit-9")))
      assert(IndexCommit.committedVersion(spark, root).contains(2L))
      assert(ids(root) == Set(1L, 7L))
    }
  }

  test("diffVersions reports exactly the transition's delta, by change kind") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(spark, Seq(1L, 2L).toDF("id"), root, "w0")
      IndexMaintenance.appendVersioned(spark, Seq(3L).toDF("id"), root, "w0")
      IndexMaintenance.deleteRowsVersioned(spark, Seq(1L).toDF("id"), root, "id", "w0")
      def diff(a: Long, b: Long) = IndexCommit
        .diffVersions(spark, root, a, b)
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("change")))
        .toSet
      assert(diff(1L, 2L) == Set((3L, "added")))
      assert(diff(2L, 3L) == Set((1L, "removed")))
      assert(diff(1L, 3L) == Set((3L, "added"), (1L, "removed")))
      assert(diff(1L, 1L).isEmpty)
      // time travel still reads the superseded snapshots
      assert(IndexCommit.readVersion(spark, root, 1L).count() == 2L)
      assert(IndexCommit.readVersion(spark, root, 3L).count() == 2L)
    }
  }

  test("versioned compact preserves rows and resets the ingest column") {
    withTempDir { dir =>
      val root = s"$dir/idx"
      IndexMaintenance.appendVersioned(
        spark, Seq((1L, 0L), (2L, 1L)).toDF("id", "ingest_id"), root, "w0",
        partitionCols = Seq("ingest_id"))
      val v = IndexMaintenance.compactVersioned(
        spark, root, "w0", partitionCols = Seq("ingest_id"))
      assert(v == 2L)
      // partition columns come back type-inferred from directory names
      val rows = IndexCommit.readCommitted(spark, root).get._2
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Number]("ingest_id").longValue))
        .toSet
      assert(rows == Set((1L, 0L), (2L, 0L)))
    }
  }
}
