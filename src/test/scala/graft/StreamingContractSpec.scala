package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.SourceOffsets
import graft.streaming.SourceOffsets.Epoch

/** The source-agnostic offset + epoch contract (graft.streaming.SourceOffsets)
  * — what a message bus would provide, proven without a broker: epochs are
  * claimed in an offset WAL before processing, land through the idempotent
  * `_batch=` sink, and a simulated driver restart at EVERY crash point
  * (before the log, between log and sink, after sink) converges to
  * exactly-once sink contents. The same protocol drives two different
  * source implementations to show `fetch` is the only source-specific code.
  */
class StreamingContractSpec extends SparkSpec {
  import spark.implicits._

  private def sinkRows(sinkPath: String): Seq[Long] =
    spark.read.parquet(sinkPath).select("seq").collect().map(_.getLong(0)).toSeq.sorted

  /** a seekable "topic": rows keyed by a monotone seq, range-fetchable. */
  private def tableSource(path: String): (Long, Long) => DataFrame = { (s, e) =>
    spark.read.parquet(path).filter(col("seq") >= s && col("seq") < e)
  }

  test("epochs advance over a growing source and land each row exactly once") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 10L).toDF("seq").write.parquet(src)
      val e0 = SourceOffsets.runEpoch(spark, log, sink, 10L, tableSource(src))
      assert(e0.contains(Epoch(0, 0, 10)))
      // source grows; next epoch picks up exactly the delta
      (10L until 25L).toDF("seq").write.mode("append").parquet(src)
      val e1 = SourceOffsets.runEpoch(spark, log, sink, 25L, tableSource(src))
      assert(e1.contains(Epoch(1, 10, 25)))
      // no fresh data → no epoch
      assert(SourceOffsets.runEpoch(spark, log, sink, 25L, tableSource(src)).isEmpty)
      assert(sinkRows(sink) == (0L until 25L))
    }
  }

  test("a crash between offset log and sink commit replays the LOGGED range, not the grown source") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 10L).toDF("seq").write.parquet(src)
      SourceOffsets.runEpoch(spark, log, sink, 10L, tableSource(src))
      // simulate the crash: epoch 1 is logged for [10, 20) but the driver
      // dies before the sink write
      assert(SourceOffsets.logEpoch(spark, log, Epoch(1, 10, 20)))
      (10L until 30L).toDF("seq").write.mode("append").parquet(src)
      // restart: the recovery step must replay [10, 20) even though the
      // source now holds rows to 30 — the logged range is the truth
      val replayed = SourceOffsets.runEpoch(spark, log, sink, 30L, tableSource(src))
      assert(replayed.contains(Epoch(1, 10, 20)))
      assert(sinkRows(sink) == (0L until 20L))
      // the following epoch then picks up the remainder — no gap, no overlap
      val e2 = SourceOffsets.runEpoch(spark, log, sink, 30L, tableSource(src))
      assert(e2.contains(Epoch(2, 20, 30)))
      assert(sinkRows(sink) == (0L until 30L))
    }
  }

  test("a replay after a committed epoch is an idempotent no-op — zero duplicates") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 12L).toDF("seq").write.parquet(src)
      SourceOffsets.runEpoch(spark, log, sink, 12L, tableSource(src))
      // an at-least-once driver re-fires the same epoch after commit — the
      // _SUCCESS guard swallows it (simulate by re-running with no growth
      // after deleting nothing)
      assert(SourceOffsets.runEpoch(spark, log, sink, 12L, tableSource(src)).isEmpty)
      // and even a forced re-delivery of epoch 0 cannot duplicate: the sink
      // partition already carries _SUCCESS
      graft.streaming.StreamingOps.idempotentAppend(sink)(
        tableSource(src)(0L, 12L), 0L)
      assert(sinkRows(sink) == (0L until 12L))
      assert(sinkRows(sink).distinct.size == 12)
    }
  }

  test("a concurrent driver losing the epoch claim defers to the winner's log") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 8L).toDF("seq").write.parquet(src)
      // driver A claims epoch 0 for [0, 5) and dies pre-sink
      assert(SourceOffsets.logEpoch(spark, log, Epoch(0, 0, 5)))
      // driver B wakes with MORE data visible; it must honor A's claim
      // first (replay [0,5)), not double-claim epoch 0
      val r = SourceOffsets.runEpoch(spark, log, sink, 8L, tableSource(src))
      assert(r.contains(Epoch(0, 0, 5)))
      val r2 = SourceOffsets.runEpoch(spark, log, sink, 8L, tableSource(src))
      assert(r2.contains(Epoch(1, 5, 8)))
      assert(sinkRows(sink) == (0L until 8L))
    }
  }

  test("bounded admission: a burst splits into capped epochs; union equals the uncapped run") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      // the job was down while the source grew by 20 rows — one uncapped
      // epoch would make the whole backlog the replay unit
      (0L until 20L).toDF("seq").write.parquet(src)
      val got = Iterator
        .continually(SourceOffsets.runEpoch(
          spark, log, sink, 20L, tableSource(src), maxRowsPerEpoch = 6L))
        .takeWhile(_.nonEmpty)
        .flatten
        .toSeq
      assert(got == Seq(Epoch(0, 0, 6), Epoch(1, 6, 12), Epoch(2, 12, 18), Epoch(3, 18, 20)),
        got.toString)
      assert(sinkRows(sink) == (0L until 20L))
      // replay semantics unchanged under the cap: crash a capped epoch
      // pre-sink, the restart replays ITS logged range, then advances capped
      assert(SourceOffsets.logEpoch(spark, log, Epoch(4, 20, 23)))
      (0L until 29L).toDF("seq").write.mode("overwrite").parquet(src)
      assert(SourceOffsets.runEpoch(spark, log, sink, 29L, tableSource(src), 6L)
        .contains(Epoch(4, 20, 23)))
      assert(SourceOffsets.runEpoch(spark, log, sink, 29L, tableSource(src), 6L)
        .contains(Epoch(5, 23, 29)))
      assert(sinkRows(sink) == (0L until 29L))
    }
  }

  test("a live peer's in-flight epoch is deferred to, not raced (replay lease)") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 8L).toDF("seq").write.parquet(src)
      // peer A just claimed epoch 0 and is mid-processing (log file fresh,
      // sink uncommitted): a lease-guarded step must NOT replay its range —
      // two writers overwriting one _batch= partition can interleave
      // FileOutputCommitter commits under a single _SUCCESS marker
      assert(SourceOffsets.logEpoch(spark, log, Epoch(0, 0, 5)))
      val deferred = SourceOffsets.runEpoch(
        spark, log, sink, 8L, tableSource(src), replayLeaseMs = 600000L)
      assert(deferred.isEmpty, s"must defer to the live peer, got $deferred")
      // the peer turns out dead: past the lease (0 here) the replay runs
      val replayed = SourceOffsets.runEpoch(spark, log, sink, 8L, tableSource(src))
      assert(replayed.contains(Epoch(0, 0, 5)))
      assert(sinkRows(sink) == (0L until 5L))
    }
  }

  test("two concurrent steps: exactly one claims, the loser defers, sink lands once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 8L).toDF("seq").write.parquet(src)
      val step = () => SourceOffsets.runEpoch(
        spark, log, sink, 8L, tableSource(src), replayLeaseMs = 600000L)
      val results = Await.result(
        Future.sequence(Seq(Future(step()), Future(step()))), 120.seconds)
      val ran = results.flatten
      // every interleaving is exactly-once: one driver claims [0,8) and the
      // other defers (loses the create race, or sees the fresh in-flight
      // claim, or arrives after the commit and has nothing to do)
      assert(ran.size == 1 && ran.head == Epoch(0, 0, 8), results.toString)
      assert(sinkRows(sink) == (0L until 8L))
    }
  }

  test("the same protocol drives a different source implementation unchanged") {
    withTempDir { dir =>
      val log = s"$dir/offsets"; val sink = s"$dir/sink"
      // an in-memory generator source: fetch materializes the range itself
      // (what a Kafka consumer's poll(range) adapter would return)
      val generator: (Long, Long) => DataFrame = { (s, e) =>
        val sess = spark; import sess.implicits._
        (s until e).toDF("seq")
      }
      assert(SourceOffsets.runEpoch(spark, log, sink, 7L, generator).contains(Epoch(0, 0, 7)))
      assert(SourceOffsets.logEpoch(spark, log, Epoch(1, 7, 9))) // crash pre-sink
      assert(SourceOffsets.runEpoch(spark, log, sink, 14L, generator).contains(Epoch(1, 7, 9)))
      assert(SourceOffsets.runEpoch(spark, log, sink, 14L, generator).contains(Epoch(2, 9, 14)))
      assert(sinkRows(sink) == (0L until 14L))
    }
  }

  test("an empty epoch husk (claimant died between create and write) never wedges recovery") {
    withTempDir { dir =>
      val src = s"$dir/topic"; val log = s"$dir/offsets"; val sink = s"$dir/sink"
      (0L until 20L).toDF("seq").write.parquet(src)
      SourceOffsets.runEpoch(spark, log, sink, 10L, tableSource(src))

      // a claimant hard-killed after the exclusive create but before the
      // content write: epoch-1 exists as a zero-byte husk
      val huskPath = new org.apache.hadoop.fs.Path(log, "epoch-1")
      val fs = huskPath.getFileSystem(spark.sessionState.newHadoopConf())
      fs.create(huskPath, false).close()

      // within the grace window the husk may be a live peer mid-write:
      // lastLogged resumes from the previous fully-logged epoch (no
      // MatchError), and the scheduler DEFERS rather than reclaiming
      assert(SourceOffsets.lastLogged(spark, log).map(_.id).contains(0L))
      assert(SourceOffsets.runEpoch(spark, log, sink, 20L, tableSource(src)).isEmpty,
        "a fresh husk must be deferred to, not reclaimed")
      assert(fs.exists(huskPath), "fresh husk must survive the deferral")

      // age the husk past the grace window: it is a corpse — reclaimed, the
      // id re-claimed, and the epoch runs with the normal range
      val corpseAge = System.currentTimeMillis() - SourceOffsets.EmptyEpochGraceMs - 1000L
      fs.setTimes(huskPath, corpseAge, corpseAge)
      val ran = SourceOffsets.runEpoch(spark, log, sink, 20L, tableSource(src))
      assert(ran.contains(Epoch(1, 10, 20)), s"husk not reclaimed: $ran")
      assert(sinkRows(sink) == (0L until 20L), "exactly-once contents after reclaim")
      // the reclaimed id is now a REAL log entry — recovery reads it directly
      assert(SourceOffsets.lastLogged(spark, log).contains(Epoch(1, 10, 20)))
    }
  }
}
