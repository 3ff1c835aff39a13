package graft.plans.scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-18 scratch profiler (not part of the library surface): for each
  * named entry, runs it through the noop sink and reports
  *   - wall seconds (construct / total split),
  *   - number of Spark jobs triggered (construction-eager + action),
  *   - sum of job wall times,
  * so driver-side gaps (analysis, planning, barrier latency) are visible as
  * wall − jobs. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.plans.scratch.Profile18 <name>[,name...] [reps]"
  */
object Profile18 {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1; starts(js.jobId) = System.nanoTime()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach(t0 => jobNanos += System.nanoTime() - t0)
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        // settle listener state
        Thread.sleep(300) // let the listener bus drain
        jobs = 0; jobNanos = 0L
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        Thread.sleep(300) // let the listener bus drain
        println(
          f"[profile] $name rep$r construct=${(t1 - t0) / 1e9}%.3f action=${(t2 - t1) / 1e9}%.3f " +
            f"total=${(t2 - t0) / 1e9}%.3f jobs=$jobs jobSec=${jobNanos / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
