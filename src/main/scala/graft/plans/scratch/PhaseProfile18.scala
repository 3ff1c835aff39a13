package graft.plans.scratch

import org.apache.spark.sql.functions._

/** Round-18 scratch phase profiler for the dedup lifecycle entries:
  * replays dedup_state_diff and pipe_incremental_disposition stage by
  * stage with wall timers, twice (cold + warm), so the fat stage is
  * attributable. Run: SPARK_GRAFT_CPUS=32 sbt "runMain ...PhaseProfile18"
  */
object PhaseProfile18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.functions.TextAnalysis

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    })
    def t[A](label: String)(body: => A): A = {
      Thread.sleep(200)
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[phase] $label%-28s $sec%.2f s  jobs=${jobs - j0}")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"=== dedup_state_diff rep$rep ===")
      val docs = graft.Tables.documents(spark, sfDir)
      val dir = java.nio.file.Files.createTempDirectory("graft-prof-sdiff").toString
      val corpus = docs
        .select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      t("buildMinhashIndex")(Dedup.buildMinhashIndex(corpus, "doc_id", "text", s"$dir/idx"))
      val cl = t("clustersFromMinhashIndex")(
        Dedup.clustersFromMinhashIndex(spark, s"$dir/idx").localCheckpoint())
      t("writeClusterState s0")(Dedup.writeClusterState(cl, "id", "cluster_id", s"$dir/s0"))
      val batch = docs
        .filter(col("doc_id") % 200 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      t("appendMinhashIndex")(Dedup.appendMinhashIndex(batch, "doc_id", "text", s"$dir/idx", 1L))
      val inc = t("incrementalClusters")(
        Dedup.incrementalClusters(batch, "doc_id", "text", s"$dir/idx", s"$dir/s0")
          .localCheckpoint())
      t("writeClusterState s1")(Dedup.writeClusterState(inc, "id", "cluster_id", s"$dir/s1"))
      val deleted = docs.filter(col("doc_id") % 200 === 0).select(col("doc_id").as("id"))
      t("deleteFromMinhashIndex")(Dedup.deleteFromMinhashIndex(spark, deleted, s"$dir/idx"))
      val rep2 = t("repairClusterState")(
        Dedup.repairClusterState(spark, deleted, s"$dir/idx", s"$dir/s1").localCheckpoint())
      t("writeClusterState s2")(Dedup.writeClusterState(rep2, "id", "cluster_id", s"$dir/s2"))
      t("clusterStateDiff+noop")(
        Dedup.clusterStateDiff(spark, s"$dir/s0", s"$dir/s2")
          .write.format("noop").mode("overwrite").save())
    }

    (1 to 2).foreach { rep =>
      println(s"=== pipe_incremental_disposition rep$rep ===")
      val docs = graft.Tables.documents(spark, sfDir)
      val dir = java.nio.file.Files.createTempDirectory("graft-prof-incdisp").toString
      val corpus = docs
        .select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      t("buildMinhashIndex")(Dedup.buildMinhashIndex(corpus, "doc_id", "text", s"$dir/idx"))
      val cl = t("clustersFromMinhashIndex")(
        Dedup.clustersFromMinhashIndex(spark, s"$dir/idx").localCheckpoint())
      t("writeClusterState")(Dedup.writeClusterState(cl, "id", "cluster_id", s"$dir/state"))
      val batch = docs
        .filter(col("doc_id") % 200 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 137 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), reverse(col("text")).as("text")))
      val assign = t("incrementalClusters")(
        Dedup.incrementalClusters(batch, "doc_id", "text", s"$dir/idx", s"$dir/state")
          .select(col("id").as("doc_id"), col("cluster_id")).localCheckpoint())
      t("quality join+noop")(
        batch
          .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
          .join(assign, "doc_id")
          .select(col("doc_id"), col("cluster_id"), col("quality"),
            when(col("cluster_id") =!= col("doc_id"), "dup")
              .when(col("quality") < 0.6, "low_quality")
              .otherwise("kept").as("disposition"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
