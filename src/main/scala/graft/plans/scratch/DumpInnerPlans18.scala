package graft.plans.scratch

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-18 INNER-plan evidence: the changed segments of the iterative
  * operators live BELOW a localCheckpoint, so entry-level explain dumps
  * show nothing (the round-17 dedup_prefix_join lesson). This driver
  * replays ONE round/segment of each touched loop — the before formulation
  * inlined verbatim from the pre-round-18 code, the after formulation as
  * the current code shapes it — and dumps both formatted plans. The plan
  * files are shape evidence; the primary performance evidence is the
  * job-count and same-sitting bench deltas in OPTIMIZATION_r18.md.
  */
object DumpInnerPlans18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Files.createDirectories(Paths.get("plans/r18"))
    def dump(name: String, df: DataFrame): Unit = {
      Files.writeString(
        Paths.get(s"plans/r18/$name.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim + "\n")
      println(s"wrote plans/r18/$name.txt")
    }

    // ---- connectedComponents: one label-propagation round -----------------
    // shared fixture: a checkpointed symmetric edge frame and a checkpointed
    // label frame, as both formulations see them mid-loop
    val edges = (1L to 2000L).map(i => (i, i + 1)).toDF("s", "d")
    val symOld = edges.union(edges.select(col("d"), col("s"))).localCheckpoint()
    val labelsOld = symOld.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    // BEFORE (round 17 code): 2-column union + min agg; convergence needs a
    // SEPARATE fingerprint aggregate job over the checkpointed result
    val msgsOld = symOld.join(labelsOld, symOld("d") === labelsOld("id"))
      .select(symOld("s").as("id"), col("comp"))
    val updatedOld = labelsOld.union(msgsOld)
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    dump("cc_round_before", updatedOld)
    dump("cc_round_probe_before",
      updatedOld.agg(sum(xxhash64(col("id"), col("comp")).cast("decimal(38,0)"))))
    // AFTER (round 18 code): edge frame pre-partitioned by the join key,
    // previous label rides as `_old`, changed-count observed on the round's
    // own action (CollectMetrics in-plan; no separate probe job exists)
    val symNew = edges.union(edges.select(col("d"), col("s")))
      .repartition(col("d")).localCheckpoint()
    val labelsNew = symNew.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    val obs = org.apache.spark.sql.Observation("dump_cc")
    val msgsNew = symNew.join(labelsNew, symNew("d") === labelsNew("id"))
      .select(symNew("s").as("id"), col("comp"))
    val updatedNew = labelsNew
      .select(col("id"), col("comp"), col("comp").as("_old"))
      .union(msgsNew.select(col("id"), col("comp"), lit(null).cast("long").as("_old")))
      .groupBy(col("id"))
      .agg(min(col("comp")).as("comp"), min(col("_old")).as("_old"))
      .observe(obs, sum(when(col("comp") < col("_old"), 1L).otherwise(0L)).as("n_changed"))
      .select(col("id"), col("comp"))
    dump("cc_round_after", updatedNew)

    // ---- labelPropagation: one vote round ---------------------------------
    val und = (1L to 500L).map(i => (i, i % 97 + 1)).toDF("u", "v")
    val fwd = und.select(col("u").cast("long").as("src"), col("v").cast("long").as("dst"))
    val both = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nodesL = both.select(col("src").as("node")).distinct()
    val eOld = both.union(nodesL.select(col("node").as("src"), col("node").as("dst")))
      .localCheckpoint()
    val lbl0 = nodesL.select(col("node"), col("node").as("lbl")).localCheckpoint()
    // BEFORE: (count DESC, label ASC) winner via row_number window
    val wOld = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("c").desc, col("lbl"))
    dump("lpa_round_before",
      eOld.join(lbl0.select(col("node").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("_rn", row_number().over(wOld)).filter(col("_rn") === 1)
        .select("node", "lbl"))
    // AFTER: min(struct(−count, label)) argmax — partial-aggregating, no sort
    val eNew = both.union(nodesL.select(col("node").as("src"), col("node").as("dst")))
      .repartition(col("src")).localCheckpoint()
    dump("lpa_round_after",
      eNew.join(lbl0.select(col("node").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min(struct((-col("c")).as("_nc"), col("lbl").as("lbl"))).as("_m"))
        .select(col("node"), col("_m.lbl").as("lbl")))
    spark.stop()
  }
}
