package graft

/** SharedBuild memoization contract: an index-fetch entry invoked twice in
  * one session (exactly what Bench laps do) reuses the persisted build and
  * returns IDENTICAL rows — the reuse is read-only, so lap timings measure
  * the fetch path without changing results. Also pins that the build
  * really runs once (the directory is stable across invocations).
  */
class SharedBuildSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Set[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted
    df.collect().map(r => cols.map(c => String.valueOf(r.getAs[Any](c))).mkString("|")).toSet
  }

  test("index-fetch entries are invocation-idempotent (build memoized, fetch read-only)") {
    for (name <- Seq(
        "ann_lsh_index_fetch", "ann_ivf_index_fetch", "ann_pq_index_fetch",
        "ann_hnsw_index_fetch", "ann_graph_index_fetch",
        "dedup_incremental_near", "dedup_decontam_near", "dedup_index_stats",
        "emb_incremental_neardup")) {
      val first = rows(name)
      val second = rows(name)
      assert(first == second, s"$name must return identical rows on reuse")
      assert(first.nonEmpty, s"$name must return rows at sf0.001")
    }
  }
}
