package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark implementation plus (when the operator
  * is SQL-expressible) an equivalent ANSI SQL string the driver runs in DuckDB
  * over the same parquet tables. Column names are aliased identically on both
  * sides — the driver's compare sorts columns by name before hashing.
  *
  * Cross-engine determinism rules every entry follows:
  *   - double aggregates are `round(..., k)`-ed on BOTH sides (sum order
  *     differs between engines; rounding collapses the 1e-10 noise). Note
  *     rounding is mitigation, not proof: a mean/sum landing within 1e-10 of
  *     a round-boundary can still flip (and Spark's round() rounds the
  *     double's SHORTEST DECIMAL STRING, not its binary value — a second
  *     disagreement source at exact .5 strings). Where a boundary flip was
  *     actually observed (resampleFfill at sf0.1) the stat is computed in
  *     exact integer units instead — use that pattern if another entry ever
  *     goes boundary-flaky,
  *   - no raw timestamps in output — formatted to strings in UTC,
  *   - hash functions in oracled outputs restricted to md5 (identical hex in
  *     Spark and DuckDB); engine-internal hashes (xxhash64 etc.) appear only
  *     in rows-only entries.
  */
final case class QEntry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QEntry {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QEntry =
    QEntry(name, run, Some(oracle))

  /** Rows-only check (driver records row count, no DuckDB compare) — for
    * operators whose semantics aren't expressible in portable SQL.
    */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QEntry =
    QEntry(name, run, None)
}

/** Memoized per-(session, sfDir, key) build directories for entries whose
  * run is "build a persisted index, then answer FROM it": the build runs
  * once per process and every later invocation reuses the directory, so
  * Bench laps 2..N time the FETCH path the entry name describes instead of
  * re-paying an identical build per lap (and Bench's prewarm pass runs the
  * builds before lap 1, reported as an explicit setup cost). Verify calls
  * each entry once, so oracled results never see the memo. ONLY entries
  * that are read-only against the built directory may use this — a
  * lifecycle entry that mutates its index per run (forget/repair/ingest)
  * must keep its private per-run directory.
  */
object SharedBuild {
  private val dirs = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), String]

  def dir(s: SparkSession, d: String, key: String)(build: String => Unit): String =
    dirs.getOrElseUpdate((s, d, key), {
      val root = java.nio.file.Files.createTempDirectory(s"graft-$key").toString
      build(root)
      root
    })
}
