package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query to `outDir/<name>` parquet and return the error
    * manifest (name → exception summary). Failures must be LOUD: a query
    * that throws gets a manifest row so a missing correctness row is always
    * distinguishable from a passing one — round 8 lost 42 entries silently
    * because a skipped query left no artifact at all. Factored from main so
    * the failure path itself is unit-testable.
    */
  private[graft] def dumpAll(
      spark: SparkSession,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      sfDir: String,
      outDir: String
  ): collection.SeqMap[String, String] = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(3).mkString(" | ")
        errors(name) = s"${e.getClass.getSimpleName}: $msg"
        System.err.println(s"[verify] FAILED $name: ${errors(name)}")
      }
    }
    errors
  }

  /** Render and write the error manifest — ALWAYS written (empty object when
    * clean) so its absence is itself a signal that Verify never completed.
    */
  private[graft] def writeErrorManifest(
      outDir: String,
      errors: collection.SeqMap[String, String]
  ): String = {
    val json = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), json)
    json
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names — dump (and emit oracle
    // SQL for) just those, for fast local iteration on a single entry
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = dumpAll(spark, SparkEntry.queries.filter(e => keep(e._1)).toSeq, sfDir, outDir)
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full contract name list, UNFILTERED — the authoritative input for
    // tools/audit_survey.py's §2.6 index (a name-filtered dump must still
    // advertise the whole contract or the index drifts)
    Files.writeString(
      Paths.get(s"$outDir/entry_names.json"),
      SparkEntry.queries.keys.map(q).mkString("[", ",", "]")
    )
    writeErrorManifest(outDir, errors)
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} FAILED entries: ${errors.keys.mkString(", ")}")
    }
    spark.stop()
  }
}
