package graft

/** The guard that would have caught round 8's silent loss immediately: every
  * declared driver entry must at least CONSTRUCT its DataFrame (Spark analysis
  * is eager at Dataset creation) against the real testdata layout. A plan-time
  * throw — schema drift in a table reader, an unresolved column, a bad
  * expression — fails this suite by name instead of silently dropping the
  * entry from the round's correctness report.
  *
  * Analysis-only: nothing is executed, so the whole contract checks in
  * seconds even as the entry count grows.
  */
class ContractCompletenessSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry.queries entry constructs (analyzes) against sf0.001") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing on this host")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} entries fail at plan time:\n  ${failures.mkString("\n  ")}")
  }

  test("every oracleSql key has a queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries entry: $orphans")
  }

  test("entry flagship runs and returns rows at sf0.001") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing on this host")
    assert(SparkEntry.entry(spark).limit(1).count() >= 0)
  }
}
