package graft

/** The guard that would have caught round 8's silent loss immediately: every
  * declared driver entry must at least CONSTRUCT its DataFrame (Spark analysis
  * is eager at Dataset creation) against the real testdata layout. A plan-time
  * throw — schema drift in a table reader, an unresolved column, a bad
  * expression — fails this suite by name instead of silently dropping the
  * entry from the round's correctness report.
  *
  * Mostly analysis-only: for declarative entries nothing executes, so the
  * contract checks in seconds even as the entry count grows. A handful of
  * entries are EAGER at construction by design — the two-phase selection
  * pair (q_kth_element/q_exact_quartiles: driver-histogram actions),
  * localCheckpoint-pinned shapes (dedup pair joins, globalRowNumber users)
  * — and run bounded sf0.001 jobs here; their plan-time failures still
  * surface by name, which is this suite's contract.
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

  test("Verify failure path: a throwing query lands in the error manifest, loudly") {
    withTempDir { dir =>
      val good: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
        (s, _) => s.range(3).toDF("n")
      val bad: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
        (_, _) => throw new IllegalStateException("boom\nsecond line")
      val errors = Verify.dumpAll(spark, Seq("ok_entry" -> good, "bad_entry" -> bad), "unused", dir)
      assert(errors.keySet == Set("bad_entry"))
      assert(errors("bad_entry").contains("IllegalStateException"))
      assert(new java.io.File(s"$dir/ok_entry").exists(), "good query still dumped")
      val json = Verify.writeErrorManifest(dir, errors)
      assert(json.contains("\"bad_entry\"") && !json.contains("\n"), json)
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/errors.json")) == json)
      // clean run → empty object, file still present
      val clean = Verify.writeErrorManifest(dir, scala.collection.mutable.LinkedHashMap.empty)
      assert(clean == "{}")
    }
  }

  test("entry flagship runs and returns rows at sf0.001") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing on this host")
    assert(SparkEntry.entry(spark).limit(1).count() >= 0)
  }
}
