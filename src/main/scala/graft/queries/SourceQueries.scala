package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-format coverage — the engine ingests more than parquet.
  *
  * Each entry converts the documents table to another format ONCE (cached
  * under `target/graft_src_cache`, keyed by format + sf basename, rebuilt
  * only when the `_SUCCESS` marker is absent) and reads it back through the
  * corresponding Spark source with an explicit schema; the DuckDB oracle
  * reads the ORIGINAL parquet. A green row therefore proves the full
  * write→read round-trip (quoting, escaping, header handling, type parsing)
  * reproduces the parquet content exactly.
  *
  * Scale note: these sources are executor-parallel file scans exactly like
  * parquet (splittable by file; CSV additionally by range when multiLine is
  * off) — the round-trip here is a correctness harness, not a layout
  * recommendation. For 100 TB, columnar formats win; the point is that
  * text-format ingestion into that layout is proven.
  */
object SourceQueries {

  private val docsSql = "SELECT doc_id, text, lang, source, n_chars FROM documents"

  private def roundTrip(s: SparkSession, d: String, fmt: String): DataFrame = {
    val base = graft.Tables.documents(s, d)
    val sf = d.stripSuffix("/").split('/').last
    // cwd is the repo root in every driver flow; never write outside it
    val path = s"target/graft_src_cache/${fmt}_$sf"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val w = base.write.mode("overwrite")
      fmt match {
        // RFC-4180-style doubled quotes (escape = quote) + multiLine read:
        // correct even for text with embedded quotes/newlines/separators
        case "csv" => w.option("header", "true").option("escape", "\"").csv(path)
        case "json" => w.json(path)
        // gzip: the codec 100 TB archives actually arrive in. NOT splittable
        // — one task per file, so parallelism = file count; the write side
        // keeps the input partitioning (many files) for exactly that reason.
        case "json_gzip" => w.option("compression", "gzip").json(path)
        case "orc" => w.orc(path)
        // Spark 4's NATIVE XML source (spark-xml graduated into core) —
        // enterprise feed formats without an external package
        case "xml" => w.option("rootTag", "docs").option("rowTag", "doc").xml(path)
      }
    }
    fmt match {
      case "csv" =>
        s.read
          .schema(base.schema)
          .option("header", "true")
          .option("escape", "\"")
          .option("multiLine", "true")
          .csv(path)
      case "json" => s.read.schema(base.schema).json(path)
      case "json_gzip" => s.read.schema(base.schema).json(path)
      case "orc" => s.read.orc(path)
      case "xml" => s.read.schema(base.schema).option("rowTag", "doc").xml(path)
    }
  }

  /** Nested complex types through a text source: documents re-shaped as
    * `(doc_id, meta: struct(lang, source), toks: array(string))`, written as
    * JSON, read back with an explicit nested schema, then flattened. Proves
    * struct/array round-tripping — the shape real corpus metadata arrives
    * in — not just flat scalars; the oracle reads the flat original, so a
    * green row certifies the nesting cost nothing semantically.
    */
  private def nestedJson(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.documents(s, d)
    val sf = d.stripSuffix("/").split('/').last
    val path = s"target/graft_src_cache/nested_$sf"
    if (!new java.io.File(path, "_SUCCESS").exists())
      base
        .select(
          col("doc_id"),
          struct(col("lang"), col("source")).as("meta"),
          split(trim(col("text")), "\\s+").as("toks")
        )
        .write.mode("overwrite").json(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, meta STRUCT<lang: STRING, source: STRING>, toks ARRAY<STRING>"
    )
    s.read
      .schema(schema)
      .json(path)
      .select(
        col("doc_id"),
        col("meta.lang").as("lang"),
        col("meta.source").as("source"),
        size(col("toks")).cast("bigint").as("n_toks"),
        md5(array_join(col("toks"), " ")).as("toks_md5")
      )
  }

  /** Hive-partitioned parquet layout (`lang=<v>/` directories) — the standard
    * warehouse layout for a 100 TB corpus keyed by a low-cardinality column.
    * Written once per sf (same `_SUCCESS` cache rule as [[roundTrip]]); reads
    * recover `lang` from the directory name, and a `lang` filter prunes at
    * the FileIndex level so non-matching partitions are never even listed
    * into the scan (asserted in PlanQualitySpec).
    */
  private[graft] def partitionedDocs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val base = graft.Tables.documents(s, d)
    val sf = d.stripSuffix("/").split('/').last
    val path = s"target/graft_src_cache/partitioned_$sf"
    if (!new java.io.File(path, "_SUCCESS").exists())
      base.write.mode("overwrite").partitionBy("lang").parquet(path)
    s.read.parquet(path)
  }

  /** Raw line-delimited text: one document per line via `spark.read.text` —
    * the rawest ingestion path a text corpus arrives through (the synthetic
    * documents are single-line, so line = document holds). Only the text
    * column round-trips; the oracle projects the same single column.
    */
  private def textLines(s: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.documents(s, d)
    val sf = d.stripSuffix("/").split('/').last
    val path = s"target/graft_src_cache/text_$sf"
    if (!new java.io.File(path, "_SUCCESS").exists())
      base.select("text").write.mode("overwrite").text(path)
    s.read.text(path).withColumnRenamed("value", "text")
  }

  /** Schema evolution: two parquet batches with different schemas (a later
    * drop adds the `lang` column) merged by `mergeSchema` — earlier rows
    * backfill null. The inevitable 100 TB warehouse situation: producers
    * evolve, readers must not break.
    */
  private def schemaEvolution(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val base = graft.Tables.documents(s, d)
    val sf = d.stripSuffix("/").split('/').last
    val path = s"target/graft_src_cache/evolve_$sf"
    if (!new java.io.File(s"$path/b1", "_SUCCESS").exists()) {
      base.select(col("doc_id"), col("text"), lit(0).as("_batch"))
        .write.mode("overwrite").parquet(s"$path/b1")
      base.select(col("doc_id"), col("text"), col("lang"), lit(1).as("_batch"))
        .write.mode("overwrite").parquet(s"$path/b2")
    }
    s.read.option("mergeSchema", "true").parquet(s"$path/b1", s"$path/b2")
  }

  def entries: Seq[QEntry] = Seq(
    QEntry.sql(
      "src_schema_evolution",
      """SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang, 0 AS _batch FROM documents
        |UNION ALL SELECT doc_id, text, lang, 1 AS _batch FROM documents"""
        .stripMargin.replaceAll("\\s+", " ")
    )((s, d) => schemaEvolution(s, d)),
    QEntry.sql("src_text_docs", "SELECT text FROM documents")((s, d) => textLines(s, d)),
    QEntry.sql("src_json_docs", docsSql)((s, d) => roundTrip(s, d, "json")),
    QEntry.sql("src_csv_docs", docsSql)((s, d) => roundTrip(s, d, "csv")),
    QEntry.sql("src_orc_docs", docsSql)((s, d) => roundTrip(s, d, "orc")),
    QEntry.sql("src_json_gzip_docs", docsSql)((s, d) => roundTrip(s, d, "json_gzip")),
    QEntry.sql("src_xml_docs", docsSql)((s, d) => roundTrip(s, d, "xml")),
    QEntry.sql(
      "src_json_nested",
      """SELECT doc_id, lang, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks,
        |  md5(array_to_string(string_split_regex(trim(text), '\s+'), ' ')) AS toks_md5
        |FROM documents""".stripMargin.replaceAll("\\s+", " ")
    )((s, d) => nestedJson(s, d)),
    // partition-pruned aggregate over the lang=en directory only; the oracle
    // reads the ORIGINAL parquet, proving the partitioned write→read (incl.
    // the partition-column round-trip through directory names) is lossless.
    QEntry.sql(
      "src_partitioned_docs",
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en' GROUP BY source"""
        .stripMargin.replaceAll("\\s+", " ")
    ) { (s, d) =>
      import org.apache.spark.sql.functions._
      partitionedDocs(s, d)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("bigint").as("sum_chars"))
    }
  )
}
