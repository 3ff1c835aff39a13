package graft.catalog

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  Column, SupportsDelete, SupportsRead, SupportsRowLevelOperations, SupportsWrite,
  Table, TableCapability
}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  Write, WriteBuilder, WriterCommitMessage
}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.FragmentEngine

/** The INSERT surface over a fragment dataset — `INSERT INTO
  * graft.range_ratings VALUES (u, m, r, NULL, NULL)` routes through the
  * engine's DUAL-WRITE semantics (master + the one fragment whose interval
  * contains the rating, boundary rule included; round-robin inserts advance
  * the metadata counter), never a bare parquet append that would bypass the
  * routing invariant.
  *
  * Reads delegate untouched to the stock parquet v2 table, so both pruning
  * tiers keep composing (GraftTableCatalogSpec).
  *
  * Scale contract, stated: the inserted rows ride to the driver inside the
  * task commit messages and are routed there, because fragment routing IS
  * driver-side metadata arithmetic (the reference's singleton INSERT,
  * `Interface1.py:225-256`) — exactly right for `INSERT … VALUES`
  * (metadata-sized by construction) and WRONG for bulk loads, which is why
  * each task hard-caps its row count and points bulk writers at the
  * engine's batch router ([[FragmentEngine.roundRobinInsertBatch]] /
  * streaming ingest), the path that writes fragments as one distributed
  * job. The engine-derived columns (`_rowid`, `part`) must arrive NULL —
  * an explicit value would be silently replaced by routing, so it is
  * rejected instead.
  */
class FragmentWritableTable(
    /** the stock parquet v2 table serving reads — exposed so plan rules
      * (DeriveFragmentPruning) can unwrap to the FileTable identity
      */
    val delegate: Table,
    warehouse: String,
    dataset: String,
    masterTable: String
) extends Table
    with SupportsRead
    with SupportsWrite
    with SupportsDelete
    with SupportsRowLevelOperations {

  override def name(): String = delegate.name()
  override def schema(): StructType = delegate.schema()
  override def columns(): Array[Column] = delegate.columns()
  override def partitioning(): Array[Transform] = delegate.partitioning()
  override def properties(): util.Map[String, String] = delegate.properties()

  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability](delegate.capabilities())
    caps.add(TableCapability.BATCH_WRITE)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.asInstanceOf[SupportsRead].newScanBuilder(options)

  /** The SQL DELETE surface: translatable predicates route to the engine's
    * partition-granular copy-on-write delete, which removes each matching
    * row from master AND exactly the fragment it routed to
    * ([[FragmentEngine.deleteWhereStrict]]). An untranslatable condition
    * makes `canDeleteWhere` return false, and Spark falls back to the
    * row-level rewrite ([[FragmentRowLevelOperation]]) — complex deletes
    * still apply exactly, never a silently narrowed predicate.
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => FragmentWritableTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val cond = filters.toSeq
      .map(f => FragmentWritableTable.filterToColumn(f).getOrElse(
        throw new UnsupportedOperationException(s"unsupported DELETE predicate: $f")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true)) // unconditional DELETE
    val engine = new FragmentEngine(SparkSession.active, warehouse)
    engine.deleteWhereStrict(dataset, masterTable, cond)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new FragmentBatchWrite(schema, warehouse, dataset, masterTable)
      }
    }
  }

  /** The SQL UPDATE / MERGE surface: group-based copy-on-write where the
    * one replacement group is the WHOLE dataset. The rewrite scan is
    * deliberately pushdown-blind (a pushed filter could let parquet skip
    * entire files, whose rows the replacement would then drop), so every
    * row flows through the statement and the commit rebuilds master and
    * fragments with the routing invariant intact — an UPDATE that moves a
    * rating across a fragment boundary MOVES the row, and a MERGE insert
    * routes exactly like `INSERT INTO` (engine-derived `_rowid`/`part` must
    * arrive NULL). Spark still prefers the metadata [[deleteWhere]] path
    * for DELETEs whose predicates translate; only complex deletes fall back
    * to this rewrite.
    *
    * Scale contract: DISTRIBUTED, unlike INSERT. A rewrite is dataset-sized
    * by construction (the whole replacement group flows through it), so
    * tasks spill their slice of the stream straight to per-task staging
    * files on the warehouse filesystem — no row rides a commit message —
    * and the driver commit re-reads the winners' files as a DataFrame and
    * routes them through the engine's joins-only replace
    * ([[FragmentEngine.replaceDatasetDistributed]]). The per-task row cap
    * stays on the INSERT surface only, where VALUES-sized really is the
    * contract.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new FragmentRowLevelOperation(delegate, warehouse, dataset, masterTable, info.command())
    }
}

private class FragmentRowLevelOperation(
    delegate: Table,
    warehouse: String,
    dataset: String,
    masterTable: String,
    cmd: RowLevelOperation.Command
) extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd

  /** Pushdown-blind wrapper: implements ONLY ScanBuilder, so Catalyst can
    * neither push filters nor prune columns — the full dataset reaches the
    * rewrite, which is the correctness contract of whole-dataset groups.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val inner = delegate.asInstanceOf[SupportsRead].newScanBuilder(options)
    new ScanBuilder { override def build(): Scan = inner.build() }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    val queryId = info.queryId()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new FragmentReplaceBatchWrite(schema, warehouse, dataset, masterTable, queryId)
      }
    }
  }
}

object FragmentWritableTable {
  import org.apache.spark.sql.{functions => F, sources => S, Column => C}

  /** v1 data-source Filter → Column, total over the shapes SQL DELETE
    * conditions push (None = untranslatable, surfaced via canDeleteWhere).
    */
  private[catalog] def filterToColumn(f: S.Filter): Option[C] = f match {
    case S.AlwaysTrue() => Some(F.lit(true))
    case S.AlwaysFalse() => Some(F.lit(false))
    case S.EqualTo(a, v) => Some(F.col(a) === F.lit(v))
    case S.EqualNullSafe(a, v) => Some(F.col(a) <=> F.lit(v))
    case S.GreaterThan(a, v) => Some(F.col(a) > F.lit(v))
    case S.GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case S.LessThan(a, v) => Some(F.col(a) < F.lit(v))
    case S.LessThanOrEqual(a, v) => Some(F.col(a) <= F.lit(v))
    case S.In(a, vs) => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case S.IsNull(a) => Some(F.col(a).isNull)
    case S.IsNotNull(a) => Some(F.col(a).isNotNull)
    case S.StringStartsWith(a, v) => Some(F.col(a).startsWith(v))
    case S.StringEndsWith(a, v) => Some(F.col(a).endsWith(v))
    case S.StringContains(a, v) => Some(F.col(a).contains(v))
    case S.And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case S.Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case S.Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }
}

/** Commit message naming the staging file one WINNING rewrite task wrote
  * (None when the task saw no rows). Carrying paths instead of rows is what
  * keeps the rewrite distributed — and reading ONLY the committed winners'
  * files makes speculative or retried attempts harmless: a loser's orphan
  * file is never read and is swept with the staging directory.
  */
private case class FragmentRewriteFile(path: Option[String]) extends WriterCommitMessage

/** The ReplaceData write of [[FragmentRowLevelOperation]]: tasks spill the
  * statement's full output (the whole-dataset group, post-update) to
  * per-task staging files, the driver commit re-reads the winners' files
  * and swaps the dataset through the engine's validate-first distributed
  * replace — nothing lands on a failed statement, and no row rides the
  * driver.
  */
private class FragmentReplaceBatchWrite(
    schema: StructType,
    warehouse: String,
    dataset: String,
    masterTable: String,
    queryId: String
) extends BatchWrite {

  private val stagingDir = s"$warehouse/_rewrite_staging/$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FragmentReplaceWriterFactory(schema, stagingDir)

  /** The staging-file schema ([[FragmentReplaceWriterFactory]]'s line
    * format): ints/longs verbatim, rating via Double.toString — which
    * round-trips exactly through the CSV reader's Double.parseDouble —
    * and NULLs as empty fields (the reader's default nullValue).
    */
  private def stagingSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("userid", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("movieid", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("rating", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("_rowid", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.IntegerType)))

  private def cleanup(): Unit = {
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    fs.delete(p, true)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val paths = messages.iterator
      .collect { case FragmentRewriteFile(Some(p)) => p }
      .toSeq
    val rewrite =
      if (paths.isEmpty)
        spark.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](), stagingSchema)
      else spark.read.schema(stagingSchema).csv(paths: _*)
    val engine = new FragmentEngine(spark, warehouse)
    try engine.replaceDatasetDistributed(dataset, masterTable, rewrite)
    finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()
}

private class FragmentReplaceWriterFactory(schema: StructType, stagingDir: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val useridAt = schema.fieldIndex("userid")
      private val movieidAt = schema.fieldIndex("movieid")
      private val ratingAt = schema.fieldIndex("rating")
      private val rowidAt = schema.fieldIndex("_rowid")
      private val partAt = schema.fieldIndex("part")
      // taskId is unique per ATTEMPT, so retries and speculative twins never
      // collide on a path; only the committed attempt's file is ever read
      private val path = new org.apache.hadoop.fs.Path(
        stagingDir, f"rewrite-$partitionId%05d-$taskId.csv")
      private var out: java.io.BufferedWriter = _

      private def stream(): java.io.BufferedWriter = {
        if (out == null) {
          val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
          out = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(fs.create(path, true), "UTF-8"))
        }
        out
      }

      override def write(row: InternalRow): Unit = {
        // ReplaceData rows arrive UNPROJECTED: the rewrite plan (MergeRows /
        // the update Project) prepends a __row_operation marker that the
        // LogicalWriteInfo schema does not carry, and Spark applies the
        // stripping rowProjection only on the requested-metadata task. The
        // data columns follow in schema order, so offset by the surplus.
        val off = row.numFields - schema.length
        require(off == 0 || off == 1,
          s"unexpected rewrite row arity ${row.numFields} for schema ${schema.length}")
        val rowid =
          if (row.isNullAt(off + rowidAt)) "" else row.getLong(off + rowidAt).toString
        val part =
          if (row.isNullAt(off + partAt)) "" else row.getInt(off + partAt).toString
        val w = stream()
        w.write(s"${row.getInt(off + useridAt)},${row.getInt(off + movieidAt)}," +
          s"${row.getDouble(off + ratingAt)},$rowid,$part")
        w.newLine()
      }

      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        FragmentRewriteFile(if (out != null) Some(path.toString) else None)
      }

      override def abort(): Unit = {
        if (out != null) out.close()
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.delete(path, false)
      }

      override def close(): Unit = ()
    }
}

/** Commit message carrying one task's (userid, movieid, rating) rows. */
private case class FragmentInsertRows(rows: Seq[(Int, Int, Double)])
    extends WriterCommitMessage

private class FragmentBatchWrite(
    schema: StructType,
    warehouse: String,
    dataset: String,
    masterTable: String
) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FragmentInsertWriterFactory(schema)

  /** Nothing lands until the driver commit: task "writes" only buffer, and
    * the commit routes through the engine's validate-everything-first batch
    * inserts, so a statement that fails validation (task-phase row checks
    * here, table/metadata/routing checks inside the engine) leaves master
    * and fragments untouched — never a prefix of its rows. The one
    * remaining exposure, shared with every non-transactional multi-file
    * sink, is a filesystem fault mid-append; see
    * [[FragmentEngine.rangeInsertAllStrict]].
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator
      .collect { case m: FragmentInsertRows => m.rows }
      .flatten
      .toSeq
    val engine = new FragmentEngine(SparkSession.active, warehouse)
    if (dataset == FragmentEngine.RangeDataset)
      engine.rangeInsertAllStrict(masterTable, rows)
    else engine.roundRobinInsertAllStrict(masterTable, rows)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class FragmentInsertWriterFactory(schema: StructType)
    extends DataWriterFactory {

  /** `INSERT … VALUES` stays metadata-sized; a bulk INSERT SELECT through
    * this surface would turn the driver into the data path, so it is
    * refused with a pointer at the engine's distributed batch router.
    */
  private val MaxRowsPerTask = 10000

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val useridAt = schema.fieldIndex("userid")
      private val movieidAt = schema.fieldIndex("movieid")
      private val ratingAt = schema.fieldIndex("rating")
      private val rowidAt = schema.fieldNames.indexOf("_rowid") match { case -1 => None; case i => Some(i) }
      private val partAt = schema.fieldNames.indexOf("part") match { case -1 => None; case i => Some(i) }
      private val buf = ArrayBuffer.empty[(Int, Int, Double)]

      override def write(row: InternalRow): Unit = {
        require(
          buf.size < MaxRowsPerTask,
          s"INSERT through the catalog surface is for VALUES-sized statements " +
            s"(> $MaxRowsPerTask rows per task): bulk-load through " +
            "FragmentEngine.roundRobinInsertBatch / the streaming router instead"
        )
        rowidAt.foreach(i => require(
          row.isNullAt(i),
          "_rowid is engine-derived (the insert sequence): INSERT NULL for it"))
        partAt.foreach(i => require(
          row.isNullAt(i),
          "part is engine-derived (fragment routing): INSERT NULL for it"))
        buf += ((row.getInt(useridAt), row.getInt(movieidAt), row.getDouble(ratingAt)))
      }

      override def commit(): WriterCommitMessage = FragmentInsertRows(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
