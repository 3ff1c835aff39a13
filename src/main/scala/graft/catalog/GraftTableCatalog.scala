package graft.catalog

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{
  Column, Identifier, Table, TableCatalog, TableChange
}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-V2 catalog plugin: the production TABLE surface over the
  * engine's warehouse, so the fragment datasets are consumable from plain
  * SQL with no Scala API in sight —
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.catalog.GraftTableCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/fragment/warehouse
  *
  *   spark.table("graft.range_ratings")
  *   spark.sql("SELECT * FROM graft.range_ratings WHERE rating >= 4.0")
  * }}}
  *
  * Each warehouse directory (the [[FragmentCatalog]] layout: one directory
  * per dataset, Hive `part=` subdirectories for fragments) is served as a
  * parquet [[Table]] via Spark's own `ParquetDataSourceV2`, i.e. the stock
  * v2 file table with partition-column inference. Spark's
  * `FallBackFileSourceV2` analyzer rule then lowers the file table to the
  * v1 `LogicalRelation` path — exactly the relation shape every optimizer
  * rule in this engine already matches, so BOTH pruning tiers compose with
  * zero extra code: a literal `part = 3` predicate prunes at the FileIndex,
  * and a `rating >= x` predicate is rewritten by
  * [[graft.plans.DeriveFragmentPruning]] into the implied `part IN (…)`
  * (the session conf published at fragmentation time carries the bucket
  * arithmetic), so non-surviving fragment DIRECTORIES are never listed or
  * read — asserted by GraftTableCatalogSpec against the actual scan's
  * selected partitions.
  *
  * DDL stays engine-owned (CREATE/DROP/ALTER raise — dataset lifecycle is
  * [[graft.operators.FragmentEngine]]'s), but the two fragment datasets are
  * INSERTABLE: `INSERT INTO graft.range_ratings VALUES (u, m, r, NULL,
  * NULL)` routes through the engine's dual-write semantics
  * ([[FragmentWritableTable]] — master + the one correct `part=` fragment,
  * boundary rule included; round-robin inserts advance the counter). A bare
  * parquet append can never bypass the routing invariant because the write
  * builder IS the router. `CatalogPlugin.initialize` receives the
  * `spark.sql.catalog.graft.*` options; only `warehouse` is required
  * (`masterTable` defaults to "ratings").
  */
class GraftTableCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  private var masterTable: String = "ratings"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.warehouse"))
    masterTable = Option(options.get("masterTable")).getOrElse("ratings")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def tableDir(ident: Identifier): Path = {
    // flat namespace: the warehouse has one directory per dataset
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident.asMultipartIdentifier)
    new Path(warehouse, ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace.toSeq)
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root)
      .iterator
      .filter(_.isDirectory)
      .map(st => Identifier.of(Array.empty, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && fs.exists(tableDir(ident))

  private def parquetTableAt(path: String): Table = {
    val opts = new util.HashMap[String, String]()
    opts.put("path", path)
    new ParquetDataSourceV2().getTable(new CaseInsensitiveStringMap(opts))
  }

  /** A warehouse directory carrying the [[graft.operators.IndexCommit]]
    * layout is served at its newest COMMITTED snapshot — readers through
    * SQL get the same isolation as readers through the protocol (a staged
    * or half-written snapshot is never visible).
    */
  private def indexRootOrNull(ident: Identifier): String = {
    val dir = tableDir(ident)
    if (fs.exists(dir) &&
      graft.operators.IndexCommit.isCommitRoot(spark, dir.toString)) dir.toString
    else null
  }

  /** SQL time travel over committed indexes: `VERSION AS OF n` serves the
    * exact snapshot version n committed by the index protocol (valid until
    * vacuum sweeps it) — the reference's "query the table as of the last
    * load" story generalized to every persisted index this engine writes.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = indexRootOrNull(ident)
    if (root == null)
      throw new UnsupportedOperationException(
        s"${ident.name()} is not a committed index — only IndexCommit roots time-travel")
    val n =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"VERSION AS OF over graft indexes takes the numeric commit version, got '$version'")
      }
    parquetTableAt(graft.operators.IndexCommit.snapshotDir(spark, root, n))
  }

  /** `TIMESTAMP AS OF` resolves to the newest version whose commit-marker
    * mtime is at or before the instant — the same clock every
    * rename-arbitrated table format travels by. Spark hands micros.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = indexRootOrNull(ident)
    if (root == null)
      throw new UnsupportedOperationException(
        s"${ident.name()} is not a committed index — only IndexCommit roots time-travel")
    val n = graft.operators.IndexCommit
      .versionAsOfTimestamp(spark, root, timestampMicros / 1000L)
      .getOrElse(throw new NoSuchTableException(ident.asMultipartIdentifier))
    parquetTableAt(graft.operators.IndexCommit.snapshotDir(spark, root, n))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
    val indexRoot = indexRootOrNull(ident)
    if (indexRoot != null) {
      val snap = graft.operators.IndexCommit
        .latestSnapshotDir(spark, indexRoot)
        .getOrElse(throw new NoSuchTableException(ident.asMultipartIdentifier))
      return parquetTableAt(snap)
    }
    // serving the range-fragmented dataset publishes its bucket metadata, so
    // a pure-SQL consumer gets DeriveFragmentPruning with no engine API
    // call anywhere in sight — the table surface is self-contained
    if (ident.name() == graft.operators.FragmentEngine.RangeDataset) {
      new FragmentCatalog(warehouse).readRangeMeta().foreach { m =>
        graft.plans.DeriveFragmentPruning.publish(
          spark, "ref", "rating", m.totalPartitions, m.minValue, m.maxValue,
          new java.io.File(dir.toUri.getPath).getAbsolutePath)
      }
    }
    val opts = new util.HashMap[String, String]()
    opts.put("path", dir.toString)
    val parquetTable = new ParquetDataSourceV2().getTable(new CaseInsensitiveStringMap(opts))
    // the fragment datasets are insertable THROUGH the routing semantics
    if (ident.name() == graft.operators.FragmentEngine.RangeDataset ||
      ident.name() == graft.operators.FragmentEngine.RoundRobinDataset)
      new FragmentWritableTable(parquetTable, warehouse, ident.name(), masterTable)
    else parquetTable
  }

  override def createTable(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]
  ): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only: create datasets through the engine " +
        "(FragmentEngine / Fragmentation), which owns the routing invariants")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog is read-only: use FragmentEngine.deleteTables")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  private implicit class IdentOps(ident: Identifier) {
    def asMultipartIdentifier: Seq[String] = ident.namespace().toSeq :+ ident.name()
  }
}
