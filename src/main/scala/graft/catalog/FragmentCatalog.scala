package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.{RangeMeta, RoundRobinMeta}

/** Tiny filesystem catalog for the fragmentation engine.
  *
  * Replaces the reference's PostgreSQL-side state:
  *   - fragment tables enumerated via `information_schema` prefix scans
  *     (reference `Interface1.py:39,108`) → here, directories under a data
  *     root, with fragment identity as a Hive-style `part=<i>` partition
  *     column rather than N physical tables;
  *   - the singleton `RANGE_METADATA` / `ROUND_ROBIN_METADATA` rows
  *     (reference `Interface1.py:53,77`) → single small JSON files next to
  *     the partitioned datasets.
  *
  * At cluster scale `root` would be an object-store / HDFS URI and the JSON
  * read/write would go through the Hadoop FileSystem API; for this build the
  * local filesystem suffices and the layout is identical.
  */
final class FragmentCatalog(val root: String) {
  Files.createDirectories(Paths.get(root))

  def tablePath(name: String): String = s"$root/$name"
  def tableExists(name: String): Boolean = Files.exists(Paths.get(root, name))

  /** Names of datasets under the root (analog of `information_schema.tables`). */
  def listTables(): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_)).map(_.getFileName.toString).toVector
      } finally s.close()
    }
  }

  def dropTable(name: String): Unit = {
    deleteRecursively(Paths.get(root, name))
    Files.deleteIfExists(Paths.get(root, rowIdFile(name)))
  }

  /** Drop everything under the root — `deleteTables('ALL')` analog
    * (reference `Interface1.py:375-381`).
    */
  def dropAll(): Unit = {
    listTables().foreach(dropTable)
    Seq(RangeMetaFile, RoundRobinMetaFile)
      .map(Paths.get(root, _))
      .foreach(Files.deleteIfExists(_))
    val s = Files.list(Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(RowIdSuffix))
        .foreach(Files.deleteIfExists(_))
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.deleteIfExists(_))
      } finally s.close()
    }

  // ---- metadata ------------------------------------------------------------

  private val RangeMetaFile = "range_metadata.json"
  private val RoundRobinMetaFile = "round_robin_metadata.json"

  def writeRangeMeta(m: RangeMeta): Unit =
    writeString(
      RangeMetaFile,
      s"""{"range_total_partitions":${m.totalPartitions},"min_value":${m.minValue},"max_value":${m.maxValue},"interval":${m.interval}}"""
    )

  def readRangeMeta(): Option[RangeMeta] =
    readString(RangeMetaFile).map { s =>
      val f = jsonFields(s)
      RangeMeta(
        f("range_total_partitions").toInt,
        f("min_value").toDouble,
        f("max_value").toDouble,
        f("interval").toDouble
      )
    }

  def writeRoundRobinMeta(m: RoundRobinMeta): Unit =
    writeString(
      RoundRobinMetaFile,
      s"""{"round_robin_total_partitions":${m.totalPartitions},"round_robin_last_inserted":${m.lastInserted}}"""
    )

  def readRoundRobinMeta(): Option[RoundRobinMeta] =
    readString(RoundRobinMetaFile).map { s =>
      val f = jsonFields(s)
      RoundRobinMeta(
        f("round_robin_total_partitions").toInt,
        f("round_robin_last_inserted").toLong
      )
    }

  /** Per-table next-`_rowid` counter. Inserts allocate load-order ids from
    * here instead of scanning the master table for `max(_rowid)` — the same
    * singleton-metadata pattern as `lastInserted`, and the difference between
    * an O(1) insert and a full-table scan per row at scale.
    */
  private val RowIdSuffix = "_rowid.json"
  private def rowIdFile(table: String): String = s"$table$RowIdSuffix"

  def writeNextRowId(table: String, next: Long): Unit =
    writeString(rowIdFile(table), s"""{"next_rowid":$next}""")

  def readNextRowId(table: String): Option[Long] =
    readString(rowIdFile(table)).map(s => jsonFields(s)("next_rowid").toLong)

  private def writeString(name: String, content: String): Unit =
    Files.write(Paths.get(root, name), content.getBytes(StandardCharsets.UTF_8))

  private def readString(name: String): Option[String] = {
    val p = Paths.get(root, name)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  /** Minimal flat-JSON parser for our own metadata files (numeric fields only). */
  private def jsonFields(s: String): Map[String, String] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim
    }.toMap
}
