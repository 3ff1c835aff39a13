package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row deletion for ANY of the persisted index families — the generic
  * right-to-be-forgotten primitive behind
  * [[Dedup.deleteFromMinhashIndex]]'s text-specific flow: read the index,
  * anti-join the condemned ids, MATERIALIZE the survivors (localCheckpoint —
  * overwriting a path that an un-materialized frame is still lazily reading
  * is the classic self-overwrite corruption), and rewrite with the layout's
  * own partitioning so directory structure and pruning behavior survive the
  * deletion.
  *
  * Works unchanged on every index this library writes, because they all
  * carry a plain id column:
  *   - MinHash band index (`id`, partitioned ingest_id/band_pfx)
  *   - Hamming sketch index (`id`, partitioned band_pfx)
  *   - span-digest index has no ids (pure membership) — deletion there is
  *     a rebuild decision, not a row filter, and deliberately unsupported
  *   - LSH vector index (`neighbor_id`, partitioned bucket)
  *   - PQ `codes` table (`neighbor_id`, unpartitioned; the codebook holds
  *     no per-document data and needs no edit)
  *
  * Cost is one index rewrite (restrict the read to affected partitions
  * first when deletions are partition-scoped). The guarantee a takedown
  * needs — future queries/ingests can no longer match the deleted rows —
  * follows because these indexes ARE the only per-document state the
  * retrieval paths read.
  */
object IndexMaintenance {

  /** CRASH-WINDOW CAVEAT (shared by [[deleteRows]], [[compact]] and
    * `Dedup.deleteFromMinhashIndex`): these rewrite the index IN PLACE —
    * localCheckpoint guards the lazy self-read, but a crash between the
    * overwrite's delete and its write loses the only copy (checkpoint
    * blocks die with the app), and recovery is a rebuild from corpus text.
    * Acceptable for single-writer batch jobs that can rerun; anything
    * needing crash safety or a second concurrent writer should hold the
    * index under [[IndexCommit]] and use [[deleteRowsVersioned]] /
    * [[compactVersioned]], where every transition is a fresh immutable
    * snapshot behind an atomically-renamed pointer.
    */
  def deleteRows(
      spark: SparkSession,
      ids: DataFrame,
      path: String,
      idColName: String,
      partitionCols: Seq[String]
  ): Unit = {
    val survivors = spark.read
      .parquet(path)
      .join(ids.toDF(idColName), Seq(idColName), "left_anti")
      .localCheckpoint()
    val w = survivors.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
    ParquetIO.invalidate(path) // in-place rewrite: drop any memoized schema
  }

  /** Small-file compaction for ANY ingest-partitioned index — the generic
    * counterpart of `Dedup.compactMinhashIndex` (which delegates here):
    * replay-idempotent appends pay one `ingest_id=<k>` partition per
    * accepted batch, so a long-running loop accumulates directories and
    * tiny files; this folds every ingest back into the initial build's
    * `ingest_id=0` layout with one writer task per remaining partition
    * value. Row content is untouched, so any read path over the index is
    * byte-equivalent before and after. Survivors materialize before the
    * in-place overwrite (self-overwrite guard). Run between ingests.
    *
    * @param partitionCols the layout's partition columns, `ingestCol`
    *                      first when present (it is reset to 0)
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      ingestCol: Option[String] = Some("ingest_id")
  ): Unit = {
    val rows0 = ParquetIO.read(spark, path)
    val rows = ingestCol.fold(rows0)(c => rows0.withColumn(c, lit(0L))).localCheckpoint()
    val shuffled =
      if (partitionCols.nonEmpty) rows.repartition(partitionCols.map(col): _*) else rows.coalesce(1)
    val w = shuffled.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
    ParquetIO.invalidate(path) // in-place rewrite: drop any memoized schema
  }

  // ---- versioned variants (crash-safe, multi-writer) ----------------------
  // The same three maintenance transitions expressed as [[IndexCommit]]
  // builds: each is a pure function of the committed base snapshot, so the
  // protocol can rebase it when another writer commits first, and no
  // in-place overwrite ever exists. The base read is lazy over an IMMUTABLE
  // snapshot directory — no localCheckpoint materialization needed, which
  // also drops the in-place path's memory spike at index scale.

  /** Append a batch as a new committed version. Rebase-safe by
    * construction: base ∪ batch re-evaluated against whoever won.
    */
  def appendVersioned(
      spark: SparkSession,
      batch: DataFrame,
      root: String,
      writerId: String,
      partitionCols: Seq[String] = Nil
  ): Long =
    IndexCommit.commit(spark, root, writerId, partitionCols) {
      case None       => batch
      case Some(base) => base.unionByName(batch)
    }

  /** Right-to-be-forgotten under the commit protocol: survivors of the
    * newest committed snapshot become the next version; a crash at any
    * point leaves the previous version intact and committed.
    */
  def deleteRowsVersioned(
      spark: SparkSession,
      ids: DataFrame,
      root: String,
      idColName: String,
      writerId: String,
      partitionCols: Seq[String] = Nil
  ): Long =
    IndexCommit.commit(spark, root, writerId, partitionCols) {
      case None       => throw new IllegalStateException(s"no committed index at $root")
      case Some(base) => base.join(ids.toDF(idColName), Seq(idColName), "left_anti")
    }

  /** Small-file compaction as a version transition: rows unchanged,
    * ingest column reset, layout re-bucketed — readers on the old version
    * keep their directories until [[IndexCommit.vacuum]].
    */
  def compactVersioned(
      spark: SparkSession,
      root: String,
      writerId: String,
      partitionCols: Seq[String],
      ingestCol: Option[String] = Some("ingest_id")
  ): Long =
    IndexCommit.commit(spark, root, writerId, partitionCols) {
      case None => throw new IllegalStateException(s"no committed index at $root")
      case Some(base) =>
        val rows = ingestCol.fold(base)(c => base.withColumn(c, lit(0L)))
        if (partitionCols.nonEmpty) rows.repartition(partitionCols.map(col): _*)
        else rows.coalesce(1)
    }
}
