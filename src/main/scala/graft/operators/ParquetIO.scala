package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet reads with a memoized SCHEMA per path — metadata, not data.
  *
  * Every `spark.read.parquet(path)` without an explicit schema re-runs
  * footer-based schema inference; for the persisted-index lifecycle
  * operators (band indexes, cluster states, centroid/codebook tables, MV
  * sidecars) the SAME path is re-opened several times per operation and the
  * inference step alone costs ~0.1 s warm and far more cold (measured 2.2 s
  * for a fresh 66-file partitioned index dir vs 0.05 s with an explicit
  * schema). A catalog-backed warehouse pins schemas instead of re-inferring
  * per query; this memo is that catalog for the engine's own index layouts.
  *
  * Contract: a path's schema is fixed between rewrites — every in-repo
  * rewrite (index delete/compact, cluster-state overwrite, sidecar refresh)
  * calls [[invalidate]] on the path it replaced, so a rewrite that DID
  * change the column set is re-inferred on the next read instead of being
  * silently served the stale entry (the round-17 advisory). File listings
  * and partition discovery are NOT cached here: each read sees the path's
  * current files; only the column-type inference is skipped.
  */
object ParquetIO {
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Drop the memoized schema for `path` (and any nested partition-dir
    * entries under it). Writers that replace a path in place call this right
    * after the write commits; a fresh-path write needs nothing (a never-read
    * path has no entry). Also bounds the cache for long-running committers
    * that rewrite the same root many times.
    */
  def invalidate(path: String): Unit = {
    // cache keys are whatever string the read sites passed; a filesystem
    // listing hands back fully-qualified `file:` URIs for the same dirs, so
    // match on the scheme-stripped form of both sides
    def bare(p: String): String =
      p.stripPrefix("file://").stripPrefix("file:").stripSuffix("/")
    val norm = bare(path)
    schemaCache.keysIterator
      .filter { k =>
        val kb = bare(k)
        kb == norm || kb.startsWith(norm + "/")
      }
      .foreach(schemaCache.remove)
  }
}
