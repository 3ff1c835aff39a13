package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the corpus, TakeOrdered per query. The baseline and the
  *     verification oracle. Scales in corpus size (narrow scan + broadcast
  *     join, no corpus shuffle) but is O(|corpus|·|queries|·dim) compute.
  *   - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — each vector gets
  *     a b-bit signature (sign of dot with b deterministic hyperplanes);
  *     candidates come from an equi-join on the bucket key, so compute drops
  *     to O(candidates·dim). This is the 100 TB path: bucket key is a
  *     shuffle-friendly scalar, skew is bounded by 2^b buckets, and the
  *     hyperplanes are generated from a seed — no driver-side data motion.
  *
  * Dot products use fold-left `aggregate` over `zip_with` (codegen-adjacent
  * higher-order funcs, no UDF); floats are cast to double before any
  * arithmetic so results match the DuckDB oracle bit-for-bit after rounding.
  */
object Similarity {

  /** Cosine similarity between two `array<float>` columns, computed in double
    * precision with deterministic left-to-right summation.
    */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column): Column = transform(c, x => x.cast("double"))
    val da = d(a); val db = d(b)
    val dot = aggregate(zip_with(da, db, _ * _), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(da, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(db, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector. `queries` should be small
    * (it is broadcast); ranking ties break on neighbor id so results are
    * deterministic across engines.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    )
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qv"), col("nv")), 6).as("cos")
      )
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: weight (p, i) is derived from a
    * seeded integer hash mapped to [-1, 1]. Generated driver-side as literals
    * (b·dim doubles — trivially broadcastable).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Int = 42): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (p, i) =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, p, i))
      (h.toDouble / Int.MaxValue.toDouble)
    }

  /** b-bit LSH bucket signature for each vector: bit p = sign(v · plane_p). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val dv = transform(vec, x => x.cast("double"))
    val bitCols = planes.map { plane =>
      val planeLit = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(dv, planeLit, _ * _), lit(0.0), _ + _)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  def lshBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int = 8,
      seed: Int = 42
  ): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    corpus.select(
      col(idCol),
      col(vecCol),
      lshBucket(col(vecCol), hyperplanes(bits, dim, seed)).as("bucket")
    )
  }

  /** Approximate top-k: exact cosine ranking restricted to same-bucket
    * candidates (equi-join on the bucket key → shuffle on a scalar key, the
    * scale path). Recall vs. [[bruteForceTopK]] is asserted in SimilaritySpec.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      seed: Int = 42
  ): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, bits, seed)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("bucket"))
    val qb = broadcast(
      lshBuckets(queries, idCol, vecCol, bits, seed)
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    )
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cb.join(qb, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qv"), col("nv")), 6).as("cos")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` (id1 < id2).
    * All-pairs only within LSH buckets when `blocked`; exact all-pairs
    * otherwise (verification / small corpora).
    */
  def nearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocked: Boolean = true,
      bits: Int = 8
  ): DataFrame = {
    val base =
      if (blocked) {
        val b = lshBuckets(corpus, idCol, vecCol, bits)
        b.as("a").join(b.as("b"), col("a.bucket") === col("b.bucket"))
      } else {
        val c = corpus.select(col(idCol), col(vecCol))
        c.as("a").crossJoin(c.as("b"))
      }
    base
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id1"),
        col(s"b.$idCol").as("id2"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cos")
      )
      .filter(col("cos") >= threshold)
  }
}
