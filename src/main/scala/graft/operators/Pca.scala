package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding corpus by DISTRIBUTED power
  * iteration, plus the all-but-the-top projection read (Mu & Viswanath,
  * ICLR 2018: embedding sets share a large common direction; removing it
  * measurably improves retrieval/similarity quality) — the embedding-
  * hygiene pass a pipeline runs before trusting cosine scores.
  *
  * The covariance matrix is never materialized: Cov·v = Σᵢ yᵢ·(yᵢᵀv), so
  * each iteration is two keyed aggregates over the posexploded centered
  * corpus — one per-vector dot (d_i = yᵢᵀv), one per-dimension weighted
  * sum (u = Σ yᵢ·dᵢ) — O(n·dim) work, no dim×dim anything, the classic
  * matrix-free formulation at any corpus size.
  *
  * Cross-engine determinism is the design constraint: components quantize
  * to exact micro-unit BIGINTs (round(x·10⁶)), the per-dimension mean is
  * an exact truncating integer division (both engines truncate toward
  * zero), and each iteration re-quantizes its intermediates by a
  * DATA-DERIVED power of ten — shift = digits(max|value|) − target, with
  * digits read off the integer's decimal-string length, never a libm log —
  * so every d, e, u and v value is an identical integer in Spark and the
  * DuckDB twin. Power iteration self-corrects, so the coarse 4–5
  * significant-digit re-quantization costs convergence nothing; it buys
  * bit-identical replays. Magnitude audit: |y| ≤ ~2·10⁶, |v| ≤ 9999 →
  * |d| ≤ dim·2·10¹⁰; |e| ≤ 99999 → per-term |y·e| ≤ 2·10¹¹, so the u sums
  * stay int64-exact through ~10⁷ vectors (beyond that, lift the u
  * aggregate to DECIMAL(38,0) — the shift machinery is unchanged).
  *
  * The driver sees only metadata: the per-iteration max-|d| scalar and the
  * dim-row u table (the k-rows-to-the-driver shape of the kmeans/pagerank
  * loops); v rides back into the next iteration as a broadcast literal.
  */
object Pca {

  private def p10(k: Int): Long = {
    var r = 1L; var i = 0
    while (i < k) { r *= 10L; i += 1 }
    r
  }

  /** (centered exploded frame (vec_id, pos, y), final component map). */
  private def powerIterate(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int
  ): (DataFrame, Map[Int, Long]) = {
    require(dim > 0 && iters >= 1, "dim > 0, iters >= 1")
    val n = emb.count()
    require(n > 0, "power iteration needs a non-empty corpus")
    val ex = emb.select(
      col(idCol).as("vec_id"),
      posexplode(
        expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
      ).as(Seq("pos", "y0"))
    )
    val mu = ex.groupBy("pos").agg(expr(s"sum(y0) div ${n}L").as("mu"))
    val y = ex
      .join(broadcast(mu), Seq("pos"))
      .select(col("vec_id"), col("pos"), (col("y0") - col("mu")).as("y"))
      .localCheckpoint()
    var v: Map[Int, Long] = (0 until dim).map(_ -> 1000L).toMap
    for (_ <- 1 to iters) {
      val d = y
        .withColumn("vv", element_at(typedLit(v), col("pos").cast("int")))
        .groupBy("vec_id")
        .agg(sum(col("y") * col("vv")).as("d"))
        .localCheckpoint() // consumed by the max probe AND the e join
      val mD = d.agg(max(abs(col("d")))).head().getLong(0)
      require(mD > 0, "power iteration degenerated: all dots zero")
      val shD = math.max(mD.toString.length - 5, 0)
      val e = d.select(col("vec_id"), expr(s"d div ${p10(shD)}L").as("e"))
      val u = y
        .join(e, Seq("vec_id"))
        .groupBy("pos")
        .agg(sum(col("y") * col("e")).as("u"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
      val mU = u.map(x => math.abs(x._2)).max
      require(mU > 0, "power iteration degenerated: zero update vector")
      val shU = math.max(mU.toString.length - 4, 0)
      v = u.map { case (p, uv) => p -> (uv / p10(shU)) }.toMap
    }
    (y, v)
  }

  /** Top principal component as `dim` rows (pos, v_unit) — v_unit the
    * ≤4-digit integer component of the dominant covariance eigendirection
    * (scale arbitrary, direction is the payload).
    */
  def pcaTopComponent(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int = 64,
      iters: Int = 3
  ): DataFrame = {
    val (_, v) = powerIterate(emb, idCol, vecCol, dim, iters)
    val s = emb.sparkSession
    import s.implicits._
    v.toSeq.sortBy(_._1).map { case (p, x) => (p.toLong, x) }.toDF("pos", "v_unit")
  }

  /** Per-vector projection onto the corpus's top component — the exact
    * integer dot yᵢᵀv of the CENTERED micro-quantized vector with the
    * learned direction. This is the "common component" coordinate ABTT
    * subtracts: rank by |proj| to see which vectors ride the shared
    * direction hardest (hub/boilerplate embeddings), or subtract
    * proj·v/‖v‖² from each vector to post-process.
    */
  def abttProjections(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int = 64,
      iters: Int = 3
  ): DataFrame = {
    val (y, v) = powerIterate(emb, idCol, vecCol, dim, iters)
    y.withColumn("vv", element_at(typedLit(v), col("pos").cast("int")))
      .groupBy("vec_id")
      .agg(sum(col("y") * col("vv")).as("proj"))
  }
}
