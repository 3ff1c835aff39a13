package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Behavior pins for the matrix-free power iteration: finds the planted
  * variance direction (not the mean direction), is exactly partition-
  * invariant (integer ledgers), projections track the planted coefficient,
  * degenerate corpora fail loudly.
  */
class PcaSpec extends SparkSpec {

  private val Dim = 8

  /** x_i = 10·1 + a_i·w + noise, w = (1,1,0,…)/√2 — the mean offset dwarfs
    * the signal, so a centering bug would lock v onto the all-ones axis.
    */
  private def fixture = {
    val s = spark
    import s.implicits._
    val rows = (0 until 60).map { i =>
      val a = (i - 30) / 3.0f
      val vec = (0 until Dim).map { j =>
        val noise = (((i * 31 + j * 17) % 7) - 3) * 0.05f
        val w = if (j < 2) 1.0f else 0.0f
        10.0f + a * w + noise
      }
      (i.toLong, vec)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("power iteration finds the planted variance direction, not the mean direction") {
    val v = Pca
      .pcaTopComponent(fixture, "vec_id", "embedding", dim = Dim, iters = 4)
      .collect()
      .map(r => r.getAs[Long]("pos").toInt -> r.getAs[Long]("v_unit").toDouble)
      .toMap
    assert(v.size == Dim)
    val arr = (0 until Dim).map(v)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val w = Seq(1.0, 1.0) ++ Seq.fill(Dim - 2)(0.0)
    val ones = Seq.fill(Dim)(1.0)
    assert(math.abs(cos(arr, w)) > 0.99,
      s"v must align with the planted direction, got $arr")
    assert(math.abs(cos(arr, ones)) < 0.8,
      "v must not collapse onto the mean (all-ones) direction")
  }

  test("exact partition invariance and rerun determinism") {
    val a = Pca.pcaTopComponent(fixture, "vec_id", "embedding", Dim, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Pca.pcaTopComponent(fixture.repartition(7), "vec_id", "embedding", Dim, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b, "integer re-quantization must make the iteration partition-invariant")
  }

  test("abtt projections track the planted coefficient monotonically") {
    val proj = Pca
      .abttProjections(fixture, "vec_id", "embedding", Dim, 4)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("proj"))
      .toMap
    assert(proj.size == 60)
    // coefficient a_i is monotone in i; projections must follow at stride 3
    // (stride 1's coefficient step is within the planted noise band, stride
    // 3's is well outside it; global sign is arbitrary — power iteration's)
    val seq = (0 until 60).map(i => proj(i.toLong).toDouble)
    val diffs = (0 until 57).map(i => seq(i + 3) - seq(i))
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0),
      "projection must be monotone in the planted coefficient at stride 3")
  }

  test("degenerate corpus (zero variance) fails loudly") {
    val s = spark
    import s.implicits._
    val flat = (0 until 5).map(i => (i.toLong, Seq.fill(Dim)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.pcaTopComponent(flat, "vec_id", "embedding", Dim, 2).collect()
    }
    assert(e.getMessage.contains("degenerated"))
  }
}
