package graft

import graft.operators.Similarity

/** Semantics of the 1-bit quantization rung: sign-bit codes, Hamming
  * retrieval, and the recall@k evaluation harness.
  */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, -2.0f, 3.0f, -4.0f)),
    (2L, Array(1.0f, -1.0f, 1.0f, -1.0f)), // same signs as 1 → ham 0
    (3L, Array(-1.0f, 2.0f, -3.0f, 4.0f)), // inverted → ham 4
    (4L, Array(1.0f, 1.0f, 1.0f, 1.0f))    // ham 2 from 1
  ).toDF("vec_id", "embedding")

  test("binaryQuantize emits sign bitstrings and positive counts") {
    val out = Similarity
      .binaryQuantize(vecs, "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) === (("1010", 2L)))
    assert(out(3L) === (("0101", 2L)))
    assert(out(4L) === (("1111", 4L)))
  }

  test("hammingTopK ranks by sign-bit distance with id tie-break") {
    val out = Similarity
      .hammingTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("ham"), r.getAs[Long]("rank")))
      .sortBy(_._3)
    assert(out === Seq((2L, 0L, 1L), (4L, 2L, 2L), (3L, 4L, 3L)))
  }

  test("recallAtK counts overlap per query and keeps zero-hit queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 11L), (1L, 99L)).toDF("query_id", "neighbor_id")
    val out = Similarity
      .recallAtK(exact, approx, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L) === ((1L, 0.5)))
    assert(out(2L) === ((0L, 0.0)))
  }
}
