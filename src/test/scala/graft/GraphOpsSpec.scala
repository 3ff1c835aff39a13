package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Deterministic-LPA behavior pins: dense groups collapse to one label,
  * disjoint groups stay apart, the self-vote kills the symmetric-pair
  * oscillation, and the result is partition-invariant.
  */
class GraphOpsSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("u", "v")
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("two disjoint 4-cliques collapse to their min labels; a pair converges (no oscillation)") {
    val e = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) ++
      Seq((9L, 10L)): _*)
    val out = GraphOps.labelPropagation(e, rounds = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet == Set(1L), s"clique A must unify, got $out")
    assert(Seq(5L, 6L, 7L, 8L).map(out).toSet == Set(5L), s"clique B must unify, got $out")
    // symmetric pair: self-vote breaks the 2-cycle — both land on min id
    assert(out(9L) == 9L && out(10L) == 9L, s"pair must converge to min id, got $out")
  }

  test("bridged cliques still split into two communities") {
    val e = edges(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) ++
      Seq((4L, 11L)): _*)
    val out = GraphOps.labelPropagation(e, rounds = 4)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    val cA = Seq(1L, 2L, 3L, 4L).map(out).toSet
    val cB = Seq(11L, 12L, 13L, 14L).map(out).toSet
    assert(cA.size == 1 && cB.size == 1 && cA != cB,
      s"dense sides of a single bridge must keep distinct communities, got $out")
  }

  test("partition invariance: same communities under any input layout") {
    val e = edges(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)) ++ Seq((3L, 7L)): _*)
    val a = GraphOps.labelPropagation(e, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.labelPropagation(e.repartition(5), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
