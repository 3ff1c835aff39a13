package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom Aggregator: top-k labels by score within a group, emitted as
  * a comma-joined string (deterministic: score desc, label asc tie-break).
  *
  * This is the `org.apache.spark.sql.expressions.Aggregator` surface —
  * register with `functions.udaf(TopKLabels(k))` and use like any built-in
  * aggregate. The buffer keeps only k entries, so partial aggregation ships
  * O(k) per group per map task regardless of group size — the property that
  * makes a custom aggregate shuffle-safe at scale (same contract as Spark's
  * own TypedImperativeAggregate sketches). Verified value-for-value against
  * a DuckDB window-function oracle (q_topk_per_group_agg).
  */
case class TopKLabels(k: Int) extends Aggregator[(String, Double), Seq[(String, Double)], String] {

  private def trim(b: Seq[(String, Double)]): Seq[(String, Double)] =
    b.sortBy { case (label, score) => (-score, label) }.take(k)

  override def zero: Seq[(String, Double)] = Seq.empty

  override def reduce(b: Seq[(String, Double)], a: (String, Double)): Seq[(String, Double)] =
    trim(b :+ a)

  override def merge(b1: Seq[(String, Double)], b2: Seq[(String, Double)]): Seq[(String, Double)] =
    trim(b1 ++ b2)

  override def finish(r: Seq[(String, Double)]): String =
    trim(r).map(_._1).mkString(",")

  override def bufferEncoder: Encoder[Seq[(String, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Double)]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
