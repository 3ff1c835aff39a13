package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of an existing testdata directory — the sf1
  * input for the scaling lap (`Bench` at `SPARK_GRAFT_SF_DIR=<out>`): fact
  * tables replicate `factor`× with key shifts that preserve referential
  * integrity (copy k of an order still points at copy k of its customer),
  * dimension tables (region, nation) stay fixed, exactly as TPC-H scaling
  * does. Text gets a per-copy suffix so exact-dup structure doesn't inflate
  * 10×; embeddings get a per-copy +k/1000 component offset so ANN
  * neighborhoods grow instead of degenerating into 10 identical matches.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> [factor]
  * (never writes into /root/testdata — the source stays read-only).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    val spark = GraftSession
      .builder(master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def keySpan(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    // copy index k = 0..factor-1 crossed in; key shift = k * span(key)
    def replicate(df: DataFrame)(shift: (DataFrame, Long) => DataFrame): DataFrame = {
      val copies = spark.range(factor).toDF("k")
      shift(df.crossJoin(broadcast(copies)), 0L).drop("k")
    }
    def shifted(c: String, span: Long) = (col(c) + col("k") * span).as(c)

    val custSpan = keySpan(rd("customer"), "c_custkey")
    val ordSpan = keySpan(rd("orders"), "o_orderkey")
    val partSpan = keySpan(rd("part"), "p_partkey")
    val suppSpan = keySpan(rd("supplier"), "s_suppkey")
    val evSpan = keySpan(rd("events"), "event_id")
    val userSpan = keySpan(rd("events"), "user_id")
    val docSpan = keySpan(rd("documents"), "doc_id")
    val vecSpan = keySpan(rd("embeddings"), "vec_id")

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(replicate(rd("customer")) { (d, _) =>
      d.select(shifted("c_custkey", custSpan), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), col("k"))
    }, "customer")
    wr(replicate(rd("supplier")) { (d, _) =>
      d.select(shifted("s_suppkey", suppSpan), col("s_name"), col("s_nationkey"),
        col("s_acctbal"), col("k"))
    }, "supplier")
    wr(replicate(rd("part")) { (d, _) =>
      d.select(shifted("p_partkey", partSpan), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"), col("k"))
    }, "part")
    wr(replicate(rd("orders")) { (d, _) =>
      d.select(shifted("o_orderkey", ordSpan), shifted("o_custkey", custSpan),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"), col("k"))
    }, "orders")
    wr(replicate(rd("lineitem")) { (d, _) =>
      d.select(shifted("l_orderkey", ordSpan), shifted("l_partkey", partSpan),
        shifted("l_suppkey", suppSpan), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"), col("k"))
    }, "lineitem")
    wr(replicate(rd("events")) { (d, _) =>
      d.select(shifted("event_id", evSpan), col("ts"), shifted("user_id", userSpan),
        col("event_type"), col("value"), col("props"), col("k"))
    }, "events")
    wr(replicate(rd("documents")) { (d, _) =>
      d.select(shifted("doc_id", docSpan),
        when(col("k") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copy"), col("k"))).as("text"),
        col("lang"), col("source"),
        when(col("k") === 0, col("n_chars"))
          .otherwise(col("n_chars") + lit(5) + length(col("k").cast("string")))
          .as("n_chars"), col("k"))
    }, "documents")
    wr(replicate(rd("embeddings")) { (d, _) =>
      d.select(shifted("vec_id", vecSpan),
        when(col("k") === 0, col("embedding"))
          .otherwise(transform(col("embedding"),
            x => (x + col("k").cast("float") / 1000.0f).cast("float")))
          .as("embedding"),
        col("label"), col("k"))
    }, "embeddings")
    println(s"""{"scaled": "$out", "factor": $factor}""")
    spark.stop()
  }
}
