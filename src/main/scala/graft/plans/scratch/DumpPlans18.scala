package graft.plans.scratch

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Round-18 scratch plan dumper: writes plans/r18/<name>_<tag>.txt with the
  * formatted physical plan of each named entry. Usage:
  *   sbt "runMain graft.plans.scratch.DumpPlans18 <tag> <name>[,name...]"
  */
object DumpPlans18 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(Paths.get(s"plans/r18/${name}_$tag.txt"), txt + "\n")
      println(s"wrote plans/r18/${name}_$tag.txt")
    }
    spark.stop()
  }
}
