package graft.plans.scratch

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, Logger}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Round-18 census of `WindowExec: No Partition Defined` warnings: runs
  * every declared entry at sf0.001 with an appender hooked on the WindowExec
  * logger and reports which entries trigger the warning (and how often).
  * These are the sites Bench silences by logger — this enumerates them so
  * each can be justified or fixed instead of hidden.
  */
object WindowWarnCensus18 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var hits = 0
    val appender = new AbstractAppender(
      "win-census", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = {
        if (event.getMessage.getFormattedMessage.contains("No Partition Defined"))
          hits += 1
      }
    }
    appender.start()
    val logger = LogManager
      .getLogger("org.apache.spark.sql.execution.window.WindowExec")
      .asInstanceOf[Logger]
    logger.addAppender(appender)
    logger.setLevel(Level.WARN)

    val offenders = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      hits = 0
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      if (hits > 0) offenders(name) = hits
    }
    println("=== entries emitting 'No Partition Defined' (sf0.001, entry + noop) ===")
    offenders.foreach { case (n, h) => println(f"[wincensus] $n%-36s $h") }
    println(s"[wincensus] total offenders: ${offenders.size}")
    spark.stop()
  }
}
