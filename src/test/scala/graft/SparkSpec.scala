package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (getOrCreate → one JVM-wide
  * session; sbt forks a single test JVM).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def withTempDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test").toString
    try f(dir)
    finally {
      import java.nio.file._
      import java.util.Comparator
      val s = Files.walk(Paths.get(dir))
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.deleteIfExists(_))
      finally s.close()
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
