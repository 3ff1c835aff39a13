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
  /** JVM-wide session shared by every suite. Never stop() it — getOrCreate
    * hands the same instance to all suites, so a stop in one suite's afterAll
    * would kill the SparkContext under every later suite.
    */
  lazy val session: SparkSession = {
    val s = GraftSession
      .builder("local[4]", 4)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
