package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite (one JVM for all forked
  * tests; getOrCreate reuses the session across specs).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Fresh GraftConf over a throwaway warehouse dir. */
  def tmpConf(): GraftConf = GraftConf(
    warehousePath = java.nio.file.Files
      .createTempDirectory("graft-test-wh").toString)

  def flow(desc: String)(implicit conf: GraftConf): DataFlow =
    new DataFlow(spark, desc, conf)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
