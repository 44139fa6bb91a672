package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise).
  */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.local(cpus = 8, appName = "graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  def run(name: String, dir: String = sf0001): org.apache.spark.sql.DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
