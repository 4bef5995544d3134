package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared session base: one JVM-wide SparkSession across all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", "local[4]", 8).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
