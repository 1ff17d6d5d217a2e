package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** shared local session for all specs (one JVM, one session) */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder("graft-test", "2").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
