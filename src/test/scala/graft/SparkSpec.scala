package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM across suites (sbt forks one JVM). */
object TestSession {
  lazy val spark: SparkSession =
    graft.sources.Sessions.builder("local[4]", 4)
      .appName("graft-tests")
      .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
}
