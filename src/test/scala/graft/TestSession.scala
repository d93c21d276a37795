package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sbt forks one JVM). */
object TestSession {
  lazy val spark: SparkSession = Engine.session("graft-test", "4")
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
