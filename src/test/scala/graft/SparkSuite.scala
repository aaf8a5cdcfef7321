package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session — Spark
  * reuses via getOrCreate, so suites don't pay repeated startup).
  * maxTaskFailures=2 turns task RETRY on, matching a real cluster's
  * scheduler semantics (and letting fault-injection specs prove
  * exactly-once output across attempts). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local("4", maxTaskFailures = 2)
}
