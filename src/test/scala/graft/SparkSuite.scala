package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session — Spark
  * reuses via getOrCreate, so suites don't pay repeated startup). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local("4")
}
