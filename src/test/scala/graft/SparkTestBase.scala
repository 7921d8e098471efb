package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs (GraftSession pins the semantics contract:
  * ANSI off, UTC). Sessions are reused via getOrCreate across suites.
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.build("graft-test")
  val Sf = "/root/testdata/sf0.001"
}
