package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run
  * in the forked test JVM).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkSuite {
  lazy val session: SparkSession = {
    // the engine's own session factory — tests run the same conf
    // (AQE, UTC, nanosAsLong) the entry points run
    val s = GraftSession.builder(4).appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
