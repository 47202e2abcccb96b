package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Sessions

/** Shared local-session fixture. `getOrCreate` hands every suite the same
  * JVM-wide session (never stopped between suites), tuned via
  * [[Sessions.tune]] exactly like the entry points. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Sessions.local(4, "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** Smoke-scale testdata (TESTDATA.md). */
  val sf: String = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
