package graft

import scala.sys.process._

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Tag for long-running soak suites — EXCLUDED from the default `sbt
  * test` run (build.sbt `-l graft.SlowTest`; ScalaTest exclusion beats
  * a `-n` inclusion, so clear the option to run):
  * {{{ sbt "set Test/testOptions := Seq()" "testOnly graft.OracleSoakSpec" }}}
  */
object SlowTest extends Tag("graft.SlowTest")

/** The tri-scale oracle soak: every declared query dumped and DuckDB
  * hash-compared at sf0.001, sf0.01, AND sf0.1 — one command
  * continuously reproduces the green matrix the contract claims,
  * instead of it being a one-time event. Uses the shared test session
  * ([[Verify.dump]]) and the same differ the driver mimics
  * (`tools/oracle_check.py`).
  */
class OracleSoakSpec extends AnyFunSuite {

  private def soak(sfDir: String): Unit = {
    val out = java.nio.file.Files
      .createTempDirectory(s"soak_${sfDir.split('/').last}").toString
    val failed = Verify.dump(SparkSpec.session, sfDir, out)
    assert(failed.isEmpty, s"queries failed to execute: $failed")
    val log = new StringBuilder
    val code = Seq("python3", "tools/oracle_check.py", sfDir, out)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(code == 0, s"oracle mismatch at $sfDir:\n$log")
    val summary = log.toString.linesIterator
      .filter(_.contains("queries match")).mkString
    info(s"$sfDir: $summary")
  }

  test("oracle hash gate at sf0.001", SlowTest) { soak("/root/testdata/sf0.001") }
  test("oracle hash gate at sf0.01", SlowTest) { soak("/root/testdata/sf0.01") }
  test("oracle hash gate at sf0.1", SlowTest) { soak("/root/testdata/sf0.1") }
}
