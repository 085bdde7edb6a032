package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

/** Oracle RESULT-TYPE lint gate: every declared `SparkEntry.oracleSql`
  * must type its result columns inside the canonical set the driver's
  * typed hash can match against Spark output (BIGINT/DOUBLE/VARCHAR/
  * TIMESTAMP/BOOLEAN/DATE + nested over the same domain). DuckDB
  * widens silently — `SUM(BIGINT)` returns HUGEINT, `LENGTH` returns
  * BIGINT-from-INT — and a widened column hash-diverges even when
  * every VALUE matches, which is exactly how `catalog_generated`
  * shipped red in rounds 11-12 while `oracle_check.py`'s value compare
  * stayed green. The lint is `DESCRIBE (<sql>)` per oracle (DuckDB
  * plans without executing, so the full inventory lints in seconds)
  * via `tools/oracle_type_lint.py`.
  */
class OracleTypeSpec extends SparkSpec {

  private def pythonWithDuckdb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }

  private def runLint(json: String): (Int, String) = {
    val f = Files.createTempFile("oracle_lint", ".json")
    Files.writeString(f, json)
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/oracle_type_lint.py", sf,
      f.toString)).!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(f)
    (code, out.toString)
  }

  test("every declared oracle types inside the canonical set") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable")
    // the ANN VALUES oracles re-derive from the announced SF dir
    // (same contract Verify.dump sets before evaluating oracleSql)
    System.setProperty("graft.oracle.sfDir", sf)
    spark.sparkContext.setLogLevel("WARN") // force session init
    val (code, out) = runLint(Verify.oracleJson(SparkEntry.oracleSql))
    assert(code == 0, s"oracle type lint failed:\n$out")
    assert(out.contains("oracles type-clean"), out)
  }

  test("the lint catches a planted bare SUM(int) — HUGEINT") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable")
    val (code, out) = runLint(Verify.oracleJson(Map(
      "planted_bad" ->
        "SELECT SUM(l_orderkey) AS s FROM lineitem GROUP BY l_returnflag")))
    assert(code != 0, s"lint missed the planted HUGEINT:\n$out")
    assert(out.contains("planted_bad") && out.contains("HUGEINT"), out)
  }

  test("the lint accepts the CAST spelling of the same query") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable")
    val (code, _) = runLint(Verify.oracleJson(Map(
      "planted_ok" ->
        ("SELECT CAST(SUM(l_orderkey) AS BIGINT) AS s FROM lineitem " +
          "GROUP BY l_returnflag"))))
    assert(code == 0)
  }

  /** Paths.get sanity for the temp-file round trip (Windows-free env,
    * but keep the helper honest about where it writes).
    */
  test("lint temp files land under the system temp dir") {
    val f = Files.createTempFile("oracle_lint", ".json")
    assert(f.startsWith(Paths.get(System.getProperty("java.io.tmpdir"))))
    Files.deleteIfExists(f)
  }
}
