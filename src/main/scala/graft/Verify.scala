package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Engine.extensionsConf._1, Engine.extensionsConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir)
    spark.stop()
  }

  /** The dump loop on a caller-owned session (the tagged soak suite
    * reuses it without stopping the shared test SparkContext).
    * @return names of queries that failed to execute
    */
  def dump(spark: SparkSession, sfDir: String, outDir: String): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    // announce the SF dir so the driver-side ANN oracles
    // (queries.AnnOracle, surfaced through LlmOps.oracleSql) can
    // re-derive their expected rows from the same input tables
    System.setProperty("graft.oracle.sfDir", sfDir)
    val failed = SparkEntry.queries.flatMap { case (name, fn) =>
      val r =
        try { fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name"); None }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          Some(name)
        }
      // queries may persist shared intermediates (e.g. the ngram
      // inverted index); release them so 76 queries in one JVM don't
      // accumulate cache
      spark.catalog.clearCache()
      r
    }.toSeq
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracleJson(SparkEntry.oracleSql))
    failed
  }

  /** The oracle map as one JSON object. String escape covers
    * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
    * builder-authored SQL would otherwise make the driver's json.load
    * fail and silently zero the round's correctness. Shared by
    * [[dump]], [[graft.tools.VerifyOne]], and OracleTypeSpec's lint.
    */
  def oracleJson(m: Map[String, String]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
