package graft

import org.apache.spark.sql.SparkSession

/** SparkSession lifecycle for the graft engine.
  *
  * One shared session per process (the reference builds and tears down a
  * session per asset — `taxi_pipeline_native.py:116-124,132` — which pays
  * JVM+session startup per query; we deliberately do not, per SURVEY §6).
  *
  * Config posture (SURVEY §4): rely on Catalyst/AQE; we only pin knobs that
  * differ from Spark defaults for local-mode + oracle parity:
  *   - shuffle.partitions sized to the machine, not 200
  *   - AQE on (runtime join-strategy + skew handling; the 100 TB path)
  *   - UTC session timezone (oracle parity, SURVEY §2.4.2)
  *   - nanosAsLong: the driver-generated `events.parquet` carries
  *     TIMESTAMP(NANOS) which Spark 4 refuses by default
  *     (PARQUET_TYPE_ILLEGAL); we read ns-as-long and truncate to µs in
  *     [[Tables]], matching DuckDB's TIMESTAMP_NS → TIMESTAMP truncation.
  */
object Engine {

  /** Confs every graft session needs regardless of master/size. */
  val requiredConfs: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.parquet.filterPushdown" -> "true",
    // recursive CTEs (q58): the default cteRecursionRowLimit (1M
    // CUMULATIVE result rows) is a single-node debugging guard that a
    // legitimate large input blows through on the first levels — at sf1
    // the halving chain alone produces ~3M rows. Lift it and keep
    // cteRecursionLevelLimit (100) as the runaway backstop: depth, not
    // volume, is what distinguishes a diverging recursion.
    "spark.sql.cteRecursionRowLimit" -> "-1",
  )

  /** Local-mode session for tests/bench; `cores` also sizes shuffle
    * partitions (local mode: no reason for more partitions than threads
    * on data that fits in memory; at cluster scale this knob is instead
    * set to ~2-3× total executor cores, or left to AQE coalescing).
    */
  /** Session extensions (a STATIC conf — set at build, not runtime):
    * the bounded-heap top-k strategy, the opt-in HLL rewrite, and the
    * SQL DML rule for graft catalog tables.
    */
  val extensionsConf: (String, String) =
    "spark.sql.extensions" -> "graft.plans.GraftExtensions"

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config(extensionsConf._1, extensionsConf._2)
      .config("spark.ui.enabled", "false")
    requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    installStatsRule(spark)
    spark
  }

  /** V1-bridged catalog scans report exact metadata statistics past
    * Spark's stats-blind `V1ScanWrapper`
    * ([[org.apache.spark.sql.graftshim.V1ScanStatsRule]]). The rule
    * must run AFTER early scan pushdown, and the only post-pushdown
    * logical hook is `experimental.extraOptimizations` (the "User
    * Provided Optimizers" batch) — extension injection points all run
    * earlier. Idempotent: an already-stats-capable wrapper is a no-op.
    */
  def installStatsRule(spark: SparkSession): Unit = {
    val rule = org.apache.spark.sql.graftshim.V1ScanStatsRule()
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }

  /** Apply graft's required runtime confs to an externally-built session
    * (e.g. the driver's). All of [[requiredConfs]] are runtime-settable.
    */
  def configure(spark: SparkSession): SparkSession = {
    requiredConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    installStatsRule(spark)
    spark
  }
}
