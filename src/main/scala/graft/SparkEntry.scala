package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` carry the declared inventory (SURVEY §2.4 —
  * Q01–Q62 plus the named operator queries; 158 total as of round 16,
  * ALL DuckDB-oracle hash-judged: the ANN tiers judge via exact
  * driver-derived VALUES oracles since round 11) across the L2/L3
  * operator surface; names must match between the two maps, and every
  * aliased output column matches the oracle's.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's analytics
    * question (filter → group → avg, `taxi_pipeline_native.py:92-97`)
    * transplanted onto the judged star schema. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    Engine.configure(spark)
    queries("q02_ref_query")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Contract.queries ++ graft.queries.LlmOps.queries ++
      graft.queries.PortableQueries.queries ++ graft.queries.EngineOps.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * get the driver's weaker rows-only check + ScalaTest oracles).
    */
  def oracleSql: Map[String, String] =
    graft.queries.Contract.oracleSql ++ graft.queries.LlmOps.oracleSql ++
      graft.queries.PortableQueries.oracleSql ++ graft.queries.EngineOps.oracleSql
}
