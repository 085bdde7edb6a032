package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.queries.EngineOps

/** The CBO statistics layer, proven at the PLAN level on the same
  * catalog tables the judged `catalog_cbo_join` row reads (the result
  * itself is hash-judged via its oracle entry): with rowCount, ranges
  * and ndv flowing from the table log — no ANALYZE pass —
  * CostBasedJoinReorder must pull the filtered (selective) part dim
  * ahead of the syntactically-first supplier dim, and BOTH dim joins
  * must plan as STATIC broadcast hash joins pre-AQE from exact scan
  * sizes.
  */
class CboJoinSpec extends SparkSpec {

  /** Leaf description of the innermost join's right side — the
    * first-joined relation under a left-deep join tree.
    */
  private def firstJoined(sql: String): String = {
    val joins = spark.sql(sql).queryExecution.optimizedPlan.collect {
      case j: Join => j
    }
    assert(joins.size == 2, s"expected a 2-join tree, got ${joins.size}")
    joins.last.right.collectLeaves().head.toString
  }

  test("catalog_cbo_join: log stats reorder the star and broadcast statically") {
    val q = SparkEntry.queries("catalog_cbo_join")(spark, sf)
    assert(q.collect().nonEmpty)
    val (cat, _) = EngineOps.cboJoinTables(spark, sf)
    val sql = EngineOps.cboJoinSql(cat)
    EngineOps.withStatsPlanning(spark) {
      // premise: without cost-based reorder the syntactic order holds
      // (supplier first)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = firstJoined(sql)
      assert(syntactic.contains("cbos"),
        s"premise: syntactic order should join supplier first: $syntactic")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = firstJoined(sql)
      assert(reordered.contains("cbop"),
        s"join reorder should pull the filtered part dim first: $reordered")
      // static plan (pre-AQE): both dims broadcast from exact scan
      // sizes — before the stats bridge every catalog join planned
      // sort-merge and left the fix to AQE
      val static = spark.sql(sql).queryExecution.sparkPlan
      val bhj = static.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.size == 2,
        s"expected 2 STATIC broadcast hash joins, got ${bhj.size}:\n$static")
    }
  }
}
