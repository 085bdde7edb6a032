package graft

import org.apache.spark.sql.functions._

/** Caching surface: persist/unpersist round-trip, InMemoryTableScan in
  * the plan, and result identity with the uncached frame.
  */
class CacheSpec extends SparkSpec {

  test("cache materializes to InMemoryTableScan and preserves results") {
    val base = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice")
    val cached = base.cache()
    try {
      val expected = base.groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      cached.count() // materialize
      val viaCache = cached.groupBy("o_orderpriority").count()
      val plan = viaCache.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"cache not used:\n$plan")
      val got = viaCache.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally cached.unpersist()
  }
}
