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

  test("CacheTracker compacts dead refs in track() and empties on unpersistAll") {
    CacheTracker.unpersistAll()
    // repeated track/release cycles: registry must stay bounded by the
    // LIVE frame count, not grow one entry per historical persist
    (1 to 5).foreach { _ =>
      var df = Tables(spark, sf, "region").limit(1).persist()
      df.count()
      CacheTracker.track(df)
      df.unpersist(blocking = true)
      df = null // drop the only strong ref
    }
    (1 to 10).foreach { _ => System.gc(); Thread.sleep(20) }
    // one more track after GC: compaction runs inside track()
    val live = Tables(spark, sf, "region").limit(1).persist()
    try {
      CacheTracker.track(live)
      assert(CacheTracker.registrySize <= 2,
        s"registry retained dead refs: size=${CacheTracker.registrySize}")
      CacheTracker.unpersistAll()
      assert(CacheTracker.trackedCount == 0)
      assert(CacheTracker.registrySize == 0)
    } finally live.unpersist()
  }
}
