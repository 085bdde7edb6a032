package graft

import org.apache.spark.sql.functions._

/** Runtime row-level pruning: when a selective dimension filter feeds a
  * shuffle join, the optimizer can build a bloom filter from the dim
  * side at runtime and push it into the fact scan — rows that cannot
  * join are dropped BEFORE the exchange. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * matching fraction. The spec pins the thresholds so the behavior is
  * deterministic at test scale and asserts the filter lands in the
  * plan AND that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    withConfs(Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val li = Tables(spark, sf, "lineitem")
      val o = Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$optimized")
      // semantics unchanged by the injected filter
      val n = joined.head.getLong(1)
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain && n > 0)
    }
  }
}
