package graft

import org.apache.spark.sql.functions._

import graft.quality.Checks

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("clean star schema passes all checks") {
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    assert(Checks.notNull(orders, Seq("o_orderkey", "o_custkey")).forall(_.passed))
    assert(Checks.unique(orders, "o_orderkey").passed)
    assert(Checks.referential(orders, "o_custkey", customer, "c_custkey").passed)
    assert(Checks.satisfies(orders, "price>0", col("o_totalprice") > 0).passed)
  }

  test("planted violations are counted exactly") {
    val dirty = Seq(
      (Some(1L), 10.0), (Some(1L), -5.0), (None, 3.0), (Some(2L), 0.0))
      .toDF("id", "amount")
    assert(Checks.notNull(dirty, Seq("id")).head.violations == 1)
    assert(Checks.unique(dirty, "id").violations == 1) // key 1 duplicated
    assert(Checks.satisfies(dirty, "amount>0", col("amount") > 0).violations == 2)
    val parent = Seq(1L).toDF("pid")
    assert(Checks.referential(dirty.filter(col("id").isNotNull), "id", parent, "pid")
      .violations == 1) // id=2 is an orphan
  }

  test("lazy suite: same counts as eager checks, one job for scan checks") {
    val dirty = Seq(
      (Some(1L), 10.0), (Some(1L), -5.0), (None, 3.0), (Some(2L), 0.0))
      .toDF("id", "amount")
    val parent = Seq(1L).toDF("pid")
    val suite = Checks
      .scanSuite(dirty, Seq("id"), Seq("amount>0" -> (col("amount") > 0)))
      .unionAll(Checks.uniqueLazy(dirty, "id"))
      .unionAll(Checks.referentialLazy(
        dirty.filter(col("id").isNotNull), "id", parent, "pid"))
    val got = suite.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(id)" -> 1L, "satisfies(amount>0)" -> 2L,
      "unique(id)" -> 1L, "fk(id->pid)" -> 1L))
    // the scan-shaped checks share ONE aggregation over ONE scan
    val scanPlan = Checks
      .scanSuite(dirty, Seq("id"), Seq("amount>0" -> (col("amount") > 0)))
      .queryExecution.optimizedPlan.toString
    assert(scanPlan.linesIterator.count(_.contains("LocalRelation")) <= 1,
      s"scan checks must not rescan per check:\n$scanPlan")
  }
}
