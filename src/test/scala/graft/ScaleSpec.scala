package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Skew + bucketing specs: results must equal the plain join, and the
  * bucketed join's physical plan must be exchange-free on the probe
  * side — the property that saves the shuffle at 100 TB.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join under a pathologically hot key") {
    // 10k facts, 90% on one key — the straggler shape
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "v")
    val dim = (0 to 6).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k")
    val salted = Scale.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "name").exceptAll(plain.select("k", "v", "name")).isEmpty)
  }

  test("bucketed join is exchange-free and matches the shuffle join") {
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(l, "b_lineitem", "o_orderkey", 8)
    val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    val expected = o.join(l, "o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("binned range join ≡ theta join, with an equi-join plan (no BNLJ)") {
    import spark.implicits._
    val orders = Tables(spark, sf, "orders")
    // integer-bounded tiers so bin edges are exact in binary
    val tiers = Seq(("T1", 0.0, 75000.0), ("T2", 75001.0, 150000.0),
      ("T3", 150001.0, 300000.0), ("T4", 300001.0, 600000.0))
      .toDF("tier", "lo", "hi")
    val theta = orders.join(tiers,
      col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))
      .select("o_orderkey", "tier")
    val binned = graft.operators.Scale
      .binnedRangeJoin(orders, "o_totalprice", tiers, "lo", "hi", binWidth = 50000.0)
      .select("o_orderkey", "tier")
    assert(binned.exceptAll(theta).isEmpty && theta.exceptAll(binned).isEmpty,
      "binned range join must produce exactly the theta join's pairs")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned formulation must plan as an equi-join:\n$plan")
  }

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

  test("AQE splits a skewed shuffle partition at runtime") {
    // The runtime complement to explicit salting: one hot key funnels
    // most of the left side into one shuffle partition; with skew-join
    // thresholds proportional to test scale, AQE detects the oversized
    // partition at the exchange and splits it across tasks. At 100 TB
    // the same mechanism (default thresholds) is what keeps one hot
    // join key from serializing a 1000-executor stage on one task.
    import spark.implicits._
    withConfs(Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20000",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10000",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      // half a million rows, 50% piled on one key; the hash payload
      // resists shuffle compression so the hot partition's COMPRESSED
      // size (what skew detection measures) clears the threshold
      val left = spark.range(500000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
          xxhash64(col("id")).as("v"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k").groupBy().agg(count(lit(1)).as("n"))
      // collect() drives THIS queryExecution (head() would plan a
      // separate limited execution and leave this adaptive plan
      // unfinalized)
      val n = joined.collect()(0).getLong(0)
      assert(n == 500000L, s"join row count wrong: $n")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skewed"),
        s"expected AQE to mark/split a skewed partition:\n$finalPlan")
    }
  }
}
