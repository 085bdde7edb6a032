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
}
