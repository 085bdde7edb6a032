package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: source wins on collision, target passes through, inserts land") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val source = Seq((2L, "b2", 21.0), (9L, "new", 90.0)).toDF("k", "name", "v")
    val out = Merge.upsert(target, source, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect.toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0),
      (9L, "new", 90.0)))
  }

  test("applyChangelog: latest version wins; delete only if final") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "v")
    val chg = Seq(
      (1L, 11.0, 1L, "U"), (1L, 12.0, 2L, "U"), // two updates: v2 wins
      (2L, 0.0, 1L, "D"), (2L, 22.0, 2L, "U"),  // delete superseded by update
      (3L, 0.0, 5L, "D"),                        // final delete removes key
      (9L, 90.0, 1L, "I"))                       // plain insert
      .toDF("k", "v", "version", "op")
    val out = Merge.applyChangelog(target, chg, Seq("k"), "version", "op")
      .orderBy("k").as[(Long, Double)].collect.toSeq
    assert(out === Seq((1L, 12.0), (2L, 22.0), (4L, 40.0), (9L, 90.0)))
  }

  test("merge is a broadcast anti-join when the change set is small") {
    // the 100 TB posture: a small changelog broadcasts, so the merge is
    // one map-only pass over the (huge) target — no target shuffle.
    val target = Tables(spark, sf, "orders")
    val source = target.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderstatus", lit("X"))
    val plan = Merge.upsert(target, source, Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"small-source merge must broadcast the anti-join side:\n$plan")
  }
}
