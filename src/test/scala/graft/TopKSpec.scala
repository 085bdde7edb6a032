package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.TopK

/** Custom TopKPerGroup operator spec: result-equal to the window
  * formulation (with a unique tiebreak so ties can't differ), single
  * exchange in the plan, and correct on edge shapes (k > group size,
  * empty input, one group).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(groupCol: String, orderDesc: String, tiebreak: String,
      k: Int, df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(orderDesc).desc, col(tiebreak))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  test("top-3 customers by acctbal per segment ≡ window formulation") {
    val c = Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    val viaOp = TopK.perGroup(c, Seq("c_mktsegment"),
      Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
    val viaWin = windowTopK("c_mktsegment", "c_acctbal", "c_custkey", 3, c)
    assert(viaOp.count() == viaWin.count())
    assert(viaOp.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaOp).isEmpty)
  }

  test("plan: partial below + final above exactly one exchange, no sort") {
    val c = Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    val df = TopK.perGroup(c, Seq("c_mktsegment"),
      Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
    df.collect()
    // AQE prints Final + Initial plans; audit only the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerGroupFinal"), s"final exec missing:\n$plan")
    assert(plan.contains("TopKPerGroupPartial"), s"partial exec missing:\n$plan")
    assert(!plan.contains("Sort "), s"heap operator must not sort:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    // the partial pass must sit BELOW the exchange (map side)
    val lines = plan.linesIterator.toSeq
    val iPartial = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    val iExchange = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val iFinal = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    assert(iFinal < iExchange && iExchange < iPartial,
      s"want Final above Exchange above Partial:\n$plan")
  }

  test("map-side partial bounds shuffled rows to ≤ groups·k per partition") {
    val c = Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_custkey", "c_acctbal")
    val inputRows = c.count()
    val nParts = c.rdd.getNumPartitions
    val nGroups = c.select("c_mktsegment").distinct().count()
    val df = TopK.perGroup(c, Seq("c_mktsegment"),
      Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
    df.collect()
    // walk through AQE wrappers: AdaptiveSparkPlanExec hides its final
    // plan and materialized QueryStageExec nodes are leaves to collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val partial = allNodes(df.queryExecution.executedPlan)
      .collectFirst { case e: graft.plans.TopKPerGroupExec if e.partial => e }
    assert(partial.isDefined, "partial exec not found in executed plan")
    val shuffled = partial.get.metrics("numOutputRows").value
    assert(shuffled <= nGroups * 3 * nParts,
      s"partial emitted $shuffled rows > bound ${nGroups * 3 * nParts}")
    assert(shuffled < inputRows,
      s"partial did not reduce shuffle volume ($shuffled vs $inputRows input rows)")
  }

  test("edge shapes: k larger than groups, single group, empty input") {
    val tiny = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val all = TopK.perGroup(tiny, Seq("g"), Seq("v" -> false), 10)
    assert(all.count() == 3)
    val one = TopK.perGroup(tiny.filter($"g" === "a"), Seq("g"), Seq("v" -> false), 1)
    assert(one.collect().map(_.getInt(1)).toSeq == Seq(2))
    val empty = TopK.perGroup(tiny.filter($"g" === "zz"), Seq("g"), Seq("v" -> false), 2)
    assert(empty.count() == 0)
  }

  test("larger input: top-5 orders per priority matches window") {
    val o = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val viaOp = TopK.perGroup(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
    val viaWin = windowTopK("o_orderpriority", "o_totalprice", "o_orderkey", 5, o)
    assert(viaOp.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaOp).isEmpty)
  }
}
