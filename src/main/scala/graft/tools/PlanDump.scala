package graft.tools

import graft.{Engine, SparkEntry}

/** Print a query's formatted physical plan (after execution, so AQE's
  * final plan shows): `sbt "runMain graft.tools.PlanDump <sfDir> <name>"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = if (args.length > 1) args(1) else "dedup_ngram_jaccard"
    val spark = Engine.local(8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("=== " + name + " ===")
    println(df.queryExecution.executedPlan.toString.take(14000))
    spark.stop()
  }
}
