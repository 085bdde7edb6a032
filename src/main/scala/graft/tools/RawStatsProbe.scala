package graft.tools

import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** One-off measurement for SURVEY §6: value of a footer-stats bridge
  * for RAW parquet (non-catalog path) vs what AQE already recovers.
  * autoBroadcastJoinThreshold drops to 512 KiB so BOTH raw tables are
  * over-threshold (the 100 TB shape); the filtered side is selective.
  * hinted-broadcast emulates what a static stats bridge would plan
  * (no shuffle at all); aqe-default is today's raw path.
  */
object RawStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 512 * 1024)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", 512 * 1024)
    val dir = "/root/testdata/sf0.1"
    def filtered() = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") === 1.0 && col("l_discount") > 0.09)
      .select("l_orderkey", "l_quantity")
    def q(hint: Boolean) = {
      val ord = Tables(spark, dir, "orders")
      val f = if (hint) broadcast(filtered()) else filtered()
      ord.join(f, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    }
    def timed(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = f.collect().length
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.3f s groups=$n")
    }
    println("=== static plan (pre-AQE) ===")
    println(q(false).queryExecution.sparkPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    timed("warmup", q(false))
    val df = q(false); df.collect()
    println("=== executed (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("AQEShuffleRead"))
      .mkString("\n"))
    for (i <- 1 to 3) {
      timed(s"aqe-default-$i", q(false))
      timed(s"static-broadcast-$i", q(true))
    }
    spark.stop()
  }
}
