package graft.tools

import org.apache.spark.sql.functions._

import graft.{Canonical, Engine, Tables}

/** Round-16 measurement: how much of a single-row-group fact-scan
  * aggregation is parquet decode (serial, unavoidable) vs expression
  * work (parallelizable behind an exchange)?
  * `runMain graft.tools.ScanProbe <sfDir>`
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scanprobe] $label%-40s ${ts(1)}%7.3f s (min ${ts.head}%.3f)")
    }

    val li = Tables(spark, sfDir, "lineitem")
      .select("l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")

    time("scan 5 cols, noop") {
      li.write.format("noop").mode("overwrite").save()
    }
    time("scan + decimal cast, noop") {
      li.select(col("l_linestatus"), Canonical.dec(col("l_quantity")),
        Canonical.dec(col("l_extendedprice")), Canonical.dec(col("l_discount")),
        Canonical.dec(col("l_tax")))
        .write.format("noop").mode("overwrite").save()
    }
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_linestatus")
      .agg(Canonical.moneySum(col("l_quantity")).as("sum_qty"),
        Canonical.moneySum(col("l_extendedprice")).as("sum_price"),
        Canonical.moneySum(col("l_discount")).as("sum_disc"),
        Canonical.moneySum(col("l_tax")).as("sum_tax"))
    time("q45 agg shape, direct") {
      agg(li).write.format("noop").mode("overwrite").save()
    }
    time("q45 agg shape, repartition(32) first") {
      agg(li.repartition(32)).write.format("noop").mode("overwrite").save()
    }

    // Long-units rewrite: money values carry <=2 real decimals, so
    // round-to-4dp in integer 1e-4 units is exact; the final
    // sum/10000.0 is one correctly-rounded IEEE division — the same
    // double Decimal.toDouble produces. Guard contract unchanged: the
    // double OUTPUT is only value-exact under 2^53 either way.
    def unitsSum(c: org.apache.spark.sql.Column) = {
      val u = (c * lit(10000.0) +
        when(c < 0, lit(-0.5)).otherwise(lit(0.5))).cast("long")
      (sum(u) / lit(10000.0))
    }
    def aggL(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_linestatus")
      .agg(unitsSum(col("l_quantity")).as("sum_qty"),
        unitsSum(col("l_extendedprice")).as("sum_price"),
        unitsSum(col("l_discount")).as("sum_disc"),
        unitsSum(col("l_tax")).as("sum_tax"))
    time("q45 agg shape, long units") {
      aggL(li).write.format("noop").mode("overwrite").save()
    }
    // bit-equality check
    val a = agg(li).orderBy("l_linestatus").collect()
    val b = aggL(li).orderBy("l_linestatus").collect()
    val same = a.zip(b).forall { case (x, y) =>
      (1 to 4).forall(i =>
        java.lang.Double.doubleToLongBits(x.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(y.getDouble(i)))
    }
    println(s"[scanprobe] long-units bit-identical: $same rows=${a.length}")
    a.take(2).foreach(r => println(s"[scanprobe] dec  $r"))
    b.take(2).foreach(r => println(s"[scanprobe] long $r"))

    // small-table A/B: one moneySum over orders (150k rows) — is the
    // split-long combine a per-execution regression on small inputs?
    val ord = Tables(spark, sfDir, "orders")
      .select("o_orderpriority", "o_totalprice")
    def decSum(c: org.apache.spark.sql.Column) =
      sum(Canonical.dec(c)).cast("double")
    time("orders agg, decimal sum") {
      ord.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    time("orders agg, fixed-point sum") {
      ord.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Canonical.moneySum(col("o_totalprice")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
