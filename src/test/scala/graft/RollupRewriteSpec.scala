package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MaterializedRollup

/** The materialized-rollup rewrite: flag-gated, answer-preserving, and
  * observable in the plan (the aggregate's scan moves from the base
  * table to the MV). Negative cases must leave plans untouched.
  */
class RollupRewriteSpec extends SparkSpec {

  // sparkPlan, not executedPlan: AQE hides the scan under its root
  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten

  test("covered aggregate is answered from the rollup; answers identical") {
    MaterializedRollup.install(spark)
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val base = Tables.read(spark, s"$sf/orders.parquet")
    MaterializedRollup.create(spark, base, baseTag = s"$sf/orders.parquet",
      groupKeys = Seq("o_orderpriority", "o_orderstatus"),
      sumCols = Seq("o_custkey"), mvPath = s"$mvDir/mv")
    def q() = Tables.read(spark, s"$sf/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("s"))
      .orderBy("o_orderpriority")
    try {
      val plain = q().collect()
      spark.conf.set(MaterializedRollup.flag, "true")
      val accel = q()
      assert(scannedPaths(accel).exists(_.contains(s"$mvDir/mv")),
        s"rewritten plan must scan the MV:\n${accel.queryExecution.executedPlan}")
      assert(!scannedPaths(accel).exists(_.contains("orders.parquet")),
        "rewritten plan must NOT scan the base table")
      assert(accel.collect().sameElements(plain),
        "rollup answer must be byte-identical to the base-table answer")
      // subset grouping: MV keyed (priority, status), query by priority
      // only — the re-aggregation collapses MV rows
      assert(accel.schema.map(f => (f.name, f.dataType)) ==
        q().schema.map(f => (f.name, f.dataType)))
    } finally {
      spark.conf.set(MaterializedRollup.flag, "false")
      MaterializedRollup.drop(s"$sf/orders.parquet")
    }
  }

  test("non-covered shapes and flag-off leave the plan on the base table") {
    MaterializedRollup.install(spark)
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv2").toString
    val base = Tables.read(spark, s"$sf/orders.parquet")
    MaterializedRollup.create(spark, base, baseTag = s"$sf/orders.parquet",
      groupKeys = Seq("o_orderpriority"), sumCols = Seq("o_custkey"),
      mvPath = s"$mvDir/mv")
    try {
      // flag off: untouched
      val off = base.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(scannedPaths(off).exists(_.contains("orders.parquet")))
      spark.conf.set(MaterializedRollup.flag, "true")
      // MAX is not re-aggregable from this MV: untouched
      val mx = Tables.read(spark, s"$sf/orders.parquet")
        .groupBy("o_orderpriority").agg(max(col("o_totalprice")).as("m"))
      assert(scannedPaths(mx).exists(_.contains("orders.parquet")),
        "uncovered aggregate must stay on the base table")
      // SUM over a double column is not exact to re-aggregate: untouched
      val dbl = Tables.read(spark, s"$sf/orders.parquet")
        .groupBy("o_orderpriority").agg(sum(col("o_totalprice")).as("s"))
      assert(scannedPaths(dbl).exists(_.contains("orders.parquet")),
        "float sums must not rewrite")
      // filter between scan and aggregate: untouched
      val filt = Tables.read(spark, s"$sf/orders.parquet")
        .filter(col("o_orderstatus") === "O")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(scannedPaths(filt).exists(_.contains("orders.parquet")),
        "filtered queries must not rewrite (predicate not in the MV)")
    } finally {
      spark.conf.set(MaterializedRollup.flag, "false")
      MaterializedRollup.drop(s"$sf/orders.parquet")
    }
  }

  test("the judged mv_rollup_rewrite query really scans the rollup") {
    val df = SparkEntry.queries("mv_rollup_rewrite")(spark, sf)
    val paths = scannedPaths(df)
    assert(paths.nonEmpty && paths.forall(_.endsWith("-rollup")),
      s"judged MV query must scan ONLY the rollup, got $paths:\n${df.queryExecution.sparkPlan}")
  }

  test("matching-but-rejected candidates cause no MV file listing") {
    // The rule must never do IO on the query path: the MV's relation is
    // resolved once at create(). Proof: delete the MV files after
    // create, then run a query over the registered base table that
    // MATCHES the table but is REJECTED by the rewrite (float sum) —
    // the old read-inside-the-rule would throw PATH_NOT_FOUND from the
    // optimizer; the cached-relation rule must leave the query on the
    // base table and answer it correctly.
    MaterializedRollup.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-mv4").toString
    val base = Tables.read(spark, s"$sf/orders.parquet")
    MaterializedRollup.create(spark, base, baseTag = s"$sf/orders.parquet",
      groupKeys = Seq("o_orderpriority"), sumCols = Seq("o_custkey"),
      mvPath = s"$dir/mv")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$dir/mv"))
    spark.conf.set(MaterializedRollup.flag, "true")
    try {
      val dbl = Tables.read(spark, s"$sf/orders.parquet")
        .groupBy("o_orderpriority").agg(sum(col("o_totalprice")).as("s"))
        .orderBy("o_orderpriority")
      val want = {
        spark.conf.set(MaterializedRollup.flag, "false")
        val w = Tables.read(spark, s"$sf/orders.parquet")
          .groupBy("o_orderpriority").agg(sum(col("o_totalprice")).as("s"))
          .orderBy("o_orderpriority").collect()
        spark.conf.set(MaterializedRollup.flag, "true")
        w
      }
      assert(scannedPaths(dbl).exists(_.contains("orders.parquet")))
      assert(dbl.collect().sameElements(want),
        "rejected candidate must run untouched even with the MV files gone")
    } finally {
      spark.conf.set(MaterializedRollup.flag, "false")
      MaterializedRollup.drop(s"$sf/orders.parquet")
    }
  }

  test("a table whose path merely CONTAINS the base path never rewrites") {
    MaterializedRollup.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-mv3").toString
    // two same-schema tables; the second's path contains the first's name
    val base = Tables.read(spark, s"$sf/orders.parquet")
    base.write.mode("overwrite").parquet(s"$dir/orders")
    base.withColumn("o_custkey", col("o_custkey") * 2)
      .write.mode("overwrite").parquet(s"$dir/orders_returns")
    MaterializedRollup.create(spark, spark.read.parquet(s"$dir/orders"),
      baseTag = s"$dir/orders", groupKeys = Seq("o_orderpriority"),
      sumCols = Seq("o_custkey"), mvPath = s"$dir/mv")
    spark.conf.set(MaterializedRollup.flag, "true")
    try {
      val other = spark.read.parquet(s"$dir/orders_returns")
        .groupBy("o_orderpriority").agg(sum(col("o_custkey")).as("s"))
      assert(scannedPaths(other).exists(_.contains("orders_returns")),
        "similarly-named table must stay on its own data")
      val own = spark.read.parquet(s"$dir/orders")
        .groupBy("o_orderpriority").agg(sum(col("o_custkey")).as("s"))
      assert(scannedPaths(own).exists(_.contains("/mv")),
        "the registered table itself must still rewrite")
    } finally {
      spark.conf.set(MaterializedRollup.flag, "false")
      MaterializedRollup.drop(s"$dir/orders")
    }
  }
}
