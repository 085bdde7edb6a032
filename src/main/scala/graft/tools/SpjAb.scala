package graft.tools

import org.apache.spark.sql.functions._

/** A/B microbench for the SPJ read path (not part of the driver
  * contract): builds a bucket-partitioned graft table from
  * sf-dir lineitem once, then times a full-scan aggregate through the
  * SPJ batch with the COLUMNAR reader on vs off (same plan shape, same
  * partitions — only the decode differs). Prints medians of 5.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.SpjAb"
  */
object SpjAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "spj-ab")
    spark.sparkContext.setLogLevel("WARN")
    val gt = graft.table.GraftTable
    // MULT replicates lineitem (disjoint key ranges) so the scan is
    // decode-bound, not setup-bound — the regime that matters at scale
    val mult = sys.env.getOrElse("SPARK_GRAFT_AB_MULT", "8").toInt
    val li0 = graft.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
    val li = (0 until mult).map(i =>
      li0.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 1000000000L)))
      .reduce(_ unionAll _)
    val src = new java.io.File(s"$sfDir/lineitem.parquet")
    val fp = java.lang.Long.toHexString(
      src.length ^ (src.lastModified * 31) ^ s"spjab_v2_$mult".hashCode.toLong)
    val root = s"target/graft_table/spjab_$fp"
    if (gt.snapshot(spark, root).version < 0L) {
      gt.createPartitioned(spark, root, li.schema,
        Seq(graft.table.Partitioning.PBucket("l_orderkey", 16)))
      gt.append(spark, root, li)
    }
    // DV-masked twin: ~1% scattered masked rows — prices the columnar
    // batch-compaction premium against the row reader's inline skip
    val rootDv = s"target/graft_table/spjab_dv_$fp"
    if (gt.snapshot(spark, rootDv).version < 0L) {
      gt.createPartitioned(spark, rootDv, li.schema,
        Seq(graft.table.Partitioning.PBucket("l_orderkey", 16)))
      gt.append(spark, rootDv, li)
      gt.deleteWhereDv(spark, rootDv, "l_partkey % 101 = 0", prune = None)
    }
    spark.conf.set(graft.table.GraftSpj.ConfKey, "true")

    def time(tableRoot: String, vectorized: Boolean): Double = {
      spark.conf.set(graft.table.GraftSpj.VectorizedKey, vectorized.toString)
      val reps = Seq.fill(5) {
        val t0 = System.nanoTime()
        // the V2 route (the one GraftSpj serves); EXPRESSION aggs so
        // nothing closed-form pushes down — the scan decodes every row
        spark.read.format("grafttable").option("path", tableRoot).load()
          .agg(expr("sum(l_quantity * l_extendedprice)"),
            expr("sum(l_orderkey % 97)"),
            expr("sum(length(l_returnflag))"),
            expr("max(l_shipdate)"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.sorted.apply(2)
    }
    // sanity: the scan below must be the SPJ batch, not the V1 bridge
    val plan = spark.read.format("grafttable").option("path", root).load()
      .agg(expr("sum(l_quantity * l_extendedprice)"))
      .queryExecution.executedPlan.toString
    require(plan.contains("GraftBatchScan"),
      s"A/B is not measuring the SPJ batch scan:\n$plan")
    time(root, vectorized = true) // warm file index + codegen both paths
    time(root, vectorized = false)
    val colSec = time(root, vectorized = true)
    val rowSec = time(root, vectorized = false)
    val colDvSec = time(rootDv, vectorized = true)
    val rowDvSec = time(rootDv, vectorized = false)
    println(f"""{"spj_scan_columnar_sec": $colSec%.3f, "spj_scan_row_sec": $rowSec%.3f, "speedup": ${rowSec / colSec}%.2f, "spj_dv_columnar_sec": $colDvSec%.3f, "spj_dv_row_sec": $rowDvSec%.3f, "dv_speedup": ${rowDvSec / colDvSec}%.2f}""")
    spark.stop()
  }
}
