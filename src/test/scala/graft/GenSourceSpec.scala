package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.GenSource

/** The DSv2 connector, end to end: values match the generator
  * formulas, column pruning reaches the scan's readSchema, id-range
  * filters are consumed exactly (pushed AND pruning whole partitions),
  * and non-id predicates stay residual without losing rows.
  */
class GenSourceSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int = 8) =
    spark.read.format("graftgen")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  // sparkPlan, not executedPlan: AQE wraps aggregates in an adaptive
  // root whose children are hidden until execution
  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }.head

  test("generated values match the formulas; short name resolves") {
    val df = gen(1000)
    assert(df.count() == 1000)
    val r = df.filter(col("id") === 123L).head
    assert(r.getLong(r.fieldIndex("ts_us")) == GenSource.tsOf(123))
    assert(r.getString(r.fieldIndex("device")) == "d23")
    assert(r.getLong(r.fieldIndex("reading")) == GenSource.readingOf(123))
  }

  test("column pruning reaches the scan") {
    val df = gen(1000).select(sum(col("reading")).as("s"))
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.sameElements(Array("reading")),
      s"scan must materialize only 'reading', got ${scan.scan.readSchema()}")
    assert(df.head.getLong(0) ==
      (0L until 1000L).map(GenSource.readingOf).sum)
  }

  test("id bounds push down and prune whole partitions") {
    val df = gen(100000, parts = 8).filter(col("id") >= 75000L)
    val scan = scanOf(df)
    // partitions 0..5 ([0,75000)) must never be planned
    assert(scan.inputRDD.getNumPartitions == 2,
      s"expected 2 surviving partitions, got ${scan.inputRDD.getNumPartitions}")
    assert(scan.scan.description().contains("GreaterThanOrEqual(id,75000)"),
      s"filter not pushed: ${scan.scan.description()}")
    assert(df.count() == 25000)
    // no residual Filter node: the bound was consumed exactly
    val hasFilter = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.FilterExec => true
      case _ => false
    }
    assert(!hasFilter, "id-only bound must be fully consumed by the source")
  }

  test("LIMIT and ORDER BY id LIMIT shrink the generated range") {
    // plain LIMIT: complete pushdown — bounds collapse to n ids
    val lim = gen(1000000000L).limit(5)
    assert(scanOf(lim).scan.description().contains("bounds=[0,5)"))
    assert(lim.collect().map(_.getLong(0)).sorted.sameElements(0L until 5L))
    // descending TopN: high end of the range survives, order correct
    val top = gen(1000000000L).orderBy(col("id").desc).limit(3)
    assert(scanOf(top).scan.description()
      .contains("bounds=[999999997,1000000000)"))
    assert(top.collect().map(_.getLong(0))
      .sameElements(Seq(999999999L, 999999998L, 999999997L)))
  }

  test("global COUNT/MIN/MAX answer closed-form — zero rows generated") {
    // a trillion-row table: only per-partition arithmetic can answer this
    val df = gen(1000000000000L, parts = 8)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PushedAggregates: [count, min_id, max_id]"),
      s"aggregates not pushed: ${scan.scan.description()}")
    val r = df.head
    assert(r.getLong(0) == 1000000000000L && r.getLong(1) == 0L &&
      r.getLong(2) == 999999999999L)
    // pushed bounds compose: count under an id filter stays closed-form
    val filtered = gen(1000000000000L).filter(col("id") >= 100L).count()
    assert(filtered == 999999999900L)
  }

  test("exact reported statistics let a small generated dim auto-broadcast") {
    val dim = gen(100, parts = 2).select(col("id").as("d_id"), col("device"))
    val fact = gen(100000, parts = 8).select(col("id"), col("reading"))
    val joined = fact.join(dim, col("id") % 100L === col("d_id"))
    val hasBroadcast = joined.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }
    assert(hasBroadcast,
      "planner must pick broadcast from the connector's reported stats, no hint:\n" +
        joined.queryExecution.sparkPlan)
    assert(joined.count() == 100000L)
  }

  test("streaming read drains the range in batchRows-sized microbatches") {
    val q = spark.readStream.format("graftgen")
      .option("rows", "1000").option("batchRows", "400").load()
      .filter(col("id") >= 200L) // pushdown applies to the stream too
      .writeStream.format("memory").queryName("graftgen_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graftgen_stream")
    assert(got.count() == 800)
    assert(got.agg(min(col("id")), max(col("id"))).head match {
      case r => r.getLong(0) == 200L && r.getLong(1) == 999L
    })
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.length >= 2, s"expected multiple microbatches, got ${batches.toSeq}")
  }

  test("Trigger.AvailableNow drains the bounded stream and self-terminates") {
    val q = spark.readStream.format("graftgen")
      .option("rows", "1000").option("batchRows", "300").load()
      .writeStream.format("memory").queryName("graftgen_avail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    assert(q.awaitTermination(60000), "AvailableNow query must stop itself")
    assert(spark.table("graftgen_avail").count() == 1000)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.length == 4 && batches.forall(_ <= 300),
      s"admission control must bound batches to 300 rows: ${batches.toSeq}")
  }

  test("empty pushed range still counts 0; boundary literals don't overflow") {
    // COUNT(*) over a fully-filtered range: the agg pushdown must
    // refuse (zero planned partitions would sum partials to NULL)
    assert(gen(1000).filter(col("id") >= 1000L).count() == 0L)
    assert(gen(1000).filter(col("id") >= 1000L)
      .agg(count(lit(1))).head.getLong(0) == 0L)
    // Long.MaxValue bounds must saturate, not wrap to an empty scan
    assert(gen(1000).filter(col("id") <= Long.MaxValue).count() == 1000L)
    assert(gen(1000).filter(col("id") > Long.MaxValue).count() == 0L)
  }

  test("graftsink overwrite mode works via the truncate builder") {
    import graft.sources.SinkSource
    gen(100).select(col("id")).write.format("graftsink")
      .option("tag", "ow").mode("overwrite").save()
    assert(SinkSource.results("ow")._1 == 100L)
  }

  test("graftsink write commits exact rows/bytes and a partition-proof checksum") {
    import graft.sources.SinkSource
    val df = gen(50000).select(col("id"), col("reading"))
    df.write.format("graftsink").option("tag", "t1").mode("append").save()
    val (rows, bytes, sum) = SinkSource.results("t1")
    assert(rows == 50000L && bytes == 50000L * 16)
    val expected = (0L until 50000L).foldLeft(0L)((a, i) => a ^ SinkSource.hash(i))
    assert(sum == expected, "checksum must fold every id exactly once")
    // radically different partitioning, same commit result
    df.repartition(13).write.format("graftsink").option("tag", "t2")
      .mode("append").save()
    assert(SinkSource.results("t2") == ((rows, bytes, sum)))
  }

  test("graftsink commit log: same-tag commits never clobber each other") {
    import graft.sources.SinkSource
    gen(10).select(col("id")).write.format("graftsink")
      .option("tag", "shared").mode("append").save()
    gen(20).select(col("id")).write.format("graftsink")
      .option("tag", "shared").mode("append").save()
    // results holds the latest; the append-only log holds BOTH, in
    // epoch order — concurrent same-tag jobs can't lose metrics
    assert(SinkSource.results("shared")._1 == 20L)
    val logged = SinkSource.commits.collect {
      case ((tag, ep), (r, _, _)) if tag == "shared" => (ep, r)
    }.toSeq.sortBy(_._1).map(_._2)
    assert(logged == Seq(10L, 20L), s"commit log must keep both: $logged")
  }

  test("non-id predicates stay residual and lose no rows") {
    val df = gen(10000).filter(col("reading") > 5000L)
    val expected = (0L until 10000L).count(i => GenSource.readingOf(i) > 5000L)
    assert(df.count() == expected.toLong)
    val hasFilter = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.FilterExec => true
      case _ => false
    }
    assert(hasFilter, "reading predicate must be evaluated by Spark")
  }
}
