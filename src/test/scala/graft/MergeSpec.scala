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

  test("incremental view maintenance: streaming foreachBatch + upsert ≡ batch agg") {
    // The capstone that ties the mutation surface to streaming: a
    // per-user running aggregate maintained incrementally — each
    // micro-batch's partial agg upserted into a keyed state table via
    // Merge.upsert — converges to exactly the one-shot batch aggregate.
    // This is how a 100 TB aggregate stays fresh without recomputing:
    // per-batch work is O(batch), not O(history).
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("ivm")
    val (inDir, state) = (s"$root/in", s"$root/state")
    def writeBatch(n: Int, rows: Seq[(Long, Double)]): Unit =
      rows.toDF("user_id", "v").coalesce(1).write.parquet(s"$inDir/b$n")
    writeBatch(1, Seq((1L, 1.0), (2L, 2.0), (1L, 3.0)))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", DoubleType)))
    // empty initial state
    Seq.empty[(Long, Double, Long)].toDF("user_id", "total", "n")
      .write.mode("overwrite").parquet(state)
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(s"$inDir/b*")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch.groupBy("user_id")
          .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
        val cur = spark.read.parquet(state)
        val merged = Merge.upsert(cur, delta
          .join(cur.select(col("user_id"), col("total").as("t0"), col("n").as("n0")),
            Seq("user_id"), "left")
          .select(col("user_id"),
            (col("total") + coalesce(col("t0"), lit(0.0))).as("total"),
            (col("n") + coalesce(col("n0"), lit(0L))).as("n")),
          Seq("user_id"))
        merged.write.mode("overwrite").parquet(s"$state.next")
        spark.read.parquet(s"$state.next").write.mode("overwrite").parquet(state)
      }
      .start()
    try {
      q.processAllAvailable()
      writeBatch(2, Seq((2L, 5.0), (3L, 7.0)))
      q.processAllAvailable()
      val got = spark.read.parquet(state).orderBy("user_id")
        .as[(Long, Double, Long)].collect().toSeq
      assert(got === Seq((1L, 4.0, 2L), (2L, 7.0, 2L), (3L, 7.0, 1L)),
        s"incremental state must equal the batch aggregate, got $got")
    } finally q.stop()
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
