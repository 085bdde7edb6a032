package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The state store reader (`format("statestore")` / `"state-metadata"`,
  * Spark 4 built-ins): offline observability over a streaming
  * checkpoint — inspect exactly what a stateful query holds per key,
  * and time-travel to any retained batch, WITHOUT the query running.
  * The ops story for the engine's streaming surface: debugging a stuck
  * session or a state-size blowup at 100 TB starts with reading the
  * store, not re-running the job.
  */
class StateStoreReaderSpec extends SparkSpec {
  import spark.implicits._

  test("statestore source reads agg state from a checkpoint, per batch") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_state_read").toString
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v")
      .groupBy("k").count()
      .writeStream.format("memory").queryName("ssr_agg")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(("a", 1L), ("b", 2L), ("a", 3L))
      q.processAllAvailable()
      in.addData(("a", 10L), ("c", 5L))
      q.processAllAvailable()
    } finally q.stop()

    // operator catalog: the one stateful operator, store layout visible
    val meta = spark.read.format("state-metadata").load(ckpt)
    val mrows = meta.collect()
    assert(mrows.length == 1, s"one stateful operator, got ${mrows.length}")
    val m = mrows(0)
    assert(m.getAs[Long]("operatorId") == 0L)
    assert(m.getAs[Int]("numPartitions") > 0)

    // latest state: the full running counts, read as a plain DataFrame
    def counts(reader: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val vf = reader.schema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fields.indexWhere(_.dataType ==
          org.apache.spark.sql.types.LongType)
      assert(vf >= 0, "agg value struct must carry a long count field")
      reader.select(col("key.k").as("k"),
          col("value").getField(reader.schema("value").dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType]
            .fields(vf).name).as("n"))
        .as[(String, Long)].collect().toMap
    }
    val latest = spark.read.format("statestore").load(ckpt)
    assert(latest.columns.contains("partition_id"),
      "state rows carry their store partition")
    assert(counts(latest) == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))

    // time travel: state as of batch 0, before the second microbatch
    val atBatch0 = spark.read.format("statestore")
      .option("batchId", 0).load(ckpt)
    assert(counts(atBatch0) == Map("a" -> 2L, "b" -> 1L))
  }
}
