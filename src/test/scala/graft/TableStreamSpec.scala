package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.table.GraftTable

/** The GraftTable streaming source: `readStream.format("grafttable")`
  * consumes the table's append commits with exactly-once semantics —
  * offsets are log versions, a micro-batch reads only its range's
  * files, and non-append commits stop the stream with the
  * appends-compose contract error.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_tstream").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"k$i", i * 10.0)).toDF("id", "key", "v")

  test("path-based batch read: format(grafttable).load ≡ GraftTable.read; time travel options") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 40))
    val tsAfterV0 = System.currentTimeMillis()
    Thread.sleep(5)
    GraftTable.append(spark, root, rows(40, 70))

    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    // tip read ≡ the API read
    val viaFormat = spark.read.format("grafttable").option("path", root).load()
    assert(sortedRows(viaFormat) == sortedRows(GraftTable.read(spark, root)))
    assert(viaFormat.count() == 70)
    // filters prune through the same pushdown scan (plan smoke)
    assert(viaFormat.filter($"id" < 10).count() == 10)

    // versionAsOf pins the first append
    val v0 = spark.read.format("grafttable").option("path", root)
      .option("versionAsOf", "0").load()
    assert(v0.count() == 40)

    // timestampAsOf: ms epoch and SQL timestamp string both resolve
    val byMs = spark.read.format("grafttable").option("path", root)
      .option("timestampAsOf", tsAfterV0.toString).load()
    assert(byMs.count() == 40)

    // mutually exclusive options refused
    intercept[Exception] {
      spark.read.format("grafttable").option("path", root)
        .option("versionAsOf", "0").option("timestampAsOf", "0").load()
    }
    // missing path refused
    intercept[Exception] {
      spark.read.format("grafttable").load()
    }
  }

  test("stream over three appends ≡ batch read; mid-stream appends arrive incrementally") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 40))
    GraftTable.append(spark, root, rows(40, 70))

    val q = spark.readStream.format("grafttable").option("path", root)
      .load()
      .writeStream.format("memory").queryName("tstream_out")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable() // drains versions 0..1
      assert(spark.table("tstream_out").count() == 70)

      GraftTable.append(spark, root, rows(70, 100)) // live append
      q.processAllAvailable()
      val got = spark.table("tstream_out")
      assert(got.count() == 100)
      // exactly-once: no row delivered twice, content ≡ batch read
      assert(got.distinct().count() == 100)
      assert(got.select("id", "key", "v").except(
        GraftTable.read(spark, root)).isEmpty)
      assert(GraftTable.read(spark, root).except(
        got.select("id", "key", "v")).isEmpty)
    } finally q.stop()
  }

  test("maxFilesPerTrigger/maxBytesPerTrigger bound each micro-batch; drain is exactly-once") {
    val root = freshRoot()
    // four single-file appends → versions 0..3, one file each
    for (lo <- Seq(0L, 25L, 50L, 75L))
      GraftTable.append(spark, root, rows(lo, lo + 25).coalesce(1))

    // maxFilesPerTrigger=1: every micro-batch advances by exactly one
    // version — 4 batches, union exactly-once
    val q = spark.readStream.format("grafttable").option("path", root)
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("tstream_adm")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("tstream_adm").count() == 100)
    assert(spark.table("tstream_adm").distinct().count() == 100)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 4,
      s"1 file/trigger over 4 single-file commits must take 4 batches, " +
        s"took ${batches.length}")
    assert(batches.forall(_.numInputRows == 25),
      batches.map(_.numInputRows).mkString(","))

    // byte cap: large enough for one file but not two → still 4
    // batches (the progress guarantee admits each oversized-or-first
    // commit alone); tiny cap (1 byte) also drains — one version per
    // batch, never a stall
    val oneFileBytes = {
      val snap = GraftTable.snapshot(spark, root)
      val p = new org.apache.hadoop.fs.Path(root, snap.files.head.path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }
    val q2 = spark.readStream.format("grafttable").option("path", root)
      .option("maxBytesPerTrigger", (oneFileBytes + 1).toString)
      .load()
      .writeStream.format("memory").queryName("tstream_adm2")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.table("tstream_adm2").count() == 100)
    assert(spark.table("tstream_adm2").distinct().count() == 100)
    assert(q2.recentProgress.count(_.numInputRows > 0) == 4)

    // unbounded control: one batch drains everything
    val q3 = spark.readStream.format("grafttable").option("path", root)
      .load()
      .writeStream.format("memory").queryName("tstream_adm3")
      .trigger(Trigger.AvailableNow())
      .start()
    q3.awaitTermination()
    assert(spark.table("tstream_adm3").count() == 100)
    assert(q3.recentProgress.count(_.numInputRows > 0) == 1)

    // invalid caps refused loudly
    intercept[Exception] {
      spark.readStream.format("grafttable").option("path", root)
        .option("maxFilesPerTrigger", "0").load()
        .writeStream.format("memory").queryName("tstream_adm4")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }

  test("restart from checkpoint resumes at the committed version (no replay, no loss)") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_tstream_ckpt").toString
    val out = Files.createTempDirectory("graft_tstream_sink").toString
    GraftTable.append(spark, root, rows(0, 30))

    def runOnce(): Unit = {
      val q = spark.readStream.format("grafttable").option("path", root)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // life 1: version 0
    GraftTable.append(spark, root, rows(30, 45))
    runOnce() // life 2: must deliver ONLY version 1's rows
    val got = spark.read.parquet(out)
    assert(got.count() == 45, "second life replayed or lost a batch")
    assert(got.distinct().count() == 45)
  }

  test("readStream.table over the SQL catalog: two-life checkpoint restart by NAME") {
    // the V2TableWithV1Fallback bridge: the analyzer resolves the
    // streaming relation to the grafttable V1 source on the table's
    // root — same offsets-are-versions contract, spelled the way a SQL
    // user consumes the table
    val wh = Files.createTempDirectory("graft_cstream_wh").toString
    val ckpt = Files.createTempDirectory("graft_cstream_ckpt").toString
    val out = Files.createTempDirectory("graft_cstream_out").toString
    spark.conf.set("spark.sql.catalog.gstr", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstr.ns")
    spark.sql("CREATE TABLE gstr.ns.feed (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 20).createOrReplaceTempView("feed_src")
    spark.sql("INSERT INTO gstr.ns.feed SELECT * FROM feed_src")

    def runOnce(): Unit = {
      val q = spark.readStream.table("gstr.ns.feed")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // life 1: the create (v0) + first insert (v1)
    assert(spark.read.parquet(out).count() == 20)
    spark.sql("INSERT INTO gstr.ns.feed SELECT id + 100, key, v FROM feed_src")
    runOnce() // life 2: ONLY the second insert's rows
    val got = spark.read.parquet(out)
    assert(got.count() == 40, "second life replayed or lost a batch")
    assert(got.distinct().count() == 40)
    assert(got.select("id", "key", "v")
      .except(spark.table("gstr.ns.feed")).isEmpty)
  }

  test("readStream.table + readChangeFeed: CDC streaming by name") {
    // reader options merge with the fallback CatalogTable's storage
    // properties, so the CDF switch works spelled by name too
    val wh = Files.createTempDirectory("graft_cdfn_wh").toString
    spark.conf.set("spark.sql.catalog.gcdf", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdf.ns")
    spark.sql("CREATE TABLE gcdf.ns.t (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 10).createOrReplaceTempView("cdfn_src")
    spark.sql("INSERT INTO gcdf.ns.t SELECT * FROM cdfn_src")
    spark.sql("DELETE FROM gcdf.ns.t WHERE id < 3") // CDC delete rows
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("gcdf.ns.t")
      .writeStream.format("memory").queryName("cdfn_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table("cdfn_out")
      .select("_change_type", "id", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._1 == "insert") == 10, s"got ${got.toSeq}")
    assert(got.filter(_._1 == "delete").map(_._2).sorted.toSeq ==
      Seq(0L, 1L, 2L), "the CoW delete flows as CDC deletes")
  }

  test("sink: streamed appends land exactly-once through the txn ledger, restart-safe") {
    val src = freshRoot() // stream table-to-table: source is also a table
    val dst = freshRoot()
    val ckpt = Files.createTempDirectory("graft_tsink_ckpt").toString
    GraftTable.append(spark, src, rows(0, 25))

    def runOnce(): Unit = {
      val q = spark.readStream.format("grafttable").option("path", src)
        .load()
        .writeStream.format("grafttable").option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(GraftTable.read(spark, dst).count() == 25)
    GraftTable.append(spark, src, rows(25, 60))
    runOnce() // second life must append ONLY version 1's rows
    val got = GraftTable.read(spark, dst)
    assert(got.count() == 60 && got.distinct().count() == 60)
    assert(got.except(GraftTable.read(spark, src)).isEmpty)
    // ledger recorded the sink's app under the checkpoint identity
    val txns = GraftTable.snapshot(spark, dst).txns
    assert(txns.size == 1 && txns.head._2 >= 1,
      s"expected one ledger entry at batch >= 1, got $txns")
    // a manual replay of an already-committed batch is a no-op
    val v = GraftTable.snapshot(spark, dst).version
    GraftTable.append(spark, dst, rows(0, 5).toDF("id", "key", "v"),
      txn = Some((txns.head._1, 0L)))
    assert(GraftTable.snapshot(spark, dst).version == v,
      "replayed ledger batch must not commit")
  }

  test("change-feed stream: CoW and DV deletes flow as CDC pairs where the appends source must stop") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 30)) // v0
    val q = spark.readStream.format("grafttable").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("tcdf_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tcdf_out").count() == 30) // v0 inserts
      GraftTable.deleteWhere(spark, root, "id < 5", None) // v1: CoW
      GraftTable.deleteWhereDv(spark, root, "id >= 25", None) // v2: DV
      GraftTable.append(spark, root, rows(100, 110)) // v3
      q.processAllAvailable()
      val got = spark.table("tcdf_out")
      // the stream accumulated exactly the batch change feed
      val expect = GraftTable.changes(spark, root, -1, 3)
      assert(got.count() == expect.count())
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        "streamed CDC must equal the batch change feed row-for-row")
      // per-commit shape: v1 emits 5 deletes, v2 emits 5 deletes, no
      // carried-over rows leak from the CoW rewrite
      val byV = got.groupBy("_commit_version", "_change_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(byV((1L, "delete")) == 5 && byV.get((1L, "insert")).isEmpty)
      assert(byV((2L, "delete")) == 5 && byV((3L, "insert")) == 10)
    } finally q.stop()
  }

  test("startingVersion skips history; removal commit stops the stream with the contract error") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    GraftTable.append(spark, root, rows(20, 30))

    // startingVersion=0 → only version 1's rows
    val q1 = spark.readStream.format("grafttable").option("path", root)
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("tstream_sv").start()
    try {
      q1.processAllAvailable()
      assert(spark.table("tstream_sv").count() == 10)
    } finally q1.stop()

    // a delete (CoW remove) inside the unread range fails the stream
    GraftTable.deleteWhere(spark, root, "id < 5", None)
    val q2 = spark.readStream.format("grafttable").option("path", root)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("tstream_rm").start()
    val e = intercept[StreamingQueryException] {
      try { q2.processAllAvailable(); q2.awaitTermination(2000) }
      finally q2.stop()
    }
    assert(e.getMessage.contains("non-append commit") ||
      Option(e.getCause).exists(_.getMessage.contains("non-append commit")))
  }
}
