package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode

import graft.pipeline.{Pipeline, Asset, Sinks, TaxiPipeline}

/** End-to-end pipeline spec over the taxi-shape fixture (FIXTURES.md §B):
  * glob-union ingest of ≥2 parquet files, single-file export, and the
  * reference analytics question answered identically via the DataFrame
  * API and SQL text — the reference's own de-facto correctness mechanism
  * (multi-frontend redundancy, SURVEY §5.1).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("taxi_fixture").toString
    // fare_amount spans <50, =50, >50, NULL; passenger_count has NULLs
    // (the NULL-group semantic the TLC data exercises, SURVEY §2.3)
    val rows = (1 to 300).map { i =>
      val fare: java.lang.Double =
        if (i % 31 == 0) null
        else if (i % 3 == 0) 50.0
        else if (i % 2 == 0) 50.0 + i % 97
        else 10.0 + i % 40
      val pc: java.lang.Long = if (i % 17 == 0) null else (i % 5).toLong
      (i, fare, pc, 1.5 * (i % 7))
    }
    val df = rows.toDF("vendor_id", "fare_amount", "passenger_count", "trip_distance")
    df.filter($"vendor_id" % 2 === 0).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/part_a.parquet")
    df.filter($"vendor_id" % 2 =!= 0).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/part_b.parquet")
    dir
  }

  test("taxi pipeline materializes in dependency order; counts conserved") {
    val out = Files.createTempDirectory("taxi_out").resolve("clean.parquet").toString
    val p = new TaxiPipeline(s"$fixtureDir/*", out)
    val results = p.materialize(spark)
    assert(results.map(_.name) ==
      Seq("ingest_taxi_data", "export_taxi_parquet", "spark_analysis", "spark_sql_analysis"))
    assert(results.forall(_.error.isEmpty))
    assert(p.ingestedRows == 300)
    // single-file export exists and re-reads to the same count
    assert(Files.isRegularFile(Paths.get(out)))
    assert(p.exportedBytes > 0 && Files.size(Paths.get(out)) == p.exportedBytes)
    assert(Tables.read(spark, out).count() == 300)
  }

  test("DataFrame and SQL frontends agree on the analytics question") {
    val out = Files.createTempDirectory("taxi_out2").resolve("clean.parquet").toString
    val p = new TaxiPipeline(s"$fixtureDir/*", out)
    p.materialize(spark)
    assert(p.dfResult.nonEmpty)
    val df = p.dfResult.map(r => (Option(r.get(0)), r.getDouble(1))).toSeq
    val sql = p.sqlResult.map(r => (Option(r.get(0)), r.getDouble(1))).toSeq
    assert(df == sql)
    // fares ≤ 50 and NULL are excluded before grouping; NULL passenger
    // counts form their own group
    assert(df.exists(_._1.isEmpty), "expected a NULL passenger_count group")
  }

  test("pipeline runner: cycle and unknown-dep detection, failure rethrow") {
    intercept[IllegalArgumentException] {
      new Pipeline(Seq(Asset("a", Seq("b"))(_ => ()), Asset("b", Seq("a"))(_ => ())))
        .topoOrder
    }
    intercept[IllegalArgumentException] {
      new Pipeline(Seq(Asset("a", Seq("ghost"))(_ => ())))
    }
    val boom = new Pipeline(Seq(Asset("ok")(_ => ()),
      Asset("boom", Seq("ok"))(_ => throw new RuntimeException("x"))))
    intercept[RuntimeException] { boom.materialize(spark) }
  }

  test("run report: one JSON artifact per run, written even on failure") {
    val ok = new Pipeline(Seq(
      Asset("a")(_ => ()), Asset("b", Seq("a"))(_ => ())))
    val path = Files.createTempDirectory("runrep").resolve("report.json").toString
    ok.materialize(spark, reportPath = Some(path))
    val rep = spark.read.json(path)
    assert(rep.select("n_assets").first().getLong(0) == 2)
    assert(rep.select("n_failed").first().getLong(0) == 0)
    val assets = rep.selectExpr("explode(assets) as a")
      .select("a.asset", "a.status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assets == Map("a" -> "ok", "b" -> "ok"))
    // failure: report still lands, failed asset carries its error
    val boomPath = Files.createTempDirectory("runrep2").resolve("report.json").toString
    val boom = new Pipeline(Seq(Asset("ok")(_ => ()),
      Asset("boom", Seq("ok"))(_ => throw new RuntimeException("kaput"))))
    intercept[RuntimeException] { boom.materialize(spark, Some(boomPath)) }
    val rep2 = spark.read.json(boomPath)
    assert(rep2.select("n_failed").first().getLong(0) == 1)
    val err = rep2.selectExpr("explode(assets) as a")
      .filter("a.status = 'failed'").selectExpr("a.error").first().getString(0)
    assert(err.contains("kaput"))
  }

  test("HTML run browser: self-contained artifact, deps/status/failure rendered") {
    val htmlPath = Files.createTempDirectory("runrep3").resolve("run.html").toString
    val boom = new Pipeline(Seq(Asset("ingest")(_ => ()),
      Asset("crunch<x>", Seq("ingest"))(_ => throw new RuntimeException("kaput"))))
    intercept[RuntimeException] {
      boom.materialize(spark, htmlReportPath = Some(htmlPath))
    }
    val html = new String(Files.readAllBytes(java.nio.file.Paths.get(htmlPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html.contains("ingest") && html.contains("FAILED"))
    assert(html.contains("kaput"))
    assert(html.contains("crunch&lt;x&gt;") && !html.contains("crunch<x>"),
      "asset names must be HTML-escaped")
    assert(!html.toLowerCase.contains("<script"), "artifact must be script-free")
    assert(html.contains("2 assets") && html.contains("1 failed"))
  }

  test("isolateSessions: per-asset conf/temp-view quarantine over one context") {
    // the reference builds a SparkSession per asset
    // (taxi_pipeline_native.py:116-124,132); the Spark-native analogue is
    // newSession() per asset — observed here: one asset's conf + temp
    // view must be invisible to the next asset AND to the parent session
    var sawView = true
    var sawConf = "unread"
    val p = new Pipeline(Seq(
      Asset("writer") { s =>
        s.conf.set("graft.asset.flag", "from-writer")
        s.range(3).createOrReplaceTempView("writer_scratch")
        assert(s.table("writer_scratch").count() == 3) // still computes
      },
      Asset("reader", Seq("writer")) { s =>
        sawView = s.catalog.tableExists("writer_scratch")
        sawConf = s.conf.get("graft.asset.flag", "unset")
      }))
    p.materialize(spark, isolateSessions = true)
    assert(!sawView, "temp view leaked across isolated asset sessions")
    assert(sawConf == "unset", s"SQLConf leaked across isolated sessions: $sawConf")
    assert(!spark.catalog.tableExists("writer_scratch"),
      "temp view leaked into the parent session")
    // default (shared session) deliberately shares state — the documented
    // contrast that makes the flag meaningful
    p.materialize(spark)
    assert(sawView && sawConf == "from-writer",
      "shared-session default should expose prior-asset state")
    spark.catalog.dropTempView("writer_scratch")
    spark.conf.unset("graft.asset.flag")
  }

  test("report server: serves the live run browser over HTTP with refresh") {
    def fetch(url: String): (Int, String) = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = new String(is.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      is.close()
      (code, body)
    }
    val repDir = Files.createTempDirectory("servedrep")
    val p = new Pipeline(Seq(Asset("a")(_ => ()), Asset("b", Seq("a"))(_ => ())))
    p.materialize(spark,
      reportPath = Some(repDir.resolve("report.json").toString),
      htmlReportPath = Some(repDir.resolve("run.html").toString))
    val srv = new graft.pipeline.ReportServer(repDir.toString,
      refreshSeconds = 3)
    val port = srv.start()
    try {
      // the run page, with the auto-refresh tag injected
      val (c1, page) = fetch(s"http://127.0.0.1:$port/run.html")
      assert(c1 == 200 && page.contains("graft pipeline run"))
      assert(page.contains("""http-equiv="refresh" content="3""""),
        "served HTML must self-refresh")
      // RE-materializing refreshes what the server hands out (live view)
      val boom = new Pipeline(Seq(Asset("a")(_ => ()),
        Asset("bang", Seq("a"))(_ => throw new RuntimeException("kaput"))))
      intercept[RuntimeException] {
        boom.materialize(spark,
          htmlReportPath = Some(repDir.resolve("run.html").toString))
      }
      val (_, page2) = fetch(s"http://127.0.0.1:$port/run.html")
      assert(page2.contains("FAILED") && page2.contains("kaput"),
        "server must serve the latest materialization, not a snapshot")
      // index lists the artifacts; JSON served as JSON
      val (c2, idx) = fetch(s"http://127.0.0.1:$port/")
      assert(c2 == 200 && idx.contains("run.html") && idx.contains("report.json"))
      val (c3, json) = fetch(s"http://127.0.0.1:$port/report.json")
      assert(c3 == 200 && json.contains("\"n_assets\""))
      // the server cannot be walked out of its root
      val (c4, _) = fetch(s"http://127.0.0.1:$port/%2e%2e/%2e%2e/etc/passwd")
      assert(c4 == 404, "path traversal must 404")
    } finally srv.stop()
  }

  test("partitioned export writes hive-style dirs (the 100 TB path)") {
    val dir = Files.createTempDirectory("part_out").toString + "/events"
    Sinks.exportPartitioned(
      Tables(spark, sf, "events").withColumn("etype", org.apache.spark.sql.functions.col("event_type")),
      dir, Seq("etype"))
    val sub = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(sub.exists(_.contains("etype=")))
    assert(Tables.read(spark, dir).count() == 1000)
  }

  test("compaction: many small files become few target-size files, data intact") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("compact").toString + "/orders"
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    o.repartition(40).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(col("o_orderkey")), count(lit(1))).head
    val (nb, na) = Sinks.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(nb >= 40, s"fragmented input expected, saw $nb files")
    assert(na <= 2, s"compaction should emit ~1 file at this size, got $na")
    val after = spark.read.parquet(dir)
      .agg(sum(col("o_orderkey")), count(lit(1))).head
    assert(after == checksumBefore, "compaction must not change the data")
  }

  test("dynamic partition overwrite rewrites ONLY touched partitions") {
    // The write side of merge-at-scale: a changelog touching one
    // partition must not rewrite the other N-1. With
    // partitionOverwriteMode=dynamic, Overwrite replaces exactly the
    // partitions present in the incoming frame — untouched partition
    // files (and their data) survive byte-for-byte.
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("dyn_part").toString + "/events"
    val ev = Tables(spark, sf, "events")
      .withColumn("etype", col("event_type"))
    Sinks.exportPartitioned(ev, dir, Seq("etype"))
    val before = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("etype=")).sorted
    val untouched = before.filterNot(_.contains("etype=click")).head
    val stamp = Files.getLastModifiedTime(
      Files.list(Paths.get(untouched)).toArray.map(p => Paths.get(p.toString))
        .filter(_.toString.endsWith(".parquet")).head)
    val saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // rewrite just the 'click' partition with a filtered slice
      ev.filter(col("etype") === "click").limit(10)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("etype").parquet(dir)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    val clickCount = Tables.read(spark, s"$dir/etype=click").count()
    assert(clickCount == 10, s"overwritten partition must hold the new slice: $clickCount")
    val stampAfter = Files.getLastModifiedTime(
      Files.list(Paths.get(untouched)).toArray.map(p => Paths.get(p.toString))
        .filter(_.toString.endsWith(".parquet")).head)
    assert(stampAfter == stamp, "untouched partition files must not be rewritten")
    // total = original minus replaced partition plus the new slice
    val total = Tables.read(spark, dir).count()
    val origClick = ev.filter(col("etype") === "click").count()
    assert(total == 1000 - origClick + 10, s"unexpected total $total")
  }

  test("asset retry: a flaky asset succeeds within its retry budget, attempts recorded") {
    var calls = 0
    val p = new Pipeline(Seq(Asset("flaky", retries = 2) { _ =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"flake $calls")
    }))
    val res = p.materialize(spark)
    assert(calls == 3)
    assert(res.head.error.isEmpty && res.head.attempts == 3)
    // budget exhausted → the LAST error surfaces, attempts = retries+1
    var calls2 = 0
    val p2 = new Pipeline(Seq(Asset("dead", retries = 1) { _ =>
      calls2 += 1; throw new RuntimeException(s"dead $calls2")
    }))
    val e = intercept[RuntimeException] { p2.materialize(spark) }
    assert(calls2 == 2 && e.getMessage == "dead 2")
  }

  test("resume: only the failed asset's downstream subtree re-runs; green assets reused") {
    // a → b → c, d independent; b fails on the first run
    val ran = collection.mutable.ArrayBuffer.empty[String]
    var bBroken = true
    def assets() = Seq(
      Asset("a")(_ => ran += "a"),
      Asset("b", Seq("a")) { _ =>
        ran += "b"; if (bBroken) throw new RuntimeException("b kaput")
      },
      Asset("c", Seq("b"))(_ => ran += "c"),
      Asset("d")(_ => ran += "d"))
    val dir = Files.createTempDirectory("resume")
    val rep1 = dir.resolve("run1.json").toString
    intercept[RuntimeException] {
      new Pipeline(assets()).materialize(spark, reportPath = Some(rep1))
    }
    // dep-free a and d run first; the run stops at b, so c never ran
    assert(ran == Seq("a", "d", "b"))
    ran.clear(); bBroken = false
    val rep2 = dir.resolve("run2.json").toString
    val html2 = dir.resolve("run2.html").toString
    val res = new Pipeline(assets()).materializeResume(spark, rep1,
      reportPath = Some(rep2), htmlReportPath = Some(html2))
    // a and d are reused; b (failed) and c (its downstream) execute
    assert(ran.toSet == Set("b", "c"), s"expected only b,c to run: $ran")
    val byName = res.map(r => r.name -> r).toMap
    assert(byName("a").reused && byName("a").attempts == 0)
    assert(byName("d").reused)
    assert(!byName("b").reused && byName("b").error.isEmpty)
    val rep = spark.read.json(rep2).selectExpr("explode(assets) as a")
      .select("a.asset", "a.status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep == Map("a" -> "reused", "b" -> "ok", "c" -> "ok",
      "d" -> "reused"))
    val html = new String(Files.readAllBytes(dir.resolve("run2.html")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html.contains("reused"))
    // a fully green previous run resumes to all-reused, zero executions
    ran.clear()
    val res3 = new Pipeline(assets()).materializeResume(spark, rep2)
    assert(ran.isEmpty && res3.forall(_.reused))
  }
}
