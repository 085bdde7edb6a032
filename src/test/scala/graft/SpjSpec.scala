package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.table.{GraftSpj, GraftTable, Partitioning}

/** Storage-partitioned joins over graft catalog tables
  * ([[graft.table.GraftSpj]]): with `spark.sql.sources.v2.bucketing
  * .enabled` on, two tables `PARTITIONED BY (identity(k))` report
  * [[org.apache.spark.sql.connector.read.partitioning
  * .KeyGroupedPartitioning]] and join with ZERO shuffle; reads stay
  * value-identical to the V1 bridge path across projections, filters,
  * schema evolution, NULL partitions, deletion vectors, and every
  * supported type; and ineligible snapshots (unsupported transforms,
  * mixed-spec generations) fall back to the V1 path even with the
  * flag on.
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_spj_$tag").toString

  private def withVectorized[T](on: Boolean)(body: => T): T = {
    spark.conf.set(GraftSpj.VectorizedKey, on.toString)
    try body finally spark.conf.unset(GraftSpj.VectorizedKey)
  }

  private def withSpj[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(GraftSpj.ConfKey)
    spark.conf.set(GraftSpj.ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(GraftSpj.ConfKey, v)
      case None => spark.conf.unset(GraftSpj.ConfKey)
    }
  }

  /** AQE wraps materialized stages in leaf `QueryStageExec` nodes —
    * descend through `.plan` (and adaptive roots) or scans are missed.
    */
  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case other => other.children ++ other.subqueries
    }
    p +: kids.flatMap(collectPlan)
  }

  private def executed(df: DataFrame): Seq[SparkPlan] =
    collectPlan(df.queryExecution.executedPlan)

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Orders-shaped table partitioned by identity(k), k = key % 7. */
  private def mkPartitioned(root: String, rows: Seq[(Long, Long, Double,
      String, java.sql.Date)]): Unit = {
    val df = rows.toDF("k", "id", "amt", "tag", "d")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df)
  }

  private def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  private def sampleRows(n: Int, salt: Int): Seq[(Long, Long, Double,
      String, java.sql.Date)] =
    (1 to n).map { i =>
      (i.toLong % 7, i.toLong + salt, i * 1.5 + salt,
        s"t${i % 5}_$salt", d(f"2024-01-${i % 27 + 1}%02d"))
    }

  private val cat = "spjcat"

  /** Catalog instances pin their warehouse at first reference — ONE
    * shared warehouse for the suite, distinct table names per test.
    */
  private lazy val wh: String = {
    val dir = freshRoot("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    dir
  }

  test("co-partitioned identity tables join with zero exchange (SPJ)") {
    mkPartitioned(s"$wh/ns/ta", sampleRows(200, 0))
    mkPartitioned(s"$wh/ns/tb", sampleRows(150, 1000))

    val q =
      s"""SELECT a.k, COUNT(*) AS n, SUM(a.amt + b.amt) AS s
         |FROM $cat.ns.ta a JOIN $cat.ns.tb b ON a.k = b.k
         |GROUP BY a.k ORDER BY a.k""".stripMargin

    // reference result on the V1 path (flag off)
    val expected = withSpj(on = false)(sorted(spark.sql(q)))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withSpj(on = true) {
      val df = spark.sql(q)
      assert(sorted(df) == expected)
      val nodes = executed(df)
      val scans = nodes.collect { case b: BatchScanExec => b }
      assert(scans.size == 2, s"expected 2 V2 batch scans, got $nodes")
      assert(scans.forall(_.scan.toString.contains("GraftBatchScan")))
      // THE assertion: no shuffle anywhere below the aggregation —
      // the join consumed the reported KeyGroupedPartitioning. (The
      // final single-partition sort of the tiny grouped result may
      // exchange; look only under the join.)
      val join = nodes.find(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(join.isDefined, s"no join in $nodes")
      val belowJoin = collectPlan(join.get)
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"shuffle under the SPJ join: ${join.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket-partitioned tables join exchange-free via the FunctionCatalog") {
    def mk(tbl: String, salt: Int, rows: Int): Unit = {
      val df = sampleRows(rows, salt).toDF("k", "id", "amt", "tag", "d")
      GraftTable.createPartitioned(spark, s"$wh/ns/$tbl", df.schema,
        Seq(Partitioning.PBucket("k", 8)))
      GraftTable.append(spark, s"$wh/ns/$tbl", df)
    }
    mk("ba", 0, 160)
    mk("bb", 500, 120)
    val q =
      s"""SELECT a.k, COUNT(*) AS n, SUM(a.amt + b.amt) AS s
         |FROM $cat.ns.ba a JOIN $cat.ns.bb b ON a.k = b.k
         |GROUP BY a.k ORDER BY a.k""".stripMargin
    val expected = withSpj(on = false)(sorted(spark.sql(q)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withSpj(on = true) {
      val df = spark.sql(q)
      assert(sorted(df) == expected)
      val nodes = executed(df)
      val scans = nodes.collect { case b: BatchScanExec => b }
      assert(scans.size == 2, s"expected 2 V2 batch scans, got $nodes")
      assert(scans.forall(_.scan.toString.contains("GraftBatchScan")))
      val join = nodes.find(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(join.isDefined, s"no join in $nodes")
      assert(!collectPlan(join.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"shuffle under the bucket SPJ join: ${join.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("days-partitioned tables join exchange-free via the calendar function") {
    def mk(tbl: String, salt: Int, rows: Int): Unit = {
      val df = sampleRows(rows, salt).toDF("k", "id", "amt", "tag", "d")
      GraftTable.createPartitioned(spark, s"$wh/ns/$tbl", df.schema,
        Seq(Partitioning.PDays("d")))
      GraftTable.append(spark, s"$wh/ns/$tbl", df)
    }
    mk("da", 0, 108)
    mk("db", 900, 81)
    val q =
      s"""SELECT a.d, COUNT(*) AS n, SUM(a.amt + b.amt) AS s
         |FROM $cat.ns.da a JOIN $cat.ns.db b ON a.d = b.d
         |GROUP BY a.d ORDER BY a.d""".stripMargin
    val expected = withSpj(on = false)(sorted(spark.sql(q)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withSpj(on = true) {
      val df = spark.sql(q)
      assert(sorted(df) == expected)
      val nodes = executed(df)
      val scans = nodes.collect { case b: BatchScanExec => b }
      assert(scans.size == 2, s"expected 2 V2 batch scans, got $nodes")
      assert(scans.forall(_.scan.toString.contains("GraftBatchScan")))
      val join = nodes.find(p =>
        p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(join.isDefined, s"no join in $nodes")
      assert(!collectPlan(join.get).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"shuffle under the days SPJ join: ${join.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SPJ batch reads are value-identical to the V1 path") {
    mkPartitioned(s"$wh/ns/tr", sampleRows(97, 7))

    val full = s"SELECT * FROM $cat.ns.tr"
    val proj = s"SELECT tag, amt FROM $cat.ns.tr WHERE k >= 3 AND amt < 120"
    val dates = s"SELECT d, COUNT(*) AS n FROM $cat.ns.tr GROUP BY d"
    for (q <- Seq(full, proj, dates)) {
      val off = withSpj(on = false)(sorted(spark.sql(q)))
      val on = withSpj(on = true) {
        val df = spark.sql(q)
        assert(executed(df).exists {
          case b: BatchScanExec => b.scan.toString.contains("GraftBatchScan")
          case _ => false
        }, s"expected the SPJ batch scan for: $q")
        sorted(df)
      }
      assert(on == off, s"SPJ read diverged for: $q")
    }
  }

  test("schema evolution: files written before ADD COLUMN read as null") {
    val root = s"$wh/ns/te"
    val df0 = Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("k", "v")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df0)
    GraftTable.addColumn(spark, root, "w",
      org.apache.spark.sql.types.LongType)
    GraftTable.append(spark, root,
      Seq((2L, "d", 10L)).toDF("k", "v", "w"))
    // rename exercises column mapping through the physical-name reader
    GraftTable.renameColumn(spark, root, "v", "txt")

    val q = s"SELECT k, txt, w FROM $cat.ns.te"
    val off = withSpj(on = false)(sorted(spark.sql(q)))
    val on = withSpj(on = true)(sorted(spark.sql(q)))
    assert(on == off)
    assert(on.count(_.contains("null")) == 3) // three pre-evolution rows
  }

  test("widened column reads through the SPJ readers (INT32 under LONG, both modes)") {
    val root = s"$wh/ns/tw"
    val df0 = Seq((1L, 10), (2L, 20)).toDF("k", "n")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df0)
    GraftTable.widenColumn(spark, root, "n",
      org.apache.spark.sql.types.LongType)
    GraftTable.append(spark, root, Seq((1L, 3000000000L)).toDF("k", "n"))
    val q = s"SELECT k, n FROM $cat.ns.tw"
    val off = withSpj(on = false)(sorted(spark.sql(q)))
    // columnar (default): the vectorized reader's updaters promote
    val on = withSpj(on = true)(sorted(spark.sql(q)))
    assert(on == off && on.size == 3)
    // row mode: the Group reader's physical-width check promotes
    val onRow = withSpj(on = true)(withVectorized(false)(
      sorted(spark.sql(q))))
    assert(onRow == off)
  }

  test("NULL partition value flows through the SPJ path") {
    val root = s"$wh/ns/tn"
    val df0 = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b"),
      (java.lang.Long.valueOf(2L), "c")).toDF("k", "v")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df0)
    val q = s"SELECT k, v FROM $cat.ns.tn"
    val off = withSpj(on = false)(sorted(spark.sql(q)))
    val on = withSpj(on = true)(sorted(spark.sql(q)))
    assert(on == off && on.size == 3)
  }

  test("truncate-partitioned string keys join with zero exchange (SPJ)") {
    // truncate(2, tag): prefix blocks as the partition tuple — the
    // round-11 tier that previously fell to V1
    def mk(root: String, salt: Int): Unit = {
      val df = (1 to 120).map { i =>
        (s"p${i % 9}_x$i", i.toLong + salt, i * 1.5) }
        .toDF("tag", "id", "amt")
      GraftTable.createPartitioned(spark, root, df.schema,
        Seq(Partitioning.PTruncate("tag", 2)))
      GraftTable.append(spark, root, df)
    }
    mk(s"$wh/ns/tra", 0)
    mk(s"$wh/ns/trb", 1000)
    val q =
      s"""SELECT a.tag, COUNT(*) AS n, SUM(a.amt + b.amt) AS s
         |FROM $cat.ns.tra a JOIN $cat.ns.trb b ON a.tag = b.tag
         |GROUP BY a.tag ORDER BY a.tag""".stripMargin
    val expected = withSpj(on = false)(sorted(spark.sql(q)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withSpj(on = true) {
      val df = spark.sql(q)
      assert(sorted(df) == expected)
      val nodes = executed(df)
      val scans = nodes.collect { case b: BatchScanExec => b }
      assert(scans.size == 2 &&
        scans.forall(_.scan.toString.contains("GraftBatchScan")),
        s"expected 2 SPJ batch scans in $nodes")
      // the join key `tag` is truncate-derived, NOT the partition
      // value itself — Spark still needs a shuffle on the raw key
      // UNLESS both sides resolve graft.truncate as compatible; the
      // assertion is exactly that resolution
      val join = nodes.find(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(join.isDefined, s"no join in $nodes")
      assert(!collectPlan(join.get)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"shuffle under the truncate SPJ join: ${join.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("spec evolution drops SPJ until compaction migrates, then re-qualifies") {
    // evolve identity(k) → bucket(4, k) on BOTH sides: mixed
    // generations lack the current tuple → V1 fallback (explicit,
    // never wrong); one compaction later every file carries it and
    // the zero-exchange join comes back WITHOUT any operator action
    def mk(root: String, salt: Int): Unit = {
      val df = sampleRows(80, salt).toDF("k", "id", "amt", "tag", "d")
      GraftTable.createPartitioned(spark, root, df.schema,
        Seq(Partitioning.PIdentity("k")))
      GraftTable.append(spark, root, df)
      GraftTable.evolvePartitioning(spark, root,
        Seq(Partitioning.PBucket("k", 4)))
    }
    mk(s"$wh/ns/tea", 0)
    mk(s"$wh/ns/teb", 500)
    val q =
      s"""SELECT a.k, COUNT(*) AS n
         |FROM $cat.ns.tea a JOIN $cat.ns.teb b ON a.k = b.k
         |GROUP BY a.k ORDER BY a.k""".stripMargin
    val expected = withSpj(on = false)(sorted(spark.sql(q)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withSpj(on = true) {
      val before = spark.sql(q)
      assert(sorted(before) == expected)
      assert(!executed(before).exists(_.isInstanceOf[BatchScanExec]),
        "mixed-generation snapshots must fall back to the V1 scan")
      GraftTable.compact(spark, s"$wh/ns/tea", targetFiles = 2)
      GraftTable.compact(spark, s"$wh/ns/teb", targetFiles = 2)
      val after = spark.sql(q)
      assert(sorted(after) == expected)
      val nodes = executed(after)
      val scans = nodes.collect { case b: BatchScanExec => b }
      assert(scans.size == 2 &&
        scans.forall(_.scan.toString.contains("GraftBatchScan")),
        s"expected SPJ re-qualification after compaction in $nodes")
      val join = nodes.find(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(join.isDefined && !collectPlan(join.get)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"shuffle under the re-qualified bucket SPJ join: ${join.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ineligible snapshots keep the V1 path even with the flag on") {
    // a column type the SPJ Group reader does not convert (array)
    val root1 = s"$wh/ns/tf1"
    val df1 = Seq((1L, Seq(1L, 2L), 1.0), (2L, Seq(3L), 2.0))
      .toDF("id", "xs", "v")
    GraftTable.createPartitioned(spark, root1, df1.schema,
      Seq(Partitioning.PIdentity("id")))
    GraftTable.append(spark, root1, df1)

    withSpj(on = true) {
      val df = spark.sql(s"SELECT * FROM $cat.ns.tf1")
      assert(!executed(df).exists(_.isInstanceOf[BatchScanExec]),
        "tf1 must fall back to the V1 scan")
      assert(df.count() == 2)
    }
  }

  test("DV-masked files stay on the SPJ path: inline position skip ≡ V1") {
    val root = s"$wh/ns/tdv"
    mkPartitioned(root, sampleRows(30, 0))
    GraftTable.deleteWhereDv(spark, root, "id = 5 OR amt > 40.0", prune = None)

    val queries = Seq(
      s"SELECT * FROM $cat.ns.tdv",
      s"SELECT k, COUNT(*) AS n FROM $cat.ns.tdv GROUP BY k",
      s"SELECT tag FROM $cat.ns.tdv WHERE k >= 2")
    for (q <- queries) {
      val off = withSpj(on = false)(sorted(spark.sql(q)))
      val on = withSpj(on = true) {
        val df = spark.sql(q)
        assert(executed(df).exists {
          case b: BatchScanExec => b.scan.toString.contains("GraftBatchScan")
          case _ => false
        }, s"expected the SPJ batch scan for: $q")
        sorted(df)
      }
      assert(on == off, s"DV-masked SPJ read diverged for: $q")
    }
    withSpj(on = true) {
      assert(spark.sql(s"SELECT * FROM $cat.ns.tdv WHERE id = 5").count() == 0)
    }
    // footer-only path on a masked file: project ONLY a column added
    // after the data landed — every requested column is absent, so the
    // reader emits null rows WITHOUT opening pages, and the count must
    // be the LIVE count (physical minus the DV's exact masked count)
    GraftTable.addColumn(spark, root, "w",
      org.apache.spark.sql.types.LongType)
    val q = s"SELECT w FROM $cat.ns.tdv"
    val off = withSpj(on = false)(sorted(spark.sql(q)))
    val on = withSpj(on = true)(sorted(spark.sql(q)))
    assert(on == off, "footer-only live-count path diverged from V1")
  }

  test("partition transforms are SQL-callable through the FunctionCatalog") {
    wh // force catalog registration
    // bucket must equal the write-side clustering expression
    val viaFn = spark.sql(s"SELECT $cat.ns.bucket(8, 42L) AS b").head.get(0)
    val viaExpr = spark.sql("SELECT pmod(xxhash64(42L), 8) AS b").head.get(0)
    assert(viaFn.toString.toLong == viaExpr.toString.toLong)
    // days of an epoch date; null flows through
    val d0 = spark.sql(
      s"SELECT $cat.ns.days(DATE '1970-01-03') AS d").head.getLong(0)
    assert(d0 == 2L)
    assert(spark.sql(
      s"SELECT $cat.ns.months(CAST(NULL AS DATE)) AS m").head.isNullAt(0))
    // SHOW FUNCTIONS lists the transform set
    val listed = spark.sql(s"SHOW FUNCTIONS IN $cat.ns")
      .collect().map(_.getString(0)).mkString(",")
    assert(listed.contains("bucket") && listed.contains("days"))
  }

  test("SPJ scans decode COLUMNAR — DV-masked included; flag-off pins rows") {
    val root = s"$wh/ns/tcol"
    mkPartitioned(root, sampleRows(80, 11))
    val q = s"SELECT k, amt, tag, d FROM $cat.ns.tcol"
    withSpj(on = true) {
      val df = spark.sql(q)
      val scan = executed(df).collectFirst { case b: BatchScanExec => b }.get
      assert(scan.scan.toString.contains("GraftBatchScan"))
      assert(scan.supportsColumnar,
        "DV-free SPJ scan should take the vectorized columnar path")
      val viaColumnar = sorted(df)
      // kill switch: row mode, value-identical
      withVectorized(false) {
        val dfRow = spark.sql(q)
        val scanRow =
          executed(dfRow).collectFirst { case b: BatchScanExec => b }.get
        assert(!scanRow.supportsColumnar)
        assert(sorted(dfRow) == viaColumnar)
      }
      // a DV-masked file STAYS columnar: the sorted positions compact
      // the intersecting batches — values identical to the V1 path
      // and to the row reader
      GraftTable.deleteWhereDv(spark, root, "id > 85", prune = None)
      val dfDv = spark.sql(q)
      val scanDv =
        executed(dfDv).collectFirst { case b: BatchScanExec => b }.get
      assert(scanDv.supportsColumnar,
        "a DV-masked file must stay on the columnar path")
      val viaDvColumnar = sorted(dfDv)
      assert(viaDvColumnar == withSpj(on = false)(sorted(spark.sql(q))))
      assert(viaDvColumnar ==
        withVectorized(false)(sorted(spark.sql(q))))
    }
  }

  test("columnar DV compaction: scattered, fully-masked and null-heavy files") {
    val root = s"$wh/ns/tcoldv"
    // one partition (k constant) → one file per append; three appends:
    // f0 scattered deletes, f1 fully masked, f2 untouched with nulls
    val rows0 = (1 to 500).map(i =>
      (1L, i.toLong, i * 0.5, if (i % 3 == 0) null else s"s$i", d("2024-02-01")))
    val df0 = rows0.toDF("k", "id", "amt", "tag", "d")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df0)
    GraftTable.append(spark, root, (501 to 700).map(i =>
      (1L, i.toLong, 0.0, if (i == 600) null else "gone", d("2024-02-02")))
      .toDF("k", "id", "amt", "tag", "d"))
    GraftTable.append(spark, root, (701 to 800).map(i =>
      (1L, i.toLong, i * 2.0, if (i % 2 == 0) null else s"z$i",
        d("2024-02-03")))
      .toDF("k", "id", "amt", "tag", "d"))
    // scattered: every 7th id in f0; fully masked: all of f1
    GraftTable.deleteWhereDv(spark, root,
      "(id <= 500 AND id % 7 = 0) OR (id BETWEEN 501 AND 700)", prune = None)
    val q = s"SELECT k, id, amt, tag, d FROM $cat.ns.tcoldv"
    withSpj(on = true) {
      val df = spark.sql(q)
      val scan = executed(df).collectFirst { case b: BatchScanExec => b }.get
      assert(scan.supportsColumnar)
      val on = sorted(df)
      assert(on == withSpj(on = false)(sorted(spark.sql(q))),
        "DV-compacted columnar read diverged from V1")
      assert(on == withVectorized(false)(sorted(spark.sql(q))),
        "DV-compacted columnar read diverged from the row reader")
      assert(df.count() == 500 - 71 + 100)
      // absent-column projection on masked files: a column added
      // after the data landed reads as null vectors (or, when pruned
      // to zero columns, as metadata-count batches) — either way the
      // count must be LIVE (physical minus exact masked)
      GraftTable.addColumn(spark, root, "w",
        org.apache.spark.sql.types.LongType)
      val cntQ = s"SELECT w FROM $cat.ns.tcoldv"
      val cdf = spark.sql(cntQ)
      assert(executed(cdf).collectFirst { case b: BatchScanExec => b }
        .get.supportsColumnar)
      assert(cdf.count() == 500 - 71 + 100)
    }
  }

  test("ADD COLUMN DEFAULT fills through the columnar SPJ reader") {
    val root = s"$wh/ns/tdef"
    val df0 = Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("k", "v")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df0)
    // post-data ADD COLUMN DEFAULT: EXISTS_DEFAULT metadata only,
    // pre-ALTER files never rewritten
    GraftTable.addColumn(spark, root, "extra",
      org.apache.spark.sql.types.LongType, default = Some(("7", "7")))
    GraftTable.append(spark, root, Seq((2L, "d", 10L)).toDF("k", "v", "extra"))
    val q = s"SELECT k, v, extra FROM $cat.ns.tdef"
    val off = withSpj(on = false)(sorted(spark.sql(q)))
    withSpj(on = true) {
      val df = spark.sql(q)
      val scan = executed(df).collectFirst { case b: BatchScanExec => b }.get
      assert(scan.supportsColumnar,
        "the default-fill contract must hold on the COLUMNAR path")
      val on = sorted(df)
      assert(on == off)
      assert(on.count(_.contains("7")) == 3, s"default fill missing: $on")
    }
  }

  test("empty projection (COUNT(*)) flows columnar from metadata counts") {
    val root = s"$wh/ns/tcnt"
    mkPartitioned(root, sampleRows(123, 5))
    withSpj(on = true) {
      // COUNT(*) itself is answered by pushdown (metadata-only in the
      // catalog, closed-form agg on the path read) before any batch
      // scan runs; a CONSTANT projection is what actually drives the
      // zero-column batch path — one row per live row, no columns
      val df = spark.read.format("grafttable").option("path", root).load()
        .select(lit(1).as("one"))
      val scan = executed(df).collectFirst { case b: BatchScanExec => b }.get
      assert(scan.scan.toString.contains("GraftBatchScan"))
      assert(scan.supportsColumnar)
      assert(df.collect().length == 123)
    }
  }

  test("SPJ path: file pruning from a pushed range still engages") {
    val root = s"$wh/ns/tp"
    mkPartitioned(root, sampleRows(70, 0))
    withSpj(on = true) {
      val df = spark.sql(s"SELECT id FROM $cat.ns.tp WHERE k = 3")
      val scan = executed(df).collectFirst { case b: BatchScanExec => b }
      assert(scan.isDefined)
      val desc = scan.get.scan.description()
      // identity tuple pruning: only the k=3 partition's file survives
      val m = "files (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
      assert(m.isDefined, s"no file ratio in: $desc")
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"expected pruned file set in: $desc")
      // and the residual re-application keeps the result exact
      assert(sorted(df) == withSpj(on = false)(sorted(
        spark.sql(s"SELECT id FROM $cat.ns.tp WHERE k = 3"))))
    }
  }
}
