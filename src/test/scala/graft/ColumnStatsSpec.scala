package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.table.{GraftSpj, GraftTable, Partitioning}

/** CBO column statistics from zone maps ([[graft.table
  * .GraftColumnStats]]): both catalog scans report min/max/nullCount
  * (and exact ndv for identity-partition sources) through DSv2
  * `columnStats`, Spark's `transformV2Stats` lands them in catalyst
  * `ColumnStat`s, and with `spark.sql.cbo.enabled` filter estimation
  * sees real ranges — no ANALYZE pass, no data read.
  */
class ColumnStatsSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "cstatcat"

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_cstat_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    dir
  }

  private def withCbo[T](body: => T): T = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  private def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  private def mk(root: String): Unit = {
    val df = (1 to 100).map(i => (i.toLong % 5, i.toLong, i * 2.0,
      if (i % 4 == 0) null else s"s$i",
      d(f"2024-03-${i % 28 + 1}%02d"))).toDF("k", "id", "amt", "tag", "d")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.append(spark, root, df)
  }

  private def attrStats(df: org.apache.spark.sql.DataFrame) = {
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.getOrElse(fail("no V2 scan relation in the optimized plan"))
    (rel.stats, rel.stats.attributeStats.map { case (a, s) => a.name -> s })
  }

  test("zone-map column stats reach catalyst: min/max/nulls/exact ndv") {
    mk(s"$wh/ns/t1")
    withCbo {
      val (stats, byName) =
        attrStats(spark.sql(s"SELECT k, id, amt, tag, d FROM $cat.ns.t1"))
      assert(stats.rowCount.contains(BigInt(100)))
      val idS = byName("id")
      assert(idS.min.contains(1L) && idS.max.contains(100L), s"id: $idS")
      assert(idS.nullCount.contains(BigInt(0)))
      val amtS = byName("amt")
      assert(amtS.min.contains(2.0) && amtS.max.contains(200.0))
      // exact ndv: k is the identity partition source with 5 values
      assert(byName("k").distinctCount.contains(BigInt(5)))
      // strings: nullCount only (truncated parquet bounds, no ranges)
      val tagS = byName("tag")
      assert(tagS.min.isEmpty && tagS.max.isEmpty)
      assert(tagS.nullCount.contains(BigInt(25)))
      // dates land as catalyst internal ints (epoch days)
      val dS = byName("d")
      assert(dS.min.exists(_.isInstanceOf[Int]), s"d: $dS")
    }
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

  test("CBO filter estimation uses the ranges: out-of-range shrinks to ~0") {
    mk(s"$wh/ns/t2")
    // V1 path (SPJ off): the scan fully handles the pushed range, so
    // its OWN estimate prices the zone-map selectivity
    withCbo(withSpj(on = false) {
      val full = spark.sql(s"SELECT id FROM $cat.ns.t2")
        .queryExecution.optimizedPlan.stats.rowCount
      val plan = spark.sql(s"SELECT id FROM $cat.ns.t2 WHERE id <= 10")
      val narrow = plan.queryExecution.optimizedPlan.stats.rowCount
      assert(full.exists(_ == BigInt(100)))
      assert(narrow.exists(_ <= BigInt(20)),
        s"range selectivity not applied: full=$full narrow=$narrow\n" +
          plan.queryExecution.optimizedPlan.treeString)
    })
    // SPJ path: the filter survives as a residual above the scan, and
    // Spark's own FilterEstimation shrinks it from the reported
    // column stats (the scan itself keeps exact live rows). Catalyst's
    // FilterEstimation refuses to estimate without a distinctCount, so
    // the column needs a declared NDV sketch.
    val root2b = s"$wh/ns/t2b"
    val df2b = (1 to 100).map(i => (i.toLong % 5, i.toLong))
      .toDF("k", "id")
    GraftTable.createPartitioned(spark, root2b, df2b.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.setNdvColumns(spark, root2b, Seq("id"))
    GraftTable.append(spark, root2b, df2b)
    withCbo(withSpj(on = true) {
      val plan = spark.sql(s"SELECT id FROM $cat.ns.t2b WHERE id <= 10")
      val narrow = plan.queryExecution.optimizedPlan.stats.rowCount
      assert(narrow.exists(_ <= BigInt(25)),
        s"SPJ residual-filter selectivity not applied: narrow=$narrow\n" +
          plan.queryExecution.optimizedPlan.treeString)
    })
  }

  test("declared NDV sketches union across appends to a true distinct count") {
    val root = s"$wh/ns/t4"
    val df0 = (1 to 60).map(i => (i.toLong % 5, i.toLong, s"u${i % 7}"))
      .toDF("k", "id", "user")
    GraftTable.createPartitioned(spark, root, df0.schema,
      Seq(Partitioning.PIdentity("k")))
    GraftTable.setNdvColumns(spark, root, Seq("id", "user"))
    GraftTable.append(spark, root, df0)
    // overlapping second append: ids 31..90 (30 new), users unchanged —
    // a mergeable sketch union must NOT double-count the overlap
    GraftTable.append(spark, root,
      (31 to 90).map(i => (i.toLong % 5, i.toLong, s"u${i % 7}"))
        .toDF("k", "id", "user"))
    withCbo {
      val (stats, byName) =
        attrStats(spark.sql(s"SELECT k, id, user FROM $cat.ns.t4"))
      assert(stats.rowCount.contains(BigInt(120)))
      // HLL at n=90/7 is exact to well under 5%
      assert(byName("id").distinctCount.exists(n =>
        n >= BigInt(86) && n <= BigInt(94)), s"id: ${byName("id")}")
      assert(byName("user").distinctCount.contains(BigInt(7)))
      // identity-partition source stays the EXACT layout count
      assert(byName("k").distinctCount.contains(BigInt(5)))
    }
    // float columns are refused loudly
    val root5 = s"$wh/ns/t5"
    val df5 = Seq((1L, 1.5)).toDF("k", "x")
    GraftTable.createPartitioned(spark, root5, df5.schema,
      Seq(Partitioning.PIdentity("k")))
    val e = intercept[IllegalArgumentException](
      GraftTable.setNdvColumns(spark, root5, Seq("x")))
    assert(e.getMessage.contains("not sketchable"))
  }

  test("exact sizes drive STATIC broadcast: small catalog dim plans BHJ pre-AQE") {
    // before the stats bridge, every V1-bridged catalog scan estimated
    // at defaultSizeInBytes (8 EiB) and static planning chose
    // sort-merge for ANY catalog join, leaving the fix to AQE; with
    // exact live-row sizes the INITIAL plan already broadcasts
    val dim = s"$wh/ns/tdim"
    val fact = s"$wh/ns/tfact"
    val dimDf = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("k", "nm")
    val factDf = (1 to 5000).map(i => (i.toLong % 50 + 1, i.toLong))
      .toDF("k", "v")
    GraftTable.create(spark, dim, dimDf.schema)
    GraftTable.append(spark, dim, dimDf)
    GraftTable.create(spark, fact, factDf.schema)
    GraftTable.append(spark, fact, factDf)
    val df = spark.sql(
      s"SELECT f.k, d.nm, f.v FROM $cat.ns.tfact f JOIN $cat.ns.tdim d ON f.k = d.k")
    // sparkPlan = the static plan BEFORE adaptive re-optimization
    val static = df.queryExecution.sparkPlan
    val bhj = static.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"expected a STATIC broadcast hash join, got:\n$static")
  }

  test("ndv.columns SQL property declares sketches through the catalog") {
    spark.sql(s"""CREATE TABLE $cat.ns.t6 (k BIGINT, id BIGINT)
      TBLPROPERTIES('ndv.columns' = 'id')""")
    spark.sql(s"INSERT INTO $cat.ns.t6 " +
      (1 to 40).map(i => s"SELECT ${i % 4}L, ${i}L").mkString(" UNION ALL "))
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT id FROM $cat.ns.t6"))
      assert(byName("id").distinctCount.contains(BigInt(40)),
        s"id: ${byName("id")}")
    }
    // a float column in the property is refused loudly
    val e = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.ns.t7 (k BIGINT, x DOUBLE)
        TBLPROPERTIES('ndv.columns' = 'x')"""))
    assert(e.getMessage.contains("not sketchable"))
  }

  test("join estimation consumes sketch ndv: |F join D| from rows·rows/ndv") {
    // F: 2000 rows over 100 distinct keys; D: 100 unique keys →
    // catalyst's equi-join estimate is |F|·|D| / max(ndv) = 2000
    val froot = s"$wh/ns/jf"
    val droot = s"$wh/ns/jd"
    val fdf = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("fk", "v")
    val ddf = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("dk", "nm")
    GraftTable.create(spark, froot, fdf.schema)
    GraftTable.setNdvColumns(spark, froot, Seq("fk"))
    GraftTable.append(spark, froot, fdf)
    GraftTable.create(spark, droot, ddf.schema)
    GraftTable.setNdvColumns(spark, droot, Seq("dk"))
    GraftTable.append(spark, droot, ddf)
    withCbo {
      val est = spark.sql(
        s"SELECT v, nm FROM $cat.ns.jf JOIN $cat.ns.jd ON fk = dk")
        .queryExecution.optimizedPlan.stats.rowCount
      // HLL jitter stays well inside ±25%
      assert(est.exists(n => n >= BigInt(1500) && n <= BigInt(2500)),
        s"join estimate off: $est (expected ~2000)")
    }
  }

  test("CBO join reorder runs on SPJ catalog tables — no ANALYZE pass") {
    // fact joins two dims; the SELECTIVE dim (covers half the fact's
    // key domain → halves the fact) is written LAST in the SQL. With
    // rowCount + ndv from the log, CostBasedJoinReorder moves it
    // ahead of the non-selective dim. PARTITIONED tables + SPJ flag:
    // the "Join Reorder" batch runs right after scan pushdown, BEFORE
    // the post-pushdown V1ScanStatsRule slot — so only scans that are
    // natively stats-capable there (GraftBatchScan; V1ScanWrapper is
    // swapped too late) feed the reorderer. V1-path scans still get
    // stats for everything later in the pipeline (filter estimation,
    // static broadcast choice).
    val f = s"$wh/ns/rf"
    val a = s"$wh/ns/ra"
    val b = s"$wh/ns/rb"
    val fdf = (1 to 20000).map(i =>
      (i.toLong % 100, i.toLong % 400, i.toLong)).toDF("ka", "kb", "v")
    val adf = (0 until 100).map(i => (i.toLong, s"a$i")).toDF("ida", "na")
    // b covers only kb < 200 → halves the fact
    val bdf = (0 until 200).map(i => (i.toLong, s"b$i")).toDF("idb", "nb")
    for ((root, df, keys) <- Seq((f, fdf, Seq("ka", "kb")),
        (a, adf, Seq("ida")), (b, bdf, Seq("idb")))) {
      GraftTable.createPartitioned(spark, root, df.schema,
        Seq(Partitioning.PBucket(keys.head, 4)))
      GraftTable.setNdvColumns(spark, root, keys)
      GraftTable.append(spark, root, df)
    }
    val q = s"""SELECT v, na, nb FROM $cat.ns.rf
      JOIN $cat.ns.ra ON ka = ida
      JOIN $cat.ns.rb ON kb = idb"""
    def innerJoinRightLeaf(on: Boolean): String = {
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
      try {
        val plan = spark.sql(q).queryExecution.optimizedPlan
        val joins = plan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
        // innermost join's right side names the first-joined dim
        joins.last.right.collectLeaves().head.toString
      } finally spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
    }
    withCbo(withSpj(on = true) {
      val syntactic = innerJoinRightLeaf(on = false)
      val reordered = innerJoinRightLeaf(on = true)
      assert(syntactic.contains("ns.ra"),
        s"premise: syntactic order joins ra first, got $syntactic")
      assert(reordered.contains("ns.rb"),
        s"join reorder should pull the selective dim first: $reordered")
    })
  }

  test("CALL analyze backfills sketches for pre-declaration files, metadata-only") {
    val root = s"$wh/ns/t8"
    val df0 = (1 to 80).map(i => (i.toLong % 4, i.toLong)).toDF("k", "id")
    GraftTable.create(spark, root, df0.schema)
    GraftTable.append(spark, root, df0) // BEFORE the declaration
    spark.sql(
      s"ALTER TABLE $cat.ns.t8 SET TBLPROPERTIES('ndv.columns' = 'id')")
    GraftTable.append(spark, root,
      (81 to 100).map(i => (i.toLong % 4, i.toLong)).toDF("k", "id"))
    // mixed coverage → the all-files union guard keeps ndv silent
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT id FROM $cat.ns.t8"))
      assert(byName("id").distinctCount.isEmpty,
        "pre-declaration files must silence ndv until analyzed")
    }
    val filesBefore = GraftTable.snapshot(spark, root).files
      .map(_.path).toSet
    val analyzed = spark.sql(s"CALL $cat.system.analyze(table => 'ns.t8')")
      .head.getLong(0)
    assert(analyzed >= 1, s"expected backfilled files, got $analyzed")
    // metadata-only: the data paths are untouched
    assert(GraftTable.snapshot(spark, root).files.map(_.path).toSet
      == filesBefore)
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT id FROM $cat.ns.t8"))
      assert(byName("id").distinctCount.contains(BigInt(100)),
        s"id after analyze: ${byName("id")}")
    }
    // idempotent: nothing left to backfill
    assert(spark.sql(s"CALL $cat.system.analyze(table => 'ns.t8')")
      .head.getLong(0) == 0L)
  }

  test("histograms price skew: the rare range shrinks only with the bins") {
    // 990 rows of v=0 plus one each of 1..10: uniform density over
    // [0,10] calls `v >= 1` 90% selective; the equi-height bins know
    // almost everything sits at 0
    val root = s"$wh/ns/t9"
    val df = ((1 to 990).map(i => (i.toLong % 4, 0L)) ++
      (1 to 10).map(i => (i.toLong % 4, i.toLong))).toDF("k", "v")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(Partitioning.PBucket("k", 4)))
    GraftTable.setNdvColumns(spark, root, Seq("v"))
    GraftTable.append(spark, root, df)
    val q = s"SELECT v FROM $cat.ns.t9 WHERE v >= 1"
    def est(): BigInt = withCbo(withSpj(on = true) {
      spark.sql(q).queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no rowCount"))
    })
    val uniform = est()
    assert(uniform >= BigInt(400),
      s"premise: uniform density should overestimate, got $uniform")
    val r = spark.sql(
      s"CALL $cat.system.analyze(table => 'ns.t9', histogram_for => 'v')")
      .head
    assert(r.getString(1) == "v")
    val skewAware = est()
    assert(skewAware <= BigInt(150),
      s"histogram should price the skew: uniform=$uniform with-bins=$skewAware")
    // V1 path too: the scan's OWN estimate (the filter never survives
    // above it) prices the range by the bins once they exist
    val v1Est = withCbo(withSpj(on = false) {
      spark.sql(q).queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no rowCount"))
    })
    assert(v1Est <= BigInt(150),
      s"V1 scan estimate should be histogram-aware: $v1Est")
  }

  test("histogram pricing does not compound with file pruning on " +
      "clustered data") {
    // v = 1..1000 written CLUSTERED: 10 files, each a tight 100-value
    // span. `v >= 901` prunes to the one surviving file (~100 live
    // rows, fully in range). The unclipped table-level histogram says
    // P(v >= 901) ≈ 0.1 — multiplying that onto the already-pruned
    // rows is the quadratic underestimate (≈10 rows) that wrongly
    // qualifies large relations for static broadcast. Clipped to the
    // survivors' zone-map span the histogram charges ≈1.
    val root = s"$wh/ns/t13"
    val schema = Seq((0L, 0L)).toDF("k", "v").schema
    GraftTable.create(spark, root, schema)
    for (c <- 0 until 10) {
      val df = (1 to 100).map(i => (i.toLong % 4, (c * 100 + i).toLong))
        .toDF("k", "v").coalesce(1)
      GraftTable.append(spark, root, df)
    }
    spark.sql(
      s"CALL $cat.system.analyze(table => 'ns.t13', histogram_for => 'v')")
    val q = s"SELECT v FROM $cat.ns.t13 WHERE v >= 901"
    for (spj <- Seq(true, false)) {
      val est = withCbo(withSpj(on = spj) {
        spark.sql(q).queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail("no rowCount"))
      })
      assert(est >= BigInt(60) && est <= BigInt(150),
        s"spj=$spj: pruning+histogram must not compound, got $est")
    }
  }

  test("histogram equality prices the point's bin mass, never zero-width") {
    // 900 rows of v=0 plus one each of 1..100: after analyze, the
    // hot value's equality must price its (point-)bin mass — the old
    // zero-width interval math estimated EVERY analyzed equality at
    // ~1 row, the broadcast-driving underestimate — while a rare
    // value prices a sliver
    val root = s"$wh/ns/t15"
    val df = ((1 to 900).map(i => (i.toLong % 4, 0L)) ++
      (1 to 100).map(i => (i.toLong % 4, i.toLong))).toDF("k", "v")
    GraftTable.create(spark, root, df.schema)
    GraftTable.setNdvColumns(spark, root, Seq("v"))
    GraftTable.append(spark, root, df)
    spark.sql(
      s"CALL $cat.system.analyze(table => 'ns.t15', histogram_for => 'v')")
    def est(cond: String): BigInt = withCbo(withSpj(on = false) {
      spark.sql(s"SELECT v FROM $cat.ns.t15 WHERE $cond")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no rowCount"))
    })
    val hot = est("v = 0")
    assert(hot >= BigInt(300),
      s"equality on the dominant value must price its bin mass, got $hot")
    val rare = est("v = 77")
    assert(rare >= BigInt(1) && rare <= BigInt(60),
      s"equality on a rare value prices a bin sliver, got $rare")
  }

  test("string predicates price from truncation-safe bounds and declared ndv") {
    val root = s"$wh/ns/t14"
    // 1000 rows, tag ∈ {s0..s9} → ndv 10; equality must price ~1/ndv
    // (never the ~0 a sparse byte-interval would claim), a range must
    // shrink below the full count but stay at or above the ndv floor
    val df = (1 to 1000).map(i => (i.toLong % 4, s"s${i % 10}", i.toLong))
      .toDF("k", "tag", "id")
    GraftTable.create(spark, root, df.schema)
    GraftTable.setNdvColumns(spark, root, Seq("tag", "k"))
    GraftTable.append(spark, root, df)
    withCbo(withSpj(on = false) {
      def est(cond: String): BigInt =
        spark.sql(s"SELECT id FROM $cat.ns.t14 WHERE $cond")
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail("no rowCount"))
      val eq = est("tag = 's3'")
      assert(eq >= BigInt(50) && eq <= BigInt(200),
        s"string equality should price ~rows/ndv (~100), got $eq")
      val rg = est("tag >= 's8'")
      assert(rg >= BigInt(90) && rg < BigInt(1000),
        s"string range should shrink the estimate safely, got $rg")
      // numeric EQUALITY on a low-cardinality declared column prices
      // 1/ndv (~250 of 1000), never the 1-row-per-file floor the
      // zero-width interval would claim
      val eqN = est("k = 2")
      assert(eqN >= BigInt(150) && eqN <= BigInt(400),
        s"numeric equality should price ~rows/ndv (~250), got $eqN")
    })
  }

  test("maintain drains NDV-sketch debt alongside its other passes") {
    val root = s"$wh/ns/t10"
    val df = (1 to 50).map(i => (i.toLong % 4, i.toLong)).toDF("k", "id")
    GraftTable.create(spark, root, df.schema)
    GraftTable.append(spark, root, df) // pre-declaration
    GraftTable.setNdvColumns(spark, root, Seq("id"))
    GraftTable.maintain(spark, root)
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT id FROM $cat.ns.t10"))
      assert(byName("id").distinctCount.contains(BigInt(50)),
        s"maintain should backfill sketches: ${byName("id")}")
    }
  }

  test("date columns sketch and histogram (unix_date, not the refused cast)") {
    val root = s"$wh/ns/t11"
    val df = (1 to 60).map(i =>
      (i.toLong % 4, d(f"2024-0${i % 3 + 1}-${i % 28 + 1}%02d")))
      .toDF("k", "dt")
    GraftTable.create(spark, root, df.schema)
    GraftTable.setNdvColumns(spark, root, Seq("dt"))
    GraftTable.append(spark, root, df)
    spark.sql(
      s"CALL $cat.system.analyze(table => 'ns.t11', histogram_for => 'dt')")
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT dt FROM $cat.ns.t11"))
      val expected = df.select("dt").distinct().count()
      assert(byName("dt").distinctCount.contains(BigInt(expected)),
        s"dt: ${byName("dt")}")
    }
    assert(GraftTable.histogramsOf(spark, root).contains("dt"))
  }

  test("an empty append cannot silence a declared ndv column") {
    val root = s"$wh/ns/t12"
    val df = (1 to 30).map(i => (i.toLong % 4, i.toLong)).toDF("k", "id")
    GraftTable.create(spark, root, df.schema)
    GraftTable.setNdvColumns(spark, root, Seq("id"))
    GraftTable.append(spark, root, df)
    GraftTable.append(spark, root, df.limit(0)) // zero-row commit
    withCbo {
      val (_, byName) = attrStats(spark.sql(s"SELECT id FROM $cat.ns.t12"))
      assert(byName("id").distinctCount.contains(BigInt(30)),
        s"zero-live files must be exempt from the union guard: ${byName("id")}")
    }
  }

  test("stats survive a column-mapping rename and stay conservative under DV") {
    val root = s"$wh/ns/t3"
    mk(root)
    GraftTable.renameColumn(spark, root, "amt", "price")
    GraftTable.deleteWhereDv(spark, root, "id > 90", prune = None)
    withCbo {
      val (stats, byName) =
        attrStats(spark.sql(s"SELECT price, id FROM $cat.ns.t3"))
      assert(stats.rowCount.contains(BigInt(90)))
      // renamed column resolves through the physical name; the DV
      // commit refreshes survivor zone maps, so the bound is either
      // exact-over-survivors (180.0) or the conservative physical one
      val pS = byName("price")
      assert(pS.min.contains(2.0))
      assert(pS.max.exists(m => m == 180.0 || m == 200.0), s"price: $pS")
      // nullCount never exceeds live rows
      assert(byName("id").nullCount.exists(_ <= BigInt(90)))
    }
  }
}
