package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.table.{FilterSql, GraftCatalog, GraftScan, GraftScanBuilder, GraftTable, GraftV2Table}

/** The SQL-catalog surface of the table format ([[GraftCatalog]]):
  * DDL lifecycle, INSERT/OVERWRITE/CTAS, SELECT with pushdown-driven
  * file pruning + exact metadata statistics, VERSION/TIMESTAMP AS OF,
  * DELETE FROM / TRUNCATE, ALTER TABLE column mapping, and the
  * DV-masked read through plain SQL.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gcat", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ns")
    dir
  }

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"k$i", i * 10.0)).toDF("id", "key", "v")

  test("DDL lifecycle: create, exists, list, rename, drop") {
    wh
    spark.sql("CREATE TABLE gcat.ns.life (id BIGINT, key STRING, v DOUBLE)")
    assert(spark.sql("SHOW TABLES IN gcat.ns").collect()
      .map(_.getString(1)).contains("life"))
    intercept[TableAlreadyExistsException] {
      spark.sql("CREATE TABLE gcat.ns.life (x INT)")
    }
    // empty created table reads back empty with the declared schema
    val empty = spark.sql("SELECT * FROM gcat.ns.life")
    assert(empty.columns.toSeq == Seq("id", "key", "v"))
    assert(empty.count() == 0)
    spark.sql("ALTER TABLE gcat.ns.life RENAME TO gcat.ns.life2")
    assert(!spark.catalog.tableExists("gcat.ns.life"))
    spark.sql("DROP TABLE gcat.ns.life2")
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM gcat.ns.life2").collect()
    }.getMessage.toLowerCase.contains("life2"))
  }

  test("INSERT INTO appends atomically; INSERT OVERWRITE replaces; CTAS works") {
    wh
    spark.sql("CREATE TABLE gcat.ns.ins (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 40).createOrReplaceTempView("src40")
    spark.sql("INSERT INTO gcat.ns.ins SELECT * FROM src40")
    spark.sql("INSERT INTO gcat.ns.ins SELECT id + 100, key, v FROM src40")
    assert(spark.table("gcat.ns.ins").count() == 80)
    // the two inserts are two log commits on top of the create
    assert(GraftTable.snapshot(spark, s"$wh/ns/ins").version == 2L)

    spark.sql("INSERT OVERWRITE gcat.ns.ins SELECT * FROM src40")
    assert(spark.table("gcat.ns.ins").count() == 40)

    spark.sql("CREATE TABLE gcat.ns.ctas AS " +
      "SELECT id, v FROM gcat.ns.ins WHERE id >= 20")
    assert(spark.table("gcat.ns.ctas").count() == 20)
    assert(spark.table("gcat.ns.ctas").columns.toSeq == Seq("id", "v"))
  }

  test("SELECT pushes filters into file pruning and re-applies them exactly") {
    wh
    spark.sql("CREATE TABLE gcat.ns.prune (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/prune"
    // three appends with disjoint id ranges → three file sets with
    // disjoint zone maps
    GraftTable.append(spark, root, rows(0, 100).repartition(1))
    GraftTable.append(spark, root, rows(100, 200).repartition(1))
    GraftTable.append(spark, root, rows(200, 300).repartition(1))

    // unit-level: the scan builder prunes to the single overlapping file
    val snap = GraftTable.snapshot(spark, root)
    val b = new GraftScanBuilder(spark, root, snap)
    val residual = b.pushFilters(Array[Filter](
      IsNotNull("id"), EqualTo("id", 150L)))
    assert(residual.isEmpty, "all filters translatable -> none residual")
    val scan = b.build().asInstanceOf[GraftScan]
    assert(scan.files.size == 1 && snap.files.size == 3)

    // end-to-end: the SQL answer is exact and the scan reports pruning
    val df = spark.sql(
      "SELECT key FROM gcat.ns.prune WHERE id BETWEEN 120 AND 140")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      (120L to 140L).map(i => s"k$i").sorted)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.exists(_.toString.contains("files 1/3")),
      s"expected pruned scan in:\n${df.queryExecution.executedPlan}")
  }

  test("scan statistics are exact from metadata; a small graft dim broadcasts") {
    wh
    spark.sql("CREATE TABLE gcat.ns.dim (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/dim"
    GraftTable.append(spark, root, rows(0, 64))
    val snap = GraftTable.snapshot(spark, root)
    val b = new GraftScanBuilder(spark, root, snap)
    val stats = b.build().asInstanceOf[GraftScan].estimateStatistics()
    assert(stats.numRows.getAsLong == 64)

    val fact = spark.range(0, 100000).withColumn("id", col("id") % 64)
    val joined = fact.join(spark.table("gcat.ns.dim"), "id")
    val plan: SparkPlan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"expected broadcast from reported stats in:\n$plan")
    assert(joined.count() == 100000)
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin snapshots; writes to a pin refuse") {
    wh
    spark.sql("CREATE TABLE gcat.ns.tt (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/tt"
    GraftTable.append(spark, root, rows(0, 10)) // v1
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(20)
    GraftTable.append(spark, root, rows(10, 30)) // v2
    assert(spark.sql("SELECT count(*) c FROM gcat.ns.tt VERSION AS OF 1")
      .head.getLong(0) == 10)
    assert(spark.table("gcat.ns.tt").count() == 30)
    val ts = new java.sql.Timestamp(tsAfterV1).toString
    assert(spark.sql(
      s"SELECT count(*) c FROM gcat.ns.tt TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 10)
    val err = intercept[Exception] {
      spark.sql("INSERT INTO gcat.ns.tt VERSION AS OF 1 VALUES (1,'a',1.0)")
    }
    assert(err != null) // the parser/analyzer refuses writes to a pin
  }

  test("delete.mode=auto: selective DELETE goes merge-on-read, wide DELETE CoW") {
    wh
    spark.sql("""CREATE TABLE gcat.ns.dmode (id BIGINT, key STRING, v DOUBLE)
      TBLPROPERTIES('ndv.columns' = 'id', 'delete.mode' = 'auto')""")
    val root = s"$wh/ns/dmode"
    GraftTable.append(spark, root, rows(0, 10000).coalesce(1))
    val before = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    // selective: the stats layer prices `id = 7` at 1/ndv ≈ 1e-4 →
    // the DV path masks one position, data files untouched
    spark.sql("DELETE FROM gcat.ns.dmode WHERE id = 7")
    val s1 = GraftTable.snapshot(spark, root)
    assert(s1.files.map(_.path).toSet == before,
      "selective auto-delete must be merge-on-read (no rewrite)")
    assert(s1.files.flatMap(_.dv.map(_.rows)).sum == 1)
    assert(spark.table("gcat.ns.dmode").count() == 9999)
    // wide: `id >= 1000` prices ~90% → copy-on-write rewrite, the
    // masked file folds away with it (CoW reads live rows)
    spark.sql("DELETE FROM gcat.ns.dmode WHERE id >= 1000")
    val s2 = GraftTable.snapshot(spark, root)
    assert(s2.files.map(_.path).toSet.intersect(before).isEmpty,
      "wide auto-delete must rewrite (CoW)")
    assert(s2.files.forall(_.dv.isEmpty))
    assert(spark.table("gcat.ns.dmode").count() == 999)
    // mode=dv pins merge-on-read even for a wide predicate
    spark.sql(
      "ALTER TABLE gcat.ns.dmode SET TBLPROPERTIES('delete.mode' = 'dv')")
    val filesBeforeDv = GraftTable.snapshot(spark, root).files.map(_.path)
    spark.sql("DELETE FROM gcat.ns.dmode WHERE id >= 500")
    val s3 = GraftTable.snapshot(spark, root)
    assert(s3.files.map(_.path) == filesBeforeDv)
    // ids 0..499 minus the id=7 masked earlier
    assert(spark.table("gcat.ns.dmode").count() == 499)
    // an invalid mode is refused loudly
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE gcat.ns.dmode SET TBLPROPERTIES('delete.mode' = 'x')")
    }
    // ... and refused at CREATE without leaving a half-created zombie:
    // the corrected re-run must succeed
    intercept[Exception] {
      spark.sql("""CREATE TABLE gcat.ns.dzomb (id BIGINT)
        TBLPROPERTIES('delete.mode' = 'cowboy')""")
    }
    spark.sql("""CREATE TABLE gcat.ns.dzomb (id BIGINT)
      TBLPROPERTIES('delete.mode' = 'cow')""")
    assert(spark.table("gcat.ns.dzomb").count() == 0)
  }

  test("DELETE FROM is a pruned copy-on-write commit; TRUNCATE empties") {
    wh
    spark.sql("CREATE TABLE gcat.ns.del (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/del"
    GraftTable.append(spark, root, rows(0, 100).repartition(1))
    GraftTable.append(spark, root, rows(100, 200).repartition(1))
    val before = GraftTable.snapshot(spark, root)

    spark.sql("DELETE FROM gcat.ns.del WHERE id < 50")
    assert(spark.table("gcat.ns.del").count() == 150)
    // only the overlapping file was rewritten: the untouched second
    // file's path survives into the new snapshot
    val after = GraftTable.snapshot(spark, root)
    val kept = before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(kept.size == 1, s"expected 1 carried-over file, got $kept")

    spark.sql("TRUNCATE TABLE gcat.ns.del")
    assert(spark.table("gcat.ns.del").count() == 0)
    // schema survives truncation and later inserts still conform
    spark.sql("INSERT INTO gcat.ns.del VALUES (1, 'a', 1.0)")
    assert(spark.table("gcat.ns.del").count() == 1)
  }

  test("ALTER TABLE: add/rename/drop column ride the column-mapping commits") {
    wh
    spark.sql("CREATE TABLE gcat.ns.alt (id BIGINT, key STRING)")
    val root = s"$wh/ns/alt"
    GraftTable.append(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "key"))
    spark.sql("ALTER TABLE gcat.ns.alt ADD COLUMNS (score DOUBLE)")
    // pre-evolution rows read NULL in the new column
    assert(spark.sql("SELECT score FROM gcat.ns.alt").collect()
      .forall(_.isNullAt(0)))
    spark.sql("INSERT INTO gcat.ns.alt VALUES (3, 'c', 9.5)")
    assert(spark.sql(
      "SELECT count(*) c FROM gcat.ns.alt WHERE score IS NOT NULL")
      .head.getLong(0) == 1)

    spark.sql("ALTER TABLE gcat.ns.alt RENAME COLUMN key TO label")
    assert(spark.table("gcat.ns.alt").columns.toSeq ==
      Seq("id", "label", "score"))
    assert(spark.sql("SELECT label FROM gcat.ns.alt WHERE id = 1")
      .head.getString(0) == "a")
    // the mapping is logical-only: no data file was rewritten
    spark.sql("ALTER TABLE gcat.ns.alt DROP COLUMN score")
    assert(spark.table("gcat.ns.alt").columns.toSeq == Seq("id", "label"))
  }

  test("a DV-masked table reads correctly through plain SQL") {
    wh
    spark.sql("CREATE TABLE gcat.ns.dv (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/dv"
    GraftTable.append(spark, root, rows(0, 100))
    GraftTable.deleteWhereDv(spark, root, "id % 10 = 3", None)
    assert(spark.table("gcat.ns.dv").count() == 90)
    assert(spark.sql("SELECT count(*) c FROM gcat.ns.dv WHERE id % 10 = 3")
      .head.getLong(0) == 0)
  }

  test("FilterSql translates the supported surface and refuses the rest") {
    assert(FilterSql.translate(EqualTo("a b", "x'y")).contains(
      "`a b` = 'x\\'y'"))
    assert(FilterSql.translate(
      GreaterThanOrEqual("d", java.sql.Date.valueOf("2020-03-04"))).contains(
      "`d` >= DATE '2020-03-04'"))
    assert(FilterSql.translate(
      org.apache.spark.sql.sources.In("k", Array[Any](1, null))).isEmpty)
    // round-trip: the rendered text parses back into pruning ranges
    val r = GraftTable.rangesOf(spark,
      FilterSql.translate(EqualTo("id", 7L)).get)
    assert(r == Seq(GraftTable.Range("id", Some(7L), Some(7L))))
  }

  test("CALL procedures: optimize (zorder + compact), history, expire, vacuum") {
    wh
    spark.sql("CREATE TABLE gcat.ns.proc (id BIGINT, zx BIGINT, zy BIGINT)")
    val root = s"$wh/ns/proc"
    (0 until 3).foreach(i => GraftTable.append(spark, root,
      spark.range(i * 100L, i * 100L + 100)
        .selectExpr("id", "(id * 37) % 256 AS zx", "(id * 91) % 256 AS zy")))

    // incremental Z-order via CALL: every file ends stamped
    val v = spark.sql("CALL gcat.system.optimize(`table` => 'ns.proc', " +
      "zorder_by => 'zx,zy', target_files => 2, bits => 8)")
      .head.getLong(0)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.version == v)
    assert(snap.files.forall(_.layout.contains(
      GraftTable.layoutSpec(Seq("zx", "zy"), 8))))

    // history surfaces every commit
    val hist = spark.sql("CALL gcat.system.history(`table` => 'ns.proc')")
      .collect().map(_.getLong(0)).sorted
    assert(hist.toSeq == (0L to v))

    // plain compaction path
    spark.sql("CALL gcat.system.optimize(`table` => 'ns.proc', " +
      "target_files => 1)")
    assert(GraftTable.snapshot(spark, root).files.size == 1)

    // expire + vacuum: with only the compact commit retained, the
    // FIRST generation (append files, referenced by no retained
    // entry — the tip's removes keep the zorder generation alive for
    // the change feed, but nothing references the original appends)
    // is reclaimed
    val expired = spark.sql(
      "CALL gcat.system.expire_versions(`table` => 'ns.proc', keep => 1)")
      .count()
    assert(expired > 0)
    val reclaimed = spark.sql(
      "CALL gcat.system.vacuum(`table` => 'ns.proc', min_age_ms => 0)").count()
    assert(reclaimed > 0, "first-generation files are unreferenced -> reclaimed")
    // the table still reads complete after maintenance
    assert(spark.table("gcat.ns.proc").count() == 300)
  }

  test("INSERT INTO ... REPLACE WHERE: one pruned copy-on-write commit") {
    wh
    spark.sql("CREATE TABLE gcat.ns.rw (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/rw"
    GraftTable.append(spark, root, rows(0, 100).repartition(1))
    GraftTable.append(spark, root, rows(100, 200).repartition(1))
    val before = GraftTable.snapshot(spark, root)

    // replace the [100,200) slice with halved values
    rows(100, 150).withColumn("v", col("v") / 2)
      .createOrReplaceTempView("rw_src")
    spark.sql("""INSERT INTO gcat.ns.rw REPLACE WHERE id >= 100
                 SELECT * FROM rw_src""")
    val m = spark.table("gcat.ns.rw").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m.size == 150)
    assert(m(50L) == 500.0, "untouched slice intact")
    assert(m(120L) == 600.0, "replaced slice carries the new values")
    assert(!m.contains(160L), "unreplaced old slice rows are gone")
    // ONE commit; the provably-outside file survived by path
    val after = GraftTable.snapshot(spark, root)
    assert(after.version == before.version + 1)
    assert(before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet).nonEmpty,
      "zone-map-disjoint file must be carried, not rewritten")

    // the Delta contract: incoming rows outside the predicate refuse
    rows(0, 5).createOrReplaceTempView("rw_bad")
    val e = intercept[Exception] {
      spark.sql("""INSERT INTO gcat.ns.rw REPLACE WHERE id >= 1000
                   SELECT * FROM rw_bad""")
    }
    assert(e.getMessage.contains("do not satisfy"),
      s"expected slice-containment refusal, got ${e.getMessage}")
    assert(spark.table("gcat.ns.rw").count() == 150, "nothing committed")

    // DataFrame API spells the same verb
    rows(140, 160).writeTo("gcat.ns.rw").overwrite(col("id") >= 140)
    assert(spark.table("gcat.ns.rw").count() == 100 + 40 + 20)
  }

  test("ALTER COLUMN TYPE: SQL numeric widening through the catalog") {
    wh
    spark.sql("CREATE TABLE gcat.ns.widen (n INT, x FLOAT)")
    spark.sql("INSERT INTO gcat.ns.widen VALUES (7, 1.5)")
    spark.sql("ALTER TABLE gcat.ns.widen ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO gcat.ns.widen VALUES (3000000000, 2.5)")
    val got = spark.sql("SELECT n FROM gcat.ns.widen ORDER BY n")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 3000000000L))
    // narrowing refused
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ns.widen ALTER COLUMN n TYPE INT")
    }
  }

  test("GENERATED ALWAYS AS columns recompute on every write") {
    wh
    spark.sql("""CREATE TABLE gcat.ns.gen (
                   id BIGINT,
                   twice BIGINT GENERATED ALWAYS AS (id * 2),
                   tag STRING)""")
    spark.sql("INSERT INTO gcat.ns.gen (id, tag) VALUES (5, 'a')")
    // an explicitly-supplied value is overwritten by the expression
    spark.sql("INSERT INTO gcat.ns.gen VALUES (7, 99, 'b')")
    def rows() = spark.sql("SELECT id, twice, tag FROM gcat.ns.gen ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows() == Seq((5L, 10L, "a"), (7L, 14L, "b")))
    // UPDATE of the SOURCE column recomputes the derived one — the
    // CoW rewrite runs through the same write choke point
    spark.sql("UPDATE gcat.ns.gen SET id = 20 WHERE tag = 'a'")
    assert(rows() == Seq((7L, 14L, "b"), (20L, 40L, "a")))
    // compaction preserves values (recompute is idempotent)
    graft.table.GraftTable.compact(spark, s"$wh/ns/gen", targetFiles = 1)
    assert(rows() == Seq((7L, 14L, "b"), (20L, 40L, "a")))
    // the generation expression is visible operationally
    val props = spark.sql("SHOW TBLPROPERTIES gcat.ns.gen")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("generated.twice").exists(_.contains("id * 2")))
  }

  test("layout-only rewrites carry stored generated values, zero recomputes") {
    // a COUNTING generation expression: every evaluation bumps the
    // static probe, so "compaction skipped the recompute" is a hard
    // zero, not an inference from timings
    GraftCatalogSpec.genProbe.set(0L)
    spark.udf.register("graft_gen_probe", (x: Long) => {
      GraftCatalogSpec.genProbe.incrementAndGet(); x * 3
    })
    val gt = graft.table.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_genprobe").toString
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType)))
    gt.create(spark, root, schema)
    gt.setGenerated(spark, root, Map("g" -> "graft_gen_probe(id)"))
    gt.append(spark, root, (1L to 10L).toDF("id").repartition(2))
    assert(GraftCatalogSpec.genProbe.get() >= 10L,
      "the write choke point must evaluate the expression per row")
    def values() = gt.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val before = values()
    assert(before == (1L to 10L).map(i => (i, i * 3)))
    // layout-only passes: compaction and z-order carry stored bytes
    GraftCatalogSpec.genProbe.set(0L)
    gt.compact(spark, root, targetFiles = 1)
    assert(GraftCatalogSpec.genProbe.get() == 0L,
      "compaction is layout-only: zero generation-expression evaluations")
    assert(values() == before, "compaction output bit-identical")
    gt.zorderBy(spark, root, "id", "g", targetFiles = 1)
    assert(GraftCatalogSpec.genProbe.get() == 0L,
      "z-order is layout-only: zero generation-expression evaluations")
    assert(values() == before)
    // a VALUE-bearing write still recomputes — and a frame missing
    // the expression's source columns is rejected outright
    gt.append(spark, root, Seq(11L).toDF("id"))
    assert(GraftCatalogSpec.genProbe.get() >= 1L)
    assert(values().last == ((11L, 33L)),
      "an append that OMITS the generated column still computes it")
    intercept[IllegalArgumentException] {
      gt.append(spark, root, Seq((12L, 0L)).toDF("wrong", "g")
        .select(org.apache.spark.sql.functions.col("g")))
    }
  }

  test("column DEFAULT values: CREATE-time defaults fill INSERTs at write") {
    wh
    spark.sql("""CREATE TABLE gcat.ns.dflt (
                   id BIGINT,
                   status STRING DEFAULT 'new',
                   score DOUBLE DEFAULT 1.5)""")
    // omitted columns take the default; explicit DEFAULT keyword too
    spark.sql("INSERT INTO gcat.ns.dflt (id) VALUES (1)")
    spark.sql("INSERT INTO gcat.ns.dflt VALUES (2, DEFAULT, 9.0)")
    spark.sql("INSERT INTO gcat.ns.dflt VALUES (3, 'done', DEFAULT)")
    val got = spark.sql("SELECT * FROM gcat.ns.dflt ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "new", 1.5), (2L, "new", 9.0), (3L, "done", 1.5)))
    // ALTER … ADD COLUMN … DEFAULT: metadata-only EXISTS_DEFAULT —
    // the three pre-ALTER rows are NEVER rewritten, yet read back the
    // fill captured at ALTER time
    spark.sql("ALTER TABLE gcat.ns.dflt ADD COLUMN extra INT DEFAULT 7")
    def extras() = spark.sql("SELECT id, extra FROM gcat.ns.dflt ORDER BY id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toSeq
    assert(extras() == Seq(1L -> 7, 2L -> 7, 3L -> 7))
    // later INSERTs resolve the analyzer default (omitted column and
    // the DEFAULT keyword), and an EXPLICIT NULL stays NULL — stored
    // values are physical from here on
    spark.sql("INSERT INTO gcat.ns.dflt (id) VALUES (4)")
    spark.sql("INSERT INTO gcat.ns.dflt VALUES (5, 'x', 2.0, DEFAULT)")
    spark.sql("INSERT INTO gcat.ns.dflt VALUES (6, 'y', 3.0, NULL)")
    assert(extras() == Seq(1L -> 7, 2L -> 7, 3L -> 7, 4L -> 7, 5L -> 7,
      6L -> null))
    // compaction migrates the fill into stored bytes; reads identical
    graft.table.GraftTable.compact(spark, s"$wh/ns/dflt", targetFiles = 1)
    assert(extras() == Seq(1L -> 7, 2L -> 7, 3L -> 7, 4L -> 7, 5L -> 7,
      6L -> null))
  }

  test("CALL verify_table: clean audit on a healthy table, failures on corruption") {
    wh
    val root = s"$wh/ns/fsck"
    graft.table.GraftTable.append(spark, root, rows(0, 60))
    graft.table.GraftTable.append(spark, root, rows(60, 90))
    graft.table.GraftTable.deleteWhereDv(spark, root, "id < 5", prune = None)

    def audit() = spark.sql("CALL gcat.system.verify_table(`table` => 'ns.fsck')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getString(3)))

    // healthy: every check's summary row is ok, no failure rows
    val clean = audit()
    assert(clean.nonEmpty && clean.forall(_._3), s"expected clean: ${clean.mkString("\n")}")
    assert(clean.map(_._1).toSet ==
      Set("file_exists", "dv_exists", "dv_count", "row_count", "orphans"))

    // corruption 1: a logged data file vanishes (dv-* parquets are the
    // deletion vectors — exclude them here, corrupt one in step 2)
    val dataDir = new java.io.File(s"$root/data")
    def parquets(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) parquets(f) else if (f.getName.endsWith(".parquet")) Seq(f) else Nil)
    val (dvParquets, dataParquets) =
      parquets(dataDir).partition(_.getPath.contains("/dv-"))
    val victim = dataParquets.minBy(_.getName)
    assert(victim.delete())
    val broken = audit()
    val fe = broken.filter(_._1 == "file_exists")
    assert(fe.exists(r => !r._3), s"expected file_exists failure: ${broken.mkString("\n")}")

    // corruption 2: the deletion-vector parquet vanishes
    assert(dvParquets.nonEmpty && dvParquets.head.delete())
    val broken2 = audit()
    assert(broken2.exists(r => r._1 == "dv_exists" && !r._3),
      s"expected dv_exists failure: ${broken2.mkString("\n")}")
  }

  test("CALL describe_detail and maintain: operational SQL surface") {
    wh
    spark.sql("CREATE TABLE gcat.ns.ops (id BIGINT, v DOUBLE)")
    val root = s"$wh/ns/ops"
    (0 until 3).foreach(i => GraftTable.append(spark, root,
      spark.range(i * 100L, i * 100L + 100).selectExpr("id", "double(id) AS v")))
    GraftTable.deleteWhereDv(spark, root, "id >= 250", None)

    val d = spark.sql("CALL gcat.system.describe_detail(`table` => 'ns.ops')")
      .collect()
    assert(d.length == 1)
    val row = d.head
    val byName = row.schema.fieldNames.zipWithIndex.toMap
    assert(row.getLong(byName("version")) == 4L)
    assert(row.getLong(byName("physical_rows")) == 300L)
    assert(row.getLong(byName("live_rows")) == 250L)
    assert(row.getLong(byName("masked_rows")) == 50L)
    assert(row.getLong(byName("dv_files")) >= 1L)

    // maintain: the 1/6 mask ratio crosses the 0.1 purge bound →
    // DV folds away; small files compact; expiry+vacuum run
    val m = spark.sql("CALL gcat.system.maintain(`table` => 'ns.ops', " +
      "keep_versions => 1)").head
    assert(m.getBoolean(0), "mask debt above ratio must purge")
    assert(m.getBoolean(1), "three small files must compact")
    // post-maintenance: clean single-generation table, content intact
    val after = GraftTable.snapshot(spark, root)
    assert(after.files.forall(_.dv.isEmpty))
    assert(spark.table("gcat.ns.ops").count() == 250)
  }

  test("metadata-only aggregates: COUNT/MIN/MAX from the log, zero data IO") {
    wh
    spark.sql("CREATE TABLE gcat.ns.aggp (id BIGINT, v DOUBLE, s STRING)")
    val root = s"$wh/ns/aggp"
    GraftTable.append(spark, root, (0L until 150L)
      .map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))
    GraftTable.append(spark, root, (150L until 300L)
      .map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))

    val agg = spark.sql(
      "SELECT COUNT(*) AS n, COUNT(id) AS nid, MIN(id) AS mn, " +
        "MAX(v) AS mx FROM gcat.ns.aggp")
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only aggregate"),
      s"expected metadata-only scan in:\n${agg.queryExecution.executedPlan}")
    val r = agg.head
    assert(r.getLong(0) == 300 && r.getLong(1) == 300 &&
      r.getLong(2) == 0L && r.getDouble(3) == 149.5)

    // the definitive zero-IO proof: with every data file REMOVED the
    // aggregates still answer (log metadata is the only input)...
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(root, "data"), true)
    assert(spark.sql("SELECT COUNT(*) AS n FROM gcat.ns.aggp")
      .head.getLong(0) == 300)
    assert(spark.sql("SELECT MAX(id) AS m FROM gcat.ns.aggp")
      .head.getLong(0) == 299)
    // ...while an actual data read now fails
    intercept[Exception] {
      spark.sql("SELECT SUM(id) FROM gcat.ns.aggp").collect()
    }
  }

  test("aggregate pushdown refuses filters, strings, and DV-masked extremes") {
    wh
    spark.sql("CREATE TABLE gcat.ns.aggr (id BIGINT, v DOUBLE, s STRING)")
    val root = s"$wh/ns/aggr"
    GraftTable.append(spark, root, (0L until 100L)
      .map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))

    def planOf(sql: String) =
      spark.sql(sql).queryExecution.executedPlan.toString
    // a WHERE defeats file-level stats -> normal scan, exact result
    val filtered = spark.sql(
      "SELECT COUNT(*) AS n FROM gcat.ns.aggr WHERE id < 10")
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("metadata-only aggregate"))
    assert(filtered.head.getLong(0) == 10)
    // string extremes may be truncated bounds -> refused
    assert(!planOf("SELECT MIN(s) FROM gcat.ns.aggr").contains("metadata-only aggregate"))
    assert(spark.sql("SELECT MIN(s) AS m FROM gcat.ns.aggr")
      .head.getString(0) == "s0")

    // a DV commit refreshes the masked file's stats over SURVIVORS
    // (dvStats), so COUNT(*) AND MIN/MAX/COUNT(col) all stay on the
    // metadata fast path — and the masked extreme is gone from it
    GraftTable.deleteWhereDv(spark, root, "id >= 95", None)
    val cnt = spark.sql("SELECT COUNT(*) AS n FROM gcat.ns.aggr")
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata-only aggregate"))
    assert(cnt.head.getLong(0) == 95)
    val mx = spark.sql("SELECT MAX(id) AS m FROM gcat.ns.aggr")
    assert(mx.queryExecution.executedPlan.toString.contains("metadata-only aggregate"),
      "survivor-refreshed stats must keep MIN/MAX pushable after a DV delete")
    assert(mx.head.getLong(0) == 94, "masked rows must not count as extremes")
  }

  test("DV survivor stats: COUNT(col) null accounting, repeat DVs, full masks") {
    wh
    spark.sql("CREATE TABLE gcat.ns.dvs (id BIGINT, v DOUBLE, s STRING)")
    val root = s"$wh/ns/dvs"
    // nulls in v on every 10th row; two files
    def mk(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, if (i % 10 == 0) None else Some(i * 0.5), s"s$i"))
      .toDF("id", "v", "s")
    GraftTable.append(spark, root, mk(0, 100))
    GraftTable.append(spark, root, mk(100, 200))

    def assertMeta(sql: String, expect: Seq[Any]): Unit = {
      val df = spark.sql(sql)
      assert(df.queryExecution.executedPlan.toString
        .contains("metadata-only aggregate"), s"not pushed: $sql")
      val r = df.head
      assert((0 until expect.size).map(r.get) == expect, s"wrong: $sql -> $r")
    }
    // masks rows 90..109 including nulls (90, 100) across BOTH files
    GraftTable.deleteWhereDv(spark, root, "id >= 90 AND id < 110", None)
    assertMeta("SELECT COUNT(*) AS n, COUNT(v) AS nv FROM gcat.ns.dvs",
      Seq(180L, 180L - 18L))
    assertMeta("SELECT MIN(id) AS a, MAX(id) AS b FROM gcat.ns.dvs",
      Seq(0L, 199L))
    // a SECOND DV on the same file folds masks and re-refreshes
    GraftTable.deleteWhereDv(spark, root, "id < 20", None)
    assertMeta("SELECT COUNT(*) AS n, COUNT(v) AS nv FROM gcat.ns.dvs",
      Seq(160L, 160L - 16L))
    assertMeta("SELECT MIN(id) AS a, MIN(v) AS c FROM gcat.ns.dvs",
      Seq(20L, 10.5))
    // pruning got TIGHTER too: a probe into the masked range opens 0
    // files (the refreshed zone map starts at the surviving min)
    assert(GraftTable.prunedFiles(GraftTable.snapshot(spark, root),
      GraftTable.Range("id", Some(0L), Some(19L))).isEmpty,
      "survivor zone maps must exclude fully-masked ranges")
    // fully masking one file: it drops out of the fold, rest stays exact
    GraftTable.deleteWhereDv(spark, root, "id < 100", None)
    assertMeta("SELECT COUNT(*) AS n, MIN(id) AS a, MAX(id) AS b " +
      "FROM gcat.ns.dvs", Seq(90L, 110L, 199L))
  }

  test("SQL constraint DDL: TBLPROPERTIES('constraint.*') gates INSERTs") {
    wh
    spark.sql("CREATE TABLE gcat.ns.cons (id BIGINT, v DOUBLE)")
    spark.sql("""ALTER TABLE gcat.ns.cons
                 SET TBLPROPERTIES('constraint.v_pos' = 'v >= 0')""")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("cons_ok")
    spark.sql("INSERT INTO gcat.ns.cons SELECT * FROM cons_ok")
    assert(spark.table("gcat.ns.cons").count() == 2)
    // a violating batch refuses ATOMICALLY with per-constraint counts
    Seq((3L, 3.0), (4L, -4.0), (5L, -5.0)).toDF("id", "v")
      .createOrReplaceTempView("cons_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.ns.cons SELECT * FROM cons_bad")
    }
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("2"),
      s"expected named constraint + violation count, got: ${e.getMessage}")
    assert(spark.table("gcat.ns.cons").count() == 2,
      "violating INSERT must leave no partial state")
    // the constraint is visible as a table property
    val props = spark.sql("SHOW TBLPROPERTIES gcat.ns.cons").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("constraint.v_pos").contains("v >= 0"), s"got $props")
    // UNSET drops the gate; second constraint composes meanwhile
    spark.sql("""ALTER TABLE gcat.ns.cons
                 SET TBLPROPERTIES('constraint.id_pos' = 'id > 0')""")
    spark.sql("""ALTER TABLE gcat.ns.cons
                 UNSET TBLPROPERTIES('constraint.v_pos')""")
    spark.sql("INSERT INTO gcat.ns.cons SELECT * FROM cons_bad")
    assert(spark.table("gcat.ns.cons").count() == 5)
    intercept[Exception] {
      spark.sql("INSERT INTO gcat.ns.cons SELECT -1, 1.0")
    }
  }

  test("timestamp filter pushdown pins the instant in a non-UTC session") {
    // FilterSql renders pushed timestamp literals with a trailing Z:
    // Spark re-parses `TIMESTAMP '…'` in the SESSION timezone and a
    // fully-pushed filter is never re-checked, so a zoneless rendering
    // silently shifts both the SELECT and the DELETE victim set in any
    // non-UTC session.
    wh
    spark.sql("CREATE TABLE gcat.ns.tz (id BIGINT, ts TIMESTAMP)")
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    (0L until 48L).map(i =>
        (i, java.sql.Timestamp.from(t0.plusSeconds(i * 3600))))
      .toDF("id", "ts").createOrReplaceTempView("tz_src")
    spark.sql("INSERT INTO gcat.ns.tz SELECT * FROM tz_src")
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      // Australia/Eucla = UTC+08:45, no DST: the session-tz literal
      // '2024-03-02 00:00:00' is the instant 2024-03-01T15:15:00Z →
      // hour-indexed rows 16..47 survive `ts >=`
      spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
      val sel = spark.sql("""SELECT id FROM gcat.ns.tz
          WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'""")
        .as[Long].collect().toSet
      assert(sel == (16L until 48L).toSet,
        s"pushed timestamp filter shifted in a non-UTC session: $sel")
      // the connector DELETE path uses the same literal rendering
      spark.sql("""DELETE FROM gcat.ns.tz
                   WHERE ts < TIMESTAMP '2024-03-02 00:00:00'""")
      val left = spark.sql("SELECT id FROM gcat.ns.tz").as[Long].collect().toSet
      assert(left == (16L until 48L).toSet,
        s"catalog DELETE deleted the wrong instants: kept $left")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("metadata MIN/MAX refuses heterogeneous per-file stat types") {
    // two appends → two files with i64 stats on id; corrupt the second
    // entry's recorded type to f64 (what a future type-widening would
    // produce) — folding with ONE comparator would be wrong, so the
    // aggregate must fall back to a real scan and still be exact
    wh
    spark.sql("CREATE TABLE gcat.ns.mixt (id BIGINT)")
    val root = s"$wh/ns/mixt"
    GraftTable.append(spark, root, (0L until 50L).toDF("id"))
    GraftTable.append(spark, root, (50L until 100L).toDF("id"))
    val entry = new java.io.File(s"$root/_log/00000002.json")
    val json = new String(java.nio.file.Files.readAllBytes(entry.toPath), "UTF-8")
    assert(json.contains("\"t\":\"i64\""))
    java.nio.file.Files.write(entry.toPath,
      json.replace("\"t\":\"i64\"", "\"t\":\"f64\"").getBytes("UTF-8"))
    GraftTable.invalidateSnapshots() // same-length in-place edit
    val mx = spark.sql("SELECT MAX(id) AS m, MIN(id) AS n FROM gcat.ns.mixt")
    assert(!mx.queryExecution.executedPlan.toString
      .contains("metadata-only aggregate"),
      "mixed per-file stat types must refuse the metadata fast path")
    val r = mx.head
    assert(r.getLong(0) == 99L && r.getLong(1) == 0L)
  }

  test("created-empty table keeps its declared schema as the merge anchor") {
    val root = Files.createTempDirectory("graft_anchor").toString + "/t"
    GraftTable.create(spark, root,
      new StructType().add("id", LongType).add("key",
        org.apache.spark.sql.types.StringType))
    // conflicting type on a declared column refuses
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root,
        Seq(("x", 1L)).toDF("id", "key"))
    }
    GraftTable.append(spark, root, Seq((5L, "a")).toDF("id", "key"))
    assert(GraftTable.read(spark, root).columns.toSeq == Seq("id", "key"))
  }

  test("CALL restore swings the table back as one new commit; history stays travelable") {
    wh
    spark.sql("CREATE TABLE gcat.ns.rst (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 20).createOrReplaceTempView("rst_a")
    rows(100, 130).createOrReplaceTempView("rst_b")
    spark.sql("INSERT INTO gcat.ns.rst SELECT * FROM rst_a") // v1
    spark.sql("INSERT INTO gcat.ns.rst SELECT * FROM rst_b") // v2
    val v = spark.sql("CALL gcat.system.restore(`table` => 'ns.rst', " +
      "version => 1)").head.getLong(0)
    assert(v == 3L, "restore is a NEW commit on top, not a log rewind")
    assert(spark.table("gcat.ns.rst").count() == 20)
    // the pre-restore state stays time-travelable
    assert(spark.sql("SELECT * FROM gcat.ns.rst VERSION AS OF 2")
      .count() == 50)
    // timestamp route: restoring to v2's wall-clock brings the rows back
    val root = s"$wh/ns/rst"
    val t2 = GraftTable.commitTimeMs(spark, root, 2L)
    spark.sql("CALL gcat.system.restore(`table` => 'ns.rst', " +
      s"timestamp_ms => ${t2}L)")
    assert(spark.table("gcat.ns.rst").count() == 50)
    // exactly one of version/timestamp_ms
    intercept[Exception] {
      spark.sql("CALL gcat.system.restore(`table` => 'ns.rst')").collect()
    }
  }

  test("CALL clone branches zero-copy; deep_clone is self-contained; existing target refuses") {
    wh
    spark.sql("CREATE TABLE gcat.ns.cls (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 30).createOrReplaceTempView("cls_src")
    spark.sql("INSERT INTO gcat.ns.cls SELECT * FROM cls_src")
    spark.sql("CALL gcat.system.clone(source => 'ns.cls', " +
      "target => 'ns.cls_branch')")
    assert(spark.table("gcat.ns.cls_branch").count() == 30)
    // zero-copy: the branch carries no data dir of its own
    assert(!new java.io.File(s"$wh/ns/cls_branch/data").exists())
    // divergence: writes to the branch never touch the source
    spark.sql("INSERT INTO gcat.ns.cls_branch SELECT id + 500, key, v " +
      "FROM cls_src")
    assert(spark.table("gcat.ns.cls_branch").count() == 60)
    assert(spark.table("gcat.ns.cls").count() == 30)
    // deep clone at a pinned version (the branch's clone commit = v0,
    // before the divergent insert) is physically independent
    spark.sql("CALL gcat.system.deep_clone(source => 'ns.cls_branch', " +
      "target => 'ns.cls_backup', version => 0)")
    assert(spark.table("gcat.ns.cls_backup").count() == 30)
    assert(new java.io.File(s"$wh/ns/cls_backup/data").exists())
    // an existing table can never be silently overwritten by a clone
    intercept[Exception] {
      spark.sql("CALL gcat.system.clone(source => 'ns.cls', " +
        "target => 'ns.cls_backup')").collect()
    }
  }

  test("procedures: history operation column, optimize WHERE, vacuum dry_run") {
    wh
    spark.sql("CREATE TABLE gcat.ns.pops (id BIGINT, key STRING, v DOUBLE)")
    val root = s"$wh/ns/pops"
    // three disjoint-range files + one delete on the last
    GraftTable.append(spark, root, rows(0, 100).coalesce(1))
    GraftTable.append(spark, root, rows(100, 200).coalesce(1))
    GraftTable.append(spark, root, rows(300, 400).coalesce(1))
    spark.sql("DELETE FROM gcat.ns.pops WHERE id >= 390")
    // history carries the verbs
    val hist = spark.sql("CALL gcat.system.history(`table` => 'ns.pops')")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 3L).forall(hist(_) == "append"),
      s"history operations: $hist")
    assert(Set("delete", "dv_delete").contains(hist(4L)))
    // optimize WHERE: the two overlapping files merge, the id>=300
    // file (whatever the delete left it as) survives by path
    val before = GraftTable.snapshot(spark, root)
    val keep = before.files.map(_.path).toSet
    spark.sql("CALL gcat.system.optimize(`table` => 'ns.pops', " +
      "`where` => 'id < 250', target_files => 1)")
    val after = GraftTable.snapshot(spark, root)
    assert(after.files.size == before.files.size - 1,
      "two overlapping files must merge into one")
    assert(after.files.map(_.path).count(keep) == before.files.size - 2,
      "the disjoint file must survive by path")
    assert(spark.table("gcat.ns.pops").count() == 290)
    // dry_run lists the orphaned generation without deleting anything
    spark.sql("CALL gcat.system.expire_versions(`table` => 'ns.pops', " +
      "keep => 1)").collect()
    val dry = spark.sql("CALL gcat.system.vacuum(`table` => 'ns.pops', " +
      "min_age_ms => 0, dry_run => true)").collect().map(_.getString(0)).sorted
    assert(dry.nonEmpty, "expired generation must be reclaimable")
    dry.foreach(p => assert(new java.io.File(root, p).exists(),
      s"dry_run must not delete $p"))
    val real = spark.sql("CALL gcat.system.vacuum(`table` => 'ns.pops', " +
      "min_age_ms => 0)")
      .collect().map(_.getString(0)).sorted
    assert(real.toSeq == dry.toSeq, "vacuum must reclaim exactly the dry-run list")
    assert(spark.table("gcat.ns.pops").count() == 290)
  }

  test("batch change feed: format option readChangeFeed serves changes() distributed") {
    wh
    spark.sql("CREATE TABLE gcat.ns.cdfb (id BIGINT, key STRING, v DOUBLE)")
    rows(0, 40).createOrReplaceTempView("cdfb_src")
    spark.sql("INSERT INTO gcat.ns.cdfb SELECT * FROM cdfb_src")    // v1
    spark.sql("UPDATE gcat.ns.cdfb SET v = v + 1.0 WHERE id < 10")  // v2
    spark.sql("DELETE FROM gcat.ns.cdfb WHERE id >= 30")            // v3
    val root = s"$wh/ns/cdfb"
    def feed(extra: (String, String)*) = {
      var r = spark.read.format("grafttable").option("path", root)
        .option("readChangeFeed", "true")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }
    // full history ≡ the API feed
    val all = feed().collect().map(_.toSeq).toSet
    val api = GraftTable.changes(spark, root, -1L, 3L)
      .collect().map(_.toSeq).toSet
    assert(all == api)
    assert(all.nonEmpty)
    // inclusive version bounds: just the UPDATE's pair rows
    val v2 = feed("startingVersion" -> "2", "endingVersion" -> "2")
    assert(v2.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(v2.count() == 20, "10 updated rows surface as delete+insert pairs")
    // column pruning survives the bridge
    val pruned = feed("startingVersion" -> "3")
      .select("id", "_change_type").collect()
    assert(pruned.length == 10 &&
      pruned.forall(_.getString(1) == "delete"))
    // CDF + time travel is contradictory and refuses
    intercept[Exception] {
      feed("versionAsOf" -> "1").collect()
    }
  }
}

object GraftCatalogSpec {
  /** Evaluation counter for the probe generation expression. */
  val genProbe = new java.util.concurrent.atomic.AtomicLong(0L)
}
