package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.table.{GraftTable, Partitioning}
import graft.table.GraftTable.Range
import graft.table.Partitioning._

/** Hidden transform partitioning of the table format
  * ([[graft.table.Partitioning]]): write-side clustering + per-file
  * tuples, transform-mapped pruning, metadata-only partition drops,
  * dynamic-partition overwrite, interplay with DVs / compaction /
  * clones, and the SQL `PARTITIONED BY` surface.
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_part").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Days of events across 3 UTC days + a NULL-ts row. */
  private def events() = Seq(
    (1L, ts("2024-03-01 00:00:00"), "a", 10.0),
    (2L, ts("2024-03-01 23:59:59"), "b", 20.0),
    (3L, ts("2024-03-02 08:00:00"), "a", 30.0),
    (4L, ts("2024-03-03 12:00:00"), "c", 40.0),
    (5L, null.asInstanceOf[Timestamp], "a", 50.0)
  ).toDF("id", "etime", "kind", "v")

  test("partition spec evolution: metadata-only, mixed generations exact, compact migrates") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    val preEvolveVersion = GraftTable.snapshot(spark, root).version

    // evolve days(etime) -> (months(etime), kind): pure metadata
    val filesBefore = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    GraftTable.evolvePartitioning(spark, root,
      Seq(PMonths("etime"), PIdentity("kind")))
    val snap1 = GraftTable.snapshot(spark, root)
    assert(snap1.spec.map(_.describe) == Seq("months(etime)", "kind"))
    assert(snap1.files.map(_.path).toSet == filesBefore, "no file rewrites")

    // new writes cluster under the NEW spec
    GraftTable.append(spark, root, Seq(
      (6L, ts("2024-04-10 09:00:00"), "a", 60.0),
      (7L, ts("2024-04-15 10:00:00"), "b", 70.0)).toDF("id", "etime", "kind", "v"))
    val snap2 = GraftTable.snapshot(spark, root)
    val newGen = snap2.files.filterNot(f => filesBefore.contains(f.path))
    assert(newGen.nonEmpty &&
      newGen.forall(f => f.part.contains("gp_etime_month") &&
        f.part.contains("gp_kind")))

    // mixed generations read exactly; pruning stays correct (old files
    // conservative, new files prune by the new transforms)
    assert(GraftTable.read(spark, root).count() == 7)
    assert(GraftTable.scanWhere(spark, root,
      "etime >= TIMESTAMP '2024-04-01 00:00:00'").count() == 2)
    assert(GraftTable.scanWhere(spark, root,
      "etime < TIMESTAMP '2024-03-02 00:00:00'").count() == 2)

    // dynamic overwrite refuses on mixed generations — never silent drift
    intercept[IllegalArgumentException] {
      GraftTable.overwritePartitions(spark, root,
        Seq((8L, ts("2024-04-10 11:00:00"), "a", 80.0))
          .toDF("id", "etime", "kind", "v"))
    }

    // CoW DML on mixed generations stays exact (stats-proven pruning,
    // rewrite lands under the CURRENT spec)
    GraftTable.deleteWhere(spark, root, "id = 2", prune = None)
    assert(GraftTable.read(spark, root).count() == 6)
    GraftTable.append(spark, root,
      Seq((2L, ts("2024-03-01 23:59:59"), "b", 20.0))
        .toDF("id", "etime", "kind", "v")) // restore for the counts below

    // compact migrates every file to the current spec...
    GraftTable.compact(spark, root, targetFiles = 2)
    val snap3 = GraftTable.snapshot(spark, root)
    assert(snap3.files.forall(f => f.part.contains("gp_etime_month") &&
      f.part.contains("gp_kind")))
    assert(GraftTable.read(spark, root).count() == 7)
    // ...after which dynamic overwrite works under the new spec:
    // replace the (2024-04, a) partition
    GraftTable.overwritePartitions(spark, root,
      Seq((9L, ts("2024-04-20 11:00:00"), "a", 90.0))
        .toDF("id", "etime", "kind", "v"))
    val ids = GraftTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(6L) && ids.contains(9L) && ids.contains(7L))

    // time travel to the pre-evolution version still reads in full
    assert(GraftTable.read(spark, root,
      version = Some(preEvolveVersion)).count() == 5)

    // the spec string form round-trips through the parser
    assert(Partitioning.parse("months(etime), kind").map(_.describe) ==
      Seq("months(etime)", "kind"))
    assert(Partitioning.parse("days(ts), bucket(16, id)").map(_.describe) ==
      Seq("days(ts)", "bucket(16, id)"))
  }

  test("partitioned append: one tuple per file, tuple recorded in the log") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.spec.map(_.describe) == Seq("days(etime)"))
    // 3 days + the null partition = 4 files, each path carries its dir
    val parts = snap.files.map(_.part("gp_etime_day")).sorted
    val d1 = java.time.LocalDate.parse("2024-03-01").toEpochDay
    assert(parts == Seq(d1.toString, (d1 + 1).toString, (d1 + 2).toString,
      "n").sorted)
    snap.files.foreach(f => assert(f.path.contains("gp_etime_day=")))
    // content round-trips, including the NULL row
    assert(GraftTable.read(spark, root).count() == 5)
    assert(GraftTable.read(spark, root).filter($"etime".isNull).count() == 1)
  }

  test("transform pruning: day range opens only overlapping files; null partition never matches a range") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    val snap = GraftTable.snapshot(spark, root)
    val micros = ts("2024-03-02 00:00:00").toInstant
    val lo = micros.getEpochSecond * 1000000L
    // ts >= 2024-03-02: keeps day2+day3, prunes day1 AND the null file
    val kept = GraftTable.prunedFiles(snap, Range("etime", Some(lo), None))
    assert(kept.size == 2)
    assert(kept.forall(f => f.part("gp_etime_day") != "n"))
    // the scan itself returns exactly the right rows (scanWhere
    // derives the same micros range from the SQL literal)
    val got = GraftTable.scanWhere(spark, root,
      "etime >= TIMESTAMP '2024-03-02 00:00:00'")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 4L))
  }

  test("bucket pruning: a point probe opens only its bucket; write-side hash equals the driver probe") {
    val root = freshRoot()
    val df = (0L until 64L).map(i => (i, s"u$i")).toDF("uid", "name")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(PBucket("uid", 8)))
    GraftTable.append(spark, root, df)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.size == 8) // 64 uniform keys hit all 8 buckets
    (0L until 16L).foreach { probe =>
      val kept = GraftTable.prunedFiles(snap,
        Range("uid", Some(probe), Some(probe)))
      assert(kept.size == 1, s"probe $probe kept ${kept.size} files")
      // the kept bucket actually holds the key
      val got = GraftTable.scan(spark, root,
        Range("uid", Some(probe), Some(probe)))
        .filter($"uid" === probe).count()
      assert(got == 1L)
    }
    // a RANGE on a bucketed column must not prune (hash is not monotonic)
    assert(GraftTable.prunedFiles(snap,
      Range("uid", Some(0L), Some(31L))).size == 8)
  }

  test("truncate + identity transforms prune strings through the hex encoding") {
    val root = freshRoot()
    val df = Seq(("alpha", 1L), ("alpine", 2L), ("beta", 3L),
      ("gamma", 4L), ("gather", 5L)).toDF("word", "n")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(PTruncate("word", 2)))
    GraftTable.append(spark, root, df)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.map(_.part("gp_word_trunc2")).sorted ==
      Seq("al", "be", "ga").map(Partitioning.hexOf).sorted)
    // point lookup: only the 'al' prefix file opens
    val kept = GraftTable.prunedFiles(snap,
      Range("word", Some("alpha"), Some("alpha")))
    assert(kept.size == 1 &&
      kept.head.part("gp_word_trunc2") == Partitioning.hexOf("al"))
    // range beta..gz: 'be' and 'ga' files, never 'al'
    val kept2 = GraftTable.prunedFiles(snap,
      Range("word", Some("beta"), Some("gz")))
    assert(kept2.map(_.part("gp_word_trunc2")).sorted ==
      Seq("be", "ga").map(Partitioning.hexOf).sorted)
  }

  test("months/hours/years transforms: write values match driver encoding incl. pre-1970") {
    val root = freshRoot()
    val df = Seq(
      (1L, ts("1969-12-31 23:00:00")), // pre-epoch: floorDiv must round DOWN
      (2L, ts("1970-01-01 01:30:00")),
      (3L, ts("2024-02-29 13:00:00"))
    ).toDF("id", "t")
    GraftTable.createPartitioned(spark, root, df.schema,
      Seq(PMonths("t"), PHours("t")))
    GraftTable.append(spark, root, df)
    val snap = GraftTable.snapshot(spark, root)
    val byId = GraftTable.read(spark, root).select("id").as[Long].collect()
    assert(byId.sorted.toSeq == Seq(1L, 2L, 3L))
    val months = snap.files.map(_.part("gp_t_month")).sorted
    assert(months == Seq("-1", "0", (54 * 12 + 1).toString).sorted)
    val hours = snap.files.map(_.part("gp_t_hour").toLong).sorted
    assert(hours.head == -1L && hours(1) == 1L)
    // coverage proof: delete everything before 1970 drops the -1 month
    // file WITHOUT writing new data
    val commits0 = GraftTable.history(spark, root).size
    GraftTable.deleteRange(spark, root,
      Range("t", None, Some(-1L))) // micros <= -1 == strictly pre-epoch
    val hist = GraftTable.history(spark, root)
    assert(hist.size == commits0 + 1)
    val (_, adds, removes) = hist.head
    assert(adds == 0 && removes == 1, s"expected pure drop, got $hist")
    assert(GraftTable.read(spark, root).count() == 2)
  }

  test("deleteRange drops whole day partitions metadata-only") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    // delete days 1-2 entirely: both files drop, no rewrite, and the
    // day-3 + null files are untouched
    val hi = ts("2024-03-02 23:59:59").toInstant
    val hiMicros = hi.getEpochSecond * 1000000L + 999999L
    GraftTable.deleteRange(spark, root, Range("etime", None, Some(hiMicros)))
    val (_, adds, removes) = GraftTable.history(spark, root).head
    assert(adds == 0 && removes == 2)
    val left = GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted
    assert(left.toSeq == Seq(4L, 5L)) // day-3 row + null-ts row survive
  }

  test("overwritePartitions replaces exactly the incoming tuples") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    val before = GraftTable.snapshot(spark, root)
    // re-ingest day 2 with corrected values
    val patch = Seq(
      (30L, ts("2024-03-02 09:00:00"), "z", 99.0),
      (31L, ts("2024-03-02 10:00:00"), "z", 98.0)
    ).toDF("id", "etime", "kind", "v")
    GraftTable.overwritePartitions(spark, root, patch)
    val after = GraftTable.snapshot(spark, root)
    val d2 = java.time.LocalDate.parse("2024-03-02").toEpochDay.toString
    // untouched partitions keep their exact files
    val untouchedBefore = before.files.filterNot(_.part("gp_etime_day") == d2)
      .map(_.path).toSet
    val untouchedAfter = after.files.filterNot(_.part("gp_etime_day") == d2)
      .map(_.path).toSet
    assert(untouchedBefore == untouchedAfter)
    val ids = GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L, 5L, 30L, 31L))
    // idempotent replay under a txn tag
    val v = GraftTable.overwritePartitions(spark, root, patch,
      txn = Some(("opart", 1L)))
    assert(GraftTable.overwritePartitions(spark, root, patch,
      txn = Some(("opart", 1L))) == v)
  }

  test("DV delete and compaction keep partitioned identity straight") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    // merge-on-read point delete inside one partition (exercises the
    // depth-agnostic __file identity through nested tuple dirs)
    GraftTable.deleteWhereDv(spark, root, "id = 3", None)
    assert(GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    // the masked file still carries its tuple (re-added with DV)
    val snap = GraftTable.snapshot(spark, root)
    val masked = snap.files.filter(_.dv.isDefined)
    assert(masked.size == 1 && masked.head.part.contains("gp_etime_day"))
    // compaction rewrites into per-tuple files and preserves tuples
    GraftTable.compact(spark, root, targetFiles = 1)
    val snap2 = GraftTable.snapshot(spark, root)
    assert(snap2.files.forall(_.part.contains("gp_etime_day")))
    assert(GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    // pruning still engages post-compaction
    val lo = ts("2024-03-03 00:00:00").toInstant.getEpochSecond * 1000000L
    assert(GraftTable.prunedFiles(snap2,
      Range("etime", Some(lo), None)).size == 1)
  }

  test("clones inherit the partition spec") {
    val root = freshRoot()
    GraftTable.createPartitioned(spark, root, events().schema,
      Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    val shallow = freshRoot() + "/t"
    GraftTable.clone(spark, root, shallow)
    assert(GraftTable.partitionSpecOf(spark, shallow)
      .map(_.describe) == Seq("days(etime)"))
    val snap = GraftTable.snapshot(spark, shallow)
    val lo = ts("2024-03-03 00:00:00").toInstant.getEpochSecond * 1000000L
    assert(GraftTable.prunedFiles(snap,
      Range("etime", Some(lo), None)).size == 1)
    // a clone-side append stays partitioned
    GraftTable.append(spark, shallow,
      Seq((9L, ts("2024-03-04 00:00:00"), "x", 1.0))
        .toDF("id", "etime", "kind", "v"))
    assert(GraftTable.snapshot(spark, shallow).files
      .forall(_.part.contains("gp_etime_day")))
  }

  test("spec validation refuses bad specs; partition source columns are rename/drop-protected") {
    val root = freshRoot()
    val schema = events().schema
    intercept[RuntimeException] {
      GraftTable.createPartitioned(spark, root, schema,
        Seq(PDays("nope")))
    }
    intercept[IllegalArgumentException] {
      GraftTable.createPartitioned(spark, root, schema,
        Seq(PHours("kind"))) // hours over a string
    }
    intercept[IllegalArgumentException] {
      GraftTable.createPartitioned(spark, root, schema,
        Seq(PDays("etime"), PDays("etime"))) // duplicate
    }
    GraftTable.createPartitioned(spark, root, schema, Seq(PDays("etime")))
    GraftTable.append(spark, root, events())
    intercept[IllegalArgumentException] {
      GraftTable.renameColumn(spark, root, "etime", "etime2")
    }
    intercept[IllegalArgumentException] {
      GraftTable.dropColumn(spark, root, "etime")
    }
    // an append missing the partition source column refuses clearly
    val err = intercept[IllegalArgumentException] {
      GraftTable.append(spark, root,
        Seq((7L, "q", 1.0)).toDF("id", "kind", "v"))
    }
    assert(err.getMessage.contains("partition source column"))
  }

  test("SQL surface: PARTITIONED BY DDL, pruning, dynamic INSERT OVERWRITE") {
    val dir = Files.createTempDirectory("graft_pwh").toString
    spark.conf.set("spark.sql.catalog.pcat", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcat.ns")
    spark.sql("""CREATE TABLE pcat.ns.ev (
        id BIGINT, etime TIMESTAMP, kind STRING, v DOUBLE)
      PARTITIONED BY (days(etime), bucket(4, id))""")
    // DESCRIBE surfaces the spec
    val props = spark.sql("SHOW TBLPROPERTIES pcat.ns.ev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partition.spec") == "days(etime), bucket(4, id)")
    events().createOrReplaceTempView("ev_src")
    spark.sql("INSERT INTO pcat.ns.ev SELECT * FROM ev_src")
    assert(spark.table("pcat.ns.ev").count() == 5)
    // file pruning through SQL: one day + one bucket
    val root = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir, "ns"), "ev").toString
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.forall(f =>
      f.part.contains("gp_etime_day") && f.part.contains("gp_id_bucket4")))
    val one = spark.sql(
      """SELECT id FROM pcat.ns.ev
         WHERE etime >= TIMESTAMP '2024-03-03 00:00:00 Z' AND id = 4""")
    assert(one.as[Long].collect().toSeq == Seq(4L))
    // slice re-ingestion via SQL: REPLACE WHERE on the partition
    // predicate is the SQL spelling of dynamic overwrite (Spark has
    // no V1-fallback exec for OverwritePartitionsDynamic, so the
    // dynamic verb lives on the API — see GraftWriteBuilder's note)
    spark.sql(
      """INSERT INTO pcat.ns.ev
         REPLACE WHERE etime >= TIMESTAMP '2024-03-03 00:00:00 Z'
         SELECT 40L, TIMESTAMP '2024-03-03 15:00:00 Z', 'r', 4.5D""")
    assert(spark.table("pcat.ns.ev").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 5L, 40L))
    // static INSERT OVERWRITE still replaces the whole table
    spark.sql("INSERT OVERWRITE pcat.ns.ev SELECT * FROM ev_src")
    assert(spark.table("pcat.ns.ev").count() == 5)
    // unsupported transform refused at create
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE pcat.ns.bad (id BIGINT, s STRING)
        PARTITIONED BY (sort(s))""")
    }
    assert(e.getMessage.contains("transform"))
  }
}
