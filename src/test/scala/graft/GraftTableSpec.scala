package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable
import graft.table.GraftTable.Range

/** The ACID contract of the transaction-log table format: atomic
  * commits, snapshot isolation, time travel, zone-map skipping,
  * copy-on-write delete, compaction, schema evolution, checkpointed
  * replay, exactly-once streaming appends, conflict detection, and
  * orphan vacuum.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_table").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"k$i", i * 10.0)).toDF("id", "key", "v")

  test("widenColumn: lossless numeric widening, old files promote at read") {
    import org.apache.spark.sql.types._
    val root = freshRoot()
    val narrow = Seq((1, 1.5f), (2, 2.5f)).toDF("n", "x")
    GraftTable.append(spark, root, narrow)
    GraftTable.widenColumn(spark, root, "n", LongType)
    GraftTable.widenColumn(spark, root, "x", DoubleType)
    // new writes land wide; old INT32/FLOAT files read under the
    // widened logical schema
    GraftTable.append(spark, root,
      Seq((3_000_000_000L, 9.25)).toDF("n", "x"))
    val df = GraftTable.read(spark, root)
    assert(df.schema("n").dataType == LongType)
    assert(df.schema("x").dataType == DoubleType)
    val got = df.orderBy("n").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3_000_000_000L, 9.25)))
    // zone-map pruning still serves the widened column (homogeneous
    // "i64" stats across narrow and wide files)
    assert(GraftTable.scanWhere(spark, root, "n >= 3000000000").count() == 1)
    // refusals: narrowing, cross-class, non-numeric
    intercept[IllegalArgumentException] {
      GraftTable.widenColumn(spark, root, "n", IntegerType)
    }
    intercept[IllegalArgumentException] {
      GraftTable.widenColumn(spark, root, "n", DoubleType)
    }
    // DML on the widened column stays exact (CoW rewrite reads
    // promoted old files)
    GraftTable.deleteWhere(spark, root, "n = 2", prune = None)
    assert(GraftTable.read(spark, root).count() == 2)
  }

  test("append/read: versions advance, content accumulates, time travel works") {
    val root = freshRoot()
    val v0 = GraftTable.append(spark, root, rows(0, 50))
    val v1 = GraftTable.append(spark, root, rows(50, 80))
    assert(v0 == 0 && v1 == 1)
    assert(GraftTable.read(spark, root).count() == 80)
    assert(GraftTable.read(spark, root, Some(0)).count() == 50)
    assert(GraftTable.read(spark, root, Some(0))
      .agg(sum("id")).head.getLong(0) == (0L until 50).sum)
    intercept[IllegalArgumentException] {
      GraftTable.read(spark, root, Some(7))
    }
  }

  test("snapshot isolation: a reader pinned to an old snapshot never sees later writes") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    val pinned = GraftTable.snapshot(spark, root)
    GraftTable.overwrite(spark, root, rows(100, 400))
    // data files are immutable; the pinned file list still reads v0
    assert(pinned.files.map(_.rows).sum == 10)
    assert(GraftTable.read(spark, root, Some(pinned.version)).count() == 10)
    assert(GraftTable.read(spark, root).count() == 300)
  }

  test("overwrite replaces atomically; history records adds and removes") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    GraftTable.overwrite(spark, root, rows(0, 5))
    assert(GraftTable.read(spark, root).count() == 5)
    val h = GraftTable.history(spark, root)
    assert(h.map(_._1) == Seq(1L, 0L))
    assert(h.head._3 > 0, "the overwrite must record removes")
  }

  test("zone-map skipping: disjoint-range files are not even candidates") {
    val root = freshRoot()
    // four appends with disjoint id ranges, one file each
    Seq((0L, 100L), (100L, 200L), (200L, 300L), (300L, 400L)).foreach {
      case (lo, hi) =>
        GraftTable.append(spark, root, rows(lo, hi).coalesce(1))
    }
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.size == 4)
    val pruned = GraftTable.prunedFiles(snap, Range("id", Some(120L), Some(130L)))
    assert(pruned.size == 1, s"expected 1 candidate file, got ${pruned.size}")
    val got = GraftTable.scan(spark, root, Range("id", Some(120L), Some(130L)))
      .agg(count(lit(1)), sum("id")).head
    assert(got.getLong(0) == 11 && got.getLong(1) == (120L to 130L).sum)
    // string zone maps prune too (k1xx sorts between k0xx and k2xx);
    // bounds chosen inside k1's span
    val sPruned = GraftTable.prunedFiles(snap, Range("key", Some("k120"), Some("k125")))
    assert(sPruned.size < 4 && sPruned.nonEmpty)
  }

  test("copy-on-write delete rewrites only files that can match") {
    val root = freshRoot()
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      GraftTable.append(spark, root, rows(lo, hi).coalesce(1))
    }
    val before = GraftTable.snapshot(spark, root)
    GraftTable.deleteWhere(spark, root, "id >= 150 AND id < 160",
      Some(Range("id", Some(150L), Some(159L))))
    val after = GraftTable.snapshot(spark, root)
    assert(GraftTable.read(spark, root).count() == 290)
    assert(GraftTable.read(spark, root)
      .filter("id >= 150 and id < 160").count() == 0)
    val untouched = before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(untouched.size == 2,
      "files whose zone maps prove no match must survive the delete untouched")
  }

  test("compaction: content-identical, fewer files, one atomic swap") {
    val root = freshRoot()
    (0 until 6).foreach(i =>
      GraftTable.append(spark, root, rows(i * 10L, i * 10L + 10).coalesce(1)))
    val before = GraftTable.read(spark, root)
      .agg(count(lit(1)), sum("id"), sum("v")).head
    GraftTable.compact(spark, root, targetFiles = 1)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.size == 1)
    val after = GraftTable.read(spark, root)
      .agg(count(lit(1)), sum("id"), sum("v")).head
    assert(before == after)
  }

  test("schema evolution: appended column reads as null over old files") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    GraftTable.append(spark, root,
      rows(10, 20).withColumn("lang", concat(lit("l"), col("id") % 3)))
    val df = GraftTable.read(spark, root)
    assert(df.columns.toSeq == Seq("id", "key", "v", "lang"))
    assert(df.filter(col("lang").isNull).count() == 10)
    assert(df.filter(col("lang").isNotNull).count() == 10)
    intercept[IllegalArgumentException] {
      GraftTable.append(spark, root,
        rows(0, 1).withColumn("v", lit("not-a-double")))
    }
  }

  test("checkpoint: replay from the checkpoint equals replay from zero") {
    val root = freshRoot()
    (0 until 12).foreach(i =>
      GraftTable.append(spark, root, rows(i * 5L, i * 5L + 5).coalesce(1)))
    val ckpt = new java.io.File(s"$root/_log/00000010.ckpt.json")
    assert(ckpt.exists(), "a checkpoint must land at version 10")
    val full = GraftTable.snapshot(spark, root)
    assert(full.version == 11 && full.files.size == 12)
    assert(GraftTable.read(spark, root).count() == 60)
    // time travel BEHIND the checkpoint still replays from zero
    assert(GraftTable.read(spark, root, Some(3)).count() == 20)
  }

  test("exactly-once txn appends: a re-delivered batch is a no-op") {
    val root = freshRoot()
    val v0 = GraftTable.append(spark, root, rows(0, 10), txn = Some(("app1", 0L)))
    val v1 = GraftTable.append(spark, root, rows(10, 20), txn = Some(("app1", 1L)))
    // foreachBatch re-delivery after a crash: same app, same batch
    val vR = GraftTable.append(spark, root, rows(10, 20), txn = Some(("app1", 1L)))
    assert(v0 == 0 && v1 == 1 && vR == 1, "replayed batch must not commit")
    assert(GraftTable.read(spark, root).count() == 20)
    // a different app's batch 1 is independent
    GraftTable.append(spark, root, rows(20, 25), txn = Some(("app2", 1L)))
    assert(GraftTable.read(spark, root).count() == 25)
  }

  test("commit conflict: a lost race is detected and retried, no commit lost") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    // simulate a racing writer landing version 1 between this writer's
    // snapshot and its rename: pre-create the destination name
    val racer = new java.io.File(s"$root/_log/00000001.json")
    val entry = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$root/_log/00000000.json").toPath))
    java.nio.file.Files.write(racer.toPath,
      entry.replace("\"version\":0", "\"version\":1").getBytes)
    // this append must detect the occupied slot and commit at version 2
    val v = GraftTable.append(spark, root, rows(10, 20))
    assert(v == 2, s"loser must retry at the next version, got $v")
    // the racer re-adds v0's file paths (keyed dedup) → 10 + 10 new rows
    assert(GraftTable.read(spark, root).count() == 20,
      "the racer's commit and the retried append must both survive")
  }

  test("vacuum grace spares in-flight commits: racing append/vacuum loses nothing") {
    // the race: a writer stages data files BEFORE its log entry
    // publishes, so to a zero-grace vacuum they look like orphans.
    // The default grace must make the race safe.
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    // mechanism: a staged-but-unpublished file is spared by the
    // default grace, swept only under the explicit 0 override
    val staged = new java.io.File(s"$root/data/inflight-uuid/part-0.parquet")
    staged.getParentFile.mkdirs()
    java.nio.file.Files.write(staged.toPath, Array[Byte](1, 2, 3))
    assert(GraftTable.vacuum(spark, root).isEmpty,
      "default grace must spare a just-staged file")
    assert(staged.exists())
    // stress: appends racing a default-grace sweeper — every commit
    // and every referenced file must survive
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sweeper = Future {
      val swept = Seq.newBuilder[String]
      while (!stop.get) {
        swept ++= GraftTable.vacuum(spark, root)
        Thread.sleep(2)
      }
      swept.result()
    }
    for (i <- 1 to 12)
      GraftTable.append(spark, root, rows(i * 100L, i * 100L + 10))
    stop.set(true)
    val swept = Await.result(sweeper, 60.seconds)
    assert(!swept.exists(_.startsWith("data/data")) && swept.isEmpty,
      s"racing sweeps must reclaim nothing young: $swept")
    assert(GraftTable.read(spark, root).count() == 130,
      "every racing append must survive the sweeper")
    val snap = GraftTable.snapshot(spark, root)
    snap.files.foreach(f =>
      assert(new java.io.File(root, f.path).exists(),
        s"logged file swept from under a commit: ${f.path}"))
    // the explicit override still reclaims the true orphan
    assert(GraftTable.vacuum(spark, root, minAgeMs = 0L)
      .contains("data/inflight-uuid/part-0.parquet"))
  }

  test("vacuum removes only unreachable files; time travel stays valid") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    GraftTable.overwrite(spark, root, rows(0, 5))
    // orphan: a data dir written but never committed (lost race debris)
    val orphanDir = new java.io.File(s"$root/data/orphan-uuid")
    orphanDir.mkdirs()
    val orphan = new java.io.File(orphanDir, "part-00000.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val removed = GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(removed == Seq("data/orphan-uuid/part-00000.parquet"))
    assert(!orphan.exists())
    // every retained version still reads (removed files were unreferenced)
    assert(GraftTable.read(spark, root, Some(0)).count() == 10)
    assert(GraftTable.read(spark, root).count() == 5)
  }

  test("merge: file-level copy-on-write — provably-disjoint files survive untouched") {
    val root = freshRoot()
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      GraftTable.append(spark, root, rows(lo, hi).coalesce(1))
    }
    val changes = Seq(
      (150L, "k150x", 999.0, 1L, "U"), // update, lands in file 2
      (155L, "k155", 0.0, 1L, "D"),    // tombstone, file 2
      (1000L, "k1000", 7.0, 1L, "I")   // brand-new key: insert
    ).toDF("id", "key", "v", "version", "op")
    val reference = graft.operators.Merge
      .applyChangelog(GraftTable.read(spark, root), changes,
        Seq("id"), "version", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val before = GraftTable.snapshot(spark, root)
    GraftTable.merge(spark, root, changes, Seq("id"), "version", "op")
    val after = GraftTable.snapshot(spark, root)
    val got = GraftTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == reference, "table merge must equal the operator semantics")
    assert(got.exists(_._1 == 1000L) && !got.exists(_._1 == 155L) &&
      got.exists(t => t._1 == 150L && t._3 == 999.0))
    // file 1 ([0,100)) is disjoint from the change range [150, 1000]
    val untouched = before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(untouched.size == 1,
      s"exactly the provably-unaffected file must survive, got $untouched")
  }

  test("zorderBy: two-dimensional clustering makes zone maps prune on both columns") {
    val root = freshRoot()
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64))
      .toDF("id", "x", "y").repartition(8) // hash layout: every file spans both dims
    GraftTable.append(spark, root, grid)
    val flat = GraftTable.snapshot(spark, root)
    val yProbe = GraftTable.Range("y", Some(0L), Some(3L))
    assert(GraftTable.prunedFiles(flat, yProbe).size == flat.files.size,
      "hash layout must not prune (the premise of the re-cluster)")
    val before = GraftTable.read(spark, root)
      .agg(count(lit(1)), sum("id")).head
    GraftTable.zorderBy(spark, root, "x", "y", targetFiles = 8)
    val z = GraftTable.snapshot(spark, root)
    assert(z.files.size == 8)
    val prunedY = GraftTable.prunedFiles(z, yProbe)
    val prunedX = GraftTable.prunedFiles(z, GraftTable.Range("x", Some(0L), Some(3L)))
    assert(prunedY.size < z.files.size,
      s"z-order must tighten y zone maps, still ${prunedY.size} candidates")
    assert(prunedX.size < z.files.size,
      s"z-order must tighten x zone maps, still ${prunedX.size} candidates")
    val after = GraftTable.read(spark, root)
      .agg(count(lit(1)), sum("id")).head
    assert(before == after, "re-clustering must be content-identical")
    val got = GraftTable.scan(spark, root, yProbe)
      .agg(count(lit(1))).head.getLong(0)
    assert(got == 4 * 64, "pruned scan must still return every matching row")
    // conjunction: the x∧y rectangle prunes at least as hard as either
    // dimension alone and returns exactly the intersection
    val xProbe = GraftTable.Range("x", Some(0L), Some(3L))
    val both = GraftTable.prunedFilesAll(z, Seq(xProbe, yProbe))
    assert(both.size <= math.min(prunedX.size, prunedY.size))
    val rect = GraftTable.scanAll(spark, root, Seq(xProbe, yProbe))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rect == (for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)).toSet,
      "conjunctive scan must return exactly the query rectangle")
  }

  test("a table on an object store: commits, time travel, CoW delete through the FileSystem API") {
    // The whole lifecycle under a mocks3:// root — log IO, data writes,
    // footer-stats harvesting, and snapshot replay all resolve through
    // the Hadoop FileSystem for the path's scheme, exactly as s3a://
    // or hdfs:// would. A java.io/java.nio assumption anywhere in the
    // stack fails this test.
    sources.Sources.configureCloud(spark, Map(
      "fs.mocks3.impl" -> classOf[MockObjectStoreFs].getName))
    val local = Files.createTempDirectory("graft_table_cloud").toString
    val root = s"mocks3://bucket$local"
    GraftTable.append(spark, root, rows(0, 50).coalesce(1))
    GraftTable.append(spark, root, rows(50, 100).coalesce(1))
    assert(GraftTable.read(spark, root).count() == 100)
    assert(GraftTable.read(spark, root, Some(0)).count() == 50)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.forall(_.stats.contains("id")),
      "footer zone maps must be harvested through the remote FS too")
    GraftTable.deleteWhere(spark, root, "id >= 90",
      Some(GraftTable.Range("id", Some(90L), None)))
    val after = GraftTable.snapshot(spark, root)
    assert(GraftTable.read(spark, root).count() == 90)
    assert(after.files.map(_.path).toSet
      .intersect(snap.files.map(_.path).toSet).size == 1,
      "the provably-unaffected file must survive the remote CoW delete")
  }

  test("change feed: appends insert, CoW delete deletes, merge emits update pairs, re-layout is silent") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 100).coalesce(1))     // v0
    GraftTable.append(spark, root, rows(100, 150).coalesce(1))   // v1
    GraftTable.deleteWhere(spark, root, "id < 10",
      Some(Range("id", None, Some(9L))))                         // v2
    val changes = Seq((120L, "k120x", 7.0, 1L, "U"),
      (1000L, "k1000", 1.0, 1L, "I")).toDF("id", "key", "v", "version", "op")
    GraftTable.merge(spark, root, changes, Seq("id"), "version", "op") // v3
    GraftTable.compact(spark, root, targetFiles = 1)             // v4
    def feed(lo: Long, hi: Long) = GraftTable.changes(spark, root, lo, hi)
      .collect().map(r => (r.getAs[Long]("_commit_version"),
        r.getAs[String]("_change_type"), r.getAs[Long]("id"),
        r.getAs[String]("key"))).toSet
    // v1: pure append → exactly the appended rows as inserts
    assert(feed(0, 1) == (100L until 150L)
      .map(i => (1L, "insert", i, s"k$i")).toSet)
    // v2: CoW delete → exactly the deleted rows; carried-over rows cancel
    assert(feed(1, 2) == (0L until 10L)
      .map(i => (2L, "delete", i, s"k$i")).toSet)
    // v3: update = delete-old + insert-new pair; pure insert stands alone
    assert(feed(2, 3) == Set((3L, "delete", 120L, "k120"),
      (3L, "insert", 120L, "k120x"), (3L, "insert", 1000L, "k1000")))
    // v4: compaction rewrites everything, changes nothing
    assert(feed(3, 4).isEmpty, "a layout-only commit must emit no changes")
    // the whole range composes; an empty range is an empty frame
    assert(feed(0, 4).size == 50 + 10 + 3)
    assert(feed(2, 2).isEmpty)
  }

  test("restore: metadata-only content reset; history in between stays time-travelable") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 30))                  // v0
    GraftTable.overwrite(spark, root, rows(100, 105))            // v1
    GraftTable.append(spark, root, rows(105, 110))               // v2
    val dataDirs = new java.io.File(s"$root/data").list().length
    val v = GraftTable.restore(spark, root, 0L)                  // v3
    assert(v == 3)
    // no data written or deleted: same data dirs, old files re-referenced
    assert(new java.io.File(s"$root/data").list().length == dataDirs,
      "restore must not write data files")
    assert(GraftTable.read(spark, root).collect().toSet ==
      GraftTable.read(spark, root, Some(0L)).collect().toSet)
    assert(GraftTable.read(spark, root, Some(2L)).count() == 10,
      "intermediate versions must stay readable after restore")
    // the restore surfaces in the change feed as the content diff
    val feed = GraftTable.changes(spark, root, 2, 3)
    assert(feed.filter("_change_type = 'insert'").count() == 30)
    assert(feed.filter("_change_type = 'delete'").count() == 10)
    // restoring to the current content is a no-op commit
    assert(GraftTable.restore(spark, root, 3L) == 3L)
    // vacuum after restore keeps every referenced file readable
    assert(GraftTable.vacuum(spark, root, minAgeMs = 0L).isEmpty)
    assert(GraftTable.read(spark, root).count() == 30)
    // restoreAsOf: the clock spelling resolves through versionAt —
    // "now" maps to the tip, so restoring to it is the same no-op
    assert(GraftTable.restoreAsOf(spark, root,
      System.currentTimeMillis() + 60000) == 3L)
  }

  test("restoreAsOf: clock instant between commits restores the earlier state") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 30))        // v0
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    GraftTable.overwrite(spark, root, rows(100, 105))  // v1
    val v = GraftTable.restoreAsOf(spark, root, between)
    assert(v == 2L)
    assert(GraftTable.read(spark, root).collect().toSet ==
      GraftTable.read(spark, root, Some(0L)).collect().toSet,
      "restoreAsOf must land on the state the instant saw")
  }

  test("appendsSince: incremental consumption; refuses ranges with removals") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    GraftTable.append(spark, root, rows(20, 30))
    val (d1, v1) = GraftTable.appendsSince(spark, root, -1L)
    assert(d1.count() == 30 && v1 == 1)
    val (d2, v2) = GraftTable.appendsSince(spark, root, v1)
    assert(d2.count() == 0 && v2 == 1, "caught-up consumer sees nothing")
    GraftTable.append(spark, root, rows(30, 35))
    val (d3, v3) = GraftTable.appendsSince(spark, root, v1)
    assert(d3.agg(sum("id")).head.getLong(0) == (30L until 35).sum && v3 == 2)
    GraftTable.deleteWhere(spark, root, "id < 5", Some(Range("id", None, Some(4L))))
    intercept[IllegalArgumentException] {
      GraftTable.appendsSince(spark, root, v3)
    }
    // appends AFTER the removal consume fine from a fresh re-sync point
    GraftTable.append(spark, root, rows(35, 40))
    val (d4, v4) = GraftTable.appendsSince(spark, root, 3L)
    assert(d4.count() == 5 && v4 == 4)
  }

  test("compactSmall by BYTES: the logged size gates what rows can't see") {
    val root = freshRoot()
    for (lo <- Seq(0L, 100L, 200L))
      GraftTable.append(spark, root, rows(lo, lo + 10).coalesce(1))
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.forall(_.bytes > 0), "writes must record file sizes")
    // rows threshold 1 qualifies nothing; bytes disabled → no-op
    val v0 = snap.version
    assert(GraftTable.compactSmall(spark, root, minRows = 1L) == v0)
    // byte gate alone compacts all three tiny files
    val v1 = GraftTable.compactSmall(spark, root, minRows = 1L,
      minBytes = 10L << 20)
    assert(v1 > v0)
    val after = GraftTable.snapshot(spark, root)
    assert(after.files.size == 1 && after.files.head.bytes > 0)
    assert(GraftTable.read(spark, root).count() == 30)
  }

  test("compactSmall: only under-sized files rewrite; big files survive; CDC silent") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 5000).coalesce(1)) // one big file
    (0 until 4).foreach(i =>
      GraftTable.append(spark, root, rows(5000 + i * 10L, 5000 + i * 10L + 10)
        .coalesce(1))) // four 10-row files
    val before = GraftTable.snapshot(spark, root)
    val v = GraftTable.compactSmall(spark, root, minRows = 100)
    val after = GraftTable.snapshot(spark, root)
    assert(after.files.size == 2, s"big + one merged, got ${after.files.size}")
    val survived = before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(survived.size == 1 &&
      before.files.find(f => survived(f.path)).get.rows == 5000,
      "the adequately-sized file must survive by reference")
    assert(GraftTable.read(spark, root).count() == 5040)
    // layout-only: the change feed must see nothing
    assert(GraftTable.changes(spark, root, v - 1, v).isEmpty)
    // caught-up: a second pass with nothing to merge is a commit no-op
    assert(GraftTable.compactSmall(spark, root, minRows = 100) == v)
  }

  test("expireVersions: log stays O(retention), retained tail replays, reclaimed files vacuum") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 40).coalesce(1))     // v0
    GraftTable.append(spark, root, rows(40, 80).coalesce(1))    // v1
    GraftTable.overwrite(spark, root, rows(100, 160).coalesce(1)) // v2 strands v0/v1 files
    (0 until 12).foreach(i =>                                   // v3..v14
      GraftTable.append(spark, root, rows(200 + i * 5L, 205 + i * 5L).coalesce(1)))
    val expired = GraftTable.expireVersions(spark, root, keepLast = 3)
    assert(expired == (0L to 11L), s"got $expired")
    // anchor checkpoint at the cutoff; retained versions replay
    assert(new java.io.File(s"$root/_log/00000012.ckpt.json").exists())
    assert(GraftTable.read(spark, root).count() == 60 + 12 * 5)
    assert(GraftTable.read(spark, root, Some(12L)).count() == 60 + 10 * 5)
    intercept[IllegalArgumentException] {
      GraftTable.read(spark, root, Some(5L)) // expired
    }
    // vacuum reclaims ONLY files exclusive to expired versions: the
    // overwrite's strands (v0/v1 data) go, everything live stays
    val removed = GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(removed.size == 2, s"the two stranded pre-overwrite files, got $removed")
    assert(GraftTable.read(spark, root).count() == 60 + 12 * 5)
    assert(GraftTable.read(spark, root, Some(12L)).count() == 60 + 10 * 5,
      "time travel within retention must survive vacuum")
    // the log directory itself is bounded by the retention window
    val entries = new java.io.File(s"$root/_log").list()
      .count(_.matches("\\d{8}\\.json"))
    assert(entries == 3, s"retained entries only, got $entries")
    // per-commit readers over an expired range fail with the
    // contract's message, not a raw missing-file error
    val e = intercept[IllegalArgumentException] {
      GraftTable.changes(spark, root, 8, 13)
    }
    assert(e.getMessage.contains("expired by retention"))
    assert(GraftTable.changes(spark, root, 12, 14).count() == 10,
      "per-commit changes inside the retention window still work")
  }

  test("concurrent writers: N racing appenders all land, no commit lost, versions dense") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futs = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = GraftTable.append(spark, root,
            rows(1000L + w * 100, 1000L + w * 100 + 100).coalesce(1))
        })
      }
      val versions = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // optimistic concurrency: every writer won SOME version, all
      // distinct, log dense 1..N — losers retried, nobody clobbered
      assert(versions.toSet.size == writers, s"duplicate versions: $versions")
      assert(versions.sorted == (1L to writers.toLong), s"got $versions")
    } finally pool.shutdown()
    assert(GraftTable.read(spark, root).count() == 10 + writers * 100,
      "every concurrent append's rows must survive")
    // lost-race data-file orphans (from retried attempts) are the only
    // reclaimable debris, and reads are unaffected afterwards
    GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(GraftTable.read(spark, root).count() == 10 + writers * 100)
  }

  test("streaming foreachBatch appends are exactly-once across restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val base = Files.createTempDirectory("gt_stream")
    val (inDir, ckpt, root) = (s"$base/in", s"$base/ckpt", s"$base/table")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$inDir/b*")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          GraftTable.append(spark, root, b, txn = Some(("gt_stream", id))); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    Seq(1L -> "a", 2L -> "b").toDF("id", "v")
      .coalesce(1).write.parquet(s"$inDir/b1")
    runOnce()
    Seq(3L -> "c").toDF("id", "v").coalesce(1).write.parquet(s"$inDir/b2")
    runOnce() // second life from the same checkpoint: batch 0 not replayed
    assert(GraftTable.read(spark, root).count() == 3)
    // crash window: append landed but the checkpoint didn't — the
    // restarted query re-delivers the batch id; the txn ledger absorbs it
    val vBefore = GraftTable.snapshot(spark, root).version
    GraftTable.append(spark, root, Seq(3L -> "c").toDF("id", "v"),
      txn = Some(("gt_stream", 1L)))
    assert(GraftTable.snapshot(spark, root).version == vBefore,
      "a re-delivered batch must be a commit no-op")
    assert(GraftTable.read(spark, root).count() == 3)
  }

  test("vacuum keeps files referenced only by a retained entry's removes") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 40).coalesce(1))   // v0: file fA
    GraftTable.append(spark, root, rows(40, 60).coalesce(1))  // v1
    // v2: CoW delete touches fA (removes it, adds the rewritten file)
    GraftTable.deleteWhere(spark, root, "id < 5",
      Some(Range("id", None, Some(4L))))
    GraftTable.append(spark, root, rows(100, 110).coalesce(1)) // v3
    // retention drops v0/v1's entries; cutoff checkpoint reflects state
    // AFTER v2, so it does NOT list fA — the only remaining reference
    // to fA is v2's retained `removes`
    assert(GraftTable.expireVersions(spark, root, keepLast = 2) == Seq(0L, 1L))
    GraftTable.vacuum(spark, root, minAgeMs = 0L)
    // changes over the retained v2 must still read BOTH sides of the
    // CoW (the doc contract: vacuum keeps every log-referenced file
    // alive) — before the fix, fA was reclaimed and this threw a raw
    // parquet FileNotFound
    val dels = GraftTable.changes(spark, root, 1, 2)
      .filter(col("_change_type") === "delete")
    assert(dels.count() == 5, "the five CoW-deleted rows must surface")
    assert(GraftTable.read(spark, root).count() == 40 - 5 + 20 + 10)
  }

  test("expireVersions asking to retain more than remains is a no-op, not a crash") {
    val root = freshRoot()
    (0 until 7).foreach(i =>
      GraftTable.append(spark, root, rows(i * 10L, i * 10L + 10).coalesce(1)))
    assert(GraftTable.expireVersions(spark, root, keepLast = 2)
      == (0L to 4L)) // cutoff 5
    // a LARGER retention window than what survives: cutoff' = 1 < 5 —
    // the maintenance call must no-op (the checkpoint at an expired
    // version cannot be rebuilt), not crash
    assert(GraftTable.expireVersions(spark, root, keepLast = 6) == Nil)
    assert(GraftTable.read(spark, root).count() == 70)
    assert(GraftTable.read(spark, root, Some(5L)).count() == 60)
  }

  test("racing appenders on the object store commit through conditional put, none lost") {
    // the object-store ACID story: no atomic rename exists, so the
    // publish goes through the LogStore conditional-create (the S3
    // If-None-Match:* shape) — 6 threads race on a mocks3:// table
    // and every commit must land at a dense distinct version
    import graft.table.{ExclusiveCreateLogStore, LogStore}
    sources.Sources.configureCloud(spark, Map(
      "fs.mocks3.impl" -> classOf[MockObjectStoreFs].getName))
    LogStore.register("mocks3", ExclusiveCreateLogStore)
    val local = Files.createTempDirectory("graft_table_condput").toString
    val root = s"mocks3://bucket$local"
    GraftTable.append(spark, root, rows(0, 10))
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futs = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = GraftTable.append(spark, root,
            rows(1000L + w * 100, 1000L + w * 100 + 100).coalesce(1))
        })
      }
      val versions = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet.size == writers, s"duplicate versions: $versions")
      assert(versions.sorted == (1L to writers.toLong), s"got $versions")
    } finally pool.shutdown()
    assert(GraftTable.read(spark, root).count() == 10 + writers * 100,
      "every racing append's rows must survive on the object store")
    GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(GraftTable.read(spark, root).count() == 10 + writers * 100)
    assert(GraftTable.read(spark, root, Some(0L)).count() == 10,
      "time travel across conditional-put commits")
  }

  test("readers race retention: snapshots never surface a raw missing-entry error") {
    val root = freshRoot()
    (0 until 6).foreach(i =>
      GraftTable.append(spark, root, rows(i * 10L, i * 10L + 10).coalesce(1)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    try {
      // reader thread: continuous latest-snapshot construction while
      // the main thread appends and expires — the expiry window
      // (checkpoint landed, entries not yet all deleted) must be
      // absorbed by snapshot()'s one re-list retry
      val reader = pool.submit(new Runnable {
        def run(): Unit = while (!stop.get()) {
          try {
            val s = GraftTable.snapshot(spark, root)
            assert(s.version >= 5)
          } catch { case t: Throwable => failure.set(t); stop.set(true) }
        }
      })
      (6 until 26).foreach { i =>
        GraftTable.append(spark, root, rows(i * 10L, i * 10L + 10).coalesce(1))
        GraftTable.expireVersions(spark, root, keepLast = 3)
      }
      stop.set(true)
      reader.get(60, java.util.concurrent.TimeUnit.SECONDS)
    } finally { stop.set(true); pool.shutdown() }
    assert(failure.get() == null,
      s"reader failed during concurrent retention: ${failure.get()}")
    assert(GraftTable.read(spark, root).count() == 260)
  }

  test("historyOps: every commit records its operation verb and wall-clock") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    GraftTable.append(spark, root, rows(20, 40))
    GraftTable.deleteWhereAuto(spark, root, "id >= 35")
    GraftTable.compact(spark, root, targetFiles = 1)
    GraftTable.restore(spark, root, 1L)
    val h = GraftTable.historyOps(spark, root) // newest first
    assert(h.map(_._3) ==
      Seq("restore", "compact", "delete", "append", "append"),
      s"operation verbs: ${h.map(_._3)}")
    assert(h.forall(_._2 > 0L), "every commit carries its wall-clock")
    // the compat surface is a projection of the same rows
    assert(GraftTable.history(spark, root) ==
      h.map { case (v, _, _, a, r) => (v, a, r) })
  }

  test("compactWhere: only predicate-overlapping files rewrite; disjoint survive by path") {
    val root = freshRoot()
    // four single-file appends with disjoint id ranges
    Seq((0L, 100L), (100L, 200L), (200L, 300L), (300L, 400L)).foreach {
      case (lo, hi) =>
        GraftTable.append(spark, root, rows(lo, hi).coalesce(1))
    }
    val before = GraftTable.snapshot(spark, root)
    assert(before.files.size == 4)
    val keep = before.files.map(_.path).toSet
    GraftTable.compactWhere(spark, root, "id < 150", targetFiles = 1)
    val after = GraftTable.snapshot(spark, root)
    // files 3 and 4 (ids 200+) are provably disjoint and survive by path
    val survivors = after.files.map(_.path).filter(keep)
    assert(survivors.size == 2,
      s"expected 2 untouched files, got ${after.files.map(_.path)}")
    assert(after.files.size == 3, "two overlapping files merged into one")
    // content bit-identical
    assert(GraftTable.read(spark, root).orderBy("id")
      .collect().toSeq == rows(0, 400).orderBy("id").collect().toSeq)
    // layout-only: the change feed is silent
    assert(GraftTable.changes(spark, root,
      before.version, after.version).isEmpty)
    // fewer than two overlapping files = commit no-op
    val v = GraftTable.compactWhere(spark, root, "id >= 300", 1)
    assert(v == after.version, "single-file overlap must not commit")
    // a predicate no zone map can scope refuses instead of silently
    // compacting everything
    intercept[IllegalArgumentException] {
      GraftTable.compactWhere(spark, root, "key LIKE '%7'", 1)
    }
  }
}
