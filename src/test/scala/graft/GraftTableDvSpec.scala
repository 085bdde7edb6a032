package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable
import graft.table.GraftTable.Range

/** Merge-on-read deletion vectors: a DV delete masks rows without
  * rewriting data files, readers/time-travel/CDC all see exactly the
  * live rows, purge folds masks back into clean files, and vacuum
  * keeps every referenced DV parquet alive.
  */
class GraftTableDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dv").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"k$i", i * 10.0)).toDF("id", "key", "v")

  private def dataFileNames(root: String): Set[String] =
    GraftTable.snapshot(spark, root).files.map(_.path).toSet

  test("DV delete: rows masked, data files untouched, time travel intact") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50))
    GraftTable.append(spark, root, rows(50, 100))
    val before = dataFileNames(root)
    val v = GraftTable.deleteWhereDv(spark, root, "id >= 20 AND id < 30",
      Some(Range("id", Some(20L), Some(29L))))
    assert(v == 2)
    // same physical data files, now carrying a DV
    assert(dataFileNames(root) == before,
      "merge-on-read must not rewrite or add data files")
    val snap = GraftTable.snapshot(spark, root)
    val masked = snap.files.filter(_.dv.isDefined)
    assert(masked.nonEmpty && masked.map(_.dv.get.rows).sum == 10,
      s"touched files mask 10 rows total: ${snap.files.map(_.dv)}")
    // read sees live rows only
    val got = GraftTable.read(spark, root).select("id").as[Long].collect().sorted
    assert(got.toSeq == ((0L until 20) ++ (30L until 100)))
    // time travel to the pre-delete version still sees everything
    assert(GraftTable.read(spark, root, Some(1)).count() == 100)
    // physical rows stat unchanged (zone maps conservative)
    assert(snap.files.map(_.rows).sum == 100)
  }

  test("masked read is byte-identical on both sides of the DV broadcast gate") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 200))
    GraftTable.deleteWhereDv(spark, root, "id % 3 = 0", None)
    def readAll() = GraftTable.read(spark, root)
      .orderBy("id").collect().toSeq
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin") ||
        df.queryExecution.executedPlan.toString.contains("BroadcastExchange")
    val saved = GraftTable.DvBroadcastMaxPositions
    try {
      // under the gate: the expanded DV frame broadcasts
      GraftTable.DvBroadcastMaxPositions = 1L << 20
      val under = readAll()
      assert(hasBroadcast(GraftTable.read(spark, root)),
        "a model-sized mask must broadcast")
      // over the gate (seam forces it): the anti-join must SHUFFLE —
      // no broadcast of a position set declared too wide
      GraftTable.DvBroadcastMaxPositions = 0L
      val over = readAll()
      assert(!hasBroadcast(GraftTable.read(spark, root)),
        "an over-gate mask must not broadcast the expanded position set")
      assert(under == over, "both join strategies must read identical rows")
      assert(under.size == 133 && under.forall(r => r.getLong(0) % 3 != 0))
    } finally GraftTable.DvBroadcastMaxPositions = saved
  }

  test("wide retraction writes O(runs) DV spans, reads stay exact, CDC exact") {
    // one 20k-row file; mask a contiguous 90% band plus a separate
    // point — the DV parquet must hold a handful of SPANS, not 18k+1
    // position rows (the 100 TB retraction cost model)
    val root = freshRoot()
    val n = 20000L
    GraftTable.append(spark, root,
      (0L until n).map(i => (i, s"k$i", i * 10.0)).toDF("id", "key", "v")
        .coalesce(1))
    GraftTable.deleteWhereDv(spark, root,
      s"(id >= 1000 AND id < 19000) OR id = 7", None)
    val snap = GraftTable.snapshot(spark, root)
    val dv = snap.files.flatMap(_.dv).head
    assert(dv.rows == 18001, s"logged positions: ${dv.rows}")
    // raw span frame: 2 runs ([7,7] and [1000,18999])
    val raw = spark.read.parquet(s"$root/${dv.path}")
    assert(raw.columns.contains("run"), "RLE generation must carry runs")
    assert(raw.count() == 2, s"expected 2 spans, got ${raw.count()}")
    assert(raw.agg(sum("run")).head.getLong(0) == 18001)
    // masked read expands spans exactly
    val got = GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    val expect = (0L until n)
      .filterNot(i => (i >= 1000 && i < 19000) || i == 7)
    assert(got == expect, "span expansion must mask exactly the band")
    // CDC: the DV commit's delete image is exactly the masked rows
    val chg = GraftTable.changes(spark, root, snap.version - 1, snap.version)
    val dels = chg.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels == ((1000L until 19000L) ++ Seq(7L)).sorted,
      "CDC must expand spans to exact deleted rows")
    // a follow-up re-delete UNIONS across the RLE generation: the old
    // spans expand, union with the new band, recompress
    GraftTable.deleteWhereDv(spark, root, "id >= 19500", None)
    val got2 = GraftTable.read(spark, root).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got2 == expect.filter(_ < 19500))
    val dv2 = GraftTable.snapshot(spark, root).files.flatMap(_.dv).head
    assert(dv2.rows == 18001 + 500)
    assert(spark.read.parquet(s"$root/${dv2.path}").count() == 3,
      "union must recompress to 3 spans")
  }

  test("re-delete unions positions; no-match and already-deleted predicates are no-ops") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 40))
    GraftTable.deleteWhereDv(spark, root, "id < 5", None)
    val v1 = GraftTable.snapshot(spark, root).version
    // same predicate again: everything already masked → NO new commit
    assert(GraftTable.deleteWhereDv(spark, root, "id < 5", None) == v1)
    // disjoint predicate: masks union
    GraftTable.deleteWhereDv(spark, root, "id >= 35", None)
    val dvRows = GraftTable.snapshot(spark, root).files.flatMap(_.dv.map(_.rows))
    assert(dvRows.sum == 10, s"5 + 5 masked positions total: $dvRows")
    assert(GraftTable.read(spark, root).count() == 30)
    // predicate matching nothing: no commit
    val tip = GraftTable.snapshot(spark, root).version
    assert(GraftTable.deleteWhereDv(spark, root, "id > 1000", None) == tip)
  }

  test("CDC: a DV commit emits exactly the newly-masked rows as deletes") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 30))
    GraftTable.deleteWhereDv(spark, root, "id < 10", None) // v1
    GraftTable.deleteWhereDv(spark, root, "id < 15", None) // v2: only 10..14 new
    val c1 = GraftTable.changes(spark, root, 0, 1)
    assert(c1.filter(col("_change_type") === "insert").count() == 0)
    assert(c1.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 10))
    val c2 = GraftTable.changes(spark, root, 1, 2)
    assert(c2.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (10L until 15))
    // whole-range feed composes
    val all = GraftTable.changes(spark, root, -1, 2)
    assert(all.filter(col("_change_type") === "insert").count() == 30)
    assert(all.filter(col("_change_type") === "delete").count() == 15)
  }

  test("purgeDeletes folds masks into clean files; DV parquets reclaimed after retention") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 60))
    GraftTable.deleteWhereDv(spark, root, "id % 3 = 0", None)
    assert(GraftTable.read(spark, root).count() == 40)
    val v = GraftTable.purgeDeletes(spark, root)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.version == v && snap.files.forall(_.dv.isEmpty),
      "purge must leave no masked file")
    assert(snap.files.map(_.rows).sum == 40,
      "purged files hold exactly the live rows")
    assert(GraftTable.read(spark, root).select("id").as[Long].collect()
      .forall(_ % 3 != 0))
    // double purge is a no-op
    assert(GraftTable.purgeDeletes(spark, root) == v)
    // vacuum now: DV parquet still log-referenced (v1's entry) → kept
    val keptDv = GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(!keptDv.exists(_.contains("dv-")),
      s"DV parquet still referenced by retained entries: $keptDv")
    // CDC across the purge window still reads both sides (DV + files)
    val c = GraftTable.changes(spark, root, 0, 2)
    assert(c.filter(col("_change_type") === "delete").count() == 20)
    // the purge entry's removeDvs still references the DV (the change
    // feed reads the remove side through it) — expiry only reclaims
    // once THAT entry leaves the retention window
    GraftTable.expireVersions(spark, root, keepLast = 1)
    assert(!GraftTable.vacuum(spark, root, minAgeMs = 0L).exists(_.contains("dv-")),
      "DV must survive while the purge entry is retained")
    GraftTable.append(spark, root, rows(100, 105)) // push the window past it
    GraftTable.expireVersions(spark, root, keepLast = 1)
    val reclaimed = GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(reclaimed.exists(_.contains("dv-")),
      s"unreferenced DV parquet must be reclaimed: $reclaimed")
    assert(GraftTable.read(spark, root).count() == 45)
  }

  test("DV interacts with scans, appendsSince contract, and restore") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50))
    GraftTable.deleteWhereDv(spark, root, "id >= 40", None) // v1
    // zone-pruned scan over a masked file returns live rows only
    val s = GraftTable.scan(spark, root, Range("id", Some(30L), Some(49L)))
    assert(s.select("id").as[Long].collect().sorted.toSeq == (30L until 40))
    // a DV commit is a removal for the appends contract
    val e = intercept[IllegalArgumentException] {
      GraftTable.appendsSince(spark, root, 0L)
    }
    assert(e.getMessage.contains("non-append commit"))
    // restore to pre-delete re-exposes the masked rows (metadata only)
    GraftTable.restore(spark, root, 0L)
    assert(GraftTable.read(spark, root).count() == 50)
    // and restore BACK to the masked version applies the DV again
    GraftTable.restore(spark, root, 1L)
    assert(GraftTable.read(spark, root).count() == 40)
  }

  test("maintain: one idempotent call drives purge, compaction, expiry, vacuum by debt") {
    val root = freshRoot()
    // build up every kind of debt: small files, heavy mask, history
    (0 until 4).foreach(i =>
      GraftTable.append(spark, root, rows(i * 25, i * 25 + 25)))
    GraftTable.deleteWhereDv(spark, root, "id % 2 = 0", None) // 50% mask
    val (purged, compacted, _, _) =
      GraftTable.maintain(spark, root, smallFileRows = 1000,
        keepVersions = 2, purgeAtMaskRatio = 0.1)
    assert(purged, "50% mask debt must trigger a purge")
    assert(compacted, "small-file debt must trigger compaction")
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.forall(_.dv.isEmpty))
    assert(GraftTable.read(spark, root).count() == 50)
    // caught-up: a second pass changes nothing but may vacuum strays
    val v = snap.version
    val (p2, c2, e2, _) = GraftTable.maintain(spark, root,
      smallFileRows = 1000, keepVersions = 2, purgeAtMaskRatio = 0.1)
    assert(!p2 && !c2 && e2.isEmpty)
    assert(GraftTable.snapshot(spark, root).version == v,
      "caught-up maintenance must not commit")
    // light mask debt below the ratio is left alone
    GraftTable.deleteWhereDv(spark, root, "id = 1", None)
    val (p3, _, _, _) = GraftTable.maintain(spark, root,
      smallFileRows = 1, keepVersions = 10, purgeAtMaskRatio = 0.5)
    assert(!p3, "mask debt under the ratio must not purge")
  }

  test("scanWhere extracts pruning ranges from SQL; rowCount is metadata-only") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 100)) // 8 range-disjoint files
    // conjunctive bounds prune; result ≡ full filter
    val conds = Seq(
      "id >= 20 AND id <= 30",
      "id BETWEEN 20 AND 30",
      "20 <= id AND id < 31",
      "id = 55 AND v > 0.0")
    conds.foreach { c =>
      val snap = GraftTable.snapshot(spark, root)
      val pruned = GraftTable.prunedFilesAll(snap,
        GraftTable.rangesOf(spark, c))
      assert(pruned.size < snap.files.size, s"no pruning for: $c")
      val got = GraftTable.scanWhere(spark, root, c)
        .select("id").as[Long].collect().sorted.toSeq
      val expect = GraftTable.read(spark, root).filter(c)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"scanWhere diverged for: $c")
    }
    // OR and functions are conservative: no ranges, full results
    assert(GraftTable.rangesOf(spark, "id < 5 OR id > 90").isEmpty)
    assert(GraftTable.scanWhere(spark, root, "id < 5 OR id > 90").count() ==
      14)
    assert(GraftTable.rangesOf(spark, "abs(id) = 3").isEmpty)
    // metadata row count tracks appends and DV masks without data IO
    assert(GraftTable.rowCount(spark, root) == 100)
    GraftTable.deleteWhereDv(spark, root, "id % 10 = 0", None)
    assert(GraftTable.rowCount(spark, root) == 90)
    assert(GraftTable.rowCount(spark, root, Some(0)) == 100)
    assert(GraftTable.rowCount(spark, root) ==
      GraftTable.read(spark, root).count())
  }

  test("shallow clone: zero-copy branch, DV deletes mask the clone only, vacuum is scoped") {
    val srcRoot = freshRoot()
    GraftTable.append(spark, srcRoot, rows(0, 40))
    GraftTable.append(spark, srcRoot, rows(40, 60))
    val cloneRoot = freshRoot() + "/branch"
    GraftTable.clone(spark, srcRoot, cloneRoot)
    // zero bytes copied: the clone has no data dir of its own yet
    assert(!new java.io.File(cloneRoot, "data").exists(),
      "shallow clone must copy no data files")
    assert(GraftTable.read(spark, cloneRoot).count() == 60)
    // a DV delete on the clone masks CLONED (absolute-path) files —
    // the suffix-key matching — and leaves the source untouched
    GraftTable.deleteWhereDv(spark, cloneRoot, "id < 10", None)
    assert(GraftTable.read(spark, cloneRoot).count() == 50)
    assert(GraftTable.read(spark, srcRoot).count() == 60,
      "source must not see the clone's delete")
    // diverge the clone with its own append; the source stays put
    GraftTable.append(spark, cloneRoot, rows(100, 105))
    assert(GraftTable.read(spark, cloneRoot).count() == 55)
    assert(GraftTable.read(spark, srcRoot).count() == 60)
    // clone-side vacuum can only scan the clone's own data dir
    assert(GraftTable.vacuum(spark, cloneRoot, minAgeMs = 0L).isEmpty)
    assert(GraftTable.read(spark, srcRoot).count() == 60)
    // compact localizes the clone: all-relative paths afterwards
    GraftTable.compact(spark, cloneRoot, targetFiles = 2)
    assert(GraftTable.snapshot(spark, cloneRoot).files
      .forall(f => !f.path.startsWith("/") && !f.path.contains(":")),
      "compaction must localize the clone")
    assert(GraftTable.read(spark, cloneRoot).count() == 55)
    // cloning an old version branches history
    val oldClone = freshRoot() + "/old"
    GraftTable.clone(spark, srcRoot, oldClone, Some(0L))
    assert(GraftTable.read(spark, oldClone).count() == 40)
    // a clone refuses to overwrite an existing table
    intercept[IllegalArgumentException] {
      GraftTable.clone(spark, srcRoot, cloneRoot)
    }
  }

  test("time travel by timestamp: instants resolve to the version in effect then") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    Thread.sleep(15)
    val betweenV0V1 = System.currentTimeMillis()
    Thread.sleep(15)
    GraftTable.append(spark, root, rows(10, 25))
    Thread.sleep(15)
    GraftTable.deleteWhereDv(spark, root, "id < 3", None)
    // an instant between commits reads the earlier state
    assert(GraftTable.versionAt(spark, root, betweenV0V1) == 0L)
    assert(GraftTable.readAsOf(spark, root, betweenV0V1).count() == 10)
    // the future resolves to the tip (with its DV applied)
    val now = System.currentTimeMillis() + 1000
    assert(GraftTable.versionAt(spark, root, now) == 2L)
    assert(GraftTable.readAsOf(spark, root, now).count() == 22)
    // before the first commit is a contract error
    intercept[IllegalArgumentException] {
      GraftTable.versionAt(spark, root, 1L)
    }
  }

  test("vacuum min-age guard spares young unreferenced files for pinned readers") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    val pinned = GraftTable.snapshot(spark, root)
    GraftTable.overwrite(spark, root, rows(100, 105))
    GraftTable.append(spark, root, rows(200, 202)) // push the window
    GraftTable.expireVersions(spark, root, keepLast = 1)
    // age-guarded vacuum reclaims nothing this young…
    assert(GraftTable.vacuum(spark, root, minAgeMs = 3600L * 1000).isEmpty)
    // …so the pinned pre-expiry snapshot's files still read
    val pinnedPaths = pinned.files
      .map(f => new org.apache.hadoop.fs.Path(root, f.path).toString)
    assert(spark.read.parquet(pinnedPaths: _*).count() == 10)
    // the aggressive default reclaims the stranded files
    assert(GraftTable.vacuum(spark, root, minAgeMs = 0L).nonEmpty)
  }

  test("deleteKeysDv: corpus dedup writes its duplicate set as one DV commit") {
    val root = freshRoot()
    // corpus with KNOWN duplicates: the documents table plus a copy
    // under shifted ids — the curation pipeline's input shape
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val shift = docs.count()
    GraftTable.append(spark, root, docs)
    GraftTable.append(spark, root,
      docs.select((col("doc_id") + shift).as("doc_id"), col("text")))
    // detect: exact dedup keeps the min id per text, the rest are dups
    val dups = GraftTable.read(spark, root)
      .groupBy(md5(col("text"))).agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(expr("filter(ids, x -> x != array_min(ids))"))
        .as("doc_id"))
    val nDups = dups.count()
    assert(nDups == shift, "every shifted copy is a duplicate")
    // delete the duplicate KEY SET as one DV commit — no data rewrite
    val before = dataFileNames(root)
    GraftTable.deleteKeysDv(spark, root, dups, "doc_id")
    assert(dataFileNames(root) == before, "dedup delete must rewrite nothing")
    val live = GraftTable.read(spark, root)
    assert(live.count() == shift, "exactly the canonical docs survive")
    assert(live.agg(max(col("doc_id"))).head.getLong(0) < 2 * shift)
    assert(live.select(md5(col("text"))).distinct().count() == shift,
      "no duplicate text survives")
    // CDC of the dedup commit = exactly the dropped duplicates
    val tip = GraftTable.snapshot(spark, root).version
    val cdc = GraftTable.changes(spark, root, tip - 1, tip)
    assert(cdc.filter(col("_change_type") === "delete").count() == nDups)
    assert(cdc.filter(col("_change_type") === "insert").count() == 0)
    // idempotent: the same key set again masks nothing new
    assert(GraftTable.deleteKeysDv(spark, root, dups, "doc_id") == tip)
  }

  test("column mapping: rename/drop are metadata-only; re-add never resurrects dropped data") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    val filesBefore = dataFileNames(root)

    // rename: no files touched, reads translate, appends translate back
    GraftTable.renameColumn(spark, root, "v", "value")
    assert(dataFileNames(root) == filesBefore, "rename must move no data")
    assert(GraftTable.read(spark, root).columns.toSeq ==
      Seq("id", "key", "value"))
    assert(GraftTable.read(spark, root)
      .agg(sum("value")).head.getDouble(0) == (0 until 20).map(_ * 10.0).sum)
    GraftTable.append(spark, root,
      Seq((100L, "k100", 5.5)).toDF("id", "key", "value"))
    assert(GraftTable.read(spark, root)
      .filter(col("id") === 100).select("value").head.getDouble(0) == 5.5)
    // time travel: the pre-rename version reads under its own schema
    assert(GraftTable.read(spark, root, Some(0)).columns.contains("v"))

    // zone-map pruning: post-rename files prune on the NEW name;
    // pre-rename files keep their stats under the OLD name (they stop
    // pruning on the new name — conservative, never wrong) and still
    // prune at their own time-travel version
    val snap = GraftTable.snapshot(spark, root)
    val pruned = GraftTable.prunedFilesAll(snap,
      Seq(Range("value", Some(1000.0), Some(2000.0))))
    assert(pruned.size == snap.files.size - 1,
      s"the post-rename file must prune on 'value': " +
        s"${pruned.size}/${snap.files.size}")
    val snap0 = GraftTable.snapshot(spark, root, Some(0))
    val pruned0 = GraftTable.prunedFilesAll(snap0,
      Seq(Range("v", Some(0.0), Some(10.0))))
    assert(pruned0.size < snap0.files.size,
      "pre-rename files must still prune under their own version")

    // drop: metadata-only; re-added same-name column starts NULL
    GraftTable.dropColumn(spark, root, "value")
    assert(GraftTable.read(spark, root).columns.toSeq == Seq("id", "key"))
    assert(dataFileNames(root).size == filesBefore.size + 1)
    GraftTable.append(spark, root,
      Seq((200L, "k200", 7.7)).toDF("id", "key", "value"))
    val re = GraftTable.read(spark, root)
    assert(re.columns.toSeq == Seq("id", "key", "value"))
    assert(re.filter(col("id") === 200).select("value").head.getDouble(0) == 7.7)
    // the old files' dropped physical column must NOT leak back in
    assert(re.filter(col("id") < 100).select("value").collect()
      .forall(_.isNullAt(0)),
      "dropped data resurrected through a re-added column name")
    // restore across the rename/drop swings the schema back, data intact
    GraftTable.restore(spark, root, 0L)
    val r0 = GraftTable.read(spark, root)
    assert(r0.columns.toSeq == Seq("id", "key", "v") && r0.count() == 20)
  }

  test("CHECK constraints: violating batches refused atomically, valid ones pass") {
    val root = freshRoot()
    GraftTable.setConstraints(spark, root, Map(
      "id_nonneg" -> "id >= 0",
      "key_present" -> "key IS NOT NULL"))
    GraftTable.append(spark, root, rows(0, 10)) // valid
    val vBefore = GraftTable.snapshot(spark, root).version
    val e = intercept[IllegalArgumentException] {
      GraftTable.append(spark, root,
        Seq((-1L, "bad", 0.0), (5L, null, 0.0), (6L, "ok", 1.0))
          .toDF("id", "key", "v"))
    }
    assert(e.getMessage.contains("id_nonneg") &&
      e.getMessage.contains("key_present"),
      s"both violations must be named: ${e.getMessage}")
    assert(GraftTable.snapshot(spark, root).version == vBefore,
      "a refused batch must commit nothing")
    assert(GraftTable.read(spark, root).count() == 10)
    // NULL result of a CHECK passes (SQL semantics): v > 0 on a null v
    GraftTable.setConstraints(spark, root, Map("v_pos" -> "v > 0"))
    GraftTable.append(spark, root,
      Seq((20L, "k20", Option.empty[Double])).toDF("id", "key", "v"))
    assert(GraftTable.read(spark, root).count() == 11)
    // merge output is validated too
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.merge(spark, root,
        Seq((3L, "k3", -5.0, 9L, "U")).toDF("id", "key", "v", "ver", "op"),
        Seq("id"), "ver", "op")
    }
    assert(e2.getMessage.contains("v_pos"))
  }

  test("CoW operations compose with DVs: compact drops masks, merge sees live rows") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 30))
    GraftTable.deleteWhereDv(spark, root, "id < 10", None)
    // compaction reads DV-applied rows and writes clean files
    GraftTable.compact(spark, root, targetFiles = 1)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.forall(_.dv.isEmpty) && snap.files.map(_.rows).sum == 20)
    // a changelog merge over a masked table sees live rows only
    val root2 = freshRoot()
    GraftTable.append(spark, root2, rows(0, 20))
    GraftTable.deleteWhereDv(spark, root2, "id >= 15", None)
    val ch = Seq((3L, "k3x", 99.0, 1L, "U"), (100L, "k100", 1.0, 1L, "U"))
      .toDF("id", "key", "v", "ver", "op")
    GraftTable.merge(spark, root2, ch, Seq("id"), "ver", "op")
    val got = GraftTable.read(spark, root2)
    assert(got.count() == 16) // 15 live + 1 insert
    assert(got.filter(col("id") === 3).select("key").head.getString(0) == "k3x")
    assert(got.filter(col("id") >= 15 && col("id") < 100).count() == 0,
      "masked rows must not resurrect through a merge")
  }
}
