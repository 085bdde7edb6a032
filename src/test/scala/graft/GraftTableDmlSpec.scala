package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable
import graft.table.GraftTable.Range

/** The round-7 DML verbs on the table format: copy-on-write
  * UPDATE … SET (pre-image semantics, pruned rewrites), range DELETE
  * with the metadata-only full-coverage fast path, and tri-clause
  * MERGE INTO (delete/update/insert with conditions, unique-source-key
  * contract, file-granular copy-on-write).
  */
class GraftTableDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dml").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10L, s"s$i")).toDF("id", "v", "s")

  // ---------- updateWhere ----------

  test("updateWhere: every SET reads the PRE-update row (swap works)") {
    val root = freshRoot()
    GraftTable.append(spark, root,
      Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b"))
    GraftTable.updateWhere(spark, root, "id = 1",
      Seq("a" -> "b", "b" -> "a"))
    val out = GraftTable.read(spark, root).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 20L, 10L), (2L, 30L, 40L)))
  }

  test("updateWhere: pruned files survive untouched; result matches; types cast back") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50))   // ids 0-49
    GraftTable.append(spark, root, rows(100, 150)) // ids 100-149
    val before = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    GraftTable.updateWhere(spark, root, "id >= 120",
      Seq("v" -> "v + 5"), prune = Some(Range("id", Some(120L), None)))
    val after = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    // the 0-49 file is zone-map-disjoint from the prune range: same path
    assert(before.intersect(after).nonEmpty,
      "the pruned-out file must be carried, not rewritten")
    val got = GraftTable.read(spark, root)
      .agg(sum(when(col("id") >= 120, col("v"))).as("upd"),
        sum(when(col("id") < 120, col("v"))).as("rest")).head
    assert(got.getLong(0) == (120L until 150).map(_ * 10 + 5).sum)
    assert(got.getLong(1) == ((0L until 50) ++ (100L until 120)).map(_ * 10).sum)
    // updated column keeps its declared LongType
    assert(GraftTable.read(spark, root).schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("updateWhere: change feed emits exactly the changed rows as delete+insert") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 20))
    val v = GraftTable.updateWhere(spark, root, "id < 3", Seq("v" -> "v + 1"))
    val ch = GraftTable.changes(spark, root, v - 1, v)
      .groupBy("_change_type").agg(count(lit(1)).as("n"),
        sum("v").as("sv")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ch("delete") == (3L, 0L + 10L + 20L))
    assert(ch("insert") == (3L, 1L + 11L + 21L))
  }

  test("updateWhere: a violating update is refused by table constraints") {
    val root = freshRoot()
    GraftTable.setConstraints(spark, root, Map("v_pos" -> "v >= 0"))
    GraftTable.append(spark, root, rows(0, 10))
    val e = intercept[IllegalArgumentException] {
      GraftTable.updateWhere(spark, root, "id = 5", Seq("v" -> "-1"))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(GraftTable.read(spark, root).filter("v < 0").count() == 0)
  }

  // ---------- deleteRange ----------

  test("deleteRange: fully-covered files drop METADATA-ONLY (no rewrite)") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50).coalesce(1))
    GraftTable.append(spark, root, rows(50, 100).coalesce(1))
    val v = GraftTable.deleteRange(spark, root, Range("id", Some(0L), Some(49L)))
    val h = GraftTable.history(spark, root)
    val (adds, removes) = h.find(_._1 == v).map(e => (e._2, e._3)).get
    assert(adds == 0, "an aligned range delete must write no data files")
    assert(removes == 1)
    assert(GraftTable.read(spark, root).agg(min("id"), max("id"), count(lit(1)))
      .head match { case r => r.getLong(0) == 50 && r.getLong(1) == 99 &&
        r.getLong(2) == 50 })
  }

  test("deleteRange: boundary file rewrites, covered file drops, content exact") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50).coalesce(1))
    GraftTable.append(spark, root, rows(50, 100).coalesce(1))
    val v = GraftTable.deleteRange(spark, root, Range("id", Some(0L), Some(60L)))
    val e = GraftTable.history(spark, root).find(_._1 == v).get
    assert(e._2 == 1, "only the partially-overlapping file is rewritten")
    assert(e._3 == 2)
    assert(GraftTable.read(spark, root).orderBy("id").as[(Long, Long, String)]
      .collect().map(_._1).toSeq == (61L until 100L).toSeq)
  }

  test("deleteRange: nulls in the range column force the rewrite path") {
    val root = freshRoot()
    GraftTable.append(spark, root,
      Seq((Some(1L), 10L), (Some(2L), 20L), (None, 30L))
        .toDF("id", "v"))
    val v = GraftTable.deleteRange(spark, root, Range("id", Some(0L), Some(9L)))
    val e = GraftTable.history(spark, root).find(_._1 == v).get
    assert(e._2 == 1, "a file with nulls cannot be proven fully covered")
    // null-id row survives (NULL never matches a range predicate)
    val left = GraftTable.read(spark, root).collect()
    assert(left.length == 1 && left.head.isNullAt(0) && left.head.getLong(1) == 30L)
  }

  test("deleteRange: dropped files' rows appear in the change feed as deletes") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50))
    GraftTable.append(spark, root, rows(50, 100))
    val v = GraftTable.deleteRange(spark, root, Range("id", Some(50L), Some(99L)))
    val del = GraftTable.changes(spark, root, v - 1, v)
      .filter(col("_change_type") === "delete")
    assert(del.count() == 50)
    assert(del.agg(sum("id")).head.getLong(0) == (50L until 100).sum)
  }

  // ---------- mergeInto ----------

  test("mergeInto: tri-clause lifecycle — update, delete, insert, carry") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10)) // ids 0-9, v = 10·id
    val src = Seq(
      (2L, "U", 1000L), // matched update: v := v + src_dv
      (3L, "D", 0L),    // matched delete
      (42L, "I", 7L),   // not matched insert
      (77L, "U", 5L)    // not matched + op!=I → dropped (insert cond)
    ).toDF("id", "op", "dv")
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "v + src_dv"),
      matchedUpdateCond = Some("src_op = 'U'"),
      matchedDelete = Some("src_op = 'D'"),
      notMatchedInsert = Some(Seq("v" -> "src_dv")),
      notMatchedInsertCond = Some("src_op = 'I'"))
    val out = GraftTable.read(spark, root).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    val expected =
      ((0L until 10).filter(_ != 3).map(i =>
        (i, i * 10 + (if (i == 2) 1000L else 0L),
          s"s$i")) :+ ((42L, 7L, null: String))).sortBy(_._1)
    assert(out.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    // insert left the uncovered string column NULL
    assert(out.find(_._1 == 42L).get._3 == null)
  }

  test("mergeInto: delete clause takes precedence over update") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 5))
    val src = Seq((1L, 99L)).toDF("id", "dv")
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "src_dv"),
      matchedDelete = Some("true"))
    assert(GraftTable.read(spark, root).filter("id = 1").count() == 0)
  }

  test("mergeInto: duplicate source keys are refused") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 5))
    val src = Seq((1L, 1L), (1L, 2L)).toDF("id", "dv")
    val e = intercept[IllegalArgumentException] {
      GraftTable.mergeInto(spark, root, src, Seq("id"),
        matchedUpdate = Seq("v" -> "src_dv"))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("mergeInto: single-key pruning carries zone-map-disjoint files") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 50))
    GraftTable.append(spark, root, rows(100, 150))
    val before = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    val src = Seq((120L, 1L), (130L, 2L)).toDF("id", "dv")
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "v + src_dv"))
    val after = GraftTable.snapshot(spark, root).files.map(_.path).toSet
    assert(before.intersect(after).nonEmpty,
      "the 0-49 file is key-disjoint and must not be rewritten")
    assert(GraftTable.read(spark, root).filter("id IN (120, 130)")
      .agg(sum("v")).head.getLong(0) == (1200L + 1) + (1300L + 2))
    assert(GraftTable.read(spark, root).count() == 100)
  }

  test("mergeInto: a txn-tagged replay is a commit no-op (exactly-once upsert)") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 5))
    val src = Seq((1L, 100L)).toDF("id", "dv")
    def applyBatch() = GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "v + src_dv"),
      txn = Some(("upsert_app", 0L)))
    val v1 = applyBatch()
    val v2 = applyBatch() // re-delivery: must NOT double-apply v + 100
    assert(v1 == v2, "replayed batch must not commit")
    assert(GraftTable.read(spark, root).filter("id = 1")
      .head.getLong(1) == 10L + 100L)
    // the next batchId applies normally
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "v + src_dv"),
      txn = Some(("upsert_app", 1L)))
    assert(GraftTable.read(spark, root).filter("id = 1")
      .head.getLong(1) == 10L + 200L)
  }

  test("streaming upsert: foreachBatch + txn-tagged mergeInto is exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    val in = MemoryStream[(Long, Long)]
    in.addData((1L, 5L), (2L, 7L), (100L, 1L)) // 2 updates + 1 insert
    val q = in.toDF().toDF("id", "dv").writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        GraftTable.mergeInto(spark, root, batch, Seq("id"),
          matchedUpdate = Seq("v" -> "v + src_dv"),
          notMatchedInsert = Some(Seq("v" -> "src_dv", "s" -> "'ins'")),
          txn = Some(("stream_upsert", id)))
        // simulate at-least-once re-delivery of the SAME batch
        GraftTable.mergeInto(spark, root, batch, Seq("id"),
          matchedUpdate = Seq("v" -> "v + src_dv"),
          notMatchedInsert = Some(Seq("v" -> "src_dv", "s" -> "'ins'")),
          txn = Some(("stream_upsert", id)))
        ()
      }.start()
    q.awaitTermination(120000)
    val out = GraftTable.read(spark, root).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(out.find(_._1 == 1L).get._2 == 15L, "update applied exactly once")
    assert(out.find(_._1 == 2L).get._2 == 27L)
    assert(out.find(_._1 == 100L).get == ((100L, 1L, "ins")))
    assert(out.size == 11)
  }

  test("describeDetail: live rows, mask debt and layout counts track the lifecycle") {
    val root = freshRoot()
    GraftTable.setBloomColumns(spark, root, Seq("s"))
    GraftTable.append(spark, root, rows(0, 50).coalesce(1))
    GraftTable.append(spark, root, rows(50, 100).coalesce(1))
    GraftTable.deleteWhereDv(spark, root, "id % 10 = 0", prune = None)
    val d = GraftTable.describeDetail(spark, root).head
    assert(d.getAs[Long]("version") == 2L)
    assert(d.getAs[Long]("num_files") == 2L)
    assert(d.getAs[Long]("physical_rows") == 100L)
    assert(d.getAs[Long]("masked_rows") == 10L)
    assert(d.getAs[Long]("live_rows") == 90L)
    assert(d.getAs[Long]("dv_files") == 2L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("bloom_columns") == "s")
    assert(d.getAs[Long]("log_entries") == 3L)
    // live_rows must agree with the actual masked read
    assert(GraftTable.read(spark, root).count() ==
      d.getAs[Long]("live_rows"))
  }

  test("mergeInto: insert-only merge into an empty-overlap region commits new rows") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    val src = Seq((1000L, 1L), (1001L, 2L)).toDF("id", "v2")
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      notMatchedInsert = Some(Seq("v" -> "src_v2 * 10")))
    assert(GraftTable.read(spark, root).count() == 12)
    assert(GraftTable.read(spark, root).filter("id >= 1000")
      .agg(sum("v")).head.getLong(0) == 30L)
  }

  test("deepClone: self-contained physical copy survives source destruction") {
    val srcRoot = freshRoot()
    val cloneRoot = Files.createTempDirectory("graft_deep").toString + "/t"
    GraftTable.append(spark, srcRoot, rows(0, 50))
    GraftTable.deleteWhereDv(spark, srcRoot, "id % 5 = 0", prune = None)
    val expected = GraftTable.read(spark, srcRoot)
      .as[(Long, Long, String)].collect().toSet
    GraftTable.deepClone(spark, srcRoot, cloneRoot)
    // the clone references ONLY its own tree (relative paths)
    assert(GraftTable.snapshot(spark, cloneRoot).files
      .forall(f => !f.path.startsWith("/")), "deep clone paths are relative")
    // destroy the source entirely — the backup must be unaffected
    org.apache.hadoop.fs.FileUtil
      .fullyDelete(new java.io.File(srcRoot))
    assert(GraftTable.read(spark, cloneRoot)
      .as[(Long, Long, String)].collect().toSet == expected,
      "deep clone must read the masked content without the source")
    // nothing in the clone is vacuum-able; re-clone onto it refuses
    assert(GraftTable.vacuumDryRun(spark, cloneRoot, minAgeMs = 0L).isEmpty)
    intercept[IllegalArgumentException] {
      GraftTable.deepClone(spark, cloneRoot, cloneRoot)
    }
  }

  test("vacuumDryRun: lists exactly what vacuum would reclaim, deletes nothing") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 10))
    // plant an orphan (a lost-race leftover shape)
    val orphanDir = new java.io.File(s"$root/data/orphan-commit")
    orphanDir.mkdirs()
    val orphan = new java.io.File(orphanDir, "part-junk.parquet")
    Files.writeString(orphan.toPath, "junk")
    val dry = GraftTable.vacuumDryRun(spark, root, minAgeMs = 0L)
    assert(dry == Seq("data/orphan-commit/part-junk.parquet"))
    assert(orphan.exists(), "dry run must not delete")
    val real = GraftTable.vacuum(spark, root, minAgeMs = 0L)
    assert(real == dry, "vacuum must reclaim exactly the dry-run list")
    assert(!orphan.exists())
  }

  test("mergeInto BY SOURCE: unmatched rows update/delete; empty source applies to all") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 12)) // ids 0-11
    // source covers ids 0-3: the other 8 rows are the by-source class
    val src = (0L until 4L).map(i => (i, "U", 1L)).toDF("id", "op", "dv")
    GraftTable.mergeInto(spark, root, src, Seq("id"),
      matchedUpdate = Seq("v" -> "v + src_dv"),
      bySourceDelete = Some("id >= 10"),
      bySourceUpdate = Seq("s" -> "'stale'"))
    val m = GraftTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (0L until 4L).foreach(i => assert(m(i) == (i * 10 + 1, s"s$i")))
    assert(!m.contains(10L) && !m.contains(11L),
      "by-source delete removes the unmatched tail")
    (4L until 10L).foreach(i => assert(m(i) == (i * 10, "stale")))
    assert(m.size == 10)
    // an EMPTY source leaves nothing matched: the unconditional
    // by-source delete clears the table (the no-op early-return must
    // not swallow by-source clauses)
    GraftTable.mergeInto(spark, root,
      spark.emptyDataset[(Long, String, Long)].toDF("id", "op", "dv"),
      Seq("id"), bySourceDelete = Some("true"))
    assert(GraftTable.read(spark, root).count() == 0)
  }
}
