package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable
import graft.table.GraftTable.Range

/** Incremental Z-order clustering ([[GraftTable.zorderIncremental]]):
  * O(debt) passes that converge, leave clustered generations
  * untouched, stay silent in the change feed, and actually prune.
  */
class ZorderIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_zinc").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map { i =>
      (i, (i * 2654435761L) % 4096, (i * 40503L) % 4096, s"p$i")
    }.toDF("id", "zx", "zy", "payload")

  private val cols = Seq("zx", "zy")
  private val spec = GraftTable.layoutSpec(cols, bits = 12)

  test("a pass rewrites ONLY the debt; repeated passes converge to a no-op") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 2000).repartition(3))
    GraftTable.append(spark, root, rows(2000, 4000).repartition(2))
    val sumBefore = GraftTable.read(spark, root)
      .agg(sum("id"), count(lit(1))).head

    val v1 = GraftTable.zorderIncremental(spark, root, cols, targetFiles = 4,
      bits = 12)
    val s1 = GraftTable.snapshot(spark, root)
    assert(s1.version == v1)
    assert(s1.files.forall(_.layout.contains(spec)), "every file stamped")

    // new appends are debt; the clustered generation survives untouched
    GraftTable.append(spark, root, rows(4000, 4500).repartition(2))
    val before = GraftTable.snapshot(spark, root)
    val clustered = before.files.filter(_.layout.contains(spec)).map(_.path)
    GraftTable.zorderIncremental(spark, root, cols, targetFiles = 2, bits = 12)
    val after = GraftTable.snapshot(spark, root)
    assert(clustered.toSet.subsetOf(after.files.map(_.path).toSet),
      "clustered generation must not be rewritten")
    assert(after.files.forall(_.layout.contains(spec)))

    // converged: another pass commits nothing
    val vSame = GraftTable.zorderIncremental(spark, root, cols,
      targetFiles = 2, bits = 12)
    assert(vSame == after.version, "no debt -> no commit")

    // content identical through it all
    val sumAfter = GraftTable.read(spark, root)
      .agg(sum("id"), count(lit(1))).head
    assert(sumAfter == GraftTable.read(spark, root)
      .agg(sum("id"), count(lit(1))).head)
    assert(GraftTable.read(spark, root).agg(sum("id")).head.getLong(0) ==
      (0L until 4500).sum)
    assert(sumBefore.getLong(1) == 4000)
  }

  test("maxFiles bounds one pass to a fixed unit of work") {
    val root = freshRoot()
    (0 until 5).foreach(i =>
      GraftTable.append(spark, root,
        rows(i * 100L, i * 100L + 100).repartition(1)))
    GraftTable.zorderIncremental(spark, root, cols, targetFiles = 1,
      bits = 12, maxFiles = 2)
    val s = GraftTable.snapshot(spark, root)
    assert(s.files.count(_.layout.contains(spec)) >= 1)
    assert(s.files.count(f => !f.layout.contains(spec)) == 3,
      "exactly the 2 oldest debt files were consumed")
    // the remaining debt drains over further passes
    GraftTable.zorderIncremental(spark, root, cols, 1, 12, maxFiles = 2)
    GraftTable.zorderIncremental(spark, root, cols, 1, 12, maxFiles = 2)
    assert(GraftTable.snapshot(spark, root).files
      .forall(_.layout.contains(spec)))
    assert(GraftTable.read(spark, root).count() == 500)
  }

  test("a different spec or a compaction resets the files to debt") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 1000))
    GraftTable.zorderIncremental(spark, root, cols, 2, bits = 12)
    // other bits -> other spec -> everything is debt again
    val v = GraftTable.zorderIncremental(spark, root, cols, 2, bits = 10)
    val s = GraftTable.snapshot(spark, root)
    assert(s.version == v)
    assert(s.files.forall(_.layout.contains(
      GraftTable.layoutSpec(cols, 10))))
    // compaction output is unstamped (it destroys clustering)
    GraftTable.compact(spark, root, targetFiles = 1)
    assert(GraftTable.snapshot(spark, root).files
      .forall(_.layout.isEmpty))
  }

  test("clustering passes are layout-only: the change feed stays silent") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 800).repartition(2))
    val v0 = GraftTable.snapshot(spark, root).version
    val v1 = GraftTable.zorderIncremental(spark, root, cols, 2, bits = 12)
    assert(GraftTable.changes(spark, root, v0, v1).count() == 0,
      "a rewrite that changes no row emits no change")
  }

  test("incrementally clustered generations prune on BOTH dimensions") {
    val root = freshRoot()
    GraftTable.append(spark, root, rows(0, 4000).repartition(2))
    GraftTable.zorderIncremental(spark, root, cols, targetFiles = 8,
      bits = 12)
    GraftTable.append(spark, root, rows(4000, 8000).repartition(2))
    GraftTable.zorderIncremental(spark, root, cols, targetFiles = 8,
      bits = 12)
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.size == 16)
    // a tight rectangle on (zx, zy): both generations prune
    val ranges = Seq(Range("zx", Some(0L), Some(256L)),
      Range("zy", Some(0L), Some(256L)))
    val opened = GraftTable.prunedFilesAll(snap, ranges)
    assert(opened.size < snap.files.size / 2,
      s"expected multiplicative skipping, opened ${opened.size}/16")
    // and the pruned scan is exact
    val got = GraftTable.scanAll(spark, root, ranges).count()
    val want = GraftTable.read(spark, root)
      .filter(col("zx").between(0, 256) && col("zy").between(0, 256))
      .count()
    assert(got == want)
  }
}
