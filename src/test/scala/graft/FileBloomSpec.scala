package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{FileBloom, GraftTable}
import graft.table.GraftTable.Range

/** Per-file Bloom skipping: the point-lookup pruning layer for keys
  * SCATTERED across files — where every file's zone map spans the
  * probe and min/max pruning is structurally useless.
  */
class FileBloomSpec extends SparkSpec {
  import spark.implicits._

  test("string point lookup: bloom prunes to the one file zone maps cannot isolate") {
    val root = Files.createTempDirectory("gt_bloom").toString
    GraftTable.setBloomColumns(spark, root, Seq("key"))
    // three files, each spanning the whole a..z key alphabet
    def batch(tag: Int) = (0 until 200)
      .map(i => (tag * 1000L + i, s"${('a' + i % 26).toChar}_${tag}_$i"))
      .toDF("id", "key")
    (0 until 3).foreach(t => GraftTable.append(spark, root, batch(t).coalesce(1)))
    val snap = GraftTable.snapshot(spark, root)
    assert(snap.files.size == 3)
    assert(snap.files.forall(_.blooms.contains("key")),
      "every file must carry a key bloom after setBloomColumns")
    val probe = "c_1_54"
    // zone maps alone cannot prune: a non-point range at the probe
    // (bloom only engages on exact points) keeps all three candidates
    assert(GraftTable.prunedFiles(snap,
      Range("key", Some(probe), Some(probe + "~"))).size == 3,
      "premise: every file's [min,max] spans the probe")
    val pruned = GraftTable.prunedFiles(snap, Range("key", Some(probe), Some(probe)))
    assert(pruned.size == 1, s"bloom must isolate one file, got ${pruned.size}")
    val got = GraftTable.scan(spark, root, Range("key", Some(probe), Some(probe)))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1054L),
      "the pruned scan must still return exactly the matching row")
    // an absent key prunes every file — no IO at all
    assert(GraftTable.prunedFiles(snap,
      Range("key", Some("zz_nope"), Some("zz_nope"))).isEmpty)
  }

  test("numeric point lookup + blooms recomputed through CoW rewrites") {
    val root = Files.createTempDirectory("gt_bloom_num").toString
    GraftTable.setBloomColumns(spark, root, Seq("id"))
    // interleaved ids: every file's [min,max] covers the whole domain
    def batch(t: Int) = (0 until 300).map(i => (i * 3L + t, s"v$t-$i"))
      .toDF("id", "v")
    (0 until 3).foreach(t => GraftTable.append(spark, root, batch(t).coalesce(1)))
    val snap = GraftTable.snapshot(spark, root)
    val probe = 50L * 3 + 1 // lives only in file t=1
    assert(GraftTable.prunedFiles(snap, Range("id", Some(probe - 1), Some(probe + 1)))
      .size == 3, "premise: interleaved ranges defeat zone maps")
    assert(GraftTable.prunedFiles(snap, Range("id", Some(probe), Some(probe)))
      .size == 1, "bloom must isolate the owning file")
    // CoW compaction rewrites files through the same write path →
    // fresh blooms on the new files, lookups still correct
    GraftTable.compact(spark, root, targetFiles = 2)
    val snap2 = GraftTable.snapshot(spark, root)
    assert(snap2.files.forall(_.blooms.contains("id")),
      "rewritten files must carry recomputed blooms")
    val got = GraftTable.scan(spark, root, Range("id", Some(probe), Some(probe)))
      .select("v").collect().map(_.getString(0)).toSeq
    assert(got == Seq("v1-50"))
    // a POINT delete prunes by bloom too: only the owning file rewrites
    val preDel = GraftTable.snapshot(spark, root)
    GraftTable.deleteWhere(spark, root, s"id = $probe",
      Some(Range("id", Some(probe), Some(probe))))
    val postDel = GraftTable.snapshot(spark, root)
    assert(preDel.files.map(_.path).toSet
      .intersect(postDel.files.map(_.path).toSet).size == 1,
      "bloom-pruned point delete must rewrite only the owning file")
    assert(GraftTable.read(spark, root).filter(s"id = $probe").count() == 0)
    assert(GraftTable.read(spark, root).count() == 899)
  }

  test("build/probe hash agreement: the distributed bits match the driver's") {
    // the invariant everything rests on: xxhash64 over a column and
    // XxHash64.eval over the literal produce identical hashes
    val vals = Seq("alpha", "Ω-beta", "", "c_1_54")
    val df = vals.toDF("s")
    val (h1c, h2c) = FileBloom.hashCols(col("s"))
    val rows = df.select(col("s"), h1c.as("h1"), h2c.as("h2")).collect()
    rows.foreach { r =>
      val (h1, h2) = FileBloom.probeHashes(r.getString(0),
        org.apache.spark.sql.types.StringType)
      assert(h1 == r.getLong(1) && h2 == r.getLong(2),
        s"hash drift on '${r.getString(0)}'")
    }
  }
}
