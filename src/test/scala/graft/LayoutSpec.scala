package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, plain Scala. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)

  test("zorderKey2 matches the reference bit interleave") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === morton(x, y, 16), s"($x,$y)") }
  }

  test("zorderKeyN: n=2 IS zorderKey2; n=3 interleaves all three dimensions") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(100)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val both = pts.toDF("x", "y")
      .select(Layout.zorderKey2(col("x"), col("y")).as("z2"),
        Layout.zorderKeyN(Seq(col("x"), col("y")), 16).as("zn"))
      .as[(Long, Long)].collect()
    both.foreach { case (z2, zn) => assert(z2 == zn) }
    // n=3 reference interleave
    def morton3(a: Long, b: Long, c: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (3 * i)) | (((b >> i) & 1L) << (3 * i + 1)) |
          (((c >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    val tri = Seq.fill(100)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got3 = tri.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (a, b, c, z) => assert(z == morton3(a, b, c, 10)) }
    // SQL spelling agrees
    tri.toDF("a", "b", "c").createOrReplaceTempView("zpts3")
    val viaSql = spark.sql(s"SELECT ${Layout.zorderKeyNSql(Seq("a", "b", "c"), 10)} AS z " +
      "FROM zpts3 ORDER BY z").as[Long].collect().toSeq
    assert(viaSql == got3.map(_._4).sorted.toSeq)
    // budget guard
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 21)
    }
  }

  test("3-dimension table Z-order: every dimension prunes after one re-cluster") {
    import graft.table.GraftTable
    import graft.table.GraftTable.Range
    val root = java.nio.file.Files.createTempDirectory("zn_table").toString
    val rnd = new scala.util.Random(3)
    val rowsDf = (0 until 4000).map { _ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong,
        rnd.nextInt(1024).toLong)
    }.toDF("a", "b", "c")
    GraftTable.append(spark, root, rowsDf)
    GraftTable.zorderByCols(spark, root, Seq("a", "b", "c"),
      targetFiles = 16, bits = 10)
    val snap = GraftTable.snapshot(spark, root)
    Seq("a", "b", "c").foreach { d =>
      val kept = GraftTable.prunedFilesAll(snap,
        Seq(Range(d, Some(0L), Some(63L)))).size
      assert(kept < snap.files.size,
        s"dimension $d must prune after 3-way Z-order: $kept/${snap.files.size}")
    }
    // correctness: the re-cluster moved no rows
    assert(GraftTable.read(spark, root).count() == 4000)
  }

  test("zorderKeySql is the same function through the SQL frontend") {
    val pts = (0 until 100).map(i => ((i * 37L) % 256, (i * 91L) % 256))
    pts.toDF("x", "y").createOrReplaceTempView("zpts")
    val viaSql = spark.sql(
      s"SELECT ${Layout.zorderKeySql("x", "y", 8)} AS z FROM zpts ORDER BY z")
      .as[Long].collect().toSeq
    val viaDf = pts.toDF("x", "y")
      .select(Layout.zorderKey2(col("x"), col("y"), 8).as("z"))
      .orderBy("z").as[Long].collect().toSeq
    assert(viaSql === viaDf)
  }

  /** Per-file [min,max] of a column from parquet footers — the exact
    * stats a scan consults for row-group skipping, read the same way.
    */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .map { f =>
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try {
          val stats = rd.getFooter.getBlocks.asScala.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column).get.getStatistics
          }
          (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
            stats.map(_.genericGetMax.asInstanceOf[Long]).max)
        } finally rd.close()
      }
  }

  test("Z-order clustering prunes files on the NON-leading dimension") {
    // Linear layout sorted by zx: every file spans the full zy range, so
    // a zy predicate prunes nothing. Z-order layout: zy bits are in the
    // sort key, so files cover disjoint z-ranges and a zy slab overlaps
    // only a fraction — THE reason to z-order a 100 TB corpus scanned
    // with multi-dimension predicates. Proven from real parquet footer
    // stats (what an engine's row-group skip consults), not simulated.
    val e = Tables(spark, sf, "events")
      .select((col("user_id") % 256).as("zx"), (col("event_id") % 256).as("zy"))
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    val files = 8

    e.repartitionByRange(files, col("zx")).sortWithinPartitions("zx")
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.cluster(e, Layout.zorderKey2(col("zx"), col("zy"), 8), files)
      .write.mode("overwrite").parquet(s"$base/zorder")

    val (lo, hi) = (32L, 63L) // a 32-wide zy slab, 1/8 of the domain
    def overlapping(dir: String): Int =
      fileRanges(dir, "zy").count { case (mn, mx) => mx >= lo && mn <= hi }

    val (lin, zo) = (overlapping(s"$base/linear"), overlapping(s"$base/zorder"))
    info(s"files overlapping zy∈[$lo,$hi]: linear=$lin/$files zorder=$zo/$files")
    assert(lin == files, "control: linear-by-zx layout cannot prune a zy slab")
    assert(zo * 2 <= files, s"z-order must prune at least half the files, got $zo/$files")
  }
}
