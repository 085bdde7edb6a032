package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time layout clustering for scan pruning — the dominant cost
  * lever for a 100 TB scan-heavy corpus. Sorting data by a Z-order
  * (Morton) key before writing makes parquet row-group min/max
  * statistics TIGHT in every interleaved dimension at once, so a
  * predicate on any of them skips most row groups at footer-read time
  * (no data IO). A linear sort gives the same benefit for its leading
  * column only; Z-order trades a little per-dimension tightness for
  * pruning power across all interleaved dimensions.
  *
  * The key is plain bit arithmetic on BIGINTs (shift/and/or), entirely
  * inside whole-stage codegen — no UDF, and the identical unrolled
  * spelling runs on any SQL engine ([[zorderKeySql]] generates the
  * oracle from the same bit loop, so engine and oracle cannot drift).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of x lands at position 2i, bit i of y at
    * 2i+1. 2·bits ≤ 62 keeps the result in a signed BIGINT.
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("bigint"); val ys = y.cast("bigint")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Oracle-side spelling of [[zorderKey2]]: the same bit loop unrolled
    * to `>> & << |` terms (portable across DuckDB / Spark SQL / ANSI).
    */
  def zorderKeySql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Morton interleave of the low `bits` bits of N non-negative
    * integer columns (bit i of column j lands at position N·i + j) —
    * [[zorderKey2]] generalized to any dimensionality. N·bits ≤ 62
    * keeps the result in a signed BIGINT, so higher dimension counts
    * trade per-dimension resolution (e.g. 4 columns × 15 bits): the
    * standard Z-order budget arithmetic.
    */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zorderKeyN needs >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits must be <= 62, got $n x $bits")
    val cs = cols.map(_.cast("bigint"))
    (0 until bits).flatMap { i =>
      cs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), n * i + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Oracle-side spelling of [[zorderKeyN]] (same unrolled bit loop). */
  def zorderKeyNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"((($c >> $i) & 1) << ${n * i + j})"
      }
    }.mkString("(", " | ", ")")
  }

  /** Cluster a frame for writing: range-partition on the key (files
    * cover disjoint key ranges) and sort within partitions (row groups
    * within a file are tight too). `numFiles` targets the intended
    * file size at the caller's scale — at 100 TB, size so each file is
    * ~1 GB, NOT a fixed small count.
    */
  def cluster(df: DataFrame, key: Column, numFiles: Int): DataFrame =
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
}
