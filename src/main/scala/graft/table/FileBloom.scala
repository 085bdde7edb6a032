package graft.table

import java.util.Base64

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Per-file Bloom filters for [[GraftTable]] point-lookup file
  * skipping — the pruning layer zone maps cannot provide: a
  * high-cardinality key scattered across files (ingest order, not
  * clustered) makes every file's [min,max] span the probe, yet each
  * file holds only its own keys. A 1 KiB filter per (file, column)
  * answers "can this file contain k?" with no IO; at 8192 bits and
  * two hashes a 10k-key file false-positives ~2% — a wasted file
  * open, never a wrong result (membership is necessary, not
  * sufficient, and the residual predicate still applies).
  *
  * Hashing is Spark's own `xxhash64` — the SAME bits distributed
  * (build side, a Column expression over the written files) and on
  * the driver (probe side, [[probeHashes]] evaluates the identical
  * `XxHash64` expression on a literal) — so build and probe can
  * never drift. Double hashing: h1 = xxhash64(v), h2 = xxhash64(1, v)
  * (the seed-chaining form, since Spark pins the base seed to 42).
  */
object FileBloom {

  /** Filter width in bits (1 KiB per file-column). */
  val MBits = 8192
  private val Words = MBits / 64

  /** The two build-side hash columns for a value column. MUST mirror
    * [[probeHashes]] exactly.
    */
  def hashCols(c: Column): (Column, Column) = (xxhash64(c), xxhash64(lit(1L), c))

  /** Driver-side hashes of a probe value — the same XxHash64
    * expression the build side evaluates per row.
    */
  def probeHashes(value: Any, dt: DataType): (Long, Long) = {
    val l = Literal.create(value, dt)
    (XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long],
      XxHash64(Seq(Literal(1L), l), 42L).eval(null).asInstanceOf[Long])
  }

  private def bit(h: Long): Int = java.lang.Math.floorMod(h, MBits.toLong).toInt

  def contains(words: Array[Long], h1: Long, h2: Long): Boolean = {
    def test(h: Long): Boolean = {
      val b = bit(h); (words(b >> 6) & (1L << (b & 63))) != 0L
    }
    test(h1) && test(h2)
  }

  def toB64(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    Base64.getEncoder.encodeToString(bb.array)
  }

  def fromB64(s: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(Base64.getDecoder.decode(s))
    Array.fill(Words)(bb.getLong)
  }

  /** Distributed build: OR the two hash bits of every row into one
    * fixed-width bitset per group (file). Commutative + associative →
    * partition-order-invariant.
    */
  class BloomAgg extends Aggregator[(Long, Long), Array[Long], String] {
    def zero: Array[Long] = new Array[Long](Words)
    private def set(w: Array[Long], h: Long): Array[Long] = {
      val b = bit(h); w(b >> 6) |= 1L << (b & 63); w
    }
    def reduce(w: Array[Long], row: (Long, Long)): Array[Long] =
      set(set(w, row._1), row._2)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    def finish(w: Array[Long]): String = toB64(w)
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
