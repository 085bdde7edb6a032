package graft

import org.apache.spark.sql.functions._

import graft.functions.FixedLog2

/** Round-16 pin: the driver-side [[FixedLog2.qlog2Long]] must equal the
  * column program [[FixedLog2.qlog2]] everywhere — same threshold
  * table, same mantissa arithmetic. Exercises powers of two (frac = 0
  * edges), threshold neighborhoods, both domain endpoints, and a
  * pseudo-random sweep.
  */
class FixedLog2Spec extends SparkSpec {

  test("qlog2Long equals the column qlog2 across the domain") {
    val edges = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 41), (1L << 42) - 1)
    val rng = new scala.util.Random(7)
    val sweep = Seq.fill(2000)(math.abs(rng.nextLong()) % ((1L << 42) - 1) + 1)
    val xs = (edges ++ sweep).distinct
    import spark.implicits._
    val fromColumn = xs.toDF("x")
      .select(col("x"), FixedLog2.qlog2(col("x")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(FixedLog2.qlog2Long(x) == fromColumn(x), s"x = $x")
    }
  }

  test("qlog2Long raises outside the domain") {
    intercept[IllegalArgumentException](FixedLog2.qlog2Long(0L))
    intercept[IllegalArgumentException](FixedLog2.qlog2Long(1L << 42))
  }
}
