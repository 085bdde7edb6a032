package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnnOracle, LlmOps}

/** The driver-side ANN oracles ([[graft.queries.AnnOracle]]) must
  * re-derive the EXACT judged rows of the three training-loop tiers —
  * same ids, same ranks, bit-identical cosines — at both spec scale
  * factors. This is the in-repo twin of the DuckDB hash gate: the
  * VALUES relation the gate executes embeds exactly these rows.
  */
class AnnOracleSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  /** xxh64 specialization must equal Spark's `xxhash64` on BIGINT —
    * the PQ trainers' seeding order hangs off it.
    */
  test("xxh64(long) matches Spark's xxhash64 column function") {
    import spark.implicits._
    val ids = (-3L to 64L) ++ Seq(Long.MaxValue, Long.MinValue, 1234567891011L)
    val fromSpark = ids.toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(AnnOracle.xxh64(id) == fromSpark(id), s"id $id")
    }
  }

  private def judged(name: String, dir: String): Seq[(Long, Long, Long, Double)] =
    LlmOps.queries(name)(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  /** Bit-exact comparison: cosines compare by raw IEEE bits, not
    * tolerance — the hash gate strings them, so one ulp is a miss.
    */
  private def assertSame(name: String,
      got: Seq[(Long, Long, Long, Double)],
      want: Seq[(Long, Long, Long, Double)]): Unit = {
    assert(got.size == want.size, s"$name: ${got.size} vs ${want.size} rows")
    got.sortBy(t => (t._1, t._3)).zip(want.sortBy(t => (t._1, t._3)))
      .foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 &&
          java.lang.Double.doubleToLongBits(g._4) ==
            java.lang.Double.doubleToLongBits(w._4),
          s"$name: engine $g vs oracle $w")
      }
  }

  test("PQ ADC+rerank: oracle rows equal the judged query, both SFs") {
    Seq(sf, sf001).foreach { dir =>
      assertSame(s"ann_pq_topk@$dir",
        judged("ann_pq_topk", dir), AnnOracle.pqRows(dir))
    }
  }

  test("IVF+PQ residual ADC: oracle rows equal the judged query, both SFs") {
    Seq(sf, sf001).foreach { dir =>
      assertSame(s"ann_ivfpq_topk@$dir",
        judged("ann_ivfpq_topk", dir), AnnOracle.ivfPqRows(dir))
    }
  }

  test("sharded HNSW: oracle rows equal the judged query, both SFs") {
    Seq(sf, sf001).foreach { dir =>
      assertSame(s"ann_hnsw_topk@$dir",
        judged("ann_hnsw_topk", dir), AnnOracle.hnswRows(dir))
    }
  }

  test("the emitted VALUES SQL carries one row per (query, rank)") {
    val sql = AnnOracle.pqTopKSql(sf)
    assert(sql.contains("VALUES"))
    assert(sql.trim.startsWith("SELECT"))
    // 10 queries × k=5 → 50 tuples
    assert(sql.count(_ == '(') >= 50)
  }
}
