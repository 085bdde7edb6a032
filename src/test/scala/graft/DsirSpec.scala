package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance selection: partitioning invariance (the
  * exact-integer contract), selection pressure (docs sharing the
  * target's vocabulary outrank docs that don't), and scale-shape
  * sanity (only raw docs are selected).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("selection pressure: target-vocabulary docs outrank alien-vocabulary docs") {
    // target speaks {aa..ae}; half the raw docs speak target words,
    // half speak an alien vocabulary — the target-like half must win
    val target = (0 until 20).map(i =>
      (1000L + i, "aa bb cc dd ee aa bb cc", true))
    val rawLike = (0 until 10).map(i =>
      (i.toLong, "aa bb cc dd ee aa bb", false))
    val rawAlien = (10 until 20).map(i =>
      (i.toLong, "zz yy xx ww vv uu tt", false))
    val docs = (target ++ rawLike ++ rawAlien)
      .toDF("doc_id", "text", "is_t")
    val top = Dsir.importanceTopK(docs, col("is_t"), buckets = 64, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(top == (0L until 10).toSet,
      s"the target-like raw docs must be selected, got $top")
  }

  test("scores are partitioning-invariant (exact-integer contract)") {
    val docs = Tables(spark, sf, "documents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.importanceTopK(d, col("source") === "src0", buckets = 256, k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(17, col("lang")))
    assert(a == b, "same data, different partitioning: scores must be identical")
    assert(a.size == 20)
    // selected docs are raw-side only
    val srcs = Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(a.map(_._1): _*))
      .select("source").distinct().as[String].collect().toSet
    assert(!srcs.contains("src0"), "selection must draw from the raw side only")
  }
}
