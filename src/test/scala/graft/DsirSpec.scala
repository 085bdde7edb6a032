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

  // graded raw corpus for the resampler tests: doc i carries i target
  // words out of 8, so importance weight rises monotonically with i
  private def gradedDocs = {
    val target = (0 until 20).map(i =>
      (1000L + i, "aa bb cc dd ee ff gg hh", true))
    val raw = (0 until 8).map { i =>
      val toks = (0 until 8).map(j => if (j < i + 1) s"${('a' + j).toChar}${('a' + j).toChar}" else s"z$j")
      (i.toLong, toks.mkString(" "), false)
    }
    (target ++ raw).toDF("doc_id", "text", "is_t")
  }

  test("gumbel resampler: one seed is one sample — deterministic and partitioning-invariant") {
    val docs = gradedDocs
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.importanceGumbelTopK(d, col("is_t"), buckets = 64, k = 4,
        seed = 7L).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(13, col("text")))
    assert(a == b, "a seeded Gumbel sample must be bit-stable across partitionings")
    assert(a.size == 4 && a.map(_._1).distinct.size == 4,
      "k distinct raw docs, sampled without replacement")
    // keys come out ranked
    assert(a.map(_._2) == a.map(_._2).sorted(Ordering[Double].reverse))
  }

  test("gumbel resampler: seeds vary the sample; selection frequency tracks importance weight") {
    val docs = gradedDocs.cache()
    try {
      val perSeed = (0 until 30).map { s =>
        Dsir.importanceGumbelTopK(docs, col("is_t"), buckets = 64, k = 3,
          seed = s.toLong).select("doc_id").as[Long].collect().toSet
      }
      val freq = perSeed.flatten.groupBy(identity).view.mapValues(_.size)
        .toMap.withDefaultValue(0)
      // noise is real: not every seed returns the greedy top-3
      val greedy = Dsir.importanceTopK(docs, col("is_t"), buckets = 64,
        k = 3).select("doc_id").as[Long].collect().toSet
      assert(perSeed.exists(_ != greedy),
        "30 seeds must not all reproduce the greedy sample")
      // inclusion pressure ∝ weight: the heavy half of the graded corpus
      // must be drawn strictly more often than the light half
      val heavy = (4L until 8L).map(freq(_)).sum
      val light = (0L until 4L).map(freq(_)).sum
      assert(heavy > light,
        s"high-importance docs must dominate the sample: heavy=$heavy light=$light")
      // the single heaviest doc beats the single lightest
      assert(freq(7L) > freq(0L),
        s"freq(top-weight)=${freq(7L)} must exceed freq(bottom-weight)=${freq(0L)}")
    } finally docs.unpersist()
  }
}
