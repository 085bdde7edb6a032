package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Sampling}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, singletons-by-edge") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val got = Components.connectedComponents(spark, pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    val groups = Components.dedupGroups(spark, pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 4L, 10L -> 3L, 20L -> 2L))
  }

  test("long path converges (diameter > a few rounds; loop path forced)") {
    val path = (1L to 40L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("a_id", "b_id")
    val got = Components.connectedComponents(spark, path, "a_id", "b_id",
        maxIter = 50, smallGraphEdges = 0)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.sameElements(Array(1L)))
  }

  test("small-graph union-find path ≡ iterative loop path") {
    // chain + triangle + pair + a larger random-ish component mix
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)) ++
      (0L until 300L).map(i => (100L + i * 7 % 97, 100L + (i * 13 + 5) % 97)))
      .toDF("a_id", "b_id")
    val fast = Components.connectedComponents(spark, pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Components.connectedComponents(spark, pairs, "a_id", "b_id",
        smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop,
      "the two paths must produce identical min-id labelings")
  }

  test("reliable checkpoint path: same labels with a checkpoint dir set") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val expected = Components.connectedComponents(spark, pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckptDir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      // force the loop: the small-graph path never checkpoints
      val got = Components.connectedComponents(spark, pairs, "a_id", "b_id",
          smallGraphEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
      // the reliable path must actually have written checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no checkpoint files written with a checkpoint dir set")
    } finally {
      // sc has no unset API; point it at a throwaway so later suites in
      // this shared session fall back cleanly (getCheckpointDir stays
      // defined — Components still works, just checkpoints there)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("cc_ckpt_rest").toString)
    }
  }

  test("hash sampling: deterministic, partition-independent, rate-plausible") {
    val docs = Tables(spark, sf, "documents")
    val s1 = Sampling.hashSample(docs, "doc_id", 20).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs.repartition(13), "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    assert(s1.size > 50 && s1.size < 150, s"20% of 500 ≈ 100, got ${s1.size}")
    // subset property: raising the rate only adds rows
    val s3 = Sampling.hashSample(docs, "doc_id", 40).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("stratified rates apply per stratum") {
    val docs = Tables(spark, sf, "documents")
    val sampled = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 100, "zh" -> 0))
    val langs = sampled.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    assert(sampled.count() == docs.filter(col("lang") === "en").count())
  }

  test("weighted sampling: partition-independent, keep-rate tracks the weight") {
    val docs = Tables(spark, sf, "documents")
    val w1 = Sampling.weightedHashSample(docs, "doc_id", "n_chars", 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w2 = Sampling.weightedHashSample(docs.repartition(7), "doc_id", "n_chars", 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w1 == w2, "weighted sample must not depend on partitioning")
    // rows at/above maxWeight are kept with probability 1
    val heavy = docs.filter(col("n_chars") >= 400)
    assert(Sampling.weightedHashSample(heavy, "doc_id", "n_chars", 400).count()
      == heavy.count(), "weight ≥ max ⇒ always kept")
    // keep-rate of the light stratum is below the heavy stratum's
    val light = docs.filter(col("n_chars") < 200)
    val lightRate = Sampling.weightedHashSample(light, "doc_id", "n_chars", 400)
      .count().toDouble / math.max(1, light.count())
    assert(lightRate < 0.75, s"light docs must be down-sampled, rate $lightRate")
  }
}
