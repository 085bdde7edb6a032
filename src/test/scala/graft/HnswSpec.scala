package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, Similarity}

/** The sharded-HNSW graph-ANN tier ([[graft.operators.Hnsw]]):
  * recall against the judged brute-force contract, bit-determinism,
  * and invariance to input partitioning (the cluster contract — the
  * graph is a pure function of corpus content, not of task layout).
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4
  private lazy val emb = Tables(spark, sf, "embeddings").cache()
  private lazy val qs = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("q_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet

  test("recall@5 >= 0.8 vs the exact brute-force contract (the IVFADC floor)") {
    val idx = Hnsw.build(spark, emb, shards = Shards, m = 8, efC = 64)
    val got = pairs(Hnsw.search(spark, idx, qs, shards = Shards, k = 5, efS = 64))
    val exact = pairs(Similarity.bruteTopKExact(qs, emb, k = 5))
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      f"HNSW recall@5 $recall%.2f below the 0.8 re-rank floor " +
        s"(got ${got.size} pairs, exact ${exact.size})")
  }

  test("build is deterministic and invariant to input partitioning") {
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("shard"), col("vecId"), col("level"),
          to_json(struct(col("links"))), col("cn"))
        .collect().map(_.toString).sorted.toSeq
    val a = canon(Hnsw.build(spark, emb.repartition(1), Shards))
    val b = canon(Hnsw.build(spark, emb.repartition(13, col("label")), Shards))
    assert(a == b, "index must be a pure function of corpus content")
  }

  test("search results are invariant to index partitioning and repeatable") {
    val idx = Hnsw.build(spark, emb, shards = Shards)
    def run(i: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
      Hnsw.search(spark, i, qs, shards = Shards, k = 5, efS = 64)
        .select(col("q_id"), col("neighbor_id"), col("rank").cast("int"))
        .as[(Long, Long, Int)].collect().sorted.toSeq
    val r1 = run(idx.repartition(3))
    val r2 = run(idx.repartition(17, col("vecId")))
    assert(r1 == r2, "search must not depend on index partitioning")
    assert(r1.nonEmpty && r1.groupBy(_._1).forall(_._2.size == 5),
      "every query returns exactly k ranked neighbors")
  }

  test("distributed query path ≡ broadcast path on both sides of the limit") {
    // same index, same queries: forcing the cogrouped (shard ×
    // query-chunk) path (limit 0, tiny chunks so several real chunks
    // exist) must be BIT-equal to the driver-broadcast path — the
    // per-shard beam search is one pure function; only the transport
    // differs. This is the corpus-scale query-set contract: past the
    // broadcast limit the driver never materializes the query set.
    val idx = Hnsw.build(spark, emb, shards = Shards)
    def run(limit: Long, chunk: Long): Seq[(Long, Long, Int, Double)] =
      Hnsw.search(spark, idx, qs, shards = Shards, k = 5, efS = 64,
        broadcastQueryLimit = limit, chunkRows = chunk)
        .select(col("q_id"), col("neighbor_id"), col("rank").cast("int"),
          col("cos"))
        .as[(Long, Long, Int, Double)].collect().sorted.toSeq
    val viaBroadcast = run(limit = 100000L, chunk = 50000L)
    val viaCogroup = run(limit = 0L, chunk = 3L) // 10 queries → 4 chunks
    assert(viaBroadcast == viaCogroup,
      "shard×chunk cogroup path must be bit-equal to the broadcast path")
  }

  test("incremental add rebuilds only touched shards, result == full rebuild") {
    // split the corpus: base = all but vec_id % 7 == 0, adds = the rest
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    val adds = emb.filter(col("vec_id") % 7 === 0)
    val idx0 = Hnsw.build(spark, base, shards = Shards)
    val grown = Hnsw.add(spark, idx0, adds, shards = Shards)
    val full = Hnsw.build(spark, emb, shards = Shards)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("shard"), col("vecId"), col("level"),
          to_json(struct(col("links"))), col("cn"))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(grown) == canon(full),
      "incremental add must equal the from-scratch rebuild exactly")
    // a no-op add passes the index through untouched
    val same = Hnsw.add(spark, idx0, adds.limit(0), shards = Shards)
    assert(canon(same) == canon(idx0))
  }

  test("a query is never its own neighbor; ranks are dense per query") {
    val idx = Hnsw.build(spark, emb, shards = Shards)
    val got = Hnsw.search(spark, idx, qs, shards = Shards, k = 5)
      .select(col("q_id"), col("neighbor_id"), col("rank").cast("int"))
      .as[(Long, Long, Int)].collect()
    assert(got.forall { case (q, n, _) => q != n })
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to 5), s"ranks for $q: ${rs.toSeq}")
    }
  }
}
