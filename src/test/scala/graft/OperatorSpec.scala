package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.LlmOps

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val emb = Tables(spark, sf, "embeddings")

  test("exact dedup finds planted duplicates and nothing else") {
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc"), (4L, "aa bb"), (5L, "dd"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L)
  }

  test("minhash LSH recovers high-Jaccard pairs (recall vs exact ≥ 0.8)") {
    val sh = LlmOps.shingles(docs)
    val exact = LlmOps.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jac") >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(sh, "doc_id", "sh", numHashes = 32, bands = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.count(mh.contains).toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall over ${exact.size} true pairs")
    }
    // estimates stay in [0,1]
    Dedup.minhashPairs(sh, "doc_id", "sh").select(min("est"), max("est"))
      .collect().headOption.foreach { r =>
        assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
      }
  }

  test("simhash: identical docs collide, near-identical docs are close") {
    val df = Seq(
      (1L, "spark scala query engine fast columnar batch"),
      (2L, "spark scala query engine fast columnar batch"),   // identical
      (3L, "spark scala query engine fast columnar stream"),  // 1 token off
      (4L, "completely different words entirely other thing zebra"),
    ).toDF("doc_id", "text")
    val sig = Dedup.simhashes(spark, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)))
    val pairs = Dedup.simhashPairs(spark, df, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding LSH pairs: cosine within [-1,1], no self/dup pairs") {
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", minCos = -1.0)
      .collect()
    assert(pairs.nonEmpty)
    val seen = collection.mutable.Set.empty[(Long, Long)]
    pairs.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      assert(c >= -1.0001 && c <= 1.0001)
      assert(seen.add((a, b)), s"duplicate pair ($a,$b)")
    }
  }

  test("IVF ANN: full probe ≡ brute force; partial probe trades recall") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(Similarity.bruteTopK(qs, emb, 5))
    val nCells = emb.select("label").distinct().count().toInt
    // probing every cell must recover the exact answer
    val full = pairsOf(Similarity.ivfTopK(qs, emb, "label", 5, nprobe = nCells))
    assert(full == brute)
    // partial probe: same cardinality, bounded recall loss (labels are
    // random cells over random 64-dim vectors — locality is weak by
    // construction, so the floor is loose; real embeddings cluster)
    val ivf = pairsOf(Similarity.ivfTopK(qs, emb, "label", 5, nprobe = 3))
    assert(ivf.size == brute.size)
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.15, s"IVF recall@5 = $recall")
  }

  test("SQ8 ANN: int8 shortlist + exact re-rank recovers the brute top-k") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(Similarity.bruteTopKExact(qs, emb, 5))
    val sq8 = pairsOf(Similarity.sq8TopK(qs, emb, k = 5, shortlist = 20))
    assert(sq8.size == brute.size)
    // 6-bit codes rank cosine well enough that a 4x shortlist recovers
    // nearly all true neighbors; the exact re-rank orders them
    val recall = brute.count(sq8.contains).toDouble / brute.size
    assert(recall >= 0.8, s"SQ8 recall@5 = $recall")
    // the full-corpus shortlist IS the exact answer (re-rank is exact)
    val full = pairsOf(Similarity.sq8TopK(qs, emb, k = 5,
      shortlist = emb.count().toInt))
    assert(full == brute)
  }

  test("LSH ANN: index-free buckets, sane recall, no fabricated rows") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(Similarity.bruteTopK(qs, emb, 5))
    val lsh = Similarity.lshTopK(qs, emb, 5)
    val got = pairsOf(lsh)
    assert(got.size <= brute.size) // sparse buckets may under-fill
    assert(got.nonEmpty)
    // every LSH result must be a genuine corpus vector with cos ≤ 1
    lsh.collect().foreach(r => assert(r.getDouble(3) <= 1.0001))
    // deterministic across partitionings
    val again = pairsOf(Similarity.lshTopK(
      qs.repartition(7), emb.repartition(11), 5))
    assert(got == again)
  }

  test("brute topk ranks by cosine descending, k rows per query") {
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rows = Similarity.bruteTopK(qs, emb, 4)
      .orderBy("q_id", "rank").collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.length == 4)
      val cs = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("exact-contract ANN (lsh/ivf): recall vs exact brute, partition-invariant") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(Similarity.bruteTopKExact(qs, emb, 5))
    assert(brute.nonEmpty)
    // integer-plane LSH: genuine subset-of-corpus results, useful recall
    val lsh = pairsOf(Similarity.lshTopKExact(qs, emb, 5))
    assert(lsh.nonEmpty)
    val lshRecall = brute.count(lsh.contains).toDouble / brute.size
    assert(lshRecall >= 0.15, s"int-plane LSH recall@5 = $lshRecall")
    // IVF with floored-integer centroids: full candidate count, recall floor
    val ivf = pairsOf(Similarity.ivfTopKExact(qs, emb, "label", 5, nprobe = 3))
    assert(ivf.size == brute.size)
    val ivfRecall = brute.count(ivf.contains).toDouble / brute.size
    assert(ivfRecall >= 0.15, s"int-centroid IVF recall@5 = $ivfRecall")
    // the judged contract must be partitioning-independent
    val again = pairsOf(Similarity.lshTopKExact(
      qs.repartition(7), emb.repartition(11), 5))
    assert(lsh == again)
  }

  test("exact-contract embedding pairs: agrees with float path on pair set") {
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same planes family, different arithmetic: quantization can only
    // perturb cosines at the 1e-5 level, so a 0.5-threshold pair set
    // from the integer path must be reproducible run-to-run
    val again = Dedup.embeddingPairsExact(
      emb.repartition(13), "vec_id", "embedding", minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == again)
    exact.foreach { case (a, b) => assert(a < b) }
  }

  test("multimodal metaExpr (judged, codegen) ≡ decodeMeta (codec harness)") {
    val media = Multimodal.fromDocuments(docs.limit(100))
    val viaExpr = Multimodal.metaExpr(media).orderBy("doc_id").collect()
    val viaMap = Multimodal.decodeMeta(spark, media).toDF()
      .select("doc_id", "media_type", "n_bytes", "width", "height", "n_frames")
      .orderBy("doc_id").collect()
    assert(viaExpr.sameElements(viaMap))
  }

  test("multimodal: real PNG/WAV headers parse back through decodeMeta") {
    val media = Multimodal.synthesizeMedia(spark, docs.limit(60))
    val meta = Multimodal.decodeMeta(spark, media.toDF()).collect()
    assert(meta.count(_.media_type == "image") > 0)
    assert(meta.count(_.media_type == "audio") > 0)
    meta.filter(_.media_type == "image").foreach { m =>
      // dimensions come from the IHDR bytes, not the payload size
      assert(m.width == 1 + (m.doc_id % 64).toInt, s"doc ${m.doc_id}")
      assert(m.height == 1 + (m.doc_id % 48).toInt)
      assert(m.n_bytes > 33 && m.sample_rate == 0) // full PNG: IDAT present
    }
    meta.filter(_.media_type == "audio").foreach { m =>
      assert(m.sample_rate == 8000 + (m.doc_id % 8).toInt * 1000, s"doc ${m.doc_id}")
      assert(m.channels == 1 + (m.doc_id % 2).toInt)
      assert(m.n_frames == 1 + (m.doc_id % 50).toInt)
    }
    // a corrupted IHDR (bad CRC) must fall back to the stub, not emit
    // garbage dimensions
    val png = Multimodal.pngBytes(100, 50)
    assert(Multimodal.parsePng(png).contains((100, 50)))
    val bad = png.clone(); bad(17) = (bad(17) ^ 0x1).toByte
    assert(Multimodal.parsePng(bad).isEmpty)
    assert(Multimodal.parseWav(Multimodal.wavBytes(44100, 2, 10))
      .contains((44100, 2, 10)))
  }

  test("multimodal decode stub: deterministic meta, frame sampling shape") {
    val media = Multimodal.fromDocuments(docs.limit(30))
    val meta = Multimodal.decodeMeta(spark, media).collect()
    assert(meta.length == 30)
    meta.foreach { m =>
      assert(m.width == 1 + m.n_bytes % 640)
      assert(m.height == 1 + m.n_bytes % 480)
      assert(Set("image", "audio", "video").contains(m.media_type))
    }
    val frames = Multimodal.sampleFrames(spark, media, 4)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach(r => assert(r.getLong(1) == 4))
    // non-decodable payloads (raw text bytes here): resize falls back
    // to the deterministic byte budget — the real-decode path is
    // covered in MultimodalPixelSpec
    val resized = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.nonEmpty)
    resized.foreach(r => assert(r.media.length == 64))
  }
}
