package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** Product quantization under the exact-integer contract: byte codes
  * + per-query LUTs must rank near-exactly on clustered data, and the
  * whole train/encode/search pipeline must be bit-deterministic on
  * any partitioning.
  */
class ProductQuantizerSpec extends SparkSpec {

  // 16 subspaces × 4 dims, 64 codes each: 16 bytes/vector (32× over
  // raw floats, 256× over quantized longs). Coarser settings (M=4)
  // reconstruct too little of THIS corpus's energy to rank — its
  // variance is spread across all 64 dims, the data shape OPQ
  // rotations exist for; M=16/K=64 reconstructs ~80% and ranks well.
  private val M = 16
  private val Ksub = 64

  private def emb = Tables(spark, sf, "embeddings")

  test("codes compress D dims to M bytes; every vector encodes against a live codebook") {
    val books = ProductQuantizer.train(spark, emb, M, Ksub, iters = 3)
    val bk = books.collect()
    assert(bk.map(r => r.getInt(0)).distinct.sorted.sameElements(0 until M))
    assert(bk.length <= M * Ksub)
    val enc = ProductQuantizer.encode(spark, emb, books, M)
    assert(enc.count() == emb.count())
    val sizes = enc.select(size(col("codes"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(M),
      "every vector must carry exactly M codes")
    // codes reference existing codebook entries only
    val codePairs = enc.select(posexplode(col("codes")))
      .select(col("pos").as("m"), col("col").as("code")).distinct()
    val dangling = codePairs.join(books.select("m", "code"),
      Seq("m", "code"), "left_anti").count()
    assert(dangling == 0, "every emitted code must exist in the books")
  }

  test("ADC ranks near-exactly; ADC+exact re-rank recovers the true top-10") {
    val books = ProductQuantizer.train(spark, emb, M, Ksub, iters = 3)
    val enc = ProductQuantizer.encode(spark, emb, books, M)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = graft.operators.Similarity.bruteTopKExact(queries, emb, 10)
    val e = exact.select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // stage 1 alone: 16-byte codes against a 500-vector corpus (one
    // extra slot absorbs the self-match the brute reference excludes)
    val approx = ProductQuantizer
      .searchAdc(spark, queries, enc, books, M, Ksub, k = 11)
    val a = approx.select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => p._1 != p._2).toSet
    val rawRecall = a.intersect(e).size.toDouble / e.size
    assert(rawRecall >= 0.4,
      f"raw ADC recall@10 $rawRecall%.2f — 16-byte codes must rank far " +
        "better than the 0.02 of chance")
    // self-queries must score themselves first (reconstruction is
    // closest to its own vector)
    val self = approx.filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(self.forall { case (q, n) => q == n },
      "every self-query must rank itself first")

    // stage 2: exact re-rank of the ADC shortlist
    val reranked = ProductQuantizer.searchAdcRerank(
      spark, queries, enc, books, emb, M, Ksub, k = 11, shortlist = 64)
    val r = reranked.select(col("q_id"), col("neighbor_id")).collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).filter(p => p._1 != p._2).toSet
    val recall = r.intersect(e).size.toDouble / e.size
    assert(recall >= 0.8,
      f"re-ranked recall@10 $recall%.2f — a 64-vector ADC shortlist " +
        "plus exact re-rank must recover the true neighbors")
    assert(recall >= rawRecall, "re-ranking must not lose recall")
  }

  test("bit-determinism: books, codes, and rankings identical on any partitioning") {
    def run(part: Int): (Set[String], Set[String]) = {
      val e = emb.repartition(part)
      val books = ProductQuantizer.train(spark, e, M, Ksub, iters = 2)
      val enc = ProductQuantizer.encode(spark, e, books, M)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val res = ProductQuantizer
        .searchAdc(spark, queries, enc, books, M, Ksub, k = 5)
      (books.collect().map(_.toString).toSet,
        res.collect().map(_.toString).toSet)
    }
    val (b1, r1) = run(2)
    val (b7, r7) = run(7)
    assert(b1 == b7, "codebooks must be partition-invariant")
    assert(r1 == r7, "ADC rankings must be partition-invariant")
  }

  test("IVF+PQ residual coding: raw-ADC recall beats the flat-PQ floor at the same M·Ksub budget") {
    val cents = ProductQuantizer.cellCentroids(emb, "label")
    val books = ProductQuantizer.trainResidual(spark, emb, "label", cents,
      M, Ksub, iters = 3)
    val enc = ProductQuantizer.encodeIvf(spark, emb, "label", cents, books, M)
    assert(enc.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = graft.operators.Similarity.bruteTopKExact(queries, emb, 10)
    val e = exact.select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probe ALL cells so the comparison isolates residual coding from
    // probe misses: same corpus coverage as flat searchAdc, same code
    // budget, only the coding target differs
    val nCells = cents.count().toInt
    val raw = ProductQuantizer.searchIvfAdc(spark, queries, enc, books,
      cents, M, Ksub, k = 11, nprobe = nCells)
    val a = raw.select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => p._1 != p._2).toSet
    val rawRecall = a.intersect(e).size.toDouble / e.size
    assert(rawRecall >= 0.6,
      f"residual raw-ADC recall@10 $rawRecall%.2f — coding residuals " +
        "must lift the 0.4 flat-PQ floor (cells absorb coarse position)")
    val self = raw.filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(self.forall { case (q, n) => q == n },
      "every self-query must rank itself first")
    // full-coverage re-rank recovers the true top-10
    val rerankedFull = ProductQuantizer.searchIvfAdcRerank(spark, queries,
      enc, books, cents, emb, M, Ksub, k = 11, nprobe = nCells,
      shortlist = 64)
    val rf = rerankedFull.select(col("q_id"), col("neighbor_id")).collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).filter(p => p._1 != p._2).toSet
    val recallFull = rf.intersect(e).size.toDouble / e.size
    assert(recallFull >= 0.8,
      f"IVF+PQ re-ranked recall@10 $recallFull%.2f at full probe coverage")
    // production shape: at nprobe=3 recall is CAPPED by probe coverage
    // (neighbors in unprobed cells are invisible by construction — the
    // judged ann_ivf query shares this ceiling); the composed search
    // must ATTAIN that ceiling, not lose further recall to coding
    val ivfCeiling = graft.operators.Similarity
      .ivfTopKExact(queries, emb, "label", k = 11, nprobe = 3)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).filter(p => p._1 != p._2).toSet
    val ceil = ivfCeiling.intersect(e).size.toDouble / e.size
    val reranked = ProductQuantizer.searchIvfAdcRerank(spark, queries,
      enc, books, cents, emb, M, Ksub, k = 11, nprobe = 3, shortlist = 64)
    val r = reranked.select(col("q_id"), col("neighbor_id")).collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).filter(p => p._1 != p._2).toSet
    val recall = r.intersect(e).size.toDouble / e.size
    assert(recall >= ceil - 0.05,
      f"IVF+PQ nprobe=3 recall $recall%.2f fell below its own probe " +
        f"ceiling $ceil%.2f — residual coding must not cost recall " +
        "beyond probe misses")
  }

  test("IVF+PQ bit-determinism: centroids, books, and rankings identical on any partitioning") {
    def run(part: Int): (Set[String], Set[String], Set[String]) = {
      val e = emb.repartition(part)
      val cents = ProductQuantizer.cellCentroids(e, "label")
      val books = ProductQuantizer.trainResidual(spark, e, "label", cents,
        M, Ksub, iters = 2)
      val enc = ProductQuantizer.encodeIvf(spark, e, "label", cents, books, M)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val res = ProductQuantizer.searchIvfAdc(spark, queries, enc, books,
        cents, M, Ksub, k = 5, nprobe = 3)
      (cents.collect().map(_.toString).toSet,
        books.collect().map(_.toString).toSet,
        res.collect().map(_.toString).toSet)
    }
    val (c1, b1, r1) = run(2)
    val (c7, b7, r7) = run(7)
    assert(c1 == c7, "cell centroids must be partition-invariant")
    assert(b1 == b7, "residual codebooks must be partition-invariant")
    assert(r1 == r7, "IVF+PQ rankings must be partition-invariant")
  }
}
