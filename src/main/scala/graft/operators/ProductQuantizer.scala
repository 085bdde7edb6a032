package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Similarity.{idot, quant, sumsq}

/** Product quantization (Jégou et al., TPAMI 2011) under the exact-
  * integer contract — the memory-scaling move for billion-vector ANN:
  * a D-dim vector compresses to `m` one-byte codes (one per subspace,
  * against a `ksub`-centroid codebook), and query-time scoring reads
  * `m` lookup-table entries instead of D multiplies. At 100 TB the
  * difference is "the candidate set streams from memory" vs "it
  * doesn't fit".
  *
  * Determinism, same discipline as [[VectorIndex]]:
  *   - vectors quantize to µ-unit BIGINTs ([[Similarity.quant]]);
  *   - codebook training is Lloyd per subspace with integer argmin —
  *     minimizing ‖x−c‖² needs only `cn − 2·x·c` (the ‖x‖² term is
  *     constant per vector), EXACT in int64, code-id tiebreak, no
  *     division anywhere;
  *   - centroid updates are floored means of exact DECIMAL(38,0) sums
  *     (the 2⁵³ discipline);
  *   - ADC scores are exact integer sums of exact integer subspace
  *     dots; the one IEEE division happens only in the final cosine.
  * Same data ⇒ byte-identical codebooks, codes, and rankings on any
  * partitioning.
  *
  * Scale shape: training assignment is a broadcast join against
  * m·ksub codebook rows whose ksub-way fan-out collapses map-side
  * (`min_by` partial aggregation); encoding is one narrow pass; ADC
  * search broadcasts per-query LUTs (m·ksub longs each), scans the
  * code table once, and ranks through the bounded-heap
  * [[graft.plans.TopKPerGroupPlan]] — the post-scan shuffle carries at
  * most queries·k rows per partition, never the scored corpus.
  */
object ProductQuantizer {

  /** Split a quantized vector column into its `m` subvectors. */
  private def subvectors(q: DataFrame, m: Int, dsub: Int): DataFrame =
    q.select(col("vec_id"), explode(array((0 until m).map(i =>
      struct(lit(i).as("m"), slice(col("qa"), i * dsub + 1, dsub).as("sv"))
    ): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Integer argmin assignment: per (vector, subspace), the code
    * minimizing `cn − 2·sv·cm` (ties → lowest code). Spelled as a
    * `min_by` aggregation, not a window: the ksub-way fan-out collapses
    * back map-side (partial aggregation below the shuffle), so the
    * exchange carries one row per (vector, subspace) instead of sorting
    * all corpus·ksub scored rows. `(dist, code)` is unique per group
    * (codes are distinct), so the argmin is deterministic.
    */
  private def assignCodes(subs: DataFrame, books: DataFrame): DataFrame =
    subs.join(broadcast(books), Seq("m"))
      .withColumn("dist", col("cn") - lit(2L) * idot(col("sv"), col("cm")))
      .groupBy("vec_id", "m")
      .agg(min_by(struct(col("code"), col("sv")),
        struct(col("dist"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.code").as("code"), col("best.sv").as("sv"))

  /** Floored exact-integer means per (subspace, code). */
  private def subMeans(assigned: DataFrame): DataFrame =
    assigned.select(col("m"), col("code"), posexplode(col("sv")))
      .groupBy("m", "code", "pos")
      .agg(sum(col("col").cast(DecimalType(38, 0))).as("sx"),
        count(lit(1)).as("cnt"))
      .withColumn("v",
        ((col("sx") - pmod(col("sx"), col("cnt"))) / col("cnt")).cast("long"))
      .groupBy("m", "code")
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pm"))
      .select(col("m"), col("code"),
        expr("transform(pm, x -> x.v)").as("cm"))
      .withColumn("cn", sumsq(col("cm")))

  /** Train per-subspace codebooks: (m, code, cm, cn). Seeds are the
    * `ksub` lowest-`xxhash64(vec_id)` vectors' subvectors (the
    * [[VectorIndex]] seeding rule, applied per subspace); a fixed
    * `iters` Lloyd rounds; empty codes drop out.
    */
  def train(spark: SparkSession, emb: DataFrame, m: Int, ksub: Int,
      iters: Int = 5): DataFrame =
    trainQuantized(spark, quantized(emb), dims(emb), m, ksub, iters)

  /** [[train]] over an already-quantized frame `(vec_id, qa)` — the
    * entry the residual coder shares: IVF+PQ trains the SAME Lloyd
    * loop, just on residual vectors instead of raw ones.
    */
  private def trainQuantized(spark: SparkSession, q: DataFrame, dim: Int,
      m: Int, ksub: Int, iters: Int): DataFrame = {
    val dsub = dim / m
    val subs = graft.CacheTracker.track(subvectors(q, m, dsub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    subs.count()
    val seedIds = q.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub).select(col("vec_id"))
    // explicit broadcast: seedIds is ksub rows by construction; left to
    // the estimate the explode-derived subs side could be picked instead
    var books = subs.join(broadcast(seedIds), "vec_id")
      .withColumn("code", row_number().over(
        Window.partitionBy("m")
          .orderBy(xxhash64(col("vec_id")), col("vec_id"))).cast("int"))
      .select(col("m"), col("code"), col("sv").as("cm"))
      .withColumn("cn", sumsq(col("cm")))
    var i = 0
    while (i < iters) {
      books = subMeans(assignCodes(subs, books))
      i += 1
    }
    val out = books.cache()
    out.count()
    subs.unpersist(blocking = false)
    out
  }

  /** Encode vectors against frozen codebooks:
    * (vec_id, codes: array of `m` code ids ordered by subspace, qn —
    * the exact norm, rn — the RECONSTRUCTION's norm Σ‖c_{x,m}‖²,
    * which is the consistent denominator for ADC cosines: the
    * approximate dot is against the reconstruction, so normalizing by
    * the exact norm would systematically under-score vectors with
    * large quantization error).
    */
  def encode(spark: SparkSession, emb: DataFrame, books: DataFrame,
      m: Int): DataFrame = {
    val q = quantized(emb)
    val dsub = dims(emb) / m
    assignCodes(subvectors(q, m, dsub), books)
      .join(broadcast(books.select(col("m"), col("code"), col("cn"))),
        Seq("m", "code"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"),
        sum(col("cn")).as("rn"))
      .select(col("vec_id"), expr("transform(mc, x -> x.code)").as("codes"),
        col("rn"))
      // shuffle_hash: the left per-vec frame descends from an explode
      // (estimate meaningless) — never let it become a broadcast build
      .join(q.select(col("vec_id"), col("qn")).hint("shuffle_hash"),
        "vec_id")
  }

  /** Asymmetric-distance top-k: each query precomputes an m×ksub
    * lookup table of exact subspace dots against the codebooks (tiny —
    * broadcast), then every encoded vector scores with `m` array reads
    * and one IEEE division for the cosine. Approximation error comes
    * only from quantizing the DATA side to codebook cells; ranking is
    * deterministic (score desc, vec_id tiebreak).
    */
  def searchAdc(spark: SparkSession, queries: DataFrame, encoded: DataFrame,
      books: DataFrame, m: Int, ksub: Int, k: Int): DataFrame = {
    val q = queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))
    val dsub = headDim(q) / m
    val qsubs = q.select(col("q_id"), explode(array((0 until m).map(i =>
      struct(lit(i).as("m"), slice(col("qa"), i * dsub + 1, dsub).as("qsv"))
    ): _*)).as("s"))
      .select(col("q_id"), col("s.m").as("m"), col("s.qsv").as("qsv"))
    // per-query LUT: lut[m][code-1] = dot(q_m, centroid_{m,code}).
    // Codes are 1-based (row_number seeds); missing (empty) codes pad
    // with 0 via the dense sort below — they encode no vector, so the
    // pad is never read.
    val luts = qsubs.join(broadcast(books), Seq("m"))
      .withColumn("pdot", idot(col("qsv"), col("cm")))
      .groupBy("q_id", "m")
      .agg(array_sort(collect_list(struct(col("code"), col("pdot")))).as("cp"))
      .select(col("q_id"), col("m"), expr("transform(cp, x -> x.pdot)").as("row"),
        expr("transform(cp, x -> x.code)").as("rowCodes"))
      .groupBy("q_id")
      .agg(array_sort(collect_list(struct(col("m"), col("row"),
        col("rowCodes")))).as("mr"))
      .select(col("q_id"),
        expr("transform(mr, x -> x.row)").as("lut"),
        expr("transform(mr, x -> x.rowCodes)").as("lutCodes"))
      .join(q.select(col("q_id"), col("qn").as("q_qn")), "q_id")
    // ADC: for subspace i, read the LUT slot of codes[i]. Lookup is by
    // array_position (1-based, minus 1 for the 0-based index) so a
    // code id that dropped out during Lloyd leaves no misalignment;
    // every code in `encoded` was assigned FROM these books, so the
    // position always exists.
    val adc = expr(
      "aggregate(sequence(0, size(codes) - 1), 0L, (acc, i) -> " +
        "acc + lut[i][int(array_position(lutCodes[i], codes[i])) - 1])")
    // Ranking goes through the bounded-heap TopKPerGroup operator, NOT a
    // row_number window: the window formulation shuffles and sorts all
    // |corpus|·|queries| scored rows before discarding everything past
    // k, which defeats PQ's whole point (the code table is the only
    // corpus-sized thing touched). The bounded heap caps the shuffle at
    // queries·k rows per partition; the rank column is then numbered
    // over the ≤ queries·k survivors only.
    val scored = encoded.crossJoin(broadcast(luts))
      .withColumn("adc", adc)
      .withColumn("score", col("adc").cast("double") /
        sqrt(col("q_qn").cast("double") * col("rn").cast("double")))
    graft.plans.TopK.rankedPerGroup(scored, "q_id",
      Seq(("score", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("score"))
  }

  /** Two-stage search — the shape production PQ systems run: ADC
    * ranks a `shortlist` per query from the code table (cheap, coarse
    * — PQ resolves CLUSTERS, not fine intra-cluster order, because
    * same-cell vectors share codes), then only the shortlist is
    * re-ranked with exact quantized cosines against the full vectors.
    * Cost: one code-table scan + `shortlist` exact dots per query,
    * instead of a corpus-wide exact scan.
    */
  def searchAdcRerank(spark: SparkSession, queries: DataFrame,
      encoded: DataFrame, books: DataFrame, corpus: DataFrame,
      m: Int, ksub: Int, k: Int, shortlist: Int = 64): DataFrame = {
    val cand = searchAdc(spark, queries, encoded, books, m, ksub, shortlist)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    val q = broadcast(queries
      .select(col("q_id"), quant(col("q_emb")).as("q_qa"))
      .withColumn("q_qn", sumsq(col("q_qa"))))
    val exact = cand
      .join(quantized(corpus), "vec_id")
      .join(q, "q_id")
      .withColumn("cos", idot(col("q_qa"), col("qa")).cast("double") /
        sqrt(col("q_qn").cast("double") * col("qn").cast("double")))
    // shortlist·|queries| rows, but the same bounded-heap ranking keeps
    // the whole search path window-free
    graft.plans.TopK.rankedPerGroup(exact, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("cos"))
  }

  // ---------- IVF+PQ residual composition (Jégou 2011 §IV, IVFADC) ----------

  /** Exact-integer cell centroids for the coarse quantizer + each
    * vector's RESIDUAL against its cell: `(vec_id, cell, qa, ra)` with
    * `ra = qa − cm` componentwise (exact int64 — both sides are µ-unit
    * integers). PQ codes the residual, which is the recall move: cell
    * centroids absorb the coarse position, so the codebooks spend
    * their ksub^m capacity on the (much smaller) within-cell spread
    * instead of re-describing where the cell already is.
    */
  private def residuals(emb: DataFrame, cellCol: String,
      cents: DataFrame): DataFrame =
    quantized(emb)
      .join(emb.select(col("vec_id"), col(cellCol).as("cell")), "vec_id")
      .join(broadcast(cents.select(col("cell"), col("cm").as("ccm"))), "cell")
      .withColumn("ra", zip_with(col("qa"), col("ccm"), (x, c) => x - c))

  /** The IVF coarse quantizer: exact-integer centroids of `cellCol`'s
    * cells — `(cell, cm, cn)`, the [[Similarity.ivfTopKExact]]
    * centroid contract, so probe ranking is deterministic and shared
    * with the judged IVF query.
    */
  def cellCentroids(emb: DataFrame, cellCol: String): DataFrame =
    Similarity.centroidsExactQuantized(
      emb.select(col(cellCol).as("cell"), quant(col("embedding")).as("ca")))

  /** Train residual codebooks: the [[train]] Lloyd loop over
    * `qa − centroid(cell)` instead of raw vectors. One GLOBAL codebook
    * set shared by every cell (the published IVFADC layout — per-cell
    * books would need cells·m·ksub centroids of training data each).
    */
  def trainResidual(spark: SparkSession, emb: DataFrame, cellCol: String,
      cents: DataFrame, m: Int, ksub: Int, iters: Int = 5): DataFrame =
    trainQuantized(spark,
      residuals(emb, cellCol, cents).select(col("vec_id"), col("ra").as("qa")),
      dims(emb), m, ksub, iters)

  /** Encode each vector's residual against frozen residual codebooks:
    * `(vec_id, cell, codes, rn, qn)` where `rn` is the
    * RECONSTRUCTION's exact norm ‖c + r̂‖² = ‖c‖² + 2·c·r̂ + ‖r̂‖²
    * (r̂ = the concatenated code centroids) — the consistent cosine
    * denominator, same reasoning as [[encode]]'s `rn`. All integer:
    * the cross term is a sum of `m` exact subspace dots of the cell
    * centroid's slices against the code centroids.
    */
  def encodeIvf(spark: SparkSession, emb: DataFrame, cellCol: String,
      cents: DataFrame, books: DataFrame, m: Int): DataFrame = {
    val dsub = dims(emb) / m
    val res = residuals(emb, cellCol, cents)
    val assigned = assignCodes(
      res.select(col("vec_id"), col("ra").as("qa"))
        .transform(q => subvectors(q, m, dsub)), books)
    assigned
      .join(broadcast(books.select(col("m"), col("code"), col("cm"),
        col("cn"))), Seq("m", "code"))
      // shuffle_hash: left side is explode-descended (see encode)
      .join(res.select(col("vec_id"), col("cell"), col("ccm"))
        .hint("shuffle_hash"), "vec_id")
      .withColumn("csub",
        slice(col("ccm"), col("m") * lit(dsub) + lit(1), lit(dsub)))
      .withColumn("cross", idot(col("csub"), col("cm")))
      .groupBy("vec_id", "cell")
      .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"),
        (sum(col("cn")) + lit(2L) * sum(col("cross"))).as("resPart"))
      .join(broadcast(cents.select(col("cell"), col("cn").as("ccn"))), "cell")
      .select(col("vec_id"), col("cell"),
        expr("transform(mc, x -> x.code)").as("codes"),
        (col("ccn") + col("resPart")).as("rn"))
      .join(quantized(emb).select(col("vec_id"), col("qn"))
        .hint("shuffle_hash"), "vec_id")
  }

  /** IVF+PQ asymmetric search: probe the `nprobe` best cells by exact
    * centroid cosine, then ADC-score ONLY those cells' code tables.
    * The approximate dot decomposes exactly:
    * `q·x ≈ q·(c + r̂) = q·c + Σ_m lut[m][code_m]` — the per-probe
    * offset `q·c` falls out of probe ranking for free, and the LUT is
    * built once per QUERY (cell-independent: it reads the full query
    * subvectors against the global residual books, `m·ksub` longs).
    *
    * Scale shape vs flat PQ: the candidate scan touches |corpus|·
    * nprobe/|cells| code rows instead of the whole table, the probe
    * join broadcasts queries·nprobe rows, and ranking stays on the
    * bounded-heap operator — at a billion vectors this is the
    * published IVFADC cost model (Jégou 2011, Table III).
    */
  def searchIvfAdc(spark: SparkSession, queries: DataFrame,
      encoded: DataFrame, books: DataFrame, cents: DataFrame,
      m: Int, ksub: Int, k: Int, nprobe: Int = 3): DataFrame = {
    val q = queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))
    val dsub = headDim(q) / m
    // probes: exact centroid cosine, bounded-heap top-nprobe; keep the
    // integer offset q·c for the ADC decomposition
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("cdot", idot(col("qa"), col("cm")))
      .withColumn("ccos", col("cdot").cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
    val probes = graft.plans.TopK.rankedPerGroup(probed, "q_id",
      Seq(("ccos", false), ("cell", true)), nprobe)
      .select(col("q_id"), col("cell"), col("cdot").as("qc"))
    // per-query LUT against the residual books (same layout as searchAdc)
    val qsubs = q.select(col("q_id"), explode(array((0 until m).map(i =>
      struct(lit(i).as("m"), slice(col("qa"), i * dsub + 1, dsub).as("qsv"))
    ): _*)).as("s"))
      .select(col("q_id"), col("s.m").as("m"), col("s.qsv").as("qsv"))
    val luts = qsubs.join(broadcast(books), Seq("m"))
      .withColumn("pdot", idot(col("qsv"), col("cm")))
      .groupBy("q_id", "m")
      .agg(array_sort(collect_list(struct(col("code"), col("pdot")))).as("cp"))
      .select(col("q_id"), col("m"), expr("transform(cp, x -> x.pdot)").as("row"),
        expr("transform(cp, x -> x.code)").as("rowCodes"))
      .groupBy("q_id")
      .agg(array_sort(collect_list(struct(col("m"), col("row"),
        col("rowCodes")))).as("mr"))
      .select(col("q_id"),
        expr("transform(mr, x -> x.row)").as("lut"),
        expr("transform(mr, x -> x.rowCodes)").as("lutCodes"))
      .join(q.select(col("q_id"), col("qn").as("q_qn")), "q_id")
    val adc = expr(
      "aggregate(sequence(0, size(codes) - 1), 0L, (acc, i) -> " +
        "acc + lut[i][int(array_position(lutCodes[i], codes[i])) - 1])")
    val scored = encoded
      .join(broadcast(probes.join(luts, "q_id")), Seq("cell"))
      .withColumn("adc", col("qc") + adc)
      .withColumn("score", col("adc").cast("double") /
        sqrt(col("q_qn").cast("double") * col("rn").cast("double")))
    graft.plans.TopK.rankedPerGroup(scored, "q_id",
      Seq(("score", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("score"))
  }

  /** Two-stage IVF+PQ: ADC shortlist from the probed cells, exact
    * quantized re-rank — [[searchAdcRerank]]'s shape on the IVF path.
    */
  def searchIvfAdcRerank(spark: SparkSession, queries: DataFrame,
      encoded: DataFrame, books: DataFrame, cents: DataFrame,
      corpus: DataFrame, m: Int, ksub: Int, k: Int, nprobe: Int = 3,
      shortlist: Int = 64): DataFrame = {
    val cand = searchIvfAdc(spark, queries, encoded, books, cents,
      m, ksub, shortlist, nprobe)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    val q = broadcast(queries
      .select(col("q_id"), quant(col("q_emb")).as("q_qa"))
      .withColumn("q_qn", sumsq(col("q_qa"))))
    val exact = cand
      .join(quantized(corpus), "vec_id")
      .join(q, "q_id")
      .withColumn("cos", idot(col("q_qa"), col("qa")).cast("double") /
        sqrt(col("q_qn").cast("double") * col("qn").cast("double")))
    graft.plans.TopK.rankedPerGroup(exact, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("cos"))
  }

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quant(col("embedding")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))

  private def dims(emb: DataFrame): Int =
    emb.select(size(col("embedding"))).head.getInt(0)

  private def headDim(q: DataFrame): Int =
    q.select(size(col("qa"))).head.getInt(0)
}
