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
      iters: Int = 5): DataFrame = {
    val q = quantized(emb)
    val dsub = dims(emb) / m
    val subs = graft.CacheTracker.track(subvectors(q, m, dsub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    subs.count()
    val seedIds = q.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub).select(col("vec_id"))
    var books = subs.join(seedIds, "vec_id")
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
      .join(q.select(col("vec_id"), col("qn")), "vec_id")
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

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quant(col("embedding")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))

  private def dims(emb: DataFrame): Int =
    emb.select(size(col("embedding"))).head.getInt(0)

  private def headDim(q: DataFrame): Int =
    q.select(size(col("qa"))).head.getInt(0)
}
