package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns.cosine

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.2 L3): brute-force cosine top-k as the exact baseline, and
  * an IVF (inverted-file) variant as the scale path — centroids built
  * with a relational per-dimension average, probes pruned to the nearest
  * `nprobe` cells so the scored candidate set is a fraction of the
  * corpus. Queries are broadcast (they're the small side by
  * construction), so corpus scoring is shuffle-free; per-query top-k
  * ranking goes through the bounded-heap
  * [[graft.plans.TopKPerGroupPlan]] operator, whose map-side partials
  * cap the post-scoring shuffle at queries·k rows per partition —
  * never the scored candidates, let alone the corpus.
  */
object Similarity {

  /** Exact cosine top-k: every (query, corpus) pair scored via a
    * broadcast join, ranked per query. O(|Q|·|C|) scoring — the
    * correctness baseline the ANN variants are measured against.
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("q_id"), col("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(q, col("q_id") =!= col("vec_id")) // a query is not its own neighbor
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    graft.plans.TopK.rankedPerGroup(scored, "q_id",
      Seq(("cos", false), ("vec_id", true)), k, rankType = "int")
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Exact cosine top-k on QUANTIZED embeddings — the reproducibility
    * contract for the hash gate. Each component is floored to integer
    * micro-units (`floor(double(x)·10⁶)`), so dot products and squared
    * norms are exact BIGINTs; the final cosine is built from those
    * integers with single IEEE ops (`(double)dot / sqrt((double)na·nb)`)
    * — bit-identical on every engine, hence hash-judgeable, unlike raw
    * float accumulation whose rounding is engine/order-dependent.
    * Same broadcast-queries shape as [[bruteTopK]].
    */
  /** Micro-unit quantization (`floor(double(x)·10⁶)` per component) —
    * the shared substrate of every hash-judged similarity query: all
    * downstream sums/dots are exact BIGINTs.
    */
  private[operators] def quant(c: org.apache.spark.sql.Column) =
    transform(c, x => floor(x.cast("double") * lit(1000000.0)))
  private[operators] def sumsq(c: org.apache.spark.sql.Column) =
    aggregate(c, lit(0L), (acc, v) => acc + v * v)
  private[operators] def idot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Int8 scalar quantization (the SQ8 tier, Jégou et al.'s scalar
    * baseline): `clamp(floor(x·64), -127, 127)` per component — one
    * byte of signal per dimension instead of four, exact integer dots.
    * At 100 TB this is the scan-tier compression lever: the candidate
    * scan moves ~8× fewer bytes and the exact re-rank touches only
    * shortlist·queries rows.
    */
  private[operators] def quant8(c: org.apache.spark.sql.Column) =
    transform(c, x => greatest(lit(-127L), least(lit(127L),
      floor(x.cast("double") * lit(64.0)))))

  /** SQ8 two-tier search under the hash-gate contract: score ALL
    * candidates by the int8 code dot (cheap), keep a per-query
    * shortlist via the bounded-heap operator, re-rank ONLY the
    * shortlist by the exact micro-unit cosine ([[quant]]) after
    * REJOINING the vectors (the shortlist heap never carries full
    * embeddings). Both tiers are exact integer programs —
    * deterministic across engines and partitionings.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k)
    val q8 = broadcast(queries.select(col("q_id"), quant8(col("q_emb")).as("q8")))
    val cand = corpus.select(col("vec_id"), quant8(col("embedding")).as("c8"))
      .join(q8, col("q_id") =!= col("vec_id"))
      .withColumn("d8", idot(col("q8"), col("c8")))
      .select("q_id", "vec_id", "d8")
    val short = graft.plans.TopK.perGroup(cand, Seq("q_id"),
      Seq(("d8", false), ("vec_id", true)), shortlist)
    val qv = broadcast(queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa"))))
    val rer = short.select("q_id", "vec_id")
      .join(corpus.select(col("vec_id"), quant(col("embedding")).as("ca")),
        "vec_id")
      .withColumn("cn", sumsq(col("ca")))
      .join(qv, "q_id")
      .withColumn("dot", idot(col("qa"), col("ca")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
    graft.plans.TopK.rankedPerGroup(rer, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("cos"))
  }

  /** DuckDB oracle for [[sq8TopK]]: same int8 clamp-floor codes, same
    * shortlist ordering, same micro-unit re-rank IEEE-op sequence.
    */
  /** @param relation the embeddings relation — defaults to the SF-dir
    *   `embeddings` view; the second-scale judged row passes a direct
    *   `read_parquet('<fixed sf0.001 path>')` so the driver gate sees
    *   the tier at a second corpus size in the SAME round.
    */
  def sq8TopKOracleSql(maxQueryId: Int, k: Int, shortlist: Int,
      relation: String = "embeddings"): String =
    s"""WITH xs AS (
           SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
                  embedding FROM $relation),
         comp AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
                  FROM xs),
         q8 AS (SELECT vec_id, i,
                  GREATEST(-127, LEAST(127,
                    CAST(FLOOR(x * 64.0) AS BIGINT))) AS v
                FROM comp),
         qa AS (SELECT vec_id, i,
                  CAST(FLOOR(x * 1000000.0) AS BIGINT) AS v FROM comp),
         d8 AS (
           SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                  CAST(SUM(q.v * c.v) AS BIGINT) AS d8
           FROM q8 q JOIN q8 c ON q.i = c.i AND q.vec_id <> c.vec_id
           WHERE q.vec_id < $maxQueryId
           GROUP BY q.vec_id, c.vec_id),
         short AS (
           SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id,
                    ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY d8 DESC, vec_id) AS r
             FROM d8) s WHERE r <= $shortlist),
         nrm AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nn
                 FROM qa GROUP BY vec_id),
         dots AS (
           SELECT s.q_id, s.vec_id, CAST(SUM(q.v * c.v) AS BIGINT) AS dot
           FROM short s JOIN qa q ON q.vec_id = s.q_id
                        JOIN qa c ON c.vec_id = s.vec_id AND c.i = q.i
           GROUP BY s.q_id, s.vec_id),
         scored AS (
           SELECT d.q_id, d.vec_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(nq.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
                       JOIN nrm nc ON nc.vec_id = d.vec_id)
       SELECT q_id, vec_id AS neighbor_id, rank, cos FROM (
         SELECT q_id, vec_id, cos,
                ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rank
         FROM scored) r
       WHERE rank <= $k ORDER BY q_id, rank"""

  def bruteTopKExact(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa"))))
    val cand = corpus.select(col("vec_id"), quant(col("embedding")).as("ca"))
      .withColumn("cn", sumsq(col("ca")))
      .join(q, col("q_id") =!= col("vec_id")) // a query is not its own neighbor
      .withColumn("dot", idot(col("qa"), col("ca")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
    // bounded-heap ranking (graft.plans.TopKPerGroupPlan): map-side
    // partials cap the post-scoring shuffle at queries·k rows per
    // partition instead of sorting every scored pair per query
    graft.plans.TopK.rankedPerGroup(cand, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** DuckDB oracle for [[bruteTopKExact]] over the `embeddings` table:
    * the same quantization, integer sums, and IEEE-op sequence.
    */
  def bruteTopKExactOracleSql(maxQueryId: Int, k: Int): String =
    s"""WITH xs AS (
           SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
                  embedding FROM embeddings),
         qv AS (SELECT vec_id,  i,
                  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
                FROM xs),
         nrm AS (SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nn
                 FROM qv GROUP BY vec_id),
         dots AS (
           SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                  CAST(SUM(q.x * c.x) AS BIGINT) AS dot
           FROM qv q JOIN qv c ON q.i = c.i AND q.vec_id <> c.vec_id
           WHERE q.vec_id < $maxQueryId
           GROUP BY q.vec_id, c.vec_id),
         scored AS (
           SELECT d.q_id, d.vec_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(nq.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
                       JOIN nrm nc ON nc.vec_id = d.vec_id)
       SELECT q_id, vec_id AS neighbor_id, rank, cos FROM (
         SELECT q_id, vec_id, cos,
                ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, vec_id) AS rank
         FROM scored) r
       WHERE rank <= $k ORDER BY q_id, rank"""

  /** Per-cell centroids as a relational plan: posexplode → per-(cell,
    * dim) average → re-assemble ordered arrays. No driver-side math.
    */
  def centroids(corpus: DataFrame, cellCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"), posexplode(col("embedding")))
      .groupBy("cell", "pos")
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, x -> x.m)").as("centroid"))

  /** LSH-bucketed top-k: corpus and queries hash into random-hyperplane
    * sign buckets (multi-table for recall, same machinery as
    * [[Dedup.embeddingPairs]]); each query scores only same-bucket
    * candidates. Unlike IVF there is no centroid build — the partition
    * function is data-independent, so ingest is a pure map and the
    * index "build" is free; recall comes from table count.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, tables: Int = 4, planesPerTable: Int = 6): DataFrame = {
    import graft.functions.VectorFns.planeSign
    val ps = Dedup.planes(tables * planesPerTable, dim)
    def buckets(vec: org.apache.spark.sql.Column) =
      array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          (0 until planesPerTable)
            .map(j => planeSign(vec, ps(t * planesPerTable + j)) * lit(1 << j))
            .reduce(_ + _).as("bkt"))
      }: _*)
    // dedup multi-table collisions on the ID PAIR alone, then rejoin the
    // vectors — never shuffle two full embeddings per candidate just to
    // distinct them (at scale the distinct's exchange would carry 2×dim
    // floats per row instead of two longs)
    val qb = queries.select(col("q_id"), explode(buckets(col("q_emb"))).as("tb"))
    val cb = corpus.select(col("vec_id"), explode(buckets(col("embedding"))).as("tb"))
    // broadcast the QUERY band rows explicitly (this tier's contract is
    // an interactive query batch; corpus-scale query sets take the
    // sharded paths) — cb is explode-derived, so left to the estimate
    // the planner can pick the CORPUS side as the broadcast build
    val candIds = broadcast(qb).join(cb, "tb")
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct() // a pair may collide in several tables
    val cand = candIds
      .join(broadcast(queries.select(col("q_id"), col("q_emb"))), "q_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    graft.plans.TopK.rankedPerGroup(cand, "q_id",
      Seq(("cos", false), ("vec_id", true)), k, rankType = "int")
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** LSH top-k under the hash-gate contract: quantized vectors
    * ([[quant]]) bucketed by INTEGER hyperplanes
    * ([[graft.functions.VectorFns.intPlanes]]) — sign decisions are
    * exact integer comparisons, so the oracle re-derives the identical
    * candidate set in DuckDB SQL; scoring is the [[bruteTopKExact]]
    * integer contract. Same shuffle shape as [[lshTopK]] (bucket join
    * on id pairs, vectors re-joined after the distinct).
    */
  def lshTopKExact(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, tables: Int = 4, planesPerTable: Int = 6): DataFrame = {
    import graft.functions.VectorFns.{intPlanes, intPlaneDot}
    val ps = intPlanes(tables * planesPerTable, dim)
    def buckets(qv: org.apache.spark.sql.Column) =
      array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          (0 until planesPerTable)
            .map(j => when(intPlaneDot(qv, ps(t * planesPerTable + j)) >= 0,
              lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("bkt"))
      }: _*)
    val q = queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
    val c = corpus.select(col("vec_id"), quant(col("embedding")).as("ca"))
    val qb = q.select(col("q_id"), explode(buckets(col("qa"))).as("tb"))
    val cb = c.select(col("vec_id"), explode(buckets(col("ca"))).as("tb"))
    // same query-side broadcast pin as lshTopK — never the corpus side
    val candIds = broadcast(qb).join(cb, "tb")
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct()
    val cand = candIds
      .join(broadcast(q.withColumn("qn", sumsq(col("qa")))), "q_id")
      .join(c.withColumn("cn", sumsq(col("ca"))), "vec_id")
      .withColumn("dot", idot(col("qa"), col("ca")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
    graft.plans.TopK.rankedPerGroup(cand, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** DuckDB oracle for [[lshTopKExact]]: same quantization, same
    * md5-derived integer planes, same band/bucket packing, same scoring
    * contract — generated from the same constants.
    */
  def lshTopKExactOracleSql(maxQueryId: Int, k: Int,
      dim: Int = 64, tables: Int = 4, planesPerTable: Int = 6): String =
    s"""WITH xs AS (
           SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
                  embedding FROM embeddings),
         qv AS (SELECT vec_id, i,
                  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
                FROM xs),
         nrm AS (SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nn
                 FROM qv GROUP BY vec_id),
         pl AS (${graft.functions.VectorFns.intPlanesSql(tables * planesPerTable, dim)}),
         dp AS (SELECT v.vec_id, pl.p, CAST(SUM(v.x * pl.w) AS BIGINT) AS d
                FROM qv v JOIN pl ON v.i = pl.i GROUP BY v.vec_id, pl.p),
         bk AS (SELECT vec_id, p // $planesPerTable AS t,
                  CAST(SUM(CASE WHEN d >= 0 THEN (1 << (p % $planesPerTable)) ELSE 0 END) AS BIGINT) AS bkt
                FROM dp GROUP BY vec_id, p // $planesPerTable),
         cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id
                  FROM bk q JOIN bk c ON q.t = c.t AND q.bkt = c.bkt
                  WHERE q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id),
         dots AS (SELECT cd.q_id, cd.vec_id, CAST(SUM(q.x * c.x) AS BIGINT) AS dot
                  FROM cand cd
                  JOIN qv q ON q.vec_id = cd.q_id
                  JOIN qv c ON c.vec_id = cd.vec_id AND c.i = q.i
                  GROUP BY cd.q_id, cd.vec_id),
         scored AS (
           SELECT d.q_id, d.vec_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(nq.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
                       JOIN nrm nc ON nc.vec_id = d.vec_id)
       SELECT q_id, vec_id AS neighbor_id, rank, cos FROM (
         SELECT q_id, vec_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         FROM scored) r
       WHERE rank <= $k ORDER BY q_id, rank"""

  /** IVF top-k: assign each query to its `nprobe` nearest cells by
    * centroid cosine, score only corpus vectors in those cells. Recall
    * < 1 by construction; the candidate set shrinks by ~|cells|/nprobe.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: String,
      k: Int, nprobe: Int = 3): DataFrame = {
    val cents = centroids(corpus, cellCol)
    val wq = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("q_emb"), col("centroid")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    val cand = corpus.select(col(cellCol).as("cell"), col("vec_id"), col("embedding"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    graft.plans.TopK.rankedPerGroup(cand, "q_id",
      Seq(("cos", false), ("vec_id", true)), k, rankType = "int")
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Exact-integer cell centroids over a pre-quantized frame
    * `(cell, ca: array<long>, …)`: per-component exact sums, floored
    * to an integer mean (`floor(double(Σx)/n)` — one IEEE division +
    * floor, bit-identical cross-engine; NOT `//`, whose
    * negative-operand semantics differ between engines). Shared by
    * [[ivfTopKExact]] and the IVF+PQ residual coder
    * ([[ProductQuantizer.trainResidual]]).
    */
  private[operators] def centroidsExactQuantized(c: DataFrame): DataFrame =
    c.select(col("cell"), posexplode(col("ca")))
      .groupBy("cell", "pos")
      .agg(sum(col("col")).as("sx"), count(lit(1)).as("cnt"))
      .withColumn("m", floor(col("sx").cast("double") / col("cnt")))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, x -> x.m)").as("cm"))
      .withColumn("cn", sumsq(col("cm")))

  /** IVF top-k under the hash-gate contract: centroids are exact
    * integer sums of quantized components, floored to a per-component
    * integer mean (`floor(double(Σx)/n)` — one IEEE division + floor,
    * bit-identical cross-engine; NOT `//`, whose negative-operand
    * semantics differ between engines). Cell ranking and candidate
    * scoring both follow the [[bruteTopKExact]] single-IEEE-op cosine
    * contract, so probes and results are deterministic and the whole
    * operator is hash-judged. Same pruned-candidate shape as
    * [[ivfTopK]].
    */
  def ivfTopKExact(queries: DataFrame, corpus: DataFrame, cellCol: String,
      k: Int, nprobe: Int = 3): DataFrame = {
    val q = queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))
    val c = corpus.select(col("vec_id"), col(cellCol).as("cell"),
      quant(col("embedding")).as("ca"))
    val cm = centroidsExactQuantized(c)
    val wq = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cm))
      .withColumn("cdot", idot(col("qa"), col("cm")))
      .withColumn("ccos", col("cdot").cast("double") /
        sqrt(col("qn").cast("double") * col("cn").cast("double")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("qa"), col("qn"), col("cell"))
    val cand = c.withColumn("vn", sumsq(col("ca")))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("dot", idot(col("qa"), col("ca")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("qn").cast("double") * col("vn").cast("double")))
    graft.plans.TopK.rankedPerGroup(cand, "q_id",
      Seq(("cos", false), ("vec_id", true)), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540) under the hash-gate contract: seed cells (the
    * `seedCol` labels) yield exact-integer centroids (the
    * [[ivfTopKExact]] centroid contract), every corpus vector is
    * REASSIGNED to its nearest centroid by the quantized cosine (one
    * Lloyd step — deterministic, cell-id tiebreak), and near-dup pairs
    * are scored ONLY within each assigned cluster. The published
    * SemDeDup cost model exactly: O(n·k) assignment against a broadcast
    * centroid frame (cells ≪ corpus) + O(Σ|cell|²) intra-cluster
    * pairing — never O(n²) across the corpus; cluster count k is the
    * scale lever. Returns (cell, a_id, b_id, cos) with a_id < b_id —
    * downstream dedup keeps a_id (min-id canonical).
    *
    * `subCells` MOVES the lever: a fixed-cardinality seed column means
    * cells densify as the corpus grows and the Σ|cell|² term turns
    * quadratic. With `subCells = S > 1` each seed label splits into S
    * sub-seeds by `vec_id mod S` (cell id = label·S + vec_id mod S, a
    * BIGINT), so k follows whatever growth the caller derives — the
    * judged query uses k ≈ √n (S ≈ ⌈√n⌉/#labels), balancing the O(n·k)
    * assignment and the O(n²/k) pairing at O(n^1.5). Sub-seed
    * centroids of one label differ only by sampling noise, so the
    * Lloyd reassignment spreads the label's vectors near-uniformly
    * across its sub-cells (each vector's preferred noise direction is
    * its own); exact copies still land together — reassignment is a
    * pure function of the embedding. `subCells = 0` (default) is the
    * original fixed-seed behavior, cell keeping the seed column's
    * type; ANY `subCells >= 1` takes the scaled BIGINT formula — a
    * derived S that collapses to 1 must still type `cell` exactly
    * like S = 2 would, or the judged row's schema would flip under
    * the oracle at corpora where ⌈√n⌉ ≤ #labels.
    */
  def semanticPairsExact(corpus: DataFrame, seedCol: String,
      subCells: Int = 0): DataFrame = {
    val seed =
      if (subCells < 1) col(seedCol).as("cell")
      else (col(seedCol).cast("long") * subCells +
        pmod(col("vec_id"), lit(subCells.toLong))).as("cell")
    val c = corpus.select(col("vec_id"), seed,
      quant(col("embedding")).as("ca"))
      .withColumn("vn", sumsq(col("ca")))
    val cm = c.select(col("cell"), posexplode(col("ca")))
      .groupBy("cell", "pos")
      .agg(sum(col("col")).as("sx"), count(lit(1)).as("cnt"))
      .withColumn("m", floor(col("sx").cast("double") / col("cnt")))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, x -> x.m)").as("cm"))
      .withColumn("cn", sumsq(col("cm")))
    val wv = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell"))
    // the seed cell's job ends at the centroid build — drop it so the
    // reassignment join carries ONE `cell` (the candidate centroid's).
    // Round 16: `assigned` feeds BOTH sides of the cell self-join —
    // unpersisted, the whole reassignment (centroid cross join +
    // per-vector window) executed ~2× per run. Persist + force: one
    // assignment pass, two cached reads. corpus × quantized-vector —
    // bounded, the same trade the byShingle index makes.
    val assigned = graft.CacheTracker.track(
      c.drop("cell").crossJoin(broadcast(cm))
        .withColumn("cdot", idot(col("ca"), col("cm")))
        .withColumn("ccos", col("cdot").cast("double") /
          sqrt(col("vn").cast("double") * col("cn").cast("double")))
        .withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .select(col("cell"), col("vec_id"), col("ca"), col("vn"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("ca").as("aa"), col("vn").as("an"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("ca").as("ba"), col("vn").as("bn"))
    // merge-pinned: corpus-scale self-join whose sides descend from a
    // window over a broadcast cross join — the default size estimate
    // is meaningless, and a misestimate here statically broadcasts a
    // corpus-sized frame (see Dedup.ngramJaccardPairs)
    a.join(b.hint("merge"), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dot", idot(col("aa"), col("ba")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("an").cast("double") * col("bn").cast("double")))
      .select(col("cell"), col("a_id"), col("b_id"), col("cos"))
  }

  /** DuckDB oracle for [[semanticPairsExact]] over `embeddings` with
    * seed column `label`, top-`limit` pairs by cosine: same centroid,
    * assignment, and scoring contract re-derived in SQL — including
    * the SCALE-FOLLOWING sub-cell derivation (round 15): both sides
    * independently compute S = max(1, ⌈⌈√n⌉ / #labels⌉) from the same
    * table (integer ceil-div; √ is one IEEE double sqrt on both
    * engines, so ⌈√n⌉ is bit-identical) and seed with
    * cell = label·S + vec_id mod S.
    */
  /** sf1-scale formulation (round 13): the original spelled every
    * pair dot as a per-(pair, dimension) JOIN — Σ_cell C(n,2) · dim
    * rows, 1.28 BILLION at 20k vectors / 10 cells / dim 64, which ran
    * >60 min. This version carries each vector as ONE quantized
    * BIGINT list and computes dots with `list_dot_product` — same
    * count of arithmetic ops, no join materialization (measured 46 s
    * at the same shape; identical rows at sf0.01/sf0.1).
    *
    * EXACTNESS: `list_dot_product` computes in DOUBLE, but every
    * intermediate here is an integer — with |e| ≤ 1 the micro-unit
    * codes are |x| ≤ 10⁶, each product ≤ 10¹², and any partial sum of
    * 64 terms ≤ 6.4·10¹³ < 2⁵³ — so double arithmetic is EXACT
    * regardless of summation order, and the CAST back to BIGINT is
    * value-preserving. The scoring/tie-break SQL is unchanged.
    */
  def semanticPairsExactOracleSql(limit: Int): String =
    s"""WITH params AS MATERIALIZED (
           SELECT GREATEST(1, (CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)
                               + COUNT(DISTINCT label) - 1)
                              // COUNT(DISTINCT label)) AS s
           FROM embeddings),
         q AS MATERIALIZED (
           SELECT vec_id,
                  CAST(label AS BIGINT) * (SELECT s FROM params)
                    + (vec_id % (SELECT s FROM params)) AS cell,
                  list_transform(embedding,
                    e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS qa
           FROM embeddings),
         nrm AS MATERIALIZED (
           SELECT vec_id, CAST(list_dot_product(qa, qa) AS BIGINT) AS nn FROM q),
         xs AS (SELECT vec_id, cell, unnest(generate_series(1, len(qa))) AS i, qa FROM q),
         qv AS (SELECT vec_id, cell, i, qa[i] AS x FROM xs),
         cm AS (SELECT cell, i,
                  CAST(FLOOR(CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
                FROM qv GROUP BY cell, i),
         cml AS MATERIALIZED (
           SELECT cell, list(m ORDER BY i) AS cq FROM cm GROUP BY cell),
         cn AS (SELECT cell, CAST(list_dot_product(cq, cq) AS BIGINT) AS cn FROM cml),
         vcd AS (SELECT q.vec_id, c.cell,
                   CAST(list_dot_product(q.qa, c.cq) AS BIGINT) AS cdot
                 FROM q, cml c),
         asg AS (
           SELECT vec_id, cell FROM (
             SELECT vcd.vec_id, vcd.cell,
                    ROW_NUMBER() OVER (PARTITION BY vcd.vec_id ORDER BY
                      CAST(vcd.cdot AS DOUBLE) /
                        SQRT(CAST(nv.nn AS DOUBLE) * CAST(cn.cn AS DOUBLE)) DESC,
                      vcd.cell) AS rn
             FROM vcd JOIN nrm nv ON nv.vec_id = vcd.vec_id
                      JOIN cn ON cn.cell = vcd.cell) p
           WHERE rn = 1),
         prs AS (
           SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id
           FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         dots AS (SELECT p.cell, p.a_id, p.b_id,
                    CAST(list_dot_product(qa.qa, qb.qa) AS BIGINT) AS dot
                  FROM prs p
                  JOIN q qa ON qa.vec_id = p.a_id
                  JOIN q qb ON qb.vec_id = p.b_id),
         scored AS (
           SELECT d.cell, d.a_id, d.b_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm na ON na.vec_id = d.a_id
                       JOIN nrm nb ON nb.vec_id = d.b_id)
       SELECT cell, a_id, b_id, cos FROM scored
       ORDER BY cos DESC, a_id, b_id LIMIT $limit"""

  /** DuckDB oracle for [[ivfTopKExact]] over `embeddings` with cell
    * column `label`: same integer centroid sums, floored means, probe
    * ranking, and scoring contract.
    */
  def ivfTopKExactOracleSql(maxQueryId: Int, k: Int, nprobe: Int = 3): String =
    s"""WITH xs AS (
           SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS i,
                  embedding FROM embeddings),
         qv AS (SELECT vec_id, label, i,
                  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
                FROM xs),
         nrm AS (SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nn
                 FROM qv GROUP BY vec_id),
         cm AS (SELECT label AS cell, i,
                  CAST(FLOOR(CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
                FROM qv GROUP BY label, i),
         cn AS (SELECT cell, CAST(SUM(m * m) AS BIGINT) AS cn FROM cm GROUP BY cell),
         qcd AS (SELECT q.vec_id AS q_id, c.cell, CAST(SUM(q.x * c.m) AS BIGINT) AS cdot
                 FROM qv q JOIN cm c ON q.i = c.i
                 WHERE q.vec_id < $maxQueryId
                 GROUP BY q.vec_id, c.cell),
         probes AS (
           SELECT q_id, cell FROM (
             SELECT qcd.q_id, qcd.cell,
                    ROW_NUMBER() OVER (PARTITION BY qcd.q_id ORDER BY
                      CAST(qcd.cdot AS DOUBLE) /
                        SQRT(CAST(nq.nn AS DOUBLE) * CAST(cn.cn AS DOUBLE)) DESC,
                      qcd.cell) AS pr
             FROM qcd JOIN nrm nq ON nq.vec_id = qcd.q_id
                      JOIN cn ON cn.cell = qcd.cell) p
           WHERE pr <= $nprobe),
         dots AS (SELECT q.vec_id AS q_id, c.vec_id, CAST(SUM(q.x * c.x) AS BIGINT) AS dot
                  FROM qv q
                  JOIN probes pr ON pr.q_id = q.vec_id
                  JOIN qv c ON c.label = pr.cell AND c.i = q.i AND c.vec_id <> q.vec_id
                  GROUP BY q.vec_id, c.vec_id),
         scored AS (
           SELECT d.q_id, d.vec_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(nq.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm nq ON nq.vec_id = d.q_id
                       JOIN nrm nc ON nc.vec_id = d.vec_id)
       SELECT q_id, vec_id AS neighbor_id, rank, cos FROM (
         SELECT q_id, vec_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         FROM scored) r
       WHERE rank <= $k ORDER BY q_id, rank"""
}
