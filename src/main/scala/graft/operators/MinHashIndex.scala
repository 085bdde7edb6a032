package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash signature index — the near-dup counterpart of
  * [[VectorIndex]] (and of the reference's incremental-asset posture,
  * `taxi_pipeline.py`'s materialize-once assets): signature history is
  * computed ONCE, persisted, and every new ingest batch dedups against
  * it by banded LSH without ever touching the historical text again.
  * The corpus-wide operators ([[Dedup.minhashPairs]]) answer "find all
  * near-dup pairs in this corpus"; a 100 TB ingest pipeline instead
  * asks, per batch, "which of TODAY'S documents near-duplicate
  * anything already ingested" — that needs history as STATE
  * (signatures, not text: numHashes BIGINTs per doc, ~256 bytes
  * instead of the document) and batch-sized incremental work, not an
  * O(corpus) recompute per day.
  *
  * State under `stateDir` (plain parquet):
  *   - `signatures/` — (doc_id, sig: ARRAY<BIGINT>, the numHashes
  *     permutation minima of [[Dedup.minhashSignatures]])
  *
  * Scale shape of [[dedupAgainst]]: history is scanned ONCE as the
  * narrow signature projection, both sides explode to (band, raw
  * components) keys, and the band join prunes to collision survivors.
  * A daily batch is tiny next to history, so below
  * `broadcastBandLimit` band rows the batch side BROADCASTS — the
  * history scan never shuffles at all; past the gate both
  * explode-derived sides are merge-pinned (their planner estimates
  * are meaningless — see [[Dedup.ngramJaccardPairs]]'s measured 8 GiB
  * broadcast attempt). Signature agreement then prices per CANDIDATE
  * pair, never per history row.
  *
  * Relationship to [[graft.pipeline.IncrementalCorpus]]: that class
  * is the full accept/reject INGEST pipeline (exact dedup funnel,
  * within-batch components, accepted-text state) with this same
  * banded signature probe embedded; MinHashIndex is the bare
  * index-plus-pairs OPERATOR tier — judged end-to-end against the
  * DuckDB oracle (`dedup_incremental`), composable under any policy
  * (flag, drop, route to review) rather than hard-wired to
  * first-seen-wins.
  *
  * Crash discipline is [[VectorIndex]]'s verbatim: `add` stages a
  * durable parquet write, marks `_COMMIT`, publishes by rename;
  * [[recover]] finishes committed batches and discards uncommitted
  * ones. Hash constants are frozen by `numHashes` at build time —
  * adds signature under the same permutation family, so old and new
  * signatures stay comparable. A re-ingested doc id self-matches at
  * n_agree = numHashes (the "already ingested" signal — the same
  * self-match contract as VectorIndex search).
  */
final class MinHashIndex(stateDir: String, numHashes: Int = 32,
    bands: Int = 8) {
  require(numHashes % bands == 0, "bands must divide numHashes")

  private def signaturesPath = s"$stateDir/signatures"
  private def tombstonesPath = s"$stateDir/tombstones"

  private def sigsOf(shingled: DataFrame, docCol: String,
      shCol: String): DataFrame =
    Dedup.minhashSignatures(shingled, docCol, shCol, numHashes)
      .select(col(docCol).as("doc_id"), col("sig"))

  /** Signature the shingled corpus and overwrite state (clearing any
    * tombstones — a rebuild IS the compaction path: one corpus
    * signature pass folds every retraction in).
    */
  def build(spark: SparkSession, shingled: DataFrame,
      docCol: String = "doc_id", shCol: String = "sh"): Unit = {
    sigsOf(shingled, docCol, shCol)
      .write.mode("overwrite").parquet(signaturesPath)
    fsFor(spark).delete(
      new org.apache.hadoop.fs.Path(tombstonesPath), true)
    ()
  }

  /** Live signatures: the persisted store minus any tombstoned ids. */
  def signatures(spark: SparkSession): DataFrame = {
    val s = spark.read.parquet(signaturesPath)
    if (fsFor(spark).exists(new org.apache.hadoop.fs.Path(tombstonesPath)))
      s.join(spark.read.parquet(tombstonesPath), Seq("doc_id"), "left_anti")
    else s
  }

  /** Retract doc ids from the index — the DELETION flow: a doc removed
    * from the corpus must stop suppressing its lookalikes (and stop
    * appearing as a `dedupAgainst` hit). O(batch) tombstone append;
    * every read applies the anti-join, [[build]] folds tombstones away
    * on the next rebuild. IDEMPOTENT: re-issuing a retraction (e.g.
    * after a crashed write) changes nothing, so failure handling is
    * simply retry. RETRACTION WINS within a generation: re-[[add]]ing
    * a tombstoned id stays invisible until the next [[build]] — the
    * safe bias for deletion-driven retractions (a crash can only
    * under-delete a retraction batch, never resurrect one). Returns
    * the retracted-id count.
    */
  def remove(spark: SparkSession, docIds: DataFrame,
      docCol: String = "doc_id"): Long = {
    val ids = docIds.select(col(docCol).as("doc_id")).distinct()
    ids.write.mode("append").parquet(tombstonesPath)
    ids.count()
  }

  /** Signature a new batch under the FROZEN permutation family and
    * append — history is never recomputed. Durable staged write +
    * `_COMMIT`-marked rename publish (see [[VectorIndex.add]]).
    */
  def add(spark: SparkSession, shingled: DataFrame,
      docCol: String = "doc_id", shCol: String = "sh"): Long = {
    recover(spark)
    val stg = stageAdd(spark, shingled, docCol, shCol)
    val n = spark.read.parquet(stg).count()
    publish(spark, stg)
    n
  }

  /** Stage + mark one add batch without publishing — exposed for the
    * crash-window spec (a crash between marker and publish leaves
    * exactly this state).
    */
  private[graft] def stageAdd(spark: SparkSession, shingled: DataFrame,
      docCol: String, shCol: String): String = {
    val batch = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
    val stg = s"$stateDir/staging/$batch"
    sigsOf(shingled, docCol, shCol).write.parquet(stg)
    fsFor(spark).create(
      new org.apache.hadoop.fs.Path(s"$stg/_COMMIT"), true).close()
    stg
  }

  private def fsFor(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def publish(spark: SparkSession, stg: String): Unit = {
    val fs = fsFor(spark)
    val batch = stg.substring(stg.lastIndexOf('/') + 1)
    val toDir = new org.apache.hadoop.fs.Path(signaturesPath)
    fs.mkdirs(toDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(stg)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("part-"))
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(toDir, s"b$batch-$name"))
    }
    fs.delete(new org.apache.hadoop.fs.Path(stg), true)
  }

  /** Finish committed-but-unpublished adds; discard uncommitted ones.
    * Called automatically at the start of every [[add]].
    */
  def recover(spark: SparkSession): Unit = {
    val fs = fsFor(spark)
    val root = new org.apache.hadoop.fs.Path(s"$stateDir/staging")
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMIT")))
        publish(spark, st.getPath.toString)
      else fs.delete(st.getPath, true)
    }
  }

  /** Near-dup hits of a new shingled batch against the indexed
    * history: banded-LSH band collision, then signature agreement ≥
    * minEst. Output (hist_id, new_id, n_agree, est) — oriented
    * history × batch, so downstream "drop if est ≥ τ" keeps the
    * canonical (historical) copy by construction.
    *
    * `broadcastBandLimit` gates the batch side's plan: ≤ limit band
    * rows (counted once, one batch-sized aggregation) broadcasts the
    * batch against the single history scan; past it both sides
    * merge-join. Both paths are bit-identical (spec-pinned).
    */
  def dedupAgainst(spark: SparkSession, batchShingled: DataFrame,
      docCol: String = "doc_id", shCol: String = "sh",
      minEst: Double = 0.0, broadcastBandLimit: Long = 100000L): DataFrame = {
    // Round 16: the batch signature pipeline feeds THREE reads (the
    // size gate's count, the band explode, and the agreement join) —
    // and the gate's count() is already a mandatory action, so a
    // persist here is a free barrier: one signature build, two cached
    // reads, no added job. batch × k longs — bounded.
    val bSigs = graft.CacheTracker.track(sigsOf(batchShingled, docCol, shCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hSigs = signatures(spark)
    val hBand = Dedup.bandRows(hSigs, "doc_id", numHashes, bands)
      .toDF("hist_id", "bk")
    val bBand = Dedup.bandRows(bSigs, "doc_id", numHashes, bands)
      .toDF("new_id", "bk")
    val small = bSigs.count() * bands <= broadcastBandLimit
    val cand = (if (small) hBand.join(broadcast(bBand), "bk")
                else hBand.join(bBand.hint("merge"), "bk"))
      .select("hist_id", "new_id").distinct()
    cand
      .join(hSigs.select(col("doc_id").as("hist_id"), col("sig").as("sa"))
        .hint("shuffle_hash"), "hist_id")
      .join(
        if (small)
          broadcast(bSigs.select(col("doc_id").as("new_id"),
            col("sig").as("sb")))
        else bSigs.select(col("doc_id").as("new_id"), col("sig").as("sb"))
          .hint("shuffle_hash"), "new_id")
      .withColumn("n_agree", Dedup.sigAgree)
      .withColumn("est", col("n_agree").cast("double") / numHashes)
      .filter(col("est") >= minEst)
      .select("hist_id", "new_id", "n_agree", "est")
  }
}
