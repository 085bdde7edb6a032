package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.LlmOps

/** INCREMENTAL corpus ingestion — the streaming-shaped complement of
  * the one-shot [[CorpusPipeline]] (the bare index-probe tier it
  * embeds is also available standalone, judged, as
  * [[graft.operators.MinHashIndex]]): new document batches are accepted
  * into a persistent corpus WITHOUT ever recomputing pairs over the
  * accumulated history. This is the shape a 100 TB training corpus
  * actually grows in: the accepted set is petabytes, the daily batch
  * is gigabytes, and the only affordable join is batch × state-index.
  *
  * Persistent state under `stateDir` (plain parquet, appended per
  * batch):
  *   - `accepted/` — the accepted docs (+ `text_md5`);
  *   - `sigs/`     — minhash signatures of every exact-surviving doc
  *     EVER SEEN (accepted or near-rejected). Indexing seen, not just
  *     accepted, buys two properties: re-ingesting a batch is a
  *     guaranteed no-op (every sig-bearing doc self-matches at
  *     est = 1.0), and a future doc similar only to a REJECTED member
  *     of an earlier cluster is still caught (transitive-chain
  *     robustness — rejected members' lookalikes don't resurrect).
  *     Cost: the sig index grows with seen, not accepted, volume —
  *     signatures are ~(numHashes·8)B/doc, so at 32 hashes that is
  *     256 B per seen doc, dwarfed by the accepted text itself.
  *
  * Per-batch algorithm (each step one bounded shuffle, nothing
  * all-pairs, history touched only through equi-joins):
  *   1. within-batch EXACT dedup — min doc_id per text_md5;
  *   2. cross-batch EXACT dedup — anti-join on the state's md5 set
  *      (makes re-ingesting any batch an exact no-op);
  *   3. cross-batch NEAR dedup — minhash signatures for survivors,
  *      banded keys joined against the STATE's seen-sig band keys
  *      (only colliding candidates get their signatures compared;
  *      est ≥ tau rejects the new doc — first-seen-wins);
  *   4. within-batch NEAR dedup — banded pairs among the remaining
  *      batch docs, connected components, keep each component's min
  *      doc_id (same cluster semantics as [[CorpusPipeline]]);
  *   5. append survivors + their signatures to the state.
  *
  * Docs under 3 tokens produce no shingles, hence no signature: they
  * are exact-deduped only (documented, mirrors [[LlmOps.shinglesRaw]]).
  * Estimates use the unbiased n_agree/numHashes Jaccard estimator on
  * the SAME signature function as the judged minhash query, so the
  * incremental decisions are reproducible from state alone.
  */
final class IncrementalCorpus(stateDir: String, numHashes: Int = 32,
    bands: Int = 8, tau: Double = 0.7) {

  require(numHashes % bands == 0, "bands must divide numHashes")
  /** Band-row count below which the BATCH side of the state band join
    * broadcasts (the state side never does) — same gate shape as
    * [[graft.operators.MinHashIndex.dedupAgainst]].
    */
  private val BroadcastBandLimit = 100000L
  private def acceptedPath = s"$stateDir/accepted"
  private def sigsPath = s"$stateDir/sigs"
  private def stagingRoot = s"$stateDir/staging"

  case class IngestStats(batchRows: Long, afterExact: Long, acceptedNew: Long)

  // State IO goes through the path's own Hadoop FileSystem, so a
  // stateDir on hdfs:// / s3a:// / mocks3:// behaves exactly like a
  // local one (a java.nio check here would silently report remote
  // state as absent and skip every cross-batch dedup step).
  private def fsFor(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, p: String): Boolean =
    fsFor(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  /** The accepted corpus so far (None before the first batch). */
  def accepted(spark: SparkSession): Option[DataFrame] =
    if (exists(spark, acceptedPath)) Some(spark.read.parquet(acceptedPath)) else None

  private def sigsState(spark: SparkSession): Option[DataFrame] =
    if (exists(spark, sigsPath)) Some(spark.read.parquet(sigsPath)) else None

  /** (id, bk) band-key rows of a signature frame — the SAME key shape
    * as [[Dedup.minhashPairs]] (band index + raw r-tuple, exact
    * equality, no second-level hashing).
    */
  private def bandKeyRows(sigs: DataFrame): DataFrame =
    Dedup.bandRows(sigs, "doc_id", numHashes, bands)

  private def nAgree = Dedup.sigAgree

  /** Ingest one batch; returns the funnel counts. Batch schema must
    * include (doc_id, text); all other columns ride along into state.
    */
  def ingest(spark: SparkSession, batch: DataFrame): IngestStats = {
    recover(spark) // finish (or discard) any half-published prior batch
    val n0 = batch.count()
    val withMd5 = batch.withColumn("text_md5", md5(col("text")))

    // 1+2: exact dedup, within batch then against state
    val inBatch = withMd5
      .withColumn("rn", row_number().over(
        Window.partitionBy("text_md5").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
    val exactDeduped = accepted(spark) match {
      case Some(acc) =>
        inBatch.join(acc.select("text_md5"), Seq("text_md5"), "left_anti")
      case None => inBatch
    }
    // caches are released LOCALLY at the end of this method — a global
    // CacheTracker.unpersistAll() here could race a concurrent
    // operator's pin-before-append window (and vice versa)
    val exactSurvivors = graft.CacheTracker.track(
      exactDeduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n1 = exactSurvivors.count()

    // 3: near-dup vs the accepted state's band-key index
    val sigs = graft.CacheTracker.track(
      Dedup.minhashSignatures(
        LlmOps.shinglesRaw(exactSurvivors), "doc_id", "sh", numHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val newKeys = bandKeyRows(sigs)
    val rejectedVsState: DataFrame = sigsState(spark) match {
      case Some(oldSigs) =>
        // STRATEGY-PINNED state × batch band join: both sides are
        // explode-derived, so the planner's size estimates are
        // meaningless (the measured 8 GiB-broadcast-of-the-corpus
        // failure class — see Dedup.ngramJaccardPairs). The batch
        // side broadcasts below the gate (n1 already counted — no
        // extra action; the STATE side never broadcasts at any size);
        // past it, merge is the only strategy safe at any scale. The
        // per-doc signature joins are shuffle_hash: bounded
        // docs/partitions hash maps regardless of corpus size.
        val oldKeys = bandKeyRows(oldSigs).toDF("old_id", "bk")
        val nk = newKeys.toDF("new_id", "bk")
        val cand = (if (n1 * bands <= BroadcastBandLimit)
            oldKeys.join(broadcast(nk), "bk")
          else oldKeys.join(nk.hint("merge"), "bk"))
          .select("new_id", "old_id").distinct()
        cand
          .join(sigs.select(col("doc_id").as("new_id"), col("sig").as("sa"))
            .hint("shuffle_hash"), "new_id")
          .join(oldSigs.select(col("doc_id").as("old_id"), col("sig").as("sb"))
            .hint("shuffle_hash"), "old_id")
          .filter(nAgree.cast("double") / numHashes >= tau)
          .select(col("new_id").as("doc_id")).distinct()
      case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    }
    val vsStateKept = exactSurvivors
      .join(rejectedVsState, Seq("doc_id"), "left_anti")

    // 4: near-dup within the batch — banded pairs + components over
    // ALL exact-survivors (including state-rejected docs), min-id
    // representative survives (CorpusPipeline cluster rule). Building
    // the graph over all survivors, not just state-kept ones, keeps
    // decisions BATCH-BOUNDARY-INVARIANT: a lookalike of a
    // state-rejected batch-mate is dropped now exactly as it would be
    // next batch against that doc's seen sig (clusters whose min id
    // was itself state-rejected die entirely — same outcome as the
    // sequential order)
    val a = bandKeyRows(sigs).toDF("a_id", "bk")
    val b = bandKeyRows(sigs).toDF("b_id", "bk")
    // merge-pinned explode-derived self-join — same discipline as
    // Dedup.minhashPairs (estimates meaningless, SMJ safe at any size)
    val pairs = a.join(b.hint("merge"), "bk").filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sa"))
        .hint("shuffle_hash"), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sb"))
        .hint("shuffle_hash"), "b_id")
      .filter(nAgree.cast("double") / numHashes >= tau)
      .select("a_id", "b_id")
    val comps = graft.operators.Components
      .connectedComponents(spark, pairs, "a_id", "b_id")
    val newAccepted = vsStateKept
      .join(comps.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")

    // 5: STAGE then PUBLISH. Both frames' plans anti-join against the
    // state parquet, so they must be fully executed before any state
    // file mutates. The staged parquet write is that barrier — and a
    // DURABLE one: a persist()+count() pin is best-effort (an evicted
    // or executor-lost cached partition would recompute against the
    // mutated state and silently collapse to empty/duplicate rows),
    // whereas after a completed write no plan re-executes at all.
    // Publish is then pure metadata: rename staged part files into the
    // state dirs, sigs BEFORE accepted — sigs-without-accepted only
    // loses one batch's docs to a re-ingest self-match, while
    // accepted-without-sigs would let every future lookalike of those
    // docs through forever. The _COMMIT marker makes the window
    // recoverable either way: staged-with-marker batches are finished
    // by recover(), staged-without-marker ones are discarded.
    val batchId = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
    val stg = s"$stagingRoot/$batchId"
    newAccepted.write.parquet(s"$stg/accepted")
    sigs.write.parquet(s"$stg/sigs")
    val n2 = spark.read.parquet(s"$stg/accepted").count()
    markCommitted(spark, stg)
    publish(spark, stg)
    Seq(exactSurvivors, sigs).foreach(_.unpersist(blocking = false))
    IngestStats(n0, n1, n2)
  }

  private def markCommitted(spark: SparkSession, stg: String): Unit =
    fsFor(spark, stg).create(
      new org.apache.hadoop.fs.Path(s"$stg/_COMMIT"), true).close()

  /** Rename the staged batch's part files into the live state dirs
    * (sigs first — see ingest step 5), then drop the staging dir.
    * Idempotent: files already moved by an earlier interrupted publish
    * are simply no longer listed.
    */
  private def publish(spark: SparkSession, stg: String): Unit = {
    val fs = fsFor(spark, stg)
    val batch = stg.substring(stg.lastIndexOf('/') + 1)
    def moveParts(from: String, to: String): Unit = {
      val toDir = new org.apache.hadoop.fs.Path(to)
      fs.mkdirs(toDir)
      val src = new org.apache.hadoop.fs.Path(from)
      if (fs.exists(src)) fs.listStatus(src).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("part-"))
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(toDir, s"b$batch-$name"))
      }
    }
    moveParts(s"$stg/sigs", sigsPath)
    if (crashAfterSigsPublish)
      throw new IllegalStateException("injected crash: sigs published, accepted not")
    moveParts(s"$stg/accepted", acceptedPath)
    fs.delete(new org.apache.hadoop.fs.Path(stg), true)
  }

  /** Test-only failpoint: die between the sigs and accepted publish
    * steps, the worst spot in the commit window (IncrementalCorpusSpec
    * proves recover() then completes the batch losslessly).
    */
  private[graft] var crashAfterSigsPublish: Boolean = false

  /** Grow the corpus from a STREAM: a file-source directory feeds each
    * micro-batch through [[ingest]] via foreachBatch. foreachBatch is
    * at-least-once, but ingest's effects are exactly-once anyway:
    *   - a replayed FULLY-PUBLISHED batch is a no-op (every doc either
    *     exact-matches state or self-matches its own seen sig);
    *   - a replay after a crash mid-ingest first runs [[recover]] —
    *     committed staging publishes, uncommitted staging is discarded
    *     and the batch simply re-runs.
    * So stop/restart on the same checkpoint resumes losslessly and
    * never double-accepts (proven across a restart by the spec).
    *
    * @param schema the batch schema (file streams require one; must
    *               include doc_id and text)
    */
  def ingestStream(spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      ckptDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        ingest(spark, df); ()
      }
      .start()

  /** Crash recovery over the staging area: a staged batch WITH a
    * `_COMMIT` marker had both frames durably written, so its publish
    * is completed (renames are idempotent); one WITHOUT the marker
    * died mid-computation and is discarded — its batch simply re-runs.
    * Called automatically at the start of every ingest().
    */
  def recover(spark: SparkSession): Unit = {
    val fs = fsFor(spark, stagingRoot)
    val root = new org.apache.hadoop.fs.Path(stagingRoot)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val stg = st.getPath.toString
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$stg/_COMMIT")))
        publish(spark, stg)
      else fs.delete(st.getPath, true)
    }
  }
}
