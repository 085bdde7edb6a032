package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{idot, quant, sumsq}

/** Persistent IVF vector index — the similarity-search counterpart of
  * [[graft.pipeline.IncrementalCorpus]]: build once, APPEND new
  * vectors, search forever, never recompute history. The ANN queries
  * (`ann_ivf_topk` et al.) are one-shot operators; a 100 TB embedding
  * store needs the index as persistent STATE (centroids learned once,
  * vectors assigned on arrival, probes touching nprobe cells of the
  * accumulated corpus).
  *
  * State under `stateDir` (plain parquet):
  *   - `centroids/` — (cell, cm: quantized-int component means, cn)
  *   - `vectors/`   — (vec_id, cell, qa: quantized vector, qn)
  *
  * Everything follows the exact-integer contract of
  * [[Similarity.ivfTopKExact]]: vectors quantize to µ-unit BIGINTs,
  * k-means centroids are floored means of exact integer sums, and the
  * one cosine division is a single IEEE op — so `build` is
  * bit-deterministic (same data ⇒ byte-identical centroids, any
  * partitioning) and decisions are reproducible from state alone.
  * K-means: seeds are the `nCells` lowest `xxhash64(vec_id)` vectors
  * (deterministic, data-dependent spread), a fixed `iters` Lloyd
  * rounds, cosine assignment with (ccos, cell) tiebreak; empty cells
  * drop out. All shuffles are bounded: assignment is a broadcast
  * cross-join against ≤`nCells` centroids, means are one hash
  * aggregation per round.
  *
  * Lloyd rounds train on a SAMPLE, not the corpus: past `nSample`
  * vectors the rounds run over the `nSample` lowest
  * `(xxhash64(vec_id), vec_id)` vectors — the same deterministic
  * ordering that picks the seeds, so the seeds are the sample's own
  * prefix — and only the single final assignment touches the full
  * corpus. That drops training from O(n·k·iters) to
  * O(min(n, nSample)·k·iters) + O(n·k), the standard coarse-quantizer
  * discipline (IVF codebooks are trained on a bounded sample of the
  * corpus; Jégou, Douze & Schmid 2011 §V train on learning sets far
  * smaller than the indexed base). Bit-determinism is unchanged: the
  * sample is an exact hash-ranked set, so same data ⇒ same sample ⇒
  * byte-identical centroids under any partitioning. Corpora at or
  * under `nSample` train on everything — sampling only ever engages
  * where it pays.
  */
final class VectorIndex(stateDir: String, nCells: Int = 16, iters: Int = 5,
    nSample: Int = 4096) {
  // fail fast: seeds are the sample's prefix, so a sample smaller than
  // the cell count would silently train fewer cells than asked for
  require(nSample >= nCells,
    s"nSample ($nSample) must be >= nCells ($nCells)")

  private def centroidsPath = s"$stateDir/centroids"
  private def vectorsPath = s"$stateDir/vectors"

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), quant(col("embedding")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))

  /** Cosine of quantized arrays — the single-IEEE-op contract. */
  private def qcos(a: String, an: String, b: String, bn: String) =
    idot(col(a), col(b)).cast("double") /
      sqrt(col(an).cast("double") * col(bn).cast("double"))

  private def assign(v: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cell"))
    v.crossJoin(broadcast(cents))
      .withColumn("ccos", qcos("qa", "qn", "cm", "cn"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("qa"), col("qn"))
  }

  private def means(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("qa")))
      .groupBy("cell", "pos")
      // DECIMAL(38,0) sums + pure integer floor-division: exact at any
      // cell size (a double-cast floor would silently lose ulps once a
      // component sum passes 2^53 - the q52/q53 failure class)
      .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sx"),
        count(lit(1)).as("cnt"))
      .withColumn("m",
        ((col("sx") - pmod(col("sx"), col("cnt"))) / col("cnt")).cast("long"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), expr("transform(pm, x -> x.m)").as("cm"))
      .withColumn("cn", sumsq(col("cm")))

  /** Learn centroids and assign the initial corpus. Overwrites state. */
  def build(spark: SparkSession, emb: DataFrame): Unit = {
    val v = graft.CacheTracker.track(quantized(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = v.count()
    // Lloyd training set: the full corpus while it fits nSample, else
    // the nSample lowest-hash vectors (a top-k over the hash order —
    // per-partition heaps + one bounded driver merge, never a global
    // sort). Persisted: every Lloyd round re-reads it.
    val train =
      if (n <= nSample) v
      else graft.CacheTracker.track(
        v.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nSample)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    if (train ne v) train.count()
    // deterministic data-dependent seeds: lowest-hash vectors — the
    // head of the SAME ordering that draws the training sample, so
    // seeds ⊆ sample by construction. The partitionless window below
    // numbers the ≤nCells seed rows AFTER the limit — bounded by the
    // centroid count (small by definition), never by data volume, so
    // the single-task sort is fine at any SF
    var cents = train.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nCells)
      .withColumn("cell", row_number().over(
        Window.orderBy(xxhash64(col("vec_id")), col("vec_id"))).cast("int"))
      .select(col("cell"), col("qa").as("cm"), col("qn").as("cn"))
    var i = 0
    while (i < iters) {
      cents = means(assign(train, cents))
      i += 1
    }
    val finalCents = graft.CacheTracker.track(cents
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    finalCents.count()
    val assigned = graft.CacheTracker.track(assign(v, finalCents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    assigned.count()
    finalCents.write.mode("overwrite").parquet(centroidsPath)
    assigned.write.mode("overwrite").parquet(vectorsPath)
    // rebuild IS the compaction path: tombstoned retractions fold away
    fsFor(spark).delete(
      new org.apache.hadoop.fs.Path(tombstonesPath), true)
    // release LOCALLY: a global unpersistAll could race another
    // operator's pin-before-append window in the same JVM
    Seq(v, train, finalCents, assigned).foreach(_.unpersist(blocking = false))
  }

  private def tombstonesPath = s"$stateDir/tombstones"

  def centroids(spark: SparkSession): DataFrame =
    spark.read.parquet(centroidsPath)

  /** Live vectors: the persisted store minus any tombstoned ids. */
  def vectors(spark: SparkSession): DataFrame = {
    val v = spark.read.parquet(vectorsPath)
    if (fsFor(spark).exists(new org.apache.hadoop.fs.Path(tombstonesPath)))
      v.join(spark.read.parquet(tombstonesPath), Seq("vec_id"), "left_anti")
    else v
  }

  /** Retract vector ids — the deletion flow ([[graft.operators
    * .MinHashIndex.remove]]'s contract verbatim): O(batch) idempotent
    * tombstone append, reads anti-join it, searches stop returning the
    * ids, retraction wins over a re-[[add]] until the next [[build]]
    * (which clears tombstones — centroids are unaffected either way:
    * the coarse quantizer never unlearns a deleted vector's influence
    * short of a rebuild, the standard IVF posture).
    */
  def remove(spark: SparkSession, vecIds: DataFrame,
      idCol: String = "vec_id"): Long = {
    val ids = vecIds.select(col(idCol).as("vec_id")).distinct()
    ids.write.mode("append").parquet(tombstonesPath)
    ids.count()
  }

  /** Assign new vectors to the FROZEN centroids and append — history
    * is never touched, the index never re-trains (re-train = `build`).
    *
    * Append goes through a staged write + rename publish (the same
    * discipline as [[graft.pipeline.IncrementalCorpus]]): the staged
    * parquet is a DURABLE barrier — no reliance on cache residency —
    * and the `_COMMIT` marker makes a crash mid-publish recoverable
    * ([[recover]] finishes it; uncommitted staging is discarded).
    */
  def add(spark: SparkSession, emb: DataFrame): Long = {
    recover(spark)
    val stg = stageAdd(spark, emb)
    val n = spark.read.parquet(stg).count()
    publish(spark, stg)
    n
  }

  /** Stage + mark one add batch without publishing — the durable-write
    * half of [[add]], exposed for the crash-window spec (a real crash
    * between marker and publish leaves exactly this state).
    */
  private[graft] def stageAdd(spark: SparkSession, emb: DataFrame): String = {
    val batch = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
    val stg = s"$stateDir/staging/$batch"
    assign(quantized(emb), centroids(spark)).write.parquet(stg)
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
    val toDir = new org.apache.hadoop.fs.Path(vectorsPath)
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

  /** nprobe-cell search against state: queries rank cells by centroid
    * cosine, candidates come only from probed cells. Self-matches stay
    * (an indexed vector queried by itself returns rank 1, cos 1).
    *
    * The probe frame is queries×nprobe rows INCLUDING each query's
    * quantized vector — broadcasting it is right for interactive
    * lookups but wrong for a 10M-query batch. When the probe row count
    * (counted once, one narrow action over `queries`) exceeds
    * `broadcastProbeLimit`, the candidate join switches to a SALTED
    * shuffle join: a plain shuffle on `cell` alone would have at most
    * `nCells` distinct keys (guaranteed skew), so the vector side gets
    * a deterministic `xxhash64(vec_id) % saltBuckets` salt and the
    * probe side explodes across all salts — (cell, salt) keys spread
    * each cell's work over `saltBuckets` tasks. Both paths rank
    * identically (VectorIndexSpec proves bit-equality).
    */
  def search(spark: SparkSession, queries: DataFrame, k: Int,
      nprobe: Int = 3, broadcastProbeLimit: Long = 100000L,
      saltBuckets: Int = 32): DataFrame = {
    val q = queries.select(col("q_id"), quant(col("q_emb")).as("qa"))
      .withColumn("qn", sumsq(col("qa")))
    val cents = centroids(spark)
    val wq = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", qcos("qa", "qn", "cm", "cn"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("qa").as("q_qa"), col("qn").as("q_qn"), col("cell"))
    val probeRows = q.count() * nprobe
    val cand0 =
      if (probeRows <= broadcastProbeLimit)
        vectors(spark).join(broadcast(probes), Seq("cell"))
      else {
        val salts = array((0 until saltBuckets).map(lit): _*)
        vectors(spark)
          .withColumn("salt",
            pmod(xxhash64(col("vec_id")), lit(saltBuckets)).cast("int"))
          .join(probes.withColumn("salt", explode(salts)), Seq("cell", "salt"))
          .drop("salt")
      }
    val cand = cand0
      .withColumn("cos", idot(col("q_qa"), col("qa")).cast("double") /
        sqrt(col("q_qn").cast("double") * col("qn").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }
}
