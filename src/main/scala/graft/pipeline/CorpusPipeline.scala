package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

import graft.Tables
import graft.functions.TextFns
import graft.operators.{Components, Dedup, Sampling}
import graft.queries.LlmOps

/** The capstone composition: an end-to-end TRAINING-DATA pipeline over
  * the `documents` corpus, built from the engine's L3 operators and run
  * through the same Asset DAG as the reference's taxi pipeline —
  * ingest → quality filter → language ID → exact dedup → near-dup
  * dedup (Jaccard pairs → connected components → keep canonical) →
  * deterministic stratified sample → partitioned export.
  *
  * Every stage is a declarative DataFrame transform (one shuffle
  * bound each); stage row counts land in [[report]] — the engine-side
  * analogue of the reference's per-asset row-count/size observability
  * (`taxi_pipeline_native.py:47-48,70-72`).
  */
final class CorpusPipeline(sfDir: String, exportDir: String,
    minTokens: Int = 5, maxStopRatio: Double = 0.9,
    nearDupJac: Double = 0.5,
    sampleRates: Map[String, Int] = Map(
      "en" -> 50, "es" -> 50, "zh" -> 50, "de" -> 50, "fr" -> 50)) {

  private val log = LoggerFactory.getLogger(classOf[CorpusPipeline])
  val report: collection.mutable.LinkedHashMap[String, Long] =
    collection.mutable.LinkedHashMap.empty

  private val staged = collection.mutable.ListBuffer.empty[DataFrame]

  /** Per-stage: did this stage's plan read a cached predecessor (vs
    * recompute the raw lineage)? Observability for the funnel's
    * no-recompute guarantee; asserted in CorpusPipelineSpec.
    */
  val readsCache: collection.mutable.LinkedHashMap[String, Boolean] =
    collection.mutable.LinkedHashMap.empty

  /** Persist + count a funnel stage. The persist means the count (and
    * every downstream stage) reads THIS stage's materialization, not a
    * recomputation of the whole upstream lineage — without it, stage N
    * re-executes stages 1..N-1, multiplying pipeline cost by the stage
    * count. MEMORY_AND_DISK: spills instead of evicting at scale; on a
    * cluster a reliable checkpoint would also cut the lineage itself.
    * Everything is unpersisted at the end of [[run]] — the staged
    * frames here AND operator-internal persists (the near-dup stage's
    * inverted index) via [[graft.CacheTracker.unpersistAll]].
    */
  private def note(stage: String, df: DataFrame): DataFrame = {
    readsCache(stage) =
      df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation")
    val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    staged += c
    val n = c.count()
    report(stage) = n
    log.info(s"corpus stage $stage: $n docs")
    c
  }

  def run(spark: SparkSession): DataFrame = {
    val raw = note("ingest", Tables(spark, sfDir, "documents"))

    // quality: token floor + stopword-ratio ceiling (single pass)
    val toks = raw.withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")))
    val stopHits = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id")
      .agg(sum(when(col("tok").isin(TextFns.stopwords: _*), 1).otherwise(0))
        .cast("long").as("nstop"))
    // shuffle_hash pins: stopHits and langId are per-doc corpus-scale
    // frames descended from explodes — estimate-driven broadcasts of
    // either would collect the corpus (the Dedup.ngramJaccardPairs
    // 8 GiB-broadcast class, invisible at spec scales)
    val quality = note("quality_filter",
      toks.join(stopHits.hint("shuffle_hash"), "doc_id")
        .filter(col("nt") >= minTokens &&
          col("nstop").cast("double") / col("nt") <= maxStopRatio)
        .drop("toks", "nstop"))

    // language id (lexicon heuristic) attached as a column
    val withLang = quality
      .join(TextFns.langId(quality.sparkSession, quality)
        .withColumnRenamed("guess", "lang_guess")
        .hint("shuffle_hash"), "doc_id")

    // exact dedup: keep min doc_id per identical text
    val exactKept = note("exact_dedup",
      withLang.withColumn("keep",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("text").orderBy("doc_id")))
        .filter(col("keep") === 1).drop("keep"))

    // near-dup dedup: Jaccard pairs → components → drop non-canonical
    val pairs = Dedup.ngramJaccardPairs(
      LlmOps.shinglesRaw(exactKept), "doc_id", "sh", nearDupJac)
    val comps = Components.connectedComponents(spark, pairs, "a_id", "b_id")
    val nearKept = note("near_dedup",
      exactKept.join(comps.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti"))

    // deterministic stratified sample by source language
    val sampled = note("sample",
      Sampling.stratifiedHashSample(nearKept, "doc_id", "lang", sampleRates))

    // partitioned export (the 100 TB path)
    Sinks.exportPartitioned(
      sampled.select("doc_id", "lang", "lang_guess", "source", "n_chars", "text"),
      exportDir, Seq("lang"))
    val out = Tables.read(spark, exportDir)
    report("exported") = out.count()
    staged.foreach(_.unpersist(blocking = false))
    staged.clear()
    // operator-internal persists (e.g. ngramJaccardPairs' inverted
    // index) register with CacheTracker — release them too, so a
    // long-lived app can call run() repeatedly without accreting blocks
    graft.CacheTracker.unpersistAll()
    reportPath.foreach(writeReport)
    out
  }

  /** Optional one-file JSON funnel report (stage → doc count), the
    * corpus-pipeline analogue of [[Pipeline.runReportJson]].
    */
  var reportPath: Option[String] = None

  private def writeReport(path: String): Unit = {
    val stages = report.map { case (k, v) => s"""{"stage":"$k","docs":$v}""" }
      .mkString("[", ",", "]")
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      (s"""{"stages":$stages}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
