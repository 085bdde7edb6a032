package graft

import java.nio.file.Files

import graft.pipeline.CorpusPipeline

/** End-to-end training-data pipeline: stage counts shrink monotonically
  * through the dedup/sample funnel, the export round-trips, and the
  * whole run is deterministic (same report twice).
  */
class CorpusPipelineSpec extends SparkSpec {

  test("corpus funnel: monotone stages, deterministic, export readable") {
    val out = Files.createTempDirectory("corpus_out").toString + "/corpus"
    val p = new CorpusPipeline(sf, out)
    val exported = p.run(spark)
    val r = p.report
    assert(r("ingest") == 500)
    assert(r("quality_filter") <= r("ingest"))
    assert(r("exact_dedup") <= r("quality_filter"))
    assert(r("near_dedup") <= r("exact_dedup"))
    assert(r("sample") <= r("near_dedup"))
    assert(r("exported") == r("sample"))
    assert(r("sample") > 0, "pipeline must not empty the corpus")
    // export is hive-partitioned by lang and re-readable
    assert(exported.columns.contains("lang"))
    // every post-ingest stage must read its cached predecessor, not
    // recompute the raw lineage (the per-stage count would otherwise
    // re-execute the entire upstream funnel)
    p.readsCache.toSeq.filterNot(_._1 == "ingest").foreach { case (stage, cached) =>
      assert(cached, s"stage $stage recomputes lineage instead of reading the cache")
    }

    val p2 = new CorpusPipeline(sf,
      Files.createTempDirectory("corpus_out2").toString + "/corpus")
    val repPath = Files.createTempDirectory("corpus_rep").resolve("funnel.json").toString
    p2.reportPath = Some(repPath)
    p2.run(spark)
    assert(p2.report == r, "pipeline must be deterministic")
    // funnel report artifact is written and machine-readable
    val rep = spark.read.json(repPath)
    val stages = rep.selectExpr("explode(stages) as s")
      .select("s.stage", "s.docs").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(stages == r.toMap)
  }
}
