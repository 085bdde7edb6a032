package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** Minimal asset-DAG runner — the engine-side analogue of the reference's
  * Dagster orchestration (`@asset(deps=[...])` + `Definitions`,
  * `taxi_pipeline_native.py:26,51,75,102,140,180-191`): named nodes,
  * dependency edges, topological materialization, per-asset wall-clock
  * timing (O30, `taxi_pipeline_native.py:90,98,...`) and log-and-rethrow
  * error handling (O31, `:135-137`).
  *
  * Unlike the reference — which builds and stops a SparkSession per asset
  * (`:116-124,132`) — one shared session flows through every asset.
  */
/** `retries` = extra attempts after a failure before the asset is
  * recorded as failed (the Dagster `RetryPolicy(max_retries=…)`
  * analogue); 0 = fail fast.
  */
final case class Asset(name: String, deps: Seq[String] = Nil,
    retries: Int = 0)(val run: SparkSession => Unit)

/** `attempts` counts executions (1 = first try succeeded); `reused`
  * marks an asset NOT run this time because a resume found it green in
  * the previous run's report and no upstream changed.
  */
final case class AssetResult(name: String, seconds: Double,
    error: Option[Throwable], attempts: Int = 1, reused: Boolean = false)

object Pipeline {

  /** One-file JSON run report — the artifact analogue of the reference's
    * per-asset observability UI (`dagster dev` timing/metadata panes):
    * per-asset status + wall-clock, machine-readable for CI dashboards.
    */
  def runReportJson(results: Seq[AssetResult]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ")
    val assets = results.map { r =>
      val err = r.error.map(e => "\"" + esc(e.toString) + "\"").getOrElse("null")
      val status =
        if (r.reused) "reused" else if (r.error.isEmpty) "ok" else "failed"
      f"""{"asset":"${esc(r.name)}","seconds":${r.seconds}%.3f,"status":"$status","attempts":${r.attempts},"error":$err}"""
    }.mkString("[", ",", "]")
    val total = results.map(_.seconds).sum
    f"""{"assets":$assets,"n_assets":${results.size},"n_failed":${results.count(_.error.nonEmpty)},"total_seconds":$total%.3f}"""
  }

  /** Write [[runReportJson]] to `path` (parent dirs created). */
  def writeRunReport(results: Seq[AssetResult], path: String): Unit =
    writeFile(path, runReportJson(results) + "\n")

  /** Self-contained static HTML run browser — the no-server counterpart
    * of the reference's `dagster dev` run pane (`justfile:7-8`): one
    * file, zero scripts/deps (renders anywhere, zero-egress safe), one
    * row per asset in materialization order with deps, status,
    * wall-clock, and a proportional duration bar.
    */
  def htmlRunReport(results: Seq[AssetResult],
      deps: Map[String, Seq[String]] = Map.empty): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val maxSec = math.max(results.map(_.seconds).maxOption.getOrElse(0.0), 1e-9)
    val rows = results.map { r =>
      val pct = math.max(1, math.round(100 * r.seconds / maxSec))
      val (cls, label) =
        if (r.reused) ("reused", "reused")
        else if (r.error.isEmpty) ("ok", "ok") else ("failed", "FAILED")
      val err = r.error.map(e => s"<div class=err>${esc(e.toString)}</div>")
        .getOrElse("")
      s"""<tr class=$cls><td>${esc(r.name)}</td>
         |<td>${deps.getOrElse(r.name, Nil).map(esc).mkString(", ")}</td>
         |<td class=$cls>$label</td><td class=num>${f"${r.seconds}%.3f"}</td>
         |<td><div class=bar style="width:$pct%"></div>$err</td></tr>"""
        .stripMargin.replace("\n", "")
    }.mkString("\n")
    val total = results.map(_.seconds).sum
    val failed = results.count(_.error.nonEmpty)
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>graft run report</title>
       |<style>
       | body{font:14px system-ui,sans-serif;margin:2em;color:#222}
       | table{border-collapse:collapse;min-width:48em}
       | th,td{padding:.4em .8em;border-bottom:1px solid #ddd;text-align:left}
       | td.num{text-align:right;font-variant-numeric:tabular-nums}
       | td.ok{color:#0a7d32} td.failed{color:#b3261e;font-weight:600}
 td.reused{color:#777;font-style:italic}
       | .bar{height:.7em;background:#6b8cc7;border-radius:2px;min-width:2px}
       | .err{color:#b3261e;font-size:12px;margin-top:.3em}
       | .summary{margin:.5em 0 1.5em;color:#555}
       |</style></head><body>
       |<h1>graft pipeline run</h1>
       |<div class=summary>${results.size} assets &middot; $failed failed &middot;
       | total ${f"$total%.3f"} s</div>
       |<table><tr><th>asset</th><th>deps</th><th>status</th><th>seconds</th><th></th></tr>
       |$rows
       |</table></body></html>
       |""".stripMargin
  }

  /** Write [[htmlRunReport]] to `path` (parent dirs created). */
  def writeHtmlReport(results: Seq[AssetResult], path: String,
      deps: Map[String, Seq[String]] = Map.empty): Unit =
    writeFile(path, htmlRunReport(results, deps))

  private def writeFile(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

final class Pipeline(val assets: Seq[Asset]) {
  private val log = LoggerFactory.getLogger(classOf[Pipeline])
  private val byName = assets.map(a => a.name -> a).toMap
  require(byName.size == assets.size, "duplicate asset names")
  assets.foreach(a => a.deps.foreach(d =>
    require(byName.contains(d), s"asset ${a.name}: unknown dep $d")))

  /** Dependency-respecting order (Kahn); fails on cycles. */
  def topoOrder: Seq[Asset] = {
    val indeg = collection.mutable.Map(assets.map(a => a.name -> a.deps.size): _*)
    val out = collection.mutable.ArrayBuffer.empty[Asset]
    val ready = collection.mutable.Queue(
      assets.filter(_.deps.isEmpty).map(_.name).sorted: _*)
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += byName(n)
      assets.filter(_.deps.contains(n)).foreach { succ =>
        indeg(succ.name) -= 1
        if (indeg(succ.name) == 0) ready.enqueue(succ.name)
      }
    }
    require(out.size == assets.size, "asset graph has a cycle")
    out.toSeq
  }

  /** Run every asset in dependency order; logs timing per asset, stops
    * at (and rethrows after logging) the first failure — the reference's
    * error contract. When `reportPath` is set, a JSON run report
    * ([[Pipeline.runReportJson]]) is written even on failure (the
    * failed asset appears with its error).
    *
    * `isolateSessions = true` hands each asset its own
    * `spark.newSession()` — the Spark-native analogue of the reference
    * building a fresh SparkSession per asset
    * (`taxi_pipeline_native.py:116-124,132`): per-asset SQLConf, temp
    * views, UDF registrations and current catalog/database are
    * quarantined, so one asset's `setConf`/`createOrReplaceTempView`
    * cannot leak into the next, while the SparkContext (executors,
    * cached blocks, shuffle service) stays shared. Stopping a context
    * per asset, as the reference does, would forfeit cluster reuse —
    * deliberately not replicated (SURVEY §3.4).
    */
  def materialize(spark: SparkSession,
      reportPath: Option[String] = None,
      htmlReportPath: Option[String] = None,
      isolateSessions: Boolean = false): Seq[AssetResult] =
    runSubset(spark, topoOrder.map(_.name).toSet, Set.empty, reportPath,
      htmlReportPath, isolateSessions)

  /** Partial re-materialization from the previous run's JSON report —
    * the Dagster "re-execute from failure" analogue: re-run ONLY the
    * assets that failed or never ran last time, plus their transitive
    * DOWNSTREAM subtree (their inputs changed); every other asset is
    * reused as-is (its `run` is not invoked; it appears in the report
    * as `reused`). If the previous run was fully green, everything is
    * reused and nothing executes.
    */
  def materializeResume(spark: SparkSession, previousReportPath: String,
      reportPath: Option[String] = None,
      htmlReportPath: Option[String] = None,
      isolateSessions: Boolean = false): Seq[AssetResult] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new java.io.File(previousReportPath))
    val prevOk = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("assets").elements()).asScala
      .filter(a => a.get("status").asText == "ok" ||
        a.get("status").asText == "reused")
      .map(_.get("asset").asText).toSet
    // seeds: failed last time, or absent from the report (run stopped
    // before reaching them, or the asset is new since)
    val seeds = topoOrder.map(_.name).filterNot(prevOk).toSet
    val toRun = downstreamClosure(seeds)
    runSubset(spark, toRun, prevOk -- toRun, reportPath,
      htmlReportPath, isolateSessions)
  }

  /** `seeds` plus everything they (transitively) feed — the subtree a
    * changed input invalidates.
    */
  def downstreamClosure(seeds: Set[String]): Set[String] = {
    seeds.foreach(s => require(byName.contains(s), s"unknown asset $s"))
    val toRun = collection.mutable.Set.empty[String] ++ seeds
    topoOrder.foreach { a => // topo order ⇒ one forward pass closes it
      if (!toRun(a.name) && a.deps.exists(toRun)) toRun += a.name
    }
    toRun.toSet
  }

  /** Materialize ONLY `roots` and their downstream closure — what a
    * sensor tick runs when an upstream input arrives
    * ([[Scheduling.FileSensor]]): the affected subtree re-executes,
    * every unrelated asset is untouched (absent from the report, not
    * "reused").
    */
  def materializeSubtree(spark: SparkSession, roots: Set[String],
      reportPath: Option[String] = None,
      isolateSessions: Boolean = false): Seq[AssetResult] =
    runSubset(spark, downstreamClosure(roots), Set.empty, reportPath,
      None, isolateSessions)

  private def runSubset(spark: SparkSession, toRun: Set[String],
      reuse: Set[String], reportPath: Option[String],
      htmlReportPath: Option[String],
      isolateSessions: Boolean): Seq[AssetResult] = {
    val results = collection.mutable.ArrayBuffer.empty[AssetResult]
    try {
      topoOrder.foreach { a =>
        if (reuse(a.name)) {
          log.info(s"asset ${a.name} reused from previous run")
          results += AssetResult(a.name, 0.0, None, attempts = 0,
            reused = true)
        } else if (toRun(a.name)) {
          results += runWithRetries(a,
            if (isolateSessions) spark.newSession() else spark)
          results.last.error.foreach(throw _)
        }
      }
    } finally {
      reportPath.foreach(Pipeline.writeRunReport(results.toSeq, _))
      htmlReportPath.foreach(Pipeline.writeHtmlReport(results.toSeq, _,
        assets.map(a => a.name -> a.deps).toMap))
    }
    results.toSeq
  }

  private def runWithRetries(a: Asset, session: SparkSession): AssetResult = {
    val t0 = System.nanoTime()
    var attempt = 0
    var lastErr: Option[Throwable] = None
    while (attempt <= a.retries && (attempt == 0 || lastErr.nonEmpty)) {
      attempt += 1
      try {
        a.run(session)
        lastErr = None
      } catch {
        case e: Throwable =>
          lastErr = Some(e)
          if (attempt <= a.retries)
            log.warn(s"asset ${a.name} attempt $attempt failed, " +
              s"retrying (${a.retries - attempt + 1} left): ${e.getMessage}")
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    lastErr match {
      case None =>
        log.info(f"asset ${a.name} materialized in $secs%.3f s " +
          s"($attempt attempt(s))")
        AssetResult(a.name, secs, None, attempts = attempt)
      case Some(e) =>
        log.error(s"asset ${a.name} failed after $secs s " +
          s"($attempt attempt(s)): ${e.getMessage}")
        AssetResult(a.name, secs, Some(e), attempts = attempt)
    }
  }
}
