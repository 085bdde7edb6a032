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
final case class Asset(name: String, deps: Seq[String] = Nil)(
    val run: SparkSession => Unit)

final case class AssetResult(name: String, seconds: Double,
    error: Option[Throwable])

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
      f"""{"asset":"${esc(r.name)}","seconds":${r.seconds}%.3f,"status":"${if (r.error.isEmpty) "ok" else "failed"}","error":$err}"""
    }.mkString("[", ",", "]")
    val total = results.map(_.seconds).sum
    f"""{"assets":$assets,"n_assets":${results.size},"n_failed":${results.count(_.error.nonEmpty)},"total_seconds":$total%.3f}"""
  }

  /** Write [[runReportJson]] to `path` (parent dirs created). */
  def writeRunReport(results: Seq[AssetResult], path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      (runReportJson(results) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
    */
  def materialize(spark: SparkSession,
      reportPath: Option[String] = None): Seq[AssetResult] = {
    val results = collection.mutable.ArrayBuffer.empty[AssetResult]
    try {
      topoOrder.foreach { a =>
        val t0 = System.nanoTime()
        try {
          a.run(spark)
          val secs = (System.nanoTime() - t0) / 1e9
          log.info(f"asset ${a.name} materialized in $secs%.3f s")
          results += AssetResult(a.name, secs, None)
        } catch {
          case e: Throwable =>
            val secs = (System.nanoTime() - t0) / 1e9
            log.error(s"asset ${a.name} failed after $secs s: ${e.getMessage}")
            results += AssetResult(a.name, secs, Some(e))
            throw e
        }
      }
    } finally reportPath.foreach(Pipeline.writeRunReport(results.toSeq, _))
    results.toSeq
  }
}
