package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** JVM-level crash isolation for pipeline assets — the one reference
  * behavior [[Pipeline]]'s `isolateSessions` could not give: the
  * reference runs every Dagster asset in its own forked process
  * (`taxi_pipeline_native.py:116-124,132`), so an asset that calls
  * `sys.exit`, segfaults a native lib, or exhausts the heap kills only
  * ITS process. `isolateSessions` quarantines session state but shares
  * the JVM; a hard crash still took the whole run down. A
  * [[ProcessIsolation.processAsset]] runs its body in a CHILD JVM with
  * its own SparkSession — the parent observes only an exit code, so
  * `Runtime.halt`, OOM-kill, or a stray `System.exit` in the asset
  * body fails that ONE asset, the pipeline's retry/resume machinery
  * applies unchanged, and every other asset (and the parent's shared
  * session) keeps running.
  *
  * The asset body is named by CLASS (a no-arg-constructible
  * [[ProcessAsset]] on the parent's own classpath) rather than passed
  * as a closure — closures don't survive a process boundary; a class
  * name does, and the child reconstructs the instance reflectively.
  * Arguments cross as `key=value` strings.
  *
  * Deliberate deviation preserved from SURVEY §3.4: the CHILD builds a
  * fresh local SparkSession (no cluster reuse), so process isolation
  * is opt-in per asset — put only the crash-prone minority (native
  * decode, third-party parsers) behind a process boundary and let the
  * well-behaved majority share the parent's warm session.
  */
trait ProcessAsset {
  def run(spark: SparkSession, args: Map[String, String]): Unit
}

/** Child-JVM entrypoint: `AssetProc <className> [k=v ...]`. Builds a
  * local session, runs the named [[ProcessAsset]], exits 0 on success
  * and 1 on any throwable (stack trace on stderr for the parent's
  * failure report).
  */
object AssetProc {
  def main(argv: Array[String]): Unit = {
    val kv = argv.drop(1).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad arg (want k=v): $a")
      a.take(i) -> a.drop(i + 1)
    }.toMap
    val spark = SparkSession.builder()
      .master(kv.getOrElse("__master", "local[2]"))
      .appName(s"graft-asset-${argv(0)}")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val status =
      try {
        Class.forName(argv(0)).getDeclaredConstructor().newInstance()
          .asInstanceOf[ProcessAsset]
          .run(spark, kv.removedAll(Seq("__master")))
        0
      } catch {
        case e: Throwable => e.printStackTrace(); 1
      } finally spark.stop()
    sys.exit(status) // non-daemon Spark threads must not keep the child alive
  }
}

object ProcessIsolation {

  /** The JDK-17 module opens Spark needs outside spark-submit — the
    * same list `build.sbt` passes to forked test/run JVMs.
    */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** An [[Asset]] whose body runs in a child JVM (see class doc).
    * Slots into the [[Pipeline]] DAG like any other asset: deps,
    * retries (each retry launches a FRESH child), resume-from-failure
    * and the run report all apply unchanged.
    *
    * @param className fully-qualified [[ProcessAsset]] implementation
    * @param args      string args handed to the child's `run`
    * @param master    the child session's master (default `local[2]`)
    * @param heap      the child's -Xmx (default 2g)
    */
  def processAsset(name: String, className: String,
      args: Map[String, String] = Map.empty,
      deps: Seq[String] = Nil, retries: Int = 0,
      master: String = "local[2]", heap: String = "2g"): Asset =
    Asset(name, deps, retries) { _ =>
      val java = Paths.get(sys.props("java.home"), "bin", "java").toString
      val cmd = Seq(java) ++ addOpens ++ Seq(s"-Xmx$heap",
        "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.pipeline.AssetProc", className) ++
        (args + ("__master" -> master)).toSeq.sorted
          .map { case (k, v) => s"$k=$v" }
      val p = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
      // drain BEFORE waitFor: a full pipe would deadlock a chatty child
      val out = new String(p.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      val code = p.waitFor()
      if (code != 0)
        throw new RuntimeException(
          s"asset $name: child JVM exited $code; output tail:\n" +
            out.takeRight(2000))
    }
}
