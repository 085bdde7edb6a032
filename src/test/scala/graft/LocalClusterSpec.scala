package graft

import scala.sys.process._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The whole judged inventory under `local-cluster[2,8,4096]` — REAL
  * executor processes, not local-mode threads. local[n] shares one JVM
  * with the driver, which hides closure-serialization and
  * task-side-state bugs in exactly the code that ships custom closures
  * to executors (Packing/Multimodal mapPartitions, GenSource readers,
  * SinkSource writers, Aggregator UDAFs). Here every task crosses a
  * process boundary: closures must serialize, task state must live on
  * the executor, commit messages must flow back — and the DuckDB
  * oracle gate must still hash-match.
  *
  * Needs a real Spark layout at /opt/spark (worker-launched executors
  * boot from SPARK_HOME's launch scripts; build.sbt exports it to the
  * forked test JVM). Our compiled classes ride in on
  * `spark.executor.extraClassPath`.
  *
  * Tagged SlowTest and MUST run alone (one SparkContext per JVM — the
  * shared local[8] test session cannot coexist with this master):
  * {{{ sbt "set Test/testOptions := Seq()" "testOnly graft.LocalClusterSpec" }}}
  */
class LocalClusterSpec extends AnyFunSuite {

  test("judged inventory + oracle gate with real executor processes", SlowTest) {
    assume(new java.io.File("/opt/spark/bin/spark-class").exists(),
      "needs a Spark layout at /opt/spark for executor launch")
    val classes = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
      .map(p => new java.io.File(p).getAbsolutePath)
      .filter(p => new java.io.File(p).exists())
      .mkString(java.io.File.pathSeparator)
    val b = SparkSession.builder()
      .master("local-cluster[2,8,4096]")
      .appName("graft-local-cluster")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.test.home", "/opt/spark") // executor-launch fallback
    Engine.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      assert(spark.sparkContext.master.startsWith("local-cluster"),
        s"unexpected master ${spark.sparkContext.master}")

      val sfDir = "/root/testdata/sf0.001"
      val out = java.nio.file.Files.createTempDirectory("localcluster").toString
      val failed = Verify.dump(spark, sfDir, out)
      assert(failed.isEmpty, s"queries failed under local-cluster: $failed")
      val log = new StringBuilder
      val code = Seq("python3", "tools/oracle_check.py", sfDir, out)
        .!(ProcessLogger(l => log.append(l).append('\n')))
      assert(code == 0, s"oracle mismatch under local-cluster:\n" +
        log.toString.linesIterator.filter(_.startsWith("FAIL")).take(20)
          .mkString("\n"))
      info(log.toString.linesIterator.filter(_.contains("queries match"))
        .mkString)
      // distributed-execution sanity, read AFTER the work ran: the
      // driver's block manager plus both workers' executor processes
      // must have registered (in local-cluster the driver runs no
      // tasks, so a degraded cluster couldn't have produced results —
      // this just makes the claim explicit)
      val execs = spark.sparkContext.getExecutorMemoryStatus.keySet
      assert(execs.size >= 3,
        s"expected driver + 2 executor processes, saw only $execs")
      info(s"executors seen: ${execs.size} (driver + 2 workers)")
    } finally spark.stop()
  }
}
