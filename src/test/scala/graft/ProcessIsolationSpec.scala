package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Asset, Pipeline, ProcessAsset, ProcessIsolation}

/** JVM-level crash isolation: a process asset that HALTS its JVM fails
  * only itself — the parent JVM, its SparkSession, and the rest of the
  * pipeline machinery (retries, resume-from-failure, reports) survive.
  */
class ProcessIsolationSpec extends SparkSpec {

  private def tmp(): Path = Files.createTempDirectory("graft_proc")

  test("process asset runs in a child JVM with a working SparkSession") {
    val dir = tmp()
    val out = dir.resolve("ok.txt")
    val p = new Pipeline(Seq(
      ProcessIsolation.processAsset("child_count",
        classOf[OkProcAsset].getName, Map("out" -> out.toString)),
      Asset("downstream", deps = Seq("child_count")) { s =>
        Files.writeString(dir.resolve("down.txt"),
          Files.readString(out) + "+seen")
      }))
    val res = p.materialize(spark)
    assert(res.forall(_.error.isEmpty))
    assert(Files.readString(out) == "100")
    assert(Files.readString(dir.resolve("down.txt")) == "100+seen")
  }

  test("a child JVM halt fails ONE asset; the parent survives and resume re-runs only the subtree") {
    val dir = tmp()
    val report = dir.resolve("report.json").toString
    def pipeline(broken: Boolean) = new Pipeline(Seq(
      Asset("up") { s =>
        Files.writeString(dir.resolve(s"up-${System.nanoTime()}.txt"), "u")
      },
      ProcessIsolation.processAsset("crashy",
        if (broken) classOf[HaltProcAsset].getName
        else classOf[OkProcAsset].getName,
        Map("out" -> dir.resolve("crashy.txt").toString),
        deps = Seq("up")),
      Asset("down", deps = Seq("crashy")) { s =>
        Files.writeString(dir.resolve("down.txt"), "d")
      }))
    val e = intercept[RuntimeException] {
      pipeline(broken = true).materialize(spark, reportPath = Some(report))
    }
    assert(e.getMessage.contains("exited"), s"want child exit error, got $e")
    // the parent JVM and its session are alive and usable
    assert(spark.range(10).count() == 10)
    assert(!Files.exists(dir.resolve("down.txt")), "downstream must not run")
    // resume with the fixed asset: 'up' is reused, crashy+down re-run
    val res = pipeline(broken = false)
      .materializeResume(spark, report)
    assert(res.find(_.name == "up").get.reused)
    assert(res.find(_.name == "crashy").get.error.isEmpty)
    assert(Files.readString(dir.resolve("crashy.txt")) == "100")
    assert(Files.readString(dir.resolve("down.txt")) == "d")
    assert(Files.list(dir).iterator().asScala // scalastyle:off
      .count(_.getFileName.toString.startsWith("up-")) == 1,
      "reused upstream must not have re-executed")
  }

  test("retries launch a FRESH child: crash-once-then-succeed recovers") {
    val dir = tmp()
    val res = new Pipeline(Seq(
      ProcessIsolation.processAsset("flaky",
        classOf[FlakyProcAsset].getName,
        Map("marker" -> dir.resolve("m").toString,
          "out" -> dir.resolve("out.txt").toString),
        retries = 1)))
      .materialize(spark)
    val r = res.head
    assert(r.error.isEmpty && r.attempts == 2)
    assert(Files.readString(dir.resolve("out.txt")) == "recovered")
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(it).asScala
  }
}

/** Proves the child's session executes real Spark work. */
class OkProcAsset extends ProcessAsset {
  override def run(spark: SparkSession, args: Map[String, String]): Unit =
    Files.writeString(Path.of(args("out")),
      spark.range(1000).filter("id < 100").count().toString)
}

/** Hard-kills its JVM — no shutdown hooks, the closest JDK analogue of
  * a segfault/OOM-kill.
  */
class HaltProcAsset extends ProcessAsset {
  override def run(spark: SparkSession, args: Map[String, String]): Unit =
    Runtime.getRuntime.halt(7)
}

/** Halts the FIRST child (after dropping a marker), succeeds in the
  * retry's fresh child — the crash-then-recover retry path.
  */
class FlakyProcAsset extends ProcessAsset {
  override def run(spark: SparkSession, args: Map[String, String]): Unit = {
    val marker = Path.of(args("marker"))
    if (!Files.exists(marker)) {
      Files.writeString(marker, "x")
      Runtime.getRuntime.halt(3)
    }
    Files.writeString(Path.of(args("out")), "recovered")
  }
}
