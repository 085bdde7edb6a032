package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import graft.pipeline.{Asset, Pipeline, Scheduling}
import graft.pipeline.Scheduling.{CronExpr, FileSensor, Schedule}

/** Schedules and sensors over the asset DAG
  * ([[graft.pipeline.Scheduling]]) — the Dagster schedule/sensor
  * analogue: cron tick computation with persisted coalescing state,
  * and a file-arrival sensor whose tick materializes ONLY the affected
  * downstream subtree with an at-least-once cursor.
  */
class SchedulingSpec extends SparkSpec {

  private def t(s: String): Instant = Instant.parse(s)

  test("cron parse + nextAfter: steps, ranges, lists, dow") {
    // every 15 minutes
    val q = CronExpr.parse("*/15 * * * *")
    assert(q.nextAfter(t("2026-03-05T10:07:00Z")) == t("2026-03-05T10:15:00Z"))
    assert(q.nextAfter(t("2026-03-05T10:15:00Z")) == t("2026-03-05T10:30:00Z"))
    // daily at 09:30
    val d = CronExpr.parse("30 9 * * *")
    assert(d.nextAfter(t("2026-03-05T09:30:00Z")) == t("2026-03-06T09:30:00Z"))
    assert(d.nextAfter(t("2026-03-05T02:00:00Z")) == t("2026-03-05T09:30:00Z"))
    // weekdays at 8 (2026-03-06 is a Friday, 03-07 Saturday)
    val w = CronExpr.parse("0 8 * * 1-5")
    assert(w.nextAfter(t("2026-03-06T09:00:00Z")) == t("2026-03-09T08:00:00Z"))
    // dow list with 7-as-Sunday normalization
    val sun = CronExpr.parse("0 0 * * 7")
    assert(sun.nextAfter(t("2026-03-06T00:00:00Z")) == t("2026-03-08T00:00:00Z"))
    // month + dom (yearly): bounded walk still finds it
    val y = CronExpr.parse("0 12 25 12 *")
    assert(y.nextAfter(t("2026-03-05T00:00:00Z")) == t("2026-12-25T12:00:00Z"))
    // the vixie OR rule: dom 10 OR friday, both restricted
    val or = CronExpr.parse("0 0 10 * 5")
    assert(or.nextAfter(t("2026-03-05T01:00:00Z")) == t("2026-03-06T00:00:00Z"))
    assert(or.nextAfter(t("2026-03-06T01:00:00Z")) == t("2026-03-10T00:00:00Z"))
  }

  test("schedule: due ticks accumulate, coalesce into one run, persist") {
    val state = Files.createTempDirectory("sched").resolve("s.txt").toString
    val s = new Schedule(CronExpr.parse("0 * * * *"), state)
    var runs = 0
    // three hourly ticks elapsed -> listed individually, ONE body run
    val due = s.tick(t("1970-01-01T03:10:00Z")) { ds =>
      runs += 1
      assert(ds == Seq(t("1970-01-01T01:00:00Z"), t("1970-01-01T02:00:00Z"),
        t("1970-01-01T03:00:00Z")))
    }
    assert(due.size == 3 && runs == 1)
    // nothing new before the next boundary — body NOT invoked
    assert(s.tick(t("1970-01-01T03:40:00Z")) { _ => runs += 1 }.isEmpty)
    assert(runs == 1)
    // a NEW instance over the same state file resumes the cursor
    val s2 = new Schedule(CronExpr.parse("0 * * * *"), state)
    val due2 = s2.tick(t("1970-01-01T04:05:00Z")) { _ => runs += 1 }
    assert(due2 == Seq(t("1970-01-01T04:00:00Z")) && runs == 2)
    // a FAILED body leaves the cursor: the tick re-fires next call
    intercept[RuntimeException] {
      s2.tick(t("1970-01-01T05:05:00Z")) { _ => sys.error("boom") }
    }
    assert(s2.tick(t("1970-01-01T05:06:00Z")) { _ => runs += 1 }.nonEmpty)
    assert(runs == 3)
  }

  /** A diamond + one unrelated asset; records execution order. */
  private def diamond(ran: collection.mutable.Buffer[String]): Pipeline = {
    def a(name: String, deps: String*) =
      Asset(name, deps) { _ => ran += name; () }
    new Pipeline(Seq(
      a("raw"), a("clean", "raw"), a("agg", "clean"),
      a("report", "agg"), a("unrelated")))
  }

  test("sensor tick materializes only the affected downstream subtree") {
    val watch = Files.createTempDirectory("sensor_in")
    val cursor = Files.createTempDirectory("sensor_c").resolve("cur.tsv")
    val sensor = new FileSensor(watch.toString, cursor.toString, ".csv")
    val ran = collection.mutable.Buffer.empty[String]
    val p = diamond(ran)

    // nothing arrived: no run
    assert(sensor.tick(spark, p, Set("clean")).isEmpty && ran.isEmpty)

    // a file arrives: clean + its downstream run, raw/unrelated do NOT
    Files.writeString(watch.resolve("batch1.csv"), "x,y\n1,2\n")
    Files.writeString(watch.resolve("ignored.tmp"), "not matched")
    val tick = sensor.tick(spark, p, Set("clean")).get
    assert(tick.changed.map(Paths.get(_).getFileName.toString) ==
      Seq("batch1.csv"))
    assert(ran.toSeq == Seq("clean", "agg", "report"))
    assert(tick.results.map(_.name) == Seq("clean", "agg", "report"))

    // same listing: cursor advanced, nothing re-runs
    ran.clear()
    assert(sensor.tick(spark, p, Set("clean")).isEmpty && ran.isEmpty)

    // content CHANGE re-triggers (size/mtime cursor, not name-only)
    Files.writeString(watch.resolve("batch1.csv"), "x,y\n1,2\n3,4\n")
    assert(sensor.tick(spark, p, Set("clean")).nonEmpty)
    assert(ran.toSeq == Seq("clean", "agg", "report"))
  }

  test("sensor cursor is at-least-once: a failed run retries the arrivals") {
    val watch = Files.createTempDirectory("sensor_f")
    val cursor = Files.createTempDirectory("sensor_fc").resolve("cur.tsv")
    val sensor = new FileSensor(watch.toString, cursor.toString)
    var attempts = 0
    val p = new Pipeline(Seq(Asset("flaky") { _ =>
      attempts += 1
      if (attempts == 1) sys.error("first attempt fails")
    }))
    Files.writeString(watch.resolve("data.bin"), "payload")
    intercept[RuntimeException] { sensor.tick(spark, p, Set("flaky")) }
    assert(attempts == 1)
    // cursor did NOT advance: the same arrival fires again and succeeds
    val tick = sensor.tick(spark, p, Set("flaky"))
    assert(tick.nonEmpty && attempts == 2)
    // now it is drained
    assert(sensor.tick(spark, p, Set("flaky")).isEmpty && attempts == 2)
  }

  test("materializeSubtree validates roots and skips unrelated assets") {
    val ran = collection.mutable.Buffer.empty[String]
    val p = diamond(ran)
    intercept[IllegalArgumentException] {
      p.materializeSubtree(spark, Set("nope"))
    }
    val res = p.materializeSubtree(spark, Set("agg"))
    assert(res.map(_.name) == Seq("agg", "report"))
    assert(ran.toSeq == Seq("agg", "report"))
  }
}
