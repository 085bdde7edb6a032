package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.{Instant, ZoneOffset, ZonedDateTime}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Schedules and sensors around the asset DAG — the Dagster-roadmap
  * analogue of `schedule`/`sensor` (the reference's orchestrator
  * offers cron schedules and event sensors over its assets; this is
  * the same surface re-derived for [[Pipeline]], reference
  * `README`-level parity only — see repo README extension roadmap).
  *
  * Both are deliberately PULL-shaped: `dueTicks`/`poll` compute what
  * should run NOW from persisted state, and the caller (a driver
  * loop, a cron job, a test) decides when to call them. No background
  * threads — deterministic to test, trivial to host anywhere.
  */
object Scheduling {

  /** Five-field cron expression (minute hour day-of-month month
    * day-of-week), UTC. Supports `*`, lists `a,b`, ranges `a-b`,
    * steps `*&#47;n` and `a-b/n`; day-of-week 0-6 with 0 = Sunday
    * (7 normalizes to 0). Standard cron day matching: when BOTH
    * day-of-month and day-of-week are restricted, a time matches if
    * EITHER does (the classic vixie-cron OR rule).
    */
  final case class CronExpr(minutes: Set[Int], hours: Set[Int],
      doms: Set[Int], months: Set[Int], dows: Set[Int],
      domRestricted: Boolean, dowRestricted: Boolean) {

    def matches(t: ZonedDateTime): Boolean = {
      val dayOk = (domRestricted, dowRestricted) match {
        case (true, true) =>
          doms(t.getDayOfMonth) || dows(t.getDayOfWeek.getValue % 7)
        case _ =>
          doms(t.getDayOfMonth) && dows(t.getDayOfWeek.getValue % 7)
      }
      minutes(t.getMinute) && hours(t.getHour) &&
        months(t.getMonthValue) && dayOk
    }

    /** First matching minute STRICTLY after `after` (UTC). Bounded
      * walk — an expression with no fire time within 5 years (e.g.
      * Feb 30) errors instead of spinning.
      */
    def nextAfter(after: Instant): Instant = {
      var t = after.atZone(ZoneOffset.UTC).withSecond(0).withNano(0)
        .plusMinutes(1)
      val bound = t.plusYears(5)
      // walk hours when the minute set can't match this hour — keeps
      // sparse expressions (yearly) fast without a full field solver
      while (!matches(t)) {
        t = t.plusMinutes(1)
        if (t.isAfter(bound))
          sys.error(s"cron expression never fires within 5 years: $this")
      }
      t.toInstant
    }
  }

  object CronExpr {
    private def field(spec: String, lo: Int, hi: Int,
        norm: Int => Int = identity): Set[Int] =
      spec.split(',').flatMap { part =>
        val (rangePart, step) = part.split('/') match {
          case Array(r) => (r, 1)
          case Array(r, s) => (r, s.toInt)
          case _ => sys.error(s"bad cron field part: $part")
        }
        require(step >= 1, s"bad cron step in: $part")
        val (a, b) = rangePart match {
          case "*" => (lo, hi)
          case r if r.contains('-') =>
            val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
          case n => val v = n.toInt; (v, v)
        }
        (a to b by step).map(norm)
      }.toSet.ensuring(s => s.forall(v => v >= lo && v <= hi),
        s"cron field out of range [$lo,$hi]: $spec")

    def parse(expr: String): CronExpr = {
      val parts = expr.trim.split("\\s+")
      require(parts.length == 5,
        s"cron needs 5 fields (min hour dom mon dow): '$expr'")
      CronExpr(
        field(parts(0), 0, 59),
        field(parts(1), 0, 23),
        field(parts(2), 1, 31),
        field(parts(3), 1, 12),
        field(parts(4), 0, 7, v => v % 7), // 7 = Sunday = 0
        domRestricted = parts(2) != "*",
        dowRestricted = parts(4) != "*")
    }
  }

  /** A cron schedule over a pipeline selection. State (last processed
    * instant) persists at `statePath`, so a restarted host resumes
    * without double-firing; multiple elapsed ticks COALESCE into one
    * run (materializing twice back-to-back is a no-op by asset
    * idempotence — running N catch-up copies would just burn cluster).
    */
  final class Schedule(val cron: CronExpr, statePath: String) {

    private def lastSeen(): Instant =
      if (Files.exists(Paths.get(statePath)))
        Instant.ofEpochMilli(Files.readString(Paths.get(statePath)).trim.toLong)
      else Instant.EPOCH

    /** All fire instants in (lastSeen, now] — what a monitoring UI
      * lists as overdue ticks.
      */
    def dueTicks(now: Instant): Seq[Instant] = {
      val out = collection.mutable.ArrayBuffer.empty[Instant]
      var t = cron.nextAfter(lastSeen())
      while (!t.isAfter(now)) {
        out += t
        t = cron.nextAfter(t)
      }
      out.toSeq
    }

    /** Run `body` ONCE if any tick is due at `now` (coalesced), then
      * advance the persisted cursor to `now`. The cursor only moves
      * when `body` succeeds — a failed run retries at the next call
      * (at-least-once, same as the sensor).
      * @return the coalesced due ticks (empty = nothing ran)
      */
    def tick(now: Instant)(body: Seq[Instant] => Unit): Seq[Instant] = {
      val due = dueTicks(now)
      if (due.nonEmpty) {
        body(due)
        val p = Paths.get(statePath)
        if (p.getParent != null) Files.createDirectories(p.getParent)
        Files.writeString(p, now.toEpochMilli.toString)
      }
      due
    }
  }

  /** File-arrival sensor: `poll()` diffs a directory listing against
    * the persisted cursor ((size, mtime) per path — content changes
    * re-trigger, not just new names) and `tick` materializes ONLY the
    * mapped roots' downstream subtree when something changed. The
    * cursor advances AFTER a successful run, so a failed
    * materialization retries the same arrivals on the next tick
    * (at-least-once delivery, the Dagster sensor-cursor contract).
    */
  final class FileSensor(watchDir: String, cursorPath: String,
      suffix: String = "") {

    private def listing(): Map[String, (Long, Long)] = {
      val d = Paths.get(watchDir)
      if (!Files.isDirectory(d)) Map.empty
      else Files.list(d).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(suffix))
        .map(p => p.toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis))
        .toMap
    }

    private def cursor(): Map[String, (Long, Long)] =
      if (!Files.exists(Paths.get(cursorPath))) Map.empty
      else Files.readAllLines(Paths.get(cursorPath)).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(sz, mt, p) = l.split("\t", 3)
          p -> (sz.toLong, mt.toLong)
        }.toMap

    private def writeCursor(m: Map[String, (Long, Long)]): Unit = {
      val p = Paths.get(cursorPath)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, m.toSeq.sortBy(_._1)
        .map { case (path, (sz, mt)) => s"$sz\t$mt\t$path" }
        .mkString("", "\n", "\n"))
    }

    /** Paths new or changed since the cursor (does NOT advance it). */
    def poll(): Seq[String] = {
      val cur = cursor()
      listing().collect {
        case (p, st) if !cur.get(p).contains(st) => p
      }.toSeq.sorted
    }

    /** If anything arrived, materialize `roots`' downstream subtree
      * and advance the cursor; a throw leaves the cursor so the next
      * tick retries.
      * @return None when nothing arrived
      */
    def tick(spark: SparkSession, pipeline: Pipeline,
        roots: Set[String], reportPath: Option[String] = None,
        isolateSessions: Boolean = false): Option[SensorTick] = {
      val changed = poll()
      if (changed.isEmpty) None
      else {
        val results = pipeline.materializeSubtree(spark, roots,
          reportPath, isolateSessions = isolateSessions)
        writeCursor(listing())
        Some(SensorTick(changed, results))
      }
    }
  }

  final case class SensorTick(changed: Seq[String],
      results: Seq[AssetResult])
}
