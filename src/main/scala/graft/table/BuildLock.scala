package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** CROSS-PROCESS single-builder guard for the write-once judged-table
  * builds (`EngineOps.catalogFor` warehouses and the
  * `target/graft_table` fixtures).
  *
  * Why it exists: a build's APPEND steps are idempotent across
  * processes through commit txn tags ([[GraftTable.append]]'s
  * `txn = Some((name, v))`), but its UPDATE/MERGE/compact steps are
  * version-GATED, not tagged — two JVMs (the driver's Verify racing a
  * test suite) can both observe `version == 1`, both issue the UPDATE,
  * and [[GraftTable]]'s `commitRetry` would faithfully rebuild the
  * loser against the winner's tip and apply it AGAIN, double-bumping
  * the data. A JVM-local `synchronized` cannot see the other process;
  * this lock can.
  *
  * Mechanism: one exclusive lock FILE per build key, published through
  * the same [[LogStore.writeIfAbsent]] primitive the commit protocol
  * already trusts (local FS: `link(2)` fails EEXIST atomically in the
  * kernel — genuinely cross-process; object stores: conditional PUT).
  * The locked body re-checks its version gates AFTER acquisition, so
  * the second builder finds the work done and falls through — that
  * re-check, not the lock alone, is the single-apply proof.
  *
  * Crash safety: a builder that dies mid-hold leaves its lock file
  * behind; waiters break a lock older than [[staleMs]] (the lock
  * carries its creation timestamp). The break re-reads the timestamp
  * immediately before deleting, so a freshly re-acquired lock is not
  * mistaken for the stale one — a read-then-delete window remains in
  * principle, but only after a builder has ALREADY sat on the lock
  * for the full stale horizon (builds run seconds). Locks live in
  * their own directory, never inside a table tree, so log replay,
  * `describeDetail` listings, and vacuum never see them.
  */
object BuildLock {

  /** Default lock-file directory — session-local builds only ever
    * write under `target/`, and the lock must be on the SAME
    * filesystem view every racing process shares.
    */
  val DefaultDir = "target/graft_locks"

  /** Lock considered abandoned after this long (ms). Builds take
    * seconds; 10 min tolerates a GC-wedged builder without letting a
    * crashed one block the fleet forever.
    */
  val staleMs: Long = 10 * 60 * 1000L

  /** Give up waiting after this long (ms) — a deadlock surfaces as an
    * error naming the lock, not a silent hang.
    */
  val timeoutMs: Long = 15 * 60 * 1000L

  private val pollMs = 25L

  private def sanitize(key: String): String = {
    val tail = key.takeRight(48).map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    s"$tail-$h"
  }

  /** Session spelling of [[withLock]] — the EngineOps call sites. */
  def withLock[T](spark: SparkSession, key: String)(body: => T): T =
    withLock(spark.sessionState.newHadoopConf(), key, DefaultDir)(body)

  /** Run `body` holding the exclusive cross-process lock for `key`
    * (any stable string naming the build — the primary table root).
    * Needs only a Hadoop conf, no session — the two-JVM racing spec
    * probes this exact method from Spark-free child processes.
    * In-JVM callers must ALSO serialize among themselves (EngineOps
    * wraps this in its own `synchronized`); the file lock is
    * deliberately not reentrant.
    */
  def withLock[T](conf: org.apache.hadoop.conf.Configuration, key: String,
      lockDir: String)(body: => T): T = {
    val dir = new Path(lockDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val store = LogStore.forFs(fs)
    val name = s"${sanitize(key)}.lock"
    val lockPath = new Path(dir, name)
    def content() =
      s"""{"pid": ${ProcessHandle.current().pid()}, "ts": ${System.currentTimeMillis()}}"""
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      held = store.writeIfAbsent(fs, dir, name, content())
      if (!held) {
        // stale-break: re-read IMMEDIATELY before deleting so a lock
        // freshly taken by another waiter is never the one we break
        val ts =
          try {
            val node = new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(LogStore.readString(fs, lockPath))
            if (node.hasNonNull("ts")) node.get("ts").asLong else 0L
          } catch { case _: Exception => Long.MaxValue } // vanished: retry
        if (ts != Long.MaxValue &&
            System.currentTimeMillis() - ts > staleMs) {
          System.err.println(s"[graft] breaking stale build lock $name " +
            s"(age ${(System.currentTimeMillis() - ts) / 1000}s)")
          try fs.delete(lockPath, false) catch { case _: Exception => () }
        } else if (System.currentTimeMillis() > deadline)
          sys.error(s"timed out after ${timeoutMs / 1000}s waiting for " +
            s"build lock $lockPath (holder: pid/ts in the file)")
        else Thread.sleep(pollMs)
      }
    }
    try body
    finally {
      try fs.delete(lockPath, false)
      catch { case e: Exception =>
        System.err.println(s"[graft] build lock release failed: $e")
      }
    }
  }
}
