package graft.tools

import java.nio.file.{Files, Paths}

/** Child-JVM probe for the two-process [[graft.table.BuildLock]]
  * racing spec: `iters` times, take the lock and do a deliberately
  * windowed read-modify-write on a shared counter file. With mutual
  * exclusion every increment lands (final counter = Σ iters across
  * processes); without it the interleaved read-sleep-write loses
  * updates. Spark-free on purpose — the lock's core only needs a
  * Hadoop conf, so the children start in well under a second.
  *
  *   java -cp ... graft.tools.LockProbe <lockDir> <counterFile> <iters>
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val Array(lockDir, counterFile, itersS) = args
    val iters = itersS.toInt
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = Paths.get(counterFile)
    var i = 0
    while (i < iters) {
      graft.table.BuildLock.withLock(conf, "probe", lockDir) {
        val v = if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
        Thread.sleep(2) // widen the lost-update window
        Files.writeString(p, (v + 1).toString)
      }
      i += 1
    }
    println(s"LockProbe done: $iters")
  }
}
