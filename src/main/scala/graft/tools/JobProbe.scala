package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{Engine, SparkEntry}

/** Per-job / per-stage timing listener probe (round-16 optimization
  * measurement): runs a declared query twice (warm, then measured) and
  * prints every job of the measured run with wall-clock, stage count
  * and task count — the empirical "where do the seconds go" view the
  * guide's §1 asks for when there is no UI.
  *
  *   runMain graft.tools.JobProbe <sfDir> <query>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLines = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Int)]()
    var enabled = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (enabled) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (System.nanoTime(), desc))
        stageAgg.put(js.jobId, (js.stageInfos.size,
          js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (enabled) {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          val (nStages, nTasks) = Option(stageAgg.get(je.jobId)).getOrElse((0, 0))
          jobLines.add(f"[job] id=${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  stages=$nStages%-3d tasks=$nTasks%-5d $desc")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    spark.catalog.clearCache()
    System.gc()
    enabled = true
    val t = run()
    enabled = false
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    jobLines.asScala.foreach(println)
    println(f"[probe] $name total $t%7.3f s, ${jobLines.size} jobs")
    spark.stop()
  }
}
