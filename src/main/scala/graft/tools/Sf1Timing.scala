package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Engine, SparkEntry}

/** Timed sf1 record for the SUPERLINEAR-RISK query family (`dedup_*`,
  * `ann_*`, `graph_triangles`): the sf1 differ proves 1000×-scale
  * correctness but records no per-query engine wall-times. This main
  * times each family query once at sf0.1 (driver fixture) and once at
  * sf1 ([[SoakDataGen]] — core tables 10× sf0.1's rows,
  * documents/embeddings sublinear per the driver's own curve) and
  * flags any query whose sf1/sf0.1 ratio exceeds the near-linear
  * budget: data grows ≤10×, so a documented O(n)–O(n log n) operator
  * should stay well under 25× wall-clock (shuffle constants and
  * fixed overheads keep real ratios far below the data ratio; a
  * breach means super-linear drift against the cost model). Output:
  * one JSON object, committed per round as `SF1_TIMING_r{N}.json`.
  *
  * TREND gate (round 15): each ratio also diffs against the newest
  * previously-committed `SF1_TIMING_r*.json` — a family whose ratio
  * GREW more than 1.5× round-over-round lands in `trend_flagged`,
  * catching regressions the 25× absolute flag can't see (an operator
  * drifting 3× → 6× → 12× is three green absolute rounds).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Sf1Timing SF1_TIMING_r15.json"`
  */
object Sf1Timing {

  /** ratios of the newest committed SF1_TIMING_r{N}.json below `out`'s
    * round (so re-running a round diffs against the PREVIOUS one, not
    * itself)
    */
  private[tools] def previousRatios(outPath: String): Map[String, Double] = {
    val outRound = "_r(\\d+)".r.findFirstMatchIn(outPath)
      .map(_.group(1).toInt).getOrElse(Int.MaxValue)
    val rec = "^SF1_TIMING_r(\\d+)\\.json$".r
    // records live next to the OUTPUT record, not necessarily the cwd
    val dir = Option(new java.io.File(outPath).getParentFile)
      .getOrElse(new java.io.File("."))
    val prev = Option(dir.listFiles()).getOrElse(Array())
      .flatMap(f => rec.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt).filter(_ < outRound).map(r => (r, f)))
      .sortBy(_._1)
      .lastOption.map(_._2)
    prev.map { f =>
      val txt = Files.readString(f.toPath)
      """"([A-Za-z0-9_]+)":\{"sf01_sec":[^}]*"ratio":([0-9.]+)""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
  }

  /** Dot-decimal formatting regardless of the ambient locale: the
    * record is machine-read (next round's trend diff parses it with a
    * dot-decimal regex), and a bare f-interpolator formats in the
    * DEFAULT locale. Formatting per-field instead of mutating the
    * process-wide default keeps the object safe to invoke from a
    * shared JVM (sbt interactive, tests), where Locale.setDefault
    * would leak into unrelated code.
    */
  private def rootf(fmt: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, fmt,
      args.map(_.asInstanceOf[AnyRef]): _*)

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SF1_TIMING.json")
    val prevRatios = previousRatios(outPath)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(Engine.extensionsConf._1, Engine.extensionsConf._2)
      .config("spark.ui.enabled", "false")
      // timing-only harness headroom: at 32 local cores some family
      // queries' per-task results (e.g. checkpointed component
      // frontiers) cross the 1g default that 8-core runs stay under
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = "/root/testdata/sf0.1"
    val sf1Dir = new java.io.File("target/soak-sf1").getAbsolutePath
    if (!new java.io.File(s"$sf1Dir/lineitem.parquet").exists())
      SoakDataGen.generate(spark, "/root/testdata/sf0.001", sf1Dir, 1000)

    // COLD-STATE discipline: the build-once index tiers (ann_ivf_index,
    // dedup_incremental) cache fingerprinted state under target/ — a
    // record taken against surviving state from an earlier run on the
    // same data measures the warm probe, and the NEXT round's fresh
    // soak data would then build cold against a warm baseline and
    // spuriously trip the trend gate. Delete the caches so every
    // record prices the same thing: one build + one probe.
    Seq("target/graft_ivfidx", "target/graft_mhidx").foreach { p =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(p))
    }

    val family = SparkEntry.queries.keys
      .filter(n => n.startsWith("dedup_") || n.startsWith("ann_") ||
        n == "graph_triangles")
      .toSeq.sorted

    def time(name: String, dir: String): Double = {
      System.err.println(s"[sf1timing] running $name @ $dir")
      System.setProperty("graft.oracle.sfDir", dir)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").parquet(s"target/sf1timing/$name")
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }

    val rows = family.map { n =>
      val a = time(n, sf01)
      val b = time(n, sf1Dir)
      val ratio = b / math.max(0.001, a)
      val trend = prevRatios.get(n).map(p => ratio / math.max(0.001, p))
      val ts = trend.map(t => rootf(" trend=%5.2fx", t)).getOrElse("")
      System.err.println(rootf(
        "[sf1timing] %-24s sf0.1=%7.2fs sf1=%8.2fs ratio=%6.2fx%s",
        n, a, b, ratio, ts))
      (n, a, b, ratio, trend)
    }
    val flagged = rows.filter(_._4 > 25.0).map(_._1)
    val trendFlagged = rows.filter(_._5.exists(_ > 1.5)).map(_._1)
    val json = rows.map { case (n, a, b, r, t) =>
      val tj = t.map(v => rootf(""","trend":%.2f""", v)).getOrElse("")
      rootf(""""%s":{"sf01_sec":%.3f,"sf1_sec":%.3f,"ratio":%.2f%s}""",
        n, a, b, r, tj)
    }.mkString(
      s"""{"family":"superlinear-risk","data_ratio":10,"flag_over":25.0,""" +
        s""""flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""trend_flag_over":1.5,""" +
        s""""trend_flagged":[${trendFlagged.map("\"" + _ + "\"").mkString(",")}],""" +
        """"queries":{""",
      ",", "}}")
    println(json)
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
