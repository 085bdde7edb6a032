package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, SparkEntry}

/** Ad-hoc timing diagnostics for the heavy queries (not part of the
  * driver contract): `sbt "runMain graft.tools.Diag <sfDir> <name>..."`
  * times each named query through the noop sink, twice (cold, warm).
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("dedup_components", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "ann_lsh_topk", "ann_ivf_topk", "dedup_embedding")
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      // mirror Bench: untimed warm run, clear persisted intermediates +
      // GC, then the timed run
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        t
      }
      println(f"[diag] $n%-24s cold ${times(0)}%6.2f s  warm ${times(1)}%6.2f s")
    }
    spark.stop()
  }
}
