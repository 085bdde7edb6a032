package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine

/** Stage-by-stage timing probe for the dedup_canonical composition
  * (round-16 optimization measurement): times the n-gram pair
  * generation, the component labeling, and the final keeper window
  * separately so the expensive stage is identified by measurement, not
  * guess. `runMain graft.tools.DedupProbe <sfDir> [reps]`.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val shingled = graft.queries.LlmOps.shinglesRaw(docs)
      val pairs = graft.operators.Dedup
        .ngramJaccardPairs(shingled, "doc_id", "sh", minJac = 0.2)
      val nPairs = time("pairs (ngramJaccard 0.2)") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      val comp = time("components (full)") {
        val c = graft.operators.Components
          .connectedComponents(spark, pairs, "a_id", "b_id")
        c.write.format("noop").mode("overwrite").save()
        c
      }
      time("canonical window") {
        val quality = docs.select(col("doc_id").as("id"), col("n_chars"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("comp").orderBy(col("n_chars").desc, col("id"))
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("comp")
        comp.join(quality, "id")
          .withColumn("rn", row_number().over(wr))
          .withColumn("sz", count(lit(1)).over(wc))
          .filter(col("rn") === 1)
          .select(col("comp"), col("id").as("keep_id"),
            col("n_chars").as("keep_chars"), col("sz"))
          .orderBy("comp")
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[probe] pair rows: ${pairs.count()}")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
