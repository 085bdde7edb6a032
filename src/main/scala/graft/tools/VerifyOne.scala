package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Engine, SparkEntry}

/** Subset correctness dump (not part of the driver contract): like
  * [[graft.Verify]] but only for the named queries, so a single judged
  * query iterates in seconds instead of re-running the full inventory.
  *
  *   sbt "runMain graft.tools.VerifyOne <sfDir> <outDir> <name>..."
  *   python3 tools/oracle_check.py <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: VerifyOne <sfDir> <outDir> <name>...")
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // the driver-exact VALUES oracles (AnnOracle/BpeOracle/PackOracle)
    // derive from the scale-factor dir, announced the same way
    // graft.Verify.dump does
    System.setProperty("graft.oracle.sfDir", sfDir)
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.Verify.oracleJson(
        SparkEntry.oracleSql.filter(kv => names.contains(kv._1))))
    spark.stop()
  }
}
