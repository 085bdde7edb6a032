package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet sinks. The reference exports its table to ONE parquet file
  * (`COPY … (FORMAT PARQUET, OVERWRITE TRUE)`,
  * `taxi_pipeline_native.py:67-69`) and logs its size (`:70-72`);
  * [[exportSingleParquet]] reproduces that contract (coalesce(1) +
  * part-file rename). Single-file output is a small-data convenience —
  * the 100 TB path is [[exportPartitioned]], which keeps writer
  * parallelism and adds partition pruning for downstream readers.
  */
object Sinks {

  /** Write `df` as exactly one parquet file at `destFile`, overwriting.
    * Returns the file size in bytes (the reference's logged metric).
    */
  def exportSingleParquet(df: DataFrame, destFile: String): Long = {
    val dest = Paths.get(destFile)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmpdir")
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.createDirectories(Option(dest.getParent).getOrElse(Paths.get(".")))
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tmp)
    Files.size(dest)
  }

  /** Scale-path export: parallel writers, hive-style partition dirs. */
  def exportPartitioned(df: DataFrame, destDir: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .parquet(destDir)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
