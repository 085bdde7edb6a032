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

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetBytes` each. The small-files problem is the classic
    * slow killer of long-lived 100 TB tables — streaming sinks and
    * per-batch writes accrete thousands of KB-sized files whose
    * per-file open/footer/task overhead eventually dwarfs the data
    * scan. Sizing from the CURRENT on-disk bytes (already compressed)
    * avoids re-estimating compression; the rewrite is one shuffle-free
    * coalesce when shrinking file count (the usual case). The swap is
    * BEST-EFFORT local semantics, not a transaction: it is two
    * directory moves (old→.compact_old, tmp→dir), so there is a window
    * where the directory does not exist, and ATOMIC_MOVE on a
    * directory is filesystem-dependent — this assumes a single writer
    * and no concurrent readers (a table format with a commit log is
    * the real fix on shared storage). On failure between the moves the
    * original directory is restored from `.compact_old`. Returns
    * (filesBefore, filesAfter).
    *
    * For an UNPARTITIONED directory. A hive-partitioned table compacts
    * per partition directory (call this on each) — compacting the root
    * would flatten partition columns into the data files and lose the
    * directory pruning they exist for.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val root = Paths.get(dir)
    def parquetFiles(): Array[Path] = {
      val s = Files.walk(root)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toArray.map(o => o.asInstanceOf[Path])
      finally s.close()
    }
    val parts = parquetFiles()
    val before = parts.length
    val totalBytes = parts.map(Files.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = root.resolveSibling(root.getFileName.toString + ".compact_tmp")
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = root.resolveSibling(root.getFileName.toString + ".compact_old")
    Files.move(root, bak, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      // the table vanished for the failed second move — put it back
      // rather than stranding it at .compact_old
      Files.move(bak, root, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(tmp)
      throw e
    }
    deleteRecursively(bak)
    (before, parquetFiles().length)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
