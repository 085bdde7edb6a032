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

  /** Export a (small) result frame as ONE Arrow IPC file — the
    * Python/pandas handoff the reference gets for free by returning
    * pandas frames from every analysis asset (`taxi_pipeline_native.py
    * :130,171`): downstream Python reads it with
    * `pyarrow.ipc.open_file(...)` / `.read_pandas()`, no Py4J, no JVM.
    * Driver-side single-file semantics like [[exportSingleParquet]]
    * (`toLocalIterator` streams one partition at a time, so the driver
    * holds one batch, not the frame). Supported column types are the
    * contract's result-surface types (bool/int/long/float/double/
    * decimal/string/binary — judged queries emit time as epoch micros
    * per SURVEY §2.4, so no timestamp mapping is needed); anything else
    * fails loudly rather than writing a lossy guess.
    * Returns the file size in bytes.
    */
  def toArrowFile(df: DataFrame, destFile: String,
      batchRows: Int = 4096): Long = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._

    require(batchRows > 0, "batchRows must be positive")
    val sparkFields = df.schema.fields
    val arrowFields: Seq[Field] = sparkFields.toSeq.map { f =>
      val at: ArrowType = f.dataType match {
        case BooleanType => ArrowType.Bool.INSTANCE
        case IntegerType => new ArrowType.Int(32, true)
        case LongType => new ArrowType.Int(64, true)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
        case StringType => ArrowType.Utf8.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case other => throw new IllegalArgumentException(
          s"toArrowFile: unsupported type $other for column ${f.name} — cast it first")
      }
      new Field(f.name, new FieldType(f.nullable, at, null), null)
    }
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(new ArrowSchema(arrowFields.asJava), alloc)
    val out = new java.io.FileOutputStream(destFile)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    try {
      writer.start()
      val rows = df.toLocalIterator()
      while (rows.hasNext) {
        root.allocateNew()
        var n = 0
        while (n < batchRows && rows.hasNext) {
          val row = rows.next()
          var c = 0
          while (c < sparkFields.length) {
            val v = root.getVector(c)
            if (row.isNullAt(c)) v.asInstanceOf[FieldVector] match {
              case fv: BaseFixedWidthVector => fv.setNull(n)
              case fv: BaseVariableWidthVector => fv.setNull(n)
              case fv => throw new IllegalStateException(s"null into $fv")
            } else v match {
              case b: BitVector => b.setSafe(n, if (row.getBoolean(c)) 1 else 0)
              case i: IntVector => i.setSafe(n, row.getInt(c))
              case l: BigIntVector => l.setSafe(n, row.getLong(c))
              case f4: Float4Vector => f4.setSafe(n, row.getFloat(c))
              case f8: Float8Vector => f8.setSafe(n, row.getDouble(c))
              case d: DecimalVector => d.setSafe(n,
                row.getDecimal(c).setScale(d.getScale))
              case s: VarCharVector => s.setSafe(n,
                row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
              case b: VarBinaryVector => b.setSafe(n, row.getAs[Array[Byte]](c))
              case other => throw new IllegalStateException(s"unmapped vector $other")
            }
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); out.close(); root.close(); alloc.close()
    }
    Files.size(Paths.get(destFile))
  }
}
