package graft.table

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, Type}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning => V2Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned join (SPJ) support for graft catalog tables —
  * the 100 TB join lever: when two tables are partitioned by
  * `identity(k)` on the join key, reporting each file group's exact
  * partition value lets Spark's `EnsureRequirements` match the two
  * [[KeyGroupedPartitioning]]s and plan the join with ZERO shuffle —
  * neither fact table is exchanged, partition pairs join executor-
  * local (the V2 co-partitioned-join design Iceberg ships; re-derived
  * here for this log from the public connector API only).
  *
  * Engagement is the user's explicit opt-in,
  * `spark.sql.sources.v2.bucketing.enabled = true` (the same flag
  * Spark gates its SPJ planning on — a scan that reported partitioning
  * Spark will not use would pay this row-based reader for nothing):
  *
  *  - flag OFF (default): reads flow through the V1 bridge
  *    ([[GraftScan]]) — vectorized parquet, row-group pushdown.
  *  - flag ON and the snapshot is SPJ-capable ([[GraftSpj.eligible]]:
  *    every transform reportable — identity/bucket/truncate or a
  *    calendar kind — every file carrying its full current-spec tuple,
  *    primitive column types; deletion vectors stay eligible via an
  *    inline sorted-positions skip in the reader): reads flow
  *    through THIS genuine DSv2 `Batch` — one [[InputPartition]] per
  *    partition TUPLE ([[HasPartitionKey]] carries the decoded key),
  *    zone-map/partition file pruning still applies, and every offered
  *    filter is returned as residual so Spark re-evaluates it above
  *    the scan (correctness does not depend on the reader).
  *
  * The per-file read is COLUMNAR by default ([[VectorizedKey]]):
  * Spark's own vectorized parquet reader decodes each file into
  * `ColumnarBatch`es at the V1 path's rate, with DV masking applied
  * as batch compaction — so taking the zero-exchange path no longer
  * trades away decode speed. The row-based `Group` reader survives
  * behind the kill switch. (Reference: the thesis query's join,
  * `taxi_pipeline_native.py:102-137`, at warehouse scale.)
  */
object GraftSpj {

  val ConfKey = "spark.sql.sources.v2.bucketing.enabled"

  /** Columnar SPJ reads (default on): partitions decode through
    * Spark's own vectorized parquet reader and flow to the join as
    * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es — the V1
    * path's decode rate WITHOUT the exchange. A deletion vector no
    * longer pins the scan to rows: the file's sorted masked positions
    * compact each batch (pass-through when a batch intersects no
    * masked position — the common case, since DV debt is bounded by
    * `maintain`). `false` pins every partition to the row-based Group
    * reader (the pre-round-13 behavior, kept as the kill switch).
    */
  val VectorizedKey = "spark.graft.spj.vectorized"

  /** Column types the Group reader converts — primitives only;
    * nested/decimal/binary shapes stay on the V1 path.
    */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
        FloatType | BooleanType | StringType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  /** Transforms the SPJ path can report: `identity(c)` maps to the V2
    * identity expression; `bucket(n, c)` maps to `Expressions.bucket`,
    * the calendar kinds to `Expressions.days/hours/months/years`, and
    * `truncate(w, c)` to the general named transform
    * `Expressions.apply("truncate", literal(w), column(c))` — all
    * resolved through the catalog's FunctionCatalog
    * ([[GraftBucketFunction]], [[GraftTimeFunction]],
    * [[GraftTruncateFunction]]) — bucketed fact-fact joins,
    * co-partitioned time-sliced joins, and prefix-blocked string keys
    * alike. Every declared transform kind is reportable.
    */
  def spjTransform(t: Partitioning.PTransform): Boolean = t match {
    case _: Partitioning.PIdentity | _: Partitioning.PBucket |
        _: Partitioning.PDays | _: Partitioning.PHours |
        _: Partitioning.PMonths | _: Partitioning.PYears |
        _: Partitioning.PTruncate => true
    case _ => false
  }

  /** SPJ-capable snapshot: every declared transform is reportable
    * ([[spjTransform]]), every file carries its full tuple, and every
    * column type is readable. Deletion vectors do NOT disqualify: the
    * per-file reader streams rows in position order, so a DV is a
    * sorted-positions skip list applied inline (the merge-on-read
    * contract without the V1 path's anti-join).
    */
  def eligible(spark: SparkSession, snap: GraftTable.Snapshot): Boolean =
    spark.conf.get(ConfKey, "false").toBoolean &&
      snap.spec.nonEmpty &&
      snap.spec.forall(spjTransform) &&
      snap.schema.fields.forall(f => supported(f.dataType)) &&
      snap.files.forall(f => snap.spec.forall(t => f.part.contains(t.fieldName)))

  /** Inverse of [[Partitioning.hexOf]]. */
  private[table] def unhex(s: String): String = {
    val bytes = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decode one encoded partition value to its INTERNAL-row
    * representation: the source column's type for `identity`, the
    * bucket ordinal (the transform's IntegerType result) for `bucket`.
    */
  private[table] def decodeKey(enc: String, t: Partitioning.PTransform,
      dt: DataType): Any =
    if (enc == Partitioning.NullValue) null
    else t match {
      case _: Partitioning.PBucket => enc.toInt
      case _: Partitioning.PDays | _: Partitioning.PHours |
          _: Partitioning.PMonths | _: Partitioning.PYears => enc.toLong
      case _ => dt match {
        case StringType => UTF8String.fromString(unhex(enc))
        case DateType => enc.toLong.toInt
        case LongType => enc.toLong
        case IntegerType => enc.toLong.toInt
        case ShortType => enc.toLong.toShort
        case ByteType => enc.toLong.toByte
        case other =>
          sys.error(s"identity partition on unsupported type $other")
      }
    }
}

/** The catalog-level `bucket` V2 function. Spark resolves the
  * `bucket(n, col)` transform reported by [[GraftBatchScan]] through
  * the table catalog's `FunctionCatalog`; both join sides binding to
  * the same canonical function is what lets `KeyGroupedShuffleSpec`
  * declare the two partitionings compatible and drop the exchange.
  * Evaluation is the exact write-side clustering expression,
  * `pmod(xxhash64(col), n)` ([[Partitioning.PBucket]].writeExpr).
  */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n) — the graft partition transform"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.catalogString}")
    GraftBoundBucket(inputType.fields(1).dataType)
  }
}

/** The calendar transforms (`days`/`hours`/`months`/`years`) as
  * catalog V2 functions — same SPJ-resolution role as
  * [[GraftBucketFunction]]. Evaluation delegates to the transform's
  * own `encodePrim`, the single source of truth the write side and the
  * pruning side already share (UTC-fixed epoch units).
  */
final case class GraftTimeFunction(kind: String)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = kind
  override def description(): String =
    s"$kind(col): UTC epoch-$kind of a date/timestamp — the graft partition transform"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 1,
      s"$kind expects (col), got ${inputType.catalogString}")
    GraftBoundTime(kind, inputType.fields.head.dataType)
  }
}

final case class GraftBoundTime(kind: String, dt: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long] {
  private val t: Partitioning.PTransform = kind match {
    case "days" => Partitioning.PDays("c")
    case "hours" => Partitioning.PHours("c")
    case "months" => Partitioning.PMonths("c")
    case "years" => Partitioning.PYears("c")
  }
  require(t.accepts(dt), s"$kind does not accept ${dt.catalogString}")
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = LongType
  override def name(): String = kind
  override def canonicalName(): String = s"graft.$kind(${dt.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null
    else t.encodePrim(input.get(0, dt), dt) match {
      case Some(enc) => java.lang.Long.valueOf(enc.toLong)
      case None => sys.error(s"$kind: unencodable value for ${dt.catalogString}")
    }
}

/** Bound `bucket` for one source type. `canonicalName` carries the
  * type: xxhash64 hashes each width differently, so an int-keyed and a
  * long-keyed table must NOT be declared co-partitioned.
  */
final case class GraftBoundBucket(dt: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(1)) null
    else {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      val n = input.getInt(0)
      val h = new XxHash64(Seq(Literal(input.get(1, dt), dt)))
        .eval(null).asInstanceOf[Long]
      (((h % n) + n) % n).toInt
    }
}

/** The catalog-level `truncate` V2 function — same SPJ-resolution role
  * as [[GraftBucketFunction]]: both sides of a join over
  * `truncate(w, col)`-partitioned tables bind here, and matching
  * canonical functions with equal width arguments is what lets
  * `KeyGroupedShuffleSpec` declare the partitionings compatible.
  * Evaluation replicates [[Partitioning.PTruncate]] exactly: strings
  * keep their first `w` CODE POINTS, integers floor to a multiple of
  * `w` — the write-side clustering value, so reported keys and
  * function results can never disagree.
  */
object GraftTruncateFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): first w code points (string) / floor to a " +
      "multiple of w (integral) — the graft partition transform"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate expects (width, col), got ${inputType.catalogString}")
    GraftBoundTruncate(inputType.fields(1).dataType)
  }
}

/** Bound `truncate` for one source type. `canonicalName` carries the
  * type (the width travels as the transform's literal argument, which
  * SPJ compares separately): a 4-byte and an 8-byte keyed table floor
  * to different domains and must not be declared co-partitioned.
  */
final case class GraftBoundTruncate(dt: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Any] {
  GraftTruncateEval.check(dt)
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = dt
  override def name(): String = "truncate"
  override def canonicalName(): String = s"graft.truncate(${dt.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Any =
    if (input.isNullAt(1)) null
    else GraftTruncateEval(input.getInt(0), dt, input, 1)
}

/** WIDTH-PINNED single-argument `truncate` — what the SPJ batch
  * REPORTS. Spark's key-grouped scan machinery downgrades a
  * partitioning whose transform carries a literal argument (the
  * two-argument `truncate(w, col)` spelling left the scan at
  * `UnknownPartitioning`), so the width moves into the FUNCTION
  * IDENTITY instead: the transform is `truncate_<w>(col)` and
  * `canonicalName` pins (width, type) — which is also the correct
  * compatibility semantics, since co-partitioned means SAME width.
  * The two-argument [[GraftTruncateFunction]] stays for SQL callers.
  */
final case class GraftTruncateWidthFunction(w: Int)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  require(w >= 1, s"truncate width must be >= 1, got $w")
  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): the graft truncate($w, col) partition transform"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate_$w expects (col), got ${inputType.catalogString}")
    GraftBoundTruncateWidth(w, inputType.fields(0).dataType)
  }
}

final case class GraftBoundTruncateWidth(w: Int, dt: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Any] {
  GraftTruncateEval.check(dt)
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = dt
  override def name(): String = s"truncate_$w"
  override def canonicalName(): String =
    s"graft.truncate($w, ${dt.catalogString})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Any =
    if (input.isNullAt(0)) null
    else GraftTruncateEval(w, dt, input, 0)
}

/** The one truncate evaluation both function spellings share —
  * replicates [[Partitioning.PTruncate]] exactly (first `w` code
  * points for strings, floor to a multiple of `w` for integrals).
  */
private[table] object GraftTruncateEval {
  def check(dt: DataType): Unit =
    require(dt == StringType || dt == LongType || dt == IntegerType ||
      dt == ShortType || dt == ByteType,
      s"truncate does not accept ${dt.catalogString}")

  def apply(w: Int, dt: DataType, input: InternalRow, ord: Int): Any =
    dt match {
      case StringType =>
        val s = input.getUTF8String(ord).toString
        val cps = s.codePoints().limit(w).toArray
        UTF8String.fromString(new String(cps, 0, cps.length))
      case _ =>
        val l = dt match {
          case LongType => input.getLong(ord)
          case IntegerType => input.getInt(ord).toLong
          case ShortType => input.getShort(ord).toLong
          case ByteType => input.getByte(ord).toLong
          case other => sys.error(s"unreachable: $other")
        }
        val f = l - Math.floorMod(l, w.toLong)
        dt match {
          case LongType => f
          case IntegerType => f.toInt
          case ShortType => f.toShort
          case ByteType => f.toByte
          case other => sys.error(s"unreachable: $other")
        }
    }
}

/** Hadoop `Configuration` over Java serialization (it is `Writable`,
  * not `Serializable`) — the executor-side reader resolves the
  * warehouse path through the session's filesystem confs.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** One file of an SPJ split: absolute path, PHYSICAL row count, and —
  * if a merge-on-read delete masked it — the file's deletion vector
  * (absolute DV parquet path, the file's identity key in the DV's
  * `file` column, and the exact masked-position count).
  */
final case class GraftSpjFile(path: String, rows: Long,
    dv: Option[(String, String, Long)]) {
  def liveRows: Long = rows - dv.map(_._3).getOrElse(0L)
}

/** One partition TUPLE's file group. `keyValues` are the decoded
  * internal-row values in spec order — [[HasPartitionKey]] is what
  * lets Spark group and align the two join sides without an exchange.
  */
final case class GraftSpjPartition(keyValues: Array[Any],
    files: Seq[GraftSpjFile]) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(keyValues)
}

/** The genuine DSv2 batch scan behind [[GraftSpj]]: partition-tuple
  * grouped input splits with exact keys, zone-map + partition file
  * pruning from the (residual-reapplied) predicate, and exact
  * metadata statistics — the same numbers the V1 scan reports.
  */
class GraftBatchScan(spark: SparkSession, root: String,
    snap: GraftTable.Snapshot, required: StructType,
    condSql: Option[String]) extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics {

  private lazy val ranges =
    condSql.map(GraftTable.rangesOf(spark, _)).getOrElse(Nil)

  lazy val files: Seq[GraftTable.AddFile] =
    if (ranges.isEmpty) snap.files
    else GraftTable.prunedFilesAll(snap, ranges)

  /** Deterministic grouping: one input partition per distinct tuple,
    * ordered by the encoded tuple.
    */
  private lazy val groups: Seq[(Seq[String], Seq[GraftTable.AddFile])] =
    files.groupBy(f => snap.spec.map(t => f.part(t.fieldName)))
      .toSeq.sortBy(_._1.mkString("\u0000"))

  private def srcType(t: Partitioning.PTransform): DataType =
    snap.schema.fields.find(_.name == t.srcCol).getOrElse(
      sys.error(s"partition source column ${t.srcCol} missing")).dataType

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftBatchScan(SPJ) $root v${snap.version} " +
      s"[files ${files.size}/${snap.files.size}; " +
      s"partitions ${groups.size}]" +
      condSql.map(s => s" prune: $s").getOrElse("")

  override def outputPartitioning(): V2Partitioning =
    new KeyGroupedPartitioning(
      snap.spec.map {
        case Partitioning.PBucket(c, n) =>
          Expressions.bucket(n, c): Expression
        case Partitioning.PDays(c) => Expressions.days(c): Expression
        case Partitioning.PHours(c) => Expressions.hours(c): Expression
        case Partitioning.PMonths(c) => Expressions.months(c): Expression
        case Partitioning.PYears(c) => Expressions.years(c): Expression
        case Partitioning.PTruncate(c, w) =>
          // width-pinned single-arg spelling: a literal transform
          // argument downgrades Spark's key-grouped scan to
          // UnknownPartitioning (see GraftTruncateWidthFunction)
          Expressions.apply(s"truncate_$w",
            Expressions.column(c)): Expression
        case t => Expressions.identity(t.srcCol): Expression
      }.toArray,
      groups.size)

  override def planInputPartitions(): Array[InputPartition] = {
    // QUALIFY the table root once, driver-side, before paths ship to
    // executors: a relative root (e.g. a cwd-relative warehouse)
    // resolves against each process's OWN working directory, so it
    // works in local[n] (executor threads share the driver's cwd) but
    // every task of a REAL executor process fails with
    // FileNotFoundException — caught by the local-cluster[2,8,4096]
    // gate (round 16). makeQualified is the same resolution Spark's
    // own FileIndex applies to V1 reads.
    val qRoot = {
      val p = new Path(root)
      p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p)
    }
    groups.map { case (tuple, fs) =>
      val key = tuple.zip(snap.spec).map { case (enc, t) =>
        GraftSpj.decodeKey(enc, t, srcType(t))
      }.toArray
      GraftSpjPartition(key,
        fs.map(f => GraftSpjFile(new Path(qRoot, f.path).toString, f.rows,
          f.dv.map(d => (new Path(qRoot, d.path).toString,
            GraftTable.fileKeyOf(f.path), d.rows)))))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // (logical field, physical parquet name) in output order
    val fields = required.fields.map { f =>
      (f, GraftTable.physicalNameOf(snap.schema, f.name))
    }.toSeq
    // The COLUMNAR path's requested schema: physical names (column
    // mapping renames change only the logical name), the TABLE
    // field's metadata carried through so Spark's own vectorized
    // reader fills EXISTS_DEFAULT for files written before an added
    // column, nullable (parquet optional). One schema serves every
    // file — absent columns become constant default/null vectors,
    // INT32/FLOAT under a widened LONG/DOUBLE logical type promote
    // inside the reader's updaters.
    val physRequired = StructType(fields.map { case (f, phys) =>
      val meta = snap.schema.fields.find(_.name == f.name)
        .map(_.metadata).getOrElse(f.metadata)
      StructField(phys, f.dataType, nullable = true, meta)
    })
    // Spark refuses mixed row/columnar input partitions within one
    // scan, so the columnar decision is per-SCAN — here just the kill
    // switch: DV-masked files stay columnar, their sorted positions
    // compact each intersecting batch inside the reader.
    val vectorized =
      spark.conf.get(GraftSpj.VectorizedKey, "true").toBoolean
    val hc = spark.sessionState.newHadoopConf()
    // what Spark's own parquet scan sets before handing conf to
    // VectorizedParquetRecordReader (ParquetInputFormat's read-support
    // class key + the requested-schema key its ReadSupport.init reads)
    hc.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    hc.set("org.apache.spark.sql.parquet.row.requested_schema",
      physRequired.json)
    // ParquetToSparkSchemaConverter/ParquetReadSupport read these with
    // conf.get(...).toBoolean — NO default — because Spark's own scan
    // always pre-sets them; mirror the session values the same way
    def mirror(k: String, d: String): Unit = hc.set(k, spark.conf.get(k, d))
    mirror("spark.sql.parquet.binaryAsString", "false")
    mirror("spark.sql.parquet.int96AsTimestamp", "true")
    mirror("spark.sql.caseSensitive", "false")
    mirror("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    mirror("spark.sql.legacy.parquet.nanosAsLong", "false")
    mirror("spark.sql.parquet.fieldId.read.enabled", "false")
    mirror("spark.sql.parquet.fieldId.read.ignoreMissing", "false")
    // EXISTS_DEFAULT fill values (ADD COLUMN … DEFAULT): the folded
    // literal, evaluated ONCE driver-side to its INTERNAL value, so a
    // file written before the column existed reads the default — the
    // same semantics the V1 path gets from Spark's parquet reader.
    // null = no default (absent column reads NULL, as before).
    val defaults: Array[Any] = required.fields.map { f =>
      snap.schema.fields.find(_.name == f.name)
        .filter(_.metadata.contains("EXISTS_DEFAULT"))
        .map { sf =>
          val sql = sf.metadata.getString("EXISTS_DEFAULT")
          val r = spark.range(1)
            .select(org.apache.spark.sql.functions.expr(sql)
              .cast(f.dataType))
            .queryExecution.executedPlan.executeCollect()(0)
          if (r.isNullAt(0)) null else r.copy().get(0, f.dataType)
        }.orNull
    }
    GraftSpjReaderFactory(fields, required.fields.map(_.dataType),
      new SerializableHadoopConf(hc),
      defaults, vectorized)
  }

  // ONE stats instance per scan (planning asks repeatedly; the column
  // fold + histogram props read must not repeat per ask)
  private lazy val v2Statistics: Statistics = new Statistics {
    // exact live rows, NO range selectivity here: unlike the V1 scan
    // (which fully handles pushed filters), every SPJ filter returns
    // as residual — the Filter node above estimates its own
    // selectivity from the reported column stats, and pricing it here
    // too would double-count
    private val rows =
      files.map(f => f.rows - f.dv.map(_.rows).getOrElse(0L)).sum
    private lazy val cols = GraftColumnStats.of(snap, files, required,
      GraftTable.histogramsOf(spark, root))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        rows * math.max(1, required.defaultSize).toLong)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = cols
  }

  override def estimateStatistics(): Statistics = v2Statistics
}

/** Executor-side reader: per file, open the footer, project the
  * requested physical columns that EXIST in that file (schema
  * evolution: absent columns are null), stream `Group`s, convert to
  * `InternalRow`. Files whose footer lacks every requested column —
  * and the `SELECT count`-shaped empty projection — emit their exact
  * LIVE metadata row count without opening data pages (physical rows
  * minus the DV's exact masked count). A DV-masked file's spans
  * load executor-side from the DV parquet (filtered to this file's
  * key) as sorted disjoint [start, end) RUNS; the row stream advances
  * a single pointer through them — O(runs) memory, O(1) per row,
  * never a join and never a per-position expansion.
  */
final case class GraftSpjReaderFactory(
    fields: Seq[(StructField, String)],
    types: Array[DataType],
    conf: SerializableHadoopConf,
    defaults: Array[Any],
    vectorized: Boolean = true) extends PartitionReaderFactory {

  /** Per-SCAN columnar decision, computed driver-side (Spark refuses
    * mixed row/columnar partitions): Spark's vectorized parquet
    * reader, see [[GraftSpjColumnarReader]]. DV-masked files stay
    * columnar — the sorted skip list compacts intersecting batches.
    */
  override def supportColumnarReads(p: InputPartition): Boolean = vectorized

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftSpjReader(fields, conf.value,
      p.asInstanceOf[GraftSpjPartition].files, defaults)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftSpjColumnarReader(types, conf.value,
      p.asInstanceOf[GraftSpjPartition].files)
}

/** Executor-side DV loader both SPJ readers share: one file's deleted
  * positions out of the DV parquet (filtered to the file's key),
  * sorted ascending — O(masked) memory, bounded by one file.
  */
private[table] object GraftSpjDv {

  /** One file's mask as SORTED, NON-OVERLAPPING half-open spans
    * `[starts(i), ends(i))`. RLE keeps a ~90%-masked billion-row file
    * (the GDPR-retraction case RLE exists for) at O(runs) reader
    * memory — expanding each span into per-position longs would cost
    * gigabytes per task exactly when the mask is widest. Both readers
    * walk the spans with a single monotone cursor (rows stream in
    * position order), so lookup stays O(1) amortized per row.
    */
  final class DvSpans(val starts: Array[Long], val ends: Array[Long]) {
    def isEmpty: Boolean = starts.length == 0
    def length: Int = starts.length
    /** masked positions inside [lo, hi), scanning from span `from`
      * (the caller's monotone cursor — spans before it end ≤ lo)
      */
    def maskedIn(from: Int, lo: Long, hi: Long): Long = {
      var j = from
      var m = 0L
      while (j < starts.length && starts(j) < hi) {
        m += math.min(ends(j), hi) - math.max(starts(j), lo)
        j += 1
      }
      m
    }
  }

  val EmptySpans = new DvSpans(Array.emptyLongArray, Array.emptyLongArray)

  /** Masked spans of ONE data file out of the DV parquet (filtered to
    * the file's key). RLE-generation parquets carry `(file, pos, run)`
    * rows; pre-RLE parquets lack `run` and contribute width-1 spans.
    * Adjacent/overlapping rows (mixed-generation DVs) merge here so
    * the readers may assume disjoint ascending spans.
    */
  def load(conf: Configuration, dvPath: String, key: String): DvSpans = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val r = ParquetReader.builder(new GroupReadSupport(),
      new Path(dvPath)).withConf(new Configuration(conf)).build()
    try {
      var g = r.read()
      val hasRun = g != null && g.getType.containsField("run")
      while (g != null) {
        if (g.getString("file", 0) == key) {
          val start = g.getLong("pos", 0)
          val run = if (hasRun) g.getLong("run", 0) else 1L
          if (run > 0) spans += ((start, start + run))
        }
        g = r.read()
      }
    } finally r.close()
    if (spans.isEmpty) return EmptySpans
    val sorted = spans.sortInPlace()(Ordering.Tuple2[Long, Long])
    val ss = scala.collection.mutable.ArrayBuilder.make[Long]
    val es = scala.collection.mutable.ArrayBuilder.make[Long]
    var (cs, ce) = sorted.head
    sorted.iterator.drop(1).foreach { case (s, e) =>
      if (s <= ce) ce = math.max(ce, e)
      else { ss += cs; es += ce; cs = s; ce = e }
    }
    ss += cs; es += ce
    new DvSpans(ss.result(), es.result())
  }
}

/** COLUMNAR executor-side reader for SPJ partitions: per file,
  * Spark's own [[VectorizedParquetRecordReader]] decodes straight
  * into [[org.apache.spark.sql.vectorized.ColumnarBatch]]es —
  * dictionary-aware, page-at-a-time, no per-row `Group`
  * materialization. The conf already carries the requested PHYSICAL
  * schema (set driver-side by [[GraftBatchScan.createReaderFactory]]),
  * so schema evolution falls out of the reader's own machinery:
  * absent columns become constant EXISTS_DEFAULT/null vectors,
  * pre-widening INT32/FLOAT files promote to LONG/DOUBLE in the
  * column updaters. The `SELECT count`-shaped EMPTY projection never
  * opens data pages — each file's exact LIVE metadata row count is
  * emitted as zero-column batches. A DV-masked file's sorted spans
  * merge as BATCH COMPACTION: a batch intersecting no
  * masked span passes through untouched (the common case — DV
  * debt is bounded by `maintain`); an intersecting batch copies its
  * surviving rows per COLUMN into fresh on-heap vectors (tight typed
  * loops, never a per-row materialization); a fully-masked batch is
  * skipped. Rebase modes are CORRECTED/UTC: every graft table file is
  * written by this engine's own Spark 4 writer.
  */
final class GraftSpjColumnarReader(types: Array[DataType],
    conf: Configuration, files: Seq[GraftSpjFile])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val BatchRows = 4096
  private val fileIter = files.iterator
  private var vec: VectorizedParquetRecordReader = _
  private var current: ColumnarBatch = _
  /** countdown of metadata-only rows for the empty projection */
  private var emptyRows = 0L
  /** sorted disjoint masked spans of the OPEN file; empty when no DV */
  private var dvSpans: GraftSpjDv.DvSpans = GraftSpjDv.EmptySpans
  private var dvIdx = 0
  /** file position of the NEXT row the vectorized reader returns */
  private var rowPos = 0L
  private lazy val emptyBatch =
    new ColumnarBatch(Array.empty[ColumnVector])
  /** Reusable compaction target — allocated on the FIRST DV-masked
    * batch, then reset per batch. Heavily-masked files (pre-maintain
    * DV debt) compact most batches; a fresh vector set per batch is
    * allocation churn on the hot decode path. Safe to reuse: the
    * columnar scan contract already allows a reader to recycle its
    * batch between next() calls (the vectorized parquet reader does).
    */
  private var compactVecs: Array[OnHeapColumnVector] = _
  private var compactBatch: ColumnarBatch = _

  private def closeVec(): Unit =
    if (vec != null) { vec.close(); vec = null }

  private def openNext(): Boolean = {
    closeVec()
    if (!fileIter.hasNext) return false
    val f = fileIter.next()
    if (types.length == 0) { emptyRows = f.liveRows; return true }
    dvSpans = f.dv match {
      case Some((dvPath, key, _)) => GraftSpjDv.load(conf, dvPath, key)
      case None => GraftSpjDv.EmptySpans
    }
    dvIdx = 0
    rowPos = 0L
    val p = new Path(f.path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    // the OLD-API split class: Spark's reader base casts to
    // mapred.FileSplit (which subclasses the mapreduce one)
    val split = new org.apache.hadoop.mapred.FileSplit(
      p, 0, len, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      new Configuration(conf), new org.apache.hadoop.mapreduce.TaskAttemptID())
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, BatchRows)
    try {
      r.initialize(split, ctx)
      r.initBatch(new StructType(), InternalRow.empty)
      r.enableReturningBatches()
    } catch { case e: Throwable => r.close(); throw e }
    vec = r
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (emptyRows > 0) {
        val n = math.min(BatchRows.toLong, emptyRows).toInt
        emptyRows -= n
        emptyBatch.setNumRows(n)
        current = emptyBatch
        return true
      }
      if (vec != null) {
        if (vec.nextBatch()) {
          val b = vec.resultBatch()
          val n = b.numRows()
          val start = rowPos
          rowPos += n
          if (dvSpans.isEmpty) { current = b; return true }
          // advance the cursor past spans ending before this batch;
          // a span straddling the boundary stays current
          while (dvIdx < dvSpans.length && dvSpans.ends(dvIdx) <= start)
            dvIdx += 1
          val masked = dvSpans.maskedIn(dvIdx, start, rowPos)
          if (masked == 0L) { current = b; return true }
          if (masked < n) {
            current = compact(b, start, dvIdx, masked.toInt)
            return true
          }
          // every row of this batch is masked: read the next one
        } else closeVec()
      }
      if (vec == null && emptyRows == 0 && !openNext()) return false
    }
    false // unreachable
  }

  /** Copy the batch's surviving rows (those outside every masked span
    * from `spanFrom` on) into reusable on-heap vectors, column by
    * column in tight typed loops. `nMasked` is the batch's exact
    * masked count, pre-computed from the spans.
    */
  private def compact(b: ColumnarBatch, start: Long,
      spanFrom: Int, nMasked: Int): ColumnarBatch = {
    val n = b.numRows()
    val live = n - nMasked
    val keep = new Array[Int](live)
    var k = 0
    var m = spanFrom
    var i = 0
    while (i < n) {
      val p = start + i
      while (m < dvSpans.length && dvSpans.ends(m) <= p) m += 1
      if (!(m < dvSpans.length && dvSpans.starts(m) <= p)) {
        keep(k) = i; k += 1
      }
      i += 1
    }
    if (compactVecs == null) {
      compactVecs = types.map(t => new OnHeapColumnVector(BatchRows, t))
      compactBatch = new ColumnarBatch(
        compactVecs.asInstanceOf[Array[ColumnVector]])
    }
    var c = 0
    while (c < types.length) {
      compactVecs(c).reset()
      copyColumn(b.column(c), compactVecs(c), keep, types(c))
      c += 1
    }
    compactBatch.setNumRows(live)
    compactBatch
  }

  private def copyColumn(src: ColumnVector, dst: OnHeapColumnVector,
      keep: Array[Int], dt: DataType): Unit = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k) else dst.putLong(k, src.getLong(i))
        k += 1
      }
    case IntegerType | DateType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k) else dst.putInt(k, src.getInt(i))
        k += 1
      }
    case DoubleType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k)
        else dst.putDouble(k, src.getDouble(i))
        k += 1
      }
    case FloatType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k)
        else dst.putFloat(k, src.getFloat(i))
        k += 1
      }
    case ShortType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k)
        else dst.putShort(k, src.getShort(i))
        k += 1
      }
    case ByteType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k) else dst.putByte(k, src.getByte(i))
        k += 1
      }
    case BooleanType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k)
        else dst.putBoolean(k, src.getBoolean(i))
        k += 1
      }
    case StringType =>
      var k = 0
      while (k < keep.length) {
        val i = keep(k)
        if (src.isNullAt(i)) dst.putNull(k)
        else {
          val bytes = src.getUTF8String(i).getBytes
          dst.putByteArray(k, bytes, 0, bytes.length)
        }
        k += 1
      }
    case other => sys.error(s"unsupported columnar SPJ compaction type $other")
  }

  override def get(): ColumnarBatch = current

  override def close(): Unit = {
    closeVec()
    if (compactVecs != null) {
      compactVecs.foreach(_.close())
      compactVecs = null
      compactBatch = null
    }
  }
}

final class GraftSpjReader(fields: Seq[(StructField, String)],
    conf: Configuration, files: Seq[GraftSpjFile],
    defaults: Array[Any]) extends PartitionReader[InternalRow] {

  private val fileIter = files.iterator
  private var reader: ParquetReader[Group] = _
  /** requested-schema index per output field; -1 = absent → null */
  private var fieldIdx: Array[Int] = _
  private var fieldType: Array[Type] = _
  private var current: InternalRow = _
  /** countdown of metadata-only rows for footer-skipped files */
  private var emptyRows = 0L
  /** sorted disjoint masked spans of the OPEN file; empty when no DV */
  private var dvSpans: GraftSpjDv.DvSpans = GraftSpjDv.EmptySpans
  private var dvIdx = 0
  private var rowPos = -1L

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!fileIter.hasNext) return false
    val f = fileIter.next()
    val p = new Path(f.path)
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    val fileSchema: MessageType =
      try footer.getFooter.getFileMetaData.getSchema finally footer.close()
    val present = fields.map { case (_, phys) =>
      if (fileSchema.containsField(phys)) phys else null
    }
    val wanted = present.filter(_ != null).distinct
    if (wanted.isEmpty) { emptyRows = f.liveRows; return true }
    dvSpans = f.dv match {
      case Some((dvPath, key, _)) => GraftSpjDv.load(conf, dvPath, key)
      case None => GraftSpjDv.EmptySpans
    }
    dvIdx = 0
    rowPos = -1L
    val requested = new MessageType(fileSchema.getName,
      wanted.map(n =>
        fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    fieldIdx = present.map(n =>
      if (n == null) -1 else requested.getFieldIndex(n)).toArray
    fieldType = present.map(n =>
      if (n == null) null
      else requested.getType(requested.getFieldIndex(n))).toArray
    val c = new Configuration(conf)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
    reader = ParquetReader.builder(new GroupReadSupport(), p).withConf(c).build()
    true
  }

  /** Is the just-read row (at `rowPos`) masked by the open file's DV? */
  private def masked(): Boolean = {
    while (dvIdx < dvSpans.length && dvSpans.ends(dvIdx) <= rowPos) dvIdx += 1
    dvIdx < dvSpans.length && dvSpans.starts(dvIdx) <= rowPos
  }

  override def next(): Boolean = {
    while (true) {
      if (emptyRows > 0) {
        emptyRows -= 1
        // a footer-skipped file still owes each ABSENT column its
        // EXISTS_DEFAULT (null when none is declared)
        current = new GenericInternalRow(defaults.clone())
        return true
      }
      if (reader != null) {
        val g = reader.read()
        if (g != null) {
          rowPos += 1
          if (!masked()) { current = convert(g); return true }
          // masked row: fall through and read the next one
        } else {
          reader.close(); reader = null
        }
      }
      if (reader == null && !openNext()) return false
    }
    false // unreachable
  }

  override def get(): InternalRow = current

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }

  private def convert(g: Group): InternalRow = {
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val idx = fieldIdx(i)
      out(i) =
        // ABSENT column → its EXISTS_DEFAULT (null when undeclared);
        // a PRESENT column's stored NULL stays NULL — the same
        // absent-vs-stored distinction Spark's own reader draws
        if (idx < 0) defaults(i)
        else if (g.getFieldRepetitionCount(idx) == 0) null
        else value(g, idx, fields(i)._1.dataType, fieldType(i))
      i += 1
    }
    new GenericInternalRow(out)
  }

  /** Parquet primitive → Spark internal value for the LOGICAL type.
    * Timestamps cover the three parquet spellings Spark writes
    * (INT64 MICROS / INT64 MILLIS / legacy INT96).
    */
  private def value(g: Group, idx: Int, dt: DataType, pt: Type): Any =
    dt match {
      // int-class reads check the PHYSICAL width: files written before
      // a widenColumn still hold INT32 under a LONG logical type
      case LongType =>
        if (pt.asPrimitiveType().getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32)
          g.getInteger(idx, 0).toLong
        else g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case ShortType => g.getInteger(idx, 0).toShort
      case ByteType => g.getInteger(idx, 0).toByte
      case DoubleType =>
        if (pt.asPrimitiveType().getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT)
          g.getFloat(idx, 0).toDouble
        else g.getDouble(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case DateType => g.getInteger(idx, 0)
      case TimestampType | TimestampNTZType =>
        pt.asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96 =>
            val b = g.getInt96(idx, 0).getBytes // 8B nanos LE + 4B julian LE
            val buf = java.nio.ByteBuffer.wrap(b)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanos = buf.getLong
            val julian = buf.getInt
            (julian - 2440588L) * 86400000000L + nanos / 1000L
          case _ =>
            val v = g.getLong(idx, 0)
            pt.getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
                v * 1000L
              case _ => v // MICROS
            }
        }
      case other => sys.error(s"unsupported SPJ read type $other")
    }
}
