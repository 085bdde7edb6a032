package graft.table

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.graftshim.GraftStreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Structured-Streaming source over a [[GraftTable]] — the table format
  * as a stream, so a downstream query can
  * `spark.readStream.format("grafttable").option("path", root).load()`
  * and incrementally consume appends with exactly-once semantics.
  *
  * Same architecture as the published Delta Lake streaming source
  * (Armbrust et al., VLDB 2020 §4.3, and `DeltaSource` in the
  * delta-io/delta repo): a V1 `Source` whose OFFSETS ARE LOG VERSIONS.
  * `getOffset` reports the table's tip version; `getBatch(a, b)` reads
  * the files appended by versions in `(a, b]` — a deterministic
  * function of the immutable log, which is what makes the engine's
  * offset-checkpointed replay exactly-once: a re-delivered range
  * produces byte-identical rows. No per-source state exists outside
  * the engine's own checkpoint.
  *
  * Non-append commits (delete / overwrite / merge / restore) fail the
  * batch with [[GraftTable.appendsBetween]]'s contract error and stop
  * the stream — removals break the "appends compose" premise and the
  * consumer must re-sync from a full read, the same rule the Delta
  * source enforces (its `ignoreDeletes`-off default).
  *
  * Scale posture: a micro-batch plans ONLY the files its version range
  * added — O(commit), never O(table) — and the read is a plain parquet
  * scan, so column pruning and predicate pushdown on the streaming
  * query reach the files exactly as in batch.
  *
  * Options: `path` (table root, required); `startingVersion` — first
  * batch covers appends strictly AFTER this version (default −1 =
  * from the table's beginning).
  */
class GraftTableSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "grafttable"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "grafttable source requires option 'path' (the table root)"))

  // ---------- batch TableProvider: spark.read.format("grafttable") ----------

  /** Resolve the optional time-travel options to a pinned log version:
    * `versionAsOf` (a log version) or `timestampAsOf` (ms epoch or
    * `yyyy-MM-dd HH:mm:ss[.S]` UTC — resolved through the commit
    * wall-clocks exactly like the catalog's `FOR TIMESTAMP AS OF`).
    */
  private def asOfOf(spark: SparkSession, root: String,
      opts: Map[String, String]): Option[Long] = {
    require(!(opts.contains("versionAsOf") && opts.contains("timestampAsOf")),
      "grafttable: versionAsOf and timestampAsOf are mutually exclusive")
    opts.get("versionAsOf").map(_.toLong).orElse(
      opts.get("timestampAsOf").map { t =>
        // parse through an explicit UTC offset — Timestamp.valueOf
        // would resolve in the JVM default zone, silently pinning a
        // different instant than the catalog's FOR TIMESTAMP AS OF
        // route whenever JVM TZ ≠ session TZ
        val ms = t.toLongOption.getOrElse(
          java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
        GraftTable.versionAt(spark, root, ms)
      })
  }

  private def lower(options: java.util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    // CaseInsensitiveStringMap lower-cases keys; normalize our names
    options.asScala.toMap.map { case (k, v) =>
      (k.toLowerCase(java.util.Locale.ROOT) match {
        case "versionasof" => "versionAsOf"
        case "timestampasof" => "timestampAsOf"
        case "readchangefeed" => "readChangeFeed"
        case "startingversion" => "startingVersion"
        case "endingversion" => "endingVersion"
        case other => other
      }) -> v
    }
  }

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val opts = lower(options)
    val spark = SparkSession.active
    val root = rootOf(opts)
    if (cdf(opts)) {
      require(!opts.contains("versionAsOf") && !opts.contains("timestampAsOf"),
        "grafttable: readChangeFeed cannot combine with time travel — " +
          "bound the feed with startingVersion/endingVersion instead")
      GraftTableSource.cdcSchema(GraftCatalog.stripPhys(
        GraftTable.snapshot(spark, root).schema))
    } else
      GraftCatalog.stripPhys(
        GraftTable.snapshot(spark, root, asOfOf(spark, root, opts)).schema)
  }

  /** Path-based batch READ of the table — the same [[GraftV2Table]]
    * the catalog serves, minus a catalog registration:
    * `spark.read.format("grafttable").option("path", root)
    * [.option("versionAsOf", v)].load()`. Without a catalog there is
    * no FunctionCatalog, so bucket-transform SPJ stays with the
    * catalog route; everything else (pushdown pruning, metadata stats,
    * identity SPJ, V1 bridge) is identical. Batch WRITES go through
    * the catalog (`INSERT INTO` / `writeTo`) or the [[GraftTable]]
    * API — `DataFrameWriter.save` would need `SupportsCatalogOptions`
    * and a derived identifier, a second spelling of the catalog route.
    */
  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val opts = lower(properties)
    val spark = SparkSession.active
    val root = rootOf(opts)
    if (cdf(opts)) {
      // batch change-feed read (the Delta batch-CDF spelling):
      // startingVersion INCLUSIVE (default 0 = the table's whole
      // history), endingVersion INCLUSIVE (default = the tip AT PLAN
      // TIME, pinned here so a concurrent commit can't shift the
      // result between analysis and execution)
      // NOTE the deliberate divergence from the STREAMING source: a
      // batch CDF startingVersion is INCLUSIVE ("give me the feed
      // from v on"), while the streaming option is EXCLUSIVE
      // ("resume strictly after v" — the checkpoint-offset shape).
      // Validated here so a reversed range surfaces as a CDF error,
      // not changes()'s confusing off-by-one "fromVersion N-1".
      val tip = GraftTable.snapshot(spark, root).version
      val from = opts.get("startingVersion").map(_.toLong).getOrElse(0L)
      val to = opts.get("endingVersion").map(_.toLong).getOrElse(tip)
      require(from <= to,
        s"readChangeFeed: startingVersion $from > endingVersion $to " +
          "(both bounds are INCLUSIVE for batch change-feed reads; " +
          "the streaming source's startingVersion is exclusive)")
      new GraftChangesTable(root, from, to)
    } else
      new GraftV2Table(root,
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("grafttable"), new org.apache.hadoop.fs.Path(root).getName),
        asOfOf(spark, root, opts))
  }

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base =
      GraftTable.snapshot(sqlContext.sparkSession, rootOf(parameters)).schema
    (shortName(),
      if (cdf(parameters)) GraftTableSource.cdcSchema(base) else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toInt)
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    require(maxFiles.forall(_ > 0) && maxBytes.forall(_ > 0),
      "grafttable: maxFilesPerTrigger/maxBytesPerTrigger must be positive")
    new GraftTableSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(-1L),
      readChangeFeed = cdf(parameters),
      maxFilesPerTrigger = maxFiles, maxBytesPerTrigger = maxBytes)
  }

  /** `writeStream.format("grafttable")` — exactly-once appends into the
    * table via the txn ledger: the sink tags every commit with
    * `(appId, batchId)` and [[GraftTable.append]] no-ops a replayed
    * batch, so the engine's at-least-once re-delivery upgrades to
    * exactly-once table contents. `appId` defaults to the query's
    * checkpoint location (stable across restarts of the same query —
    * the identity that MUST pin the ledger); override with option
    * `txnAppId` when several queries share a checkpoint dir layout.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"grafttable sink supports Append output mode only, got $outputMode")
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "grafttable sink needs a checkpointLocation (or explicit " +
          "txnAppId) to key its exactly-once ledger"))
    new GraftTableSink(rootOf(parameters), appId)
  }
}

class GraftTableSink(root: String, appId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    GraftTable.append(data.sparkSession, root,
      GraftStreamingShim.batchFrame(data), txn = Some((appId, batchId)))
  override def toString: String = s"GraftTableSink[$root]"
}

/** A committed table version as a stream offset. */
case class TableVersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

object GraftTableSource {
  /** The change-feed schema: data columns + the CDC pair columns. */
  def cdcSchema(base: StructType): StructType = base
    .add("_change_type", org.apache.spark.sql.types.StringType)
    .add("_commit_version", org.apache.spark.sql.types.LongType)
}

/** BATCH change-feed read — the Delta batch-CDF spelling:
  * `spark.read.format("grafttable").option("path", root)
  * .option("readChangeFeed", "true")[.option("startingVersion", a)]
  * [.option("endingVersion", b)].load()` serves
  * [[GraftTable.changes]] over the INCLUSIVE version range `[a, b]`
  * as a distributed scan (never a driver materialization — the feed
  * of a 100 TB table's history is itself table-scale). Column pruning
  * reaches the underlying parquet reads through the V1 bridge's
  * projection, and the per-commit cost contract is `changes`'s own:
  * O(files the commits touched), with layout-only commits
  * contributing nothing.
  */
class GraftChangesTable(root: String, fromInclusive: Long, to: Long)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns, V1Scan}

  private def spark = SparkSession.active

  override def name(): String = s"grafttable_changes($root)"

  override lazy val schema: StructType =
    GraftTableSource.cdcSchema(GraftCatalog.stripPhys(
      GraftTable.snapshot(spark, root).schema))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def description(): String =
          s"GraftChangesScan $root versions [$fromInclusive, $to] " +
            s"[${required.fieldNames.mkString(", ")}]"
        override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan](
            context: SQLContext): T = {
          val relation = new org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = required
            override def needConversion: Boolean = false
            override def buildScan()
                : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
              // changes() takes an EXCLUSIVE lower bound
              val feed = GraftTable.changes(context.sparkSession, root,
                fromInclusive - 1, to)
              val projected =
                if (required.isEmpty) feed.select()
                else feed.select(required.fieldNames.toSeq.map(
                  org.apache.spark.sql.functions.col): _*)
              projected.queryExecution.toRdd
                .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
            }
            override def toString: String =
              s"GraftTableChanges($root) [$fromInclusive, $to]"
          }
          relation.asInstanceOf[T]
        }
      }
    }
}

/** `readChangeFeed = true` streams [[GraftTable.changes]] per commit
  * instead of appended rows (the Delta CDF streaming analogue): every
  * commit KIND is consumable — CoW deletes, DV deletes, merges — as
  * insert/delete row pairs, which is what lets a downstream
  * incremental materialization follow a MUTABLE table where the plain
  * appends source must stop. Still O(files touched per commit), still
  * deterministic per version range (immutable files + self-contained
  * entry metadata), so replay stays exactly-once.
  */
class GraftTableSource(spark: SparkSession, root: String,
    startingVersion: Long, readChangeFeed: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles}

  // Trigger.AvailableNow contract (the same shape DeltaSource
  // implements): pin the tip ONCE up front, drain every commit up to
  // it, then stop — new commits landing mid-drain wait for the next
  // run, and a previously-uncommitted batch replays first instead of
  // being silently skipped by the single-batch fallback.
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(GraftTable.snapshot(spark, root).version)

  /** Delta-parity bounded micro-batches: `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` surface as the engine's ReadLimit, and
    * [[latestOffset]] admits log versions until the NEXT one would
    * exceed a cap — always at least one (the progress guarantee: a
    * single oversized commit still drains, exactly as Delta admits
    * its first file past the byte cap). Offsets stay log versions, so
    * exactly-once replay is untouched — admission only decides how
    * far each batch's version range extends.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Nil => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val tip = GraftTable.snapshot(spark, root).version
    val capped = availableNowCap.fold(tip)(math.min(tip, _))
    val from = Option(start).map(versionOf).getOrElse(startingVersion)
    if (capped < 0 || capped <= from) null
    else TableVersionOffset(admitUpTo(from, capped, limit))
  }

  /** Greatest version in `(from, tip]` whose cumulative admitted
    * files/bytes respect `limit`; the first pending version is always
    * admitted.
    */
  private def admitUpTo(from: Long, tip: Long, limit: ReadLimit): Long = {
    def boundsOf(l: ReadLimit): (Option[Int], Option[Long]) = l match {
      case f: ReadMaxFiles => (Some(f.maxFiles), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes))
      case c: CompositeReadLimit =>
        c.getReadLimits.map(boundsOf).foldLeft(
          (Option.empty[Int], Option.empty[Long])) { case ((f0, b0), (f, b)) =>
          (f.orElse(f0), b.orElse(b0))
        }
      case _: ReadAllAvailable => (None, None)
      case _ => (None, None) // rows/min-rows: no file-based meaning here
    }
    val (maxF, maxB) = boundsOf(limit)
    if (maxF.isEmpty && maxB.isEmpty) return tip
    // the stats iterator is LAZY — stop consuming at the cap, so a
    // capped drain of a deep backlog reads O(admitted) entries per
    // trigger, never the whole pending window
    val stats = GraftTable.versionAddStats(spark, root, from, tip,
      needBytes = maxB.isDefined)
    var admitted = from
    var files = 0L
    var bytes = 0L
    var continue = true
    while (continue && stats.hasNext) {
      val (v, nf, nb) = stats.next()
      files += nf
      bytes += nb
      if (admitted == from ||
          (maxF.forall(files <= _) && maxB.forall(bytes <= _)))
        admitted = v
      else continue = false
    }
    admitted
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  // Pinned at source creation: appends may widen the schema mid-stream,
  // but a streaming query's schema is fixed at analysis — new columns
  // appear on restart, as with the file and Delta sources.
  private val tableSchema: StructType = GraftTable.snapshot(spark, root).schema
  override val schema: StructType =
    if (readChangeFeed) GraftTableSource.cdcSchema(tableSchema)
    else tableSchema

  /** Widened to the V2 offset type so [[latestOffset]] (V2 surface)
    * and [[getBatch]] (V1 surface, a subtype) share one decoder.
    */
  private def versionOf(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case TableVersionOffset(v) => v
      case other => other.json.trim.toLong // SerializedOffset from checkpoint
    }

  override def getOffset: Option[Offset] = {
    val tip = GraftTable.snapshot(spark, root).version
    if (tip < 0 || tip <= startingVersion) None
    else Some(TableVersionOffset(tip))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val batch =
      if (readChangeFeed)
        GraftTable.changes(spark, root, from, versionOf(end))
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toSeq: _*)
      else
        GraftTable.appendsBetween(spark, root, from, versionOf(end),
          tableSchema)
    // MicroBatchExecution requires isStreaming = true on a V1 batch —
    // re-tag the parquet-scan plan through the one sanctioned door.
    GraftStreamingShim.streamingFrame(spark,
      batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTableSource[$root, startingVersion=$startingVersion]"
}
