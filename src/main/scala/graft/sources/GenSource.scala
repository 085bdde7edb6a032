package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation,
  CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownLimit, SupportsPushDownRequiredColumns,
  SupportsPushDownTopN}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector (`format("graftgen")`): a
  * deterministic synthetic device-readings table generated on the
  * executors — the "infinite test fixture" a 100 TB engine needs,
  * since it can stand in for a table of ANY size with zero storage,
  * and every cell is a pure function of the row id (so a SQL oracle
  * can regenerate it independently — the judged query's premise).
  *
  * Implements the three scan optimizations that matter:
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): only
  *     requested fields are materialized per row;
  *   - **filter pushdown** (`SupportsPushDownFilters`): range/equality
  *     predicates on `id` are consumed EXACTLY (the reader generates
  *     only ids inside the bounds — nothing to re-filter), everything
  *     else is returned as residual for Spark to evaluate;
  *   - **partition pruning**: input partitions whose id range falls
  *     outside the pushed bounds are never planned (observable as a
  *     reduced scan-partition count).
  *
  * Rows: `id`, `ts_us` (µs timeline), `device` (50-way key),
  * `reading` (Knuth-hash integer) — see the formulas in [[GenSource]].
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val p = properties.asScala
    new GenTable(p.getOrElse("rows", "1000").toLong,
      p.getOrElse("partitions", "8").toInt)
  }
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("device", StringType, nullable = false),
    StructField("reading", LongType, nullable = false)))

  // every column is a pure integer function of id — the oracle
  // regenerates these in SQL, so keep the formulas trivial and exact
  def tsOf(id: Long): Long = 1700000000000000L + id * 1000000L
  def deviceOf(id: Long): String = "d" + (id % 50)
  def readingOf(id: Long): Long = (id * 2654435761L) % 10000L
}

private[sources] class GenTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts,
      Option(options.get("batchRows")).map(_.toLong).getOrElse(100L))
}

private[sources] class GenScanBuilder(rows: Long, parts: Int,
    batchRows: Long = 100L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownAggregates {

  private var required: StructType = GenSource.schema
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var aggs: Option[Array[String]] = None

  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }

  // saturating successor: a bound at Long.MaxValue must not wrap to
  // MinValue and silently empty a tautological filter
  private def succ(n: Long): Long =
    if (n == Long.MaxValue) Long.MaxValue else n + 1

  /** Consume id-bound predicates exactly; everything else is residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("id", v) => num(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, succ(n)); true }
      case GreaterThan("id", v) => num(v).exists { n => lo = math.max(lo, succ(n)); true }
      case GreaterThanOrEqual("id", v) => num(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("id", v) => num(v).exists { n => hi = math.min(hi, n); true }
      case LessThanOrEqual("id", v) => num(v).exists { n => hi = math.min(hi, succ(n)); true }
      case _ => false
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private var topNPartial = false

  /** LIMIT consumed COMPLETELY: LIMIT n without a sort accepts ANY n
    * rows, and the first `n` ids of the bounded range are exactly n
    * rows — bounds shrink, Spark drops its own Limit node.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT n: the generator keeps exactly the
    * right candidate SET (low end of the range for ascending, high end
    * for descending) but always emits ascending — so this is reported
    * PARTIAL and Spark's TopN re-sorts the ≤n surviving rows (O(n),
    * not O(rows)). The scan itself still shrinks to n ids.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    orders match {
      case Array(o) => o.expression() match {
        case f: NamedReference if f.fieldNames().sameElements(Array("id")) =>
          // same saturating discipline as pushLimit: a filter-saturated
          // bound must not wrap the addition/subtraction
          if (o.direction() == SortDirection.ASCENDING)
            hi = math.min(hi,
              if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
          else
            lo = math.max(lo,
              if (hi < Long.MinValue + limit) Long.MinValue else hi - limit)
          topNPartial = true
          true
        case _ => false
      }
      case _ => false
    }

  // complete for plain LIMIT (order-free), partial for TopN (see above)
  override def isPartiallyPushed(): Boolean = topNPartial

  /** Global (no GROUP BY) COUNT(*)/MIN(id)/MAX(id) are CLOSED FORM on
    * an id-range generator: each partition answers from its bounds
    * without producing a single row — a count over a trillion-row
    * synthetic table costs O(partitions). Partial pushdown: Spark
    * still merges the per-partition rows.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case f: NamedReference => f.fieldNames().sameElements(Array("id"))
        case _ => false
      }
    if (aggregation.groupByExpressions().nonEmpty) return false
    // empty surviving range: zero partitions would be planned, Spark's
    // final Sum over the partial counts would yield NULL instead of
    // COUNT(*)=0 - fall back to (trivially empty) row generation
    if (hi <= lo) return false
    val kinds = aggregation.aggregateExpressions().map {
      case _: CountStar => "count"
      case m: Min if isId(m.column()) => "min_id"
      case m: Max if isId(m.column()) => "max_id"
      case _ => return false
    }
    aggs = Some(kinds)
    true
  }

  override def build(): Scan =
    new GenScan(rows, parts, lo, hi, required, pushed.map(_.toString), aggs,
      batchRows)
}

private[sources] class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType, pushedDesc: Array[String],
    aggs: Option[Array[String]], batchRows: Long = 100L)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** Streaming read: the same bounded id range drained `batchRows` ids
    * per trigger — a deterministic, FINITE rate source (offsets are
    * plain positions in [lo, hi), checkpoint-restorable from their
    * JSON). Pushed id-filters and column pruning apply to the stream
    * exactly as to the batch scan.
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GenMicroBatchStream(lo, hi, required.fieldNames, batchRows)

  /** EXACT post-pushdown statistics (the generator knows its
    * cardinality): row count = surviving id range, bytes ≈ 8 per LONG
    * + 4 per short string, per MATERIALIZED (pruned) column. Feeding
    * the planner exact numbers is what lets a small generated dim
    * auto-broadcast without a hint — spec-asserted.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val n = math.max(0L, hi - lo)
      private val rowBytes = math.max(8L, readSchema().fields.map(f =>
        if (f.dataType == LongType) 8L else 4L).sum)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * rowBytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
      // the generator's id column is analytically exact: unique over
      // the surviving range — CBO join/filter estimation pays nothing
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        if (n > 0 && aggs.isEmpty &&
            readSchema().fieldNames.contains("id")) {
          m.put(org.apache.spark.sql.connector.expressions.Expressions
            .column("id"),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(n)
              override def min(): java.util.Optional[Object] =
                java.util.Optional.of(java.lang.Long.valueOf(lo))
              override def max(): java.util.Optional[Object] =
                java.util.Optional.of(java.lang.Long.valueOf(hi - 1))
              override def nullCount(): java.util.OptionalLong =
                java.util.OptionalLong.of(0L)
            })
        }
        m
      }
    }

  override def readSchema(): StructType = aggs match {
    // positional contract: one LongType field per pushed agg func
    case Some(ks) => StructType(ks.zipWithIndex.map { case (k, i) =>
      StructField(s"${k}_$i", LongType, nullable = false) })
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen rows=$rows bounds=[$lo,$hi) " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}], " +
      aggs.map(ks => s"PushedAggregates: [${ks.mkString(", ")}], ").getOrElse("") +
      s"ReadSchema: ${readSchema().catalogString}"

  /** Even id-range splits of [0, rows), intersected with the pushed
    * bounds — fully-excluded partitions are never planned.
    */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until parts).iterator.map { i =>
      val start = rows * i / parts
      val end = rows * (i + 1) / parts
      GenInputPartition(math.max(start, lo), math.min(end, hi))
    }.filter(p => p.start < p.end).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    aggs match {
      case Some(ks) => new GenAggReaderFactory(ks)
      case None => new GenReaderFactory(required.fieldNames)
    }
}

private[sources] case class GenOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private[sources] class GenMicroBatchStream(lo: Long, hi: Long,
    fields: Array[String], batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  // available watermark advances one batch per trigger until the range
  // is drained; restart recovers from the committed offset's json
  private var available = lo

  override def initialOffset():
      org.apache.spark.sql.connector.read.streaming.Offset = GenOffset(lo)
  override def latestOffset():
      org.apache.spark.sql.connector.read.streaming.Offset = {
    available = math.min(hi, available + batchRows)
    GenOffset(available)
  }

  // ---- admission control: the engine proposes a rate (ReadLimit),
  // the source enforces it against what exists. Trigger.AvailableNow
  // snapshots "everything so far" via prepareForTriggerAvailableNow —
  // for a bounded generator `hi` IS that static snapshot, so the
  // prepare is a no-op and the drain still proceeds in rate-limited
  // batches until the offset stops advancing (then self-terminates).
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    val s = start.asInstanceOf[GenOffset].pos
    import org.apache.spark.sql.connector.read.streaming.ReadMaxRows
    val step = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => batchRows
    }
    available = math.min(hi, s + step)
    GenOffset(available)
  }
  override def reportLatestOffset():
      org.apache.spark.sql.connector.read.streaming.Offset = GenOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String):
      org.apache.spark.sql.connector.read.streaming.Offset =
    GenOffset(json.toLong)
  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].pos
    val e = end.asInstanceOf[GenOffset].pos
    if (s >= e) Array.empty
    else Array(GenInputPartition(s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(fields)
  override def commit(
      end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Closed-form per-partition aggregate answers: one row per partition,
  * zero rows generated.
  */
private[sources] class GenAggReaderFactory(kinds: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val vals: Array[Any] = kinds.map {
          case "count" => java.lang.Long.valueOf(p.end - p.start)
          case "min_id" => java.lang.Long.valueOf(p.start)
          case "max_id" => java.lang.Long.valueOf(p.end - 1)
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] case class GenInputPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class GenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenInputPartition]
    new GenPartitionReader(p.start, p.end, fields)
  }
}

private[sources] class GenPartitionReader(start: Long, end: Long,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private var cur = start - 1
  override def next(): Boolean = { cur += 1; cur < end }
  override def get(): InternalRow = {
    // materialize ONLY the pruned schema's fields
    val vals = fields.map {
      case "id" => java.lang.Long.valueOf(cur)
      case "ts_us" => java.lang.Long.valueOf(GenSource.tsOf(cur))
      case "device" => UTF8String.fromString(GenSource.deviceOf(cur))
      case "reading" => java.lang.Long.valueOf(GenSource.readingOf(cur))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
  override def close(): Unit = ()
}
