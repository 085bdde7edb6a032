package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

private[sources] class GenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = GenSource.schema
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]

  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }

  /** Consume id-bound predicates exactly; everything else is residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("id", v) => num(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, n + 1); true }
      case GreaterThan("id", v) => num(v).exists { n => lo = math.max(lo, n + 1); true }
      case GreaterThanOrEqual("id", v) => num(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("id", v) => num(v).exists { n => hi = math.min(hi, n); true }
      case LessThanOrEqual("id", v) => num(v).exists { n => hi = math.min(hi, n + 1); true }
      case _ => false
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GenScan(rows, parts, lo, hi, required, pushed.map(_.toString))
}

private[sources] class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType, pushedDesc: Array[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen rows=$rows bounds=[$lo,$hi) " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

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
    new GenReaderFactory(required.fieldNames)
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
