package graft.sources

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE side of the V2 connector surface (`format("graftsink")`):
  * a metrics-reporting blackhole sink with the full two-phase commit
  * protocol — per-task `DataWriter`s accumulate (rows, bytes,
  * order-independent checksum), `commit()` ships a
  * `WriterCommitMessage` per task, and the driver-side `BatchWrite
  * .commit` folds them into [[SinkSource.results]] under the job's
  * `tag` option. Zero storage, exact accounting: the sink for
  * measuring end-to-end pipeline throughput (scan → transform →
  * shuffle → write) without disk noise, and the degenerate case of any
  * real commit-protocol sink (swap the accumulator for a file/table
  * writer and the protocol is unchanged).
  *
  * The checksum folds each row's first LONG column through XOR of a
  * Knuth-style hash — commutative+associative, so ANY partitioning or
  * task order yields the same value; a lost or duplicated row changes
  * it. Rows without a leading LONG column still count rows/bytes.
  */
class SinkSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftsink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SinkTable(schema, properties.asScala.getOrElse("tag", "default"))
}

object SinkSource {
  /** LATEST committed result per tag: (rows, bytes, checksum). Only
    * ever written from the driver-side commit. Two concurrent jobs
    * sharing a tag overwrite each other HERE — use a unique tag per
    * concurrent writer, or read [[commits]], where every commit lands
    * under its own epoch and nothing is ever overwritten.
    */
  val results: TrieMap[String, (Long, Long, Long)] = TrieMap.empty

  /** Append-only commit log: (tag, epoch) → (rows, bytes, checksum);
    * epochs are process-wide monotonic, so per-tag order is recoverable
    * and concurrent same-tag jobs can't clobber each other's metrics.
    */
  val commits: TrieMap[(String, Long), (Long, Long, Long)] = TrieMap.empty
  private val epoch = new java.util.concurrent.atomic.AtomicLong(0L)

  private[sources] def record(tag: String, v: (Long, Long, Long)): Unit = {
    commits.put((tag, epoch.incrementAndGet()), v)
    results.put(tag, v)
  }

  def hash(v: Long): Long = {
    val x = v * -7046029254386353131L // odd multiplier: bijective on 2^64
    java.lang.Long.rotateLeft(x, 31) ^ (x >>> 17)
  }
}

private[sources] class SinkTable(writeSchema: StructType, tag: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graftsink($tag)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // the advertised TRUNCATE capability needs a builder that can
      // build it; truncating a blackhole is a no-op, which makes
      // mode("overwrite") equivalent to append here
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new SinkBatchWrite(tag, info.schema())
      }
    }
}

private[sources] case class SinkCommit(rows: Long, bytes: Long, checksum: Long)
    extends WriterCommitMessage

private[sources] class SinkBatchWrite(tag: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SinkWriterFactory(schema.length,
      schema.headOption.exists(_.dataType == LongType))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (r, b, c) = messages.foldLeft((0L, 0L, 0L)) {
      case ((ar, ab, ac), SinkCommit(mr, mb, mc)) => (ar + mr, ab + mb, ac ^ mc)
      case (acc, _) => acc
    }
    SinkSource.record(tag, (r, b, c))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class SinkWriterFactory(nCols: Int, leadLong: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      private var checksum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        var i = 0
        while (i < nCols) { // cheap size accounting: 8B per non-null field
          if (!record.isNullAt(i)) bytes += 8
          i += 1
        }
        if (leadLong && !record.isNullAt(0))
          checksum ^= SinkSource.hash(record.getLong(0))
      }
      override def commit(): WriterCommitMessage = SinkCommit(rows, bytes, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
