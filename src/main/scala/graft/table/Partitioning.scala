package graft.table

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.time.LocalDate

/** Hidden (transform) partitioning for the graft table format — the
  * Iceberg partition-spec shape re-expressed over this log: a table
  * declares `days(ts)` / `months(o_orderdate)` / `bucket(16, id)` /
  * `truncate(4, code)` / identity transforms at CREATE, every data
  * file carries its exact partition TUPLE in the commit log (a
  * generalized zone map: one value, not a min/max), and queries on the
  * SOURCE column prune through the transform — the user never writes
  * or even sees the partition column (reference capability: the
  * pipeline's day-sliced taxi ingestion, taxi_pipeline.py:89-147,
  * generalized to declared specs).
  *
  * Scale posture (the 100 TB contract):
  *  - Writes cluster by the partition tuple (one shuffle) and land via
  *    Spark's dynamic-partition writer, so each file holds exactly one
  *    tuple — the layout invariant every later prune relies on.
  *  - Scans prune files by comparing the pushed range, MAPPED through
  *    the transform, against each file's tuple — O(files) driver
  *    metadata, zero IO, composing with zone maps and blooms.
  *  - `DELETE WHERE ts < cutoff` drops whole partitions METADATA-ONLY:
  *    a file whose tuple's source interval lies inside the predicate
  *    range is removed from the log without being opened.
  *  - Dynamic-partition overwrite replaces exactly the tuples the
  *    incoming batch carries — the idempotent re-ingestion verb.
  *
  * Encoding: every partition value is a STRING, stable across JVMs
  * and safe as a path segment — integers in decimal (days/months/
  * hours/years since epoch, bucket ordinal, truncated long), strings
  * as lowercase hex of their UTF-8 bytes (hex compares in BYTE order,
  * which is exactly Spark's own string comparison order, so pruning
  * needs no ASCII guard), and `n` for a NULL source value. Timestamp
  * math is timezone-fixed (unix_micros / unix_date — never the
  * session zone), so a write in Tokyo and a prune in UTC see the same
  * partition.
  */
object Partitioning {

  private val mapper = new ObjectMapper()
  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** NULL source values land in this partition; any range predicate on
    * the source column prunes such a file entirely (SQL ranges never
    * match NULL).
    */
  val NullValue = "n"

  /** One declared transform of the partition spec. `fieldName` is both
    * the synthetic write-side column and the directory key — never a
    * data column.
    */
  sealed trait PTransform {
    def kind: String
    def srcCol: String
    def fieldName: String
    /** Supported source types (create-time validation). */
    def accepts(dt: DataType): Boolean
    /** Write-side encoded value (string, never null) for source `c`. */
    def writeExpr(c: Column, dt: DataType): Column
    /** Driver-side encode of a stats-primitive source value (Long
      * days/micros/integer, String) — None = not encodable (no prune).
      */
    def encodePrim(v: Any, dt: DataType): Option[String]
    /** Whether ranges on the source map to ranges on the encoding. */
    def monotonic: Boolean
    /** Compare two encoded values in source order. */
    def cmpEnc(a: String, b: String): Int
    /** The closed source-primitive interval covered by encoded value
      * `v` — the deleteRange full-coverage proof. None = no proof.
      */
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)]
    def paramJson(n: ObjectNode): Unit = {}
    def describe: String
  }

  private def numCmp(a: String, b: String): Int =
    java.lang.Long.compare(a.toLong, b.toLong)

  /** Lowercase hex of a string's UTF-8 bytes — the canonical string
    * partition-value encoding (public: tests and tooling re-derive
    * expected tuple values with it).
    */
  def hexOf(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val out = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => out.append(f"${b & 0xff}%02x"))
    out.toString
  }

  private def primLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }

  /** Wrap a raw encoding expression with the NULL partition rule. */
  private def orNull(c: Column, enc: Column): Column =
    when(c.isNotNull, enc.cast(StringType)).otherwise(lit(NullValue))

  /** Exact floorDiv(unix_micros, d) as a Column — decimal division so
    * the quotient is exact for the full timestamp domain (a plain
    * `/` is double arithmetic and rounds past 2^53 µs ≈ year 2255).
    */
  private def microsFloorDiv(c: Column, d: Long): Column =
    floor(unix_micros(c).cast(DecimalType(30, 0)) / lit(d)).cast(LongType)

  /** epochDay of the source as a Column — DATE and TIMESTAMP_NTZ are
    * wall-clock (timezone-free by construction); TIMESTAMP is the UTC
    * instant's day via `unix_micros`, never the session zone.
    */
  private def epochDayExpr(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast(LongType)
    case TimestampNTZType => unix_date(c.cast(DateType)).cast(LongType)
    case _ => microsFloorDiv(c, MicrosPerDay)
  }

  /** Driver-side epochDay of a stats-primitive (days or micros). */
  private def epochDayPrim(v: Long, dt: DataType): Long = dt match {
    case DateType => v
    case _ => Math.floorDiv(v, MicrosPerDay)
  }

  private def isIntLike(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  private def isTemporal(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** `identity` — partition by the exact value. Ints/dates/timestamps
    * encode as their stats primitive in decimal; strings as hex.
    */
  final case class PIdentity(srcCol: String) extends PTransform {
    val kind = "identity"
    val fieldName = s"gp_$srcCol"
    // identity over a timestamp would make every microsecond its own
    // partition — refused; days/hours/months are the temporal shapes
    def accepts(dt: DataType): Boolean =
      isIntLike(dt) || dt == DateType || dt == StringType
    def writeExpr(c: Column, dt: DataType): Column = dt match {
      case StringType => orNull(c, lower(hex(encode(c, "UTF-8"))))
      case DateType => orNull(c, unix_date(c).cast(LongType))
      case _ => orNull(c, c.cast(LongType))
    }
    def encodePrim(v: Any, dt: DataType): Option[String] = dt match {
      case StringType =>
        v match { case s: String => Some(hexOf(s)); case _ => None }
      case _ => primLong(v).map(_.toString)
    }
    def monotonic = true
    def cmpEnc(a: String, b: String): Int =
      if (a.headOption.exists(ch => ch.isDigit || ch == '-') &&
          a.forall(ch => ch.isDigit || ch == '-') &&
          b.forall(ch => ch.isDigit || ch == '-')) numCmp(a, b)
      else a.compareTo(b)
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = dt match {
      case StringType =>
        // decode hex → the single exact string; engage only when pure
        // ASCII so the caller's Java-order compare agrees with the
        // byte order the encoding proves
        val bytes = v.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        if (bytes.forall(b => b >= 0)) {
          val s = new String(bytes, StandardCharsets.UTF_8)
          Some((s, s))
        } else None
      case _ => scala.util.Try(v.toLong).toOption.map(l => (l, l))
    }
    def describe = srcCol
  }

  /** `days(col)` — epochDay of a date/timestamp (UTC). */
  final case class PDays(srcCol: String) extends PTransform {
    val kind = "days"
    val fieldName = s"gp_${srcCol}_day"
    def accepts(dt: DataType): Boolean = isTemporal(dt)
    def writeExpr(c: Column, dt: DataType): Column =
      orNull(c, epochDayExpr(c, dt))
    def encodePrim(v: Any, dt: DataType): Option[String] =
      primLong(v).map(epochDayPrim(_, dt).toString)
    def monotonic = true
    def cmpEnc(a: String, b: String): Int = numCmp(a, b)
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = {
      val d = v.toLong
      dt match {
        case DateType => Some((d, d))
        case _ => Some((d * MicrosPerDay, (d + 1) * MicrosPerDay - 1))
      }
    }
    def describe = s"days($srcCol)"
  }

  /** `hours(col)` — hours since epoch of a timestamp (UTC). */
  final case class PHours(srcCol: String) extends PTransform {
    val kind = "hours"
    val fieldName = s"gp_${srcCol}_hour"
    def accepts(dt: DataType): Boolean = dt match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    def writeExpr(c: Column, dt: DataType): Column = dt match {
      // NTZ: wall-clock hours (epochDay·24 + hour), timezone-free;
      // instants go through unix_micros (UTC-fixed)
      case TimestampNTZType =>
        orNull(c, epochDayExpr(c, dt) * lit(24L) + hour(c).cast(LongType))
      case _ => orNull(c, microsFloorDiv(c, MicrosPerHour))
    }
    def encodePrim(v: Any, dt: DataType): Option[String] =
      primLong(v).map(Math.floorDiv(_, MicrosPerHour).toString)
    def monotonic = true
    def cmpEnc(a: String, b: String): Int = numCmp(a, b)
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = {
      val h = v.toLong
      Some((h * MicrosPerHour, (h + 1) * MicrosPerHour - 1))
    }
    def describe = s"hours($srcCol)"
  }

  /** Months (or years) since epoch of a date/timestamp, UTC calendar. */
  sealed abstract class PCalendar(unitsPerYear: Int) extends PTransform {
    def accepts(dt: DataType): Boolean = isTemporal(dt)
    private def ofDate(d: Column): Column =
      if (unitsPerYear == 12)
        ((year(d) - 1970) * 12 + month(d) - 1).cast(LongType)
      else (year(d) - 1970).cast(LongType)
    def writeExpr(c: Column, dt: DataType): Column = dt match {
      // year()/month() over DateType are timezone-free; timestamps go
      // through an explicit UTC epochDay first for the same reason
      case DateType => orNull(c, ofDate(c))
      case _ => orNull(c,
        ofDate(date_from_unix_date(epochDayExpr(c, dt).cast(IntegerType))))
    }
    def encodePrim(v: Any, dt: DataType): Option[String] =
      primLong(v).map { p =>
        val d = LocalDate.ofEpochDay(epochDayPrim(p, dt))
        val m =
          if (unitsPerYear == 12) (d.getYear - 1970) * 12 + d.getMonthValue - 1
          else d.getYear - 1970
        m.toString
      }
    def monotonic = true
    def cmpEnc(a: String, b: String): Int = numCmp(a, b)
    protected def bounds(v: Long): (LocalDate, LocalDate)
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = {
      val (first, next) = bounds(v.toLong)
      dt match {
        case DateType => Some((first.toEpochDay, next.toEpochDay - 1))
        case _ => Some((first.toEpochDay * MicrosPerDay,
          next.toEpochDay * MicrosPerDay - 1))
      }
    }
  }

  final case class PMonths(srcCol: String) extends PCalendar(12) {
    val kind = "months"
    val fieldName = s"gp_${srcCol}_month"
    protected def bounds(v: Long): (LocalDate, LocalDate) = {
      val first = LocalDate.of(1970 + Math.floorDiv(v, 12).toInt,
        Math.floorMod(v, 12).toInt + 1, 1)
      (first, first.plusMonths(1))
    }
    def describe = s"months($srcCol)"
  }

  final case class PYears(srcCol: String) extends PCalendar(1) {
    val kind = "years"
    val fieldName = s"gp_${srcCol}_year"
    protected def bounds(v: Long): (LocalDate, LocalDate) = {
      val first = LocalDate.of(1970 + v.toInt, 1, 1)
      (first, first.plusYears(1))
    }
    def describe = s"years($srcCol)"
  }

  /** `bucket(n, col)` — `pmod(xxhash64(col), n)`, Spark's own codegen'd
    * hash on the write side and the identical Catalyst evaluation for
    * driver-side point-probe pruning (only equality predicates prune a
    * bucket; ranges pass through to zone maps).
    */
  final case class PBucket(srcCol: String, n: Int) extends PTransform {
    require(n > 0, s"bucket($n, $srcCol): bucket count must be positive")
    val kind = "bucket"
    val fieldName = s"gp_${srcCol}_bucket$n"
    def accepts(dt: DataType): Boolean =
      isIntLike(dt) || isTemporal(dt) || dt == StringType
    def writeExpr(c: Column, dt: DataType): Column =
      orNull(c, pmod(xxhash64(c), lit(n)))
    def encodePrim(v: Any, dt: DataType): Option[String] = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      import org.apache.spark.unsafe.types.UTF8String
      // the INTERNAL literal for the source type — xxhash64 hashes
      // ints and longs differently, so the width must match exactly
      val internal: Option[(Any, DataType)] = dt match {
        case LongType => primLong(v).map(l => (l, LongType))
        case TimestampType | TimestampNTZType => primLong(v).map(l => (l, dt))
        case IntegerType => primLong(v).map(l => (l.toInt, IntegerType))
        case DateType => primLong(v).map(l => (l.toInt, DateType))
        case ShortType => primLong(v).map(l => (l.toShort, ShortType))
        case ByteType => primLong(v).map(l => (l.toByte, ByteType))
        case StringType => v match {
          case s: String => Some((UTF8String.fromString(s), StringType))
          case _ => None
        }
        case _ => None
      }
      internal.flatMap { case (iv, idt) =>
        scala.util.Try {
          val h = new XxHash64(Seq(Literal(iv, idt)))
            .eval(null).asInstanceOf[Long]
          (((h % n) + n) % n).toString
        }.toOption
      }
    }
    def monotonic = false
    def cmpEnc(a: String, b: String): Int = numCmp(a, b)
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = None
    override def paramJson(node: ObjectNode): Unit = node.put("n", n)
    def describe = s"bucket($n, $srcCol)"
  }

  /** `truncate(w, col)` — strings keep their first `w` code points
    * (hex-encoded), integers floor to a multiple of `w`. Both
    * order-preserving, so ranges prune.
    */
  final case class PTruncate(srcCol: String, w: Int) extends PTransform {
    require(w > 0, s"truncate($w, $srcCol): width must be positive")
    val kind = "truncate"
    val fieldName = s"gp_${srcCol}_trunc$w"
    def accepts(dt: DataType): Boolean = isIntLike(dt) || dt == StringType
    def writeExpr(c: Column, dt: DataType): Column = dt match {
      case StringType =>
        orNull(c, lower(hex(encode(substring(c, 1, w), "UTF-8"))))
      case _ =>
        val l = c.cast(LongType)
        orNull(c, l - pmod(l, lit(w.toLong)))
    }
    private def truncStr(s: String): String = {
      val cps = s.codePoints().limit(w).toArray
      new String(cps, 0, cps.length)
    }
    def encodePrim(v: Any, dt: DataType): Option[String] = dt match {
      case StringType => v match {
        case s: String => Some(hexOf(truncStr(s)))
        case _ => None
      }
      case _ => primLong(v).map(l => (l - Math.floorMod(l, w.toLong)).toString)
    }
    def monotonic = true
    def cmpEnc(a: String, b: String): Int =
      if (a.forall(ch => ch.isDigit || ch == '-') &&
          b.forall(ch => ch.isDigit || ch == '-')) numCmp(a, b)
      else a.compareTo(b) // hex: lexical == byte order == Spark order
    def coverInterval(v: String, dt: DataType): Option[(Any, Any)] = dt match {
      case StringType => None // a prefix block has no closed upper bound
      case _ => scala.util.Try(v.toLong).toOption.map(t => (t, t + w - 1))
    }
    override def paramJson(node: ObjectNode): Unit = node.put("w", w)
    def describe = s"truncate($w, $srcCol)"
  }

  // ---------- spec validation + JSON ----------

  /** Create-time validation: every source column exists with a type
    * its transform supports, synthetic names collide with nothing.
    */
  def validate(spec: Seq[PTransform], schema: StructType): Unit = {
    require(spec.nonEmpty, "empty partition spec")
    spec.foreach { t =>
      require(t.srcCol.matches("[A-Za-z0-9_]+"),
        s"partition source column '${t.srcCol}' must be [A-Za-z0-9_]+ " +
          "(it becomes a directory name)")
      val f = schema.fields.find(_.name == t.srcCol).getOrElse(
        sys.error(s"partition transform ${t.describe}: " +
          s"no column '${t.srcCol}' in the table schema"))
      require(t.accepts(f.dataType),
        s"partition transform ${t.describe} does not support type " +
          s"${f.dataType.simpleString}")
      require(!schema.fieldNames.contains(t.fieldName),
        s"partition field '${t.fieldName}' collides with a data column")
    }
    val names = spec.map(_.fieldName)
    require(names.distinct.size == names.size,
      s"duplicate partition transforms: ${names.mkString(", ")}")
  }

  def toJson(spec: Seq[PTransform]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("spec")
    spec.foreach { t =>
      val n = arr.addObject()
      n.put("kind", t.kind)
      n.put("col", t.srcCol)
      t.paramJson(n)
    }
    mapper.writeValueAsString(root)
  }

  /** Parse a DDL-ish spec string — `"days(ts), bucket(16, id), k"` —
    * the text form the `evolve_partitioning` CALL procedure takes.
    * A bare identifier is `identity`.
    */
  def parse(s: String): Seq[PTransform] = {
    val fn = """(\w+)\s*\(\s*([^)]*?)\s*\)""".r
    // split on top-level commas only (a comma whose remainder reaches
    // a ')' without an intervening '(' sits inside transform args)
    s.split(""",(?![^(]*\))""").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case fn("identity", col) => PIdentity(col)
      case fn("days", col) => PDays(col)
      case fn("hours", col) => PHours(col)
      case fn("months", col) => PMonths(col)
      case fn("years", col) => PYears(col)
      case fn("bucket", args) => args.split(',').map(_.trim) match {
        case Array(n, col) => PBucket(col, n.toInt)
        case _ => sys.error(s"bucket expects (n, col), got '$args'")
      }
      case fn("truncate", args) => args.split(',').map(_.trim) match {
        case Array(w, col) => PTruncate(col, w.toInt)
        case _ => sys.error(s"truncate expects (w, col), got '$args'")
      }
      case bare if bare.matches("\\w+") => PIdentity(bare)
      case other => sys.error(s"cannot parse partition transform '$other'")
    }
  }

  def fromJson(s: String): Seq[PTransform] = {
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(s)
    root.get("spec").elements().asScala.map(fromJsonNode).toSeq
  }

  private def fromJsonNode(n: JsonNode): PTransform = {
    val col = n.get("col").asText
    n.get("kind").asText match {
      case "identity" => PIdentity(col)
      case "days" => PDays(col)
      case "hours" => PHours(col)
      case "months" => PMonths(col)
      case "years" => PYears(col)
      case "bucket" => PBucket(col, n.get("n").asInt)
      case "truncate" => PTruncate(col, n.get("w").asInt)
      case other => sys.error(s"unknown partition transform kind '$other'")
    }
  }

  // ---------- pruning + coverage ----------

  private def srcType(schema: StructType, col: String): Option[DataType] =
    schema.fields.find(_.name == col).map(_.dataType)

  /** Conservative partition-level `mayMatch`: false only when the
    * file's tuple PROVES the range cannot match — the exact dual of
    * zone-map pruning, evaluated per pushed range against every
    * transform over that range's column.
    */
  def mayMatch(spec: Seq[PTransform], schema: StructType,
      part: Map[String, String], r: GraftTable.Range): Boolean =
    spec.filter(_.srcCol == r.col).forall { t =>
      part.get(t.fieldName) match {
        case None => true // pre-spec or re-added file: no proof, no prune
        case Some(NullValue) =>
          // an all-NULL source partition: no range predicate matches
          false
        case Some(v) =>
          srcType(schema, r.col) match {
            case None => true
            case Some(dt) if t.monotonic =>
              r.lo.flatMap(t.encodePrim(_, dt))
                .forall(lo => t.cmpEnc(v, lo) >= 0) &&
                r.hi.flatMap(t.encodePrim(_, dt))
                  .forall(hi => t.cmpEnc(v, hi) <= 0)
            case Some(dt) =>
              // bucket: only an exact point probe prunes
              (r.lo, r.hi) match {
                case (Some(a), Some(b)) if a == b =>
                  t.encodePrim(a, dt).forall(_ == v)
                case _ => true
              }
          }
      }
    }

  /** Partition-tuple proof that EVERY row of a file lies inside `r` —
    * the deleteRange metadata-only drop, through a transform: the
    * tuple's whole source interval must sit inside the range. A
    * non-null tuple value also proves the file has NO null source
    * rows (they land in the `n` partition).
    */
  def covers(spec: Seq[PTransform], schema: StructType,
      part: Map[String, String], r: GraftTable.Range): Boolean =
    spec.exists { t =>
      t.srcCol == r.col && part.get(t.fieldName).exists { v =>
        v != NullValue && srcType(schema, r.col).exists { dt =>
          t.coverInterval(v, dt).exists { case (vlo, vhi) =>
            val tpe = dt match {
              case StringType => "str"
              case DoubleType | FloatType => "f64"
              case _ => "i64"
            }
            r.lo.forall(lo => GraftTable.cmpPublic(tpe, vlo, lo) >= 0) &&
              r.hi.forall(hi => GraftTable.cmpPublic(tpe, vhi, hi) <= 0)
          }
        }
      }
    }

  /** Parse the partition tuple out of a file's path segments
    * (`gp_x=3/gp_y_day=18262/part-….parquet`), validated against the
    * spec.
    */
  def tupleOfPath(spec: Seq[PTransform], rel: String): Map[String, String] = {
    val segs = rel.split('/').dropRight(1)
    val kv = segs.flatMap { s =>
      val i = s.indexOf('=')
      if (i <= 0) None else Some(s.substring(0, i) -> s.substring(i + 1))
    }.toMap
    val missing = spec.map(_.fieldName).filterNot(kv.contains)
    require(missing.isEmpty,
      s"partitioned data path '$rel' is missing partition fields $missing")
    spec.map(t => t.fieldName -> kv(t.fieldName)).toMap
  }
}
