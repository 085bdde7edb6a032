package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The maintenance procedures behind [[GraftCatalog]]'s `CALL`
  * surface. Each binds a typed parameter list (names + defaults
  * resolve through Spark's own procedure binding), runs one of the
  * format's O(debt) maintenance primitives on the driver, and
  * returns its result as a driver-local scan.
  */
object GraftProcedures {

  val names: Array[String] =
    Array("optimize", "vacuum", "history", "expire_versions")

  def apply(cat: GraftCatalog, name: String): UnboundProcedure = name match {
    case "optimize" => Optimize(cat)
    case "vacuum" => Vacuum(cat)
    case "history" => History(cat)
    case "expire_versions" => ExpireVersions(cat)
    case other => throw new IllegalArgumentException(
      s"unknown graft procedure '$other' " +
        s"(have ${names.mkString(", ")})")
  }

  private def spark: SparkSession = SparkSession.active

  private def str(v: String) = UTF8String.fromString(v)

  private def materialize(rows: Seq[Array[Any]]): Array[InternalRow] =
    rows.map(vs => new GenericInternalRow(vs): InternalRow).toArray

  private abstract class GraftProc(val name: String) extends UnboundProcedure {
    override def description: String = s"graft $name"
  }

  private abstract class Bound(val name: String,
      ps: Array[ProcedureParameter], out: StructType)
      extends BoundProcedure {
    override def description: String = s"graft $name"
    override def parameters(): Array[ProcedureParameter] = ps
    override def isDeterministic: Boolean = false
    def run(in: InternalRow): Seq[Array[Any]]
    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val scan: Scan = new LocalScan {
        private val data = materialize(run(in))
        override def rows(): Array[InternalRow] = data
        override def readSchema(): StructType = out
      }
      java.util.List.of(scan).iterator()
    }
  }

  private val tableParam =
    ProcedureParameter.in("table", StringType)
      .comment("table identifier relative to this catalog, e.g. 'ns.t'")
      .build()

  /** `CALL c.system.optimize(table => 'ns.t' [, zorder_by => 'x,y']
    * [, target_files => n] [, bits => b] [, max_files => m])` —
    * incremental Z-order when `zorder_by` is set ([[
    * GraftTable.zorderIncremental]]; `max_files` bounds the pass),
    * otherwise a full [[GraftTable.compact]] to `target_files`.
    * Returns the committed version.
    */
  private case class Optimize(cat: GraftCatalog)
      extends GraftProc("optimize") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("optimize", Array(
        tableParam,
        ProcedureParameter.in("zorder_by", StringType)
          .defaultValue("''").build(),
        ProcedureParameter.in("target_files", IntegerType)
          .defaultValue("4").build(),
        ProcedureParameter.in("bits", IntegerType)
          .defaultValue("16").build(),
        ProcedureParameter.in("max_files", IntegerType)
          .defaultValue("0").build()),
        new StructType().add("version", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val zcols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          val v =
            if (zcols.nonEmpty)
              GraftTable.zorderIncremental(spark, root, zcols,
                targetFiles = in.getInt(2), bits = in.getInt(3),
                maxFiles = in.getInt(4))
            else GraftTable.compact(spark, root, in.getInt(2))
          Seq(Array[Any](v))
        }
      }
  }

  /** `CALL c.system.vacuum(table => 'ns.t' [, min_age_ms => n])` —
    * reclaims unreferenced files ([[GraftTable.vacuum]]); returns the
    * reclaimed paths.
    */
  private case class Vacuum(cat: GraftCatalog) extends GraftProc("vacuum") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("vacuum", Array(
        tableParam,
        ProcedureParameter.in("min_age_ms", LongType)
          .defaultValue("0").build()),
        new StructType().add("path", StringType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.vacuum(spark, root, in.getLong(1))
            .map(p => Array[Any](str(p)))
        }
      }
  }

  /** `CALL c.system.history(table => 'ns.t')` — the commit log as
    * rows ([[GraftTable.history]]).
    */
  private case class History(cat: GraftCatalog) extends GraftProc("history") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("history", Array(tableParam),
        new StructType().add("version", LongType)
          .add("adds", IntegerType).add("removes", IntegerType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.history(spark, root)
            .map { case (v, a, r) => Array[Any](v, a, r) }
        }
      }
  }

  /** `CALL c.system.expire_versions(table => 'ns.t', keep => n)` —
    * checkpoint-anchored log retention ([[GraftTable.expireVersions]]);
    * returns the expired versions.
    */
  private case class ExpireVersions(cat: GraftCatalog)
      extends GraftProc("expire_versions") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("expire_versions", Array(
        tableParam,
        ProcedureParameter.in("keep", IntegerType).build()),
        new StructType().add("version", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.expireVersions(spark, root, in.getInt(1))
            .map(v => Array[Any](v))
        }
      }
  }
}
