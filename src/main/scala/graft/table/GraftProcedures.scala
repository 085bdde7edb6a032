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
    Array("optimize", "vacuum", "history", "expire_versions",
      "describe_detail", "maintain", "verify_table",
      "evolve_partitioning", "restore", "clone", "deep_clone",
      "analyze")

  def apply(cat: GraftCatalog, name: String): UnboundProcedure = name match {
    case "optimize" => Optimize(cat)
    case "vacuum" => Vacuum(cat)
    case "history" => History(cat)
    case "expire_versions" => ExpireVersions(cat)
    case "describe_detail" => DescribeDetail(cat)
    case "maintain" => Maintain(cat)
    case "verify_table" => VerifyTable(cat)
    case "evolve_partitioning" => EvolvePartitioning(cat)
    case "restore" => Restore(cat)
    case "clone" => Clone(cat, deep = false)
    case "deep_clone" => Clone(cat, deep = true)
    case "analyze" => Analyze(cat)
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
    * [, target_files => n] [, bits => b] [, max_files => m]
    * [, where => '<pred>'])` — incremental Z-order when `zorder_by`
    * is set ([[GraftTable.zorderIncremental]]; `max_files` bounds the
    * pass), predicate-SCOPED compaction when `where` is set
    * ([[GraftTable.compactWhere]] — only the overlapping files
    * rewrite, O(slice) not O(table)), otherwise a full
    * [[GraftTable.compact]] to `target_files`. Returns the committed
    * version.
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
          .defaultValue("0").build(),
        ProcedureParameter.in("where", StringType)
          .defaultValue("''").build()),
        new StructType().add("version", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val zcols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          val where = in.getUTF8String(5).toString.trim
          require(zcols.isEmpty || where.isEmpty,
            "optimize: zorder_by and where are mutually exclusive")
          val v =
            if (zcols.nonEmpty)
              GraftTable.zorderIncremental(spark, root, zcols,
                targetFiles = in.getInt(2), bits = in.getInt(3),
                maxFiles = in.getInt(4))
            else if (where.nonEmpty)
              GraftTable.compactWhere(spark, root, where, in.getInt(2))
            else GraftTable.compact(spark, root, in.getInt(2))
          Seq(Array[Any](v))
        }
      }
  }

  /** `CALL c.system.analyze(table => 'ns.t' [, histogram_for =>
    * 'c1,c2'] [, buckets => 64])` — the ANALYZE-pass analogue, in two
    * independent halves: (1) if the table declares `ndv.columns`,
    * backfills NDV sketches for files predating the declaration
    * ([[GraftTable.analyzeNdv]] — one column-pruned pass over ONLY the
    * missing files, committed metadata-only, idempotent); (2) if
    * `histogram_for` names columns, computes equi-height histograms
    * for them ([[GraftTable.analyzeHistogram]] — skew-aware CBO range
    * estimates). Returns the backfilled-file count and the histogram
    * columns written.
    */
  private case class Analyze(cat: GraftCatalog) extends GraftProc("analyze") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("analyze", Array(
        tableParam,
        ProcedureParameter.in("histogram_for", StringType)
          .defaultValue("''").build(),
        ProcedureParameter.in("buckets", IntegerType)
          .defaultValue("64").build()),
        new StructType().add("files_analyzed", LongType)
          .add("histogram_columns", StringType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val hcols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          val declared = GraftTable.ndvColumns(spark, root).nonEmpty
          require(declared || hcols.nonEmpty,
            "analyze: nothing to do — declare ndv.columns (table " +
              "property) or pass histogram_for")
          val backfilled =
            if (declared) GraftTable.analyzeNdv(spark, root) else 0L
          if (hcols.nonEmpty)
            GraftTable.analyzeHistogram(spark, root, hcols, in.getInt(2))
          Seq(Array[Any](backfilled, str(hcols.mkString(","))))
        }
      }
  }

  /** `CALL c.system.vacuum(table => 'ns.t' [, min_age_ms => n]
    * [, dry_run => true])` — reclaims unreferenced files
    * ([[GraftTable.vacuum]]); `dry_run` lists exactly what a real
    * vacuum would delete without touching anything
    * ([[GraftTable.vacuumDryRun]]). Returns the (would-be) reclaimed
    * paths.
    *
    * `min_age_ms` DEFAULTS to [[GraftTable.DefaultVacuumGraceMs]]
    * (10 min — previously 0): young orphans survive the sweep unless
    * the operator passes `min_age_ms => 0` explicitly. See the
    * behavior-change note on the constant.
    */
  private case class Vacuum(cat: GraftCatalog) extends GraftProc("vacuum") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("vacuum", Array(
        tableParam,
        ProcedureParameter.in("min_age_ms", LongType)
          .defaultValue(GraftTable.DefaultVacuumGraceMs.toString).build(),
        ProcedureParameter.in("dry_run",
          org.apache.spark.sql.types.BooleanType)
          .defaultValue("false").build()),
        new StructType().add("path", StringType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val paths =
            if (in.getBoolean(2))
              GraftTable.vacuumDryRun(spark, root, in.getLong(1))
            else GraftTable.vacuum(spark, root, in.getLong(1))
          paths.map(p => Array[Any](str(p)))
        }
      }
  }

  /** `CALL c.system.verify_table(table => 'ns.t')` — integrity audit
    * ([[GraftTable.verifyTable]], the FSCK analogue): logged files
    * exist, partition tuples complete, deletion vectors present with
    * exact masked counts, parquet-footer row counts equal the log.
    * Failures row-by-row plus a summary row per check.
    */
  private case class VerifyTable(cat: GraftCatalog)
      extends GraftProc("verify_table") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("verify_table", Array(tableParam),
        new StructType().add("check", StringType)
          .add("target", StringType)
          .add("ok", org.apache.spark.sql.types.BooleanType)
          .add("detail", StringType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.verifyTable(spark, root).map { case (c, t, ok, d) =>
            Array[Any](str(c), str(t), ok, str(d))
          }
        }
      }
  }

  /** `CALL c.system.evolve_partitioning(table => 'ns.t',
    * spec => 'days(ts), bucket(16, id)')` — replace the partition spec
    * metadata-only ([[GraftTable.evolvePartitioning]]; the DDL-ish
    * spec string parses via [[Partitioning.parse]], bare identifiers
    * are identity). Returns the bumped version and the new spec.
    */
  private case class EvolvePartitioning(cat: GraftCatalog)
      extends GraftProc("evolve_partitioning") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("evolve_partitioning", Array(
        tableParam,
        ProcedureParameter.in("spec", StringType)
          .comment("DDL-ish transforms, e.g. 'days(ts), bucket(16, id)'")
          .build()),
        new StructType().add("version", LongType).add("spec", StringType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val spec = Partitioning.parse(in.getUTF8String(1).toString)
          val v = GraftTable.evolvePartitioning(spark, root, spec)
          Seq(Array[Any](v, str(spec.map(_.describe).mkString(", "))))
        }
      }
  }

  /** `CALL c.system.restore(table => 'ns.t', version => v)` or
    * `(…, timestamp_ms => t)` — swing the table back to an earlier
    * state as ONE NEW metadata commit ([[GraftTable.restore]] /
    * [[GraftTable.restoreAsOf]]): nothing is rewritten or deleted and
    * every intermediate version stays time-travelable. Returns the
    * committed version.
    */
  private case class Restore(cat: GraftCatalog)
      extends GraftProc("restore") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("restore", Array(
        tableParam,
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1").build(),
        ProcedureParameter.in("timestamp_ms", LongType)
          .defaultValue("-1").build()),
        new StructType().add("version", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val (ver, ts) = (in.getLong(1), in.getLong(2))
          require((ver >= 0) != (ts >= 0),
            "restore needs exactly one of version / timestamp_ms")
          val v =
            if (ver >= 0) GraftTable.restore(spark, root, ver)
            else GraftTable.restoreAsOf(spark, root, ts)
          Seq(Array[Any](v))
        }
      }
  }

  /** `CALL c.system.clone(source => 'ns.s', target => 'ns.t'
    * [, version => v])` — zero-copy metadata branch
    * ([[GraftTable.clone]]); `deep_clone` is the self-contained
    * physical copy ([[GraftTable.deepClone]]). The target identifier
    * maps through the catalog's own directory scheme and must not
    * already be a table. Returns the target's committed version.
    */
  private case class Clone(cat: GraftCatalog, deep: Boolean)
      extends GraftProc(if (deep) "deep_clone" else "clone") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound(name, Array(
        ProcedureParameter.in("source", StringType)
          .comment("source table identifier, e.g. 'ns.s'").build(),
        ProcedureParameter.in("target", StringType)
          .comment("new table identifier, e.g. 'ns.t'").build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1").build()),
        new StructType().add("version", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val src = cat.resolveRoot(in.getUTF8String(0).toString)
          val dst = cat.resolveNewRoot(in.getUTF8String(1).toString)
          val at = Some(in.getLong(2)).filter(_ >= 0)
          val v =
            if (deep) GraftTable.deepClone(spark, src, dst, at)
            else GraftTable.clone(spark, src, dst, at)
          Seq(Array[Any](v))
        }
      }
  }

  /** `CALL c.system.history(table => 'ns.t')` — the commit log as
    * rows ([[GraftTable.historyOps]]): version, commit wall-clock,
    * the OPERATION verb that produced the commit (append / delete /
    * merge_into / compact / restore / …; pre-field entries read
    * `commit`), and the add/remove file counts.
    */
  private case class History(cat: GraftCatalog) extends GraftProc("history") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("history", Array(tableParam),
        new StructType().add("version", LongType)
          .add("ts_ms", LongType).add("operation", StringType)
          .add("adds", IntegerType).add("removes", IntegerType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.historyOps(spark, root)
            .map { case (v, ts, op, a, r) =>
              Array[Any](v, ts, str(op), a, r) }
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

  /** `CALL c.system.describe_detail(table => 'ns.t')` — the
    * operational summary ([[GraftTable.describeDetail]]: version,
    * file/row/byte counters, live vs DV-masked rows, small-file and
    * mask debt, bloom columns, constraints, log shape) as one row.
    * Log + file-status metadata only — zero data IO.
    */
  private case class DescribeDetail(cat: GraftCatalog)
      extends GraftProc("describe_detail") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("describe_detail", Array(tableParam),
        new StructType()
          .add("root", StringType).add("version", LongType)
          .add("num_files", LongType).add("physical_rows", LongType)
          .add("live_rows", LongType).add("masked_rows", LongType)
          .add("size_bytes", LongType).add("small_files", LongType)
          .add("dv_files", LongType).add("bloom_columns", StringType)
          .add("constraints", StringType).add("log_entries", LongType)
          .add("checkpoints", LongType).add("txn_apps", LongType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          GraftTable.describeDetail(spark, root).collect().toSeq.map { r =>
            r.toSeq.map {
              case s: String => str(s): Any
              case v => v: Any
            }.toArray
          }
        }
      }
  }

  /** `CALL c.system.maintain(table => 'ns.t' [, small_file_rows]
    * [, keep_versions] [, vacuum_min_age_ms] [, cluster_by]
    * [, cluster_bits] [, cluster_max_files])` — the one-call
    * steady-state pass ([[GraftTable.maintain]]): DV purge past the
    * mask-ratio bound, small-file compaction, a bounded incremental
    * clustering tick, log expiry, vacuum — each O(debt). Returns one
    * row of what the call actually did.
    */
  private case class Maintain(cat: GraftCatalog)
      extends GraftProc("maintain") {
    override def bind(inputType: StructType): BoundProcedure =
      new Bound("maintain", Array(
        tableParam,
        ProcedureParameter.in("small_file_rows", LongType)
          .defaultValue("100000").build(),
        ProcedureParameter.in("keep_versions", IntegerType)
          .defaultValue("30").build(),
        ProcedureParameter.in("vacuum_min_age_ms", LongType)
          .defaultValue(GraftTable.DefaultVacuumGraceMs.toString).build(),
        ProcedureParameter.in("cluster_by", StringType)
          .defaultValue("''").build(),
        ProcedureParameter.in("cluster_bits", IntegerType)
          .defaultValue("16").build(),
        ProcedureParameter.in("cluster_max_files", IntegerType)
          .defaultValue("16").build(),
        // byte-gated small-file debt (0 = rows only): row counts are a
        // poor smallness proxy on wide schemas
        ProcedureParameter.in("small_file_bytes", LongType)
          .defaultValue("0").build()),
        new StructType()
          .add("purged", org.apache.spark.sql.types.BooleanType)
          .add("compacted", org.apache.spark.sql.types.BooleanType)
          .add("expired_versions", IntegerType)
          .add("vacuumed_files", IntegerType)) {
        override def run(in: InternalRow): Seq[Array[Any]] = {
          val root = cat.resolveRoot(in.getUTF8String(0).toString)
          val clusterBy = in.getUTF8String(4).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          val (purged, compacted, expired, vacuumed) =
            GraftTable.maintain(spark, root,
              smallFileRows = in.getLong(1),
              keepVersions = in.getInt(2),
              vacuumMinAgeMs = in.getLong(3),
              clusterBy = clusterBy,
              clusterBits = in.getInt(5),
              clusterMaxFiles = in.getInt(6),
              smallFileBytes = in.getLong(7))
          Seq(Array[Any](purged, compacted, expired.size, vacuumed.size))
        }
      }
  }
}
