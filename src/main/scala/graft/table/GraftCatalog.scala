package graft.table

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [[GraftTable]] as a Spark SQL CATALOG — the surface that makes the
  * table format a first-class SQL citizen instead of a programmatic
  * API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.table.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   spark.sql("CREATE TABLE graft.ns.t (k BIGINT, v STRING)")
  *   spark.sql("INSERT INTO graft.ns.t SELECT ...")
  *   spark.sql("SELECT * FROM graft.ns.t VERSION AS OF 3 WHERE k = 7")
  *   spark.sql("DELETE FROM graft.ns.t WHERE k < 100")
  *   spark.sql("ALTER TABLE graft.ns.t RENAME COLUMN v TO txt")
  * }}}
  *
  * Architecture (all PUBLIC connector APIs — the same integration
  * style the Delta/Iceberg papers describe, none of their code):
  *
  *  - `TableCatalog` + `SupportsNamespaces`: identifiers map to
  *    directories under the configured `warehouse`
  *    (`wh/<ns…>/<table>`); a directory IS a table iff it carries a
  *    `_log`. DDL (create/alter/drop/rename) delegates to the log's
  *    atomic commit protocol, so concurrent DDL/DML resolve by the
  *    same optimistic rule as writes.
  *  - Time travel: `VERSION AS OF n` / `TIMESTAMP AS OF t` arrive via
  *    the two `loadTable` overloads and pin the snapshot; a pinned
  *    table refuses writes.
  *  - Reads: the scan prunes FILES from pushed filters (zone maps +
  *    per-file blooms via [[GraftTable.rangesOf]] — identical
  *    semantics to `scanWhere`) and reports exact-from-metadata
  *    statistics (live row count after pruning), so Catalyst's join
  *    planning sees real sizes (a small graft dim broadcasts without
  *    hints). Data flows through a [[V1Scan]] relation wrapping the
  *    format's own masked/clean reader — DV-masked files, column
  *    mapping, and schema evolution all behave exactly as the
  *    programmatic `read`, and the pushed predicate re-applies INSIDE
  *    the wrapped frame so parquet row-group pushdown still engages.
  *  - Writes: `INSERT INTO` / `INSERT OVERWRITE` / CTAS via the
  *    `V1Write` fallback (`InsertableRelation`) onto
  *    [[GraftTable.append]]/[[GraftTable.overwrite]] — atomic commits,
  *    constraint enforcement, bloom capture included. `DELETE FROM`
  *    via `SupportsDelete` onto the copy-on-write
  *    [[GraftTable.deleteWhereAuto]] with filter-derived pruning;
  *    `TRUNCATE TABLE` via the inherited truncate.
  *
  * Scale posture: every catalog operation is O(log) metadata work on
  * the driver; scans plan only surviving files; statistics come from
  * commit metadata (zero data IO). The warehouse path may live on any
  * Hadoop filesystem (hdfs/s3a/`mocks3://`) — all IO resolves through
  * the path's own FileSystem, and commit atomicity follows the
  * table's [[LogStore]] contract.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'spark.sql.catalog.$name.warehouse'"))
    // A session wired only through spark.sql.extensions=GraftExtensions
    // never runs Engine.buildSession/configure — without this, its
    // V1-bridged catalog scans estimate at defaultSizeInBytes (the
    // stats-blind V1ScanWrapper) and CBO broadcasts go blind. Catalog
    // initialization is the one hook every such session must pass
    // through, and installStatsRule is idempotent.
    graft.Engine.installStatsRule(spark)
  }

  override def name(): String = catalogName

  // ---------- path mapping ----------

  /** One path segment, refused rather than escaped: identifiers are
    * directory names, so separators/parent refs/log-reserved names
    * would smuggle a table outside its namespace dir.
    */
  private def segment(s: String): String = {
    require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
      s != "." && s != ".." && !s.startsWith("_") && !s.startsWith("."),
      s"invalid identifier segment '$s'")
    s
  }

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse))((p, s) => new Path(p, segment(s)))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), segment(ident.name))

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_log"))

  // ---------- functions ----------

  /** The catalog's V2 functions: the partition transforms
    * [[GraftBatchScan]] reports for SPJ (`bucket` and the calendar
    * kinds) — Spark resolves them here when matching the two sides'
    * KeyGroupedPartitionings.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace)
    GraftCatalog.fnNames.map(Identifier.of(namespace, _))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "bucket" => GraftBucketFunction
      case "truncate" => GraftTruncateFunction
      case k if GraftCatalog.timeFnNames.contains(k) => GraftTimeFunction(k)
      // width-pinned SPJ spelling, e.g. truncate_4 (GraftBatchScan
      // reports it so the partition transform carries no literal arg).
      // toIntOption bounds the digit string to Int range and >= 1
      // rejects truncate_0 (floorMod by 0 would throw at ROW
      // evaluation otherwise) — both fall through to the catalog's
      // normal unknown-function error instead of a parse crash.
      case k if k.startsWith("truncate_") &&
          k.drop(9).nonEmpty && k.drop(9).forall(_.isDigit) &&
          k.drop(9).toIntOption.exists(_ >= 1) =>
        GraftTruncateWidthFunction(k.drop(9).toInt)
      case _ => throw new NoSuchFunctionException(ident)
    }

  // ---------- tables ----------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(name() +: namespace)
    fs.listStatus(p).filter(st => st.isDirectory && isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName)).sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    new GraftV2Table(p.toString, ident, asOf = None)
  }

  /** `VERSION AS OF <v>` — pins the snapshot at a log version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft table version must be a log version number, got '$version'")
    }
    new GraftV2Table(p.toString, ident, asOf = Some(v))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds since epoch;
    * [[GraftTable.versionAt]] resolves the last commit at or before
    * it.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val v = GraftTable.versionAt(spark, p.toString, timestamp / 1000L)
    new GraftV2Table(p.toString, ident, asOf = Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(tablePath(ident))

  /** Column DEFAULT values at CREATE TABLE: the analyzer resolves
    * `DEFAULT` in later INSERT/MERGE column lists from the
    * CURRENT_DEFAULT/EXISTS_DEFAULT metadata Spark attaches to the
    * schema — which this catalog persists verbatim in the commit log
    * (and [[GraftCatalog.stripPhys]] preserves), so declaring the
    * capability is sufficient: defaults fill at WRITE time and every
    * stored row is complete. `ALTER TABLE … ADD COLUMN … DEFAULT` is
    * metadata-only too ([[GraftTable.addColumn]]): the folded literal
    * is captured at ALTER time as EXISTS_DEFAULT, pre-ALTER files —
    * which can never contain the column's fresh physical name — are
    * filled at read by Spark's own parquet absent-column fill, and
    * post-ALTER writes store values physically.
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    Set(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)
      .asJava

  /** GENERATED ALWAYS AS columns arrive only through the V2 `Column`
    * overload (`generationExpression()` — the StructType conversion
    * drops it): capture the expressions, delegate to the interface
    * default for the schema conversion (which preserves DEFAULT-value
    * metadata), then persist them; [[GraftTable.writeData]] recomputes
    * the columns on every write, so the ALWAYS contract holds through
    * INSERT, DML rewrites and compaction alike.
    */
  override def createTable(ident: Identifier,
      columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val gen = columns.flatMap(c =>
      Option(c.generationExpression()).map(c.name -> _)).toMap
    val t = super.createTable(ident, columns, partitions, properties)
    if (gen.nonEmpty)
      GraftTable.setGenerated(spark, tablePath(ident).toString, gen)
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // validate properties BEFORE the table exists: a bad value must
    // not leave a half-created zombie the corrected re-run trips over
    Option(properties.get("delete.mode")).foreach(m =>
      require(GraftTable.DeleteModes(m.trim),
        s"delete.mode must be cow | dv | auto, got '$m'"))
    val p = tablePath(ident)
    if (partitions.isEmpty) GraftTable.create(spark, p.toString, schema)
    else
      // `PARTITIONED BY (days(ts), bucket(16, id), …)` — hidden
      // transform partitioning ([[Partitioning]]); identity columns
      // stay DATA columns (tuples live in commit metadata), so the
      // user's schema is exactly what they declared
      GraftTable.createPartitioned(spark, p.toString, schema,
        partitions.toSeq.map(GraftCatalog.fromTransform))
    // table-level tuning knobs travel as properties
    Option(properties.get("bloom.columns")).foreach(cs =>
      GraftTable.setBloomColumns(spark, p.toString,
        cs.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
    Option(properties.get("ndv.columns")).foreach(cs =>
      GraftTable.setNdvColumns(spark, p.toString,
        cs.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
    Option(properties.get("delete.mode")).foreach(m =>
      GraftTable.setDeleteMode(spark, p.toString, m.trim))
    new GraftV2Table(p.toString, ident, asOf = None)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTableDir(p)) throw new NoSuchTableException(ident)
    val root = p.toString
    changes.foreach {
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1,
          "graft tables support adding top-level columns only")
        require(c.isNullable,
          "a column added to existing rows must be nullable")
        // ADD COLUMN … DEFAULT with EXISTS_DEFAULT semantics: the
        // analyzer has already constant-folded the DEFAULT clause
        // into a connector Literal — capture it ONCE, as of now
        // (later changes to the default never rewrite history), and
        // let the read schema's EXISTS_DEFAULT fill pre-ALTER files
        val default = Option(c.defaultValue()).map { dv =>
          val lit = org.apache.spark.sql.catalyst.expressions.Literal(
            dv.getValue.value, dv.getValue.dataType)
          val cur = Option(dv.getSql).getOrElse(lit.sql)
          (cur, lit.sql)
        }
        GraftTable.addColumn(spark, root, c.fieldNames.head, c.dataType,
          default)
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "graft tables support renaming top-level columns only")
        GraftTable.renameColumn(spark, root, c.fieldNames.head, c.newName)
      // `ALTER TABLE t ALTER COLUMN x TYPE BIGINT` — lossless numeric
      // widening only (metadata-only; readers promote old files)
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1,
          "graft tables support widening top-level columns only")
        GraftTable.widenColumn(spark, root, c.fieldNames.head, c.newDataType)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "graft tables support dropping top-level columns only")
        GraftTable.dropColumn(spark, root, c.fieldNames.head)
      case c: TableChange.SetProperty if c.property == "bloom.columns" =>
        GraftTable.setBloomColumns(spark, root,
          c.value.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      // per-file HLL NDV sketches on subsequent writes → CBO
      // distinctCount ([[GraftColumnStats]]):
      //   ALTER TABLE t SET TBLPROPERTIES('ndv.columns' = 'id,user')
      case c: TableChange.SetProperty if c.property == "ndv.columns" =>
        GraftTable.setNdvColumns(spark, root,
          c.value.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      // DELETE execution mode: cow (default) | dv | auto (cost-based
      // DV-vs-CoW from the stats layer's match estimate):
      //   ALTER TABLE t SET TBLPROPERTIES('delete.mode' = 'auto')
      case c: TableChange.SetProperty if c.property == "delete.mode" =>
        GraftTable.setDeleteMode(spark, root, c.value.trim)
      // CHECK constraints as SQL DDL:
      //   ALTER TABLE t SET   TBLPROPERTIES('constraint.<n>' = '<expr>')
      //   ALTER TABLE t UNSET TBLPROPERTIES('constraint.<n>')
      // merged into the table's declared constraint set — every later
      // INSERT/MERGE batch is gated by enforceConstraints (a violating
      // batch refuses atomically with per-constraint counts)
      case c: TableChange.SetProperty
          if c.property.startsWith("constraint.") =>
        val cn = c.property.stripPrefix("constraint.")
        require(cn.nonEmpty, "empty constraint name")
        GraftTable.setConstraints(spark, root,
          GraftTable.constraintsOf(spark, root) + (cn -> c.value))
      case c: TableChange.RemoveProperty
          if c.property.startsWith("constraint.") =>
        GraftTable.setConstraints(spark, root,
          GraftTable.constraintsOf(spark, root)
            - c.property.stripPrefix("constraint."))
      case other => throw new UnsupportedOperationException(
        s"graft catalog does not support table change $other")
    }
    new GraftV2Table(root, ident, asOf = None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTableDir(p)) false else fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdentRaw: Identifier): Unit = {
    // `ALTER TABLE cat.ns.t RENAME TO cat.ns.t2` hands the DESTINATION
    // through un-stripped — the leading catalog segment stays in the
    // namespace. A rename cannot cross catalogs, so strip it.
    val newIdent =
      if (newIdentRaw.namespace.headOption.contains(catalogName))
        Identifier.of(newIdentRaw.namespace.drop(1), newIdentRaw.name)
      else newIdentRaw
    if (!isTableDir(tablePath(oldIdent)))
      throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val target = tablePath(newIdent)
    fs.mkdirs(target.getParent)
    require(fs.rename(tablePath(oldIdent), target),
      s"rename ${oldIdent} -> ${newIdent} failed")
  }

  // ---------- namespaces ----------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(st => st.isDirectory && !isTableDir(st.getPath) &&
        !st.getPath.getName.startsWith("_"))
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val p = nsPath(namespace)
      if (!fs.exists(p)) throw new NoSuchNamespaceException(name() +: namespace)
      fs.listStatus(p)
        .filter(st => st.isDirectory && !isTableDir(st.getPath) &&
          !st.getPath.getName.startsWith("_"))
        .map(st => namespace :+ st.getPath.getName)
    }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    val p = nsPath(namespace)
    if (!fs.exists(p) || isTableDir(p))
      throw new NoSuchNamespaceException(name() +: namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> p.toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    require(!fs.exists(p), s"namespace ${namespace.mkString(".")} exists")
    fs.mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) false
    else {
      require(cascade || fs.listStatus(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(p, true)
    }
  }
  // ---------- procedures (SQL CALL surface) ----------

  /** Maintenance verbs as `CALL <catalog>.system.<proc>(…)` — the
    * standard DSv2 procedure surface (the `CALL` statement Spark 4
    * resolves through `ProcedureCatalog`), so layout and retention
    * management need no side API:
    *
    * {{{
    *   CALL gcat.system.optimize(`table` => 'ns.t',
    *                             zorder_by => 'x,y', target_files => 4)
    *   CALL gcat.system.vacuum(`table` => 'ns.t')
    *   CALL gcat.system.history(`table` => 'ns.t')
    *   CALL gcat.system.expire_versions(`table` => 'ns.t', keep => 10)
    * }}}
    *
    * Each runs the table format's own O(debt) maintenance primitive
    * (incremental Z-order / compaction, vacuum, log expiry) and
    * returns its result as rows via a driver-local scan.
    */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace.mkString(".")}")
    GraftProcedures(this, ident.name)
  }

  /** Resolve a procedure's `table` argument ('t' or 'ns1.ns2.t',
    * relative to THIS catalog) to the table root path.
    */
  private[table] def resolveRoot(tableArg: String): String = {
    val parts = tableArg.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    val p = tablePath(ident)
    require(isTableDir(p), s"no graft table at $tableArg")
    p.toString
  }

  /** Directory a NEW table identifier would occupy (clone targets) —
    * same mapping as [[resolveRoot]] minus the existence gate; refuses
    * an identifier that already IS a table so a clone can never
    * silently land inside one.
    */
  private[table] def resolveNewRoot(tableArg: String): String = {
    val parts = tableArg.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    val p = tablePath(ident)
    require(!isTableDir(p), s"graft table already exists at $tableArg")
    p.toString
  }
}

/** One graft table (optionally pinned `AS OF` a version) behind the
  * connector `Table` API. The snapshot resolves lazily ONCE per
  * `loadTable` — analysis and execution of one query see one
  * consistent version, the next query re-loads and sees new commits.
  *
  * Streaming reads by NAME (`spark.readStream.table("cat.ns.t")`)
  * resolve through [[V2TableWithV1Fallback]]: the analyzer hands the
  * returned [[CatalogTable]] to the V1 `DataSource` machinery, which
  * instantiates [[GraftTableSourceProvider]] on the table root — the
  * same log-version-offset source (and exactly-once contract) as the
  * path-spelled `readStream.format("grafttable")`, now the way a SQL
  * user actually consumes the table. (The Delta connector wires its
  * streaming source through this identical bridge.)
  */
class GraftV2Table(val root: String, ident: Identifier,
    asOf: Option[Long]) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with org.apache.spark.sql.graftshim.GraftV1FallbackTable {

  private def spark: SparkSession = SparkSession.active

  private[table] lazy val snap: GraftTable.Snapshot =
    GraftTable.snapshot(spark, root, asOf)

  override def name(): String = ident.toString

  /** The LOGICAL schema: the column-mapping physical names are an
    * internal detail, stripped so DESCRIBE/INSERT see clean columns.
    */
  override def schema(): StructType = GraftCatalog.stripPhys(snap.schema)

  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION turns `MERGE … WITH SCHEMA EVOLUTION`
    // on: Spark's ResolveMergeIntoSchemaEvolution derives the ADDITIVE
    // changes (new nullable top-level columns assigned by the merge)
    // and routes them through this catalog's own alterTable → one
    // addColumn commit — type conflicts and nested changes keep
    // refusing there, so evolution can only widen, never rewrite.
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  /** Declared transform partitioning — drives `DESCRIBE`'s partition
    * section and Spark's dynamic-overwrite routing.
    */
  override def partitioning(): Array[Transform] =
    snap.spec.map(GraftCatalog.toTransform).toArray

  override def properties(): util.Map[String, String] =
    (Map("provider" -> "graft", "location" -> root,
      "version" -> snap.version.toString,
      "numFiles" -> snap.files.size.toString) ++
      (if (snap.spec.isEmpty) Map.empty[String, String]
       else Map("partition.spec" ->
         snap.spec.map(_.describe).mkString(", "))) ++
      // declared CHECK constraints and generated columns surface as
      // properties, so DESCRIBE EXTENDED / SHOW TBLPROPERTIES list
      // what gates and what computes on writes
      GraftTable.constraintsOf(spark, root)
        .map { case (n, e) => s"constraint.$n" -> e } ++
      GraftTable.generatedOf(spark, root)
        .map { case (n, e) => s"generated.$n" -> e }).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftScanBuilder(spark, root, snap)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty,
      s"cannot write to $name() pinned AS OF version ${asOf.get}")
    new GraftWriteBuilder(root)
  }

  /** The V1 descriptor the streaming resolver falls back to. Only
    * consulted for `readStream.table(...)` — batch reads stay on the
    * V2 scan with its pruning/stats/agg pushdown.
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    require(asOf.isEmpty,
      s"cannot stream ${name()} pinned AS OF version ${asOf.get} " +
        "(a pinned snapshot has no future commits to consume)")
    CatalogTable(
      identifier = TableIdentifier(ident.name,
        Some(ident.namespace.mkString(".")).filter(_.nonEmpty)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new Path(root).toUri),
        properties = Map("path" -> root)),
      schema = schema(),
      provider = Some("grafttable"))
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean = {
    require(asOf.isEmpty,
      s"cannot delete from $name() pinned AS OF version ${asOf.get}")
    filters.forall(f => FilterSql.translate(f).isDefined)
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = FilterSql.conjunction(filters.toSeq).getOrElse("true")
    GraftTable.deleteWhereAuto(spark, root, cond)
  }

  override def toString: String = s"GraftV2Table($name)"
}

object GraftCatalog {

  /** V2 function names the catalog serves (the SPJ transforms). */
  private[table] val timeFnNames =
    Set("days", "hours", "months", "years")
  private[table] val fnNames: Array[String] =
    ("bucket" +: "truncate" +: timeFnNames.toSeq.sorted).toArray

  /** Spark connector `Transform` → graft [[Partitioning.PTransform]]
    * (the `PARTITIONED BY` clause's shapes). Matched on the public
    * `Transform`/`NamedReference`/`Literal` interfaces only —
    * `FieldReference` et al. are `private[sql]`.
    */
  private[table] def fromTransform(t: Transform): Partitioning.PTransform = {
    import org.apache.spark.sql.connector.expressions.{Literal => VLit, NamedReference}
    def col(): String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"partition transform ${t.describe} must reference one " +
          "top-level column")
      refs.head.fieldNames.head
    }
    def intArg(): Int = t.arguments().collectFirst {
      case l: VLit[_] => l.value() match {
        case n: Number => n.intValue
        case v => sys.error(s"${t.name}: non-numeric argument $v")
      }
    }.getOrElse(sys.error(s"${t.name} needs a numeric argument"))
    t.name() match {
      case "identity" => Partitioning.PIdentity(col())
      case "days" => Partitioning.PDays(col())
      case "hours" => Partitioning.PHours(col())
      case "months" => Partitioning.PMonths(col())
      case "years" => Partitioning.PYears(col())
      case "bucket" => Partitioning.PBucket(col(), intArg())
      case "truncate" => Partitioning.PTruncate(col(), intArg())
      case other => throw new UnsupportedOperationException(
        s"graft tables do not support partition transform '$other' " +
          "(have: identity, days, hours, months, years, bucket, truncate)")
    }
  }

  /** The inverse — reported back through `Table.partitioning()`. */
  private[table] def toTransform(p: Partitioning.PTransform): Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    p match {
      case Partitioning.PIdentity(c) => Expressions.identity(c)
      case Partitioning.PDays(c) => Expressions.days(c)
      case Partitioning.PHours(c) => Expressions.hours(c)
      case Partitioning.PMonths(c) => Expressions.months(c)
      case Partitioning.PYears(c) => Expressions.years(c)
      case Partitioning.PBucket(c, n) => Expressions.bucket(n, c)
      case Partitioning.PTruncate(c, w) =>
        Expressions.apply("truncate",
          Expressions.literal(w), Expressions.column(c))
    }
  }

  private[table] def stripPhys(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val m = new MetadataBuilder().withMetadata(f.metadata)
        .remove("graftPhys").build()
      StructField(f.name, f.dataType, f.nullable, m)
    })
}

/** Scan planning: collects pruned columns + pushed filters, then
  * builds a [[GraftScan]]. Filters translate ONCE to SQL text
  * ([[FilterSql]]); the text drives file pruning (re-parsed by
  * [[GraftTable.rangesOf]] — byte-identical semantics to `scanWhere`)
  * and re-applies inside the wrapped frame, so `pushedFilters` are
  * fully handled at the source and Spark elides its own copy.
  */
class GraftScanBuilder(spark: SparkSession, root: String,
    snap: GraftTable.Snapshot) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = GraftCatalog.stripPhys(snap.schema)
  private var pushed: Array[Filter] = Array.empty
  private var pushedSql: Option[String] = None
  private var aggResult: Option[(StructType, Array[Any])] = None

  /** Storage-partitioned-join path ([[GraftSpj]]): opted in by conf
    * and possible for this snapshot. Decided once — `pushFilters`,
    * `pushedFilters` and `build` must agree within one planning pass.
    */
  private val spj = GraftSpj.eligible(spark, snap)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) =
      filters.partition(f => FilterSql.translate(f).isDefined)
    pushed = ok
    pushedSql = FilterSql.conjunction(ok.toSeq)
    // SPJ path: translated filters still drive FILE PRUNING, but all
    // of them return as residual — Spark re-evaluates above the scan,
    // so correctness never depends on the per-row batch reader
    if (spj) filters else residual
  }

  override def pushedFilters(): Array[Filter] =
    if (spj) Array.empty else pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- metadata-only aggregates -------------------------------------
  // COUNT(*) / COUNT(col) / MIN(col) / MAX(col) with no filter and no
  // grouping are answered from COMMIT METADATA alone — zero data IO,
  // zero tasks over data files: at 100 TB, `SELECT COUNT(*) FROM t` is
  // a log read. Strictly conservative refusals keep it exact:
  //  - any pushed filter or GROUP BY → no pushdown (file-level stats
  //    cannot see row-level predicates);
  //  - COUNT(*) tolerates deletion vectors unconditionally (live =
  //    rows − masked, both recorded per commit); COUNT(col)/MIN/MAX
  //    tolerate a DV only when its commit refreshed the file's stats
  //    over the survivors (AddFile.dvStats — every DV commit does
  //    since the refresh landed; pre-refresh masked files refuse);
  //  - MIN/MAX only on numeric/temporal stats ("i64"/"f64"): parquet
  //    STRING bounds may be truncated — conservative for skipping,
  //    WRONG as exact extremes; a file missing the column's stats
  //    (e.g. NaN-polluted doubles, added-later columns) refuses.
  //    Fully-masked files (zero live rows) are skipped, not consulted.

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    metadataAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    metadataAgg(agg) match {
      case Some(r) => aggResult = Some(r); true
      case None => false
    }

  private def metadataAgg(agg: Aggregation)
      : Option[(StructType, Array[Any])] = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    val files = snap.files
    def liveOf(f: GraftTable.AddFile): Long =
      f.rows - f.dv.map(_.rows).getOrElse(0L)
    // files with live rows are the only ones that can contribute to
    // COUNT(col)/MIN/MAX; their stats are trusted iff unmasked or
    // refreshed over survivors at the DV commit
    val liveFiles = files.filter(liveOf(_) > 0)
    val dvOk = liveFiles.forall(f => f.dv.isEmpty || f.dvStats)
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        snap.schema.fields.find(_.name == f.fieldNames.head)
      case _ => None
    }
    def statsFor(name: String): Option[Seq[GraftTable.ColStats]] = {
      val ss = liveFiles.flatMap(f => f.stats.get(name))
      if (ss.length == liveFiles.length) Some(ss) else None // every live file
    }
    /** internal-row value of a stats bound for the column's type */
    def internal(f: StructField, v: Any): Option[Any] = {
      import org.apache.spark.sql.types._
      (f.dataType, v) match {
        case (LongType, l: Long) => Some(l)
        case (IntegerType, l: Long) => Some(l.toInt)
        case (ShortType, l: Long) => Some(l.toShort)
        case (ByteType, l: Long) => Some(l.toByte)
        case (DateType, l: Long) => Some(l.toInt)
        case (TimestampType, l: Long) => Some(l)
        case (TimestampNTZType, l: Long) => Some(l)
        case (DoubleType, d: Double) => Some(d)
        case (FloatType, d: Double) => Some(d.toFloat)
        case _ => None
      }
    }
    val out = agg.aggregateExpressions.map {
      case _: CountStar =>
        val live = files.map(_.rows).sum - files.flatMap(_.dv.map(_.rows)).sum
        Some((StructField("count_star", org.apache.spark.sql.types.LongType,
          nullable = false), live: Any))
      case c: Count if !c.isDistinct && dvOk =>
        colOf(c.column).flatMap { f =>
          statsFor(f.name).map { ss =>
            val nonNull = liveFiles.map(liveOf).sum - ss.map(_.nulls).sum
            (StructField(s"count_${f.name}",
              org.apache.spark.sql.types.LongType, nullable = false),
              nonNull: Any)
          }
        }
      case m: Min if dvOk =>
        colOf(m.column).flatMap { f =>
          statsFor(f.name).flatMap { ss =>
            if (liveFiles.isEmpty) Some((StructField(s"min_${f.name}",
              f.dataType), null: Any))
            else if (ss.exists(s => s.tpe != "i64" && s.tpe != "f64") ||
              ss.map(_.tpe).distinct.size != 1) None // one comparator must fit ALL files
            else {
              val m0 = ss.map(_.min).reduce((a, b) =>
                if (GraftTable.cmpPublic(ss.head.tpe, a, b) <= 0) a else b)
              internal(f, m0).map(v =>
                (StructField(s"min_${f.name}", f.dataType), v))
            }
          }
        }
      case m: Max if dvOk =>
        colOf(m.column).flatMap { f =>
          statsFor(f.name).flatMap { ss =>
            if (liveFiles.isEmpty) Some((StructField(s"max_${f.name}",
              f.dataType), null: Any))
            else if (ss.exists(s => s.tpe != "i64" && s.tpe != "f64") ||
              ss.map(_.tpe).distinct.size != 1) None // one comparator must fit ALL files
            else {
              val m0 = ss.map(_.max).reduce((a, b) =>
                if (GraftTable.cmpPublic(ss.head.tpe, a, b) >= 0) a else b)
              internal(f, m0).map(v =>
                (StructField(s"max_${f.name}", f.dataType), v))
            }
          }
        }
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else {
      val fields = out.flatten.map(_._1)
      val values = out.flatten.map(_._2)
      Some((StructType(fields), values.toArray))
    }
  }

  override def build(): Scan = aggResult match {
    case Some((schema, values)) =>
      new GraftAggScan(spark, root, snap, schema, values)
    case None if spj =>
      new GraftBatchScan(spark, root, snap, required, pushedSql)
    case None => new GraftScan(spark, root, snap, required, pushedSql)
  }
}

/** A fully-pushed-down aggregate: ONE row from commit metadata, no
  * data file opened.
  */
class GraftAggScan(spark: SparkSession, root: String,
    snap: GraftTable.Snapshot, schema: StructType,
    values: Array[Any]) extends V1Scan {

  override def readSchema(): StructType = schema

  override def description(): String =
    s"GraftAggScan $root v${snap.version} metadata-only " +
      s"[${schema.fieldNames.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val relation = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = GraftAggScan.this.schema
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = {
        val row: org.apache.spark.sql.catalyst.InternalRow =
          new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(values)
        context.sparkSession.sparkContext.parallelize(Seq(row), 1)
          .asInstanceOf[RDD[Row]]
      }
      override def toString: String =
        s"GraftTable($root) metadata-only aggregate"
    }
    relation.asInstanceOf[T]
  }
}

/** The batch scan: file pruning + exact metadata statistics, data via
  * the V1 relation bridge over the format's own reader.
  */
class GraftScan(spark: SparkSession, root: String,
    snap: GraftTable.Snapshot, required: StructType,
    condSql: Option[String]) extends V1Scan with SupportsReportStatistics {

  private lazy val ranges =
    condSql.map(GraftTable.rangesOf(spark, _)).getOrElse(Nil)

  lazy val files: Seq[GraftTable.AddFile] =
    if (ranges.isEmpty) snap.files
    else GraftTable.prunedFilesAll(snap, ranges)

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftScan $root v${snap.version} " +
      s"[files ${files.size}/${snap.files.size}]" +
      condSql.map(s => s" pushed: $s").getOrElse("")

  /** Exact-from-metadata statistics AFTER file pruning: live rows =
    * Σ physical − Σ DV-masked of surviving files. Catalyst's join
    * planning keys broadcast decisions off these sizes; with CBO on,
    * the zone-map-derived column stats ([[GraftColumnStats]]) feed
    * filter-selectivity and join-order estimation too.
    */
  // ONE stats instance per scan: planning asks repeatedly (relation
  // stats, the stats-rule rewrite, AQE's initial plan) and the column
  // fold + histogram props read must not repeat per ask
  private lazy val v2Statistics: Statistics = new Statistics {
    private val hists = GraftTable.histogramsOf(spark, root)
    // pushed ranges are re-applied by the reader and never survive as
    // a Filter node above this scan, so the row ESTIMATE carries their
    // selectivity — histogram bins where analyzed (skew-aware),
    // zone-map uniformity otherwise (exact live counts when nothing
    // is pushed)
    private val rows = GraftColumnStats.estimateRows(files, ranges, hists)
    private lazy val cols = GraftColumnStats.of(snap, files, required,
      hists)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * math.max(1, required.defaultSize).toLong)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    override def columnStats(): util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = cols
  }

  override def estimateStatistics(): Statistics = v2Statistics

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftV1Relation(context, root, snap, required, condSql, files)
      .asInstanceOf[T]
}

/** The V1 bridge relation. `buildScan` assembles the format's masked
  * read over the PRUNED file set, re-applies the pushed predicate
  * (inside the frame → parquet row-group pushdown engages), and
  * projects the required columns. `needConversion = false` with the
  * inner plan's InternalRow RDD — the JDBC-connector discipline — so
  * rows cross the bridge without a Row materialization pass.
  */
class GraftV1Relation(context: SQLContext, root: String,
    snap: GraftTable.Snapshot, required: StructType,
    condSql: Option[String], files: Seq[GraftTable.AddFile])
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context
  override def schema: StructType = required
  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] = {
    val base = GraftTable.readFiles(context.sparkSession, root, snap, files)
    val filtered = condSql.map(base.filter).getOrElse(base)
    val projected =
      if (required.isEmpty)
        filtered.select()
      else
        filtered.select(required.fieldNames.toSeq.map(
          org.apache.spark.sql.functions.col): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** Shown as the scan node in `explain` — surfaces the file-pruning
    * ratio and the pushed predicate, the two things a plan reader
    * needs to verify skipping engaged.
    */
  override def toString: String =
    s"GraftTable($root) v${snap.version} " +
      s"[files ${files.size}/${snap.files.size}]" +
      condSql.map(s => s" pushed: $s").getOrElse("")
}

/** `INSERT INTO` appends; `INSERT OVERWRITE`/CTAS-replace truncates
  * then writes; `INSERT INTO … REPLACE WHERE <pred>` (and
  * `df.writeTo(t).overwrite(cond)`) lands as ONE predicate-scoped
  * copy-on-write commit ([[GraftTable.replaceWhere]] — the
  * slice-reingestion verb). All through the table's atomic commit, so
  * a failed query leaves no partial state. Only predicates
  * [[FilterSql]] can express are accepted (`canOverwrite` refuses the
  * rest — Spark raises its own clear error instead of a silently
  * wrong slice).
  */
class GraftWriteBuilder(root: String) extends WriteBuilder
    with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  // NOTE on dynamic partition overwrite: Spark only plans
  // OverwritePartitionsDynamic for tables declaring the
  // OVERWRITE_DYNAMIC capability, and executes it exclusively through
  // the V2 batch-writer path (there is no OverwritePartitionsDynamic
  // V1 fallback exec) — so on this V1-write bridge, dynamic-mode
  // INSERT OVERWRITE degrades to the static truncate-and-write below.
  // The dynamic verb lives on the API ([[GraftTable
  // .overwritePartitions]]); SQL expresses the same slice semantics
  // with `INSERT INTO … REPLACE WHERE <partition predicate>`.
  private var overwriteAll = false
  private var replaceCond: Option[String] = None

  override def truncate(): WriteBuilder = {
    overwriteAll = true; replaceCond = None; this
  }

  override def canOverwrite(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterSql.translate(f).isDefined)

  override def overwrite(filters: Array[Filter]): WriteBuilder =
    if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
      truncate()
    else {
      replaceCond = Some(FilterSql.conjunction(filters.toSeq).getOrElse(
        throw new UnsupportedOperationException(
          s"graft REPLACE WHERE cannot express ${filters.mkString(", ")}")))
      this
    }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ignored: Boolean): Unit =
          replaceCond match {
            case Some(cond) =>
              GraftTable.replaceWhere(data.sparkSession, root, cond, data)
            case None if overwriteAll =>
              GraftTable.overwrite(data.sparkSession, root, data)
            case None =>
              GraftTable.append(data.sparkSession, root, data)
          }
      }
  }
}
