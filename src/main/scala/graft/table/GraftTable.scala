package graft.table

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal transaction-log table format over parquet — the ACID
  * storage layer a 100 TB pipeline needs under its MERGE / compaction /
  * Z-order / incremental-state operators: atomic multi-file commits,
  * snapshot isolation, time travel, schema evolution, zone-map file
  * skipping, copy-on-write delete, merge-on-read deletion vectors,
  * and idempotent (exactly-once) streaming appends. Same architecture
  * as the published Delta Lake
  * design (Armbrust et al., VLDB 2020): an ordered JSON commit log over
  * immutable data files, with periodic checkpoints so readers replay
  * O(interval) entries, not O(history).
  *
  * Layout under `root/`:
  * {{{
  *   _log/00000000.json        one entry per commit (version = name)
  *   _log/00000010.ckpt.json   full-state checkpoint every N commits
  *   data/<commit-uuid>/part-*.parquet   immutable data files
  * }}}
  *
  * Concurrency: a commit is one write-if-absent publish of a
  * fully-written entry at the next version's reserved name, routed
  * through the pluggable [[LogStore]] for the root's filesystem
  * scheme: `link(2)`-backed conditional create on the local FS
  * (kernel-atomic), HDFS-atomic rename for unregistered schemes, and
  * for object stores a registered conditional-create store
  * ([[ExclusiveCreateLogStore]] — the S3 `If-None-Match: *` shape,
  * exercised against the test suite's `mocks3://` store by the
  * racing-appender stress). A loser's data files become orphans that
  * [[vacuum]] reclaims, and it retries at the next version.
  *
  * Scale posture: log entries carry METADATA only (paths + zone maps),
  * so commit cost is O(files touched), never O(table). Snapshot
  * construction is one directory listing + at most `CkptInterval`
  * JSON entries past the newest checkpoint. File skipping compares
  * query ranges against per-file min/max harvested from parquet
  * FOOTERS at commit time — no data read, and a skipped file is never
  * opened at scan time, which is the difference between "scan 100 TB"
  * and "scan the three files that can match".
  */
object GraftTable {

  /** Checkpoint cadence, in commits. */
  val CkptInterval = 10

  private val mapper = new ObjectMapper()

  // ---------- model ----------

  /** Per-column zone map from the parquet footer. `min`/`max` are the
    * primitive-level values (long / double / string); string bounds
    * are parquet's possibly-TRUNCATED bounds, which stay conservative
    * (parquet increments the last byte when truncating a max).
    */
  final case class ColStats(tpe: String, min: Any, max: Any, nulls: Long)

  /** A deletion vector: `path` (root-relative) of a parquet file of
    * `(file string, pos long)` rows — the deleted ROW POSITIONS of one
    * or more data files — and `rows`, the count of positions belonging
    * to the data file that carries this reference. One DV parquet may
    * serve several data files of the same commit (each filters to its
    * own `file` at read).
    */
  final case class DvRef(path: String, rows: Long)

  /** One immutable data file. `path` is root-relative. `blooms` maps
    * column → base64 [[FileBloom]] bitset (present only for columns
    * declared via [[setBloomColumns]] at write time). `dv` is the
    * file's deletion vector, if a merge-on-read delete has masked rows
    * out ([[deleteWhereDv]]). `dvStats = true` marks `stats` as
    * recomputed over the SURVIVORS at the DV commit (one O(touched)
    * pass): such stats stay exact for metadata COUNT(col)/MIN/MAX
    * pushdown and are TIGHTER zone maps; `dvStats = false` with a DV
    * (pre-refresh generations) means physical-file stats —
    * conservative for pruning, refused for aggregates. Blooms stay
    * those of the PHYSICAL file — conservative, never wrong.
    */
  final case class AddFile(path: String, rows: Long,
      stats: Map[String, ColStats],
      blooms: Map[String, String] = Map.empty,
      dv: Option[DvRef] = None,
      layout: Option[String] = None,
      dvStats: Boolean = false,
      part: Map[String, String] = Map.empty,
      ndv: Map[String, String] = Map.empty,
      bytes: Long = 0L)

  /** The state of the table as of `version`. `txns` maps streaming
    * appId → highest batchId committed (the exactly-once ledger).
    * `spec` is the table's declared partition transforms
    * ([[Partitioning]]) as of this version — seeded at CREATE
    * (`_partspec.json`), replaced atomically by the commit entry that
    * carries an [[evolvePartitioning]] rewrite, empty for an
    * unpartitioned table.
    */
  final case class Snapshot(version: Long, schema: StructType,
      files: Seq[AddFile], txns: Map[String, Long],
      spec: Seq[Partitioning.PTransform] = Nil)

  /** A closed/open range predicate on one top-level column, used for
    * zone-map skipping: `lo <= col <= hi` (either bound optional).
    */
  final case class Range(col: String, lo: Option[Any] = None,
      hi: Option[Any] = None)

  // ---------- public API ----------

  /** Append `df` as one atomic commit.
    *
    * @param txn optional (appId, batchId) exactly-once tag: if the log
    *            already holds a commit for this appId with
    *            batchId >= this one, the append is a no-op (the
    *            foreachBatch re-delivery contract)
    * @return the committed version (or the current one on a txn no-op)
    */
  def append(spark: SparkSession, root: String, df: DataFrame,
      txn: Option[(String, Long)] = None): Long =
    commitRetry(spark, root, op = "append", read = ReadsNothing) { snap =>
      if (txn.exists { case (app, b) => snap.txns.get(app).exists(_ >= b) })
        None // already committed — idempotent replay
      else {
        enforceConstraints(spark, root, df)
        val schema = mergedSchema(snap, df)
        Some((writeData(spark, root, df, schema), Nil, schema, txn))
      }
    }

  /** Create an EMPTY table with a declared schema, as version 0 — a
    * zero-file schema-only commit (the SQL `CREATE TABLE` surface).
    * The declared schema becomes the merge anchor for every later
    * append ([[mergedSchema]]). Fails if the table already exists.
    */
  def create(spark: SparkSession, root: String, schema: StructType): Long = {
    require(schema.nonEmpty, "cannot create a table with an empty schema")
    commitRetry(spark, root, op = "create") { snap =>
      require(snap.version < 0,
        s"GraftTable: table already exists at $root (version ${snap.version})")
      Some((Nil, Nil, schema, None))
    }
  }

  /** Create an empty TRANSFORM-PARTITIONED table ([[Partitioning]]):
    * the spec is validated against the declared schema, written once
    * as `_log/_partspec.json` (immutable for the table's lifetime —
    * the Iceberg partition-spec shape without evolution), and every
    * later write clusters by the partition tuple while every scan,
    * DML prune, and range delete reasons through the transforms.
    */
  def createPartitioned(spark: SparkSession, root: String,
      schema: StructType, spec: Seq[Partitioning.PTransform]): Long = {
    require(schema.nonEmpty, "cannot create a table with an empty schema")
    Partitioning.validate(spec, schema)
    val (fs, logDir) = logFs(spark, root)
    require(!fs.exists(logDir),
      s"GraftTable: table already exists at $root")
    fs.mkdirs(logDir)
    // spec lands BEFORE version 0, so no committed state ever exists
    // without it; a create-create race on one root is a deployment
    // error (create itself already refuses an existing table)
    writeString(fs, new Path(logDir, PartSpecFile), Partitioning.toJson(spec))
    create(spark, root, schema)
  }

  private val PartSpecFile = "_partspec.json"

  /** The CURRENT partition transforms (empty = unpartitioned) —
    * resolved through the tip snapshot so an [[evolvePartitioning]]
    * commit is visible the instant its entry is, in every session.
    */
  def partitionSpecOf(spark: SparkSession, root: String)
      : Seq[Partitioning.PTransform] = snapshot(spark, root).spec

  /** Parsed-spec cache keyed by (qualified path, len, mtime) — the
    * file is immutable, but a dropped-and-recreated table at the same
    * path must never serve the old spec.
    */
  private val specCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      Seq[Partitioning.PTransform]]()

  private def specCached(fs: FileSystem, p: Path,
      st: org.apache.hadoop.fs.FileStatus): Seq[Partitioning.PTransform] = {
    val key = (fs.makeQualified(p).toString, st.getLen,
      st.getModificationTime)
    val hit = specCache.get(key)
    if (hit != null) hit
    else {
      if (specCache.size > 256) specCache.clear()
      val parsed = Partitioning.fromJson(readString(fs, p))
      specCache.put(key, parsed)
      parsed
    }
  }

  /** Widen the schema by one nullable column, as a zero-file
    * metadata-only commit (the SQL `ALTER TABLE … ADD COLUMN`
    * surface). Same physical-name discipline as an append-side
    * widening: the new logical column maps to a FRESH physical name so
    * that re-adding a previously-dropped name can never resurrect the
    * dropped column's data from immutable files. Existing rows read
    * back NULL — unless `default` supplies EXISTS_DEFAULT semantics.
    *
    * @param default optional `(currentDefaultSql, existsDefaultSql)`:
    *   `currentDefaultSql` is the user's DEFAULT expression text (the
    *   analyzer resolves later `INSERT … DEFAULT` references from it),
    *   `existsDefaultSql` the CONSTANT-FOLDED literal captured AT
    *   ALTER TIME. Existing rows are never rewritten: the fresh
    *   physical name is absent from every pre-ALTER file, and the
    *   read schema's EXISTS_DEFAULT metadata makes Spark's parquet
    *   readers fill exactly those absent columns with the literal
    *   (the Delta ADD COLUMN DEFAULT design). Post-ALTER writes store
    *   values physically, so a stored NULL stays NULL, and any
    *   rewrite (compact/CoW) migrates the fill into real bytes.
    */
  def addColumn(spark: SparkSession, root: String, name: String,
      dataType: org.apache.spark.sql.types.DataType,
      default: Option[(String, String)] = None): Long =
    commitRetry(spark, root, op = "add_column") { snap =>
      require(snap.version >= 0, s"GraftTable: no table at $root")
      require(!snap.schema.fieldNames.contains(name),
        s"GraftTable: column '$name' already exists")
      val phys = s"$name-${UUID.randomUUID().toString.take(8)}"
      val mdb = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(PhysKey, phys)
      default.foreach { case (cur, exists) =>
        mdb.putString(CurrentDefaultKey, cur)
        mdb.putString(ExistsDefaultKey, exists)
      }
      val field = org.apache.spark.sql.types.StructField(name, dataType,
        nullable = true, metadata = mdb.build())
      Some((Nil, Nil, snap.schema.add(field), None))
    }

  /** Widening pairs the parquet readers promote natively (probed on
    * Spark 4.1: INT32-class → wider int, FLOAT → DOUBLE). Within one
    * stats class ("i64" / "f64"), so per-file zone maps, metadata
    * aggregates and pruning comparators stay homogeneous across old
    * and new files. Cross-class (int → double) is deliberately OUT:
    * it would mix stats types file-to-file and lose exactness.
    */
  private val widenings: Set[(org.apache.spark.sql.types.DataType,
      org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.types._
    val ints = Seq(ByteType, ShortType, IntegerType, LongType)
    (for {
      (from, i) <- ints.zipWithIndex
      to <- ints.drop(i + 1)
    } yield (from: DataType, to: DataType)).toSet + (FloatType -> DoubleType)
  }

  /** Schema evolution: WIDEN a column's type in one metadata-only
    * commit (the Delta type-widening shape). Existing files keep their
    * narrower physical type — Spark's parquet readers promote at scan
    * time — and new writes land wide. Only [[widenings]] pairs are
    * legal; anything else (narrowing, cross-class, non-numeric)
    * refuses.
    */
  def widenColumn(spark: SparkSession, root: String, name: String,
      newType: org.apache.spark.sql.types.DataType): Long =
    commitRetry(spark, root, op = "widen_column") { snap =>
      require(snap.version >= 0, s"GraftTable: no table at $root")
      val i = snap.schema.fieldNames.indexOf(name)
      require(i >= 0, s"GraftTable: no column '$name'")
      val old = snap.schema.fields(i)
      require(widenings.contains((old.dataType, newType)),
        s"GraftTable: cannot change ${old.dataType.simpleString} to " +
          s"${newType.simpleString} — only lossless numeric widening " +
          "within one stats class is supported")
      require(!snap.spec.exists(_.srcCol == name),
        s"GraftTable: '$name' is a partition source column — widening " +
          "would re-key existing partition tuples")
      val fields = snap.schema.fields.clone()
      fields(i) = old.copy(dataType = newType)
      Some((Nil, Nil, org.apache.spark.sql.types.StructType(fields), None))
    }

  /** Replace the whole table content in one atomic commit. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Long =
    commitRetry(spark, root, op = "overwrite") { snap =>
      enforceConstraints(spark, root, df)
      Some((writeData(spark, root, df, df.schema), snap.files.map(_.path),
        df.schema, None))
    }

  /** Predicate-scoped overwrite — the `INSERT INTO … REPLACE WHERE`
    * / dynamic-slice-ingestion verb (the Delta replaceWhere shape):
    * ONE atomic commit that removes every row matching `condSql` and
    * lands `df` in its place. Copy-on-write at file granularity with
    * the same zone-map pruning as [[deleteWhere]] — files provably
    * outside the predicate survive untouched, so re-ingesting one
    * day's slice of a 100 TB table costs O(that slice), not O(table).
    *
    * Contract (also Delta's): every incoming row must itself satisfy
    * the predicate — the commit replaces EXACTLY the predicate's
    * slice, and a row outside it would silently leak into a region
    * readers believe untouched. Violations refuse before anything
    * commits. NULL predicate rows count as NOT matching (kept on the
    * table side, refused on the incoming side).
    */
  def replaceWhere(spark: SparkSession, root: String, condSql: String,
      df: DataFrame): Long =
    commitRetry(spark, root, op = "replace_where") { snap =>
      val bad = df.filter(s"NOT coalesce(($condSql), false)").count()
      require(bad == 0L,
        s"replaceWhere: $bad incoming rows do not satisfy ($condSql)")
      enforceConstraints(spark, root, df)
      val schema = mergedSchema(snap, df)
      val ranges = rangesOf(spark, condSql)
      val touched =
        if (ranges.isEmpty) snap.files else prunedFilesAll(snap, ranges)
      val survivors = readFiles(spark, root, snap, touched)
        .filter(s"NOT coalesce(($condSql), false)")
      val out = survivors.unionByName(df, allowMissingColumns = true)
      Some((writeData(spark, root, out, schema), touched.map(_.path),
        schema, None))
    }

  /** DYNAMIC-PARTITION overwrite (the `INSERT OVERWRITE` +
    * `partitionOverwriteMode=dynamic` verb, Iceberg's "overwrite
    * dynamic"): ONE atomic commit that replaces exactly the partition
    * tuples the incoming batch carries — untouched partitions survive
    * by metadata alone. The touched-tuple set is derived from the
    * batch's own written files (no second pass over the data), so the
    * commit costs O(batch + touched partitions' metadata), never
    * O(table) — the idempotent slice re-ingestion shape at 100 TB.
    */
  def overwritePartitions(spark: SparkSession, root: String,
      df: DataFrame, txn: Option[(String, Long)] = None): Long =
    commitRetry(spark, root, op = "overwrite_partitions") { snap =>
      require(snap.spec.nonEmpty,
        "overwritePartitions needs a partitioned table " +
          "(createPartitioned) — use overwrite/replaceWhere otherwise")
      // after evolvePartitioning, pre-evolution files lack the current
      // tuple — a dynamic overwrite could not replace their rows, so
      // silent drift is REFUSED until a compact/optimize migrates them
      val specKeys = snap.spec.map(_.fieldName).toSet
      require(snap.files.forall(f => specKeys.subsetOf(f.part.keySet)),
        "overwritePartitions on an evolved spec requires migrating " +
          "pre-evolution files first (compact/optimize rewrites them " +
          "under the current spec)")
      if (txn.exists { case (app, b) => snap.txns.get(app).exists(_ >= b) })
        None
      else {
        enforceConstraints(spark, root, df)
        val schema = mergedSchema(snap, df)
        val adds = writeData(spark, root, df, schema)
        // compare tuples PROJECTED onto the current spec: a spec that
        // evolved by dropping a transform leaves migrated files with
        // the old extra key, which must not defeat the match
        def proj(part: Map[String, String]) =
          part.view.filterKeys(specKeys).toMap
        val touched = adds.map(a => proj(a.part)).toSet
        val removes = snap.files.filter(f => touched.contains(proj(f.part)))
        Some((adds, removes.map(_.path), schema, txn))
      }
    }

  /** PARTITION SPEC EVOLUTION (the Iceberg capability the immutable
    * spec lacked): atomically replace the table's transform spec. Pure
    * metadata — no file rewrites. Every file keeps the tuple of the
    * spec it was WRITTEN under: scans stay exact (tuple pruning is
    * per-file and conservatively skips files lacking a field), new
    * writes cluster under the new spec, and any rewrite
    * (compact/optimize/CoW DML) migrates what it touches because
    * [[writeData]] always clusters by the CURRENT spec. Mixed
    * generations fall off the SPJ fast path (its eligibility demands
    * the full current tuple on every file) and refuse
    * [[overwritePartitions]] until migrated — explicit, never silent
    * drift; once a compact/optimize has migrated every file, the
    * table re-qualifies automatically (eligibility is re-derived from
    * each snapshot's file tuples, never latched).
    *
    * Atomicity: the new spec rides INSIDE the commit entry itself
    * (`partSpec`), published through the same [[LogStore]]
    * write-if-absent as every other commit — there is no window where
    * the new spec is live at the old version, two racing evolves
    * serialize like any other commit conflict, time travel reads each
    * version under the spec that was current THEN, and remote
    * sessions see the change through ordinary snapshot replay (no
    * side-file cache to go stale). `_partspec.json` remains only the
    * CREATE-time seed.
    */
  def evolvePartitioning(spark: SparkSession, root: String,
      newSpec: Seq[Partitioning.PTransform]): Long =
    commitRetry(spark, root, newSpec = Some(newSpec), op = "evolve_partitioning") { snap =>
      require(snap.version >= 0, s"GraftTable: no table at $root")
      require(snap.spec.nonEmpty,
        "evolvePartitioning needs a transform-partitioned table " +
          "(createPartitioned)")
      // validated against the schema of the SNAPSHOT the commit wins
      // against — a racing ADD/DROP COLUMN forces re-validation here
      Partitioning.validate(newSpec, snap.schema)
      Some((Nil, Nil, snap.schema, None))
    }

  /** Copy-on-write delete: files whose zone maps PROVE no row matches
    * `condSql` survive untouched; every other file is rewritten without
    * the matching rows. `prune` should be the range form of the
    * condition (pass None to rewrite every file).
    */
  def deleteWhere(spark: SparkSession, root: String, condSql: String,
      prune: Option[Range]): Long =
    deleteWhereRanges(spark, root, condSql, prune.toSeq)

  /** When `delete.mode = auto`, a DELETE whose estimated match
    * fraction (over the touched files' live rows) is at most this
    * takes the merge-on-read DV path; anything wider rewrites CoW.
    * The crossover is a cost model: a DV commit is O(matches) now
    * plus a masked-read tax until `maintain` purges, CoW is O(touched
    * files) now and clean forever — at ~20% masked the rewrite
    * already pays for itself.
    */
  val DvDeleteMaxFraction: Double = 0.2

  /** Declare the table's DELETE execution mode (`delete.mode`):
    * `cow` (default — always rewrite), `dv` (always merge-on-read
    * position deletes), or `auto` (cost-based: the stats layer's
    * match estimate picks DV under [[DvDeleteMaxFraction]], CoW
    * otherwise — the Delta deletion-vectors table-feature shape with
    * the decision automated).
    */
  /** The legal `delete.mode` values — shared with the catalog's
    * pre-create validation (an invalid mode must refuse BEFORE the
    * table directory exists, not leave a half-created zombie).
    */
  val DeleteModes: Set[String] = Set("cow", "dv", "auto")

  def setDeleteMode(spark: SparkSession, root: String, mode: String): Unit = {
    require(DeleteModes(mode),
      s"delete.mode must be cow | dv | auto, got '$mode'")
    updateProps(spark, root)(_.put("deleteMode", mode))
  }

  private[table] def deleteModeOf(spark: SparkSession, root: String): String =
    readProps(spark, root).filter(_.hasNonNull("deleteMode"))
      .map(_.get("deleteMode").asText).getOrElse("cow")

  /** [[deleteWhere]] with the pruning ranges EXTRACTED from the
    * predicate itself ([[rangesOf]] — the `scanWhere` discipline):
    * conjunctive column-vs-literal bounds skip non-overlapping files,
    * everything else just limits pruning. The SQL-surface DML path
    * ([[GraftCatalog]]'s `DELETE FROM`), so the table's `delete.mode`
    * applies here: `auto` prices the predicate against the stats
    * layer ([[GraftColumnStats.estimateRows]] — zone maps, declared
    * ndv, histograms) and takes the DV path for selective deletes.
    */
  def deleteWhereAuto(spark: SparkSession, root: String,
      condSql: String): Long = {
    val ranges = rangesOf(spark, condSql)
    deleteModeOf(spark, root) match {
      case "dv" => deleteWhereDvRanges(spark, root, condSql, ranges)
      case "auto" =>
        val snap = snapshot(spark, root)
        val touched =
          if (ranges.isEmpty) snap.files else prunedFilesAll(snap, ranges)
        val live =
          touched.map(f => f.rows - f.dv.map(_.rows).getOrElse(0L)).sum
        val est = GraftColumnStats.estimateRows(touched, ranges,
          histogramsOf(spark, root))
        // an unprunable predicate estimates at full live rows → CoW
        // (conservative: no claim means no DV bet)
        if (live > 0 && ranges.nonEmpty &&
            est.toDouble / live <= DvDeleteMaxFraction)
          deleteWhereDvRanges(spark, root, condSql, ranges)
        else deleteWhereRanges(spark, root, condSql, ranges)
      case _ => deleteWhereRanges(spark, root, condSql, ranges)
    }
  }

  /** [[deleteWhere]] under a CONJUNCTION of pruning ranges (empty =
    * no pruning, every file is a rewrite candidate).
    */
  def deleteWhereRanges(spark: SparkSession, root: String, condSql: String,
      ranges: Seq[Range]): Long =
    commitRetry(spark, root, op = "delete",
      read = if (ranges.isEmpty) ReadsEverything
             else ReadsRanges(ranges)) { snap =>
      // bloom-aware pruning: a POINT delete (lo == hi) also skips
      // files whose filter proves the key absent — a wrongly-kept
      // file is only an extra rewrite, a wrong skip is impossible
      val touched =
        if (ranges.isEmpty) snap.files else prunedFilesAll(snap, ranges)
      if (touched.isEmpty) None
      else {
        val remaining = readFiles(spark, root, snap, touched)
          .filter(s"NOT ($condSql)")
        Some((writeData(spark, root, remaining, snap.schema),
          touched.map(_.path), snap.schema, None))
      }
    }

  /** Copy-on-write UPDATE … SET … WHERE — the third DML verb next to
    * [[deleteWhere]] and [[merge]]. Files whose zone maps prove no row
    * matches `condSql` survive untouched; every other file is
    * rewritten with the SET expressions applied to matching rows. SQL
    * UPDATE semantics: ALL set expressions evaluate against the
    * PRE-update row (one projection, so a later SET never observes an
    * earlier one), and each updated column casts back to its declared
    * table type — the schema is invariant under update. The change
    * feed surfaces an update as the bag-diff pair (delete of the old
    * row, insert of the new one); untouched carried-over rows cancel.
    * Cost O(files overlapping the predicate range), never O(table).
    *
    * @param sets column → SQL expression over the pre-update row
    */
  def updateWhere(spark: SparkSession, root: String, condSql: String,
      sets: Seq[(String, String)], prune: Option[Range] = None): Long =
    updateWhereRanges(spark, root, condSql, sets, prune.toSeq)

  /** [[updateWhere]] with pruning ranges EXTRACTED from the predicate
    * ([[rangesOf]]) — the SQL-surface `UPDATE` path.
    */
  def updateWhereAuto(spark: SparkSession, root: String, condSql: String,
      sets: Seq[(String, String)]): Long =
    updateWhereRanges(spark, root, condSql, sets, rangesOf(spark, condSql))

  /** [[updateWhere]] under a CONJUNCTION of pruning ranges (empty =
    * every file is a rewrite candidate).
    */
  def updateWhereRanges(spark: SparkSession, root: String, condSql: String,
      sets: Seq[(String, String)], ranges: Seq[Range]): Long =
    commitRetry(spark, root, op = "update",
      read = if (ranges.isEmpty) ReadsEverything
             else ReadsRanges(ranges)) { snap =>
      val unknown = sets.map(_._1).filterNot(snap.schema.fieldNames.contains)
      require(unknown.isEmpty, s"updateWhere: no such column(s) $unknown")
      val touched =
        if (ranges.isEmpty) snap.files else prunedFilesAll(snap, ranges)
      if (touched.isEmpty) None
      else {
        val base = readFiles(spark, root, snap, touched)
        val cond = expr(condSql)
        val out = base.select(snap.schema.fields.map { f =>
          sets.find(_._1 == f.name) match {
            case Some((_, e)) =>
              when(cond, expr(e).cast(f.dataType))
                .otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }.toSeq: _*)
        enforceConstraints(spark, root, out)
        Some((writeData(spark, root, out, snap.schema), touched.map(_.path),
          snap.schema, None))
      }
    }

  /** Range delete with a METADATA-ONLY fast path — the "drop
    * partition" move: every file whose zone map proves ALL its rows
    * fall inside `range` (min ≥ lo, max ≤ hi, zero nulls) is dropped
    * from the log WITHOUT being read or rewritten, and only files
    * PARTIALLY overlapping the range go through the copy-on-write
    * rewrite. On a table laid out by the range column (ingest-ordered
    * appends, [[zorderBy]], or one-file-per-partition-value writes)
    * retiring a day/month/source is O(log metadata) + a rewrite of at
    * most the two boundary files — at 100 TB the difference between a
    * commit that finishes in milliseconds and rewriting terabytes to
    * drop them.
    *
    * Conservative proofs only: string bounds engage the fast path only
    * when pure ASCII (parquet's truncated bounds stay outside-safe:
    * stat-min ≤ true-min and stat-max ≥ true-max, so containment
    * checks against stat bounds imply containment of the true rows);
    * a column with no stats or any nulls always takes the rewrite
    * path. Dropped files surface in the change feed as deletes of
    * every (DV-surviving) row, same as any removed-without-readd file.
    */
  def deleteRange(spark: SparkSession, root: String, range: Range): Long =
    commitRetry(spark, root, op = "delete_range",
      read = ReadsRanges(Seq(range))) { snap =>
      val touched = prunedFilesAll(snap, Seq(range))
      if (touched.isEmpty) None
      else {
        val (dropped, partial) = touched.partition(f =>
          fullyCovered(f, range) ||
            // a partition tuple whose whole source interval sits
            // inside the range proves coverage even when zone maps
            // can't (e.g. parquet-truncated string bounds)
            Partitioning.covers(snap.spec, snap.schema, f.part, range))
        val adds =
          if (partial.isEmpty) Seq.empty[AddFile]
          else writeData(spark, root,
            readFiles(spark, root, snap, partial)
              // coalesce: a NULL range column never matches the delete
              // predicate, so NULL rows SURVIVE (NOT(null) would drop them)
              .filter(s"NOT coalesce((${residual(range)}), false)"),
            snap.schema)
        Some((adds, (dropped ++ partial).map(_.path), snap.schema, None))
      }
    }

  /** Zone-map proof that EVERY row of `f` lies inside `r` — the
    * [[deleteRange]] fast-path test. Inverse-direction conservatism
    * from [[mayMatch]]: here a wrong "true" would drop live rows, so
    * the proof requires stats present, zero nulls, and (for strings)
    * ASCII-pure bounds and probes.
    */
  private[table] def fullyCovered(f: AddFile, r: Range): Boolean =
    f.stats.get(r.col).exists { s =>
      val asciiSafe = s.tpe != "str" ||
        (Seq(s.min, s.max) ++ r.lo ++ r.hi)
          .forall(_.toString.forall(_ < 128))
      asciiSafe && s.nulls == 0 &&
        r.lo.forall(lo => cmp(s.tpe, s.min, lo) >= 0) &&
        r.hi.forall(hi => cmp(s.tpe, s.max, hi) <= 0)
    }

  /** MERGE-ON-READ delete via deletion vectors (the Delta/Iceberg v2
    * "position delete" shape): instead of rewriting every touched
    * file ([[deleteWhere]]'s copy-on-write), the commit writes one
    * small parquet of `(file, pos)` DELETED POSITIONS and re-adds the
    * touched files carrying that reference. Readers apply the mask;
    * the data files are untouched. This is the 100 TB move for
    * selective deletes (GDPR erasure, bad-batch retraction): deleting
    * 0.1% of rows costs O(matches), not a rewrite of every multi-GB
    * file that contains one of them. [[purgeDeletes]] is the
    * compaction that folds masks back into clean files.
    *
    * A re-delete on an already-masked file UNIONS positions (the new
    * DV is self-contained — one reference per file, no chains), and
    * only newly-matched rows count as changes in the CDC feed.
    * Commits where the predicate matches nothing (or only
    * already-deleted rows) are no-ops.
    */
  def deleteWhereDv(spark: SparkSession, root: String, condSql: String,
      prune: Option[Range]): Long =
    deleteWhereDvRanges(spark, root, condSql, prune.toSeq)

  /** [[deleteWhereDv]] under a CONJUNCTION of pruning ranges (empty =
    * every file is a mask candidate) — the `delete.mode = dv/auto`
    * route, which feeds [[rangesOf]]-extracted predicate bounds.
    */
  def deleteWhereDvRanges(spark: SparkSession, root: String,
      condSql: String, ranges: Seq[Range]): Long =
    commitRetry(spark, root, op = "dv_delete",
      read = if (ranges.isEmpty) ReadsEverything
             else ReadsRanges(ranges)) { snap =>
      val touched =
        if (ranges.isEmpty) snap.files else prunedFilesAll(snap, ranges)
      if (touched.isEmpty) None
      else commitDv(spark, root, snap, touched,
        readMasked(spark, root, snap.schema, touched).filter(condSql))
    }

  /** [[deleteWhereDv]] for a KEY SET instead of a predicate — the
    * curation shape ("delete these N duplicate doc ids"): candidate
    * files prune by the key set's [min,max] (plus per-key blooms via
    * the range), and the matches come from a LEFT SEMI join against
    * the key frame — distributed, so the key set can be another
    * DataFrame of any size, not an IN-list. Everything else (position
    * union, CDC exactness, no-op on already-deleted) is the DV commit
    * contract.
    */
  def deleteKeysDv(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String): Long = {
    // the key frame is commit-invariant: bound it ONCE, outside the
    // retry loop — the bounds both prune and declare the read scope
    val mm = keys.agg(min(col(keyCol)), max(col(keyCol))).head
    if (mm.isNullAt(0)) return snapshot(spark, root).version
    val range = Range(keyCol, Some(mm.get(0)), Some(mm.get(1)))
    commitRetry(spark, root, op = "dv_delete",
      read = ReadsRanges(Seq(range))) { snap =>
      val touched = prunedFilesAll(snap, Seq(range))
      if (touched.isEmpty) None
      else commitDv(spark, root, snap, touched,
        readMasked(spark, root, snap.schema, touched)
          .join(keys.select(col(keyCol)).distinct(), Seq(keyCol),
            "left_semi"))
    }
  }

  /** Shared DV-commit body: `matches` are the LIVE rows to mask (with
    * their `__file`/`__pos` identity); returns the commit triple or
    * None when nothing new is masked.
    */
  private def commitDv(spark: SparkSession, root: String, snap: Snapshot,
      touched: Seq[AddFile], matches: DataFrame)
      : Option[(Seq[AddFile], Seq[String], StructType,
        Option[(String, Long)])] = {
    val newDels = matches
      .select(col("__file").as("file"), col("__pos").as("pos"))
    // keyed by the data/<commit>/<part> SUFFIX (what `__file` extracts):
    // for a local file path == suffix; for a [[clone]]d file the
    // AddFile path is absolute into the source tree and only the
    // suffix matches
    val newCounts = newDels.groupBy("file").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (newCounts.isEmpty) None
    else {
      val hit = touched.filter(f => newCounts.contains(fileKey(f.path)))
      // total mask per hit file = old DV rows ∪ new matches (disjoint
      // by construction: `matches` carries only LIVE rows)
      val full = dvFrame(spark, root, hit.filter(_.dv.isDefined))
        .map(_.unionByName(newDels)).getOrElse(newDels)
      // RUN-LENGTH-ENCODE before writing: consecutive positions
      // collapse to (file, pos, run) spans — a wide retraction (drop a
      // whole ingest batch, GDPR-erase a contiguous range) costs
      // O(runs) parquet rows, not one row per masked position; readers
      // expand through [[expandDv]]. The gaps-and-islands window
      // shuffles by FILE (parallel across files), and only the
      // O(runs) span frame funnels into the single output file.
      val wRuns = org.apache.spark.sql.expressions.Window
        .partitionBy("file").orderBy("pos")
      val runs = full
        .withColumn("grp", col("pos") - row_number().over(wRuns))
        .groupBy(col("file"), col("grp"))
        .agg(min("pos").as("pos"), count(lit(1)).as("run"))
        .select("file", "pos", "run")
      val dir = s"data/dv-${UUID.randomUUID().toString}"
      runs.repartition(1).sortWithinPartitions("file", "pos")
        .write.mode(SaveMode.ErrorIfExists)
        .parquet(new Path(root, dir).toString)
      val fs = new Path(root, dir).getFileSystem(hadoopConf(spark))
      val dvFile = fs.listStatus(new Path(root, dir))
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted.head
      val dvPath = s"$dir/$dvFile"
      // refresh each hit file's zone map over its SURVIVORS (one
      // O(touched-files) aggregate, riding the read the mask build
      // already did): the tightened stats keep metadata-only
      // COUNT(col)/MIN/MAX pushdown exact on DV-masked tables
      // (dvStats = true is the trust marker) and sharpen later
      // file pruning — masked extremes no longer hold a file open
      val survStats = survivorStats(spark, root, snap.schema, hit,
        expandDv(spark.read.parquet(new Path(root, dir).toString)))
      val adds = hit.map { f =>
        val total = f.dv.map(_.rows).getOrElse(0L) + newCounts(fileKey(f.path))
        f.copy(dv = Some(DvRef(dvPath, total)),
          stats = survStats.getOrElse(fileKey(f.path), Map.empty),
          dvStats = true)
      }
      Some((adds, hit.map(_.path), snap.schema, None))
    }
  }

  /** Exact per-file column stats over the LIVE rows of `files` under
    * the complete mask `fullDv` (`(file, pos)` rows). Only columns
    * whose type maps onto the zone-map primitive lattice
    * (i64/f64/str) get entries; a column with no live non-null values
    * (or a NaN extreme) is dropped — absent stats are conservative
    * everywhere downstream. A fully-masked file maps to an empty
    * stats map.
    */
  private def survivorStats(spark: SparkSession, root: String,
      schema: StructType, files: Seq[AddFile], fullDv: DataFrame)
      : Map[String, Map[String, ColStats]] = {
    import org.apache.spark.sql.types._
    val cols = schema.fields.filter(f => tpeOfType(f.dataType).isDefined)
    val tagged = taggedRead(spark, root, schema, files.map(_.path))
    val live = tagged.join(broadcast(fullDv),
      tagged("__file") === fullDv("file") && tagged("__pos") === fullDv("pos"),
      "left_anti")
    val aggs = cols.flatMap { f =>
      Seq(min(col(f.name)).as(s"mn_${f.name}"),
        max(col(f.name)).as(s"mx_${f.name}"),
        count(col(f.name)).as(s"ct_${f.name}"))
    } :+ count(lit(1)).as("__live")
    live.groupBy(col("__file")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val liveRows = r.getAs[Long]("__live")
        val stats = cols.flatMap { f =>
          val nonNull = r.getAs[Long](s"ct_${f.name}")
          for {
            tpe <- tpeOfType(f.dataType)
            mn <- statPrim(f.dataType, r.getAs[Any](s"mn_${f.name}"))
            mx <- statPrim(f.dataType, r.getAs[Any](s"mx_${f.name}"))
          } yield f.name -> ColStats(tpe, mn, mx, liveRows - nonNull)
        }.toMap
        r.getAs[String]("__file") -> stats
      }.toMap
  }

  /** The zone-map primitive lattice a Spark type's stats live in. */
  private def tpeOfType(dt: org.apache.spark.sql.types.DataType)
      : Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => Some("i64")
      case DoubleType | FloatType => Some("f64")
      case StringType => Some("str")
      case _ => None
    }
  }

  /** A driver-side aggregate value as its stats primitive — the SAME
    * encoding the parquet-footer capture records (days / micros /
    * double / exact string), so [[cmp]] and pruning see one lattice.
    */
  private def statPrim(dt: org.apache.spark.sql.types.DataType, v: Any)
      : Option[Any] = {
    import org.apache.spark.sql.types._
    (dt, v) match {
      case (_, null) => None
      case (LongType, l: Long) => Some(l)
      case (IntegerType, i: Int) => Some(i.toLong)
      case (ShortType, s: Short) => Some(s.toLong)
      case (ByteType, b: Byte) => Some(b.toLong)
      case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
      case (TimestampType, t: java.sql.Timestamp) =>
        val i = t.toInstant
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        Some(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000L)
      case (DoubleType, d: Double) => if (d.isNaN) None else Some(d)
      case (FloatType, f: Float) =>
        if (f.isNaN) None else Some(f.toDouble)
      case (StringType, s: String) => Some(s)
      case _ => None
    }
  }

  /** Fold deletion vectors back into clean files: every DV-carrying
    * file is rewritten WITHOUT its masked rows (copy-on-write) in one
    * atomic commit; the DV parquets become unreferenced at the tip and
    * are reclaimed by [[vacuum]] once their last referencing log entry
    * expires. O(masked files), not O(table) — the steady-state
    * maintenance pass that bounds read-side mask cost.
    */
  def purgeDeletes(spark: SparkSession, root: String): Long =
    commitRetry(spark, root, op = "purge_deletes",
      read = ReadsOnlyRemoved) { snap =>
      val masked = snap.files.filter(_.dv.isDefined)
      if (masked.isEmpty) None
      else {
        val live = readFiles(spark, root, snap, masked)
        Some((writeData(spark, root, live, snap.schema,
          layoutOnly = true), masked.map(_.path),
          snap.schema, None))
      }
    }

  /** MERGE a changelog into the table as ONE atomic commit — latest
    * version wins per key, `deleteOp` rows tombstone the key, new keys
    * insert ([[graft.operators.Merge.applyChangelog]] semantics).
    *
    * Copy-on-write at FILE granularity: with a single merge key, files
    * whose zone map is disjoint from the changelog's [min,max] key
    * range provably contain no affected key and survive untouched —
    * the merge cost is O(files overlapping the change range), not
    * O(table). Composite keys fall back to a full rewrite.
    */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
      keys: Seq[String], versionCol: String, opCol: String,
      deleteOp: String = "D"): Long = {
    // changelog key bounds are commit-invariant: compute ONCE outside
    // the retry loop; they both prune and declare the read scope for
    // lost-race admission (a merge losing to a key-disjoint commit
    // re-publishes instead of re-running its rewrite)
    val keyRange: Option[Option[Range]] =
      if (keys.size != 1) None
      else {
        val k = keys.head
        val mm = changes.agg(min(col(k)), max(col(k))).head
        Some(if (mm.isNullAt(0)) None
        else Some(Range(k, Some(mm.get(0)), Some(mm.get(1)))))
      }
    val read = keyRange match {
      case None => ReadsEverything // composite keys: full rewrite
      case Some(None) => ReadsNothing // empty changelog
      case Some(Some(r)) => ReadsRanges(Seq(r))
    }
    commitRetry(spark, root, op = "merge", read = read) { snap =>
      val touched = keyRange match {
        case None => snap.files
        case Some(None) => Seq.empty
        case Some(Some(r)) => prunedFilesAll(snap, Seq(r))
      }
      val target = readFiles(spark, root, snap, touched)
      val merged = graft.operators.Merge
        .applyChangelog(target, changes, keys, versionCol, opCol, deleteOp)
      enforceConstraints(spark, root, merged)
      Some((writeData(spark, root, merged, snap.schema), touched.map(_.path),
        snap.schema, None))
    }
  }

  /** Tri-clause MERGE INTO — the general DML verb over the table
    * format (the SQL/Delta `MERGE` shape, of which [[merge]]'s
    * changelog apply is the latest-wins special case):
    *
    *   - WHEN MATCHED [AND `matchedDeleteCond`] THEN DELETE
    *   - WHEN MATCHED [AND `matchedUpdateCond`] THEN UPDATE SET …
    *   - WHEN NOT MATCHED [AND `notMatchedInsertCond`] THEN INSERT …
    *   - WHEN NOT MATCHED BY SOURCE [AND `bySourceDelete`] THEN DELETE
    *   - WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …
    *
    * Clause precedence within each match class: delete first, then
    * update, else carry unchanged (the fixed evaluation order;
    * conditions make any other composition expressible). Expression
    * namespace: TARGET columns by their own names, SOURCE non-key
    * columns as `src_<name>` — matched-class conditions and
    * SET/INSERT expressions may read both sides of the match;
    * by-source expressions see TARGET columns only (the source side
    * of an unmatched row is all NULL by construction).
    *
    * Cost note: the by-source clauses quantify over target rows the
    * source does NOT touch, so their presence disables source-range
    * file pruning — the merge reads every live file (the same
    * whole-table scan the Delta clause costs). Without them the
    * O(overlap + source) contract below is unchanged. INSERT expressions cover any subset of
    * non-key columns (the rest land NULL); key columns always take the
    * source key. Every produced value casts to the declared table
    * type, so the schema is invariant.
    *
    * Source keys must be UNIQUE — a target row matched by two source
    * rows has no well-defined result, and like Delta the call REFUSES
    * (one count-distinct pass over the source, O(source)).
    *
    * `txn` is the (appId, batchId) exactly-once tag [[append]] takes:
    * a replayed batch is a commit NO-OP. Non-optional for streaming
    * upserts (foreachBatch + mergeInto): unlike an append, a replayed
    * MERGE is not naturally idempotent (`tc + src_delta` applied twice
    * is wrong), so the ledger is what upgrades the engine's
    * at-least-once re-delivery to exactly-once table contents.
    *
    * Copy-on-write at file granularity, same pruning as [[merge]]:
    * with a single merge key, files zone-map-disjoint from the
    * source's [min,max] key range provably hold no matched row and
    * survive untouched — cost O(files overlapping the change range) +
    * one shuffle join against the source, never O(table). Composite
    * keys rewrite every file. The change feed shows an update as its
    * bag-diff delete+insert pair; carried rows cancel.
    */
  def mergeInto(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String],
      matchedUpdate: Seq[(String, String)] = Nil,
      matchedUpdateCond: Option[String] = None,
      matchedDelete: Option[String] = None,
      notMatchedInsert: Option[Seq[(String, String)]] = None,
      notMatchedInsertCond: Option[String] = None,
      txn: Option[(String, Long)] = None,
      bySourceUpdate: Seq[(String, String)] = Nil,
      bySourceUpdateCond: Option[String] = None,
      bySourceDelete: Option[String] = None): Long = {
    require(matchedUpdate.nonEmpty || matchedDelete.nonEmpty ||
      notMatchedInsert.nonEmpty || bySourceUpdate.nonEmpty ||
      bySourceDelete.nonEmpty, "mergeInto: no clauses given")
    require(keys.nonEmpty, "mergeInto: keys must be non-empty")
    // one aggregate pass: row count, exact key-distinct, and (single
    // key) the source key bounds — commit-invariant, so computed ONCE
    // outside the retry loop; the bounds both prune the rewrite and
    // declare the read scope for lost-race admission (a merge losing
    // to a key-disjoint commit re-publishes instead of re-rewriting)
    val single = keys.size == 1
    val cnts = source.agg(count(lit(1)),
      (count_distinct(struct(keys.map(col): _*)) +:
        (if (single) Seq(min(col(keys.head)), max(col(keys.head)))
         else Nil)): _*).head
    val (srcCount, distinctKeys) = (cnts.getLong(0), cnts.getLong(1))
    require(srcCount == distinctKeys,
      s"mergeInto: source keys must be unique ($srcCount rows, " +
        s"$distinctKeys distinct keys) — a row matched twice is undefined")
    // an empty source is a no-op ONLY without by-source clauses: with
    // them, nothing matches and the by-source verbs apply to EVERY row
    if (srcCount == 0 && bySourceUpdate.isEmpty && bySourceDelete.isEmpty)
      return snapshot(spark, root).version
    val hasBySource = bySourceUpdate.nonEmpty || bySourceDelete.nonEmpty
    // by-source clauses quantify over UNmatched target rows, so the
    // source key range proves nothing about which files they touch
    val srcRange: Option[Range] =
      if (!single || hasBySource || cnts.isNullAt(2)) None
      else Some(Range(keys.head, Some(cnts.get(2)), Some(cnts.get(3))))
    val read: ReadScope =
      if (srcRange.isDefined) ReadsRanges(srcRange.toSeq)
      else if (single && !hasBySource) ReadsNothing // all-NULL keys
      else ReadsEverything
    commitRetry(spark, root, op = "merge_into", read = read) { snap =>
      if (txn.exists { case (app, b) => snap.txns.get(app).exists(_ >= b) })
        None // already committed — idempotent replay (commit no-op)
      else mergeBuild(spark, root, snap, source, keys, srcRange, matchedUpdate,
        matchedUpdateCond, matchedDelete, notMatchedInsert,
        notMatchedInsertCond, txn, bySourceUpdate, bySourceUpdateCond,
        bySourceDelete)
    }
  }

  private def mergeBuild(spark: SparkSession, root: String, snap: Snapshot,
      source: DataFrame, keys: Seq[String], srcRange: Option[Range],
      matchedUpdate: Seq[(String, String)],
      matchedUpdateCond: Option[String],
      matchedDelete: Option[String],
      notMatchedInsert: Option[Seq[(String, String)]],
      notMatchedInsertCond: Option[String],
      txn: Option[(String, Long)],
      bySourceUpdate: Seq[(String, String)] = Nil,
      bySourceUpdateCond: Option[String] = None,
      bySourceDelete: Option[String] = None)
      : Option[(Seq[AddFile], Seq[String], StructType,
        Option[(String, Long)])] = {
      val badSet = (matchedUpdate ++ bySourceUpdate).map(_._1)
        .filterNot(snap.schema.fieldNames.contains)
      require(badSet.isEmpty, s"mergeInto: no such column(s) $badSet")
      val hasBySource = bySourceUpdate.nonEmpty || bySourceDelete.nonEmpty
      // the caller bounded the source ONCE ([[mergeInto]]): Some =
      // prune by the key range; None with a single key and no
      // by-source clause = all-NULL keys (nothing can match — only
      // unmatched-source inserts apply); None otherwise = full scan
      val touched =
        if (keys.size != 1 || hasBySource) snap.files
        else srcRange match {
          case Some(r) => prunedFilesAll(snap, Seq(r))
          case None => Seq.empty
        }
      val src = source.select(keys.map(col) ++ source.columns
        .filterNot(keys.contains).map(c => col(c).as(s"src_$c")): _*)
        .withColumn("__s", lit(true))
      val target = readFiles(spark, root, snap, touched)
        .withColumn("__t", lit(true))
      val j = target.join(src, keys, "full_outer")
      val isT = coalesce(col("__t"), lit(false))
      val isS = coalesce(col("__s"), lit(false))
      val matched = isT && isS
      val doDel = matched && matchedDelete
        .map(c => coalesce(expr(c), lit(false))).getOrElse(lit(false))
      val doUpd = matched && !doDel && lit(matchedUpdate.nonEmpty) &&
        matchedUpdateCond.map(c => coalesce(expr(c), lit(false)))
          .getOrElse(lit(true))
      val doIns = !isT && isS && lit(notMatchedInsert.nonEmpty) &&
        notMatchedInsertCond.map(c => coalesce(expr(c), lit(false)))
          .getOrElse(lit(true))
      // the by-source class: target rows no source key matched
      val unmatched = isT && !isS
      val doDelSrc = unmatched && bySourceDelete
        .map(c => coalesce(expr(c), lit(false))).getOrElse(lit(false))
      val doUpdSrc = unmatched && !doDelSrc && lit(bySourceUpdate.nonEmpty) &&
        bySourceUpdateCond.map(c => coalesce(expr(c), lit(false)))
          .getOrElse(lit(true))
      val inserts = notMatchedInsert.getOrElse(Nil).toMap
      val out = j
        .filter((isT && !doDel && !doDelSrc) || doIns)
        .select(snap.schema.fields.map { f =>
          val base =
            if (keys.contains(f.name)) col(f.name) // using-join: coalesced
            else inserts.get(f.name) match {
              case Some(e) => when(doIns, expr(e).cast(f.dataType))
                .otherwise(col(f.name))
              case None => when(doIns, lit(null).cast(f.dataType))
                .otherwise(col(f.name))
            }
          val withUpd = matchedUpdate.find(_._1 == f.name) match {
            case Some((_, e)) =>
              when(doUpd, expr(e).cast(f.dataType)).otherwise(base)
            case None => base
          }
          (bySourceUpdate.find(_._1 == f.name) match {
            case Some((_, e)) =>
              when(doUpdSrc, expr(e).cast(f.dataType)).otherwise(withUpd)
            case None => withUpd
          }).cast(f.dataType).as(f.name)
        }.toSeq: _*)
      enforceConstraints(spark, root, out)
      Some((writeData(spark, root, out, snap.schema), touched.map(_.path),
        snap.schema, txn))
  }

  /** Re-cluster the table on a Morton key of two non-negative bounded
    * dimensions ([[graft.operators.Layout.zorderKey2]]) — one atomic
    * swap into `targetFiles` range-partitioned files. Afterwards zone
    * maps prune on BOTH columns: the write-time layout move that turns
    * a 100 TB two-dimensional scan into "open the files whose
    * rectangle intersects the query".
    */
  def zorderBy(spark: SparkSession, root: String, xCol: String,
      yCol: String, targetFiles: Int, bits: Int = 16): Long =
    zorderByCols(spark, root, Seq(xCol, yCol), targetFiles, bits)

  /** [[zorderBy]] over N dimensions ([[graft.operators.Layout.zorderKeyN]]):
    * N·bits ≤ 62, so more clustered dimensions trade per-dimension
    * resolution — the standard Z-order budget.
    */
  def zorderByCols(spark: SparkSession, root: String, cols: Seq[String],
      targetFiles: Int, bits: Int = 16): Long =
    commitRetry(spark, root, op = "zorder",
      read = ReadsOnlyRemoved) { snap =>
      val keyed = readFiles(spark, root, snap, snap.files)
        .withColumn("__zkey",
          graft.operators.Layout.zorderKeyN(cols.map(col), bits))
        .repartitionByRange(targetFiles, col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
      // stamped with the spec: a later zorderIncremental with the same
      // (cols, bits) sees these files as already clustered
      Some((writeData(spark, root, keyed, snap.schema,
        Some(layoutSpec(cols, bits)), preserveLayout = true,
        layoutOnly = true),
        snap.files.map(_.path), snap.schema, None))
    }

  /** The layout signature a clustering pass stamps on the files it
    * produces — the convergence marker [[zorderIncremental]] keys on.
    */
  def layoutSpec(cols: Seq[String], bits: Int): String =
    s"z(${cols.mkString(",")})/$bits"

  /** INCREMENTAL Z-order clustering — the O(debt) maintenance form of
    * [[zorderByCols]], for the table a full rewrite can never keep up
    * with. Every file stamped with this spec's [[layoutSpec]] is
    * already clustered and survives untouched; only the DEBT (files
    * from appends, compactions, or a different clustering spec) is
    * read, Z-ordered, and rewritten, stamped with the spec. Repeated
    * passes converge to a fully-stamped table and then no-op (no
    * commit); each append adds O(append) debt, and the next pass costs
    * O(debt) — at 100 TB the difference between a nightly maintenance
    * job and an impossible full re-sort.
    *
    * The result is clustered PER GENERATION, not globally: a debt
    * pass's files may overlap earlier generations in Z-range. Skipping
    * still multiplies, because pruning is per-file zone-map tightness,
    * which each generation has — the same contract as published
    * incremental-clustering designs (Delta OPTIMIZE's incremental
    * mode, liquid clustering).
    *
    * @param maxFiles bound one pass's rewrite to the `maxFiles`
    *   oldest debt files (0 = unbounded) — the knob that makes each
    *   maintenance tick a fixed-size unit of work
    * @return the committed version, or the current one when there is
    *   no debt
    */
  def zorderIncremental(spark: SparkSession, root: String,
      cols: Seq[String], targetFiles: Int, bits: Int = 16,
      maxFiles: Int = 0): Long =
    commitRetry(spark, root, op = "zorder",
      read = ReadsOnlyRemoved) { snap =>
      val spec = layoutSpec(cols, bits)
      val debtAll = snap.files.filterNot(_.layout.contains(spec))
      val debt =
        if (maxFiles > 0) debtAll.take(maxFiles) else debtAll
      if (debt.isEmpty) None
      else {
        val keyed = readFiles(spark, root, snap, debt)
          .withColumn("__zkey",
            graft.operators.Layout.zorderKeyN(cols.map(col), bits))
          .repartitionByRange(targetFiles, col("__zkey"))
          .sortWithinPartitions("__zkey")
          .drop("__zkey")
        Some((writeData(spark, root, keyed, snap.schema, Some(spec),
          preserveLayout = true, layoutOnly = true),
          debt.map(_.path), snap.schema, None))
      }
    }

  /** Rewrite the table into `targetFiles` files (small-file
    * compaction); content-identical, one atomic swap.
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int): Long =
    commitRetry(spark, root, op = "compact",
      read = ReadsOnlyRemoved) { snap =>
      val all = readFiles(spark, root, snap, snap.files)
        .repartition(targetFiles)
      Some((writeData(spark, root, all, snap.schema,
        preserveLayout = true, layoutOnly = true), snap.files.map(_.path),
        snap.schema, None))
    }

  /** PREDICATE-SCOPED compaction (the `OPTIMIZE … WHERE` verb):
    * rewrite only the files whose zone maps / partition tuples overlap
    * `condSql` into `targetFiles`, leaving every provably-disjoint
    * file untouched by reference — re-layouting one hot slice of a
    * 100 TB table costs O(slice), where [[compact]] is O(table).
    * Layout-only: content is carried bit-identical (the predicate
    * SCOPES the work, it never filters rows). No-op when fewer than
    * two files overlap.
    */
  def compactWhere(spark: SparkSession, root: String, condSql: String,
      targetFiles: Int = 1): Long =
    commitRetry(spark, root, op = "compact",
      read = ReadsOnlyRemoved) { snap =>
      val ranges = rangesOf(spark, condSql)
      require(ranges.nonEmpty,
        s"compactWhere: no prunable range in '$condSql' — a predicate " +
          "that scopes nothing would silently compact the whole table; " +
          "use compact() for that")
      val touched = prunedFilesAll(snap, ranges)
      if (touched.size < 2) None
      else {
        val merged = readFiles(spark, root, snap, touched)
          .repartition(targetFiles)
        Some((writeData(spark, root, merged, snap.schema,
          preserveLayout = true, layoutOnly = true),
          touched.map(_.path), snap.schema, None))
      }
    }

  /** PARTIAL compaction: rewrite only the SMALL files into
    * `targetFiles`, leaving every adequately-sized file untouched —
    * the steady-state maintenance move on a table fed by streaming
    * appends, where [[compact]]'s full rewrite would be O(table)
    * every time but the small-file debt is O(recent commits). A file
    * qualifies by ROW count (`minRows`) or — when the log recorded
    * its size — by BYTES (`minBytes`, 0 disables): row counts are a
    * poor smallness proxy on wide schemas (a 50k-row file of document
    * text is not small), and the byte gate is what object-store read
    * amplification actually cares about. Entries predating the bytes
    * field (read back as 0) only qualify via rows — conservative,
    * drained as rewrites stamp sizes. No-op (no new commit) when
    * fewer than two files qualify.
    */
  def compactSmall(spark: SparkSession, root: String, minRows: Long,
      targetFiles: Int = 1, minBytes: Long = 0L): Long =
    commitRetry(spark, root, op = "compact",
      read = ReadsOnlyRemoved) { snap =>
      val small = snap.files.filter(f =>
        f.rows < minRows || (f.bytes > 0 && f.bytes < minBytes))
      if (small.size < 2) None
      else {
        val merged = readFiles(spark, root, snap, small)
          .repartition(targetFiles)
        Some((writeData(spark, root, merged, snap.schema,
          preserveLayout = true, layoutOnly = true),
          small.map(_.path), snap.schema, None))
      }
    }

  /** Log retention: drop every log entry older than the last
    * `keepLast` versions, first anchoring a CHECKPOINT at the new
    * earliest retained version so every retained version still
    * replays in O(interval). Time travel to expired versions becomes
    * an error (their exclusively-referenced data files are reclaimed
    * by the next [[vacuum]]); the live tail is untouched. This is the
    * bound that keeps a long-lived table's log O(retention), not
    * O(lifetime).
    */
  def expireVersions(spark: SparkSession, root: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val (fs, logDir) = logFs(spark, root)
    val tip = snapshot(spark, root).version
    val cutoff = tip - keepLast + 1
    // clamp to what still exists: after a prior expiry at cutoff C, a
    // later call asking to retain MORE than remains computes a cutoff
    // before C — retaining more than exists is a no-op for a
    // maintenance call, not a crash (the checkpoint at the already-
    // expired cutoff could not even be rebuilt)
    val earliest = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json")).map(_.take(8).toLong)
      .minOption.getOrElse(0L)
    if (cutoff <= earliest) return Nil
    writeCheckpoint(spark, root, fs, logDir, cutoff)
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val expired = names.flatMap { n =>
      val v =
        if (n.matches("\\d{8}\\.json")) Some(n.take(8).toLong)
        else if (n.matches("\\d{8}\\.ckpt\\.json")) Some(n.take(8).toLong)
        else None
      v.filter(_ < cutoff).map(_ -> n)
    }
    expired.foreach { case (_, n) => fs.delete(new Path(logDir, n), false) }
    expired.collect { case (v, n) if n.endsWith(".json") &&
      !n.contains("ckpt") => v }.toSeq.distinct.sorted
  }

  /** One-row operational summary of the table — the `DESCRIBE DETAIL`
    * surface an operator points a dashboard at: version, file count,
    * physical vs live row counts, DV mask debt (the [[maintain]]
    * trigger), bytes on disk, small-file debt, declared bloom columns
    * and constraints, and log entry/checkpoint counts. Computed from
    * the LOG plus one file-status listing of the referenced files —
    * zero data IO, O(files) metadata.
    */
  def describeDetail(spark: SparkSession, root: String,
      smallFileRows: Long = 100000L): DataFrame = {
    val snap = snapshot(spark, root)
    val (fs, logDir) = logFs(spark, root)
    val names = if (fs.exists(logDir))
      fs.listStatus(logDir).map(_.getPath.getName) else Array.empty[String]
    val bytes = snap.files.map { f =>
      val p = new Path(root, f.path)
      try p.getFileSystem(hadoopConf(spark)).getFileStatus(p).getLen
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
    val physical = snap.files.map(_.rows).sum
    val masked = snap.files.flatMap(_.dv.map(_.rows)).sum
    import spark.implicits._
    Seq((root, snap.version, snap.files.size.toLong, physical,
      physical - masked, masked, bytes,
      snap.files.count(_.rows < smallFileRows).toLong,
      snap.files.count(_.dv.isDefined).toLong,
      bloomColumns(spark, root).mkString(","),
      tableConstraints(spark, root).map(_._1).mkString(","),
      names.count(_.matches("\\d{8}\\.json")).toLong,
      names.count(_.matches("\\d{8}\\.ckpt\\.json")).toLong,
      snap.txns.size.toLong))
      .toDF("root", "version", "num_files", "physical_rows", "live_rows",
        "masked_rows", "size_bytes", "small_files", "dv_files",
        "bloom_columns", "constraints", "log_entries", "checkpoints",
        "txn_apps")
  }

  /** The table as of `version` (None = latest). */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, root, version)
    readFiles(spark, root, snap, snap.files)
  }

  /** Zone-map-pruned scan: only files whose [min,max] intersects the
    * range are OPENED; the exact residual predicate still applies.
    * Returns the same rows as `read().filter(...)` — the zone maps
    * only decide which files can be skipped without looking.
    */
  def scan(spark: SparkSession, root: String, range: Range,
      version: Option[Long] = None): DataFrame =
    scanAll(spark, root, Seq(range), version)

  /** [[scan]] under a conjunction of ranges ([[prunedFilesAll]]); the
    * exact residual (AND of all bounds) still applies after skipping.
    */
  def scanAll(spark: SparkSession, root: String, ranges: Seq[Range],
      version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, root, version)
    val files = prunedFilesAll(snap, ranges)
    val cond = ranges.map(r => s"(${residual(r)})").mkString(" AND ") match {
      case "" => "true"
      case s => s
    }
    readFiles(spark, root, snap, files).filter(cond)
  }

  /** [[scanAll]] with the ranges EXTRACTED from a SQL predicate — the
    * ergonomic scan path: conjunctive `col <op> literal` bounds
    * (`=`, `<`, `<=`, `>`, `>=`, `BETWEEN`, and `AND`s of them)
    * become zone-map/bloom pruning ranges automatically, everything
    * else stays in the exact residual filter. Extraction is
    * CONSERVATIVE: a sub-expression it can't turn into a bound prunes
    * nothing (ORs, functions, casts) — never wrong, at worst a full
    * scan, and the full predicate always re-applies on the survivors.
    */
  def scanWhere(spark: SparkSession, root: String, condSql: String,
      version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, root, version)
    val files = prunedFilesAll(snap, rangesOf(spark, condSql))
    readFiles(spark, root, snap, files).filter(condSql)
  }

  /** The pruning ranges implied by `condSql`'s conjunctive
    * column-vs-literal comparisons (shared by [[scanWhere]]; exposed
    * for tests).
    */
  def rangesOf(spark: SparkSession, condSql: String): Seq[Range] = {
    val parsed = spark.sessionState.sqlParser.parseExpression(condSql)
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def norm(v: Any): Option[Any] = Option(v) match {
      case Some(u: org.apache.spark.unsafe.types.UTF8String) =>
        Some(u.toString)
      case Some(d: org.apache.spark.sql.types.Decimal) => Some(d.toBigDecimal)
      case other => other
    }
    def lit(e: Expression): Option[Any] = e match {
      case Literal(v, _) => norm(v)
      // type coercion wraps literals in casts (`id < 50` arrives as
      // `id < CAST(50 AS BIGINT)` once analyzed) — fold a constant
      // cast to its value; an ANSI evaluation error just means no
      // pruning bound, never a failed scan
      case c: Cast if c.foldable && c.deterministic =>
        scala.util.Try(c.eval(null)).toOption.flatMap(norm)
      case _ => None
    }
    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case _ => None
    }
    def walk(e: Expression): Seq[Range] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, v) => (attr(a), lit(v)) match {
        case (Some(c), Some(x)) => Seq(Range(c, Some(x), Some(x)))
        case _ => (attr(v), lit(a)) match { // literal = col
          case (Some(c), Some(x)) => Seq(Range(c, Some(x), Some(x)))
          case _ => Nil
        }
      }
      case GreaterThanOrEqual(a, v) => bound(attr(a), lit(v), lo = true) ++
        bound(attr(v), lit(a), lo = false)
      case GreaterThan(a, v) => bound(attr(a), lit(v), lo = true) ++
        bound(attr(v), lit(a), lo = false) // open bound kept closed: conservative
      case LessThanOrEqual(a, v) => bound(attr(a), lit(v), lo = false) ++
        bound(attr(v), lit(a), lo = true)
      case LessThan(a, v) => bound(attr(a), lit(v), lo = false) ++
        bound(attr(v), lit(a), lo = true)
      // BETWEEN parses as the unresolved 'between' function
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts == Seq("between") && f.arguments.size == 3 =>
        (attr(f.arguments(0)), lit(f.arguments(1)), lit(f.arguments(2))) match {
          case (Some(c), lo, hi) if lo.isDefined || hi.isDefined =>
            Seq(Range(c, lo, hi))
          case _ => Nil
        }
      case _ => Nil // OR / functions / anything else: no pruning
    }
    def bound(c: Option[String], v: Option[Any], lo: Boolean): Seq[Range] =
      (c, v) match {
        case (Some(cc), Some(x)) =>
          if (lo) Seq(Range(cc, Some(x), None)) else Seq(Range(cc, None, Some(x)))
        case _ => Nil
      }
    walk(parsed)
  }

  /** Exact row count from METADATA alone: Σ physical rows − Σ masked
    * positions — O(log), zero data IO (every commit recorded both).
    */
  def rowCount(spark: SparkSession, root: String,
      version: Option[Long] = None): Long = {
    val snap = snapshot(spark, root, version)
    snap.files.map(_.rows).sum - snap.files.flatMap(_.dv.map(_.rows)).sum
  }

  /** The file subset a [[scan]] would open — exposed so tests (and
    * operators) can assert skipping, not just result equality. Zone
    * maps prune first; for an exact POINT probe (lo == hi) on a
    * column with per-file Bloom filters ([[setBloomColumns]]), a
    * filter that proves absence skips the file even when its [min,max]
    * spans the probe. Probe hashing mirrors the build side bit-for-bit
    * (see [[FileBloom]]); a type-incompatible probe just skips bloom
    * pruning — conservative, never wrong.
    */
  def prunedFiles(snap: Snapshot, range: Range): Seq[AddFile] =
    prunedFilesAll(snap, Seq(range))

  /** File pruning under a CONJUNCTION of ranges — a file survives only
    * if EVERY range may match it (zone maps + point blooms per range).
    * This is the multi-predicate scan shape: after [[zorderBy]] both
    * clustered dimensions prune independently and the intersection
    * multiplies the skipping.
    */
  def prunedFilesAll(snap: Snapshot, ranges: Seq[Range]): Seq[AddFile] = {
    val withHashes = ranges.map { r =>
      val pointHashes: Option[(Long, Long)] = for {
        lo <- r.lo
        hi <- r.hi
        if lo == hi
        f <- snap.schema.fields.find(_.name == r.col)
        h <- scala.util.Try(FileBloom.probeHashes(lo, f.dataType)).toOption
      } yield h
      (r, pointHashes)
    }
    snap.files.filter { f =>
      // a fully-masked file (every row DV-deleted) provably matches
      // nothing — EXACT to skip, and the only correct call since its
      // survivor stats are empty (no bounds to test)
      f.rows - f.dv.map(_.rows).getOrElse(0L) > 0 &&
      withHashes.forall { case (r, ph) =>
        mayMatch(f, r) &&
        // partition-tuple pruning: the range mapped THROUGH each
        // declared transform on its column vs the file's exact tuple
        // value — composes with (and can out-prune) the zone map
        Partitioning.mayMatch(snap.spec, snap.schema, f.part, r) &&
        (ph match {
          case Some((h1, h2)) => f.blooms.get(r.col).forall(b =>
            FileBloom.contains(FileBloom.fromB64(b), h1, h2))
          case None => true
        })
      }
    }
  }

  /** Current (or as-of) table state. Tolerates one concurrent
    * [[expireVersions]]: expiry writes its cutoff checkpoint FIRST and
    * only then deletes entries one by one, so a reader that listed the
    * log before the checkpoint landed can see an entry vanish
    * mid-replay — one re-list picks up the new checkpoint, which
    * covers the deleted prefix. (The commit path needs no such retry:
    * publishes are rename-atomic.)
    */
  def snapshot(spark: SparkSession, root: String,
      version: Option[Long] = None): Snapshot =
    try snapshotAttempt(spark, root, version)
    catch { case _: java.io.FileNotFoundException =>
      snapshotAttempt(spark, root, version)
    }

  /** Driver-side snapshot cache, keyed by qualified log dir. A hit is
    * validated against the CURRENT listing (tip version plus the tip
    * entry's length+mtime, so a dropped-and-recreated table at the
    * same path can never serve stale state), and a behind-tip hit
    * replays ONLY the new entries on top of the cached state — at a
    * long-lived table the per-query log cost drops from
    * O(commits since checkpoint) to O(new commits), usually zero.
    * Bounded: the process-wide map resets past 256 roots (tests churn
    * temp tables; a real deployment has few).
    */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedSnap]()
  private final case class CachedSnap(snap: Snapshot, tipLen: Long,
      tipMtime: Long)

  /** Clear the snapshot cache (tests; operationally never needed —
    * validation is per-call).
    */
  def invalidateSnapshots(): Unit = snapCache.clear()

  private def snapshotAttempt(spark: SparkSession, root: String,
      version: Option[Long]): Snapshot = {
    val (fs, logDir) = logFs(spark, root)
    if (!fs.exists(logDir))
      return Snapshot(-1L, new StructType(), Nil, Map.empty)
    val statuses = fs.listStatus(logDir)
    // the partition spec rides the listing already fetched — zero
    // extra RPCs for the (common) unpartitioned table
    val spec = statuses.find(_.getPath.getName == PartSpecFile)
      .map(st => specCached(fs, st.getPath, st)).getOrElse(Nil)
    val names = statuses.map(_.getPath.getName)
    val commits = names.filter(_.matches("\\d{8}\\.json"))
      .map(n => n.take(8).toLong).sorted
    val target = version.getOrElse(
      if (commits.isEmpty) -1L else commits.last)
    require(version.forall(commits.contains),
      s"version $version does not exist (have ${commits.length} commits)")

    def replay(from: Snapshot, upto: Long): Snapshot = {
      var schema = from.schema
      // the spec folds forward exactly like the schema: an entry that
      // carries `partSpec` (an evolvePartitioning commit) replaces it
      // from that version on — spec and version are read atomically
      var curSpec = from.spec
      val files = mutable.LinkedHashMap[String, AddFile]()
      from.files.foreach(f => files(f.path) = f)
      val txns = mutable.Map[String, Long](from.txns.toSeq: _*)
      commits.filter(v => v > from.version && v <= upto).foreach { v =>
        val node = mapper.readTree(readString(fs, new Path(logDir, entryName(v))))
        schema = DataType.fromJson(node.get("schema").asText)
          .asInstanceOf[StructType]
        if (node.hasNonNull("partSpec"))
          curSpec = Partitioning.fromJson(node.get("partSpec").asText)
        node.get("removes").elements().asScala
          .foreach(p => files.remove(p.asText))
        node.get("adds").elements().asScala.foreach { f =>
          val af = addFileFrom(f)
          files(af.path) = af
        }
        if (node.hasNonNull("txnApp"))
          txns(node.get("txnApp").asText) = node.get("txnBatch").asLong
      }
      Snapshot(upto, schema, files.values.toSeq, txns.toMap, curSpec)
    }

    def replayFromCheckpoint(): Snapshot = {
      val ckptV = names.filter(_.matches("\\d{8}\\.ckpt\\.json"))
        .map(_.take(8).toLong).filter(_ <= target).sorted.lastOption
      var schema = new StructType(): StructType
      // seed from the create-time spec file; a checkpoint that covers
      // an evolution carries the then-current spec and overrides it
      var ckptSpec = spec
      val files = mutable.LinkedHashMap[String, AddFile]()
      val txns = mutable.Map[String, Long]()
      ckptV.foreach { v =>
        val node = mapper.readTree(readString(fs, new Path(logDir, ckptName(v))))
        schema = DataType.fromJson(node.get("schema").asText)
          .asInstanceOf[StructType]
        if (node.hasNonNull("partSpec"))
          ckptSpec = Partitioning.fromJson(node.get("partSpec").asText)
        node.get("files").elements().asScala.foreach { f =>
          val af = addFileFrom(f)
          files(af.path) = af
        }
        node.get("txns").properties().asScala.foreach { e =>
          txns(e.getKey) = e.getValue.asLong
        }
      }
      replay(Snapshot(ckptV.getOrElse(-1L), schema, files.values.toSeq,
        txns.toMap, ckptSpec), target)
    }

    // tip reads take the cache path; explicit-version reads (time
    // travel) stay checkpoint-anchored
    if (version.isEmpty && commits.nonEmpty) {
      val key = fs.makeQualified(logDir).toString
      val tipSt = statuses.find(_.getPath.getName == entryName(target)).get
      // a cache record is trusted only if the entry of ITS version is
      // still listed with identical length+mtime — a table dropped and
      // recreated at the same path reuses version NUMBERS but never
      // reproduces the old entry's file identity, and an expired entry
      // (not listed) conservatively falls back to checkpoint replay
      val cached = Option(snapCache.get(key)).flatMap { c =>
        statuses.find(_.getPath.getName == entryName(c.snap.version))
          .filter(st => st.getLen == c.tipLen &&
            st.getModificationTime == c.tipMtime)
          .map(_ => c.snap)
      }
      val fresh = cached match {
        case Some(s) if s.version == target => s
        case Some(s) if s.version < target => replay(s, target)
        case _ => replayFromCheckpoint()
      }
      if (snapCache.size > 256) snapCache.clear()
      snapCache.put(key,
        CachedSnap(fresh, tipSt.getLen, tipSt.getModificationTime))
      return fresh
    }

    replayFromCheckpoint()
  }

  /** Row-level change feed between two versions — every data column
    * plus `_change_type` ('insert' | 'delete') and `_commit_version`.
    * An update surfaces as a delete of the old row and an insert of
    * the new one under the same version (the CDC pair convention).
    *
    * Computed per commit from the files that commit TOUCHED, never the
    * table: a pure append reads only its added files, and a
    * copy-on-write commit bag-diffs its added vs removed files, in
    * which every carried-over row cancels — so layout-only commits
    * ([[compact]], [[zorderBy]]) contribute nothing and the cost is
    * O(files touched between the versions), exactly like the commits
    * themselves. DV commits are cheaper still: a file paired on both
    * sides with only its deletion vector changed diffs the POSITION
    * parquets (metadata-scale) and fetches exactly the delta rows —
    * O(changed rows), not O(live rows of the touched files). Needs no
    * change files on disk because CoW commits already preserve both
    * sides' files immutably ([[vacuum]] keeps every log-referenced
    * file alive).
    */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes: fromVersion $fromVersion > toVersion $toVersion")
    val (fs, logDir) = logFs(spark, root)
    val tip = snapshot(spark, root, Some(toVersion)) // validates the bound
    // a side reads LIVE rows: each file's deletion vector (as recorded
    // on that side of the commit — adds carry theirs, removes carry
    // theirs in removeDvs) applies before the bag-diff, so a DV delete
    // commit surfaces exactly its newly-masked rows as deletes
    def readSide(schema: StructType,
        refs: Seq[(String, Option[DvRef])]): DataFrame =
      if (refs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else readMasked(spark, root, schema,
        refs.map { case (p, d) => AddFile(p, 0L, Map.empty, Map.empty, d) })
        .select(schema.fieldNames.map(col).toSeq: _*)
    val perCommit = ((fromVersion + 1) to toVersion).map { v =>
      val node = mapper.readTree(readString(fs, entryOrExpired(fs, logDir, v)))
      val schema = DataType.fromJson(node.get("schema").asText)
        .asInstanceOf[StructType]
      val adds = node.get("adds").elements().asScala
        .map(f => (f.get("path").asText,
          if (f.hasNonNull("dv"))
            Some(DvRef(f.get("dv").get("path").asText,
              f.get("dv").get("rows").asLong))
          else None)).toSeq
      val removeDvs: Map[String, DvRef] =
        if (node.hasNonNull("removeDvs"))
          node.get("removeDvs").properties().asScala.map { e =>
            e.getKey -> DvRef(e.getValue.get("path").asText,
              e.getValue.get("rows").asLong)
          }.toMap
        else Map.empty
      val removes = node.get("removes").elements().asScala
        .map(p => (p.asText, removeDvs.get(p.asText))).toSeq
      // PAIRED files (same path on both sides, only the DV differs —
      // a DV delete or a restore across one) take the position-diff
      // fast path: the changed rows are exactly the DV delta, a
      // METADATA-scale except over the position parquets followed by
      // one row fetch from only the paired files. The O(live rows)
      // two-sided bag-diff would be correct but reads the whole
      // touched content twice — on a DV commit that is O(table).
      val addM = adds.toMap
      val remM = removes.toMap
      val paired = addM.keySet.intersect(remM.keySet)
      val changedPairs = paired.filter(p => addM(p) != remM(p)).toSeq.sorted
      val uAdds = adds.filterNot(a => paired.contains(a._1))
      val uRems = removes.filterNot(r => paired.contains(r._1))
      def posFrame(refs: Seq[(String, Option[DvRef])]): DataFrame =
        dvFrame(spark, root, refs.collect { case (p, Some(d)) =>
          AddFile(p, 0L, Map.empty, Map.empty, Some(d)) })
          .getOrElse(spark.range(0)
            .select(lit("").as("file"), col("id").as("pos")))
      val (pairIns, pairDel) =
        if (changedPairs.isEmpty) (None, None)
        else {
          val newPos = posFrame(changedPairs.map(p => p -> addM(p)))
          val oldPos = posFrame(changedPairs.map(p => p -> remM(p)))
          val tagged = taggedRead(spark, root, schema, changedPairs)
          def fetch(pos: DataFrame): DataFrame =
            tagged.join(broadcast(pos),
              tagged("__file") === pos("file") && tagged("__pos") === pos("pos"))
              .select(schema.fieldNames.map(col).toSeq: _*)
          (Some(fetch(oldPos.exceptAll(newPos))), // DV shrank: resurrected
            Some(fetch(newPos.exceptAll(oldPos)))) // DV grew: deleted
        }
      val addsDf = readSide(schema, uAdds)
      val remsDf = readSide(schema, uRems)
      val ins0 =
        if (uRems.isEmpty) addsDf
        else if (uAdds.isEmpty) addsDf.limit(0)
        else addsDf.exceptAll(remsDf)
      val del0 =
        if (uAdds.isEmpty) remsDf
        else if (uRems.isEmpty) remsDf.limit(0)
        else remsDf.exceptAll(addsDf)
      val ins = pairIns.map(ins0.unionByName(_)).getOrElse(ins0)
      val del = pairDel.map(del0.unionByName(_)).getOrElse(del0)
      ins.withColumn("_change_type", lit("insert"))
        .unionByName(del.withColumn("_change_type", lit("delete")))
        .withColumn("_commit_version", lit(v))
    }
    perCommit.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse {
        readSide(tip.schema, Nil)
          .withColumn("_change_type", lit(""))
          .withColumn("_commit_version", lit(0L)).limit(0)
      }
  }

  /** Reset the table CONTENT to that of `toVersion` as a NEW commit —
    * metadata only: the old snapshot's files are re-added by
    * reference, nothing is rewritten or deleted, and every
    * intermediate version stays time-travelable. The accident-undo
    * a mutable 100 TB table needs: O(log entry), not O(data).
    */
  def restore(spark: SparkSession, root: String, toVersion: Long): Long =
    commitRetry(spark, root, op = "restore") { snap =>
      val old = snapshot(spark, root, Some(toVersion))
      // identity = path + deletion vector: a DV commit changes CONTENT
      // under unchanged paths, and restoring across it must swing the
      // mask even though no data file moved
      if (old.files.map(f => (f.path, f.dv)) ==
          snap.files.map(f => (f.path, f.dv))) None
      else Some((old.files, snap.files.map(_.path), old.schema, None))
    }

  /** Incremental consumption for append-only pipelines — the
    * streaming-source read contract: the rows committed strictly
    * after `sinceVersion`, plus the version to checkpoint for the
    * next call. Any commit in the range that REMOVED files
    * (overwrite / delete / merge / restore / re-layout) fails the
    * call: removals break the "appends compose" premise, and the
    * caller must re-sync from a full [[read]] — the same rule the
    * published Delta streaming source enforces.
    */
  def appendsSince(spark: SparkSession, root: String,
      sinceVersion: Long): (DataFrame, Long) = {
    val tip = snapshot(spark, root)
    (appendsBetween(spark, root, sinceVersion, tip.version, tip.schema),
      tip.version)
  }

  /** The rows appended by versions in `(sinceVersion, toVersion]`, read
    * under `schema` — the bounded-range form [[appendsSince]] and the
    * streaming source's `getBatch` share. Deterministic for a fixed
    * range (immutable files + the log), which is what makes a
    * checkpointed micro-batch replay exactly-once. Same removal rule
    * as [[appendsSince]].
    */
  def appendsBetween(spark: SparkSession, root: String, sinceVersion: Long,
      toVersion: Long, schema: StructType): DataFrame = {
    val (fs, logDir) = logFs(spark, root)
    val addPaths = ((sinceVersion + 1) to toVersion).flatMap { v =>
      val node = mapper.readTree(readString(fs, entryOrExpired(fs, logDir, v)))
      require(node.get("removes").isEmpty,
        s"appendsSince: version $v removed files — non-append commit in " +
          "range; re-sync from a full read")
      node.get("adds").elements().asScala.map(_.get("path").asText).toSeq
    }
    if (addPaths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(physicalSchema(schema))
      .parquet(addPaths.map(p => new Path(root, p).toString): _*)
      .select(toLogicalCols(schema): _*)
  }

  /** Per-version append admission stats over `(from, to]`:
    * (version, added files, added bytes) — the streaming source's
    * maxFiles/maxBytes micro-batch bounding input. LAZY by contract:
    * the admission loop stops consuming at its cap, so a capped drain
    * of a 10k-commit backlog reads O(admitted) log entries per
    * trigger, not the whole pending window every time. Bytes come
    * from the entry's own recorded size where present; pre-field
    * entries fall back to one fs stat per file (only when asked). A
    * non-append commit in the window still reports its adds; the
    * batch read itself ([[appendsBetween]]) stays the authority that
    * refuses such ranges.
    */
  private[table] def versionAddStats(spark: SparkSession, root: String,
      from: Long, to: Long, needBytes: Boolean)
      : Iterator[(Long, Int, Long)] = {
    val (fs, logDir) = logFs(spark, root)
    val conf = hadoopConf(spark)
    ((from + 1) to to).iterator.map { v =>
      val node = mapper.readTree(readString(fs, entryOrExpired(fs, logDir, v)))
      val adds = node.get("adds").elements().asScala.toSeq
      val bytes =
        if (!needBytes) 0L
        else adds.map { f =>
          // entries since the bytes field record size at commit time;
          // older entries fall back to one fs stat per file
          if (f.hasNonNull("bytes")) f.get("bytes").asLong
          else {
            val fp = new Path(root, f.get("path").asText)
            try fp.getFileSystem(conf).getFileStatus(fp).getLen
            catch { case _: java.io.FileNotFoundException => 0L }
          }
        }.sum
      (v, adds.size, bytes)
    }
  }

  /** Commit metadata, newest first — the DESCRIBE HISTORY analogue. */
  def history(spark: SparkSession, root: String): Seq[(Long, Int, Int)] =
    historyOps(spark, root).map { case (v, _, _, a, r) => (v, a, r) }

  /** [[history]] with the operational columns: (version, commit
    * wall-clock ms, OPERATION verb, adds, removes). Every commit
    * records the verb that produced it (`append`, `delete`, `merge`,
    * `compact`, `restore`, …) — entries written before the field
    * existed read back as the generic `commit`.
    */
  def historyOps(spark: SparkSession, root: String)
      : Seq[(Long, Long, String, Int, Int)] = {
    val (fs, logDir) = logFs(spark, root)
    fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json")).map(_.take(8).toLong).sorted.reverse
      .map { v =>
        val node = mapper.readTree(readString(fs, new Path(logDir, entryName(v))))
        val op =
          if (node.hasNonNull("op")) node.get("op").asText else "commit"
        (v, if (node.hasNonNull("ts")) node.get("ts").asLong else 0L, op,
          node.get("adds").size(), node.get("removes").size())
      }.toSeq
  }

  /** Integrity audit of the CURRENT snapshot — the FSCK analogue.
    * Checks, in increasing IO cost:
    *  1. `file_exists`   — every logged data file is on the FS (driver
    *                       metadata, O(files));
    *  2. `tuple_complete`— partitioned tables: every file carries its
    *                       full partition tuple (pure log read);
    *  3. `dv_exists` / `dv_count` — every referenced deletion-vector
    *                       parquet exists and holds EXACTLY the logged
    *                       masked-position count for its file (one
    *                       job per distinct DV parquet — per (dv,
    *                       file) pairs, so superseded refs in shared
    *                       parquets can't cross-count);
    *  4. `row_count`     — each file's parquet-footer record count
    *                       equals the logged `rows` (footers opened in
    *                       a PARALLELIZED job, O(files) tasks — never
    *                       a data read).
    * Returns (check, target, ok, detail) rows — failures individually,
    * plus one summary row per check. Read-only; safe on a live table.
    */
  def verifyTable(spark: SparkSession, root: String)
      : Seq[(String, String, Boolean, String)] = {
    val snap = snapshot(spark, root)
    val (fs, _) = logFs(spark, root)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Boolean, String)]
    def summarize(check: String, bad: Seq[(String, String)],
        total: Int): Unit = {
      bad.foreach { case (t, d) => out += ((check, t, false, d)) }
      out += ((check, "*", bad.isEmpty,
        s"${total - bad.size}/$total ok"))
    }

    val missing = snap.files.map(_.path)
      .filterNot(p => fs.exists(new Path(root, p)))
      .map(p => (p, "logged data file missing on filesystem"))
    summarize("file_exists", missing, snap.files.size)

    if (snap.spec.nonEmpty) {
      val incomplete = snap.files.filter(f =>
        snap.spec.exists(t => !f.part.contains(t.fieldName)))
        .map(f => (f.path, "file lacks its partition tuple"))
      summarize("tuple_complete", incomplete, snap.files.size)
    }

    val dvFiles = snap.files.filter(_.dv.isDefined)
    if (dvFiles.nonEmpty) {
      val dvPaths = dvFiles.map(_.dv.get.path).distinct
      val missingDv = dvPaths
        .filterNot(p => fs.exists(new Path(root, p)))
        .map(p => (p, "referenced deletion-vector parquet missing"))
      summarize("dv_exists", missingDv, dvPaths.size)
      val present = dvPaths.filterNot(missingDv.map(_._1).toSet)
      val byDv: Map[String, Map[String, Long]] = present.map { p =>
        val df = spark.read.parquet(new Path(root, p).toString)
        // RLE generation: positions = Σ run, not parquet rows
        val perFile =
          if (df.columns.contains("run"))
            df.groupBy("file").agg(sum("run").as("n"))
          else df.groupBy("file").count()
        p -> perFile.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }.toMap
      val badCounts = dvFiles
        .filter(f => byDv.contains(f.dv.get.path))
        .flatMap { f =>
          val got = byDv(f.dv.get.path).getOrElse(fileKey(f.path), 0L)
          if (got == f.dv.get.rows) None
          else Some((f.path,
            s"dv positions $got != logged ${f.dv.get.rows}"))
        }
      summarize("dv_count", badCounts, dvFiles.size)
    }

    // informational: unreferenced files a vacuum would reclaim —
    // never a failure (expired versions leave these by design)
    out += (("orphans", "*", true,
      s"${vacuumDryRun(spark, root).size} unreferenced files " +
        "(vacuum reclaims)"))

    val existing = snap.files
      .filterNot(f => missing.exists(_._1 == f.path))
      .map(f => (new Path(root, f.path).toString, f.path, f.rows))
    if (existing.nonEmpty) {
      val conf = new SerializableHadoopConf(
        spark.sessionState.newHadoopConf())
      val badRows = spark.sparkContext
        .parallelize(existing, math.min(existing.size, 32))
        .flatMap { case (abs, rel, expected) =>
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(abs), conf.value))
          val n = try r.getRecordCount finally r.close()
          if (n == expected) None
          else Some((rel, s"footer rows $n != logged $expected"))
        }.collect().toSeq
      summarize("row_count", badRows, existing.size)
    }
    out.toSeq
  }

  /** Resolve a wall-clock instant to the version in effect then: the
    * NEWEST retained commit whose recorded timestamp is <= `tsMs` —
    * the "AS OF TIMESTAMP" half of time travel (the "AS OF version"
    * half is [[read]]'s `version` argument). Commit timestamps come
    * from the writer's clock at entry-build time; ordering follows
    * versions, not clocks, so a skewed clock can only blur WHICH
    * version an instant resolves to, never the content of one.
    * Instants before the first retained commit are an error (its
    * entries may be retention-expired); instants after the tip
    * resolve to the tip.
    */
  def versionAt(spark: SparkSession, root: String, tsMs: Long): Long = {
    val (fs, logDir) = logFs(spark, root)
    val entries = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json")).map(_.take(8).toLong).sorted
      .map { v =>
        val node = mapper.readTree(readString(fs, new Path(logDir, entryName(v))))
        // pre-timestamp entries (older table generations) sort first
        (v, if (node.hasNonNull("ts")) node.get("ts").asLong else 0L)
      }
    require(entries.nonEmpty, s"no commits at $root")
    val at = entries.filter(_._2 <= tsMs)
    require(at.nonEmpty,
      s"no retained commit at or before ts=$tsMs (earliest retained is " +
        s"version ${entries.head._1} at ts=${entries.head._2})")
    at.map(_._1).max
  }

  /** The table AS OF a wall-clock instant. */
  def readAsOf(spark: SparkSession, root: String, tsMs: Long): DataFrame =
    read(spark, root, Some(versionAt(spark, root, tsMs)))

  /** The recorded wall-clock (ms) of one commit — the instant
    * `TIMESTAMP AS OF` resolves against ([[versionAt]]'s input), read
    * from the immutable log so callers can pin a time-travel query to
    * an exact commit boundary.
    */
  def commitTimeMs(spark: SparkSession, root: String, version: Long): Long = {
    val (fs, logDir) = logFs(spark, root)
    val node =
      mapper.readTree(readString(fs, new Path(logDir, entryName(version))))
    require(node.hasNonNull("ts"), s"commit $version has no recorded ts")
    node.get("ts").asLong
  }

  /** [[restore]] to the state AS OF a wall-clock instant — the
    * accident-undo spelled the way an operator thinks ("put it back
    * to how it was at 14:05"), resolved through [[versionAt]]'s
    * version-ordered clock contract and then metadata-only.
    */
  def restoreAsOf(spark: SparkSession, root: String, tsMs: Long): Long =
    restore(spark, root, versionAt(spark, root, tsMs))

  /** Default grace for [[vacuum]]/[[maintain]]: files younger than
    * this are spared even when unreferenced. The race it closes: a
    * writer stages its data files under `data/<uuid>/` BEFORE its log
    * entry publishes, so to a zero-grace concurrent vacuum an
    * in-flight commit's files are indistinguishable from orphans —
    * sweeping them loses the commit the moment it publishes. Ten
    * minutes covers any realistic write-job tail; `minAgeMs = 0`
    * remains an explicit operator override for single-writer cleanup
    * (and for tests that assert immediate reclamation).
    *
    * ==BEHAVIOR CHANGE (round 14)==
    * This default was previously 0 across [[vacuum]],
    * [[vacuumDryRun]], [[maintain]], and `CALL system.vacuum` /
    * `system.maintain`. Callers relying on IMMEDIATE orphan
    * reclamation (single-writer cleanup jobs, space-pressure sweeps)
    * now see young orphans linger for up to ten minutes unless they
    * pass `minAgeMs = 0` / `min_age_ms => 0` explicitly. The change
    * is safety-positive — the old default silently raced in-flight
    * writers — but it IS a public default-behavior change, hence this
    * prominent record.
    */
  val DefaultVacuumGraceMs: Long = 10L * 60 * 1000

  /** Delete every data file no log version references (lost-race
    * orphans and half-written staging). Time travel to EVERY retained
    * version stays valid — only truly unreachable files go.
    *
    * `minAgeMs` additionally spares unreferenced files younger than
    * the threshold (by modification time). It is both the in-flight-
    * writer guard ([[DefaultVacuumGraceMs]] — staged files of a
    * not-yet-published commit must survive) and the tombstone-
    * retention guard for readers that pinned a `Snapshot` OBJECT
    * before a concurrent expiry dereferenced its files: a pinned scan
    * holds no lock, so "don't reclaim anything newer than the
    * longest-running query" is the published Delta VACUUM contract.
    */
  def vacuum(spark: SparkSession, root: String,
      minAgeMs: Long = DefaultVacuumGraceMs): Seq[String] =
    vacuumImpl(spark, root, minAgeMs, dryRun = false)

  /** What [[vacuum]] WOULD reclaim, deleting nothing — the audit an
    * operator runs before a destructive maintenance pass on a shared
    * table (the Delta `VACUUM … DRY RUN` shape).
    */
  def vacuumDryRun(spark: SparkSession, root: String,
      minAgeMs: Long = DefaultVacuumGraceMs): Seq[String] =
    vacuumImpl(spark, root, minAgeMs, dryRun = true)

  private def vacuumImpl(spark: SparkSession, root: String,
      minAgeMs: Long, dryRun: Boolean): Seq[String] = {
    val (fs, logDir) = logFs(spark, root)
    // a file is live if ANY remaining log entry REFERENCES it (adds OR
    // removes — changes() reads both sides of a retained CoW commit,
    // so a file added at a now-expired version but removed at a
    // retained one must survive even though no retained entry adds it
    // and the cutoff checkpoint, reflecting state AFTER the removal,
    // no longer lists it) OR any checkpoint's full state lists it —
    // after expireVersions the checkpoint at the retention cutoff is
    // the only reference to files added before it
    // an AddFile node references its data path AND its deletion
    // vector's parquet (readers of any retained version need both)
    def addRefs(f: JsonNode): Seq[String] =
      f.get("path").asText +:
        (if (f.hasNonNull("dv")) Seq(f.get("dv").get("path").asText) else Nil)
    val referenced = fs.listStatus(logDir).map(_.getPath.getName)
      .flatMap { n =>
        val p = new Path(logDir, n)
        if (n.matches("\\d{8}\\.json")) {
          val node = mapper.readTree(readString(fs, p))
          val rmDvs =
            if (node.hasNonNull("removeDvs"))
              node.get("removeDvs").properties().asScala
                .map(_.getValue.get("path").asText).toSeq
            else Nil
          node.get("adds").elements().asScala.flatMap(addRefs).toSeq ++
            node.get("removes").elements().asScala.map(_.asText).toSeq ++
            rmDvs
        } else if (n.matches("\\d{8}\\.ckpt\\.json"))
          mapper.readTree(readString(fs, p))
            .get("files").elements().asScala.flatMap(addRefs).toSeq
        else Nil
      }.toSet
    val dataDir = new Path(root, "data")
    if (!fs.exists(dataDir)) return Nil
    val removed = mutable.Buffer[String]()
    val cutoffMs = System.currentTimeMillis() - minAgeMs
    // a concurrent writer renames/removes its `_temporary` task dirs
    // while we walk — a vanished path is simply no longer sweepable,
    // never an error for the sweeper
    def listSafe(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      try fs.listStatus(p).toSeq
      catch {
        case _: java.io.FileNotFoundException => Nil
        // RawLocalFileSystem surfaces a dir deleted mid-list as a
        // GENERIC IOException (File.list() returns null → "Invalid
        // directory or I/O error"), not FNF — re-check: vanished is
        // the benign writer race, a path still present is a real
        // I/O error and must propagate
        case e: java.io.IOException => if (fs.exists(p)) throw e else Nil
      }
    // recursive walk: partitioned commits nest `gp_…=v` tuple dirs
    def sweep(p: Path, rel: String): Unit = {
      listSafe(p).foreach { f =>
        val childRel = s"$rel/${f.getPath.getName}"
        if (f.isDirectory) sweep(f.getPath, childRel)
        else if (!referenced.contains(childRel) &&
            !f.getPath.getName.startsWith("_") &&
            f.getModificationTime < cutoffMs) {
          if (!dryRun) fs.delete(f.getPath, false)
          removed += childRel
        }
      }
      // empty-dir cleanup honors the SAME age grace as files: a
      // freshly-mkdir'd commit dir is a writer about to stage its
      // parquets — deleting it from under the write loses the commit
      // (a dir that just became empty from this sweep gets a fresh
      // mtime from the deletes and is reclaimed by a later vacuum)
      val oldEnough =
        try fs.getFileStatus(p).getModificationTime < cutoffMs
        catch { case _: java.io.FileNotFoundException => false }
      if (!dryRun && oldEnough &&
          listSafe(p).forall(st => !st.isDirectory &&
            st.getPath.getName.startsWith("_"))) {
        fs.delete(p, true)
      }
    }
    listSafe(dataDir).foreach { d =>
      if (d.isDirectory) sweep(d.getPath, s"data/${d.getPath.getName}")
    }
    removed.toSeq
  }

  /** DEEP CLONE: a consistent PHYSICAL copy of the table as of
    * `version` — every referenced data and DV file's bytes copied into
    * the target's own tree, one commit referencing the copies
    * relatively. Unlike [[clone]] (zero-copy, shared-fate with source
    * history), a deep clone is a self-contained backup/DR artifact:
    * source expiry, vacuum, or deletion cannot touch it. Cost
    * O(live bytes) — the price of independence; incremental backups
    * compose from [[appendsSince]] instead.
    */
  def deepClone(spark: SparkSession, sourceRoot: String, targetRoot: String,
      version: Option[Long] = None): Long = {
    val src = snapshot(spark, sourceRoot, version)
    require(src.version >= 0, s"deepClone: source table $sourceRoot is empty")
    // refuse BEFORE copying a byte — an existing target would otherwise
    // pay the full copy just to fail at commit
    require(snapshot(spark, targetRoot).version < 0,
      s"deepClone: target $targetRoot already exists")
    copyPartSpec(spark, sourceRoot, targetRoot)
    val conf = hadoopConf(spark)
    // copies keep their ORIGINAL `data/<commit>/<part>` suffix: DV
    // parquets address data files by that suffix (the `__file` row
    // identity), so renaming the copies would silently drop the masks
    def copyInto(rel: String): String = {
      val suffix = fileKey(rel)
      val from = new Path(sourceRoot, rel)
      val to = new Path(targetRoot, suffix)
      org.apache.hadoop.fs.FileUtil.copy(
        from.getFileSystem(conf), from, to.getFileSystem(conf), to,
        false, false, conf)
      suffix
    }
    // one DV parquet may serve several files — copy each once
    val dvCopies = mutable.Map.empty[String, String]
    val adds = src.files.map { f =>
      f.copy(path = copyInto(f.path),
        dv = f.dv.map(d => d.copy(path =
          dvCopies.getOrElseUpdate(d.path, copyInto(d.path)))))
    }
    commitRetry(spark, targetRoot, op = "deep_clone") { snap =>
      require(snap.version < 0,
        s"deepClone: target $targetRoot already exists (version ${snap.version})")
      Some((adds, Nil, src.schema, None))
    }
  }

  /** Clones inherit the source's partition spec — their AddFiles
    * carry tuples, so reads would otherwise prune without the spec's
    * semantics and later writes would silently land unpartitioned.
    */
  private def copyPartSpec(spark: SparkSession, sourceRoot: String,
      targetRoot: String): Unit = {
    val spec = partitionSpecOf(spark, sourceRoot)
    if (spec.nonEmpty) {
      val (fs, logDir) = logFs(spark, targetRoot)
      fs.mkdirs(logDir)
      writeString(fs, new Path(logDir, PartSpecFile),
        Partitioning.toJson(spec))
    }
  }

  // ---------- commit machinery ----------

  /** What a commit's builder READ from the snapshot it built against —
    * the lost-race admission contract ([[commitRetry]]): a commit whose
    * reads and removes are provably untouched by the interleaved
    * commits may RE-PUBLISH its already-built payload against the new
    * tip without re-running the (possibly huge) CoW rewrite.
    * `ReadsNothing` = blind append/metadata-only; `ReadsRanges` = the
    * builder touched only files overlapping the conjunction (the
    * pruned-DML shape; empty = everything); `ReadsEverything` = the
    * conservative default — any interleaved commit forces a rebuild,
    * exactly the pre-admission behavior.
    */
  private[table] sealed trait ReadScope
  private[table] case object ReadsNothing extends ReadScope
  private[table] case object ReadsEverything extends ReadScope
  private[table] final case class ReadsRanges(rs: Seq[Range])
      extends ReadScope

  /** The maintenance-op read scope: compaction/z-order/purge/analyze
    * read EXACTLY the files they remove — which [[admitRepublish]]
    * already verifies bit-identical at the tip — and nothing else, so
    * beyond the removes they behave like `ReadsNothing`: a lost race
    * against a disjoint append (the steady-state contention shape —
    * nightly maintenance vs live ingest) re-publishes the finished
    * rewrite instead of redoing it; the appended file simply stays
    * outside this pass (serializable as maintain-then-append) and the
    * next tick picks it up.
    */
  private[table] val ReadsOnlyRemoved: ReadScope = ReadsNothing

  /** TEST SEAM: invoked with (root, op) immediately before every
    * publish attempt — the admission specs interleave a racing commit
    * at exactly the lost-race window. A no-op in production.
    */
  private[graft] var prePublishProbe: (String, String) => Unit = (_, _) => ()

  /** One optimistic-concurrency round: build the commit against the
    * freshest snapshot, try to take the next version; on a lost race,
    * first try ADMISSION — if every interleaved commit is disjoint
    * from this commit's reads and removes ([[admitRepublish]]), the
    * already-built payload re-publishes unchanged against the new tip
    * (a CoW MERGE losing to a disjoint append must not redo its whole
    * rewrite — the Delta conflict rule; under contention the wasted
    * work would otherwise grow quadratically) — else rebuild and
    * retry (bounded). The builder returns None for a no-op (e.g. an
    * already-committed txn batch).
    */
  private[table] def commitRetry(spark: SparkSession, root: String,
      newSpec: Option[Seq[Partitioning.PTransform]] = None,
      op: String = "commit",
      read: ReadScope = ReadsEverything)(
      build: Snapshot => Option[(Seq[AddFile], Seq[String], StructType,
        Option[(String, Long)])]): Long = {
    val (fs, logDir) = logFs(spark, root)
    fs.mkdirs(logDir)
    var attempt = 0
    while (attempt < 20) {
      val snap = snapshot(spark, root)
      build(snap) match {
        case None => return snap.version
        case Some((adds, removes, schema, txn)) =>
          // DVs of removed files as seen by the builder — admission
          // re-verifies those files bit-identical at the tip, so the
          // map stays right across re-publishes
          val removeDvs = snap.files
            .filter(f => removes.contains(f.path) && f.dv.isDefined)
            .map(f => f.path -> f.dv.get).toMap
          var base = snap
          var admitted = true
          while (admitted && attempt < 20) {
            val v = base.version + 1
            val entry = entryJson(v, adds, removes, removeDvs, schema, txn,
              newSpec, op)
            prePublishProbe(root, op)
            if (LogStore.forFs(fs).writeIfAbsent(fs, logDir, entryName(v),
                entry)) {
              maybeCheckpoint(spark, root, fs, logDir, v)
              return v
            }
            // lost the race: spec-changing commits always rebuild
            // (evolution must re-validate everything); otherwise admit
            // a disjoint re-publish. Data files written for a rebuilt
            // attempt stay as orphans (vacuum reclaims them).
            attempt += 1
            val tip = snapshot(spark, root)
            admitted =
              newSpec.isEmpty && admitRepublish(snap, tip, removes, txn, read)
            if (admitted) base = tip
          }
      }
      // attempt already advanced once per FAILED PUBLISH inside the
      // inner loop — the budget counts publish attempts, and a second
      // bump here would silently halve it under contention
    }
    sys.error(s"GraftTable: gave up after $attempt commit conflicts at $root")
  }

  /** May an already-built commit payload re-publish on top of `tip`
    * unchanged, after losing a race at `built`? Yes iff every
    * interleaved commit is DISJOINT from it: schema, partition spec
    * and (for tagged commits) the txn ledger row for our appId are
    * unchanged; every file this commit removes — and every surviving
    * file its builder may have read under `read` — is bit-identical at
    * the tip (not removed, not DV-mutated, not re-stat'ed); and no
    * interleaved ADD falls inside the read scope (a new file matching
    * a CoW predicate would have joined the rewrite — admitting it
    * would silently exempt its rows). Zone-map + partition-tuple
    * overlap ([[prunedFilesAll]]) is the conservative proxy for "may
    * have read": a false positive only costs a rebuild, never
    * correctness.
    */
  private def admitRepublish(built: Snapshot, tip: Snapshot,
      removes: Seq[String], txn: Option[(String, Long)],
      read: ReadScope): Boolean = {
    def mayRead(f: AddFile): Boolean = read match {
      case ReadsNothing => false
      case ReadsEverything => true
      case ReadsRanges(rs) =>
        rs.isEmpty || prunedFilesAll(built.copy(files = Seq(f)), rs).nonEmpty
    }
    if (tip.schema != built.schema || tip.spec != built.spec) return false
    if (txn.exists { case (app, _) =>
        tip.txns.get(app) != built.txns.get(app) }) return false
    val tipByPath = tip.files.map(f => f.path -> f).toMap
    val removeSet = removes.toSet
    val builtPaths = built.files.map(_.path).toSet
    built.files.forall(f =>
      tipByPath.get(f.path).contains(f) ||
        (!removeSet.contains(f.path) && !mayRead(f))) &&
      tip.files.forall(f => builtPaths.contains(f.path) || !mayRead(f))
  }

  private def maybeCheckpoint(spark: SparkSession, root: String,
      fs: FileSystem, logDir: Path, v: Long): Unit =
    if (v > 0 && v % CkptInterval == 0)
      writeCheckpoint(spark, root, fs, logDir, v)

  private def writeCheckpoint(spark: SparkSession, root: String,
      fs: FileSystem, logDir: Path, v: Long): Unit = {
    val snap = snapshot(spark, root, Some(v))
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("schema", snap.schema.json)
    // the spec current AT v — replay seeded from this checkpoint must
    // not resurrect the create-time spec after an evolution's entry
    // has been expired
    if (snap.spec.nonEmpty)
      node.put("partSpec", Partitioning.toJson(snap.spec))
    val fl = node.putArray("files")
    snap.files.foreach(f => fl.add(addFileNode(f)))
    val tx = node.putObject("txns")
    snap.txns.foreach { case (k, b) => tx.put(k, b) }
    // deterministic content given v → concurrent writers of the same
    // checkpoint write identical bytes; plain overwrite is safe
    val tmp = new Path(logDir, s".tmp-ckpt-${UUID.randomUUID()}")
    writeString(fs, tmp, mapper.writeValueAsString(node))
    fs.delete(new Path(logDir, ckptName(v)), false)
    fs.rename(tmp, new Path(logDir, ckptName(v)))
  }

  /** One-call steady-state maintenance — the nightly-cron surface a
    * production table needs, each step already O(debt) not O(table):
    * fold deletion vectors back into clean files once the mask debt
    * crosses `purgeAtMaskRatio` of physical rows (read-side cost
    * bound), compact the small-file debt, expire log history past
    * `keepVersions`, and vacuum what nothing references (sparing files
    * younger than `vacuumMinAgeMs` for pinned readers). Every step is
    * individually idempotent and crash-safe, so `maintain` is too.
    * Returns (purged?, compacted?, expired versions, vacuumed files).
    */
  def maintain(spark: SparkSession, root: String,
      smallFileRows: Long = 100000L,
      keepVersions: Int = 30,
      purgeAtMaskRatio: Double = 0.1,
      vacuumMinAgeMs: Long = DefaultVacuumGraceMs,
      clusterBy: Seq[String] = Nil,
      clusterBits: Int = 16,
      clusterMaxFiles: Int = 16,
      smallFileBytes: Long = 0L)
      : (Boolean, Boolean, Seq[Long], Seq[String]) = {
    val snap = snapshot(spark, root)
    val physical = math.max(1L, snap.files.map(_.rows).sum)
    val masked = snap.files.flatMap(_.dv.map(_.rows)).sum
    val vBefore = snap.version
    val purged =
      if (masked.toDouble / physical >= purgeAtMaskRatio && masked > 0)
        purgeDeletes(spark, root) > vBefore
      else false
    val vMid = snapshot(spark, root).version
    val compacted =
      compactSmall(spark, root, smallFileRows, minBytes = smallFileBytes) > vMid
    // clustering AFTER compaction (compaction output is debt) and as a
    // bounded O(clusterMaxFiles) tick — each maintenance call drains a
    // fixed slice of layout debt and the table converges across calls
    if (clusterBy.nonEmpty)
      zorderIncremental(spark, root, clusterBy,
        targetFiles = math.max(1, clusterMaxFiles / 4), bits = clusterBits,
        maxFiles = clusterMaxFiles)
    // NDV-sketch debt: compaction/clustering rewrites got sketches on
    // the write path; files that still predate the declaration are
    // backfilled here — O(missing files), nothing when current
    if (ndvColumns(spark, root).nonEmpty) analyzeNdv(spark, root)
    val expired = expireVersions(spark, root, keepVersions)
    val vacuumed = vacuum(spark, root, vacuumMinAgeMs)
    (purged, compacted, expired, vacuumed)
  }

  /** SHALLOW CLONE: a new table whose first commit references the
    * source's data (and DV) files BY ABSOLUTE PATH — zero bytes
    * copied, O(metadata) (the Delta SHALLOW CLONE semantic). The
    * clone is immediately independent: its appends/deletes/renames
    * commit to its own log (a DV delete on cloned files masks
    * positions in the clone only), while the referenced source files
    * stay immutable by the source's own contract. The clone's
    * [[vacuum]] only ever scans the clone's own `data/` dir, so it
    * can never reclaim source files; dropping source HISTORY that the
    * clone still references (source `expireVersions` + `vacuum`) is
    * the documented shared-fate caveat of every shallow clone — clone
    * from a version you retain, or [[compact]] the clone to localize
    * it.
    *
    * @param version source version to clone (None = tip)
    */
  def clone(spark: SparkSession, sourceRoot: String, targetRoot: String,
      version: Option[Long] = None): Long = {
    val src = snapshot(spark, sourceRoot, version)
    require(src.version >= 0, s"clone: source table $sourceRoot is empty")
    copyPartSpec(spark, sourceRoot, targetRoot)
    def abs(p: String): String = new Path(sourceRoot, p).toString
    val adds = src.files.map { f =>
      f.copy(path = abs(f.path), dv = f.dv.map(d => d.copy(path = abs(d.path))))
    }
    commitRetry(spark, targetRoot, op = "clone") { snap =>
      require(snap.version < 0,
        s"clone: target $targetRoot already exists (version ${snap.version})")
      Some((adds, Nil, src.schema, None))
    }
  }

  // ---------- column mapping (rename/drop without rewrite) ----------

  /** Rename a column METADATA-ONLY (the Delta column-mapping "name
    * mode" upgrade semantic): the field keeps its PHYSICAL parquet
    * name (recorded in the logical schema's field metadata), only the
    * logical name changes — no data file is touched, every version
    * stays time-travelable under the schema it was committed with.
    * Reads translate physical → logical at scan; appends translate
    * back at write.
    */
  def renameColumn(spark: SparkSession, root: String, oldName: String,
      newName: String): Long =
    commitRetry(spark, root, op = "rename_column") { snap =>
      require(snap.schema.fieldNames.contains(oldName),
        s"renameColumn: no column $oldName")
      require(!snap.spec.exists(_.srcCol == oldName),
        s"renameColumn: $oldName is a partition source column " +
          "(the spec binds by name and is immutable)")
      require(!snap.schema.fieldNames.contains(newName),
        s"renameColumn: column $newName already exists")
      val schema = StructType(snap.schema.fields.map { f =>
        if (f.name != oldName) f
        else f.copy(name = newName, metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(PhysKey, physName(f)).build())
      })
      Some((Nil, Nil, schema, None))
    }

  /** Drop a column METADATA-ONLY: the field leaves the logical schema;
    * the physical column stays in the immutable files (pruned at scan,
    * reclaimed naturally as CoW maintenance rewrites them). A later
    * re-add of the same logical name gets a FRESH physical name
    * ([[mergedSchema]]), so dropped data can never resurrect.
    */
  def dropColumn(spark: SparkSession, root: String, name: String): Long =
    commitRetry(spark, root, op = "drop_column") { snap =>
      require(snap.schema.fieldNames.contains(name),
        s"dropColumn: no column $name")
      require(!snap.spec.exists(_.srcCol == name),
        s"dropColumn: $name is a partition source column " +
          "(the spec binds by name and is immutable)")
      require(snap.schema.fields.length > 1,
        "dropColumn: cannot drop the last column")
      Some((Nil, Nil,
        StructType(snap.schema.fields.filterNot(_.name == name)), None))
    }

  private val PhysKey = "graftPhys"

  /** Spark's own default-value metadata keys
    * (`ResolveDefaultColumns`): CURRENT_DEFAULT feeds the analyzer's
    * `INSERT … DEFAULT` resolution, EXISTS_DEFAULT feeds the file
    * readers' absent-column fill.
    */
  private[table] val CurrentDefaultKey = "CURRENT_DEFAULT"
  private[table] val ExistsDefaultKey = "EXISTS_DEFAULT"

  private def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  private def physName(schema: StructType, logical: String): String =
    schema.fields.find(_.name == logical).map(physName).getOrElse(logical)

  /** Column-mapping resolution for the SPJ batch reader
    * ([[GraftBatchScan]]) — logical name → name stored in parquet.
    */
  private[table] def physicalNameOf(schema: StructType,
      logical: String): String = physName(schema, logical)

  /** [[fileKey]] for the SPJ batch reader — the identity a DV parquet's
    * `file` column records for a data file.
    */
  private[table] def fileKeyOf(path: String): String = fileKey(path)

  /** The schema as stored in parquet: physical names, no metadata. */
  private def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      // EXISTS_DEFAULT rides into the READ schema: Spark's parquet
      // readers fill a column ABSENT from a file's footer with this
      // folded literal instead of NULL — the metadata-only
      // `ADD COLUMN … DEFAULT` read path (pre-ALTER files are never
      // rewritten; post-ALTER files store values physically, so a
      // stored NULL still reads as NULL)
      val md =
        if (f.metadata.contains(ExistsDefaultKey))
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString(ExistsDefaultKey,
              f.metadata.getString(ExistsDefaultKey)).build()
        else org.apache.spark.sql.types.Metadata.empty
      org.apache.spark.sql.types.StructField(physName(f), f.dataType,
        f.nullable, md)
    })

  /** Rename a physically-named frame's columns to their logical names. */
  private def toLogicalCols(schema: StructType): Seq[org.apache.spark.sql.Column] =
    schema.fields.map(f => col(physName(f)).as(f.name)).toSeq

  /** Rename the logical columns present in `df` to physical names for
    * writing (columns not in the table schema pass through unchanged —
    * they are the NEW columns whose physical name IS their logical
    * name at this point; [[mergedSchema]] assigned it).
    */
  private def toPhysical(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.filter(f => physName(f) != f.name)
      .foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d.withColumnRenamed(f.name, physName(f))
        else d
      }

  // ---------- data files + footer stats ----------

  /** Write `df` under `data/<uuid>/` and harvest zone maps from the
    * parquet footers — metadata-only, no second read of the data.
    * Columns land under their PHYSICAL names (`tableSchema`'s column
    * mapping); stats and blooms are keyed back by LOGICAL name as of
    * this commit, so pruning stays name-stable for readers of this
    * version (a later rename simply stops pruning on pre-rename
    * files — conservative, never wrong).
    */
  private[table] def writeData(spark: SparkSession, root: String,
      dfIn: DataFrame, tableSchema: StructType,
      layout: Option[String] = None,
      preserveLayout: Boolean = false,
      layoutOnly: Boolean = false): Seq[AddFile] = {
    // GENERATED ALWAYS AS columns recompute on EVERY value-bearing
    // write — the one choke point that makes the ALWAYS contract
    // survive DML — including a programmatic append that OMITTED the
    // column (skipping it would silently write NULLs); a write whose
    // frame lacks the generation expression's source columns is
    // rejected outright, mirroring the partition-source require below.
    // Layout-only rewrites (compact/zorder/purge) carry the STORED
    // values instead: they re-shuffle committed rows whose generated
    // values were computed at their original write's choke point, so
    // recomputing is pure per-row cost — at 100 TB a compaction pays
    // the generation expression over the whole table for nothing.
    val df =
      if (layoutOnly) dfIn
      else generatedOf(spark, root).foldLeft(dfIn) { case (d, (c, e)) =>
        try d.withColumn(c, expr(e).cast(tableSchema(c).dataType))
        catch { case ex: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"write cannot satisfy GENERATED ALWAYS AS column '$c' " +
              s"($e): a source column is missing from the frame", ex)
        }
      }
    val spec = partitionSpecOf(spark, root)
    val commitId = UUID.randomUUID().toString
    val dir = new Path(new Path(root, "data"), commitId)
    if (spec.isEmpty) {
      toPhysical(df, tableSchema)
        .write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    } else {
      // partitioned write: derive the synthetic encoded tuple columns
      // from the LOGICAL source columns, cluster by the tuple (one
      // shuffle — the write-distribution move that keeps a
      // 1000-executor append from writing files × tasks small files
      // per partition), and let Spark's dynamic-partition writer
      // guarantee one tuple per file. Layout-preserving callers
      // (z-order/compaction) skip the re-cluster: the writer still
      // splits each task's rows per tuple, keeping both layouts.
      spec.foreach(t => require(df.columns.contains(t.srcCol),
        s"partitioned write is missing partition source column " +
          s"'${t.srcCol}' (spec: ${spec.map(_.describe).mkString(", ")})"))
      val withCols = spec.foldLeft(df) { (d, t) =>
        d.withColumn(t.fieldName,
          t.writeExpr(d(t.srcCol), d.schema(t.srcCol).dataType))
      }
      val clustered =
        if (preserveLayout) withCols
        else withCols.repartition(spec.map(t => col(t.fieldName)): _*)
      toPhysical(clustered, tableSchema)
        .write.mode(SaveMode.ErrorIfExists)
        .partitionBy(spec.map(_.fieldName): _*).parquet(dir.toString)
    }
    val physToLogical = tableSchema.fields
      .map(f => physName(f) -> f.name).toMap
    val fs = dir.getFileSystem(hadoopConf(spark))
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st) else Nil
      }
    val dirStr = fs.makeQualified(dir).toString
    def relOf(p: Path): String = {
      val q = fs.makeQualified(p).toString
      require(q.startsWith(dirStr + "/"), s"unexpected data path $q")
      q.substring(dirStr.length + 1)
    }
    val files = walk(dir)
      .map(st => relOf(st.getPath) -> st)
      .sortBy(_._1)
      .map { case (rel, st) =>
        val (rows, stats) = footerStats(st.getPath, hadoopConf(spark))
        AddFile(s"data/$commitId/$rel", rows,
          stats.map { case (c, s) => physToLogical.getOrElse(c, c) -> s },
          layout = layout,
          part = if (spec.isEmpty) Map.empty
            else Partitioning.tupleOfPath(spec, rel),
          bytes = st.getLen)
      }
    val bcols = bloomColumns(spark, root)
      .filter(df.schema.fieldNames.contains)
    val ncols = ndvColumns(spark, root)
      .filter(df.schema.fieldNames.contains)
    if (bcols.isEmpty && ncols.isEmpty) files
    else {
      val physSchema = StructType(df.schema.fields.map(f =>
        tableSchema.fields.find(_.name == f.name)
          .map(tf => f.copy(name = physName(tf))).getOrElse(f)))
      // ONE pass serves both metadata kinds — a table declaring blooms
      // AND ndv columns must not decode the commit twice
      val meta = fileWriteStats(spark, dir.toString, physSchema,
        bcols.map(c => physName(tableSchema, c)),
        ncols.map(c => physName(tableSchema, c)))
      files.map { f =>
        val (bl, nd) = meta.getOrElse(f.path,
          (Map.empty[String, String], Map.empty[String, String]))
        f.copy(
          blooms = bl.map { case (c, b) => physToLogical.getOrElse(c, c) -> b },
          ndv = nd.map { case (c, s) => physToLogical.getOrElse(c, c) -> s })
      }
    }
  }

  
  /** One column-pruned pass over the just-written files computing ALL
    * declared per-file write metadata at once — per (file, bloom
    * column), OR every row's two xxhash64 bits into a fixed 1 KiB
    * bitset ([[FileBloom.BloomAgg]] — commutative and associative, so
    * partition-order-invariant); per (file, ndv column), a
    * DataSketches HLL sketch of the non-null values
    * (`hll_sketch_agg`, base64 driver-side — Spark's `base64` SQL
    * function chunks MIME-style, which the plain decoder refuses).
    * Cost: one extra scan of only the declared columns of only the
    * new files — O(commit), never O(table), and never twice.
    * Returns fileKey → (blooms, ndv sketches).
    */
  private def fileWriteStats(spark: SparkSession, dir: String,
      schema: StructType, bcols: Seq[String], ncols: Seq[String])
      : Map[String, (Map[String, String], Map[String, String])] = {
    import org.apache.spark.sql.Encoders
    val bloomU = udaf(new FileBloom.BloomAgg(),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val src = spark.read.schema(schema)
      // recursiveFileLookup: a partitioned commit dir nests
      // `gp_…=v` subdirs — read every leaf, no partition inference
      .option("recursiveFileLookup", "true").parquet(dir)
      .select(input_file_name().as("__file") +:
        (bcols.flatMap { c =>
          val (h1, h2) = FileBloom.hashCols(col(c))
          Seq(h1.as(s"__h1_$c"), h2.as(s"__h2_$c"))
        } ++ ncols.map(c => col(c))): _*)
    val aggs = bcols.map(c =>
      bloomU(col(s"__h1_$c"), col(s"__h2_$c")).as(s"__b_$c")) ++
      ncols.map { c =>
        val in = ndvSketchInput(col(c), schema(c).dataType).getOrElse(
          sys.error(s"ndv column '$c' became unsketchable"))
        hll_sketch_agg(in).as(s"__n_$c")
      }
    // an all-null file must still carry a (empty) sketch, or the
    // union-side all-files requirement would block the column forever
    lazy val emptySketch = java.util.Base64.getEncoder.encodeToString(
      new org.apache.datasketches.hll.HllSketch().toCompactByteArray)
    src.groupBy("__file").agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        // key by the file's root-relative identity (`data/…` suffix) —
        // base names COLLIDE across partition subdirs of one commit
        val blooms = bcols.zipWithIndex.map { case (c, i) =>
          c -> r.getString(i + 1)
        }.toMap
        val ndv = ncols.zipWithIndex.map { case (c, i) =>
          c -> Option(r.getAs[Array[Byte]](bcols.length + i + 1))
            .map(java.util.Base64.getEncoder.encodeToString)
            .getOrElse(emptySketch)
        }.toMap
        fileKey(r.getString(0)) -> (blooms, ndv)
      }.toMap
  }

  /** Declare the columns that get a per-file [[FileBloom]] filter on
    * every subsequent data write (a table property in the log dir) —
    * the point-lookup pruning layer for keys SCATTERED across files,
    * where every file's zone map spans the probe. 1 KiB of log
    * metadata per (file, column).
    */
  def setBloomColumns(spark: SparkSession, root: String,
      cols: Seq[String]): Unit =
    updateProps(spark, root) { node =>
      val arr = node.putArray("bloomCols")
      cols.foreach(arr.add)
    }

  /** Declare the columns that get a per-file MERGEABLE NDV sketch
    * (DataSketches HLL, the library Spark itself bundles for
    * `hll_sketch_agg`) on every subsequent data write — distinct
    * counts for CBO join estimation ([[GraftColumnStats]]) with NO
    * ANALYZE pass: per-file sketches union across any file subset, so
    * the estimate stays right after pruning, compaction, or another
    * append (per-file ndv LONGS would not — summing them overcounts
    * shared values). ~1.5 KiB of log metadata per (file, column).
    * Join-key-shaped types only; float/double are refused loudly (an
    * equi-join on floats is already a modeling bug).
    */
  def setNdvColumns(spark: SparkSession, root: String,
      cols: Seq[String]): Unit = {
    val schema = snapshot(spark, root).schema
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"setNdvColumns: no column '$c'"))
      require(ndvSketchInput(col(c), f.dataType).isDefined,
        s"setNdvColumns: ${f.dataType.catalogString} column '$c' is not " +
          "sketchable (int-family, string, binary, boolean, date and " +
          "timestamp are)")
    }
    updateProps(spark, root) { node =>
      val arr = node.putArray("ndvCols")
      cols.foreach(arr.add)
    }
  }

  /** The sketch-input spelling for one column, or None for types the
    * HLL agg can't take. Dates/timestamps map to their exact internal
    * units (no truncation — distinctness preserved); the cast is the
    * same on every file, so unions stay consistent.
    */
  private def ndvSketchInput(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType | LongType | StringType | BinaryType => Some(c)
      case ShortType | ByteType | BooleanType => Some(c.cast(IntegerType))
      // dates via unix_date: Spark refuses CAST(date AS INT)
      case DateType => Some(unix_date(c))
      case TimestampType => Some(unix_micros(c))
      // NTZ: string render (micros preserved) — a cast through the
      // session-zoned timestamp is not injective around DST gaps
      case TimestampNTZType => Some(c.cast(StringType))
      case _ => None
    }
  }

  /** Declare CHECK constraints (name → boolean SQL expression) that
    * every subsequent [[append]] / [[overwrite]] / [[merge]] batch must
    * satisfy — the storage-level data-quality gate (the Delta
    * `ADD CONSTRAINT` shape): a batch with any violating row is
    * REFUSED before anything is committed, with per-constraint
    * violation counts in the error. SQL semantics: a row violates only
    * when the expression is FALSE (NULL passes — spell NOT NULL as
    * `col IS NOT NULL`). Validation is ONE aggregate pass over the
    * incoming batch — O(batch), never O(table).
    */
  def setConstraints(spark: SparkSession, root: String,
      constraints: Map[String, String]): Unit =
    updateProps(spark, root) { node =>
      val cn = node.putObject("constraints")
      constraints.toSeq.sortBy(_._1).foreach { case (n, e) => cn.put(n, e) }
    }

  /** Declare GENERATED ALWAYS AS columns: column → SQL expression over
    * the row's other columns. EVERY write ([[writeData]] is the single
    * choke point — inserts, CoW DML rewrites, compaction, purge)
    * recomputes the column from its expression, which is what makes
    * the "ALWAYS" contract hold even through UPDATE/MERGE of the
    * source columns: a rewrite can never persist a stale derived
    * value, and an explicitly-supplied value is simply overwritten.
    */
  def setGenerated(spark: SparkSession, root: String,
      gen: Map[String, String]): Unit =
    updateProps(spark, root) { node =>
      val gn = node.putObject("generated")
      gen.toSeq.sortBy(_._1).foreach { case (n, e) => gn.put(n, e) }
    }

  def generatedOf(spark: SparkSession, root: String): Map[String, String] =
    readProps(spark, root).filter(_.hasNonNull("generated"))
      .map(_.get("generated").properties().asScala
        .map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty)

  private def updateProps(spark: SparkSession, root: String)(
      f: ObjectNode => Unit): Unit = {
    val (fs, logDir) = logFs(spark, root)
    fs.mkdirs(logDir)
    val p = new Path(logDir, "_props.json")
    val node =
      if (fs.exists(p))
        mapper.readTree(readString(fs, p)).asInstanceOf[ObjectNode]
      else mapper.createObjectNode()
    f(node)
    writeString(fs, p, mapper.writeValueAsString(node))
  }

  private def readProps(spark: SparkSession, root: String): Option[JsonNode] = {
    val (fs, logDir) = logFs(spark, root)
    val p = new Path(logDir, "_props.json")
    if (!fs.exists(p)) None else Some(mapper.readTree(readString(fs, p)))
  }

  private def bloomColumns(spark: SparkSession, root: String): Seq[String] =
    readProps(spark, root).filter(_.hasNonNull("bloomCols"))
      .map(_.get("bloomCols").elements().asScala.map(_.asText).toSeq)
      .getOrElse(Nil)

  private[table] def ndvColumns(spark: SparkSession, root: String): Seq[String] =
    readProps(spark, root).filter(_.hasNonNull("ndvCols"))
      .map(_.get("ndvCols").elements().asScala.map(_.asText).toSeq)
      .getOrElse(Nil)

  /** Histogram-input spelling: the column as a DOUBLE in the SAME
    * units catalyst's estimation compares against (dates as epoch
    * days, timestamps as epoch micros — `EstimationUtils.toDouble` of
    * the internal value). None for unsupported types.
    */
  private def histInput(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType => Some(c.cast(DoubleType))
      // epoch days via unix_date: Spark refuses CAST(date AS INT)
      case DateType => Some(unix_date(c).cast(DoubleType))
      case TimestampType => Some(unix_micros(c).cast(DoubleType))
      case _ => None
    }
  }

  /** Equi-height histograms for skew-aware CBO estimates — the
    * `ANALYZE … FOR COLUMNS` analogue, stored in the table's props
    * (col → height + [lo, hi, ndv] bins) and surfaced through
    * [[GraftColumnStats]] so catalyst's `FilterEstimation` prices a
    * rare range on a skewed column by the bins it actually overlaps
    * instead of assuming uniform density. Exactly Spark's own two
    * jobs: percentile edges, then NDV per interval in ONE aggregate
    * (`ApproxCountDistinctForIntervals`). Reads LIVE rows (DV-masked
    * excluded). Estimates only — a later write staleness-shifts them
    * the same way it does for ANALYZE; re-call to refresh.
    */
  def analyzeHistogram(spark: SparkSession, root: String,
      cols: Seq[String], buckets: Int = 64): Unit = {
    import org.apache.spark.sql.graft.Bridge
    require(cols.nonEmpty, "analyzeHistogram: no columns given")
    require(buckets >= 2 && buckets <= 1024,
      s"analyzeHistogram: buckets must be in [2, 1024], got $buckets")
    val snap = snapshot(spark, root)
    val ins = cols.map { c =>
      val f = snap.schema.fields.find(_.name == c).getOrElse(
        sys.error(s"analyzeHistogram: no column '$c'"))
      c -> histInput(col(c), f.dataType).getOrElse(sys.error(
        s"analyzeHistogram: ${f.dataType.catalogString} column '$c' " +
          "has no histogram form (numeric, date and timestamp do)"))
    }
    val live = readMasked(spark, root, snap.schema, snap.files)
    // pass 1: equi-height edges (percentiles 0..1) + non-null counts
    val pcts = array((0 to buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val aggs1 = ins.flatMap { case (c, in) =>
      Seq(percentile_approx(in, pcts, lit(10000)).as(s"__e_$c"),
        count(in).as(s"__c_$c"))
    }
    val r1 = live.agg(aggs1.head, aggs1.tail: _*).head
    val edges = ins.map { case (c, _) =>
      c -> Option(r1.getAs[scala.collection.Seq[Double]](s"__e_$c"))
        .map(_.toArray).getOrElse(Array.empty[Double])
    }.toMap
    val counts = ins.map { case (c, _) =>
      c -> r1.getAs[Long](s"__c_$c")
    }.toMap
    val todo = ins.filter { case (c, _) =>
      counts(c) > 0 && edges(c).length == buckets + 1
    }
    // pass 2: ndv per interval, one aggregate for all columns
    val ndvs: Map[String, Array[Long]] =
      if (todo.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
        val aggs2 = todo.map { case (c, in) =>
          Bridge.column(new ApproxCountDistinctForIntervals(
            Bridge.expression(in),
            CreateArray(edges(c).toIndexedSeq.map(Literal(_))),
            0.05, 0, 0).toAggregateExpression()).as(s"__n_$c")
        }
        val r2 = live.agg(aggs2.head, aggs2.tail: _*).head
        todo.map { case (c, _) =>
          c -> r2.getAs[scala.collection.Seq[Long]](s"__n_$c").toArray
        }.toMap
      }
    updateProps(spark, root) { node =>
      val hn =
        if (node.hasNonNull("histograms"))
          node.get("histograms").asInstanceOf[ObjectNode]
        else node.putObject("histograms")
      todo.foreach { case (c, _) =>
        val e = edges(c)
        val n = ndvs(c)
        val cn = hn.putObject(c)
        cn.put("h", counts(c).toDouble / buckets)
        val bn = cn.putArray("b")
        (0 until buckets).foreach { i =>
          val b = bn.addArray()
          b.add(e(i)); b.add(e(i + 1)); b.add(n(i))
        }
      }
    }
  }

  /** The stored histograms, col → (height, [(lo, hi, ndv)…]). */
  def histogramsOf(spark: SparkSession, root: String)
      : Map[String, (Double, Seq[(Double, Double, Long)])] =
    readProps(spark, root).filter(_.hasNonNull("histograms"))
      .map(_.get("histograms").properties().asScala.map { e =>
        val cn = e.getValue
        val bins = cn.get("b").elements().asScala.map { b =>
          (b.get(0).asDouble, b.get(1).asDouble, b.get(2).asLong)
        }.toSeq
        e.getKey -> (cn.get("h").asDouble, bins)
      }.toMap)
      .getOrElse(Map.empty)

  /** Backfill NDV sketches for files that predate [[setNdvColumns]]:
    * one column-pruned pass over ONLY the files missing a declared
    * column's sketch, committed as a METADATA-ONLY replace (same data
    * paths, ndv maps added — no data movement, the DV stats-refresh
    * commit shape). Without this, a declaration only covers future
    * writes and [[GraftColumnStats]]'s all-files union guard keeps the
    * column silent. Idempotent: a second call finds nothing missing
    * and commits nothing. Returns the number of files backfilled.
    */
  def analyzeNdv(spark: SparkSession, root: String): Long = {
    val declared = ndvColumns(spark, root)
    require(declared.nonEmpty,
      "analyzeNdv: declare columns with setNdvColumns / the " +
        "ndv.columns property first")
    var touched = 0L
    commitRetry(spark, root, op = "analyze",
      read = ReadsOnlyRemoved) { snap =>
      val want = declared.filter(snap.schema.fieldNames.contains)
      val missing = snap.files.filter(f => want.exists(c =>
        !(f.ndv.contains(c) || f.ndv.contains(physName(snap.schema, c)))))
      touched = missing.size.toLong
      if (want.isEmpty || missing.isEmpty) None
      else {
        // LIVE rows only (readMasked applies each file's DV): a
        // backfilled sketch must not count deleted values, or the
        // join-estimation ndv inflates against the live row count
        val tagged = readMasked(spark, root, snap.schema, missing)
        val aggs = want.map { c =>
          val in = ndvSketchInput(col(c), snap.schema(c).dataType)
            .getOrElse(sys.error(s"ndv column '$c' is not sketchable"))
          hll_sketch_agg(in).as(s"__n_$c")
        }
        lazy val emptySketch = java.util.Base64.getEncoder.encodeToString(
          new org.apache.datasketches.hll.HllSketch().toCompactByteArray)
        val sk = tagged.groupBy(col("__file"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            r.getString(0) -> want.zipWithIndex.map { case (c, i) =>
              c -> Option(r.getAs[Array[Byte]](i + 1))
                .map(java.util.Base64.getEncoder.encodeToString)
                .getOrElse(emptySketch)
            }.toMap
          }.toMap
        // zero-row files never surface in the groupBy: default every
        // wanted column to the empty sketch so the pass is idempotent
        val adds = missing.map(f =>
          f.copy(ndv = f.ndv ++ want.map(_ -> emptySketch).toMap ++
            sk.getOrElse(fileKey(f.path), Map.empty)))
        Some((adds, missing.map(_.path), snap.schema, None))
      }
    }
    touched
  }

  /** The declared CHECK constraints (name → boolean SQL), as
    * [[setConstraints]] recorded them — public so the SQL catalog can
    * merge single-constraint DDL edits and list them as properties.
    */
  def constraintsOf(spark: SparkSession, root: String): Map[String, String] =
    tableConstraints(spark, root).toMap

  private def tableConstraints(spark: SparkSession,
      root: String): Seq[(String, String)] =
    readProps(spark, root).filter(_.hasNonNull("constraints"))
      .map(_.get("constraints").properties().asScala
        .map(e => e.getKey -> e.getValue.asText).toSeq.sortBy(_._1))
      .getOrElse(Nil)

  /** Refuse `df` if any declared constraint has a violating row. */
  private def enforceConstraints(spark: SparkSession, root: String,
      df: DataFrame): Unit = {
    val cons = tableConstraints(spark, root)
      // a constraint on a column this batch doesn't carry yet (schema
      // evolution) cannot be evaluated — treated as passing, the rows
      // read back as NULL which CHECK semantics admit
      .filter { case (_, e) =>
        scala.util.Try(df.filter(expr(e)).queryExecution.analyzed).isSuccess
      }
    if (cons.nonEmpty) {
      val aggs = cons.map { case (n, e) =>
        sum(when(coalesce(expr(e), lit(true)) === false, 1L)
          .otherwise(0L)).as(n)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head
      val bad = cons.zipWithIndex.collect {
        case ((n, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
          s"$n (`$e`): ${row.getLong(i)} rows"
      }
      require(bad.isEmpty,
        s"constraint violation, batch refused: ${bad.mkString("; ")}")
    }
  }

  /** Per-file row count + per-column min/max/nulls from the footer. */
  private def footerStats(p: Path,
      conf: Configuration): (Long, Map[String, ColStats]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = mutable.Map[String, ColStats]()
      val dropped = mutable.Set[String]()
      for (b <- blocks; cc <- b.getColumns.asScala) {
        val dots = cc.getPath.toArray
        val name = dots.mkString(".")
        val st = cc.getStatistics
        if (dots.length != 1 || st == null || !st.hasNonNullValue) {
          dropped += name // nested / statless column: no zone map
        } else {
          val tv: Option[(String, Any, Any)] =
            cc.getPrimitiveType.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT64 => Some(("i64",
                st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
              case PrimitiveTypeName.INT32 => Some(("i64",
                st.genericGetMin.asInstanceOf[java.lang.Integer].longValue,
                st.genericGetMax.asInstanceOf[java.lang.Integer].longValue))
              case PrimitiveTypeName.DOUBLE => Some(("f64",
                st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue,
                st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue))
              case PrimitiveTypeName.BINARY => Some(("str",
                st.minAsString, st.maxAsString))
              case _ => None
            }
          tv match {
            case None => dropped += name
            case Some((t, mn, mx)) =>
              val merged = acc.get(name) match {
                case None => ColStats(t, mn, mx, st.getNumNulls)
                case Some(prev) => ColStats(t,
                  minOf(t, prev.min, mn), maxOf(t, prev.max, mx),
                  prev.nulls + st.getNumNulls)
              }
              acc(name) = merged
          }
        }
      }
      (rows, (acc -- dropped).toMap)
    } finally reader.close()
  }

  // ---------- zone-map comparisons ----------

  /** [[cmp]] for same-package collaborators (the catalog's
    * metadata-aggregate fold).
    */
  private[table] def cmpPublic(t: String, a: Any, b: Any): Int = cmp(t, a, b)

  private def cmp(t: String, a: Any, b: Any): Int = t match {
    case "i64" => java.lang.Long.compare(toL(a), toL(b))
    case "f64" => java.lang.Double.compare(toD(a), toD(b))
    case "str" => a.toString.compareTo(b.toString)
  }
  private def toL(a: Any): Long = a match {
    case n: Number => n.longValue
    case s => s.toString.toLong
  }
  private def toD(a: Any): Double = a match {
    case n: Number => n.doubleValue
    case s => s.toString.toDouble
  }
  private def minOf(t: String, a: Any, b: Any): Any =
    if (cmp(t, a, b) <= 0) a else b
  private def maxOf(t: String, a: Any, b: Any): Any =
    if (cmp(t, a, b) >= 0) a else b

  /** Conservative: true unless the zone map PROVES disjointness. A
    * column with no stats never prunes. String pruning only engages
    * when bounds and probes are pure ASCII — beyond ASCII, parquet's
    * unsigned-byte order and Java's UTF-16 order can disagree, and a
    * wrong skip is a correctness bug while a skipped skip is only a
    * slow scan.
    */
  private[table] def mayMatch(f: AddFile, r: Range): Boolean =
    f.stats.get(r.col) match {
      case None => true
      case Some(s) =>
        val asciiSafe = s.tpe != "str" ||
          (Seq(s.min, s.max) ++ r.lo ++ r.hi)
            .forall(_.toString.forall(_ < 128))
        if (!asciiSafe) true
        else {
          val aboveLo = r.lo.forall(lo => cmp(s.tpe, s.max, lo) >= 0)
          val belowHi = r.hi.forall(hi => cmp(s.tpe, s.min, hi) <= 0)
          aboveLo && belowHi
        }
    }

  private def residual(r: Range): String = {
    def litSql(v: Any) = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case x => x.toString
    }
    (r.lo.map(lo => s"${r.col} >= ${litSql(lo)}") ++
      r.hi.map(hi => s"${r.col} <= ${litSql(hi)}"))
      .mkString(" AND ") match { case "" => "true"; case s => s }
  }

  // ---------- (de)serialization ----------

  private def entryName(v: Long) = f"$v%08d.json"
  private def ckptName(v: Long) = f"$v%08d.ckpt.json"

  /** Per-commit readers ([[changes]], [[appendsSince]]) need the ENTRY
    * of every version in their range; a version dropped by
    * [[expireVersions]] replays fine from a checkpoint but its
    * per-commit delta is gone — turn the raw missing-file error into
    * the contract's own message.
    */
  private def entryOrExpired(fs: FileSystem, logDir: Path, v: Long): Path = {
    val p = new Path(logDir, entryName(v))
    require(fs.exists(p),
      s"version $v's log entry no longer exists (expired by retention); " +
        "per-commit changes are only available inside the retention window")
    p
  }

  private def entryJson(v: Long, adds: Seq[AddFile], removes: Seq[String],
      removeDvs: Map[String, DvRef], schema: StructType,
      txn: Option[(String, Long)],
      newSpec: Option[Seq[Partitioning.PTransform]] = None,
      op: String = "commit"): String = {
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("ts", System.currentTimeMillis())
    node.put("op", op)
    node.put("schema", schema.json)
    // a spec-evolution commit carries its new spec IN the entry: the
    // spec change and the version bump are one atomic publish
    newSpec.foreach(s => node.put("partSpec", Partitioning.toJson(s)))
    val a = node.putArray("adds")
    adds.foreach(f => a.add(addFileNode(f)))
    val rm = node.putArray("removes")
    removes.foreach(rm.add)
    // the DV each removed file carried AT REMOVAL — self-contained so
    // the change feed can reconstruct the remove side's LIVE rows
    // without replaying a previous snapshot
    if (removeDvs.nonEmpty) {
      val rd = node.putObject("removeDvs")
      removeDvs.toSeq.sortBy(_._1).foreach { case (p, d) =>
        val dn = rd.putObject(p)
        dn.put("path", d.path)
        dn.put("rows", d.rows)
      }
    }
    txn.foreach { case (app, b) =>
      node.put("txnApp", app); node.put("txnBatch", b)
    }
    mapper.writeValueAsString(node)
  }

  private def addFileNode(f: AddFile): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("path", f.path)
    node.put("rows", f.rows)
    val st = node.putObject("stats")
    f.stats.toSeq.sortBy(_._1).foreach { case (c, s) =>
      val cn = st.putObject(c)
      cn.put("t", s.tpe)
      cn.put("nulls", s.nulls)
      s.tpe match {
        case "i64" => cn.put("min", toL(s.min)); cn.put("max", toL(s.max))
        case "f64" => cn.put("min", toD(s.min)); cn.put("max", toD(s.max))
        case "str" =>
          cn.put("min", s.min.toString); cn.put("max", s.max.toString)
      }
    }
    if (f.blooms.nonEmpty) {
      val bl = node.putObject("blooms")
      f.blooms.toSeq.sortBy(_._1).foreach { case (c, b) => bl.put(c, b) }
    }
    f.dv.foreach { d =>
      val dn = node.putObject("dv")
      dn.put("path", d.path)
      dn.put("rows", d.rows)
    }
    f.layout.foreach(l => node.put("layout", l))
    if (f.bytes > 0) node.put("bytes", f.bytes)
    if (f.dvStats) node.put("dvStats", true)
    if (f.part.nonEmpty) {
      val pn = node.putObject("part")
      f.part.toSeq.sortBy(_._1).foreach { case (k, v) => pn.put(k, v) }
    }
    if (f.ndv.nonEmpty) {
      val nn = node.putObject("ndv")
      f.ndv.toSeq.sortBy(_._1).foreach { case (c, s) => nn.put(c, s) }
    }
    node
  }

  private def addFileFrom(n: JsonNode): AddFile = {
    val stats = n.get("stats").properties().asScala.map { e =>
      val cn = e.getValue
      val t = cn.get("t").asText
      val (mn, mx): (Any, Any) = t match {
        case "i64" => (cn.get("min").asLong, cn.get("max").asLong)
        case "f64" => (cn.get("min").asDouble, cn.get("max").asDouble)
        case "str" => (cn.get("min").asText, cn.get("max").asText)
      }
      e.getKey -> ColStats(t, mn, mx, cn.get("nulls").asLong)
    }.toMap
    val blooms =
      if (n.hasNonNull("blooms"))
        n.get("blooms").properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
      else Map.empty[String, String]
    val dv =
      if (n.hasNonNull("dv"))
        Some(DvRef(n.get("dv").get("path").asText,
          n.get("dv").get("rows").asLong))
      else None
    val layout = // absent in pre-clustering log entries: default None
      if (n.hasNonNull("layout")) Some(n.get("layout").asText) else None
    val part =
      if (n.hasNonNull("part"))
        n.get("part").properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
      else Map.empty[String, String]
    val ndv =
      if (n.hasNonNull("ndv"))
        n.get("ndv").properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
      else Map.empty[String, String]
    AddFile(n.get("path").asText, n.get("rows").asLong, stats, blooms, dv,
      layout,
      dvStats = n.hasNonNull("dvStats") && n.get("dvStats").asBoolean,
      part = part, ndv = ndv,
      // pre-field entries read 0 — consumers fall back to an fs stat
      bytes = if (n.hasNonNull("bytes")) n.get("bytes").asLong else 0L)
  }

  // ---------- IO helpers ----------

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  private def logFs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val logDir = new Path(root, "_log")
    (logDir.getFileSystem(hadoopConf(spark)), logDir)
  }

  private def mergedSchema(snap: Snapshot, df: DataFrame): StructType =
    // keyed on "has a committed schema", NOT "has live files": a table
    // created empty ([[create]]) or deleted down to zero rows keeps its
    // declared schema as the merge anchor — an append may widen it but
    // never silently replace it
    if (snap.version < 0) df.schema
    else {
      val have = snap.schema.fieldNames.toSet
      val extra = df.schema.fields.filterNot(f => have.contains(f.name))
      require(df.schema.fields.forall(f =>
        !have.contains(f.name) ||
          snap.schema(f.name).dataType == f.dataType),
        "append schema conflicts with the table schema on a shared column")
      extra.foldLeft(snap.schema) { (s, f) =>
        // a column added to an EXISTING table gets a fresh physical
        // name: if this logical name was ever dropped, its old physical
        // column may still sit in immutable files, and reading it back
        // under the re-added column would resurrect deleted data
        val phys = s"${f.name}-${UUID.randomUUID().toString.take(8)}"
        s.add(f.copy(nullable = true, metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString(PhysKey, phys).build()))
      }
    }

  /** The LIVE rows of `files` under `snap.schema` — deletion vectors
    * applied. Files without a DV take the plain parquet path (no
    * metadata columns, no join — the common case stays the fast
    * case); DV'd files read with `_metadata.{file_path,row_index}` and
    * anti-join their positions out. The DV frame is bounded by
    * deleted-row count (and [[purgeDeletes]] is the maintenance move
    * when it grows); the anti-join broadcasts only under
    * [[DvBroadcastMaxPositions]] and shuffles past it — see
    * [[readMasked]].
    */
  private[table] def readFiles(spark: SparkSession, root: String, snap: Snapshot,
      files: Seq[AddFile]): DataFrame = {
    val cols = snap.schema.fieldNames.map(col).toSeq
    val (dved, clean) = files.partition(_.dv.isDefined)
    val cleanDf =
      if (clean.isEmpty) None
      else Some(spark.read.schema(physicalSchema(snap.schema))
        .parquet(clean.map(f => new Path(root, f.path).toString): _*)
        .select(toLogicalCols(snap.schema): _*))
    val dvedDf =
      if (dved.isEmpty) None
      else Some(readMasked(spark, root, snap.schema, dved)
        .select(cols: _*))
    (cleanDf, dvedDf) match {
      case (Some(c), Some(d)) => c.unionByName(d)
      case (Some(c), None) => c
      case (None, Some(d)) => d
      case (None, None) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    }
  }

  /** Broadcast gate for the V1 masked-read anti-join: the EXACT
    * masked-position count (metadata-known — Σ `dv.rows` over the
    * files being read) above which the EXPANDED DV frame must not
    * broadcast. A table carrying near-threshold mask debt on many
    * files (the pre-`maintain` steady state after a wide RLE
    * retraction) would otherwise ship the whole expanded position set
    * to every task; past the gate the anti-join SHUFFLES with the DV
    * side as the hash build (positions ≪ data rows) — the
    * Hnsw/VectorIndex over-limit discipline applied to the mask join.
    * The SPJ/columnar path is unaffected (its readers walk spans
    * per file, never a join). Test seam: the DV spec lowers it to
    * force the shuffle path and pins byte-identity.
    */
  private[graft] var DvBroadcastMaxPositions: Long = 1L << 20

  /** DV-applied read of DV-carrying files, KEEPING the row identity
    * columns `__file` (root-relative path) and `__pos` (row index in
    * the physical file) — the frame [[deleteWhereDv]] computes new
    * deletions over.
    */
  private def readMasked(spark: SparkSession, root: String,
      schema: StructType, files: Seq[AddFile]): DataFrame = {
    val tagged = taggedRead(spark, root, schema, files.map(_.path))
    dvFrame(spark, root, files) match {
      case None => tagged
      case Some(dv) =>
        val masked = files.flatMap(_.dv).map(_.rows).sum
        val side =
          if (masked <= DvBroadcastMaxPositions) broadcast(dv)
          else dv.hint("shuffle_hash")
        tagged.join(side,
          tagged("__file") === side("file") && tagged("__pos") === side("pos"),
          "left_anti")
    }
  }

  /** Raw read of `paths` plus `__file`/`__pos` identity columns. The
    * root-relative path is recovered as everything after the LAST
    * `/data/` of `_metadata.file_path` — [[fileKey]]'s rule, depth-
    * agnostic for partitioned layouts. `substring_index` rather than
    * a regexp: the extraction runs per ROW, not per file, so on a
    * masked scan of N rows a regex is N regex executions for a value
    * that only changes per file — measured as a visible slice of
    * DV-masked read time.
    */
  private def taggedRead(spark: SparkSession, root: String,
      schema: StructType, paths: Seq[String]): DataFrame =
    spark.read.schema(physicalSchema(schema))
      .parquet(paths.map(p => new Path(root, p).toString): _*)
      .select(toLogicalCols(schema) :+
        concat(lit("data/"),
          substring_index(col("_metadata.file_path"), "/data/", -1))
          .as("__file") :+
        col("_metadata.row_index").as("__pos"): _*)

  /** Union of the distinct DV parquets `files` reference, filtered to
    * those files' rows: `(file, pos)`.
    */
  private def dvFrame(spark: SparkSession, root: String,
      files: Seq[AddFile]): Option[DataFrame] = {
    val withDv = files.filter(_.dv.isDefined)
    if (withDv.isEmpty) None
    else {
      val paths = withDv.map(f => fileKey(f.path)).toSet
      val dvPaths = withDv.map(_.dv.get.path).distinct
      // ONE scan over every DV parquet: mergeSchema reconciles mixed
      // RLE/pre-RLE generations (pre-RLE rows read `run` as null —
      // expandDv treats null as a length-1 span), where a per-path
      // read-and-union would build an O(#parquets)-deep plan and a
      // plain multi-path read would smear one schema over both
      // generations and silently drop the run column
      Some(expandDv(spark.read.option("mergeSchema", "true")
        .parquet(dvPaths.map(p => new Path(root, p).toString): _*))
        .filter(col("file").isin(paths.toSeq: _*)))
    }
  }

  /** Expand a (possibly run-length-encoded) DV frame to plain
    * `(file, pos)` rows. DV parquets written since the RLE change
    * store `(file, pos, run)` spans — O(runs) on disk for wide
    * retractions; pre-RLE parquets lack `run` and pass through
    * unchanged (mixed unions read per-parquet, so both generations
    * coexist). Long runs expand via bounded sub-spans so no single
    * row materializes a giant sequence array.
    */
  private def expandDv(df: DataFrame): DataFrame =
    if (!df.columns.contains("run")) df.select(col("file"), col("pos"))
    else {
      val maxSpan = 65536L
      // null run = a pre-RLE row surfaced through a merged-schema
      // read = one position
      df.select(col("file"), col("pos"),
        coalesce(col("run"), lit(1L)).as("run"))
        .withColumn("c",
          explode(sequence(lit(0L),
            floor((col("run") - 1L) / maxSpan).cast("long"))))
        .select(col("file"),
          (col("pos") + col("c") * maxSpan).as("s"),
          least(col("run") - col("c") * maxSpan, lit(maxSpan)).as("n"))
        .select(col("file"),
          explode(sequence(col("s"), col("s") + col("n") - 1L)).as("pos"))
    }

  /** A data file's identity key — everything after the LAST `/data/`
    * of its path (`data/<commit>/[gp_…=v/]*<file>` — depth-agnostic,
    * because a partitioned commit nests tuple directories), the same
    * shape [[taggedRead]]'s `__file` column extracts from
    * `_metadata.file_path`. Local AddFile paths equal their key;
    * [[clone]]d AddFiles carry absolute source paths and only the key
    * matches across the two spellings. No later path segment can BE
    * `data` (commit ids are UUID hex, tuple dirs contain `=`, files
    * end `.parquet`), so the last occurrence is always the table's
    * own data root.
    */
  private def fileKey(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i >= 0) path.substring(i + 1)
    else path // already root-relative (`data/…`)
  }

  private def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
