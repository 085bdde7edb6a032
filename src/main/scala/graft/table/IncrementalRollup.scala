package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A count/sum rollup of a source [[GraftTable]], materialized as its
  * own GraftTable and maintained INCREMENTALLY from the source's CDC
  * feed — the table-format half of incremental view maintenance (the
  * foreachBatch+MERGE half lives in `streaming`/`operators.Merge`).
  *
  * Why this shape at 100 TB: a full MV rebuild rescans the source
  * (O(table)); this refresh reads only the source commits since the
  * last refresh ([[GraftTable.changes]] — O(files touched)), reduces
  * them to per-group deltas (inserts count +1, deletes −1), and
  * applies them copy-on-write to only the MV files whose zone maps
  * overlap the changed keys. Groups whose count reaches zero are
  * dropped; brand-new groups insert. So refresh cost is
  * O(source changes) + O(MV files overlapping the changed keys),
  * never O(source) or O(MV).
  *
  * Exactly-once: each refresh commits to the MV with an
  * (`appId` = "rollup:&lt;sourceRoot&gt;", `batchId` = source version)
  * txn tag, so a crashed-and-retried refresh is absorbed by the MV's
  * own ledger — the same idempotence contract as streaming appends.
  *
  * Exactness: `n` is a count; `s` is `sum(sumCol)` — use an integer /
  * decimal column for bit-exact maintenance (the specs do); float
  * sums are maintained but carry the usual reassociation caveat.
  */
object IncrementalRollup {

  private def appId(sourceRoot: String) = s"rollup:$sourceRoot"

  /** Build the MV from the source's current snapshot (one full
    * aggregation — the only O(source) step in the MV's lifetime) and
    * record the source version it reflects.
    */
  def create(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCol: String, targetFiles: Int = 8): Long =
    createMulti(spark, sourceRoot, mvRoot, key, Seq(sumCol), targetFiles)

  /** [[create]] over SEVERAL summed columns: the MV holds
    * `(key, n, s, s_1, …, s_{k-1})` — the first sum keeps the
    * historical name `s`, the rest are `s_<i>` by position. One MV,
    * one refresh pass, any number of maintained measures.
    */
  def createMulti(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCols: Seq[String], targetFiles: Int = 8): Long = {
    require(sumCols.nonEmpty, "at least one summed column")
    val srcSnap = GraftTable.snapshot(spark, sourceRoot)
    require(srcSnap.version >= 0, s"source table $sourceRoot is empty")
    // range-cluster the MV on the group key so later refreshes prune:
    // a delta confined to a key range rewrites only the files whose
    // zone maps overlap it
    val aggs = count(lit(1)).as("n") +:
      sumCols.zipWithIndex.map { case (c, i) => sum(col(c)).as(sName(i)) }
    val full = GraftTable.read(spark, sourceRoot)
      .groupBy(key)
      .agg(aggs.head, aggs.tail: _*)
      .repartitionByRange(targetFiles, col(key))
      .sortWithinPartitions(key)
    GraftTable.commitRetry(spark, mvRoot) { mvSnap =>
      Some((GraftTable.writeData(spark, mvRoot, full, full.schema),
        mvSnap.files.map(_.path), full.schema,
        Some((appId(sourceRoot), srcSnap.version))))
    }
  }

  private def sName(i: Int): String = if (i == 0) "s" else s"s_$i"

  /** The source version the MV currently reflects (−1 = never built). */
  def appliedVersion(spark: SparkSession, sourceRoot: String,
      mvRoot: String): Long =
    GraftTable.snapshot(spark, mvRoot).txns.getOrElse(appId(sourceRoot), -1L)

  /** Apply the source commits since the last refresh to the MV as one
    * atomic copy-on-write commit. Returns the MV version (unchanged if
    * already current — including a replayed refresh, absorbed by the
    * txn ledger).
    */
  def refresh(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCol: String): Long =
    refreshMulti(spark, sourceRoot, mvRoot, key, Seq(sumCol))

  /** [[refresh]] for a [[createMulti]] MV — `sumCols` must match the
    * create call (same columns, same order).
    */
  def refreshMulti(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCols: Seq[String]): Long = {
    val srcV = GraftTable.snapshot(spark, sourceRoot).version
    GraftTable.commitRetry(spark, mvRoot) { mvSnap =>
      val applied = mvSnap.txns.getOrElse(appId(sourceRoot), -1L)
      require(applied >= 0, s"MV $mvRoot was never created for $sourceRoot")
      if (applied >= srcV) None // current (or a replayed refresh)
      else {
        val sgn = when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L))
        val dAggs = sum(sgn).as("dn") +: sumCols.zipWithIndex.map {
          case (c, i) => sum(sgn * col(c)).as(s"d${sName(i)}")
        }
        val delta = GraftTable.changes(spark, sourceRoot, applied, srcV)
          .groupBy(key)
          .agg(dAggs.head, dAggs.tail: _*)
        // one groups-sized pass: the non-null key range AND whether a
        // NULL group key appears in the delta (min/max ignore nulls,
        // so the range alone would misclassify an all-null delta as
        // all-cancelling and silently drop it)
        val mm = delta.agg(min(col(key)), max(col(key)),
          sum(when(col(key).isNull, 1L).otherwise(0L))).head
        val hasNullKey = !mm.isNullAt(2) && mm.getLong(2) > 0
        if (mm.isNullAt(0) && !hasNullKey)
          Some((Nil, Nil, mvSnap.schema,
            Some((appId(sourceRoot), srcV)))) // empty delta: txn tag only
        else {
          // only MV files whose zone maps overlap the changed keys are
          // rewritten; a disjoint file provably holds no changed group.
          // A NULL-key delta additionally touches every file whose key
          // stats report nulls (or carry no stats — an all-null file
          // has none): the null group lives outside any [min,max].
          val touched = mvSnap.files.filter { f =>
            val rangeHit = !mm.isNullAt(0) && GraftTable.mayMatch(f,
              GraftTable.Range(key, Some(mm.get(0)), Some(mm.get(1))))
            val nullHit = hasNullKey && f.stats.get(key).forall(_.nulls > 0)
            rangeHit || nullHit
          }
          val target = GraftTable.readFiles(spark, mvRoot, mvSnap, touched)
          // null-safe (<=>) join: a plain equi-join never matches NULL
          // to NULL, which would split the null group into duplicate
          // MV rows with partial counts
          val sumExprs = sumCols.indices.map { i =>
            val n = sName(i)
            val t = target.schema(n).dataType
            (coalesce(col(n), lit(0).cast(t)) +
              coalesce(col(s"d$n"), lit(0).cast(t))).cast(t).as(n)
          }
          val merged = target.alias("t")
            .join(delta.alias("d"),
              col(s"t.$key") <=> col(s"d.$key"), "full_outer")
            .select(coalesce(col(s"t.$key"), col(s"d.$key")).as(key) +:
              (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                .as("n") +: sumExprs: _*)
            .filter(col("n") > 0)
          Some((GraftTable.writeData(spark, mvRoot, merged, mvSnap.schema),
            touched.map(_.path), mvSnap.schema,
            Some((appId(sourceRoot), srcV))))
        }
      }
    }
  }

  /** [[create]] for an MV that also maintains MIN/MAX of `extCol`:
    * `(key, n, s, mn, mx)`. Extremes are the classically "hard"
    * incremental aggregates — an insert updates them monotonically,
    * but deleting the stored extreme needs the group's NEXT-best
    * value, which no delta carries. [[refreshExtremes]] handles that
    * with the textbook dirty-group repair: affected groups (and only
    * those) re-aggregate from a zone-map-pruned scan of the source AS
    * OF the refresh version.
    */
  def createExtremes(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCol: String, extCol: String,
      targetFiles: Int = 8): Long = {
    val srcSnap = GraftTable.snapshot(spark, sourceRoot)
    require(srcSnap.version >= 0, s"source table $sourceRoot is empty")
    val full = GraftTable.read(spark, sourceRoot)
      .groupBy(key)
      .agg(count(lit(1)).as("n"), sum(col(sumCol)).as("s"),
        min(col(extCol)).as("mn"), max(col(extCol)).as("mx"))
      .repartitionByRange(targetFiles, col(key))
      .sortWithinPartitions(key)
    GraftTable.commitRetry(spark, mvRoot) { mvSnap =>
      Some((GraftTable.writeData(spark, mvRoot, full, full.schema),
        mvSnap.files.map(_.path), full.schema,
        Some((appId(sourceRoot), srcSnap.version))))
    }
  }

  /** Refresh a [[createExtremes]] MV. Counts and sums maintain from
    * the CDC deltas exactly as [[refreshMulti]]; extremes split
    * per group:
    *
    *   - CLEAN (no delete at-or-beyond the stored extreme): the new
    *     extreme is the monotone merge `least(mn, min(inserts))` /
    *     `greatest(mx, max(inserts))` — O(changes), no source read;
    *   - DIRTY (some delete ≤ stored min or ≥ stored max — the stored
    *     extreme may be gone): the group re-aggregates from the source
    *     AS OF the refresh version, scanned through zone-map pruning
    *     on the dirty keys' range + a null-safe semi join — O(source
    *     files overlapping the dirty keys), never O(source).
    *
    * Equality with a from-scratch aggregate is the spec'd contract;
    * deleting a DUPLICATED extreme value is conservatively dirty
    * (repair recomputes the same value — correct, just not free).
    */
  def refreshExtremes(spark: SparkSession, sourceRoot: String,
      mvRoot: String, key: String, sumCol: String, extCol: String): Long = {
    val srcV = GraftTable.snapshot(spark, sourceRoot).version
    GraftTable.commitRetry(spark, mvRoot) { mvSnap =>
      val applied = mvSnap.txns.getOrElse(appId(sourceRoot), -1L)
      require(applied >= 0, s"MV $mvRoot was never created for $sourceRoot")
      if (applied >= srcV) None
      else {
        val ins = col("_change_type") === "insert"
        val sgn = when(ins, lit(1L)).otherwise(lit(-1L))
        val delta = GraftTable.changes(spark, sourceRoot, applied, srcV)
          .groupBy(key)
          .agg(sum(sgn).as("dn"), sum(sgn * col(sumCol)).as("ds"),
            min(when(ins, col(extCol))).as("ins_mn"),
            max(when(ins, col(extCol))).as("ins_mx"),
            min(when(!ins, col(extCol))).as("del_mn"),
            max(when(!ins, col(extCol))).as("del_mx"))
        val mm = delta.agg(min(col(key)), max(col(key)),
          sum(when(col(key).isNull, 1L).otherwise(0L))).head
        val hasNullKey = !mm.isNullAt(2) && mm.getLong(2) > 0
        if (mm.isNullAt(0) && !hasNullKey)
          Some((Nil, Nil, mvSnap.schema, Some((appId(sourceRoot), srcV))))
        else {
          val touched = mvSnap.files.filter { f =>
            val rangeHit = !mm.isNullAt(0) && GraftTable.mayMatch(f,
              GraftTable.Range(key, Some(mm.get(0)), Some(mm.get(1))))
            val nullHit = hasNullKey && f.stats.get(key).forall(_.nulls > 0)
            rangeHit || nullHit
          }
          val target = GraftTable.readFiles(spark, mvRoot, mvSnap, touched)
          val j = target.alias("t")
            .join(delta.alias("d"),
              col(s"t.$key") <=> col(s"d.$key"), "full_outer")
            .withColumn("__k", coalesce(col(s"t.$key"), col(s"d.$key")))
            // dirty: a delete reached the stored extreme — or the
            // group has deletes but no stored row (inconsistent-feed
            // guard, recompute is always safe)
            .withColumn("__dirty", col("del_mn").isNotNull &&
              (col("n").isNull || col("del_mn") <= col("mn") ||
                col("del_mx") >= col("mx")))
          val clean = j.filter(!col("__dirty"))
            .select(col("__k").as(key),
              (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                .as("n"),
              (coalesce(col("s"), lit(0).cast(target.schema("s").dataType)) +
                coalesce(col("ds"), lit(0).cast(target.schema("s").dataType)))
                .cast(target.schema("s").dataType).as("s"),
              least(col("mn"), col("ins_mn")).as("mn"),
              greatest(col("mx"), col("ins_mx")).as("mx"))
            .filter(col("n") > 0)
          // dirty-group repair: bounded source re-aggregation
          val dirtyAgg = j.filter(col("__dirty"))
            .agg(min(col("__k")), max(col("__k")),
              sum(when(col("__k").isNull, 1L).otherwise(0L)),
              count(lit(1))).head
          val merged =
            if (dirtyAgg.getLong(3) == 0L) clean
            else {
              val dirtyNull = !dirtyAgg.isNullAt(2) && dirtyAgg.getLong(2) > 0
              val srcSnap = GraftTable.snapshot(spark, sourceRoot, Some(srcV))
              val srcFiles = srcSnap.files.filter { f =>
                val rangeHit = !dirtyAgg.isNullAt(0) && GraftTable.mayMatch(f,
                  GraftTable.Range(key, Some(dirtyAgg.get(0)),
                    Some(dirtyAgg.get(1))))
                val nullHit = dirtyNull && f.stats.get(key).forall(_.nulls > 0)
                rangeHit || nullHit
              }
              val dirtyKeys = j.filter(col("__dirty"))
                .select(col("__k").as(key))
              val rec = GraftTable
                .readFiles(spark, sourceRoot, srcSnap, srcFiles)
                .alias("s")
                .join(dirtyKeys.alias("k"),
                  col(s"s.$key") <=> col(s"k.$key"), "left_semi")
                .groupBy(key)
                .agg(count(lit(1)).as("n"), sum(col(sumCol)).as("s"),
                  min(col(extCol)).as("mn"), max(col(extCol)).as("mx"))
              clean.unionByName(rec
                .select(col(key), col("n"),
                  col("s").cast(target.schema("s").dataType).as("s"),
                  col("mn"), col("mx")))
            }
          Some((GraftTable.writeData(spark, mvRoot, merged, mvSnap.schema),
            touched.map(_.path), mvSnap.schema,
            Some((appId(sourceRoot), srcV))))
        }
      }
    }
  }

  /** CONTINUOUS maintenance: subscribe the MV to the source's change
    * feed (`readChangeFeed` stream) and [[refresh]] on every
    * micro-batch — the MV follows a mutable source (appends, CoW and
    * DV deletes, merges) with streaming latency. The stream is the
    * TRIGGER, not the delivery channel: refresh reads its own
    * version-bounded change range and commits under the MV ledger, so
    * re-delivered or overlapping triggers are absorbed and the result
    * is exactly-once regardless of the engine's replay behavior.
    */
  def follow(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    followWith(spark, sourceRoot, mvRoot, checkpoint) { () =>
      refresh(spark, sourceRoot, mvRoot, key, sumCol); ()
    }

  /** [[follow]] for a [[createExtremes]] MV — the min/max MV tracks a
    * mutable source continuously; deletes that hit stored extremes
    * trigger the bounded dirty-group repair per micro-batch.
    */
  def followExtremes(spark: SparkSession, sourceRoot: String, mvRoot: String,
      key: String, sumCol: String, extCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    followWith(spark, sourceRoot, mvRoot, checkpoint) { () =>
      refreshExtremes(spark, sourceRoot, mvRoot, key, sumCol, extCol); ()
    }

  private def followWith(spark: SparkSession, sourceRoot: String,
      mvRoot: String, checkpoint: String)(doRefresh: () => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("grafttable")
      .option("path", sourceRoot)
      .option("readChangeFeed", "true")
      .option("startingVersion",
        appliedVersion(spark, sourceRoot, mvRoot).toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) => doRefresh() }
      .start()
}
