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
    spark.readStream.format("grafttable")
      .option("path", sourceRoot)
      .option("readChangeFeed", "true")
      .option("startingVersion",
        appliedVersion(spark, sourceRoot, mvRoot).toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, sourceRoot, mvRoot, key, sumCol); ()
      }
      .start()
}
