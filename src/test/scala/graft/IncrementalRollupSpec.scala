package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{GraftTable, IncrementalRollup}

/** Incremental view maintenance over the table format: the MV follows
  * the source through appends, CoW deletes, and MERGEs by consuming
  * the CDC feed — refresh cost scoped to the changed keys, result
  * always equal to a full recompute, replays absorbed by the ledger.
  */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def recompute(src: String) =
    GraftTable.read(spark, src).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def mvContent(mv: String) =
    GraftTable.read(spark, mv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("refresh ≡ full recompute across append/delete/merge; pruned CoW; replay no-op") {
    val base = Files.createTempDirectory("inc_rollup")
    val (src, mv) = (s"$base/src", s"$base/mv")
    // 100 groups, clustered so both tables get range-disjoint files
    val initial = (0L until 1000L).map(i => (i % 100, i, i * 3))
      .toDF("grp", "id", "v")
      .repartitionByRange(4, col("grp")).sortWithinPartitions("grp")
    GraftTable.append(spark, src, initial)
    IncrementalRollup.create(spark, src, mv, "grp", "v", targetFiles = 4)
    assert(mvContent(mv) == recompute(src), "create must equal recompute")

    // source moves: an append confined to low groups, a CoW delete
    GraftTable.append(spark, src,
      (0L until 50L).map(i => (i % 10, 10000 + i, 7L)).toDF("grp", "id", "v"))
    GraftTable.deleteWhere(spark, src, "grp = 3",
      Some(GraftTable.Range("grp", Some(3L), Some(3L))))
    val before = GraftTable.snapshot(spark, mv)
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(mvContent(mv) == recompute(src),
      "incremental refresh must equal a full recompute")
    assert(!mvContent(mv).exists(_._1 == 3L),
      "a group whose count reaches zero must leave the MV")
    // delta keys ⊆ [0,9]: MV files whose zone maps are disjoint survive
    val after = GraftTable.snapshot(spark, mv)
    val survived = before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet)
    assert(survived.size == 3,
      s"only the overlapping MV file may rewrite, survived=${survived.size}")

    // caught-up refresh: no new MV version
    val v = GraftTable.snapshot(spark, mv).version
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(GraftTable.snapshot(spark, mv).version == v,
      "a caught-up refresh must be a no-op commit")

    // a MERGE (update+insert+tombstone) flows through as delete+insert
    val changes = Seq(
      (5L, 5L, 999L, 1L, "U"),       // rewrite one row of grp 5
      (777L, 77000L, 11L, 1L, "I"),  // brand-new group 777
      (7L, 7L, 0L, 1L, "D")          // tombstone one row of grp 7
    ).toDF("grp", "id", "v", "version", "op")
    GraftTable.merge(spark, src, changes, Seq("id"), "version", "op")
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(mvContent(mv) == recompute(src),
      "merge-driven refresh must equal a full recompute")
    assert(mvContent(mv).exists(t => t._1 == 777L && t._2 == 1L && t._3 == 11L),
      "a new group must insert into the MV")
  }

  test("exactly-once: a replayed refresh for an already-applied source version is absorbed") {
    val base = Files.createTempDirectory("inc_rollup_once")
    val (src, mv) = (s"$base/src", s"$base/mv")
    GraftTable.append(spark, src,
      (0L until 100L).map(i => (i % 5, i, i)).toDF("grp", "id", "v"))
    IncrementalRollup.create(spark, src, mv, "grp", "v")
    GraftTable.append(spark, src, Seq((0L, 1000L, 1L)).toDF("grp", "id", "v"))
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    val state = mvContent(mv)
    val v = GraftTable.snapshot(spark, mv).version
    // the crash-retry shape: same source version refreshed again
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(GraftTable.snapshot(spark, mv).version == v && mvContent(mv) == state,
      "the ledger must absorb a replayed refresh — no double-application")
    assert(IncrementalRollup.appliedVersion(spark, src, mv) ==
      GraftTable.snapshot(spark, src).version)
  }

  test("multi-measure MV: several sums maintain in one refresh, ≡ full recompute") {
    val base = Files.createTempDirectory("inc_multi")
    val (src, mv) = (s"$base/src", s"$base/mv")
    val initial = (0L until 500L).map(i => (i % 20, i, i * 3, i % 7))
      .toDF("grp", "id", "v", "w")
    GraftTable.append(spark, src, initial)
    IncrementalRollup.createMulti(spark, src, mv, "grp", Seq("v", "w"))
    def recomputeMulti() =
      GraftTable.read(spark, src).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("w")).as("s_1"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    def mvMulti() = GraftTable.read(spark, mv)
      .select("grp", "n", "s", "s_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(mvMulti() == recomputeMulti())
    // append + DV delete, one refresh maintains BOTH measures
    GraftTable.append(spark, src,
      (500L until 600L).map(i => (i % 20, i, i * 3, i % 7))
        .toDF("grp", "id", "v", "w"))
    GraftTable.deleteWhereDv(spark, src, "id % 9 = 0", None)
    IncrementalRollup.refreshMulti(spark, src, mv, "grp", Seq("v", "w"))
    assert(mvMulti() == recomputeMulti(),
      "multi-measure refresh diverged from full recompute")
  }

  test("follow: the MV tracks a mutable source continuously off the change-feed stream") {
    val base = Files.createTempDirectory("inc_follow")
    val (src, mv) = (s"$base/src", s"$base/mv")
    val initial = (0L until 300L).map(i => (i % 10, i, i * 2))
      .toDF("grp", "id", "v")
    GraftTable.append(spark, src, initial)
    IncrementalRollup.create(spark, src, mv, "grp", "v")
    val q = IncrementalRollup.follow(spark, src, mv, "grp", "v",
      s"$base/ckpt")
    try {
      GraftTable.append(spark, src,
        (300L until 400L).map(i => (i % 10, i, i * 2)).toDF("grp", "id", "v"))
      q.processAllAvailable()
      assert(mvContent(mv) == recompute(src), "MV lagged an append")
      // a DV delete flows through the change feed too
      GraftTable.deleteWhereDv(spark, src, "id < 50", None)
      q.processAllAvailable()
      assert(mvContent(mv) == recompute(src), "MV lagged a DV delete")
      assert(IncrementalRollup.appliedVersion(spark, src, mv) ==
        GraftTable.snapshot(spark, src).version)
    } finally q.stop()
  }

  test("followExtremes: the min/max MV tracks appends AND extreme-hitting deletes") {
    val base = Files.createTempDirectory("inc_follow_ext")
    val (src, mv) = (s"$base/src", s"$base/mv")
    GraftTable.append(spark, src,
      (0L until 300L).map(i => (i % 10, i, i * 2)).toDF("grp", "id", "v"))
    IncrementalRollup.createExtremes(spark, src, mv, "grp", "v", "v")
    val q = IncrementalRollup.followExtremes(spark, src, mv, "grp", "v", "v",
      s"$base/ckpt")
    try {
      // append extends maxima (monotone path)
      GraftTable.append(spark, src,
        (300L until 350L).map(i => (i % 10, i, i * 2)).toDF("grp", "id", "v"))
      q.processAllAvailable()
      assert(mvExt(mv) == recomputeExt(src), "MV lagged an append")
      // DV-delete the global maxima: the stream must run the repair
      GraftTable.deleteWhereDv(spark, src, "v >= 600", None)
      q.processAllAvailable()
      assert(mvExt(mv) == recomputeExt(src),
        "MV lagged an extreme-hitting delete (dirty repair via stream)")
    } finally q.stop()
  }

  test("NULL group keys: the null group maintains as one row, never drops or splits") {
    val base = Files.createTempDirectory("inc_rollup_null")
    val (src, mv) = (s"$base/src", s"$base/mv")
    def nullable(grp: Option[Long], id: Long, v: Long) =
      (grp.map(java.lang.Long.valueOf).orNull, id, v)
    def recomputeN(s: String) = GraftTable.read(spark, s).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    def mvN(m: String) = GraftTable.read(spark, m).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    // initial state already contains a null group
    GraftTable.append(spark, src,
      (Seq(nullable(None, 900L, 5L), nullable(None, 901L, 7L)) ++
        (0L until 40L).map(i => nullable(Some(i % 4), i, i)))
        .toDF("grp", "id", "v"))
    IncrementalRollup.create(spark, src, mv, "grp", "v", targetFiles = 2)
    assert(mvN(mv) == recomputeN(src))
    // an ALL-null-key delta: before the fix min/max==null classified
    // this as "all-cancelling" and silently dropped it
    GraftTable.append(spark, src,
      Seq(nullable(None, 902L, 11L), nullable(None, 903L, 13L))
        .toDF("grp", "id", "v"))
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(mvN(mv) == recomputeN(src),
      "an all-null-key delta must maintain the null group")
    assert(mvN(mv).contains((None, 4L, 36L)), s"got ${mvN(mv)}")
    // a MIXED delta: null group + real groups in one refresh — the
    // plain equi-join used to split the null group into duplicates
    GraftTable.append(spark, src,
      (Seq(nullable(None, 904L, 2L)) ++
        (0L until 8L).map(i => nullable(Some(i % 4), 500 + i, 10L)))
        .toDF("grp", "id", "v"))
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(mvN(mv) == recomputeN(src), "mixed null+real delta must match recompute")
    assert(mvN(mv).count(_._1.isEmpty) == 1, "exactly ONE null-group MV row")
    // deleting every null-key row drops the null group from the MV
    GraftTable.deleteWhere(spark, src, "grp IS NULL", None)
    IncrementalRollup.refresh(spark, src, mv, "grp", "v")
    assert(mvN(mv) == recomputeN(src))
    assert(!mvN(mv).exists(_._1.isEmpty), "null group fully cancelled must drop")
  }

  private def recomputeExt(src: String) =
    GraftTable.read(spark, src).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def mvExt(mv: String) =
    GraftTable.read(spark, mv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("extremes MV: monotone inserts clean, deleted extremes repair, ≡ recompute") {
    val base = Files.createTempDirectory("inc_ext")
    val (src, mv) = (s"$base/src", s"$base/mv")
    // values chosen so each group's min is 0·g and max is 9000+g
    val initial = (0L until 100L).flatMap(g =>
      (0L until 10L).map(i => (g, g * 100 + i, i * 1000 + g)))
      .toDF("grp", "id", "v")
      .repartitionByRange(4, col("grp")).sortWithinPartitions("grp")
    GraftTable.append(spark, src, initial)
    IncrementalRollup.createExtremes(spark, src, mv, "grp", "v", "v",
      targetFiles = 4)
    assert(mvExt(mv) == recomputeExt(src), "create must equal recompute")

    // CLEAN refresh: inserts that extend some maxima, touch no minima
    GraftTable.append(spark, src,
      (0L until 20L).map(g => (g, 20000 + g, 50000L + g)).toDF("grp", "id", "v"))
    IncrementalRollup.refreshExtremes(spark, src, mv, "grp", "v", "v")
    assert(mvExt(mv) == recomputeExt(src),
      "insert-only refresh must equal recompute (monotone path)")

    // DIRTY refresh: delete the stored MAX of groups 0-19 (the 50000+g
    // rows) AND the stored MIN of group 7 — repair must find the
    // next-best extremes from the source
    GraftTable.deleteWhere(spark, src, "v >= 50000 OR (grp = 7 AND v = 7)",
      prune = None)
    val before = GraftTable.snapshot(spark, mv)
    IncrementalRollup.refreshExtremes(spark, src, mv, "grp", "v", "v")
    assert(mvExt(mv) == recomputeExt(src),
      "deleting stored extremes must trigger exact repair")
    // the delta was confined to groups 0-19: disjoint MV files survive
    val after = GraftTable.snapshot(spark, mv)
    assert(before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet).size == 3,
      "only the overlapping MV file may rewrite")

    // group fully deleted → leaves the MV; replayed refresh is a no-op
    GraftTable.deleteWhere(spark, src, "grp = 5",
      Some(GraftTable.Range("grp", Some(5L), Some(5L))))
    IncrementalRollup.refreshExtremes(spark, src, mv, "grp", "v", "v")
    assert(mvExt(mv) == recomputeExt(src))
    assert(!mvExt(mv).exists(_._1 == 5L))
    val v0 = GraftTable.snapshot(spark, mv).version
    IncrementalRollup.refreshExtremes(spark, src, mv, "grp", "v", "v")
    assert(GraftTable.snapshot(spark, mv).version == v0,
      "caught-up refresh must not commit")
  }
}
