package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Canonical, Tables}
import graft.operators.{Layout, Merge, Scale}
import graft.queries.Contract.Q

/** Engine-mutation and storage-layout queries: changelog MERGE
  * (upsert + delete) and Z-order clustering keys. Both are judged
  * end-to-end against DuckDB — the merge via an equivalent
  * QUALIFY/anti-join program, the Z-order key via the SAME unrolled
  * bit-arithmetic spelling ([[Layout.zorderKeySql]]), so engine and
  * oracle cannot drift.
  */
object EngineOps {

  private def orders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")

  private val oCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Changelog MERGE: two update generations, tombstones, and inserts
    // derived deterministically from the target itself; latest version
    // wins per key, a final 'D' removes the key. Exercises
    // Merge.applyChangelog end-to-end (compaction + anti-join + union).
    ("merge_changelog",
      (s: SparkSession, dir: String) => {
        val o = orders(s, dir)
        val upd1 = o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("o_orderstatus", lit("R"))
          .withColumn("version", lit(1L)).withColumn("op", lit("U"))
        val upd2 = o.filter(col("o_orderkey") % 14 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 2.0)
          .withColumn("o_orderstatus", lit("S"))
          .withColumn("version", lit(2L)).withColumn("op", lit("U"))
        val del = o.filter(col("o_orderkey") % 13 === 0)
          .withColumn("version", lit(3L)).withColumn("op", lit("D"))
        val ins = o.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
          .withColumn("o_orderstatus", lit("N"))
          .withColumn("version", lit(1L)).withColumn("op", lit("I"))
        val chg = upd1.unionByName(upd2).unionByName(del).unionByName(ins)
        Merge.applyChangelog(o, chg, Seq("o_orderkey"), "version", "op")
          .orderBy("o_orderkey")
      },
      Some("""WITH chg AS (
                SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
                       o_totalprice + 1.0 AS o_totalprice, o_orderdate,
                       o_orderpriority, 1 AS version, 'U' AS op
                  FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey, o_custkey, 'S', o_totalprice + 2.0,
                       o_orderdate, o_orderpriority, 2, 'U'
                  FROM orders WHERE o_orderkey % 14 = 0
                UNION ALL
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       o_orderdate, o_orderpriority, 3, 'D'
                  FROM orders WHERE o_orderkey % 13 = 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
                       o_orderdate, o_orderpriority, 1, 'I'
                  FROM orders WHERE o_orderkey % 11 = 0),
              latest AS (
                SELECT * FROM chg
                QUALIFY row_number() OVER (PARTITION BY o_orderkey
                                           ORDER BY version DESC) = 1)
              SELECT o.* FROM orders o
                ANTI JOIN latest l ON o.o_orderkey = l.o_orderkey
              UNION ALL
              SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                     o_orderdate, o_orderpriority
                FROM latest WHERE op <> 'D'
              ORDER BY o_orderkey""")),

    // Z-order (Morton) clustering key over two bounded dimensions of
    // the events table — the write-time layout that makes parquet
    // row-group stats prune on BOTH dimensions (see LayoutSpec for the
    // row-group-stats pruning proof; this query judges the key bits).
    ("layout_zorder",
      (s: SparkSession, dir: String) => {
        val e = Tables(s, dir, "events")
        e.select(col("event_id"),
          (col("user_id") % 65536).as("zx"),
          (col("event_id") % 65536).as("zy"))
          .withColumn("zkey", Layout.zorderKey2(col("zx"), col("zy")))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id % 65536 AS zx,
                      event_id % 65536 AS zy,
                      ${Layout.zorderKeySql("(user_id % 65536)", "(event_id % 65536)")} AS zkey
               FROM events ORDER BY event_id""")),

    // Dynamic partition pruning, end-to-end: orders is re-laid-out
    // hive-partitioned by year (write-once per source generation —
    // Scale.hivePartitionedCopy), then joined on the PARTITION column
    // against a filtered dim small enough to broadcast. Catalyst's DPP
    // rule turns the broadcast into a partition filter on the fact scan
    // (dynamicpruningexpression — asserted in DppSpec, which also
    // checks the scan's numPartitions metric reads 3 of the 7 year
    // partitions: 1995/1998/2001 of 1995-2001), so at
    // 100 TB the scan touches only the dim-selected partitions instead
    // of every file. The result itself is hash-judged against a plain
    // join on the unpartitioned table — same rows, pruned scan.
    ("dpp_partitioned_join",
      (s: SparkSession, dir: String) => {
        val o = orders(s, dir)
          .withColumn("o_year", year(col("o_orderdate")).cast("int"))
        val path = Scale.hivePartitionedCopy(
          o, s"$dir/orders.parquet", "orders_by_year", "o_year")
        val fact = s.read.parquet(path)
        // dim lives in parquet, not memory: a Filter over a file scan is
        // the selective predicate the DPP rule latches onto (over a
        // LocalRelation it constant-folds away and no pruning happens)
        val dimPath = Scale.writeOnceParquet(
          s.createDataFrame((1995 to 2001).map(y => (y, y % 3)))
            .toDF("d_year", "tier"),
          s"$dir/orders.parquet", "year_dim", contentTag = "years_1995_2001_mod3")
        val dim = s.read.parquet(dimPath)
        fact.join(broadcast(dim.filter(col("tier") === 0)),
            col("o_year") === col("d_year"))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("o_totalprice")).as("sum_price"))
          .select(col("o_year").cast("bigint").as("o_year"),
            col("n"), col("sum_price"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                      COUNT(*) AS n,
                      ${Canonical.moneySumSql("o_totalprice")} AS sum_price
               FROM orders
               JOIN (VALUES (1995), (1998), (2001)) AS d(d_year)
                 ON EXTRACT(year FROM o_orderdate) = d.d_year
               GROUP BY 1 ORDER BY o_year""")),

    // Custom DataSource V2 connector, judged end-to-end: the graftgen
    // synthetic table (graft.sources.GenSource — column pruning + exact
    // id-bound pushdown + partition pruning, all plan-asserted in
    // GenSourceSpec) aggregated per device over a pushed id window. The
    // oracle REGENERATES the same table from range() because every cell
    // is a pure integer function of id — two engines, two generators,
    // one answer. The id bounds prune 4 of 8 input partitions before
    // any row is produced.
    ("dsv2_gen_agg",
      (s: SparkSession, dir: String) =>
        s.read.format("graftgen")
          .option("rows", "100000").option("partitions", "8").load()
          .filter(col("id") >= 20000L && col("id") < 60000L)
          .groupBy("device")
          .agg(count(lit(1)).as("n"),
            sum(col("reading")).as("sum_r"),
            min(col("reading")).as("min_r"),
            max(col("reading")).as("max_r"),
            min(col("ts_us")).as("first_ts"))
          .orderBy("device"),
      Some("""SELECT 'd' || CAST(id % 50 AS VARCHAR) AS device,
                     COUNT(*) AS n,
                     CAST(SUM((id * 2654435761) % 10000) AS BIGINT) AS sum_r,
                     MIN((id * 2654435761) % 10000) AS min_r,
                     MAX((id * 2654435761) % 10000) AS max_r,
                     MIN(1700000000000000 + id * 1000000) AS first_ts
              FROM (SELECT range AS id FROM range(100000))
              WHERE id >= 20000 AND id < 60000
              GROUP BY device ORDER BY device""")),

    // Materialized-view rewrite, judged END-TO-END: the query below is
    // optimized by RollupRewriteRule into a scan of the pre-aggregated
    // rollup (RollupRewriteSpec asserts the plan swap on this exact
    // query), while the oracle computes from the BASE table — so the
    // hash gate proves the rewrite answer-preserving, not just
    // plan-shaped. The base is a write-once COPY of orders at its own
    // path so the registered descriptor can never touch the shared
    // orders scans of other queries; the flag stays on (exact-path
    // matching confines the rule to the copy).
    ("mv_rollup_rewrite",
      (s: SparkSession, dir: String) => {
        val base = Tables.read(s, s"$dir/orders.parquet")
        val basePath = Scale.writeOnceParquet(
          base, s"$dir/orders.parquet", "orders_mv_base", contentTag = "mv_v1")
        graft.plans.MaterializedRollup.install(s)
        graft.plans.MaterializedRollup.create(s, s.read.parquet(basePath),
          baseTag = basePath,
          groupKeys = Seq("o_orderpriority", "o_orderstatus"),
          sumCols = Seq("o_custkey"), mvPath = s"$basePath-rollup")
        s.conf.set(graft.plans.MaterializedRollup.flag, "true")
        s.read.parquet(basePath)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sumc"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
                     CAST(SUM(o_custkey) AS BIGINT) AS sumc
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Transaction-log table format (graft.table.GraftTable), judged
    // END-TO-END through TIME TRAVEL: lineitem lands in three atomic
    // commits split by ship year, the query reads the table AS OF
    // version 1 (first two commits = shipdate < 1996), and the oracle
    // computes the same answer from the raw table with the equivalent
    // predicate — so the hash gate proves the log replay returns
    // exactly the committed snapshot, not "roughly the data". The
    // build is write-once per source generation (same fingerprint
    // discipline as Scale.writeOnce) and each build commit carries a
    // txn tag, so a process killed mid-build resumes idempotently.
    ("table_time_travel",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate")
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "tt_v1".hashCode.toLong)
        val root = s"target/graft_table/tt_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root,
              li.filter(col("l_shipdate") < "1994-01-01"),
              txn = Some(("tt_build", 0L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1994-01-01" &&
                col("l_shipdate") < "1996-01-01"),
              txn = Some(("tt_build", 1L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1996-01-01"),
              txn = Some(("tt_build", 2L)))
          }
        }
        gt.read(s, root, Some(1L))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The table format's CDC change feed, judged END-TO-END: lineitem
    // lands in two append commits (pre-1994 / 1994-95), then a
    // copy-on-write delete of the pre-1993-06 rows rewrites every
    // file. GraftTable.changes(0, 2) must surface commit 1 as exactly
    // the appended rows (pure-append fast path) and commit 2 as
    // exactly the deleted rows — every carried-over row in the
    // rewritten files has to cancel in the bag-diff — and the oracle
    // rebuilds both change sets relationally from the raw table. Same
    // write-once fingerprint + txn-tag build discipline as
    // table_time_travel; the delete only runs when the log is at
    // exactly the post-append version, so a killed build resumes
    // without double-deleting.
    ("table_cdc",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate")
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "cdc_v1".hashCode.toLong)
        val root = s"target/graft_table/cdc_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root,
              li.filter(col("l_shipdate") < "1994-01-01"),
              txn = Some(("cdc_build", 0L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1994-01-01" &&
                col("l_shipdate") < "1996-01-01"),
              txn = Some(("cdc_build", 1L)))
            if (gt.snapshot(s, root).version == 1L)
              gt.deleteWhere(s, root,
                "l_shipdate < TIMESTAMP '1993-06-01'", prune = None)
          }
        }
        gt.changes(s, root, 0L, 2L)
          .groupBy("_commit_version", "_change_type", "l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("_commit_version", "_change_type", "l_returnflag")
      },
      Some(s"""SELECT * FROM (
                 SELECT CAST(1 AS BIGINT) AS _commit_version,
                        'insert' AS _change_type, l_returnflag,
                        COUNT(*) AS n,
                        ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1994-01-01'
                   AND l_shipdate < TIMESTAMP '1996-01-01'
                 GROUP BY l_returnflag
                 UNION ALL
                 SELECT CAST(2 AS BIGINT), 'delete', l_returnflag,
                        COUNT(*), ${Canonical.moneySumSql("l_quantity")}
                 FROM lineitem
                 WHERE l_shipdate < TIMESTAMP '1993-06-01'
                 GROUP BY l_returnflag)
               ORDER BY _commit_version, _change_type, l_returnflag""")),

    // Merge-on-read deletion vectors judged END-TO-END: lineitem lands
    // in two append commits, then deleteWhereDv masks every low-
    // quantity row — scattered across ALL files, the selective-delete
    // shape DVs exist for (a CoW delete would rewrite the whole
    // table; the DV commit writes one small position parquet and
    // touches no data file). The judged output is BOTH sides of the
    // contract: the post-delete table state (masked read path) and
    // the DV commit's change feed (exactly the newly-masked rows),
    // each hash-checked against relational reconstruction from the
    // raw table. Build is write-once with txn-tagged appends; the DV
    // delete only runs at exactly the post-append version.
    ("table_dv_delete",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate")
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "dv_v1".hashCode.toLong)
        val root = s"target/graft_table/dv_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root,
              li.filter(col("l_shipdate") < "1995-01-01"),
              txn = Some(("dv_build", 0L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1995-01-01"),
              txn = Some(("dv_build", 1L)))
            if (gt.snapshot(s, root).version == 1L)
              gt.deleteWhereDv(s, root, "l_quantity <= 10", prune = None)
          }
        }
        val state = gt.read(s, root)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"))
          .withColumn("section", lit("state"))
        val cdc = gt.changes(s, root, 1L, 2L)
          .filter(col("_change_type") === "delete")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"))
          .withColumn("section", lit("cdc_delete"))
        state.unionByName(cdc)
          .select("section", "l_returnflag", "n", "sum_qty")
          .orderBy("section", "l_returnflag")
      },
      Some(s"""SELECT * FROM (
                 SELECT 'state' AS section, l_returnflag,
                        COUNT(*) AS n,
                        ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                 FROM lineitem WHERE NOT (l_quantity <= 10)
                 GROUP BY l_returnflag
                 UNION ALL
                 SELECT 'cdc_delete', l_returnflag,
                        COUNT(*), ${Canonical.moneySumSql("l_quantity")}
                 FROM lineitem WHERE l_quantity <= 10
                 GROUP BY l_returnflag)
               ORDER BY section, l_returnflag""")),

    // Copy-on-write UPDATE judged END-TO-END: lineitem lands in two
    // append commits, then updateWhere bumps every 'R'-flag row's
    // quantity by 5 (SET expressions evaluate against the pre-update
    // row and cast back to the declared type). The judged output is
    // the full post-update state; the oracle reconstructs it with a
    // CASE projection over the raw table. Same write-once fingerprint
    // + txn-tag discipline; the update only runs at exactly the
    // post-append version so a killed build resumes without
    // double-updating.
    ("table_update",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate")
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "upd_v1".hashCode.toLong)
        val root = s"target/graft_table/upd_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root,
              li.filter(col("l_shipdate") < "1995-01-01"),
              txn = Some(("upd_build", 0L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1995-01-01"),
              txn = Some(("upd_build", 1L)))
            if (gt.snapshot(s, root).version == 1L)
              gt.updateWhere(s, root, "l_returnflag = 'R'",
                Seq("l_quantity" -> "l_quantity + 5"))
          }
        }
        gt.read(s, root)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql(
        "CASE WHEN l_returnflag = 'R' THEN l_quantity + 5 " +
          "ELSE l_quantity END")} AS sum_qty
               FROM lineitem
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Range DELETE with the metadata-only fast path judged END-TO-END:
    // lineitem lands in two commits split at a data-derived but
    // ORACLE-EXACT boundary (half the max orderkey, integer division —
    // no partitioner sampling in the contract), then deleteRange cuts
    // at exactly that boundary: every low-side file is PROVABLY fully
    // covered (its zone-map max ≤ the cut) and drops from the log
    // without being read; the high side's files are never candidates.
    // The drop-partition shape, hash-judged: the output is the
    // post-delete state AND the delete commit's change feed (which for
    // a dropped-file commit is every dropped row), both against
    // relational reconstruction at the same boundary. The DML soak
    // proves the 0-files-written cost model at sf1; this query pins
    // the CONTENT contract under the DuckDB hash gate.
    ("table_delete_range",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        val cut = li.agg(max(col("l_orderkey"))).head.get(0)
          .asInstanceOf[Number].longValue / 2
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "rng_v1".hashCode.toLong)
        val root = s"target/graft_table/rng_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root, li.filter(col("l_orderkey") <= cut),
              txn = Some(("rng_build", 0L)))
            gt.append(s, root, li.filter(col("l_orderkey") > cut),
              txn = Some(("rng_build", 1L)))
            if (gt.snapshot(s, root).version == 1L)
              gt.deleteRange(s, root,
                graft.table.GraftTable.Range("l_orderkey", None, Some(cut)))
          }
        }
        val v = gt.snapshot(s, root).version
        val state = gt.read(s, root)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"),
            min(col("l_orderkey")).as("min_key"))
          .withColumn("section", lit("state"))
        val cdc = gt.changes(s, root, v - 1, v)
          .filter(col("_change_type") === "delete")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("l_quantity")).as("sum_qty"),
            min(col("l_orderkey")).as("min_key"))
          .withColumn("section", lit("cdc_delete"))
        state.unionByName(cdc)
          .select("section", "l_returnflag", "n", "sum_qty", "min_key")
          .orderBy("section", "l_returnflag")
      },
      Some(s"""WITH cut AS (
                 SELECT CAST(MAX(l_orderkey) AS BIGINT) / 2 AS k
                 FROM lineitem),
               state AS (
                 SELECT 'state' AS section, l_returnflag,
                        COUNT(*) AS n,
                        ${Canonical.moneySumSql("l_quantity")} AS sum_qty,
                        MIN(l_orderkey) AS min_key
                 FROM lineitem, cut WHERE l_orderkey > cut.k
                 GROUP BY l_returnflag),
               cdc AS (
                 SELECT 'cdc_delete' AS section, l_returnflag,
                        COUNT(*) AS n,
                        ${Canonical.moneySumSql("l_quantity")} AS sum_qty,
                        MIN(l_orderkey) AS min_key
                 FROM lineitem, cut WHERE l_orderkey <= cut.k
                 GROUP BY l_returnflag)
               SELECT * FROM (SELECT * FROM state UNION ALL SELECT * FROM cdc)
               ORDER BY section, l_returnflag""")),

    // Tri-clause MERGE INTO judged END-TO-END: the orders table (keyed
    // by o_orderkey, money as exact cents) lands in two append
    // commits, then ONE mergeInto applies updates (k%7=0: add a
    // key-derived delta), deletes (k%11=0 minus the update keys), and
    // inserts (k%13=0, key shifted past the domain) — the three DML
    // verbs in one atomic commit, with clause conditions reading the
    // source's op column. The judged output is the full post-merge
    // state; the oracle reconstructs it relationally (LEFT JOIN +
    // CASE + UNION ALL of inserts). Build is write-once with
    // txn-tagged appends; the merge runs only at exactly the
    // post-append version.
    ("table_merge_into",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val base = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            (Canonical.dec(col("o_totalprice")) * 100).cast("long").as("tc"))
        val srcF = new java.io.File(s"$dir/orders.parquet")
        val fp = java.lang.Long.toHexString(
          srcF.length ^ (srcF.lastModified * 31) ^ "mrg_v1".hashCode.toLong)
        val root = s"target/graft_table/mrg_$fp"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 2L) {
            gt.append(s, root, base.filter(col("o_orderkey") % 2 === 0),
              txn = Some(("mrg_build", 0L)))
            gt.append(s, root, base.filter(col("o_orderkey") % 2 =!= 0),
              txn = Some(("mrg_build", 1L)))
            if (gt.snapshot(s, root).version == 1L) {
              val u = base.filter(col("o_orderkey") % 7 === 0)
                .select(col("o_orderkey"), lit("U").as("op"),
                  (col("o_orderkey") % 100 + 1).as("delta"))
              val d = base.filter(col("o_orderkey") % 7 =!= 0 &&
                  col("o_orderkey") % 11 === 0)
                .select(col("o_orderkey"), lit("D").as("op"),
                  lit(0L).as("delta"))
              val i = base.filter(col("o_orderkey") % 13 === 0)
                .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
                  lit("I").as("op"), (col("o_orderkey") % 1000).as("delta"))
              gt.mergeInto(s, root, u.unionByName(d).unionByName(i),
                Seq("o_orderkey"),
                matchedUpdate = Seq("tc" -> "tc + src_delta"),
                matchedUpdateCond = Some("src_op = 'U'"),
                matchedDelete = Some("src_op = 'D'"),
                notMatchedInsert = Some(Seq("o_orderstatus" -> "'I'",
                  "tc" -> "src_delta")),
                notMatchedInsertCond = Some("src_op = 'I'"))
            }
          }
        }
        gt.read(s, root)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("tc")).as("sum_tc"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH base AS (
                SELECT o_orderkey AS k, o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                         AS BIGINT) AS tc
                FROM orders),
              src AS (
                SELECT k, 'U' AS op, k % 100 + 1 AS delta
                FROM base WHERE k % 7 = 0
                UNION ALL
                SELECT k, 'D', 0 FROM base WHERE k % 7 <> 0 AND k % 11 = 0
                UNION ALL
                SELECT k + 100000000, 'I', k % 1000
                FROM base WHERE k % 13 = 0),
              kept AS (
                SELECT b.st,
                       CASE WHEN s.op = 'U' THEN b.tc + s.delta
                            ELSE b.tc END AS tc
                FROM base b LEFT JOIN src s ON b.k = s.k
                WHERE s.op IS NULL OR s.op <> 'D'),
              final AS (
                SELECT st, tc FROM kept
                UNION ALL
                SELECT 'I' AS st, delta AS tc FROM src WHERE op = 'I')
              SELECT st AS o_orderstatus, COUNT(*) AS n,
                     CAST(SUM(tc) AS BIGINT) AS sum_tc
              FROM final GROUP BY st ORDER BY st""")),

    // Incremental MV maintenance judged END-TO-END as a stateful
    // LIFECYCLE: source table built from lineitem (append pre-1994,
    // rollup MV created there, append 1994-95, CoW-delete pre-1993-06),
    // then IncrementalRollup.refresh applies the CDC deltas — and the
    // MV's CONTENT must hash-match a from-scratch relational aggregate
    // of the final source state. Exact integer cents (quantity has ≤2
    // real decimals, so ×100 is lossless) keep the incrementally-
    // maintained sums bit-equal to DuckDB's. Every build step is
    // resume-safe: appends carry txn tags, create is guarded by the
    // applied-version ledger, the delete by the exact log version, and
    // a caught-up refresh is a commit no-op.
    ("table_incremental_rollup",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val ir = graft.table.IncrementalRollup
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
            col("l_returnflag"),
            (Canonical.dec(col("l_quantity")) * 100).cast("long").as("qc"))
        val src = new java.io.File(s"$dir/lineitem.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "mvr_v1".hashCode.toLong)
        val srcRoot = s"target/graft_table/mvr_src_$fp"
        val mvRoot = s"target/graft_table/mvr_mv_$fp"
        buildLocked(s, srcRoot) {
          if (gt.snapshot(s, srcRoot).version < 2L) {
            gt.append(s, srcRoot,
              li.filter(col("l_shipdate") < "1994-01-01"),
              txn = Some(("mvr_build", 0L)))
            if (ir.appliedVersion(s, srcRoot, mvRoot) < 0L)
              ir.create(s, srcRoot, mvRoot, "l_returnflag", "qc")
            gt.append(s, srcRoot,
              li.filter(col("l_shipdate") >= "1994-01-01" &&
                col("l_shipdate") < "1996-01-01"),
              txn = Some(("mvr_build", 1L)))
            if (gt.snapshot(s, srcRoot).version == 1L)
              gt.deleteWhere(s, srcRoot,
                "l_shipdate < TIMESTAMP '1993-06-01'", prune = None)
          }
          ir.refresh(s, srcRoot, mvRoot, "l_returnflag", "qc")
        }
        gt.read(s, mvRoot)
          .select(col("l_returnflag"), col("n"), col("s").as("sum_qc"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                     CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 100
                       AS BIGINT)) AS BIGINT) AS sum_qc
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1993-06-01'
                AND l_shipdate < TIMESTAMP '1996-01-01'
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The table format behind a Spark SQL CATALOG (GraftCatalog,
    // TableCatalog + V1Scan bridge), judged through plain SQL text:
    // lineitem lands in two appends split at 1995, and the query runs
    // `SELECT … FROM <catalog>.ops.sel WHERE …` — the shipdate bound
    // translates to a pushed filter whose text re-parses into
    // zone-map pruning ranges (the first file set never opens; plan
    // shows `files 1/…` via GraftCatalogSpec), and the aggregation
    // runs over the catalog relation exactly as over the raw table.
    // Write-once fingerprinted catalog per source generation, txn-
    // tagged build.
    ("catalog_sql_select",
      (s: SparkSession, dir: String) => {
        val cat = selTable(s, dir)
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty,
                         ${Canonical.revenueSumSql("l_extendedprice", "l_discount")} AS revenue
                  FROM $cat.ops.sel
                  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                    AND l_quantity > 10
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty,
                      ${Canonical.revenueSumSql("l_extendedprice", "l_discount")} AS revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                 AND l_quantity > 10
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Metadata-only aggregate pushdown judged END-TO-END — ON A
    // DV-MASKED TABLE: lineitem (with a NULL-bearing derived column)
    // lands in two appends, then a merge-on-read DV delete masks rows
    // in both halves, including the l_orderkey minimum and some NULLs.
    // The DV commit refreshes each masked file's stats over its
    // survivors, so COUNT(*)/COUNT(col)/MIN/MAX are STILL answered
    // from commit metadata alone (GraftAggScan — zero data files
    // opened, proven destructively in GraftCatalogSpec), and the hash
    // gate proves the metadata numbers equal DuckDB's from the
    // surviving data.
    ("catalog_meta_agg",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"),
            when(col("l_linenumber") === 1, lit(null))
              .otherwise(col("l_quantity")).as("q2"))
        val (cat, nsDir) = catalogFor(s, dir, "cmeta")
        val root = s"$nsDir/meta"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 1L) {
            gt.append(s, root,
              li.filter(col("l_shipdate") < "1998-01-01"),
              txn = Some(("cat_meta", 0L)))
            gt.append(s, root,
              li.filter(col("l_shipdate") >= "1998-01-01"),
              txn = Some(("cat_meta", 1L)))
          }
          if (gt.snapshot(s, root).version == 1L)
            gt.deleteWhereDv(s, root,
              "l_orderkey < 1000 OR l_quantity > 45", None)
        }
        s.sql(s"""SELECT COUNT(*) AS n, COUNT(q2) AS nq2,
                         MIN(l_orderkey) AS min_ok,
                         MAX(l_orderkey) AS max_ok,
                         MIN(l_quantity) AS min_q,
                         MAX(l_quantity) AS max_q,
                         MIN(l_shipdate) AS min_sd,
                         MAX(l_shipdate) AS max_sd
                  FROM $cat.ops.meta""")
      },
      Some("""SELECT COUNT(*) AS n, COUNT(q2) AS nq2,
                     MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
                     MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
                     MIN(l_shipdate) AS min_sd, MAX(l_shipdate) AS max_sd
              FROM (SELECT l_orderkey, l_quantity, l_shipdate,
                           CASE WHEN l_linenumber = 1 THEN NULL
                                ELSE l_quantity END AS q2
                    FROM lineitem)
              WHERE NOT (l_orderkey < 1000 OR l_quantity > 45)""")),

    // SQL DDL + DML lifecycle through the catalog, time-travel read:
    // CREATE TABLE (v0, schema-only commit), two INSERT INTO … SELECT
    // commits (v1: pre-1994, v2: the rest), query reads
    // `VERSION AS OF 1` — the pinned snapshot must be exactly the
    // first insert. Each build step is one atomic commit guarded by
    // the version it expects, so a killed build resumes without
    // double-inserting.
    ("catalog_time_travel",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem")
          .createOrReplaceTempView("lineitem_cat_src")
        val (cat, nsDir) = catalogFor(s, dir, "ctt")
        val root = s"$nsDir/tt"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.tt (
                        l_orderkey BIGINT, l_linenumber INT,
                        l_quantity DOUBLE, l_returnflag STRING,
                        l_shipdate TIMESTAMP_NTZ)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.tt
                      SELECT l_orderkey, l_linenumber, l_quantity,
                             l_returnflag, l_shipdate
                      FROM lineitem_cat_src
                      WHERE l_shipdate < TIMESTAMP '1997-01-01'""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""INSERT INTO $cat.ops.tt
                      SELECT l_orderkey, l_linenumber, l_quantity,
                             l_returnflag, l_shipdate
                      FROM lineitem_cat_src
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01'""")
        }
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                  FROM $cat.ops.tt VERSION AS OF 1
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SQL DELETE FROM through the catalog: after CREATE + one INSERT,
    // `DELETE FROM … WHERE l_quantity <= 10` runs the copy-on-write
    // delete (filters → SQL text → pruning ranges; files whose zone
    // maps clear the bound survive unrewritten), and the judged
    // output is the post-delete state vs the raw table under the
    // negated predicate. The delete only runs at exactly the
    // post-insert version — idempotent resume.
    ("catalog_dml",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem")
          .createOrReplaceTempView("lineitem_cat_src")
        val (cat, nsDir) = catalogFor(s, dir, "cdml")
        val root = s"$nsDir/dml"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.dml (
                        l_orderkey BIGINT, l_linenumber INT,
                        l_quantity DOUBLE, l_returnflag STRING,
                        l_shipdate TIMESTAMP_NTZ)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.dml
                      SELECT l_orderkey, l_linenumber, l_quantity,
                             l_returnflag, l_shipdate
                      FROM lineitem_cat_src""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"DELETE FROM $cat.ops.dml WHERE l_quantity <= 10")
        }
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                  FROM $cat.ops.dml
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM lineitem WHERE NOT (l_quantity <= 10)
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // SQL MERGE INTO through the catalog (the analyzer-rule DML path,
    // graft.plans.GraftDmlRule): orders lands as the target; one MERGE
    // statement updates cheap %7 keys (first matching clause), deletes
    // expensive %7 keys (fall-through), and inserts shifted %11 keys.
    // %21 keys carry a NULL source price, so the UPDATE condition
    // evaluates NULL — the hash pins that those rows still fall
    // through to DELETE (the clause-order guard must negate priors
    // NULL-SAFELY: `(p) IS NOT TRUE`, not `NOT p`). Judged output is
    // the post-merge state aggregated by status; the oracle
    // reconstructs the same state relationally. Build steps are
    // guarded by the exact version each expects — atomic commits make
    // a killed build resume idempotently.
    ("catalog_sql_merge",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        orders(s, dir).createOrReplaceTempView("orders_cat_src")
        val (cat, nsDir) = catalogFor(s, dir, "cmrg2")
        val root = s"$nsDir/mrg"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.mrg (
                        o_orderkey BIGINT, o_orderstatus STRING,
                        o_totalprice DOUBLE)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.mrg
                      SELECT o_orderkey, o_orderstatus, o_totalprice
                      FROM orders_cat_src""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""MERGE INTO $cat.ops.mrg t USING (
                        SELECT o_orderkey AS k,
                               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                    ELSE o_totalprice END AS p
                        FROM orders_cat_src WHERE o_orderkey % 7 = 0
                        UNION ALL
                        SELECT o_orderkey + 10000000, o_totalprice
                        FROM orders_cat_src WHERE o_orderkey % 11 = 0)
                      s ON t.o_orderkey = s.k
                      WHEN MATCHED AND s.p < 100000
                        THEN UPDATE SET o_totalprice = t.o_totalprice + 1,
                                        o_orderstatus = 'U'
                      WHEN MATCHED THEN DELETE
                      WHEN NOT MATCHED THEN INSERT (o_orderkey,
                        o_orderstatus, o_totalprice)
                        VALUES (s.k, 'N', s.p)""")
        }
        s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n,
                         ${Canonical.moneySumSql("o_totalprice")} AS sum_price
                  FROM $cat.ops.mrg
                  GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some(s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                             FROM orders),
                    m7 AS (SELECT o_orderkey,
                                  CASE WHEN o_orderkey % 3 = 0 THEN NULL
                                       ELSE o_totalprice END AS p
                           FROM orders WHERE o_orderkey % 7 = 0),
                    fin AS (
                      SELECT b.o_orderkey,
                             CASE WHEN m.o_orderkey IS NULL
                                  THEN b.o_orderstatus ELSE 'U' END
                               AS o_orderstatus,
                             CASE WHEN m.o_orderkey IS NULL
                                  THEN b.o_totalprice
                                  ELSE b.o_totalprice + 1 END AS o_totalprice
                      FROM base b LEFT JOIN m7 m
                        ON b.o_orderkey = m.o_orderkey
                          AND m.p < 100000
                      WHERE b.o_orderkey NOT IN (
                        SELECT o_orderkey FROM m7
                        WHERE p IS NULL OR p >= 100000)
                      UNION ALL
                      SELECT o_orderkey + 10000000, 'N', o_totalprice
                      FROM orders WHERE o_orderkey % 11 = 0)
               SELECT o_orderstatus, COUNT(*) AS n,
                      ${Canonical.moneySumSql("o_totalprice")} AS sum_price
               FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // MERGE WITH SCHEMA EVOLUTION judged end-to-end: the target is
    // created WITHOUT o_orderstatus; the merge assigns it, so Spark's
    // ResolveMergeIntoSchemaEvolution (gated by the table's
    // AUTOMATIC_SCHEMA_EVOLUTION capability) routes an AddColumn
    // through GraftCatalog.alterTable before the DML rule lowers the
    // merge. Pre-evolution unmatched rows read the new column as NULL
    // ('-' bucket); matched %5 keys take their real status; inserted
    // +30M keys land as 'E'. The oracle rebuilds the same state
    // relationally — the hash pins additive evolution semantics.
    ("catalog_merge_evolve",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        orders(s, dir).createOrReplaceTempView("orders_evo_src")
        val (cat, nsDir) = catalogFor(s, dir, "cevo")
        val root = s"$nsDir/evo"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.evo (
                        o_orderkey BIGINT, o_totalprice DOUBLE)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.evo
                      SELECT o_orderkey, o_totalprice
                      FROM orders_evo_src""")
          // evolution commits addColumn (v2) then the merge (v3)
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.ops.evo t
                      USING (
                        SELECT o_orderkey AS k, o_totalprice AS p,
                               o_orderstatus
                        FROM orders_evo_src WHERE o_orderkey % 5 = 0
                        UNION ALL
                        SELECT o_orderkey + 30000000, o_totalprice, 'E'
                        FROM orders_evo_src WHERE o_orderkey % 13 = 0)
                      s ON t.o_orderkey = s.k
                      WHEN MATCHED THEN UPDATE SET
                        o_totalprice = t.o_totalprice + 3,
                        o_orderstatus = s.o_orderstatus
                      WHEN NOT MATCHED THEN INSERT (o_orderkey,
                        o_totalprice, o_orderstatus)
                        VALUES (s.k, s.p, s.o_orderstatus)""")
        }
        s.sql(s"""SELECT coalesce(o_orderstatus, '-') AS st, COUNT(*) AS n,
                         ${Canonical.moneySumSql("o_totalprice")} AS sum_price
                  FROM $cat.ops.evo
                  GROUP BY coalesce(o_orderstatus, '-') ORDER BY st""")
      },
      Some(s"""WITH m5 AS (SELECT o_orderkey, o_orderstatus FROM orders
                           WHERE o_orderkey % 5 = 0),
                    fin AS (
                      SELECT b.o_orderkey,
                             m.o_orderstatus AS st,
                             CASE WHEN m.o_orderkey IS NULL
                                  THEN b.o_totalprice
                                  ELSE b.o_totalprice + 3 END AS p
                      FROM orders b LEFT JOIN m5 m
                        ON b.o_orderkey = m.o_orderkey
                      UNION ALL
                      SELECT o_orderkey + 30000000, 'E', o_totalprice
                      FROM orders WHERE o_orderkey % 13 = 0)
               SELECT coalesce(st, '-') AS st, COUNT(*) AS n,
                      ${Canonical.moneySumSql("p")} AS sum_price
               FROM fin GROUP BY coalesce(st, '-') ORDER BY st""")),

    // Streaming reads through the SQL catalog, judged end-to-end:
    // lineitem lands in the source table via two SQL INSERTs, then a
    // Structured Streaming query consumes it BY NAME
    // (`readStream.table` → V2TableWithV1Fallback → the grafttable
    // log-version-offset source), filters, and appends into a second
    // catalog table through the exactly-once txn-ledger sink. The
    // stream step is replay-idempotent (offsets in the checkpoint,
    // sink batches keyed by the ledger), so re-runs are no-ops; the
    // judged output aggregates the streamed REBUILD and must
    // hash-match the batch oracle over raw lineitem.
    ("catalog_stream_ingest",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_str_src")
        val (cat, nsDir) = catalogFor(s, dir, "cstr")
        val root = s"$nsDir/str"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.str (
                        l_orderkey BIGINT, l_linenumber INT,
                        l_quantity DOUBLE, l_returnflag STRING)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.str
                      SELECT l_orderkey, l_linenumber, l_quantity,
                             l_returnflag
                      FROM lineitem_str_src WHERE l_orderkey % 2 = 0""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""INSERT INTO $cat.ops.str
                      SELECT l_orderkey, l_linenumber, l_quantity,
                             l_returnflag
                      FROM lineitem_str_src WHERE l_orderkey % 2 = 1""")
          val q = s.readStream.table(s"$cat.ops.str")
            .filter(col("l_quantity") > 5)
            .writeStream.format("grafttable")
            .option("path", s"$nsDir/strsink")
            .option("checkpointLocation", s"$nsDir/_ckpt_str")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                  FROM $cat.ops.strsink
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM lineitem WHERE l_quantity > 5
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // `INSERT INTO … REPLACE WHERE` judged end-to-end: the
    // slice-reingestion verb (GraftTable.replaceWhere via
    // SupportsOverwrite + OVERWRITE_BY_FILTER) atomically swaps the
    // 1998+ shipdate slice for transformed rows in ONE pruned
    // copy-on-write commit — files zone-map-disjoint from the slice
    // survive untouched. The oracle rebuilds the post-replace state
    // relationally; the hash pins both the replacement and that the
    // untouched slice is bit-identical.
    ("catalog_replace_where",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_rw_src")
        val (cat, nsDir) = catalogFor(s, dir, "crw")
        val root = s"$nsDir/rw"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.rw (
                        l_orderkey BIGINT, l_quantity DOUBLE,
                        l_returnflag STRING, l_shipdate TIMESTAMP_NTZ)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.rw
                      SELECT l_orderkey, l_quantity, l_returnflag,
                             l_shipdate
                      FROM lineitem_rw_src""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""INSERT INTO $cat.ops.rw
                      REPLACE WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                      SELECT l_orderkey, l_quantity + 100, 'R', l_shipdate
                      FROM lineitem_rw_src
                      WHERE l_shipdate >= TIMESTAMP '1998-01-01'""")
        }
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                  FROM $cat.ops.rw
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""WITH fin AS (
                 SELECT l_returnflag, l_quantity FROM lineitem
                 WHERE l_shipdate < TIMESTAMP '1998-01-01'
                 UNION ALL
                 SELECT 'R', l_quantity + 100 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1998-01-01')
               SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM fin GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // `TIMESTAMP AS OF` hash-judged: the build pins the exact
    // wall-clock of the FIRST insert commit (read back from the
    // immutable log, so every re-run queries the same instant) and
    // guarantees the second insert commits strictly later. The query
    // travels to that instant — versionAt must resolve it to exactly
    // version 1, so the judged state is the first insert alone, which
    // the oracle reproduces with the build's date split.
    ("catalog_ts_travel",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem")
          .createOrReplaceTempView("lineitem_tst_src")
        val (cat, nsDir) = catalogFor(s, dir, "ctts")
        val root = s"$nsDir/tst"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.tst (
                        l_orderkey BIGINT, l_quantity DOUBLE,
                        l_returnflag STRING, l_shipdate TIMESTAMP_NTZ)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.tst
                      SELECT l_orderkey, l_quantity, l_returnflag,
                             l_shipdate
                      FROM lineitem_tst_src
                      WHERE l_shipdate < TIMESTAMP '1996-07-01'""")
          if (gt.snapshot(s, root).version == 1L) {
            // the ms clock must tick past v1's recorded instant before
            // v2 commits, or the pinned literal would cover both
            val t1 = gt.commitTimeMs(s, root, 1L)
            while (System.currentTimeMillis() <= t1) Thread.sleep(1L)
            s.sql(s"""INSERT INTO $cat.ops.tst
                      SELECT l_orderkey, l_quantity, l_returnflag,
                             l_shipdate
                      FROM lineitem_tst_src
                      WHERE l_shipdate >= TIMESTAMP '1996-07-01'""")
          }
        }
        val asOf = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(
            gt.commitTimeMs(s, root, 1L)))
        s.sql(s"""SELECT l_returnflag, COUNT(*) AS n,
                         ${Canonical.moneySumSql("l_quantity")} AS sum_qty
                  FROM $cat.ops.tst TIMESTAMP AS OF '${asOf}Z'
                  GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_quantity")} AS sum_qty
               FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-07-01'
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Hidden transform partitioning judged END-TO-END over the API
    // surface (graft.table.Partitioning): orders lands in a
    // months(o_orderdate)-partitioned table (one clustered write, one
    // file per month tuple), then (a) deleteRange retires everything
    // before 1996 — every touched file's MONTH interval is inside the
    // range, so the commit drops whole partitions METADATA-ONLY (the
    // DML soak asserts adds=0 for this shape) — and (b)
    // overwritePartitions re-ingests 1997-03 with corrected prices,
    // replacing exactly that month's file. The judged output is the
    // per-month state; the oracle reconstructs both verbs
    // relationally. Build is write-once, version-guarded; every verb
    // runs at exactly one version so killed builds resume.
    ("table_partitioned",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val od = Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        val src = new java.io.File(s"$dir/orders.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "tpart_v1".hashCode.toLong)
        val root = s"target/graft_table/tpart_$fp"
        val cutMicros = java.time.LocalDate.parse("1996-01-01")
          .toEpochDay * 86400000000L
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            gt.createPartitioned(s, root, od.schema,
              Seq(graft.table.Partitioning.PMonths("o_orderdate")))
          if (gt.snapshot(s, root).version == 0L)
            gt.append(s, root, od, txn = Some(("tpart_build", 0L)))
          if (gt.snapshot(s, root).version == 1L)
            gt.deleteRange(s, root,
              graft.table.GraftTable.Range("o_orderdate", None,
                Some(cutMicros - 1L)))
          if (gt.snapshot(s, root).version == 2L)
            gt.overwritePartitions(s, root,
              od.filter(date_format(col("o_orderdate"), "yyyy-MM")
                  === "1997-03")
                .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
              txn = Some(("tpart_patch", 0L)))
        }
        gt.read(s, root)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("o_totalprice")).as("sum_price"),
            min(col("o_orderkey")).as("min_key"))
          .orderBy("ym")
      },
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
                      COUNT(*) AS n,
                      ${Canonical.moneySumSql(
        "CASE WHEN strftime(o_orderdate, '%Y-%m') = '1997-03' " +
          "THEN o_totalprice + 1000 ELSE o_totalprice END")} AS sum_price,
                      MIN(o_orderkey) AS min_key
               FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               GROUP BY ym ORDER BY ym""")),

    // The SQL spelling of the same capability: CREATE TABLE …
    // PARTITIONED BY (days(ts), bucket(16, user_id)) through the
    // catalog (hidden partitioning — the transforms never appear as
    // data columns), INSERT INTO (clustered dynamic-partition write),
    // then REPLACE WHERE re-ingests one day's slice ×2 as ONE pruned
    // copy-on-write commit whose file set the day partitions align
    // exactly. The judged read filters half the month — day-tuple
    // pruning opens only overlapping partitions (PartitioningSpec
    // asserts the file counts; this pins the CONTENT under the hash
    // gate).
    ("catalog_partitioned",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "events").createOrReplaceTempView("events_part_src")
        val (cat, nsDir) = catalogFor(s, dir, "cprt")
        val root = s"$nsDir/prt"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.prt (
                        event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,
                        event_type STRING, value DOUBLE)
                      PARTITIONED BY (days(ts), bucket(16, user_id))""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.prt
                      SELECT event_id, ts, user_id, event_type, value
                      FROM events_part_src""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""INSERT INTO $cat.ops.prt
                      REPLACE WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
                        AND ts < TIMESTAMP '2024-01-21 00:00:00'
                      SELECT event_id, ts, user_id, event_type, value * 2
                      FROM events_part_src
                      WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
                        AND ts < TIMESTAMP '2024-01-21 00:00:00'""")
        }
        s.sql(s"""SELECT event_type, COUNT(*) AS n,
                         ${Canonical.moneySumSql("value")} AS sum_value
                  FROM $cat.ops.prt
                  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
                  GROUP BY event_type ORDER BY event_type""")
      },
      Some(s"""WITH fin AS (
                 SELECT event_type, value FROM events
                 WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
                   AND NOT (ts >= TIMESTAMP '2024-01-20 00:00:00'
                            AND ts < TIMESTAMP '2024-01-21 00:00:00')
                 UNION ALL
                 SELECT event_type, value * 2 FROM events
                 WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
                   AND ts < TIMESTAMP '2024-01-21 00:00:00')
               SELECT event_type, COUNT(*) AS n,
                      ${Canonical.moneySumSql("value")} AS sum_value
               FROM fin GROUP BY event_type ORDER BY event_type""")),

    // Storage-partitioned join (GraftSpj) judged END-TO-END: customer
    // and supplier land in catalog tables PARTITIONED BY identity
    // (nationkey); with `spark.sql.sources.v2.bucketing.enabled` on
    // (and broadcast off) both scans are the genuine DSv2 batch
    // reporting KeyGroupedPartitioning, so the nation-key join plans
    // with ZERO exchange — neither side shuffles (SpjSpec pins the
    // plan; this row pins the CONTENT read through the row-based SPJ
    // reader under the hash gate). `localCheckpoint` forces execution
    // while the flag is set; the conf is restored before returning.
    ("catalog_spj_join",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val cu = Tables(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val su = Tables(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey", "s_acctbal")
        val (cat, nsDir) = catalogFor(s, dir, "cspj")
        val cRoot = s"$nsDir/spjc"
        val sRoot = s"$nsDir/spjs"
        buildLocked(s, cRoot) {
          if (gt.snapshot(s, cRoot).version < 0L)
            gt.createPartitioned(s, cRoot, cu.schema,
              Seq(graft.table.Partitioning.PIdentity("c_nationkey")))
          if (gt.snapshot(s, cRoot).version == 0L)
            gt.append(s, cRoot, cu, txn = Some(("cat_spj_c", 0L)))
          if (gt.snapshot(s, sRoot).version < 0L)
            gt.createPartitioned(s, sRoot, su.schema,
              Seq(graft.table.Partitioning.PIdentity("s_nationkey")))
          if (gt.snapshot(s, sRoot).version == 0L)
            gt.append(s, sRoot, su, txn = Some(("cat_spj_s", 0L)))
        }
        val spjPrev = s.conf.getOption(graft.table.GraftSpj.ConfKey)
        val bcPrev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set(graft.table.GraftSpj.ConfKey, "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try s.sql(
          s"""SELECT c.c_nationkey AS nk, COUNT(*) AS n,
                     ${Canonical.moneySumSql("c.c_acctbal + s.s_acctbal")}
                       AS bal
              FROM $cat.ops.spjc c JOIN $cat.ops.spjs s
                ON c.c_nationkey = s.s_nationkey
              GROUP BY c.c_nationkey ORDER BY nk""").localCheckpoint()
        finally {
          spjPrev match {
            case Some(v) => s.conf.set(graft.table.GraftSpj.ConfKey, v)
            case None => s.conf.unset(graft.table.GraftSpj.ConfKey)
          }
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcPrev)
        }
      },
      Some(s"""SELECT c_nationkey AS nk, COUNT(*) AS n,
                      ${Canonical.moneySumSql("c_acctbal + s_acctbal")} AS bal
               FROM customer JOIN supplier ON c_nationkey = s_nationkey
               GROUP BY c_nationkey ORDER BY nk""")),

    // Bucket-transform SPJ judged end-to-end: orders and customer land
    // in tables PARTITIONED BY bucket(8, custkey); with the SPJ flag
    // on, Spark resolves both sides' bucket transforms through the
    // catalog's FunctionCatalog (GraftBucketFunction) and plans the
    // custkey join with ZERO exchange — the production bucketed
    // fact-fact join, content pinned under the hash gate.
    ("catalog_spj_bucket",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val od = Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val cu = Tables(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")
        val (cat, nsDir) = catalogFor(s, dir, "cspb")
        val oRoot = s"$nsDir/spbo"
        val cRoot = s"$nsDir/spbc"
        buildLocked(s, oRoot) {
          if (gt.snapshot(s, oRoot).version < 0L)
            gt.createPartitioned(s, oRoot, od.schema,
              Seq(graft.table.Partitioning.PBucket("o_custkey", 8)))
          if (gt.snapshot(s, oRoot).version == 0L)
            gt.append(s, oRoot, od, txn = Some(("cat_spb_o", 0L)))
          if (gt.snapshot(s, cRoot).version < 0L)
            gt.createPartitioned(s, cRoot, cu.schema,
              Seq(graft.table.Partitioning.PBucket("c_custkey", 8)))
          if (gt.snapshot(s, cRoot).version == 0L)
            gt.append(s, cRoot, cu, txn = Some(("cat_spb_c", 0L)))
        }
        val spjPrev = s.conf.getOption(graft.table.GraftSpj.ConfKey)
        val bcPrev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set(graft.table.GraftSpj.ConfKey, "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try s.sql(
          s"""SELECT c.c_mktsegment AS seg, COUNT(*) AS n,
                     ${Canonical.moneySumSql("o.o_totalprice")} AS rev
              FROM $cat.ops.spbo o JOIN $cat.ops.spbc c
                ON o.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment ORDER BY seg""").localCheckpoint()
        finally {
          spjPrev match {
            case Some(v) => s.conf.set(graft.table.GraftSpj.ConfKey, v)
            case None => s.conf.unset(graft.table.GraftSpj.ConfKey)
          }
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", bcPrev)
        }
      },
      Some(s"""SELECT c_mktsegment AS seg, COUNT(*) AS n,
                      ${Canonical.moneySumSql("o_totalprice")} AS rev
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment ORDER BY seg""")),

    // CBO-planned 3-table star join judged END-TO-END: lineitem, part
    // and supplier land in bucketed catalog tables with declared NDV
    // sketches, and the LOG's statistics — exact live rows, zone-map
    // ranges, sketch ndv — decide the PLAN with no ANALYZE pass: the
    // SQL joins supplier FIRST, but CostBasedJoinReorder prices the
    // filtered part dim (p_size <= 5, ~10% of parts — estimable only
    // because the scan reports min/max + ndv for p_size) as the
    // smaller intermediate and pulls it ahead, and both dims broadcast
    // STATICALLY pre-AQE from exact scan sizes (CboJoinSpec pins both
    // plan properties; this row pins the CONTENT under the hash gate).
    ("catalog_cbo_join",
      (s: SparkSession, dir: String) => {
        val (cat, _) = cboJoinTables(s, dir)
        withStatsPlanning(s) { s.sql(cboJoinSql(cat)).localCheckpoint() }
      },
      Some(s"""SELECT p_brand AS brand, COUNT(*) AS n,
                      ${Canonical.moneySumSql("l_extendedprice")} AS rev
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN part ON l_partkey = p_partkey
               WHERE p_size <= 5
               GROUP BY p_brand ORDER BY brand""")),

    // Partition spec evolution judged end-to-end: events land under
    // days(ts), the spec evolves METADATA-ONLY to (months(ts),
    // event_type), a second batch lands under the new spec, and the
    // judged read spans BOTH file generations — the oracle is the
    // plain relational answer, so mixed-generation reads and the
    // conservative old-file pruning are pinned under the hash gate.
    ("table_spec_evolution",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        val pt = graft.table.Partitioning
        val ev = Tables(s, dir, "events")
          .select("event_id", "ts", "user_id", "event_type", "value")
        val cut = "2024-01-15 00:00:00"
        val root = s"target/graft_tables/${EngineOps.fingerprint(dir,
          "specevo")}/evo"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            gt.createPartitioned(s, root, ev.schema,
              Seq(pt.PDays("ts")))
          if (gt.snapshot(s, root).version == 0L)
            gt.append(s, root, ev.filter(col("ts") < cut),
              txn = Some(("specevo", 0L)))
          if (gt.snapshot(s, root).version == 1L)
            gt.evolvePartitioning(s, root,
              Seq(pt.PMonths("ts"), pt.PIdentity("event_type")))
          if (gt.snapshot(s, root).version == 2L)
            gt.append(s, root, ev.filter(col("ts") >= cut),
              txn = Some(("specevo", 1L)))
        }
        gt.scanWhere(s, root,
          "ts >= TIMESTAMP '2024-01-10 00:00:00'")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            Canonical.moneySum(col("value")).as("sum_value"),
            min(col("event_id")).as("min_id"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
                      ${Canonical.moneySumSql("value")} AS sum_value,
                      MIN(event_id) AS min_id
               FROM events
               WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
               GROUP BY event_type ORDER BY event_type""")),

    // Type widening judged end-to-end: an INT quantity column lands,
    // `ALTER COLUMN … TYPE BIGINT` widens it metadata-only, and a
    // second insert lands values past 2³¹ — the judged aggregate reads
    // INT32 parquet under the LONG logical type next to genuine INT64
    // files, vs an oracle that reconstructs the same union.
    ("catalog_widen",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "lineitem").createOrReplaceTempView("li_widen_src")
        val (cat, nsDir) = catalogFor(s, dir, "cwdn")
        val root = s"$nsDir/wdn"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"CREATE TABLE $cat.ops.wdn (k BIGINT, q INT)")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.wdn
                      SELECT l_orderkey, CAST(l_quantity AS INT)
                      FROM li_widen_src
                      WHERE l_shipdate < TIMESTAMP '1995-01-01'""")
          if (gt.snapshot(s, root).schema("q").dataType ==
              org.apache.spark.sql.types.IntegerType)
            s.sql(s"ALTER TABLE $cat.ops.wdn ALTER COLUMN q TYPE BIGINT")
          if (gt.snapshot(s, root).version == 2L)
            s.sql(s"""INSERT INTO $cat.ops.wdn
                      SELECT l_orderkey,
                             CAST(l_quantity AS BIGINT) + 3000000000
                      FROM li_widen_src
                      WHERE l_shipdate >= TIMESTAMP '1995-01-01'""")
        }
        s.sql(s"""SELECT COUNT(*) AS n, SUM(q) AS sum_q,
                         MIN(q) AS min_q, MAX(q) AS max_q
                  FROM $cat.ops.wdn""")
      },
      Some("""WITH u AS (
                SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
                WHERE l_shipdate < TIMESTAMP '1995-01-01'
                UNION ALL
                SELECT CAST(l_quantity AS BIGINT) + 3000000000 AS q
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1995-01-01')
              SELECT COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q,
                     MIN(q) AS min_q, MAX(q) AS max_q
              FROM u""")),

    // Column DEFAULT values judged end-to-end: a table declares
    // defaults at CREATE, one insert omits the defaulted columns and
    // one supplies them — the analyzer fills at write time, and the
    // judged group-by pins the filled content vs a relational oracle.
    // Column DEFAULTs across BOTH fill mechanisms: CREATE-time
    // defaults fill at write (the analyzer's CURRENT_DEFAULT), and a
    // post-data `ALTER … ADD COLUMN … DEFAULT` fills the PRE-ALTER
    // file generation at READ (EXISTS_DEFAULT — those files are never
    // rewritten and physically lack the column). The judged aggregate
    // mixes rows from both generations, so the hash pins the
    // metadata-only fill against a relational oracle.
    ("catalog_defaults",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "orders").createOrReplaceTempView("ord_dflt_src")
        val (cat, nsDir) = catalogFor(s, dir, "cdf2")
        val root = s"$nsDir/dfl"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.dfl (
                        ok BIGINT,
                        prio STRING DEFAULT 'unspecified')""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.dfl (ok)
                      SELECT o_orderkey FROM ord_dflt_src
                      WHERE o_orderstatus = 'F'""")
          // generation boundary: the column does not exist in the
          // files above; the ALTER captures the fill as metadata only
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"ALTER TABLE $cat.ops.dfl ADD COLUMN amt DOUBLE DEFAULT 5.0")
          if (gt.snapshot(s, root).version == 2L)
            s.sql(s"""INSERT INTO $cat.ops.dfl
                      SELECT o_orderkey, o_orderpriority, o_totalprice
                      FROM ord_dflt_src WHERE o_orderstatus <> 'F'""")
        }
        s.sql(s"""SELECT prio, COUNT(*) AS n,
                         ${Canonical.moneySumSql("amt")} AS sum_amt
                  FROM $cat.ops.dfl GROUP BY prio ORDER BY prio""")
      },
      Some(s"""WITH u AS (
                 SELECT 'unspecified' AS prio, 5.0 AS amt FROM orders
                 WHERE o_orderstatus = 'F'
                 UNION ALL
                 SELECT o_orderpriority AS prio, o_totalprice AS amt
                 FROM orders WHERE o_orderstatus <> 'F')
               SELECT prio, COUNT(*) AS n,
                      ${Canonical.moneySumSql("amt")} AS sum_amt
               FROM u GROUP BY prio ORDER BY prio""")),

    // GENERATED ALWAYS AS end to end: CREATE with a generation
    // expression, INSERT (the write choke point computes the column),
    // a CoW UPDATE of the SOURCE column (the rewrite recomputes), and
    // a layout-only compaction (which carries the stored values
    // WITHOUT re-evaluating the expression — asserted separately by
    // GraftCatalogSpec's probe-UDF spec). FLOOR keeps the derivation
    // one exact IEEE op sequence, bit-identical in DuckDB.
    //
    // Tag history: "cgen"->"cge2" bumped on a stale-warehouse theory
    // that turned out to be a MISDIAGNOSIS — the two red rounds were
    // caused by the oracle typing sum_cents as HUGEINT (DuckDB
    // SUM(BIGINT) widens; fixed below with an outer CAST ... AS
    // BIGINT, the rule Contract.scala documents and OracleTypeSpec
    // now enforces). The tag-bump rule itself still stands: whenever
    // a version-gated build recipe changes, bump its tag.
    ("catalog_generated",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "orders").createOrReplaceTempView("ord_gen_src")
        val (cat, nsDir) = catalogFor(s, dir, "cge2")
        val root = s"$nsDir/gen"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.gen (
                        ok BIGINT,
                        amt DOUBLE,
                        cents BIGINT GENERATED ALWAYS AS
                          (CAST(FLOOR(amt * 100.0) AS BIGINT)),
                        st STRING)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.gen (ok, amt, st)
                      SELECT o_orderkey, o_totalprice, o_orderstatus
                      FROM ord_gen_src""")
          // CoW update of the SOURCE column: every rewritten row's
          // generated value must track it
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"""UPDATE $cat.ops.gen SET amt = amt + 1.5
                      WHERE st = 'F'""")
          // layout-only compaction carries stored generated values
          if (gt.snapshot(s, root).version == 2L)
            gt.compact(s, root, targetFiles = 2)
        }
        s.sql(s"""SELECT st, COUNT(*) AS n, SUM(cents) AS sum_cents
                  FROM $cat.ops.gen GROUP BY st ORDER BY st""")
      },
      Some("""WITH g AS (
                SELECT o_orderstatus AS st,
                       CASE WHEN o_orderstatus = 'F'
                            THEN o_totalprice + 1.5
                            ELSE o_totalprice END AS amt
                FROM orders)
              SELECT st, COUNT(*) AS n,
                     CAST(SUM(CAST(FLOOR(amt * 100.0) AS BIGINT)) AS BIGINT)
                       AS sum_cents
              FROM g GROUP BY st ORDER BY st""")),

    // BATCH CHANGE FEED end to end: SQL INSERT (v1), a CoW UPDATE (v2
    // — pairs of delete-old/insert-new for exactly the touched rows,
    // carried rows cancel in the bag-diff), a DELETE (v3), then
    // `spark.read.format("grafttable").option("readChangeFeed", true)`
    // reads the whole feed DISTRIBUTED (the Delta batch-CDF spelling;
    // a CALL-procedure surface would funnel a table-scale feed through
    // the driver). The oracle re-derives every change row relationally
    // from the known build script. `amt * 2.0` is one exact IEEE
    // double op in both engines.
    ("catalog_cdc",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "orders").createOrReplaceTempView("ord_cdc_src")
        val (cat, nsDir) = catalogFor(s, dir, "ccdc")
        val root = s"$nsDir/cdc"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.cdc (
                        ok BIGINT, amt DOUBLE, st STRING)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.cdc
                      SELECT o_orderkey, o_totalprice, o_orderstatus
                      FROM ord_cdc_src""")
          if (gt.snapshot(s, root).version == 1L)
            s.sql(s"UPDATE $cat.ops.cdc SET amt = amt * 2.0 WHERE st = 'F'")
          if (gt.snapshot(s, root).version == 2L)
            s.sql(s"DELETE FROM $cat.ops.cdc WHERE st = 'P'")
        }
        s.read.format("grafttable").option("path", root)
          .option("readChangeFeed", "true").load()
          .select("ok", "amt", "st", "_change_type", "_commit_version")
          .orderBy("_commit_version", "_change_type", "ok")
      },
      Some("""WITH feed AS (
                SELECT o_orderkey AS ok, o_totalprice AS amt,
                       o_orderstatus AS st, 'insert' AS _change_type,
                       CAST(1 AS BIGINT) AS _commit_version
                FROM orders
                UNION ALL
                SELECT o_orderkey, o_totalprice, o_orderstatus,
                       'delete', CAST(2 AS BIGINT)
                FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_orderkey, o_totalprice * 2.0, o_orderstatus,
                       'insert', CAST(2 AS BIGINT)
                FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_orderkey, o_totalprice, o_orderstatus,
                       'delete', CAST(3 AS BIGINT)
                FROM orders WHERE o_orderstatus = 'P')
              SELECT ok, amt, st, _change_type, _commit_version
              FROM feed
              ORDER BY _commit_version, _change_type, ok""")),

    // Five-clause MERGE: both matched verbs, the not-matched insert,
    // AND the round-12 WHEN NOT MATCHED BY SOURCE class (update +
    // delete over the target rows the source does NOT touch — the
    // Delta clause that completes SQL MERGE's three match classes).
    // Source = every 'O' key (so the by-source class is exactly the
    // F/P rows) plus offset-shifted 'P' keys for the insert clause.
    // `amt + sp` = o_totalprice + o_totalprice: one exact IEEE add.
    ("catalog_merge_by_source",
      (s: SparkSession, dir: String) => {
        val gt = graft.table.GraftTable
        Tables(s, dir, "orders").createOrReplaceTempView("ord_mbs_src")
        val (cat, nsDir) = catalogFor(s, dir, "cmbs")
        val root = s"$nsDir/mbs"
        buildLocked(s, root) {
          if (gt.snapshot(s, root).version < 0L)
            s.sql(s"""CREATE TABLE $cat.ops.mbs (
                        ok BIGINT, amt DOUBLE, st STRING)""")
          if (gt.snapshot(s, root).version == 0L)
            s.sql(s"""INSERT INTO $cat.ops.mbs
                      SELECT o_orderkey, o_totalprice, o_orderstatus
                      FROM ord_mbs_src""")
          if (gt.snapshot(s, root).version == 1L) {
            s.sql("""SELECT o_orderkey AS sk, o_totalprice AS sp
                     FROM ord_mbs_src WHERE o_orderstatus = 'O'
                     UNION ALL
                     SELECT o_orderkey + 10000000, o_totalprice
                     FROM ord_mbs_src WHERE o_orderstatus = 'P'""")
              .createOrReplaceTempView("mbs_merge_src")
            s.sql(s"""MERGE INTO $cat.ops.mbs t USING mbs_merge_src s
                      ON t.ok = s.sk
                      WHEN MATCHED AND t.amt < 30000.0 THEN DELETE
                      WHEN MATCHED THEN UPDATE SET amt = t.amt + s.sp
                      WHEN NOT MATCHED THEN INSERT (ok, amt, st)
                        VALUES (s.sk, s.sp, 'NEW')
                      WHEN NOT MATCHED BY SOURCE AND t.st = 'P' THEN DELETE
                      WHEN NOT MATCHED BY SOURCE THEN
                        UPDATE SET st = 'STALE'""")
          }
        }
        s.sql(s"""SELECT ok, amt, st FROM $cat.ops.mbs ORDER BY ok""")
      },
      Some("""WITH f AS (
                SELECT o_orderkey AS ok,
                       o_totalprice + o_totalprice AS amt, 'O' AS st
                FROM orders
                WHERE o_orderstatus = 'O' AND o_totalprice >= 30000.0
                UNION ALL
                SELECT o_orderkey, o_totalprice, 'STALE'
                FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_orderkey + 10000000, o_totalprice, 'NEW'
                FROM orders WHERE o_orderstatus = 'P')
              SELECT ok, amt, st FROM f ORDER BY ok""")),
  )

  /** Write-once root fingerprint for non-catalog table builds, keyed
    * by the source generation and a tag (same rule as [[catalogFor]]).
    */
  private def fingerprint(dir: String, tag: String): String = {
    val src = new java.io.File(s"$dir/lineitem.parquet")
    java.lang.Long.toHexString(
      src.length ^ (src.lastModified * 31) ^ tag.hashCode.toLong)
  }

  /** The shared `csel` catalog table (two appends of lineitem split at
    * 1998) — built write-once, used by catalog_sql_select and
    * catalog_meta_agg.
    */
  private def selTable(s: SparkSession, dir: String): String = {
    val gt = graft.table.GraftTable
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", "l_shipdate")
    val (cat, nsDir) = catalogFor(s, dir, "csel")
    val root = s"$nsDir/sel"
    buildLocked(s, root) {
      if (gt.snapshot(s, root).version < 1L) {
        gt.append(s, root,
          li.filter(col("l_shipdate") < "1998-01-01"),
          txn = Some(("cat_sel", 0L)))
        gt.append(s, root,
          li.filter(col("l_shipdate") >= "1998-01-01"),
          txn = Some(("cat_sel", 1L)))
      }
    }
    cat
  }

  /** Single-builder region for the write-once judged-table builds:
    * in-JVM mutual exclusion (the `synchronized` the sites always
    * had) PLUS the cross-process file lock ([[graft.table.BuildLock]])
    * — two JVMs racing the same build (the driver's Verify against a
    * test suite) otherwise both observe the same version gate and
    * both apply a gated UPDATE/compact step, and `commitRetry` would
    * faithfully re-apply the loser's against the winner's tip. The
    * body's own version-gate re-checks AFTER acquisition are what
    * make the second builder a no-op.
    */
  /** Builds (idempotently) the three catalog tables of the CBO star
    * join — bucketed so the SPJ-capable V2 scan feeds the join
    * reorderer, NDV-sketched on the join keys and the filter column so
    * filter/join estimation can price — and returns the catalog name.
    * Shared with CboJoinSpec, which re-plans [[cboJoinSql]] under
    * [[withStatsPlanning]] to assert the reorder and the static
    * broadcasts on the same tables the judged row reads.
    */
  private[graft] def cboJoinTables(s: SparkSession, dir: String)
      : (String, String) = {
    val gt = graft.table.GraftTable
    val pt = graft.table.Partitioning
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice")
    val pa = Tables(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val su = Tables(s, dir, "supplier").select("s_suppkey", "s_name")
    val (cat, nsDir) = catalogFor(s, dir, "ccbo")
    buildLocked(s, s"$nsDir/cbol") {
      for ((root, df, key, ndv) <- Seq(
        (s"$nsDir/cbol", li, "l_partkey", Seq("l_partkey", "l_suppkey")),
        (s"$nsDir/cbop", pa, "p_partkey", Seq("p_partkey", "p_size")),
        (s"$nsDir/cbos", su, "s_suppkey", Seq("s_suppkey")))) {
        if (gt.snapshot(s, root).version < 0L)
          gt.createPartitioned(s, root, df.schema, Seq(pt.PBucket(key, 4)))
        if (gt.snapshot(s, root).version == 0L) {
          // a props-side write, not a commit: no version bump, and
          // re-declaring the same columns is idempotent
          gt.setNdvColumns(s, root, ndv)
          gt.append(s, root, df, txn = Some((s"cbo_$key", 0L)))
        }
      }
    }
    (cat, nsDir)
  }

  private[graft] def cboJoinSql(cat: String): String =
    s"""SELECT p.p_brand AS brand, COUNT(*) AS n,
               ${Canonical.moneySumSql("l.l_extendedprice")} AS rev
        FROM $cat.ops.cbol l
        JOIN $cat.ops.cbos s ON l.l_suppkey = s.s_suppkey
        JOIN $cat.ops.cbop p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 5
        GROUP BY p.p_brand ORDER BY brand"""

  /** Runs `body` with the stats-driven planner on — SPJ-capable V2
    * scans (they alone are stats-capable at the join-reorder slot),
    * CBO, and cost-based join reorder — restoring all three confs
    * after (the shared session must not leak plan-shape confs into
    * other queries).
    */
  private[graft] def withStatsPlanning[T](s: SparkSession)(body: => T): T = {
    val keys = Seq(graft.table.GraftSpj.ConfKey,
      "spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    keys.foreach(s.conf.set(_, "true"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private def buildLocked[T](s: SparkSession, key: String)(body: => T): T =
    EngineOps.synchronized {
      graft.table.BuildLock.withLock(s, key)(body)
    }

  /** One graft SQL catalog per (source generation, query tag): the
    * catalog name embeds the data fingerprint, so a session that
    * processes several source dirs (the soak suites) gets a FRESH
    * catalog instance per dir — catalog instances pin their warehouse
    * at first reference.
    */
  private def catalogFor(s: SparkSession, dir: String,
      tag: String): (String, String) = {
    val src = new java.io.File(s"$dir/lineitem.parquet")
    val fp = java.lang.Long.toHexString(
      src.length ^ (src.lastModified * 31) ^ tag.hashCode.toLong)
    val cat = s"gq_$tag$fp"
    val wh = s"target/graft_catalog/$tag$fp"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.table.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ops")
    (cat, s"$wh/ops")
  }

  def queries: Map[String, Q] =
    entries.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(o)) => n -> o.stripMargin }.toMap
}
