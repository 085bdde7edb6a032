package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** SQL DML on graft catalog tables via the injected analyzer rule
  * ([[graft.plans.GraftDmlRule]]): UPDATE, MERGE INTO (all clause
  * shapes incl. ordering and star actions), and predicate-general
  * DELETE — each checked against the equivalent relational result.
  */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_dml_wh").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdml.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.ns")
    dir
  }

  private def freshTable(name: String, lo: Long, hi: Long): String = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS gdml.ns.$name")
    spark.sql(s"CREATE TABLE gdml.ns.$name (id BIGINT, grp STRING, v DOUBLE)")
    val root = s"$wh/ns/$name"
    GraftTable.append(spark, root,
      (lo until hi).map(i => (i, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v"))
    root
  }

  test("SQL UPDATE: SET evaluates pre-update, casts to table type, prunes files") {
    val root = freshTable("upd", 0, 100)
    GraftTable.append(spark, root,
      (100L until 200L).map(i => (i, s"g${i % 4}", i * 1.0)).toDF("id", "grp", "v"))
    val before = GraftTable.snapshot(spark, root)

    val v = spark.sql(
      "UPDATE gdml.ns.upd SET v = v + id, grp = concat(grp, '!') " +
        "WHERE id < 50").head.getLong(0)
    assert(v == before.version + 1)
    val got = spark.table("gdml.ns.upd").orderBy("id").collect()
    assert(got.length == 200)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id < 50) {
        assert(r.getString(1).endsWith("!"))
        assert(r.getDouble(2) == id * 2.0)
      } else {
        assert(!r.getString(1).endsWith("!"))
        assert(r.getDouble(2) == id * 1.0)
      }
    }
    // the id-range pruning left the second append's file untouched
    val after = GraftTable.snapshot(spark, root)
    assert(before.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet).nonEmpty)
  }

  test("SQL MERGE INTO: update + delete + insert clauses in one statement") {
    val root = freshTable("mrg", 0, 60)
    Seq(
      (10L, 100.0, "upd"), // matched, updates
      (20L, -1.0, "del"),  // matched, deletes
      (70L, 7.5, "ins"),   // not matched, inserts
      (80L, 8.5, "ins")    // not matched, inserts
    ).toDF("sid", "sv", "op").createOrReplaceTempView("mrg_src")

    spark.sql("""MERGE INTO gdml.ns.mrg t USING mrg_src s
                 ON t.id = s.sid
                 WHEN MATCHED AND s.op = 'del' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET v = s.sv + t.v
                 WHEN NOT MATCHED THEN INSERT (id, grp, v)
                   VALUES (s.sid, s.op, s.sv)""")

    val m = spark.table("gdml.ns.mrg").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(!m.contains(20L), "matched delete clause removes the row")
    assert(m(10L) == ("g2", 110.0), "update sees source AND pre-update target")
    assert(m(70L) == ("ins", 7.5) && m(80L) == ("ins", 8.5))
    assert(m.size == 60 - 1 + 2)
  }

  test("SQL MERGE clause ORDER is honored: first matching clause wins") {
    val root = freshTable("ord", 0, 10)
    // sid=3 satisfies BOTH clause conditions → the FIRST (update) must
    // win even though mergeInto's internal order is delete-first;
    // sid=4 fails the update condition → falls through to delete
    Seq((3L, 30.0), (4L, -5.0)).toDF("sid", "sv")
      .createOrReplaceTempView("ord_src")
    spark.sql("""MERGE INTO gdml.ns.ord t USING ord_src s ON t.id = s.sid
                 WHEN MATCHED AND s.sv > 0 THEN UPDATE SET v = s.sv
                 WHEN MATCHED THEN DELETE""")
    val m = spark.table("gdml.ns.ord").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(3L) == 30.0, "first clause (update) wins for a doubly-matching row")
    assert(!m.contains(4L), "row failing the first clause falls to delete")
    assert(m.size == 9)
  }

  test("SQL MERGE star actions: UPDATE SET * and INSERT *") {
    val root = freshTable("star", 0, 8)
    Seq((2L, "z", 222.0), (99L, "n", 999.0)).toDF("id", "grp", "v")
      .createOrReplaceTempView("star_src")
    spark.sql("""MERGE INTO gdml.ns.star t USING star_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val m = spark.table("gdml.ns.star").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(m(2L) == ("z", 222.0) && m(99L) == ("n", 999.0) && m.size == 9)
  }

  test("SQL DELETE with a connector-untranslatable predicate lowers to the command") {
    val root = freshTable("delx", 0, 100)
    // `id % 10 = 3` defeats filter translation → the DML rule path
    spark.sql("DELETE FROM gdml.ns.delx WHERE id % 10 = 3")
    val left = spark.table("gdml.ns.delx").select("id").as[Long].collect()
    assert(left.length == 90 && left.forall(_ % 10 != 3))
    // translatable predicates still ride SupportsDelete (both paths live)
    spark.sql("DELETE FROM gdml.ns.delx WHERE id >= 90")
    assert(spark.table("gdml.ns.delx").count() == 81)
  }

  test("SQL MERGE surfaces in the change feed as bag-diff delete/insert pairs") {
    val root = freshTable("cdc", 0, 20)
    val v0 = GraftTable.snapshot(spark, root).version
    Seq((5L, 500.0)).toDF("sid", "sv").createOrReplaceTempView("cdc_src")
    spark.sql("""MERGE INTO gdml.ns.cdc t USING cdc_src s ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET v = s.sv""")
    val ch = GraftTable.changes(spark, root, v0, v0 + 1)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ch == Set(("delete", 5L, 5.0), ("insert", 5L, 500.0)))
  }

  test("SQL MERGE: a NULL first-clause condition falls through to the next clause") {
    // the first-matching-clause guard must negate a prior condition
    // NULL-SAFELY ((p) IS NOT TRUE): for sid=5 the update condition
    // `s.sv > 0` evaluates NULL (sv is NULL) — that clause did NOT
    // fire, so the row must still reach the DELETE clause. A plain
    // NOT(p) would carry the NULL through and strand the row.
    val root = freshTable("nullc", 0, 10)
    val v0 = GraftTable.snapshot(spark, root).version
    Seq((5L, Option.empty[Double]), (6L, Some(60.0)),
      (90L, Option.empty[Double]), (91L, Some(910.0)))
      .toDF("sid", "sv").createOrReplaceTempView("nullc_src")
    spark.sql("""MERGE INTO gdml.ns.nullc t USING nullc_src s ON t.id = s.sid
                 WHEN MATCHED AND s.sv > 0 THEN UPDATE SET v = s.sv
                 WHEN MATCHED THEN DELETE
                 WHEN NOT MATCHED AND s.sv > 0 THEN INSERT (id, grp, v)
                   VALUES (s.sid, 'n', s.sv)""")
    val m = spark.table("gdml.ns.nullc").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!m.contains(5L), "NULL update-condition row must fall through to DELETE")
    assert(m(6L) == 60.0, "non-NULL passing row updates")
    assert(!m.contains(90L), "a NULL insert condition did not fire — no insert")
    assert(m(91L) == 910.0, "passing insert condition inserts")
    assert(m.size == 10 - 1 + 1)
    // CDC pins the same semantics: one bare delete for 5, an
    // update pair for 6, one bare insert for 91, nothing for 90
    val ch = GraftTable.changes(spark, root, v0, v0 + 1)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(ch.count(_ == ("delete", 5L)) == 1 && !ch.contains(("insert", 5L)))
    assert(ch.count(_ == ("delete", 6L)) == 1 && ch.count(_ == ("insert", 6L)) == 1)
    assert(ch.count(_ == ("insert", 91L)) == 1)
    assert(!ch.map(_._2).contains(90L))
  }

  test("SQL MERGE: a NULL delete-first condition falls through to UPDATE") {
    // mirror ordering of the above: DELETE carries the condition, a
    // NULL evaluation must leave the row eligible for the UPDATE
    val root = freshTable("nulld", 0, 10)
    Seq((3L, Option.empty[String]), (4L, Some("del")))
      .toDF("sid", "op").createOrReplaceTempView("nulld_src")
    spark.sql("""MERGE INTO gdml.ns.nulld t USING nulld_src s ON t.id = s.sid
                 WHEN MATCHED AND s.op = 'del' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET v = t.v + 1000""")
    val m = spark.table("gdml.ns.nulld").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(3L) == 1003.0, "NULL delete-condition row must fall through to UPDATE")
    assert(!m.contains(4L), "passing delete condition deletes")
    assert(m.size == 9)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds assigned source-only columns additively") {
    // Spark's ResolveMergeIntoSchemaEvolution (gated by the table's
    // AUTOMATIC_SCHEMA_EVOLUTION capability) derives AddColumn changes
    // for source columns the merge assigns that the target lacks, and
    // applies them through GraftCatalog.alterTable BEFORE the DML rule
    // lowers the merge — one addColumn commit, then the normal merge.
    val root = freshTable("evo", 0, 10)
    Seq((3L, 33.0, "hot"), (77L, 770.0, "new"))
      .toDF("sid", "sv", "tag").createOrReplaceTempView("evo_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdml.ns.evo t
                 USING evo_src s ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET v = s.sv, tag = s.tag
                 WHEN NOT MATCHED THEN INSERT (id, grp, v, tag)
                   VALUES (s.sid, 'e', s.sv, s.tag)""")
    val t = spark.table("gdml.ns.evo")
    assert(t.columns.toSeq == Seq("id", "grp", "v", "tag"),
      "evolution appends the new column last")
    val m = t.collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), Option(r.getString(3)))).toMap
    assert(m(3L) == ((33.0, Some("hot"))), "matched row takes the new column")
    assert(m(77L) == ((770.0, Some("new"))), "inserted row carries the new column")
    assert(m(0L) == ((0.0, None)), "pre-evolution rows read NULL")
    assert(m.size == 11)
    // evolution is one explicit schema commit in the log
    assert(GraftTable.snapshot(spark, root).schema.fieldNames.contains("tag"))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens a numeric type conflict losslessly") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdml.ns.evoc")
    spark.sql("CREATE TABLE gdml.ns.evoc (id BIGINT, n INT)")
    GraftTable.append(spark, s"$wh/ns/evoc",
      Seq((1L, 10), (2L, 20)).toDF("id", "n"))
    // source carries n as BIGINT → the derived UpdateColumnType change
    // routes through widenColumn: metadata-only widening, then merge
    Seq((1L, 3000000000L)).toDF("sid", "n")
      .createOrReplaceTempView("evoc_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdml.ns.evoc t
                 USING evoc_src s ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET n = s.n""")
    val t = spark.table("gdml.ns.evoc")
    assert(t.schema("n").dataType ==
      org.apache.spark.sql.types.LongType, "n widened to BIGINT")
    val m = t.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 3000000000L, 2L -> 20L),
      "updated row past 2^31; untouched INT32 row promotes at read")

    // a NON-widenable conflict (string source) still refuses untouched
    spark.sql("DROP TABLE IF EXISTS gdml.ns.evos")
    spark.sql("CREATE TABLE gdml.ns.evos (id BIGINT, n INT)")
    GraftTable.append(spark, s"$wh/ns/evos",
      Seq((1L, 10)).toDF("id", "n"))
    Seq((1L, "oops")).toDF("sid", "n").createOrReplaceTempView("evos_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdml.ns.evos t
                   USING evos_src s ON t.id = s.sid
                   WHEN MATCHED THEN UPDATE SET n = s.n""")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(m => m.contains("cannot change") ||
      m.contains("does not support table change") || m.contains("CAST")),
      s"expected a widening refusal, got: ${chain(e).mkString(" | ")}")
    assert(spark.table("gdml.ns.evos").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 10)))
  }

  test("constraints on a column absent from pre-evolution rows admit NULLs") {
    val root = freshTable("evok", 0, 5)
    Seq((2L, 9.0)).toDF("sid", "score").createOrReplaceTempView("evok_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gdml.ns.evok t
                 USING evok_src s ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET score = s.score""")
    // CHECK semantics: a row violates only when the expression is
    // FALSE — the four pre-evolution rows read score NULL and pass
    GraftTable.setConstraints(spark, root, Map("score_pos" -> "score >= 0"))
    GraftTable.append(spark, root,
      Seq((50L, "g0", 1.0, 5.0)).toDF("id", "grp", "v", "score"))
    intercept[Exception] {
      GraftTable.append(spark, root,
        Seq((51L, "g0", 1.0, -5.0)).toDF("id", "grp", "v", "score"))
    }
    assert(spark.table("gdml.ns.evok").count() == 6)
  }

  test("MERGE refuses a non-equi ON and duplicate source keys, with clear errors") {
    freshTable("bad", 0, 10)
    Seq((1L, 1.0)).toDF("sid", "sv").createOrReplaceTempView("bad_src")
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO gdml.ns.bad t USING bad_src s ON t.id > s.sid
                   WHEN MATCHED THEN DELETE""")
    }
    assert(e1.getMessage.contains("conjunction"))
    Seq((1L, 1.0), (1L, 2.0)).toDF("sid", "sv")
      .createOrReplaceTempView("bad_src2")
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO gdml.ns.bad t USING bad_src2 s ON t.id = s.sid
                   WHEN MATCHED THEN DELETE""")
    }
    assert(e2.getMessage.contains("unique"))
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE: update + delete over the unmatched class") {
    freshTable("bsrc", 0, 40) // grp = g0..g3 cycling, v = id
    // source touches ids 0-9 only; the other 30 rows are the by-source class
    (0L until 10L).map(i => (i, i * 2.0)).toDF("sid", "sv")
      .createOrReplaceTempView("bsrc_src")
    spark.sql("""MERGE INTO gdml.ns.bsrc t USING bsrc_src s ON t.id = s.sid
                 WHEN MATCHED THEN UPDATE SET v = s.sv
                 WHEN NOT MATCHED BY SOURCE AND t.grp = 'g3' THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grp = 'stale'""")
    val m = spark.table("gdml.ns.bsrc").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // matched rows updated from source
    (0L until 10L).foreach(i => assert(m(i)._2 == i * 2.0))
    // unmatched g3 rows (11, 15, ..., 39) deleted
    assert((10L until 40L).filter(_ % 4 == 3).forall(!m.contains(_)),
      "unmatched g3 rows must be deleted by the first by-source clause")
    // remaining unmatched rows marked stale, values untouched
    (10L until 40L).filterNot(_ % 4 == 3).foreach { i =>
      assert(m(i) == ("stale", i * 1.0), s"row $i")
    }
    assert(m.size == 10 + 30 - (10L until 40L).count(_ % 4 == 3))
  }

  test("SQL MERGE BY SOURCE clause order: first matching by-source clause wins") {
    freshTable("bsord", 0, 8)
    // empty-ish source (key nothing matches): every row is by-source
    Seq((999L, 0.0)).toDF("sid", "sv").createOrReplaceTempView("bsord_src")
    // UPDATE listed FIRST: a row satisfying both conditions must
    // update, not delete, even though the engine's internal order is
    // delete-first
    spark.sql("""MERGE INTO gdml.ns.bsord t USING bsord_src s ON t.id = s.sid
                 WHEN NOT MATCHED BY SOURCE AND t.id < 6 THEN UPDATE SET v = -1.0
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val m = spark.table("gdml.ns.bsord").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert((0L until 6L).forall(m(_) == -1.0),
      "first by-source clause (update) wins where both conditions hold")
    assert((6L until 8L).forall(!m.contains(_)),
      "rows failing the update condition fall through to delete")
    // by-source expressions may not read the source side
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gdml.ns.bsord t USING bsord_src s
                   ON t.id = s.sid
                   WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.sv""")
    }
    assert(e.getMessage.toLowerCase.contains("source") ||
      e.getMessage.contains("resolve"),
      s"stray source reference must refuse, got: ${e.getMessage}")
  }
}
