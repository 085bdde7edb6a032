package graft

import org.apache.spark.sql.functions._

/** Smoke over the declared inventory at sf0.001. The hash gate is the
  * DuckDB differ (tools/oracle_check.py, driven by graft.Verify); these
  * assertions pin down cheap structural invariants and a few known
  * values so regressions fail fast inside sbt test.
  */
class ContractSmokeSpec extends SparkSpec {

  test("every declared query runs and q09/dedup-style queries may be empty") {
    val nonEmptyExempt = Set("q09_anti_join", "dedup_exact", "dedup_ngram_jaccard",
      "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (!nonEmptyExempt.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("revenueSum premise: price·(1−disc) is lossless at DECIMAL(18,4)") {
    import org.apache.spark.sql.functions._
    import graft.Canonical.dec
    val li = Tables(spark, sf, "lineitem")
    val prod = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    val lossy = li.filter(
      prod.cast(org.apache.spark.sql.types.DecimalType(18, 4)) =!= prod).count()
    assert(lossy == 0,
      s"$lossy rows lose precision at scale 4 — revenueSum contract broken")
  }

  test("oracleSql keys are a subset of queries keys with matching columns contract") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    // every contract query must have an oracle
    graft.queries.Contract.queries.keySet.foreach(k =>
      assert(SparkEntry.oracleSql.contains(k), s"$k lacks an oracle"))
  }

  test("q01 counts match the known sf0.001 row counts") {
    val m = SparkEntry.queries("q01_counts")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("region") == 5 && m("nation") == 25 && m("customer") == 150 &&
      m("orders") == 1500 && m("lineitem") == 6000 && m("events") == 1000)
  }

  test("q02 transplanted reference query: groups only where price > 100000") {
    val rows = SparkEntry.queries("q02_ref_query")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) > 100000.0))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q13 emits at most 3 rows per segment, ranks 1..3") {
    val rows = SparkEntry.queries("q13_window_rank")(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
  }

  test("q23 session invariant: max_len ≤ user's event count") {
    val sessions = SparkEntry.queries("q23_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = Tables(spark, sf, "events").groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sessions.foreach { case (u, ns, ml) =>
      assert(ns >= 1 && ml >= 1 && ml <= counts(u) && ns <= counts(u))
    }
  }
}
