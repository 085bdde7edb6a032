package graft

import org.apache.spark.sql.functions._

/** Pins the engine-level semantics the round-5 judged queries froze
  * into their oracles (q55–q59), so a Spark upgrade that shifts any of
  * these breaks HERE with a named reason instead of as an opaque hash
  * mismatch in the driver gate:
  *
  *   - `session_window` gap boundary (merge at exactly `gap`, split
  *     only strictly beyond) — q57's oracle encodes `>`;
  *   - recursive-CTE iteration count (k → k div 2 chain depth);
  *   - VARIANT typed extraction + absent-path NULL semantics;
  *   - `approx_top_k` exactness window (k and maxItemsTracked ≥ NDV ⇒
  *     counts are exact) — the premise that makes q59 hash-judgeable.
  *
  * Plus the native XML source (new built-in in Spark 4) write→read
  * round-trip, the one file format in sources/ not previously covered.
  */
class Spark4FeaturesSpec extends SparkSpec {

  test("session_window merges at exactly the gap and splits just beyond it") {
    import spark.implicits._
    val gapUs = 1800000000L // 30 min
    val df = Seq(
      (1L, 0L), (1L, gapUs),     // exactly gap apart -> ONE session
      (2L, 0L), (2L, gapUs + 1L) // 1 µs beyond       -> TWO sessions
    ).toDF("user_id", "eus")
      .withColumn("ts", expr("cast(timestamp_micros(eus) as timestamp_ntz)"))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) == 1L,
      s"events exactly gap apart must merge (got ${sessions(1L)} sessions) — q57's oracle breaks islands on STRICTLY greater")
    assert(sessions(2L) == 2L,
      s"events gap+1µs apart must split (got ${sessions(2L)} sessions)")
  }

  test("recursive CTE halving chain has depth floor(log2(k))+1") {
    import spark.implicits._
    Seq(1L, 12L, 1024L, 1500L).toDF("c_custkey")
      .createOrReplaceTempView("customer")
    val got = spark.sql(
      """WITH RECURSIVE anc(node, cur, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer
           UNION ALL
           SELECT node, cur DIV 2, depth + 1 FROM anc WHERE cur > 0)
         SELECT node, MAX(depth) AS depth FROM anc GROUP BY node""")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def expected(k: Long) = (63 - java.lang.Long.numberOfLeadingZeros(k)) + 1
    Seq(1L, 12L, 1024L, 1500L).foreach { k =>
      assert(got(k) == expected(k),
        s"chain depth for $k: got ${got(k)}, want ${expected(k)}")
    }
    spark.catalog.dropTempView("customer")
  }

  test("recursive CTE survives >1M cumulative rows (the sf1 shape)") {
    // default spark.sql.cteRecursionRowLimit=1M kills any legitimately
    // large recursion on volume alone; Engine lifts it (level limit
    // stays as the runaway backstop). 120k keys × ~17 levels ≈ 2M
    // cumulative rows — past the default limit, fine under ours.
    spark.range(1, 120001).selectExpr("id AS k")
      .createOrReplaceTempView("rec_big")
    val n = spark.sql(
      """WITH RECURSIVE anc(node, cur) AS (
           SELECT k, k FROM rec_big
           UNION ALL
           SELECT node, cur DIV 2 FROM anc WHERE cur > 0)
         SELECT COUNT(DISTINCT node) AS n FROM anc""").head.getLong(0)
    assert(n == 120000L)
    spark.catalog.dropTempView("rec_big")
  }

  test("VARIANT typed extraction matches string-path JSON; absent path is NULL") {
    import spark.implicits._
    val df = Seq("""{"k": 7, "s": "x"}""", """{"k": -3}""", """{"s": "y"}""")
      .toDF("js")
      .withColumn("v", parse_json(col("js")))
    val rows = df.select(
      expr("variant_get(v, '$.k', 'int')").as("vk"),
      get_json_object(col("js"), "$.k").cast("int").as("jk"),
      expr("try_variant_get(v, '$.absent', 'int')").as("va"))
      .collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"variant_get vs get_json_object: $r")
      assert(r.isNullAt(2), s"absent path must be NULL: $r")
    }
  }

  test("approx_top_k is exact when k and maxItemsTracked cover the NDV") {
    val ev = Tables(spark, sf, "events")
    val ndv = ev.select(countDistinct(col("event_type"))).head.getLong(0)
    assert(ndv < 64,
      s"q59's exactness premise: NDV(event_type)=$ndv must stay < k=64")
    val sketch = ev.agg(expr("approx_top_k(event_type, 64)").as("tk"))
      .select(explode(col("tk")).as("x"))
      .select(col("x.item"), col("x.count").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == exact,
      s"sketch must be exact below maxItemsTracked: $sketch vs $exact")
  }

  test("named-parameter SQL binds literals without string splicing") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_p")
    val param = spark.sql(
      "SELECT COUNT(*) AS n FROM orders_p WHERE o_totalprice > :thr",
      Map("thr" -> 400000)).head.getLong(0)
    val literal = spark.sql(
      "SELECT COUNT(*) AS n FROM orders_p WHERE o_totalprice > 400000")
      .head.getLong(0)
    assert(param == literal && param > 0)
    spark.catalog.dropTempView("orders_p")
  }

  test("EXECUTE IMMEDIATE binds positional params like the literal query") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_ei")
    val ei = spark.sql(
      "EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM orders_ei WHERE o_totalprice > ?' USING 400000")
      .head.getLong(0)
    val lit0 = spark.sql(
      "SELECT COUNT(*) AS n FROM orders_ei WHERE o_totalprice > 400000")
      .head.getLong(0)
    assert(ei == lit0 && ei > 0)
    spark.catalog.dropTempView("orders_ei")
  }

  test("SQL scripting: BEGIN/DECLARE/SET block computes and returns") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_sc")
    val key = "spark.sql.scripting.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val n = spark.sql(
        """BEGIN
             DECLARE total BIGINT DEFAULT 0;
             SET total = (SELECT COUNT(*) FROM orders_sc);
             SELECT total AS n;
           END""").head.getLong(0)
      assert(n == Tables(spark, sf, "orders").count())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.catalog.dropTempView("orders_sc")
    }
  }

  test("_metadata columns surface file lineage on file scans") {
    val rows = Tables.read(spark, s"$sf/orders.parquet")
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.file_size").as("fs"), col("o_orderkey"))
      .limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).endsWith(".parquet"), s"file_path: ${r.getString(0)}")
      assert(r.getLong(1) > 0, "file_size must be positive")
    }
  }

  test("VARIANT survives a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-variant").toString
    spark.sql(
      """SELECT id, parse_json(concat('{"a": ', id, ', "s": "x"}')) AS v
         FROM range(100)""")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .selectExpr("id", "variant_get(v, '$.a', 'long') AS a",
        "variant_get(v, '$.s', 'string') AS s")
      .collect()
    assert(back.length == 100)
    back.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getString(2) == "x")
    }
  }

  test("Observation metrics ride the job — no second pass over the data") {
    val obs = new org.apache.spark.sql.Observation("graft_obs")
    val df = Tables(spark, sf, "orders")
      .observe(obs, count(lit(1)).as("rows"),
        sum(col("o_totalprice")).as("sumv"))
    val n = df.count()
    val m = obs.get
    assert(m("rows") == n, s"observed ${m("rows")} vs action $n")
    assert(m("sumv").asInstanceOf[Double] > 0)
  }

  test("native XML source round-trips typed rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val out = s"$dir/events_xml"
    val src = Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(200)
    src.write.mode("overwrite")
      .option("rootTag", "events").option("rowTag", "event")
      .format("xml").save(out)
    val back = spark.read.option("rowTag", "event").format("xml").load(out)
      .select(col("event_id").cast("long"), col("event_type"),
        col("value").cast("double"))
    assert(back.count() == 200)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "XML write -> read must preserve rows and values")
  }
}
