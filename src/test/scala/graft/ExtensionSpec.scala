package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorFns}
import graft.operators.AsOfJoin
import graft.sources.Sources

/** Specs for the extension surface: the codegen'd DotProductFloat
  * expression, the composed as-of join, and CSV/JSON sources.
  */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product ≡ higher-order-function dot, exactly") {
    val emb = Tables(spark, sf, "embeddings").limit(100)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
      .filter(col("a_id") < col("b_id")).limit(500)
    val diff = pairs.select(
      (DotProduct.dotNative(col("ea"), col("eb")) -
        VectorFns.dot(col("ea"), col("eb"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"native vs HOF dot differ by $diff")
  }

  test("graft_dot is callable from SQL after registration") {
    DotProduct.register(spark)
    Tables(spark, sf, "embeddings").limit(10).createOrReplaceTempView("emb10")
    val n = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, b.embedding) AS d
         FROM emb10 a JOIN emb10 b ON a.vec_id < b.vec_id""").count()
    assert(n == 45)
  }

  test("native dot: hand-computed value and null propagation") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (None, Some(Array(1.0f))),
    ).toDF("a", "b")
    val got = df.select(DotProduct.dotNative(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).isNullAt(0))
  }

  test("as-of join backward: hand-built micro-case incl. ties and no-match") {
    val trades = Seq( // (sym, t, qty)
      ("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4))
      .toDF("sym", "t", "qty")
    val quotes = Seq( // (sym, t, px)
      ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 25L, 3.0), ("C", 1L, 9.0))
      .toDF("sym", "t", "px")
    val got = AsOfJoin
      .backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.toString.toLong),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got(0) == (("A", 10L, Some(5L), Some(1.0))))  // before 20
    assert(got(1) == (("A", 20L, Some(20L), Some(2.0)))) // tie: inclusive
    assert(got(2) == (("A", 30L, Some(25L), Some(3.0)))) // latest ≤ 30
    assert(got(3) == (("B", 15L, None, None)))           // no quotes for B
  }

  test("as-of join forward: next-at-or-after match incl. ties and no-match") {
    val trades = Seq(
      ("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4))
      .toDF("sym", "t", "qty")
    val quotes = Seq(
      ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 25L, 3.0), ("C", 1L, 9.0))
      .toDF("sym", "t", "px")
    val got = AsOfJoin
      .forward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.toString.toLong),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got(0) == (("A", 10L, Some(20L), Some(2.0)))) // earliest ≥ 10
    assert(got(1) == (("A", 20L, Some(20L), Some(2.0)))) // tie: inclusive
    assert(got(2) == (("A", 30L, None, None)))           // nothing after 30
    assert(got(3) == (("B", 15L, None, None)))           // no quotes for B
    // forward tolerance bounds the LOOKAHEAD gap
    val l = Seq(("A", 10L, 1)).toDF("k", "t", "x")
    val r = Seq(("A", 100L, 7.0)).toDF("k", "t", "v")
    assert(AsOfJoin.forward(l, r, Seq("k"), "t", "t", Seq("v"), Some(200L))
      .collect()(0).getDouble(4) == 7.0)
    assert(AsOfJoin.forward(l, r, Seq("k"), "t", "t", Seq("v"), Some(50L))
      .collect()(0).isNullAt(4))
  }

  test("as-of join tolerance nulls out stale matches") {
    val l = Seq(("A", 100L, 1)).toDF("k", "t", "x")
    val r = Seq(("A", 10L, 7.0)).toDF("k", "t", "v")
    val within = AsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("v"), Some(200L))
      .collect()(0)
    assert(within.getDouble(4) == 7.0)
    val stale = AsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("v"), Some(50L))
      .collect()(0)
    assert(stale.isNullAt(4))
  }

  test("csv and json sources round-trip the orders table") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("src_rt").toString
    Sources.writeCsv(orders, s"$dir/csv")
    val csvBack = Sources.csv(spark, s"$dir/csv")
    assert(csvBack.count() == 200)
    assert(csvBack.schema("o_orderkey").dataType.typeName == "integer" ||
      csvBack.schema("o_orderkey").dataType.typeName == "long")
    Sources.writeJson(orders, s"$dir/json")
    val jsonBack = Sources.json(spark, s"$dir/json")
    assert(jsonBack.count() == 200)
    assert(jsonBack.exceptAll(
      orders.select(col("o_orderkey").cast("long"), col("o_orderstatus"),
        col("o_totalprice"))).isEmpty ||
      jsonBack.columns.sorted.sameElements(orders.columns.sorted))
  }

  test("orc source: lossless round-trip, filter pushdown reaches the scan") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString + "/orders"
    Sources.writeOrc(orders, dir)
    val back = Sources.orc(spark, dir)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // scale posture holds for the second columnar format too
    val plan = back.filter(col("o_totalprice") > 100000)
      .select("o_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      s"ORC pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"ORC pruning missing:\n$plan")
  }

  test("optimizer rule: COUNT(DISTINCT) rewrites to HLL only under the opt-in flag") {
    import graft.plans.ApproxDistinctRule
    ApproxDistinctRule.install(spark)
    val orders = Tables(spark, sf, "orders")
    def q = orders.agg(countDistinct(col("o_custkey")).as("d"))
    // flag off (default): exact semantics, no sketch in the plan
    val exact = q.head.getLong(0)
    assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"),
      "rule must not fire without the flag")
    spark.conf.set(ApproxDistinctRule.flag, "true")
    try {
      val rewritten = q
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct"),
        s"expected the HLL rewrite in the optimized plan:\n$opt")
      // same column name and type, estimate within the sketch's rsd
      assert(rewritten.schema("d").dataType.typeName == "long")
      val est = rewritten.head.getLong(0)
      assert(math.abs(est - exact).toDouble / exact < 0.1,
        s"estimate $est vs exact $exact")
    } finally spark.conf.set(ApproxDistinctRule.flag, "false")
  }

  test("schema evolution: mergeSchema unifies parquet generations; old rows null-fill") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    // generation 1: (id, v) — the table as originally written
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").write.parquet(s"$dir/g=1")
    // generation 2: a column added upstream — (id, v, tag)
    Seq((3L, 30.0, "new")).toDF("id", "v", "tag").write.parquet(s"$dir/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v", "tag", "g"),
      s"unified schema expected, got ${merged.columns.mkString(",")}")
    val rows = merged.select("id", "tag")
      .as[(Long, Option[String])].collect().toMap
    // pre-evolution rows surface the new column as NULL; new rows carry it
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some("new")), s"got $rows")
    // pushdown on a common column still reaches the scan across generations
    val plan = merged.filter(col("id") > 1).select("id", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"),
      s"pushdown must survive schema merge:\n$plan")
  }

  test("cloud storage API shape: one reader path, connector-gated schemes") {
    // local filesystem resolves; object-store schemes need connector
    // jars that the offline build intentionally does not bundle
    assert(Sources.cloudReadable(spark, "file"))
    assert(!Sources.cloudReadable(spark, "s3a"),
      "offline build must not silently claim s3a support")
    // connector config lands in the session's Hadoop conf (public keys)
    Sources.configureCloud(spark, Map(
      "fs.s3a.endpoint" -> "http://localhost:9000",
      "fs.s3a.path.style.access" -> "true"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    // the SAME reader entry point is used for cloud URIs: a read attempt
    // fails on the missing connector (informative), not on graft code
    val err = intercept[Exception] {
      Tables.read(spark, "s3a://nonexistent-bucket/data.parquet").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m =>
      m.contains("s3a") || m.contains("S3A") || m.contains("FileSystem")),
      s"expected a filesystem-resolution error, got: ${messages(err)}")
  }

  test("cloud integration: a registered connector serves the SAME reader path") {
    // Register a mock object-store connector exactly the way a real one
    // is registered (the public fs.<scheme>.impl contract), then read a
    // parquet table through an object-store URI end to end: resolution,
    // listing, split planning, and footer reads all run through the
    // FileSystem abstraction — the claim behind "s3a works unchanged
    // once the jars are present", proven without network.
    Sources.configureCloud(spark, Map(
      "fs.mocks3.impl" -> classOf[MockObjectStoreFs].getName))
    assert(Sources.cloudReadable(spark, "mocks3"))
    val viaCloud = Tables.read(spark, s"mocks3://bucket$sf/orders.parquet")
    val viaLocal = Tables.read(spark, s"$sf/orders.parquet")
    assert(viaCloud.count() == viaLocal.count() && viaCloud.count() > 0)
    // pushdown survives the cloud path: predicate reaches the scan
    val plan = viaCloud.filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      s"pushdown must survive the object-store path:\n$plan")
  }
}
