package graft

import org.apache.spark.sql.functions._

/** Behavioral properties of the round-6 curation operators — the
  * invariants the hash gate cannot see: budget conservation and
  * flattening for temperature resampling, a transparent driver-side
  * re-derivation for the unigram-LM scorer, cluster-membership /
  * maximality for canonical selection, and partitioning-invariance +
  * assignment-consistency for SemDeDup.
  */
class CurationOpsSpec extends SparkSpec {

  test("sample_temperature: targets conserve the budget exactly and flatten the mix") {
    val r = SparkEntry.queries("sample_temperature")(spark, sf)
      .select("lang", "c", "target").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r.map(_._3).sum == 100000L, "largest-remainder apportionment must hit the budget exactly")
    assert(r.forall(_._3 > 0), "every observed language keeps a share")
    // τ=1/2 flattens: the target ratio between the biggest and smallest
    // language must be strictly smaller than their count ratio
    val byC = r.sortBy(_._2)
    val (cMin, cMax) = (byC.head, byC.last)
    val countRatio = cMax._2.toDouble / cMin._2
    val targetRatio = cMax._3.toDouble / cMin._3
    assert(targetRatio < countRatio,
      s"temperature must compress the mix: target ratio $targetRatio vs count ratio $countRatio")
    assert(targetRatio > 1.0, "but not invert it")
  }

  test("text_perplexity: engine result equals a transparent driver-side fold") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.flatMap { case (id, t) => t.split(" ").filter(_.nonEmpty).map(id -> _) }
    val counts = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    def fl2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expect = toks.groupBy(_._1).map { case (id, ts) =>
      val bits = ts.map { case (_, tok) => (fl2(n) - fl2(counts(tok))).toLong }.sum
      // mirror Spark's round(): shortest-repr BigDecimal.valueOf + HALF_UP
      id -> ((ts.length.toLong, bits,
        java.math.BigDecimal.valueOf(bits.toDouble / ts.length)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()))
    }
    val got = SparkEntry.queries("text_perplexity")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: engine ${got(id)} vs driver fold $e")
    }
  }

  test("dedup_canonical: keeper is the max-quality member of its own cluster") {
    val comp = SparkEntry.queries("dedup_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = SparkEntry.queries("dedup_canonical")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(canon.nonEmpty)
    val byComp = comp.groupBy(_._2)
    assert(canon.map(_._1).toSet == byComp.keySet, "one keeper per component, all components")
    canon.foreach { case (cmp, keepId, keepChars, sz) =>
      val members = byComp(cmp).keys.toSeq
      assert(comp(keepId) == cmp, s"keeper $keepId must belong to cluster $cmp")
      assert(sz == members.size, s"cluster $cmp size")
      assert(keepChars == members.map(chars).max, s"cluster $cmp keeper quality must be maximal")
      val best = members.filter(m => chars(m) == keepChars).min
      assert(keepId == best, s"cluster $cmp tie-break must pick the smallest id")
    }
  }

  test("dedup_semantic: partitioning-invariant, and pairs agree with the assignment") {
    val emb = Tables(spark, sf, "embeddings")
    val base = operators.Similarity.semanticPairsExact(emb, "label")
      .orderBy(col("cos").desc, col("a_id"), col("b_id")).limit(20).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val reparted = operators.Similarity.semanticPairsExact(emb.repartition(7), "label")
      .orderBy(col("cos").desc, col("a_id"), col("b_id")).limit(20).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(base.sameElements(reparted), "SemDeDup must not depend on input partitioning")
    assert(base.nonEmpty)
    assert(base.forall { case (_, a, b, cos) => a < b && cos <= 1.0001 && cos >= -1.0001 })
    // a pair can only surface through a shared assigned cluster, so both
    // members' assignment is the pair's cell by construction; assert the
    // cells are drawn from the seed-label domain (assignment stayed in-range)
    val labels = emb.select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(base.forall { case (c, _, _, _) => labels.contains(c) })
  }

  test("dedup_semantic scale-following sub-cells: invariant, in-domain, and k really grows") {
    val emb = Tables(spark, sf, "embeddings")
    val sub = 3
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.Similarity.semanticPairsExact(df, "label", sub)
        .orderBy(col("cos").desc, col("a_id"), col("b_id")).limit(20).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val base = run(emb)
    assert(base.sameElements(run(emb.repartition(7))),
      "sub-celled SemDeDup must not depend on input partitioning")
    assert(base.nonEmpty)
    assert(base.forall { case (_, a, b, _) => a < b })
    // cell ids live in the label×sub product domain
    val labels = emb.select("label").distinct().collect().map(_.getInt(0).toLong).toSet
    assert(base.forall { case (c, _, _, _) =>
      labels.contains(c / sub) && c % sub >= 0 && c % sub < sub })
    // the lever moves: the reassigned clustering uses MORE distinct
    // cells than the fixed-seed run (the whole point — Σ|cell|² must
    // shrink as k grows) and its densest cell generates FEWER pairs
    // (the Lloyd step spreads a label across its sub-seeds instead of
    // one sub-centroid capturing everything)
    val fixed = operators.Similarity.semanticPairsExact(emb, "label")
    val scaled = operators.Similarity.semanticPairsExact(emb, "label", sub)
    def cellStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val per = df.groupBy("cell").count()
      (per.count(),
        per.agg(org.apache.spark.sql.functions.max("count")).head.getLong(0))
    }
    val (fixedCells, fixedMaxPairs) = cellStats(fixed)
    val (scaledCells, scaledMaxPairs) = cellStats(scaled)
    assert(scaledCells > fixedCells,
      s"sub-celling must raise the active cell count ($scaledCells vs $fixedCells)")
    assert(scaledMaxPairs < fixedMaxPairs,
      s"sub-celling must thin the densest cell ($scaledMaxPairs vs $fixedMaxPairs pairs)")
  }

  // --- round-6 additions: quota cap, shard manifest, NB classifier ---

  private val P = 2147483647L
  private def bucketK(id: Long, k: Int): Long = (id % P + P) % P * 48271L % P % k
  private def orderKey(id: Long): Long = (id % P + P) % P * 16807L % P

  test("sample_capped: survivors = per-source hash-order top-10, on any partitioning") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (orderKey(r._1), r._1)).take(10).toSeq
    }.map(_._1).toSet
    val got = SparkEntry.queries("sample_capped")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect, "engine survivors must equal the driver-side hash fold")
    assert(docs.length > expect.size, "the cap must actually filter")
    val reparted = operators.Sampling
      .quotaCap(Tables(spark, sf, "documents").repartition(7), "doc_id", "source", 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(reparted == expect, "quota survivors must not depend on input partitioning")
  }

  test("sample_shards: shards partition the corpus; head_doc is the hash-order minimum") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byShard = docs.groupBy(d => bucketK(d._1, 8))
    val got = SparkEntry.queries("sample_shards")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == byShard.keySet, "every non-empty shard appears exactly once")
    assert(got.values.map(_._1).sum == docs.length, "shards must partition the corpus")
    byShard.foreach { case (s, members) =>
      val (n, chars, head) = got(s)
      assert(n == members.size && chars == members.map(_._2).sum, s"shard $s totals")
      assert(head == members.minBy(d => (orderKey(d._1), d._1))._1,
        s"shard $s head_doc must be the within-shard training-order minimum")
    }
  }

  test("exportShards: files read back in manifest order — slices ascend, rows in training order") {
    val sp = graft.operators.Sampling
    val docsDf = Tables(spark, sf, "documents").select("doc_id", "n_chars")
    val out = java.nio.file.Files.createTempDirectory("shard_export").toString
    sp.exportShards(docsDf, "doc_id", shards = 4, out, filesPerShard = 2)

    val all = docsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val byShard = all.groupBy(d => bucketK(d._1, 4))
    val manifest = docsDf
      .withColumn("shard", sp.hashBucketK(col("doc_id"), 4))
      .groupBy("shard")
      .agg(min_by(col("doc_id"),
        struct(sp.orderKey(col("doc_id")), col("doc_id"))).as("head_doc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val seen = collection.mutable.ArrayBuffer.empty[Long]
    byShard.keySet.foreach { s =>
      val files = sp.shardFiles(spark, out, s.toInt)
      assert(files.nonEmpty, s"shard $s wrote no files")
      // concatenated file order IS training order: the order key never
      // decreases across the whole shard, files and slices included
      val ids = files.flatMap(f => spark.read.parquet(f)
        .select("doc_id").collect().map(_.getLong(0)))
      val keys = ids.map(id => (orderKey(id), id))
      assert(keys == keys.sorted,
        s"shard $s not in training order across its files")
      assert(ids.head == manifest(s),
        s"shard $s first row must be the manifest head_doc")
      assert(ids.toSet == byShard(s).map(_._1).toSet,
        s"shard $s membership must match the hash assignment")
      seen ++= ids
    }
    assert(seen.size == all.length, "shards must partition the corpus")
    // filesPerShard=2 actually split: some shard holds ≥2 files
    assert(byShard.keySet.exists(s =>
      sp.shardFiles(spark, out, s.toInt).size >= 2),
      "range partitioning produced no multi-file shard")
  }

  test("NaiveBayes.trainScore: disjoint vocabularies classify train AND holdout perfectly") {
    import spark.implicits._
    val vocabs = Map(
      "aa" -> Vector("alpha", "bravo", "charlie"),
      "bb" -> Vector("delta", "echo", "foxtrot"),
      "cc" -> Vector("golf", "hotel", "india"))
    val langs = Vector("aa", "bb", "cc")
    val rows = (0L until 120L).map { id =>
      val l = langs((id % 3).toInt)
      val v = vocabs(l)
      val text = (0 until 8).map(i => v(((id + i) % v.size).toInt)).mkString(" ")
      (id, l, text)
    }
    val df = rows.toDF("doc_id", "lang", "text").repartition(5)
    val pred = operators.NaiveBayes
      .trainScore(df, "doc_id", "text", "lang", col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred.size == 120, "one prediction per document")
    rows.foreach { case (id, l, _) =>
      assert(pred(id) == l, s"doc $id: predicted ${pred(id)}, wanted $l")
    }
  }

  test("FixedLog2.qlog2 matches a driver-side fold and stays within 1/64 bit of log2") {
    import spark.implicits._
    def ref(x: Long): Long = {
      val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val p = (x << 20) >> m
      64L * m + graft.functions.FixedLog2.thresholds.count(p >= _)
    }
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 63L, 64L, 100L, 12345L, 999983L,
      (1L << 41) + 12345L)
    val got = xs.toDF("x")
      .select(col("x"), graft.functions.FixedLog2.qlog2(col("x")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(got(x) == ref(x), s"qlog2($x)")
      val err = got(x) / 64.0 - math.log(x.toDouble) / math.log(2)
      assert(err <= 0 && err > -2.0 / 64, s"qlog2($x) drifted: $err bits")
    }
    intercept[Exception] {
      Seq(1L << 42).toDF("x")
        .select(graft.functions.FixedLog2.qlog2(col("x"))).collect()
    }
  }
}
