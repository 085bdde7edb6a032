package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, VectorIndex}

/** Persistent IVF index: deterministic build, incremental add, and
  * search recall against the exact brute-force baseline.
  */
class VectorIndexSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-vec-index").toString

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("build is bit-deterministic: two builds, identical centroids") {
    val (d1, d2) = (tmp(), tmp())
    new VectorIndex(d1, nCells = 8, iters = 3).build(spark, emb)
    new VectorIndex(d2, nCells = 8, iters = 3).build(spark, emb)
    val c1 = spark.read.parquet(s"$d1/centroids").orderBy("cell")
    val c2 = spark.read.parquet(s"$d2/centroids").orderBy("cell")
    assert(c1.collect().sameElements(c2.collect()),
      "exact-integer centroids must be identical across builds")
  }

  test("sampled k-means: Lloyd sees exactly the lowest-hash sample") {
    // Past nSample the Lloyd rounds must train on the nSample
    // lowest-(xxhash64(vec_id), vec_id) vectors and nothing else — so
    // a sampled build over the full corpus and an unsampled build over
    // just that sample must learn BYTE-IDENTICAL centroids (only the
    // final full-corpus assignment differs). Also pins determinism of
    // the sampled path: two sampled builds agree.
    val (dFull, dFull2, dSub) = (tmp(), tmp(), tmp())
    new VectorIndex(dFull, nCells = 8, iters = 3, nSample = 64)
      .build(spark, emb)
    new VectorIndex(dFull2, nCells = 8, iters = 3, nSample = 64)
      .build(spark, emb)
    val sample = emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(64)
    new VectorIndex(dSub, nCells = 8, iters = 3).build(spark, sample)
    val cFull = spark.read.parquet(s"$dFull/centroids").orderBy("cell").collect()
    val cFull2 = spark.read.parquet(s"$dFull2/centroids").orderBy("cell").collect()
    val cSub = spark.read.parquet(s"$dSub/centroids").orderBy("cell").collect()
    assert(cFull.sameElements(cFull2), "sampled build must be deterministic")
    assert(cFull.sameElements(cSub),
      "sampled Lloyd must equal an unsampled build on the sample itself")
    // the final assignment still covers the FULL corpus
    assert(spark.read.parquet(s"$dFull/vectors").count() == emb.count())
    // and the sampled index still honors the self-match contract
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val idx = new VectorIndex(dFull, nCells = 8, iters = 3, nSample = 64)
    idx.search(spark, qs, k = 1, nprobe = 8).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && math.abs(r.getDouble(3) - 1.0) < 1e-9)
    }
  }

  test("added vectors are searchable; self-query hits itself at cos 1") {
    val dir = tmp()
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val idx = new VectorIndex(dir, nCells = 8, iters = 3)
    idx.build(spark, half1)
    val n1 = idx.vectors(spark).count()
    val added = idx.add(spark, half2)
    assert(idx.vectors(spark).count() == n1 + added)
    assert(added == half2.count())

    val qs = half2.filter(col("vec_id") < 40)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top1 = idx.search(spark, qs, k = 1, nprobe = 8).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"self-query ${r.getLong(0)} must hit itself, got ${r.getLong(1)}")
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    }
  }

  test("nprobe search recall vs brute-force baseline") {
    val dir = tmp()
    val idx = new VectorIndex(dir, nCells = 8, iters = 3)
    idx.build(spark, emb)
    val qs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // k=6 then drop self: an indexed query's self-match occupies rank 1,
    // the remaining 5 are the contract's true top-5 non-self neighbors
    val got = idx.search(spark, qs, k = 6, nprobe = 4)
      .filter(col("q_id") =!= col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // baseline under the SAME quantized-cosine contract the index uses
    // (float brute differs at sub-µ near-ties on the k boundary)
    val brute = Similarity.bruteTopKExact(qs, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.5,
      s"nprobe=4/8 recall $recall below floor (got ${got.size}, brute ${brute.size})")
    // full probe = exhaustive: must reproduce the exact-contract brute set
    val full = idx.search(spark, qs, k = 6, nprobe = 8)
      .filter(col("q_id") =!= col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute,
      s"nprobe=all must equal exact brute: missing=${(brute -- full).take(5)} extra=${(full -- brute).take(5)}")
  }

  test("large query batches take the salted shuffle path, bit-identical results") {
    val dir = tmp()
    val idx = new VectorIndex(dir, nCells = 8, iters = 3)
    idx.build(spark, emb)
    val qs = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val viaBroadcast = idx.search(spark, qs, k = 3, nprobe = 2)
    val viaShuffle = idx.search(spark, qs, k = 3, nprobe = 2,
      broadcastProbeLimit = 1)
    // the path actually switched: the salted join's salt column and
    // probe-side explode appear only in the shuffle plan
    val pShuffle = viaShuffle.queryExecution.optimizedPlan.toString
    val pBroadcast = viaBroadcast.queryExecution.optimizedPlan.toString
    assert(pShuffle.contains("salt") && !pBroadcast.contains("salt"))
    val a = viaBroadcast.orderBy("q_id", "rank").collect()
    val b = viaShuffle.orderBy("q_id", "rank").collect()
    assert(a.sameElements(b),
      "broadcast and salted-shuffle search paths must agree bit-for-bit")
  }

  test("committed staged adds are published by recover(); uncommitted discarded") {
    val dir = tmp()
    val idx = new VectorIndex(dir, nCells = 8, iters = 3)
    idx.build(spark, emb.filter(col("vec_id") < 450))
    val n0 = idx.vectors(spark).count()

    // simulate a crash AFTER the commit marker, BEFORE publish: stage
    // through the real add() staging path, then "die"
    val extra = emb.filter(col("vec_id") >= 450)
    val staged = idx.stageAdd(spark, extra)
    // plus an uncommitted staging dir that must be discarded
    val junk = new java.io.File(s"$dir/staging/junk")
    junk.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/staging/junk/part-x.parquet"), Array[Byte](9))

    idx.recover(spark)
    assert(idx.vectors(spark).count() == n0 + extra.count(),
      "recover() must publish the committed staged add")
    assert(!new java.io.File(staged).exists())
    assert(!new java.io.File(s"$dir/staging/junk").exists())
    // and the published vectors are searchable
    val qs2 = extra.limit(5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top1 = idx.search(spark, qs2, k = 1, nprobe = 8).collect()
    top1.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("remove: retracted vectors leave search results; rebuild folds in") {
    val dir = tmp()
    val idx = new VectorIndex(dir, nCells = 8, iters = 3)
    idx.build(spark, emb)
    val n0 = idx.vectors(spark).count()

    val victims = emb.filter(col("vec_id") % 5 === 0).select("vec_id")
    val nGone = idx.remove(spark, victims)
    assert(nGone > 0 && idx.vectors(spark).count() == n0 - nGone)

    // a retracted vector is no longer returned — not even to itself
    val qs = emb.filter(col("vec_id") % 5 === 0).limit(10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val hits = idx.search(spark, qs, k = 5, nprobe = 8)
    assert(hits.join(victims.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_semi").count() == 0,
      "search must never return a retracted vector")
    // survivors still rank (the cells are not emptied wholesale)
    assert(hits.count() > 0)

    // retraction wins over re-add until rebuild
    idx.add(spark, emb.filter(col("vec_id") % 5 === 0))
    assert(idx.search(spark, qs, k = 1, nprobe = 8)
      .filter(col("q_id") === col("neighbor_id")).count() == 0,
      "re-added tombstoned ids must stay invisible until rebuild")

    // rebuild clears tombstones: self-queries return themselves again
    idx.build(spark, emb)
    val self = idx.search(spark, qs, k = 1, nprobe = 8)
    assert(self.count() == 10)
    self.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
