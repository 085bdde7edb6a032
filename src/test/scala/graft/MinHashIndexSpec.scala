package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MinHashIndex}
import graft.queries.LlmOps

/** Persistent MinHash index: incremental batch-vs-history dedup must
  * agree with the corpus-wide operator, both join paths bit-identical,
  * adds crash-safe, builds deterministic.
  */
class MinHashIndexSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-mh-index").toString

  private lazy val docsAll = Tables(spark, sf, "documents")
  private lazy val evens = docsAll.filter(col("doc_id") % 2 === 0)
  private lazy val odds = docsAll.filter(col("doc_id") % 2 === 1)

  test("dedupAgainst ≡ corpus-wide minhashPairs restricted to cross pairs") {
    val dir = tmp()
    val idx = new MinHashIndex(dir, numHashes = 32, bands = 8)
    idx.build(spark, LlmOps.shingles(evens))
    val inc = idx
      .dedupAgainst(spark, LlmOps.shingles(odds), minEst = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // corpus-wide pairs are (a < b, either parity); reorient the
    // cross-parity ones to (hist = even, new = odd) — n_agree is
    // symmetric, so the incremental path must reproduce them exactly
    val full = Dedup
      .minhashPairs(LlmOps.shingles(docsAll), "doc_id", "sh",
        numHashes = 32, bands = 8, minEst = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, n) => if (a % 2 == 0) (a, b, n) else (b, a, n) }
      .toSet
    assert(inc == full,
      s"incremental must equal restricted corpus-wide: " +
        s"missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
    assert(inc.nonEmpty, "fixture must exercise at least one cross pair")
  }

  test("broadcast and merge band-join paths agree bit-for-bit") {
    val dir = tmp()
    val idx = new MinHashIndex(dir, numHashes = 32, bands = 8)
    idx.build(spark, LlmOps.shingles(evens))
    val batch = LlmOps.shingles(odds)
    val viaBroadcast = idx.dedupAgainst(spark, batch, minEst = 0.0)
    val viaMerge = idx.dedupAgainst(spark, batch, minEst = 0.0,
      broadcastBandLimit = 0L)
    // the gate actually switched strategies
    assert(viaBroadcast.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"))
    assert(!viaMerge.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"))
    val a = viaBroadcast.orderBy("hist_id", "new_id").collect()
    val b = viaMerge.orderBy("hist_id", "new_id").collect()
    assert(a.sameElements(b),
      "broadcast and merge dedup paths must agree bit-for-bit")
  }

  test("build is deterministic; re-ingested docs self-match at n_agree = numHashes") {
    val (d1, d2) = (tmp(), tmp())
    new MinHashIndex(d1).build(spark, LlmOps.shingles(evens))
    new MinHashIndex(d2).build(spark, LlmOps.shingles(evens))
    val s1 = spark.read.parquet(s"$d1/signatures").orderBy("doc_id").collect()
    val s2 = spark.read.parquet(s"$d2/signatures").orderBy("doc_id").collect()
    assert(s1.sameElements(s2), "signatures must be build-deterministic")

    // probing the index WITH an indexed slice: every probed doc that
    // carries a signature must self-match perfectly
    val idx = new MinHashIndex(d1)
    val probe = evens.filter(col("doc_id") < 100)
    val self = idx.dedupAgainst(spark, LlmOps.shingles(probe), minEst = 0.2)
      .filter(col("hist_id") === col("new_id"))
    val expected = LlmOps.shingles(probe).select("doc_id").distinct().count()
    assert(self.count() == expected, "every re-ingested doc must self-match")
    assert(self.filter(col("n_agree") =!= 32).count() == 0,
      "self-matches must agree on every signature component")
  }

  test("committed staged adds are published by recover(); uncommitted discarded") {
    val dir = tmp()
    val idx = new MinHashIndex(dir)
    idx.build(spark, LlmOps.shingles(evens.filter(col("doc_id") < 400)))
    val n0 = idx.signatures(spark).count()

    // crash AFTER the commit marker, BEFORE publish
    val late = LlmOps.shingles(evens.filter(col("doc_id") >= 400))
    val staged = idx.stageAdd(spark, late, "doc_id", "sh")
    val junk = new java.io.File(s"$dir/staging/junk")
    junk.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/staging/junk/part-x.parquet"), Array[Byte](9))

    idx.recover(spark)
    val nLate = late.select("doc_id").distinct().count()
    assert(idx.signatures(spark).count() == n0 + nLate,
      "recover() must publish the committed staged add")
    assert(!new java.io.File(staged).exists())
    assert(!new java.io.File(s"$dir/staging/junk").exists())

    // published signatures participate in dedup: the late slice
    // re-probed self-matches through the recovered state
    val hits = idx.dedupAgainst(spark, late, minEst = 0.2)
      .filter(col("hist_id") === col("new_id"))
    assert(hits.count() == nLate)
  }

  test("remove: retracted ids stop matching; retraction wins over re-add; rebuild folds in") {
    val dir = tmp()
    val idx = new MinHashIndex(dir)
    idx.build(spark, LlmOps.shingles(evens))
    val n0 = idx.signatures(spark).count()

    val victims = evens.filter(col("doc_id") % 4 === 0).select("doc_id")
    val nGone = idx.remove(spark, victims)
    assert(nGone > 0)
    // live signatures drop by exactly the signature-BEARING victims
    // (sub-3-token docs never had one)
    val sigVictims = victims.join(
      spark.read.parquet(s"$dir/signatures"), Seq("doc_id"), "left_semi").count()
    assert(idx.signatures(spark).count() == n0 - sigVictims)

    // a retracted doc no longer matches — even probed by itself
    val probe = LlmOps.shingles(evens.filter(col("doc_id") % 4 === 0))
    assert(idx.dedupAgainst(spark, probe, minEst = 0.2)
      .filter(col("hist_id") === col("new_id")).count() == 0,
      "a retracted doc must not self-match")

    // retraction wins over re-add within the generation
    idx.add(spark, probe)
    assert(idx.dedupAgainst(spark, probe, minEst = 0.2)
      .filter(col("hist_id") === col("new_id")).count() == 0,
      "re-adding a tombstoned id must stay invisible until rebuild")

    // incremental path ≡ corpus-wide pairs over the REDUCED history
    val reduced = evens.filter(col("doc_id") % 4 =!= 0)
    val inc = idx.dedupAgainst(spark, LlmOps.shingles(odds), minEst = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Dedup
      .minhashPairs(LlmOps.shingles(reduced.unionByName(odds)), "doc_id", "sh",
        numHashes = 32, bands = 8, minEst = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, n) => if (a % 2 == 0) (a, b, n) else (b, a, n) }
      .toSet
    assert(inc == expect, "post-remove dedup must see only the live history")

    // rebuild folds the tombstones away: the victims match again
    idx.build(spark, LlmOps.shingles(evens))
    assert(idx.dedupAgainst(spark, probe, minEst = 0.2)
      .filter(col("hist_id") === col("new_id")).count() ==
        probe.select("doc_id").distinct().count(),
      "build() must clear tombstones")
  }

  test("incremental adds ≡ one-shot build: same state, same answers") {
    val (dInc, dOne) = (tmp(), tmp())
    val inc = new MinHashIndex(dInc)
    inc.build(spark, LlmOps.shingles(evens.filter(col("doc_id") < 300)))
    inc.add(spark, LlmOps.shingles(
      evens.filter(col("doc_id") >= 300 && col("doc_id") < 700)))
    inc.add(spark, LlmOps.shingles(evens.filter(col("doc_id") >= 700)))
    new MinHashIndex(dOne).build(spark, LlmOps.shingles(evens))
    val a = inc.signatures(spark).orderBy("doc_id").collect()
    val b = new MinHashIndex(dOne).signatures(spark).orderBy("doc_id").collect()
    assert(a.sameElements(b),
      "an incrementally-grown index must equal the one-shot build")
  }
}
