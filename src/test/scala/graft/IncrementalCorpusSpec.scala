package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.pipeline.IncrementalCorpus
import graft.queries.LlmOps
import graft.sources.Sources

/** Incremental ingestion vs a transparent driver-side reference with
  * IDENTICAL semantics (exact md5 first-wins; LSH band-collision
  * candidates; est ≥ tau; within-batch components keep min id). The
  * distributed version must accept exactly the same doc set across two
  * batches containing exact copies, near copies, and novel docs — and
  * re-ingesting a batch must be a complete no-op.
  */
class IncrementalCorpusSpec extends SparkSpec {

  private val numHashes = 32
  private val bands = 8
  private val rr = numHashes / bands
  private val tau = 0.7

  test("two-batch ingest ≡ greedy reference; re-ingest is a no-op") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs.filter(col("doc_id") < 250)
    // near/exact copies come from the LONGEST b1 docs so shingle
    // overlap stays high for the near variants
    val longest = b1.orderBy(col("n_chars").desc, col("doc_id"))
      .limit(40).collect()
    val exactCopies = longest.take(20).zipWithIndex.map { case (r0, i) =>
      (10000L + i, r0.getString(1), r0.getString(2), r0.getString(3), r0.getLong(4))
    }
    val nearCopies = longest.drop(20).zipWithIndex.map { case (r0, i) =>
      (20000L + i, r0.getString(1) + " zz qq trailing marker tokens",
        r0.getString(2), r0.getString(3), r0.getLong(4))
    }
    val b2 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
      .unionByName((exactCopies ++ nearCopies).toSeq
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-inc-corpus").toString
    val inc = new IncrementalCorpus(stateDir, numHashes, bands, tau)
    val s1 = inc.ingest(spark, b1)
    val s2 = inc.ingest(spark, b2)
    val got = inc.accepted(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet

    // ---- driver-side greedy reference (same rules, transparent code)
    val allDocs = b1.unionByName(b2)
    val sigOf = Dedup.minhashSignatures(
      LlmOps.shinglesRaw(allDocs), "doc_id", "sh", numHashes)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def bandsOf(s: Array[Long]): Set[Seq[Long]] =
      (0 until bands).map(j => (j.toLong +: (0 until rr)
        .map(i => s(j * rr + i))).toSeq).toSet
    def est(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / numHashes
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    var acceptedIds = Vector.empty[Long]
    var seenSigIds = Vector.empty[Long] // sig index = every exact-survivor
    var seenMd5 = Set.empty[String]
    for (batch <- Seq(b1, b2)) {
      val rows = batch.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      // exact: within batch + vs state
      var batchMd5 = Set.empty[String]
      val exactOk = rows.filter { case (_, t) =>
        val m = md5hex(t)
        val fresh = !seenMd5.contains(m) && !batchMd5.contains(m)
        batchMd5 += m
        fresh
      }
      // near vs state: band-collision candidates against every SEEN
      // sig (accepted or rejected), est >= tau rejects
      val vsStateOk = exactOk.filter { case (id, _) =>
        sigOf.get(id) match {
          case None => true // <3 tokens: no signature, exact-only
          case Some(sig) =>
            val bk = bandsOf(sig)
            !seenSigIds.exists(a => sigOf.get(a).exists(as =>
              bandsOf(as).intersect(bk).nonEmpty && est(as, sig) >= tau))
        }
      }
      // near within batch: components over band-collision est-edges
      // among ALL sig-bearing exact-survivors (state-rejected docs
      // included — batch-boundary invariance); kept = state-surviving
      // docs that are their own component root
      val allIds = exactOk.map(_._1).filter(sigOf.contains)
      val parent = collection.mutable.Map(allIds.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (i <- allIds; j <- allIds if i < j) {
        val (si, sj) = (sigOf(i), sigOf(j))
        if (bandsOf(si).intersect(bandsOf(sj)).nonEmpty && est(si, sj) >= tau)
          parent(find(math.max(i, j))) = find(math.min(i, j))
      }
      val keep = vsStateOk.map(_._1)
        .filter(i => !sigOf.contains(i) || find(i) == i)
      acceptedIds ++= keep
      seenSigIds ++= exactOk.map(_._1).filter(sigOf.contains)
      // only ACCEPTED texts' md5s enter state (rejected near-dups are
      // caught again via their seen sigs, exact dups via the kept copy)
      seenMd5 ++= keep.map(k => md5hex(rows.find(_._1 == k).get._2))
    }
    assert(got == acceptedIds.toSet,
      s"incremental vs reference: only-got=${(got -- acceptedIds.toSet).take(5)} " +
        s"only-ref=${(acceptedIds.toSet -- got).take(5)}")

    // the copy paths actually fired
    assert(exactCopies.forall(c => !got.contains(c._1)), "exact copies must be rejected")
    assert(s2.afterExact < s2.batchRows, "cross-batch exact dedup must drop rows")
    assert(s2.acceptedNew < s2.afterExact, "near-dup rejection must drop rows")
    assert(s1.acceptedNew > 0 && s2.acceptedNew > 0)

    // idempotence: re-ingesting b2 accepts nothing
    val s3 = inc.ingest(spark, b2)
    assert(s3.acceptedNew == 0, s"re-ingest must be a no-op, accepted ${s3.acceptedNew}")
  }

  test("streamed ingest ≡ batch-by-batch; exactly-once across a restart") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs.filter(col("doc_id") < 150)
    val longest = b1.orderBy(col("n_chars").desc, col("doc_id")).limit(10).collect()
    val copies = longest.take(5).zipWithIndex.map { case (r0, i) =>
      (40000L + i, r0.getString(1), r0.getString(2), r0.getString(3), r0.getLong(4))
    } ++ longest.drop(5).zipWithIndex.map { case (r0, i) =>
      (50000L + i, r0.getString(1) + " zz qq trailing marker tokens",
        r0.getString(2), r0.getString(3), r0.getLong(4))
    }
    val b2 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 300)
      .unionByName(copies.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars"))

    // control: the proven batch-by-batch path
    val ctlDir = java.nio.file.Files.createTempDirectory("graft-inc-sctl").toString
    val ctl = new IncrementalCorpus(ctlDir, numHashes, bands, tau)
    ctl.ingest(spark, b1); ctl.ingest(spark, b2)
    val want = ctl.accepted(spark).get
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // streamed: each stream life picks up the files that arrived since
    // the checkpoint's committed offset as one micro-batch
    val inDir = java.nio.file.Files.createTempDirectory("graft-inc-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-inc-ck").toString
    val stDir = java.nio.file.Files.createTempDirectory("graft-inc-sst").toString
    val inc = new IncrementalCorpus(stDir, numHashes, bands, tau)
    b1.write.mode("append").parquet(inDir)
    val q1 = inc.ingestStream(spark, inDir, b1.schema, ckpt)
    q1.processAllAvailable(); q1.stop()
    b2.write.mode("append").parquet(inDir)
    val q2 = inc.ingestStream(spark, inDir, b1.schema, ckpt)
    q2.processAllAvailable(); q2.stop()
    val got = inc.accepted(spark).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"streamed vs batch-by-batch: " +
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")

    // exactly-once across a restart: same checkpoint, no new files —
    // nothing replays, nothing is double-accepted
    val q3 = inc.ingestStream(spark, inDir, b1.schema, ckpt)
    q3.processAllAvailable(); q3.stop()
    assert(inc.accepted(spark).get.count() == want.size.toLong,
      "restart on the committed checkpoint must not re-accept anything")
  }

  test("a corpus grows from a GraftTable: appendsSince cursors drive exactly-once ingest") {
    import spark.implicits._
    import graft.table.GraftTable
    // the composition a table-backed pipeline runs: document batches
    // land in a transaction-log table, a consumer follows the table
    // with appendsSince and feeds each new slice to the corpus — the
    // result must equal ingesting the same batches directly, and
    // re-consuming a stale cursor must change nothing (every replayed
    // doc exact- or self-matches state)
    val base = java.nio.file.Files.createTempDirectory("gt_corpus")
    val tbl = s"$base/tbl"
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs.filter(col("doc_id") < 200)
    val dupRow = b1.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .collect().head
    val b2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .unionByName(Seq((30000L, dupRow.getString(1), dupRow.getString(2),
        dupRow.getString(3), dupRow.getLong(4)))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

    val tableDriven = new IncrementalCorpus(
      s"$base/state_t", numHashes, bands, tau)
    val direct = new IncrementalCorpus(
      s"$base/state_d", numHashes, bands, tau)

    GraftTable.append(spark, tbl, b1, txn = Some(("docs", 0L)))
    val (slice1, c1) = GraftTable.appendsSince(spark, tbl, -1L)
    tableDriven.ingest(spark, slice1)
    direct.ingest(spark, b1)

    GraftTable.append(spark, tbl, b2, txn = Some(("docs", 1L)))
    val (slice2, c2) = GraftTable.appendsSince(spark, tbl, c1)
    tableDriven.ingest(spark, slice2)
    direct.ingest(spark, b2)

    def acceptedIds(c: IncrementalCorpus): Set[Long] =
      c.accepted(spark).get.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedIds(tableDriven) == acceptedIds(direct),
      "table-driven ingest must equal direct batch ingest")
    assert(!acceptedIds(tableDriven).contains(30000L),
      "the cross-batch exact dup must be rejected either way")

    // crash-replay shape: the consumer lost its cursor update and
    // re-reads from the OLD cursor — the corpus must not change
    val before = acceptedIds(tableDriven)
    val (replay, c3) = GraftTable.appendsSince(spark, tbl, c1)
    tableDriven.ingest(spark, replay)
    assert(acceptedIds(tableDriven) == before,
      "re-consuming a stale cursor must be a corpus no-op")
    assert(c2 == c3 && c2 == GraftTable.snapshot(spark, tbl).version)
  }

  test("state on an object store: existence + dedup work through the FileSystem API") {
    // State lives under a mocks3:// URI — the exact deployment the
    // class exists for. A java.nio existence check would report the
    // remote state absent, silently skip steps 2/3, and re-accept
    // every duplicate; this proves the Hadoop-FS path end to end.
    import spark.implicits._
    Sources.configureCloud(spark, Map(
      "fs.mocks3.impl" -> classOf[MockObjectStoreFs].getName))
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs.filter(col("doc_id") < 120)
    val longest = b1.orderBy(col("n_chars").desc, col("doc_id")).limit(10).collect()
    val nearCopies = longest.zipWithIndex.map { case (r0, i) =>
      (30000L + i, r0.getString(1) + " zz qq trailing marker tokens",
        r0.getString(2), r0.getString(3), r0.getLong(4))
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

    val local = java.nio.file.Files
      .createTempDirectory("graft-inc-cloud").toString
    val inc = new IncrementalCorpus(s"mocks3://bucket$local", numHashes, bands, tau)
    val s1 = inc.ingest(spark, b1)
    assert(s1.acceptedNew > 0)
    // re-ingest over cloud state: cross-batch EXACT dedup must fire
    // (at least every previously-ACCEPTED doc's md5 is in state) and
    // the seen-sig index must reject the rest
    val s2 = inc.ingest(spark, b1)
    assert(s2.acceptedNew == 0 && s2.afterExact <= s2.batchRows - s1.acceptedNew,
      s"re-ingest over mocks3 state must be a no-op, got $s2")
    // near copies of accepted docs: cross-batch NEAR dedup must fire
    val s3 = inc.ingest(spark, nearCopies)
    assert(s3.acceptedNew == 0,
      s"near copies must be rejected against mocks3 state, got $s3")
    assert(inc.accepted(spark).get.count() == s1.acceptedNew)
  }

  test("crash between sigs and accepted publish: recover() completes the batch") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs.filter(col("doc_id") < 120)
    val b2 = docs.filter(col("doc_id") >= 120 && col("doc_id") < 240)

    // control: clean two-batch run
    val ctlDir = java.nio.file.Files
      .createTempDirectory("graft-inc-ctl").toString
    val ctl = new IncrementalCorpus(ctlDir, numHashes, bands, tau)
    ctl.ingest(spark, b1); ctl.ingest(spark, b2)
    val want = ctl.accepted(spark).get
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // crashed run: die in the worst spot — sigs published, accepted not
    val dir = java.nio.file.Files
      .createTempDirectory("graft-inc-crash").toString
    val inc = new IncrementalCorpus(dir, numHashes, bands, tau)
    inc.ingest(spark, b1)
    inc.crashAfterSigsPublish = true
    intercept[IllegalStateException] { inc.ingest(spark, b2) }
    inc.crashAfterSigsPublish = false
    val midCrash = inc.accepted(spark).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(midCrash != want, "crash window must be observable pre-recovery")

    // a stale computation-phase staging dir (no _COMMIT) rides along;
    // recovery must discard it, not publish it
    val junk = new java.io.File(s"$dir/staging/deadbeef/accepted")
    junk.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/staging/deadbeef/accepted/part-junk.parquet"), Array[Byte](1, 2, 3))

    inc.recover(spark)
    val got = inc.accepted(spark).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"recovery must complete the batch losslessly: " +
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(!new java.io.File(s"$dir/staging/deadbeef").exists(),
      "uncommitted staging dirs must be discarded")
    // the invariant the ordering buys: every accepted doc has its sigs
    val sigIds = spark.read.parquet(s"$dir/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sigless = got.filterNot(sigIds.contains)
    // same tokenization as LlmOps.shinglesRaw: split on single space
    val tokenless = docs.filter(size(split(col("text"), " ")) < 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigless.subsetOf(tokenless),
      s"accepted-without-sigs must be impossible (except <3-token docs): ${sigless.take(5)}")
    // and a subsequent ingest over the recovered state is a no-op
    val s4 = inc.ingest(spark, b2)
    assert(s4.acceptedNew == 0, s"post-recovery re-ingest must be a no-op, got $s4")
  }
}
