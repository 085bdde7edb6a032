package graft

import org.apache.spark.sql.functions._

import graft.operators.{PackedDoc, Packing}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Transparent reference: the same greedy fold, driver-side. */
  private def reference(rows: Seq[(String, Long, Long)],
                        cap: Long): Seq[PackedDoc] =
    rows.groupBy(_._1).toSeq.flatMap { case (sh, ds) =>
      var packId = 0L
      var used = 0L
      ds.sortBy(_._2).map { case (_, id, nt) =>
        if (used > 0L && used + nt > cap) { packId += 1L; used = 0L }
        val pos = used
        used += nt
        PackedDoc(sh, id, nt, packId, pos)
      }
    }

  private val docs = Seq(
    // shard a: 500+600 fit (1100), 1000 would overflow -> pack 1;
    // 3000 oversize -> its own pack 2; 100 -> pack 3
    ("a", 1L, 500L), ("a", 2L, 600L), ("a", 3L, 1000L),
    ("a", 4L, 3000L), ("a", 5L, 100L),
    // shard b: exact-fit boundary — 2048 alone fills pack 0 exactly
    ("b", 1L, 2048L), ("b", 2L, 1L),
    // shard c: single small doc
    ("c", 9L, 7L))

  test("greedy first-fit matches the transparent driver-side fold") {
    val got = Packing
      .greedyFirstFit(docs.toDF("src", "id", "nt"), "src", "id", "nt", 2048L)
      .collect().sortBy(p => (p.shard, p.docId)).toSeq
    val want = reference(docs, 2048L).sortBy(p => (p.shard, p.docId))
    assert(got == want)
    // spot-check the semantics the comment promises
    val byDoc = got.map(p => (p.shard, p.docId) -> p).toMap
    assert(byDoc(("a", 2L)).packId == 0L && byDoc(("a", 2L)).posInPack == 500L)
    assert(byDoc(("a", 3L)).packId == 1L) // would overflow pack 0
    assert(byDoc(("a", 4L)).packId == 2L) // oversize doc isolated
    assert(byDoc(("a", 5L)).packId == 3L) // oversize pack closed
    assert(byDoc(("b", 2L)).packId == 1L) // exact fill closes at cap
  }

  test("pack invariants: cap respected unless singleton; ids dense from 0") {
    val got = Packing
      .greedyFirstFit(docs.toDF("src", "id", "nt"), "src", "id", "nt", 2048L)
      .collect()
    got.groupBy(p => (p.shard, p.packId)).foreach { case ((sh, pid), ds) =>
      assert(ds.map(_.nt).sum <= 2048L || ds.length == 1,
        s"pack ($sh,$pid) overflows with ${ds.length} docs")
    }
    got.groupBy(_.shard).foreach { case (sh, ds) =>
      val ids = ds.map(_.packId).distinct.sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"shard $sh ids not dense")
    }
  }

  test("result is invariant to input partitioning") {
    val df = docs.toDF("src", "id", "nt")
    def run(d: org.apache.spark.sql.DataFrame) = Packing
      .greedyFirstFit(d, "src", "id", "nt", 2048L)
      .collect().sortBy(p => (p.shard, p.docId)).toSeq
    assert(run(df.repartition(7)) == run(df.coalesce(1)))
    assert(run(df.repartition(3, col("nt"))) == run(df.orderBy(desc("id"))))
  }

  test("matches the fold on the real documents table sharded by source") {
    val d = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("nt"))
    val rows = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Packing.greedyFirstFit(d, "source", "doc_id", "nt", 2048L)
      .collect().sortBy(p => (p.shard, p.docId)).toSeq
    assert(got == reference(rows, 2048L).sortBy(p => (p.shard, p.docId)))
    assert(got.nonEmpty)
  }
}
