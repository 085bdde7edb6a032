package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Exact-substring dedup ([[Dedup.exactSubstrSpans]]): equality with a
  * transparent driver-side reference, planted-duplicate semantics,
  * span merging, and partition invariance.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: same contract, no Spark. */
  private def reference(docs: Seq[(Long, String)], w: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      .filter(_._2.size >= w)
    val occ = for {
      (id, ts) <- toks
      p <- 0 to ts.size - w
    } yield (ts.slice(p, p + w).mkString(" "), id, p)
    val rem = occ.groupBy(_._1).filter(_._2.size > 1).values.flatMap { os =>
      os.sortBy(o => (o._2, o._3)).tail // global first occurrence kept
    }.toSeq
    rem.groupBy(_._2).toSeq.map { case (id, os) =>
      val ivs = os.map(o => (o._3.toLong, o._3.toLong + w)).sortBy(_._1)
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }
      val removed = merged.map { case (s, e) => e - s }.sum
      val nt = toks.find(_._1 == id).get._2.size.toLong
      (id, merged.size.toLong, removed, nt - removed)
    }.sortBy(_._1)
  }

  private def run(docs: Seq[(Long, String)], w: Int, parts: Int = 4)
      : Seq[(Long, Long, Long, Long)] =
    Dedup.exactSubstrSpans(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", w)
      .orderBy("doc_id")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private val words =
    "the quick brown fox jumps over a lazy dog near riverbank stones".split(" ")

  /** Deterministic distinct-ish text of n tokens seeded by `seed`. */
  private def text(seed: Int, n: Int): String =
    (0 until n).map(i => words((i * 7 + seed * 13 + i * i * seed) % words.length) +
      (if ((i + seed) % 5 == 0) s"x${seed}_$i" else "")).mkString(" ")

  test("engine result equals the transparent driver reference on a mixed corpus") {
    val shared = text(99, 12) // a 12-token run shared by three docs
    val docs = Seq(
      1L -> (text(1, 20) + " " + shared + " " + text(2, 15)),
      2L -> (shared + " " + text(3, 25)),
      3L -> text(4, 30),
      4L -> (text(5, 10) + " " + shared),
      5L -> text(6, 4) // shorter than the window: never participates
    )
    assert(run(docs, w = 8) == reference(docs, w = 8))
  }

  test("an exact duplicate doc is removed whole; the first occurrence survives untouched") {
    val body = text(7, 40)
    val docs = Seq(10L -> body, 20L -> body, 30L -> text(8, 40))
    val out = run(docs, w = 8)
    // only the SECOND copy appears, as one span covering every token
    assert(out == Seq((20L, 1L, 40L, 0L)))
  }

  test("overlapping and adjacent marks merge into maximal spans") {
    // one long duplicated run → its w-windows overlap heavily and must
    // collapse to a single span in the non-keeper doc
    val dup = text(11, 16)
    val docs = Seq(
      1L -> (text(12, 6) + " " + dup + " " + text(13, 6)),
      2L -> (text(14, 9) + " " + dup + " " + text(15, 9)))
    val out = run(docs, w = 8)
    assert(out.map(_._1) == Seq(2L))
    val (_, nSpans, removed, kept) = out.head
    assert(nSpans == 1L && removed == 16L && kept == 9L + 9L)
  }

  test("result is invariant under input partitioning") {
    val shared = text(21, 10)
    val docs = (1L to 30L).map(i =>
      i -> (text(i.toInt, 12) + " " + (if (i % 3 == 0) shared else text(i.toInt + 50, 10))))
    assert(run(docs, w = 8, parts = 1) == run(docs, w = 8, parts = 13))
  }
}
