package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** Property tests for the as-of join: the relational (union + window)
  * implementation must agree with a brute-force per-row reference on
  * random inputs — including duplicate timestamps, unmatched keys, and
  * tolerance cutoffs.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val leftGen = Gen.listOfN(80,
    Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 200L)))
  private val rightGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 200L), Gen.choose(0.0, 10.0)))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Brute-force reference: latest right row with rt ≤ lt per key. */
  private def reference(ls: Seq[(Int, Long)], rs: Seq[(Int, Long, Double)],
      tol: Option[Long]): Map[(Int, Long), Option[Long]] =
    ls.map { case (k, t) =>
      val cands = rs.filter(r => r._1 == k && r._2 <= t)
      val best = if (cands.isEmpty) None else Some(cands.map(_._2).max)
      val kept = (best, tol) match {
        case (Some(bt), Some(tl)) if t - bt > tl => None
        case (b, _) => b
      }
      (k, t) -> kept
    }.toMap

  test("as-of ≡ brute force on random inputs (no tolerance and with)") {
    Seq(None, Some(30L)).foreach { tol =>
      (1 to 3).foreach { i =>
        val ls = sample(leftGen, 100L + i).distinct
        val rs = sample(rightGen, 200L + i)
        val l = ls.toDF("k", "t")
        val r = rs.toDF("k", "t", "v")
        val got = AsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("v"), tol)
          .collect()
          .map(row => (row.getInt(0), row.getLong(1)) ->
            (if (row.isNullAt(2)) None else Some(row.getLong(2))))
          .toMap
        val want = reference(ls, rs, tol)
        assert(got.keySet == want.keySet)
        want.foreach { case (key, exp) =>
          assert(got(key) == exp, s"key $key tol $tol: got ${got(key)}, want $exp")
        }
      }
    }
  }

  test("null right payloads: ts and value come from the SAME matched row") {
    // The matched row is decided by TIMESTAMP alone; if its payload is
    // NULL, the output must surface that NULL — not an older row's
    // value. (A per-column last(ignoreNulls) formulation gets this
    // wrong; the single-struct window must not.)
    (1 to 3).foreach { i =>
      val ls = sample(leftGen, 300L + i).distinct
      val rs = sample(rightGen, 400L + i).zipWithIndex.map { case ((k, t, v), j) =>
        (k, t, if (j % 3 == 0) None else Some(v)) // every 3rd payload NULL
      }
      val l = ls.toDF("k", "t")
      val r = rs.toDF("k", "t", "v")
      val got = AsOfJoin.backward(l, r, Seq("k"), "t", "t", Seq("v"))
        .collect()
        .map(row => (row.getInt(0), row.getLong(1)) ->
          ((if (row.isNullAt(2)) None else Some(row.getLong(2))),
            (if (row.isNullAt(3)) None else Some(row.getDouble(3)))))
        .toMap
      ls.foreach { case (k, t) =>
        val cands = rs.filter(x => x._1 == k && x._2 <= t)
        val (gotTs, gotV) = got((k, t))
        if (cands.isEmpty)
          assert(gotTs.isEmpty && gotV.isEmpty,
            s"key ($k,$t): expected no match, got ($gotTs, $gotV)")
        else {
          val bt = cands.map(_._2).max
          assert(gotTs.contains(bt), s"key ($k,$t): matched ts $gotTs, want $bt")
          // ties on ts: among equal (k, ts) right rows the window's
          // last() picks whichever the sort placed last — the payload
          // must be one of the TIED rows' payloads (incl. None), never
          // an older row's value
          val tiedVals = cands.filter(_._2 == bt).map(_._3)
          assert(tiedVals.contains(gotV),
            s"key ($k,$t): payload $gotV not among tied rows' $tiedVals")
        }
      }
    }
  }

  test("as-of join plan: a bounded number of shuffles (no range explosion)") {
    val l = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(cast(ts as timestamp)) as eus")
    val r = Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as eus", "value")
    val df = AsOfJoin.backward(l, r, Seq("user_id"), "eus", "eus", Seq("value"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n$plan")
  }

  test("approx_percentile within tolerance of the exact rank statistic") {
    import org.apache.spark.sql.functions._
    val o = Tables(spark, sf, "orders")
    val approx = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    val n = o.count()
    val exact = o.orderBy("o_totalprice").limit((n / 2).toInt + 1)
      .orderBy(col("o_totalprice").desc).limit(1)
      .collect()(0).getDouble(o.columns.indexOf("o_totalprice"))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx median $approx vs exact $exact")
  }
}
