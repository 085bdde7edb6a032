package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical probe of the exact-integer-sum contract's 2⁵³ headroom at
  * ~sf1 group sizes (tagged SlowTest — minutes, excluded from plain
  * `sbt test`). The judged SFs stop at 0.1; these tests replicate
  * sf0.1 rows ×10 (cross join with a 10-row range — group KEYS stay
  * fixed, so per-group n grows 10×, which is the dimension the 2⁵³
  * claims bend under) and then:
  *   1. verify every q53 sum is still exactly representable in a
  *      double (unscaled bit length ≤ 53) and the runtime guard bound
  *      n·max|term| stays under 2⁵³ — the guard is not yet binding at
  *      sf1, matching the comment's ~sf9 estimate;
  *   2. same for q52's Σc²;
  *   3. prove the guard actually TRIPS: inflate the terms (cents →
  *      milli-cents) so n·max|term| crosses 2⁵³ and assert the query
  *      raises the guard's error instead of silently drifting;
  *   4. validate q34's weaker claim (rounded O(1) statistic stable even
  *      though Σx² exceeds 2⁵³) by recomputing the correlation in exact
  *      BigDecimal driver-side and comparing at 4 dp.
  */
class ExactnessSoakSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"
  private val twoTo53 = BigDecimal(BigInt(1) << 53)

  /** sf0.1 lineitem in q53's (group, x, y) shape, replicated ×10. */
  private def li10: DataFrame =
    Tables(spark, sf01, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("bigint").as("x"),
        round(col("l_extendedprice") * 100).cast("decimal(18,0)").as("y"))
      .crossJoin(spark.range(10).select(col("id").as("rep")))

  test("q53 sums remain double-exact at 10x sf0.1 group sizes", SlowTest) {
    val agg = li10.groupBy("l_returnflag").agg(
      count(lit(1)).cast("decimal(19,0)").as("ng"),
      max(abs(col("x") * col("y"))).cast("decimal(19,0)").as("gmax"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      abs(sum(col("y"))).cast("decimal(38,0)").as("sy"),
      abs(sum(col("x") * col("y"))).cast("decimal(38,0)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
    val rows = agg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bound = BigDecimal(r.getDecimal(1)) * BigDecimal(r.getDecimal(2))
      assert(bound < twoTo53,
        s"guard would trip at sf1 for ${r.getString(0)}: bound=$bound")
      Seq("sx", "sy", "sxy", "sxx").zipWithIndex.foreach { case (name, i) =>
        val s = BigDecimal(r.getDecimal(3 + i))
        assert(s < twoTo53, s"$name passed 2^53 for ${r.getString(0)}: $s")
        // exactly representable: double round-trips to the same integer
        assert(BigDecimal(s.toDouble) == s,
          s"$name not double-exact for ${r.getString(0)}")
      }
    }
    info(s"min guard headroom across groups: " +
      rows.map(r => (twoTo53 / (BigDecimal(r.getDecimal(1)) *
        BigDecimal(r.getDecimal(2)))).toInt).min + "x")
  }

  test("q52 sum-of-squares remains double-exact at 10x sf0.1", SlowTest) {
    val e10 = Tables(spark, sf01, "events")
      .filter(col("value").isNotNull)
      .withColumn("c", round(col("value") * 100).cast("decimal(18,0)"))
      .crossJoin(spark.range(10).select(col("id").as("rep")))
    val rows = e10.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(19,0)").as("ng"),
      max(col("c") * col("c")).cast("decimal(19,0)").as("gmax"),
      sum(col("c") * col("c")).cast("decimal(38,0)").as("ssq")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bound = BigDecimal(r.getDecimal(1)) * BigDecimal(r.getDecimal(2))
      assert(bound < twoTo53, s"guard would trip: ${r.getString(0)} $bound")
      val s = BigDecimal(r.getDecimal(3))
      assert(s < twoTo53 && BigDecimal(s.toDouble) == s)
    }
  }

  test("the guard TRIPS when terms cross 2^53 instead of drifting", SlowTest) {
    // cents -> milli-cents: max|x*y| ~5e11, n ~2e6 => bound ~1e18 > 2^53
    val inflated = li10.withColumn("y", col("y") * 1000)
    val guard = Canonical.exactSumGuard("soak_inflated")
    val q = inflated.groupBy("l_returnflag")
      .agg(sum(col("x") * col("y")).cast("double").as("sxy"),
        count(lit(1)).cast("decimal(19,0)").as("ng"),
        max(abs(col("x") * col("y"))).cast("decimal(19,0)").as("gmax"))
      .select(guard(col("sxy")).as("guarded"))
    val e = intercept[Exception](q.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("breaches the 2^53")),
      s"expected the guard's raise_error, got: ${messages(e).mkString(" | ")}")
  }

  test("q34 rounded statistic is stable past 2^53 at 10x sf0.1", SlowTest) {
    val li = li10 // x=quantity, y=cents: mirror q34's shape (names swapped)
    val agg = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("y")).cast("decimal(38,0)").as("sx"),
      sum(col("x")).cast("decimal(38,0)").as("sy"),
      sum(col("y") * col("y")).cast("decimal(38,0)").as("sxx"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("syy"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
    val rows = agg.collect()
    rows.foreach { r =>
      val n = BigDecimal(r.getLong(1))
      val Seq(sx, sy, sxx, syy, sxy) =
        (2 to 6).map(i => BigDecimal(r.getDecimal(i)))
      assert(sxx > twoTo53, "probe should exercise the past-2^53 regime")
      // judged formula: every sum cast to double first
      val viaDouble = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      // exact integer arithmetic until the final sqrt/divide
      val exactNum = n * sxy - sx * sy
      val exactDen = (n * sxx - sx * sx) * (n * syy - sy * sy)
      val viaExact = exactNum.toDouble / math.sqrt(exactDen.toDouble)
      assert(math.abs(viaDouble - viaExact) < 5e-5,
        s"${r.getString(0)}: rounded corr would differ: $viaDouble vs $viaExact")
      assert(BigDecimal(viaDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP) ==
        BigDecimal(viaExact).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }
  }
}
