package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.portable.Portable._
import graft.portable.Portable.Compile

/** Property-based frontend equality for the portable IR: RANDOM trees
  * over the `orders` schema must compile to the same rows through the
  * DataFrame compiler and the Spark-SQL-text compiler. As the IR
  * vocabulary grows, this catches compiler drift the hand-picked
  * declared queries would miss. (The DuckDB side of each declared tree
  * is covered by the driver's hash gate; Spark-SQL ≡ DataFrame here is
  * the in-JVM leg of the same triangle.)
  */
class PortablePropertySpec extends SparkSpec {

  // generators track the column set available at each node so every
  // produced tree is well-formed
  private val baseCols = Seq("o_orderkey", "o_custkey", "o_totalprice")

  private def predGen: Gen[Expr] = Gen.frequency(
    4 -> (for {
      c0 <- Gen.oneOf("o_orderkey", "o_custkey", "o_totalprice")
      op <- Gen.oneOf(">", "<", ">=", "<=")
      v <- Gen.choose(0, 200000)
    } yield Bin(op, c(c0), LitNum(v.toDouble))),
    // the round-3 predicate vocabulary: BETWEEN and IN-list
    1 -> (for {
      c0 <- Gen.oneOf("o_orderkey", "o_custkey")
      lo <- Gen.choose(0, 5000)
      w <- Gen.choose(1, 100000)
    } yield Between(c(c0), LitNum(lo.toDouble), LitNum((lo + w).toDouble))),
    1 -> (for {
      vs <- Gen.listOfN(4, Gen.choose(1, 3000))
    } yield InList(c("o_custkey"), vs.map(v => LitNum(v.toDouble)))),
  )

  // window aliases must be FRESH per IR contract (the DataFrame
  // compiler rejects duplicates) — a projection back to baseCols
  // before each window step guarantees it
  private def stepGen(r: Rel, i: Int): Gen[Rel] = Gen.frequency(
    4 -> predGen.map(p => r.where(p)),
    2 -> Gen.const(r.select(baseCols.map(n => (c(n): Expr) -> n): _*)),
    2 -> Gen.const(r.distinct),
    1 -> Gen.const(r.unionAll(r)),
    1 -> Gen.const(r.select(baseCols.map(n => (c(n): Expr) -> n): _*)
      .window(Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), RowNum, s"rn$i")),
    1 -> Gen.const(r.select(baseCols.map(n => (c(n): Expr) -> n): _*)
      .window(Seq("o_custkey"),
        Seq("o_orderkey" -> true), MovingAvg4("o_totalprice", 3), s"ma$i")),
    1 -> Gen.choose(5, 200).map(n =>
      r.orderBy("o_orderkey" -> true).limit(n)),
  )

  private def treeGen: Gen[Rel] = {
    val base: Rel = table("orders")
      .select(baseCols.map(n => (c(n): Expr) -> n): _*)
    def grow(r: Rel, depth: Int): Gen[Rel] =
      if (depth == 0) Gen.const(r)
      else stepGen(r, depth).flatMap(grow(_, depth - 1))
    Gen.choose(1, 4).flatMap(d => grow(base, d))
  }

  test("random IR trees: DataFrame frontend ≡ Spark-SQL-text frontend") {
    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    val trees = (1 to 25).flatMap(i =>
      treeGen.apply(Gen.Parameters.default, Seed(1000L + i)))
    assert(trees.size >= 20, "generator should produce most samples")
    trees.foreach { rel =>
      // total order so row-level comparison is well-defined regardless
      // of what the tree ended with
      val ordered = rel match {
        case Limit(_, _) | Sort(_, _) => rel
        case _ =>
          // rn column only exists if a window step fired; order by the
          // always-present keys (unique per row pre-union; post-union
          // compare as multisets via sorted seq)
          rel.orderBy("o_orderkey" -> true, "o_custkey" -> true,
            "o_totalprice" -> false)
      }
      val viaDf = Compile.toDataFrame(spark, sf, ordered)
      val viaSql = spark.sql(Compile.toSparkSql(ordered))
      assert(viaDf.columns.sameElements(viaSql.columns),
        s"columns diverged for tree: $ordered")
      val a = viaDf.collect().map(_.toString).sorted.toSeq
      val b = viaSql.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"frontends diverged for tree: $ordered")
    }
  }
}
