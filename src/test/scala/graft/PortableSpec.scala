package graft

import graft.portable.Portable._
import graft.portable.Portable.Compile
import graft.queries.PortableQueries

/** The portable-IR property the reference stakes its design on
  * (one expression, two backends): the IR-compiled Spark plan must agree
  * with the independently hand-written formulation, and the generated
  * SQL must be well-formed DuckDB (the oracle side of the hash gate
  * proves semantic equality; here we pin the structural bits).
  */
class PortableSpec extends SparkSpec {

  test("IR-compiled ref query ≡ hand-written q02 (same rows, same order)") {
    val ir = Compile.toDataFrame(spark, sf, PortableQueries.refQuery)
    val hand = SparkEntry.queries("q02_ref_query")(spark, sf)
    assert(ir.columns.sameElements(hand.columns))
    assert(ir.collect().toSeq == hand.collect().toSeq)
  }

  test("generated SQL carries the determinism contract") {
    val sql = Compile.toSql(PortableQueries.refQuery)
    assert(sql.contains("DECIMAL(18,4)"), "money sum must be exact-decimal")
    assert(sql.contains("NULLS FIRST"), "ascending sort must pin null order")
    val topk = Compile.toSql(PortableQueries.filterTopK)
    assert(topk.contains("ORDER BY") && topk.contains("LIMIT 50"))
    assert(topk.contains("DESC NULLS LAST"))
  }

  test("IR trees are plain data: reusable and composable") {
    val base = table("orders").where(Bin(">", c("o_totalprice"), LitNum(100000)))
    val a = base.groupBy("o_orderpriority")(CountAll("n"))
    val b = base.limit(5)
    assert(Compile.toDataFrame(spark, sf, a).count() == 5)
    assert(Compile.toDataFrame(spark, sf, b).count() == 5)
  }
}
