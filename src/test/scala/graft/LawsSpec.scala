package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.Canonical.dec

/** Algebraic laws on random frames (SURVEY §5.3.3): properties that must
  * hold for ANY partitioning/ordering Spark chooses — the local stand-in
  * for "does this operator survive a 1000-executor shuffle". Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-plus bridge
  * isn't on the offline classpath).
  */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Double)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(-100.0, 100.0)))

  private def samples(n: Int): Seq[List[(Int, Double)]] =
    (1 to n).map(i => rowsGen.apply(Gen.Parameters.default, Seed(42L + i)).get)

  test("filter fusion: filter(p).filter(q) ≡ filter(p && q)") {
    samples(6).foreach { rows =>
      val df = rows.toDF("k", "v")
      val twice = df.filter($"v" > 0).filter($"k" % 2 === 0).count()
      val fused = df.filter($"v" > 0 && $"k" % 2 === 0).count()
      assert(twice == fused)
    }
  }

  test("union-all count additivity") {
    val ss = samples(6)
    ss.zip(ss.reverse).foreach { case (a, b) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      assert(da.unionAll(db).count() == da.count() + db.count())
    }
  }

  test("groupBy decimal-sum is partition-invariant (exact aggregation)") {
    samples(4).foreach { rows =>
      val df = rows.toDF("k", "v")
      def sums(parts: Int) =
        df.repartition(parts).groupBy("k")
          .agg(sum(dec(round($"v", 2))).cast("double").as("s"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(sums(1) == sums(7))
    }
  }

  test("export/re-read round-trip identity (O5/O1 inverse)") {
    samples(2).foreach { rows =>
      val df = rows.toDF("k", "v")
      val path = java.nio.file.Files.createTempDirectory("law_rt").toString + "/f.parquet"
      graft.pipeline.Sinks.exportSingleParquet(df, path)
      val back = Tables.read(spark, path)
      assert(back.count() == df.count())
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    }
  }
}
