package graft

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("langId classifies stopword-bearing texts, 'und' for no hits") {
    val df = Seq(
      (1L, "the cat is on the mat and a dog"),
      (2L, "el perro la casa los gatos que de"),
      (3L, "der hund die katze das und ein"),
      (4L, "le chat les chiens et un de"),
      (5L, "xylophone quartz bridge vortex"),
    ).toDF("doc_id", "text")
    val got = TextFns.langId(spark, df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "de")
    assert(got(4L) == "fr")
    assert(got(5L) == "und")
  }

  test("rolling fingerprint: deterministic, order-sensitive, in range") {
    val a = TextFns.rollingFingerprint(Seq("a", "b", "c"))
    assert(a == TextFns.rollingFingerprint(Seq("a", "b", "c")))
    assert(a != TextFns.rollingFingerprint(Seq("c", "b", "a")))
    assert(a >= 0 && a < (1L << 61) - 1)
    assert(TextFns.rollingFingerprint(Nil) == 0L)
  }
}
