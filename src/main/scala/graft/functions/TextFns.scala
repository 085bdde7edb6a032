package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline surface (SURVEY §2.2 L3):
  * language ID (stopword-lexicon heuristic), quality metrics, token
  * counting, fingerprinting. All relational (explode/join/window), so the
  * same plans scale to 100 TB — no driver-side loops, no Python boundary.
  */
object TextFns {

  /** English stopwords used by the quality scorer. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  val stopwordsSqlList: String = stopwords.map(w => s"'$w'").mkString(", ")

  /** Tiny per-language function-word lexicon for the langId heuristic.
    * Deliberately overlapping (e.g. 'de' is both German article-ish and
    * Spanish/French preposition) — scoring is hit-count argmax with a
    * deterministic lexicographic tiebreak.
    */
  val lexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "is" -> "en", "and" -> "en", "of" -> "en",
    "el" -> "es", "la" -> "es", "los" -> "es", "que" -> "es", "de" -> "es",
    "le" -> "fr", "les" -> "fr", "et" -> "fr", "de" -> "fr", "un" -> "fr",
    "der" -> "de", "die" -> "de", "das" -> "de", "und" -> "de", "ein" -> "de",
    "的" -> "zh", "是" -> "zh", "了" -> "zh",
  )

  /** Language-ID over a `documents`-shaped frame (doc_id, text):
    * tokenize → join the lexicon → count hits per (doc, lang) → argmax
    * with (hits DESC, lang ASC) tiebreak; docs with zero lexicon hits
    * classify as 'und'. One shuffle for the agg, one broadcast join for
    * the lexicon — scales linearly in corpus size.
    */
  def langId(spark: SparkSession, d: DataFrame): DataFrame = {
    import spark.implicits._
    val lex = broadcast(lexicon.toDF("tok", "lex_lang"))
    val hits = d
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .join(lex, "tok")
      .groupBy("doc_id", "lex_lang")
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("doc_id").orderBy(col("hits").desc, col("lex_lang"))
    val best = hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lex_lang").as("guess"))
    // shuffle_hash: best is per-doc (corpus-scale) but descends from an
    // explode, whose size estimate shrinks with projected width while
    // rows multiply — never let it become a broadcast build side
    d.select("doc_id").join(best.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("guess"), lit("und")).as("guess"))
  }

  /** DuckDB-oracle spelling of [[langId]] over the `documents` view. */
  val langIdOracleSql: String = {
    val lexValues = lexicon.map { case (t, l) => s"('$t', '$l')" }.mkString(", ")
    s"""WITH lex(tok, lex_lang) AS (VALUES $lexValues),
        toks AS (
          SELECT doc_id, unnest(string_split(LOWER(text), ' ')) AS tok
          FROM documents),
        hits AS (
          SELECT doc_id, lex_lang, COUNT(*) AS hits
          FROM toks JOIN lex USING (tok)
          GROUP BY doc_id, lex_lang),
        best AS (
          SELECT doc_id, lex_lang AS guess,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, lex_lang) AS rn
          FROM hits)
        SELECT d.doc_id, COALESCE(b.guess, 'und') AS guess
        FROM documents d LEFT JOIN (SELECT doc_id, guess FROM best WHERE rn = 1) b
          ON d.doc_id = b.doc_id
        ORDER BY d.doc_id"""
  }

  /** Karp-Rabin rolling-hash fingerprint of a token sequence (base-B
    * polynomial over token hashes, mod 2^61-1). Engine-side only — no
    * DuckDB analogue — exercised by ScalaTest with a hand-computed oracle.
    */
  def rollingFingerprint(tokens: Seq[String]): Long = {
    val Mod = (1L << 61) - 1
    val B = 1000003L
    var h = 0L
    tokens.foreach { t =>
      // token → bounded positive value; multiply stays within 2^63 via
      // 128-bit-free schoolbook: (h*B) mod M with h,B < 2^61 needs care,
      // so reduce via Math.multiplyHigh-free split.
      val tv = java.lang.Long.remainderUnsigned(
        scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL, Mod)
      h = mulMod(h, B, Mod)
      h = (h + tv) % Mod
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long = {
    // (a*b) mod m for m < 2^62 using Math.multiplyHigh (JDK 9+).
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // 128-bit remainder via BigInteger-free double-word reduction is
    // overkill here; fall back to BigInt only when overflow happened.
    if (hi == 0 && lo >= 0) lo % m
    else ((BigInt(a) * BigInt(b)) mod BigInt(m)).toLong
  }
}
