package graft.queries

import scala.collection.mutable

/** DRIVER-SIDE EXACT ORACLE for the full BPE merge LIST — the
  * [[AnnOracle]] discipline applied to the tokenizer trainer: the
  * whole program is a deterministic integer/string fold (weighted
  * adjacent-pair counts, argmax by count desc then UTF-8 (a, b),
  * left-to-right non-overlapping merge), so its end-to-end result
  * re-derives as a TRANSPARENT textbook Sennrich loop on the driver —
  * plain maps and full per-round recounts, no inverted index, no
  * heap, no shared code with [[graft.operators.Bpe]] beyond the
  * published `</w>` marker. The expected ranked merges embed as a
  * VALUES relation in the DuckDB oracle, judging the engine's
  * batched incremental DISTRIBUTED trainer against an implementation
  * that shares none of its moving parts.
  *
  * Scale note: a CORRECTNESS oracle, not a production path — it
  * collects the corpus text and recounts every round, O(vocab·rounds)
  * driver work at verify scale.
  */
object BpeOracle {

  /** Unsigned UTF-8 byte order (Spark's string sort order) —
    * re-implemented here so the oracle's tie-break is independently
    * derived.
    */
  private def u8(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Code-point split (Spark `substring` semantics — supplementary
    * characters stay whole), derived independently via the codePoints
    * stream rather than the engine's charCount walk.
    */
  private def cps(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(Character.toString)

  /** The expected ranked merge list over `dir/documents.parquet`'s
    * `text` column (whitespace words, `</w>` end marker), textbook
    * full-recount loop.
    */
  def mergesRows(dir: String, nMerges: Int): Seq[(Long, String, String)] =
    trained(dir, nMerges)._1

  /** Run the textbook loop once: (ranked merges, finished
    * word → pieces map). `docFilter` restricts the TRAINING docs (the
    * OOV row trains on even doc_ids only).
    */
  private def trained(dir: String, nMerges: Int,
      docFilter: Long => Boolean = _ => true)
      : (Seq[(Long, String, String)], Map[String, Vector[String]]) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val wf = mutable.HashMap.empty[String, Long]
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect().foreach { r =>
        if (docFilter(r.getLong(0)))
          r.getString(1).split(" ").foreach { w =>
            if (w.nonEmpty) wf.update(w, wf.getOrElse(w, 0L) + 1L)
          }
      }
    val words = wf.toArray
    val syms: Array[Vector[String]] = words.map { case (w, _) =>
      cps(w) :+ "</w>"
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val f = words(wi)._2
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && {
              val c = u8(e._1._1, best._1._1)
              c < 0 || (c == 0 && u8(e._1._2, best._1._2) < 0)
            })) best = e
        }
        val (a, b) = best._1
        merges += ((a, b))
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          val out = Vector.newBuilder[String]
          var last: String = null
          s.foreach { x =>
            if (last == a && x == b) last = a + b
            else { if (last != null) out += last; last = x }
          }
          if (last != null) out += last
          syms(wi) = out.result()
          wi += 1
        }
      }
    }
    (merges.zipWithIndex.map { case ((a, b), i) =>
      ((i + 1).toLong, a, b)
    }.toSeq,
      words.indices.map(i => words(i)._1 -> syms(i)).toMap)
  }

  /** `text_bpe_encode`'s expected rows: tokenize every doc with
    * `doc_id < maxDocId` using the word → pieces map the textbook loop
    * finished with — (doc_id, wpos, spos, piece), whitespace words
    * (empties skipped but POSITIONS counted, the posexplode contract).
    */
  def encodeRows(dir: String, nMerges: Int, maxDocId: Long)
      : Seq[(Long, Int, Int, String)] = {
    val pieces = trained(dir, nMerges)._2
    val spark = org.apache.spark.sql.SparkSession.active
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("doc_id") < maxDocId)
      .collect()
      .sortBy(_.getLong(0))
      .flatMap { r =>
        val id = r.getLong(0)
        r.getString(1).split(" ", -1).zipWithIndex.flatMap {
          case (w, wpos) =>
            if (w.isEmpty) Seq.empty
            else pieces(w).zipWithIndex.map { case (p, spos) =>
              (id, wpos, spos, p)
            }
        }
      }.toSeq
  }

  /** `text_bpe_encode_oov`'s expected rows: train the textbook loop on
    * EVEN doc_ids only, then tokenize each odd doc with
    * `doc_id < maxDocId` after appending the guaranteed-unseen token
    * `𝄞oov<doc_id>` — a word absent from the pieces map falls back to
    * its code-point characters + `</w>` (the engine's left-join
    * fallback contract; the supplementary-plane clef stays ONE piece).
    */
  def encodeOovRows(dir: String, nMerges: Int, maxDocId: Long)
      : Seq[(Long, Int, Int, String)] = {
    val pieces = trained(dir, nMerges, _ % 2 == 0)._2
    val spark = org.apache.spark.sql.SparkSession.active
    val c = org.apache.spark.sql.functions.col _
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .filter(c("doc_id") % 2 === 1 && c("doc_id") < maxDocId)
      .collect()
      .sortBy(_.getLong(0))
      .flatMap { r =>
        val id = r.getLong(0)
        val text = r.getString(1) + " 𝄞oov" + id
        text.split(" ", -1).zipWithIndex.flatMap { case (w, wpos) =>
          if (w.isEmpty) Seq.empty
          else pieces.getOrElse(w, cps(w) :+ "</w>")
            .zipWithIndex.map { case (p, spos) => (id, wpos, spos, p) }
        }
      }.toSeq
  }

  /** The derived OOV tokenization as the judged DuckDB relation (same
    * shape as [[encodeSql]]).
    */
  def encodeOovSql(dir: String, nMerges: Int, maxDocId: Long): String = {
    val rows = encodeOovRows(dir, nMerges, maxDocId)
    require(rows.nonEmpty, "BPE OOV encode oracle derived zero rows")
    val vs = rows.map { case (id, w, s, p) => s"($id, $w, $s, ${lit(p)})" }
      .mkString(",\n  ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(wpos AS INT) AS wpos,
       |       CAST(spos AS INT) AS spos,
       |       CAST(piece AS VARCHAR) AS piece
       |FROM (VALUES
       |  $vs) AS t(doc_id, wpos, spos, piece)
       |ORDER BY doc_id, wpos, spos""".stripMargin
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The derived tokenization as the judged DuckDB relation
    * `(doc_id BIGINT, wpos INT, spos INT, piece VARCHAR)`.
    */
  def encodeSql(dir: String, nMerges: Int, maxDocId: Long): String = {
    val rows = encodeRows(dir, nMerges, maxDocId)
    require(rows.nonEmpty, "BPE encode oracle derived zero rows")
    val vs = rows.map { case (id, w, s, p) => s"($id, $w, $s, ${lit(p)})" }
      .mkString(",\n  ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(wpos AS INT) AS wpos,
       |       CAST(spos AS INT) AS spos,
       |       CAST(piece AS VARCHAR) AS piece
       |FROM (VALUES
       |  $vs) AS t(doc_id, wpos, spos, piece)
       |ORDER BY doc_id, wpos, spos""".stripMargin
  }

  /** The derived merges as the judged DuckDB relation
    * `(rank BIGINT, a VARCHAR, b VARCHAR)` ordered by rank.
    */
  def mergesSql(dir: String, nMerges: Int): String = {
    val rows = mergesRows(dir, nMerges)
    require(rows.nonEmpty, "BPE oracle derived zero merges")
    val vs = rows.map { case (r, a, b) => s"($r, ${lit(a)}, ${lit(b)})" }
      .mkString(",\n  ")
    s"""SELECT CAST(rank AS BIGINT) AS rank,
       |       CAST(a AS VARCHAR) AS a,
       |       CAST(b AS VARCHAR) AS b
       |FROM (VALUES
       |  $vs) AS t(rank, a, b)
       |ORDER BY rank""".stripMargin
  }
}
