package graft

import graft.operators.Multimodal

/** Third modality, end to end: synthesized RIFF AVI containers parse
  * back through the header path (`decodeMeta`), and `sampleAviFrames`
  * REALLY decodes evenly-spaced DIB frames — per-frame CRC/sum
  * re-derived here straight from the pattern definition, touching
  * neither the encoder nor the parser. All exact-integer ⇒ partition-
  * invariant.
  */
class MultimodalVideoSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents").limit(90)
  private lazy val media = Multimodal.synthesizeMedia(spark, docs).toDF()

  private def dims(docId: Long): (Int, Int, Int) =
    (3 + (docId % 10).toInt, 2 + (docId % 7).toInt, 1 + (docId % 6).toInt)

  /** Expected (crc, sum) of frame f for doc docId — from the pattern
    * alone (row-major RGB traversal, the order sampleAviFrames emits).
    */
  private def expectedFrame(docId: Long, f: Int): (Long, Long) = {
    val (w, h, _) = dims(docId)
    val seed = (docId % 251).toInt + 17 * f
    val crc = new java.util.zip.CRC32
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Multimodal.patternRgb(x, y, seed)
      crc.update(r); crc.update(g); crc.update(b)
      sum += r + g + b
    }
    (crc.getValue, sum)
  }

  test("AVI headers parse back through decodeMeta") {
    val meta = Multimodal.decodeMeta(spark, media)
      .collect().filter(_.media_type == "video")
    assert(meta.nonEmpty, "no video rows")
    meta.foreach { m =>
      val (w, h, f) = dims(m.doc_id)
      assert(m.width == w && m.height == h && m.n_frames == f,
        s"doc ${m.doc_id}: got (${m.width},${m.height},${m.n_frames}), want ($w,$h,$f)")
      assert(m.sample_rate == 0 && m.channels == 0)
    }
    // corrupt container must fall through to None, not garbage dims
    val avi = Multimodal.aviBytes(6, 4, 3, 9)
    assert(Multimodal.parseAvi(avi).contains((6, 4, 3, 40000)))
    val bad = avi.clone(); bad(8) = 'X'.toByte // break the 'AVI ' fourcc
    assert(Multimodal.parseAvi(bad).isEmpty)
    // negative declared chunk size must TERMINATE (not spin the task)
    val neg = avi.clone()
    neg(16) = 0xff.toByte; neg(17) = 0xff.toByte
    neg(18) = 0xff.toByte; neg(19) = 0xff.toByte // hdrl LIST size = -1
    assert(Multimodal.parseAvi(neg).isEmpty)
  }

  test("truncated frames are dropped, never decoded out of bounds") {
    import spark.implicits._
    val whole = Multimodal.aviBytes(6, 4, 3, 9)
    val cut = whole.dropRight(10) // last frame physically short
    val rows = Seq(Multimodal.MediaRow(1L, "video", cut)).toDS().toDF()
    val stats = Multimodal.sampleAviFrames(spark, rows, n = 3).collect()
    // frames 0 and 1 decode; the truncated frame 2 is skipped, no crash
    assert(stats.map(_.src_frame).toSet.subsetOf(Set(0, 1, 2)))
    assert(!stats.exists(_.src_frame == 2), "short frame must be dropped")
    assert(stats.nonEmpty)
  }

  test("sampleAviFrames decodes exactly the encoded pattern frames") {
    val stats = Multimodal.sampleAviFrames(spark, media, n = 2).collect()
    assert(stats.nonEmpty, "no frames sampled")
    val perDoc = stats.groupBy(_.doc_id)
    perDoc.foreach { case (docId, fs) =>
      assert(fs.length == 2, s"doc $docId: ${fs.length} frames, want 2")
      val (_, _, total) = dims(docId)
      fs.foreach { s =>
        assert(s.src_frame == (s.frame_no.toLong * total / 2).toInt,
          s"doc $docId frame ${s.frame_no}: spacing rule broken")
        val (crc, sum) = expectedFrame(docId, s.src_frame)
        assert(s.frame_crc == crc, s"doc $docId frame ${s.src_frame}: pixel drift")
        assert(s.rgb_sum == sum)
      }
    }
    // partition-invariance of the exact-integer stats
    val again = Multimodal.sampleAviFrames(spark, media.repartition(7), n = 2)
      .collect().sortBy(s => (s.doc_id, s.frame_no))
    assert(again.sameElements(stats.sortBy(s => (s.doc_id, s.frame_no))))
  }
}
