package graft

import graft.operators.Multimodal

/** Real pixel/sample decode (the round-4 depth item): synthesized PNGs
  * decode through `javax.imageio` to EXACTLY the pattern pixels the
  * encoder wrote (checksum re-derived here without touching either the
  * encoder or ImageIO), resize resamples those pixels deterministically,
  * and WAV PCM samples round-trip bit-exactly. Everything is
  * exact-integer, so results must be identical on any partitioning.
  */
class MultimodalPixelSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents").limit(90)
  private lazy val media = Multimodal.synthesizeMedia(spark, docs).toDF()

  /** Expected (crc, rgb_sum) for a w×h pattern image, derived straight
    * from the pattern definition — no PNG, no ImageIO.
    */
  private def expectedStats(w: Int, h: Int, seed: Int): (Long, Long) = {
    val crc = new java.util.zip.CRC32
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Multimodal.patternRgb(x, y, seed)
      crc.update(r); crc.update(g); crc.update(b)
      sum += r + g + b
    }
    (crc.getValue, sum)
  }

  test("PNG pixels decode to exactly the encoded pattern (ImageIO round-trip)") {
    val stats = Multimodal.decodePixels(spark, media).collect()
    val images = stats.filter(_.channels >= 3)
    assert(images.nonEmpty, "no image rows decoded")
    images.foreach { s =>
      assert(s.width == 1 + (s.doc_id % 64).toInt, s"doc ${s.doc_id}")
      assert(s.height == 1 + (s.doc_id % 48).toInt)
      val (crc, sum) =
        expectedStats(s.width, s.height, (s.doc_id % 251).toInt)
      assert(s.pixel_crc == crc, s"pixel bytes drifted for doc ${s.doc_id}")
      assert(s.rgb_sum == sum)
    }
    // partition-invariance: exact-integer stats cannot depend on layout
    val again = Multimodal.decodePixels(spark, media.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(again.sameElements(stats.sortBy(_.doc_id)))
  }

  test("resize really decodes, resamples, and re-encodes image payloads") {
    val resized = Multimodal.resize(spark, media, 8, 8).toDF()
    val stats = Multimodal.decodePixels(spark, resized).collect()
    val images = stats.filter(_.channels >= 3)
    assert(images.nonEmpty)
    images.foreach { s =>
      assert(s.width == 8 && s.height == 8, s"doc ${s.doc_id} not resized")
      // nearest-neighbor of the pattern, re-derived independently
      val (sw, sh) = (1 + (s.doc_id % 64).toInt, 1 + (s.doc_id % 48).toInt)
      val crc = new java.util.zip.CRC32
      var sum = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val (r, g, b) = Multimodal.patternRgb(
          (x.toLong * sw / 8).toInt, (y.toLong * sh / 8).toInt,
          (s.doc_id % 251).toInt)
        crc.update(r); crc.update(g); crc.update(b)
        sum += r + g + b
      }
      assert(s.pixel_crc == crc.getValue,
        s"resampled pixels drifted for doc ${s.doc_id}")
      assert(s.rgb_sum == sum)
    }
  }

  test("JPEG: SOF dims parse from bytes; pixels decode within quantization tolerance") {
    import spark.implicits._
    // real JFIF fixtures from the JDK's own encoder, varied dims/seed
    val rows = (1L to 30L).map { id =>
      Multimodal.MediaRow(id, "image",
        Multimodal.jpegBytes(8 + (id % 24).toInt, 6 + (id % 18).toInt,
          (id % 97).toInt))
    }
    // byte-level SOF walk finds the true dimensions
    rows.foreach { r =>
      val dims = Multimodal.parseJpeg(r.media)
      assert(dims.contains((8 + (r.doc_id % 24).toInt, 6 + (r.doc_id % 18).toInt)),
        s"doc ${r.doc_id}: SOF parse got $dims")
    }
    // decodeMeta surfaces those dims through the partition harness
    val jpegMedia = spark.createDataset(rows).toDF()
    val meta = Multimodal.decodeMeta(spark, jpegMedia).collect()
    meta.foreach { m =>
      assert(m.width == 8 + (m.doc_id % 24).toInt &&
        m.height == 6 + (m.doc_id % 18).toInt && m.n_frames == 1,
        s"doc ${m.doc_id}: $m")
    }
    // full ImageIO decode: exact dims, pixel values within JPEG
    // quantization error of the encoded pattern (lossy — unlike PNG)
    val stats = Multimodal.decodePixels(spark, jpegMedia).collect()
    assert(stats.length == rows.length, "every JPEG row must decode")
    stats.foreach { s =>
      assert(s.width == 8 + (s.doc_id % 24).toInt &&
        s.height == 6 + (s.doc_id % 18).toInt)
      var patternSum = 0L
      for (y <- 0 until s.height; x <- 0 until s.width) {
        val (r, g, b) = Multimodal.patternRgb(x, y, (s.doc_id % 97).toInt)
        patternSum += r + g + b
      }
      val meanErr = math.abs(s.rgb_sum - patternSum).toDouble /
        (s.width * s.height * 3)
      assert(meanErr < 24.0,
        s"doc ${s.doc_id}: mean per-component error $meanErr too large " +
          s"(got ${s.rgb_sum}, pattern $patternSum)")
    }
    // a corrupted SOF falls to the stub, never to garbage dimensions
    val broken = rows.head.media.clone()
    val sofAt = broken.indices.find(i => (broken(i) & 0xff) == 0xff &&
      (broken(i + 1) & 0xff) == 0xc0).get
    broken(sofAt + 1) = 0xda.toByte // SOF0 → SOS: stream "has no frame"
    assert(Multimodal.parseJpeg(broken).isEmpty)
  }

  test("WAV PCM samples round-trip bit-exactly with nontrivial content") {
    val stats = Multimodal.decodeWavSamples(spark, media).collect()
    assert(stats.nonEmpty, "no audio rows decoded")
    stats.foreach { s =>
      assert(s.sample_rate == 8000 + (s.doc_id % 8).toInt * 1000)
      assert(s.n_frames == 1 + (s.doc_id % 50).toInt)
      val crc = new java.util.zip.CRC32
      var sumAbs = 0L
      var peak = 0
      for (i <- 0 until s.n_frames * s.channels) {
        val v = Multimodal.toneSample(i, s.sample_rate)
        crc.update(v & 0xff); crc.update((v >> 8) & 0xff)
        sumAbs += math.abs(v)
        peak = math.max(peak, math.abs(v))
      }
      assert(s.sample_crc == crc.getValue, s"doc ${s.doc_id} samples drifted")
      assert(s.abs_sum == sumAbs && s.peak == peak)
      assert(s.abs_sum > 0, "tone should be non-silent")
    }
  }
}
