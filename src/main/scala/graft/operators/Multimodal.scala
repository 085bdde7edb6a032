package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.2 L3): media as opaque `binary`
  * columns with typed metadata structs, processed per-partition in typed
  * Datasets. Container HEADERS are parsed for real — PNG IHDR
  * (CRC32-verified) and canonical PCM WAV, pure JVM — while pixel/
  * sample decode remains stubbed (this container ships no codecs) with
  * a deterministic fake keyed off the bytes. The Spark-side shape is
  * production-real throughout: binary column schema, partition-parallel
  * decode, typed output rows, batch-friendly iteration (decode state
  * initialized once per partition, the same pattern a JNI codec or
  * `mapInPandas`-style batch UDF needs).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  /** width/height from PNG IHDR; sample_rate/channels from WAV fmt;
    * zeros where the modality has no such axis. n_frames: PCM frames
    * for WAV, 1 for stills, stub-derived otherwise.
    */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, sample_rate: Int, channels: Int)

  /** Manufacture a media table from `documents`: UTF-8 bytes as the
    * opaque payload, modality cycled by doc_id. Stands in for reading a
    * real parquet/webdataset of images — the column types are what count.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("media"))

  /** Metadata that is a pure function of the payload bytes, computed
    * with built-in expressions — stays inside whole-stage codegen, no
    * typed-encoder round trip. This is the right path whenever the
    * "decode" is expression-computable (here: the stub's size-derived
    * dimensions); [[decodeMeta]] below is the per-partition harness for
    * REAL codecs that need library state.
    */
  def metaExpr(media: DataFrame): DataFrame = {
    val n = length(col("media")) // byte length for BinaryType
    media.select(
      col("doc_id"), col("media_type"),
      n.cast("int").as("n_bytes"),
      (lit(1) + pmod(n, lit(640))).cast("int").as("width"),
      (lit(1) + pmod(n, lit(480))).cast("int").as("height"),
      (lit(1) + pmod(n, lit(10))).cast("int").as("n_frames"))
  }

  /** Per-partition decode harness. REAL byte formats are parsed — PNG
    * (signature + IHDR, CRC32-verified) and canonical WAV (RIFF/fmt/
    * data) — pure JVM, no codec libs. Payloads that are neither fall
    * back to the deterministic size-derived stub (the fuller pixel/
    * sample decode would slot into the same `decodeOne` body; this
    * container ships no image/audio codecs).
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init point (codec/library handle would go here)
      rows.map(decodeOne)
    }
  }

  private def decodeOne(r: MediaRow): MediaMeta = {
    val n = r.media.length
    parsePng(r.media)
      .map { case (w, h) =>
        MediaMeta(r.doc_id, r.media_type, n, w, h, n_frames = 1,
          sample_rate = 0, channels = 0)
      }
      .orElse(parseWav(r.media).map { case (sr, ch, frames) =>
        MediaMeta(r.doc_id, r.media_type, n, width = 0, height = 0,
          n_frames = frames, sample_rate = sr, channels = ch)
      })
      // unknown container: deterministic size-derived stub dimensions
      .getOrElse(MediaMeta(r.doc_id, r.media_type, n,
        width = 1 + n % 640, height = 1 + n % 480, n_frames = 1 + n % 10,
        sample_rate = 0, channels = 0))
  }

  // ------------------------------------------------- real byte formats

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** PNG signature + IHDR → (width, height); the IHDR CRC32 must check
    * out (a corrupted header falls through to the stub, not to garbage
    * dimensions).
    */
  private[graft] def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 33 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && tag(b, 12) == "IHDR") {
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 17) // chunk type + 13 IHDR data bytes
      if (crc.getValue.toInt == be32(b, 29)) Some((be32(b, 16), be32(b, 20)))
      else None
    } else None

  /** Canonical 44-byte WAV (RIFF/WAVE, PCM fmt, data chunk at offset
    * 36) → (sample_rate, channels, pcm_frames).
    */
  private[graft] def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE" &&
        tag(b, 12) == "fmt " && tag(b, 36) == "data") {
      val channels = le16(b, 22)
      val sampleRate = le32(b, 24)
      val blockAlign = le16(b, 32)
      if (blockAlign > 0) Some((sampleRate, channels, le32(b, 40) / blockAlign))
      else None
    } else None

  /** A minimal VALID PNG header (signature + IHDR with a correct
    * CRC32): 33 bytes, parseable by any PNG reader up to the missing
    * pixel data.
    */
  private[graft] def pngBytes(w: Int, h: Int): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII"))
    crc.update(ihdr)
    java.nio.ByteBuffer.allocate(33)
      .put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdr)
      .putInt(crc.getValue.toInt)
      .array()
  }

  /** A complete canonical 16-bit PCM WAV file (44-byte header + silent
    * sample data) — valid input for any WAV reader.
    */
  private[graft] def wavBytes(sampleRate: Int, channels: Int,
      nFrames: Int): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = nFrames * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.array()
  }

  /** Media table with REAL payloads: image rows carry a valid PNG
    * header (dimensions derived from doc_id), audio rows a complete
    * PCM WAV, video rows the raw text bytes (no cross-engine container
    * is synthesizable pure-JVM). [[decodeMeta]] parses these back —
    * byte-level proof the harness decodes real formats, not echoes.
    */
  def synthesizeMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    fromDocuments(docs).as[MediaRow].map { r =>
      r.media_type match {
        case "image" =>
          r.copy(media = pngBytes(1 + (r.doc_id % 640).toInt, 1 + (r.doc_id % 480).toInt))
        case "audio" =>
          r.copy(media = wavBytes(8000 + (r.doc_id % 8).toInt * 1000,
            1 + (r.doc_id % 2).toInt, 1 + (r.doc_id % 50).toInt))
        case _ => r
      }
    }
  }

  /** STUB resize for `image` rows: a real deployment decodes, scales,
    * re-encodes; the stub deterministically truncates/pads the payload
    * to the target "pixel" budget so schema and partition shape are
    * production-real.
    */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val budget = targetW * targetH
    media.as[MediaRow].map { r =>
      // ??? real codec resize — stub keeps a deterministic byte budget
      val out =
        if (r.media.length >= budget) r.media.take(budget)
        else r.media ++ Array.fill[Byte](budget - r.media.length)(0)
      r.copy(media = out)
    }
  }

  /** STUB frame sampling for `video` rows: n evenly-spaced byte-slice
    * "frames" per payload — the real op would decode container frames;
    * the partitioning/explode shape is the same.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .filter(_.media_type == "video")
      .flatMap { r =>
        val len = math.max(r.media.length, 1)
        (0 until n).map { i =>
          val off = (i.toLong * len / n).toInt
          (r.doc_id, i, r.media.slice(off, math.min(off + 16, len)))
        }
      }
      .toDF("doc_id", "frame_no", "frame_bytes")
  }
}
