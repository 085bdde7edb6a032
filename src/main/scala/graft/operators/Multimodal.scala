package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.2 L3): media as opaque `binary`
  * columns with typed metadata structs, processed per-partition in typed
  * Datasets. The decode step is STUBBED — this container ships no image/
  * audio codecs — with a deterministic fake keyed off the bytes, but the
  * Spark-side shape is real: binary column schema, partition-parallel
  * decode, typed output rows, batch-friendly iteration (decode state
  * initialized once per partition, the same pattern a JNI codec or
  * `mapInPandas`-style batch UDF needs).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

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

  /** STUB decode: deterministic pseudo-metadata from the payload size.
    * A real deployment replaces the body of `decodeOne` with a codec
    * call; everything around it (schema, partitioning, typed encoders)
    * is production-shaped.
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
    // ??? real codec — stub derives deterministic fake dimensions
    MediaMeta(r.doc_id, r.media_type, n,
      width = 1 + n % 640, height = 1 + n % 480, n_frames = 1 + n % 10)
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
