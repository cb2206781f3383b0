package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata. */
case class MediaRecord(
    id: Long,
    modality: String, // image | audio | video
    data: Array[Byte],
    meta: Map[String, String])

/** Decoded media features. */
case class DecodedMedia(
    id: Long,
    modality: String,
    width: Int,
    height: Int,
    nFrames: Int,
    byteLen: Int,
    feature: Array[Float])

/** One sampled frame (byte window) of a media payload. */
case class MediaFrame(id: Long, frameIdx: Int, offset: Int, frame: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample as typed `mapPartitions` stages (the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch stage: per-partition iterator in, typed
  * rows out, schema carried by Encoders).
  *
  * The decode kernels are STUBS — this container has no image/audio
  * libraries, so decoding is a clearly-marked deterministic fake derived
  * from payload length/bytes. Everything around them (schemas, Dataset
  * plumbing, partition-iterator batch shape, frame explode) is real and
  * is what a real libjpeg/ffmpeg kernel would drop into.
  */
object Multimodal {

  /** Derive a deterministic media table from the documents table: payload
    * = UTF-8 bytes of the text, modality = doc_id mod 3. Stands in for a
    * real (id, bytes) media corpus. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("data"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** STUB image/audio/video decode — deterministic fake: dimensions and
    * frame counts are arithmetic on the payload length. A real
    * implementation replaces only the body of this function. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val len = r.data.length
    val (w, h, frames) = r.modality match {
      case "image" => (16 + len % 640, 16 + (len * 7) % 480, 1)
      case "audio" => (0, 0, 1 + len % 16) // "frames" = audio chunks
      case _ => (16 + len % 320, 16 + (len * 3) % 240, 1 + len % 32)
    }
    DecodedMedia(r.id, r.modality, w, h, frames, len, featureStub(r.data))
  }

  /** STUB feature extractor: 8-dim deterministic float vector from a
    * rolling byte hash (stands in for a CNN/CLIP embedding). */
  def featureStub(data: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      acc(i % 8) = acc(i % 8) * 31 + b
      i += 1
    }
    acc.map(v => ((v % 1000L).toFloat) / 1000.0f)
  }

  /** Batch decode: typed mapPartitions — one iterator per partition, the
    * shape a vectorized (Arrow/Pandas-style) kernel needs. */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling: every `stride` bytes emit a `frameLen`-byte window;
    * real video decode would emit actual frames at a timestamp stride. */
  def sampleFrames(
      media: Dataset[MediaRecord],
      stride: Int,
      frameLen: Int,
      maxFrames: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.min(maxFrames, math.max(1, r.data.length / math.max(1, stride)))
      (0 until n).iterator.map { f =>
        val off = f * stride
        val end = math.min(r.data.length, off + frameLen)
        MediaFrame(r.id, f, off,
          if (off >= r.data.length) Array.empty[Byte] else r.data.slice(off, end))
      }
    }
  }

  /** End-to-end decode over documents, returned as a DataFrame (used by
    * the driver-contract query; SQL-oracle-expressible because the stub
    * is arithmetic on octet_length(text)). */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decode(mediaFromDocuments(docs).as[MediaRecord]).toDF()
  }
}
