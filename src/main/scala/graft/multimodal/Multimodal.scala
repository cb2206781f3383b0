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

/** Decoded audio: real container header fields (sample rate, channels,
  * frame count) plus integer-exact amplitude statistics. `rms` is
  * round(sqrt(sumOfSquares / nSamples)) over every 16-bit sample;
  * `feature` is the per-window RMS envelope (the classic cheap audio
  * fingerprint). */
case class DecodedAudio(
    id: Long,
    sampleRate: Int,
    channels: Int,
    nSamples: Int,
    durationMs: Long,
    byteLen: Int,
    rms: Long,
    feature: Array[Float])

/** Decoded video CONTAINER metadata — true header fields recovered by a
  * real box/chunk walk over MP4 (ISO BMFF) or AVI (RIFF) bytes, no codec
  * involved: duration, dimensions, track count, frame count. */
case class DecodedVideo(
    id: Long,
    container: String, // mp4 | avi
    width: Int,
    height: Int,
    nTracks: Int,
    frameCount: Long,
    durationMs: Long,
    byteLen: Int)

/** Decoded image: real codec dimensions + integer-exact whole-image mean
  * luma (BT.601, floor(x+0.5) of the exact rational) + a grid×grid
  * mean-luma feature vector (the classic thumbnail embedding). */
case class DecodedImage(
    id: Long,
    width: Int,
    height: Int,
    byteLen: Int,
    meanLuma: Long,
    feature: Array[Float])

/** One resized image: the re-encoded PNG payload plus the integer mean
  * luma RE-DECODED from it — proof the full decode → sample → encode →
  * decode pipeline ran, not just an in-memory array op. */
case class ResizedImage(
    id: Long,
    width: Int,
    height: Int,
    nBytes: Int,
    meanLuma: Long,
    data: Array[Byte])

/** One PIXEL-decoded video frame: true codec dimensions, integer mean
  * luma and the 64-bit aHash of the frame — the per-frame unit the
  * frame-sample operator emits and video fingerprinting folds over. */
case class DecodedFrame(
    id: Long,
    frameIdx: Int,
    width: Int,
    height: Int,
    meanLuma: Long,
    aHash: Long)

/** SPI for plugging an EXTERNAL video-frame decoder (an ffmpeg/JavaCV
  * binding, a JNI wrapper, …) for codecs the JDK cannot decode (H.264,
  * VP9, …). Implementations need a public no-arg constructor; executors
  * instantiate one per partition from the class name configured at
  * `spark.graft.multimodal.videoDecoderClass`. The engine computes
  * luma/aHash/fingerprints from the returned pixels with the SAME
  * integer arithmetic as the built-in MJPEG path, so downstream dedup
  * keys don't depend on which decoder produced a frame. */
trait VideoFrameDecoder extends Serializable {
  /** Decode every `everyN`-th frame: (frameIdx, width, height, ARGB
    * row-major pixels, length w*h). */
  def decodeFrames(data: Array[Byte], everyN: Int): Iterator[(Int, Int, Int, Array[Int])]
}

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample as typed `mapPartitions` stages (the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch stage: per-partition iterator in, typed
  * rows out, schema carried by Encoders).
  *
  * IMAGE decode is REAL — JDK `javax.imageio` reads PNG/JPEG/BMP/GIF with
  * zero external dependencies: true codec width/height plus a downsampled
  * mean-luma grid feature (see [[decodeImage]]). AUDIO decode is REAL —
  * JDK `javax.sound.sampled` parses WAV/AIFF/AU PCM: true sample rate,
  * channels, frame count, duration and per-window RMS envelope (see
  * [[decodeAudio]]). VIDEO container metadata is REAL — a pure byte-level
  * MP4 box walk / AVI RIFF chunk walk recovers duration, dimensions,
  * track count and frame count with no codec (see [[decodeVideoMeta]]);
  * video frame PIXELS are REAL for MJPEG-in-AVI — each movi chunk is an
  * independent JPEG the JDK's imageio codec decodes (see
  * [[decodeVideoFrames]]: frame-sample, per-frame luma/aHash, majority
  * video fingerprint). Non-MJPEG codecs (H.264 etc., which the JDK
  * cannot decode) route through the config-gated EXTERNAL-DECODER SEAM
  * ([[VideoFrameDecoder]], `spark.graft.multimodal.videoDecoderClass`) —
  * an ffmpeg/JavaCV binding drops in with no bundled dependencies, its
  * pixels folding through the same integer luma/aHash pass so
  * fingerprints stay decoder-independent; with the conf unset those
  * payloads fail loudly naming the key.
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

  // ---- REAL image kernels (JDK javax.imageio, no external deps) --------

  /** Encode a width×height image as PNG bytes; `rgb(x, y)` supplies each
    * pixel's packed 0xRRGGBB. PNG is lossless, so decode returns the
    * exact pixels — the fixture generator for the real-decode path. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode: `javax.imageio` parses the container (PNG, JPEG,
    * BMP, GIF), yielding true codec dimensions; luma statistics are
    * integer-exact sums of BT.601 milli-luma (299·R + 587·G + 114·B per
    * pixel, an integer in [0, 255000]) so the whole-image mean is a
    * deterministic rational — floor(x + 0.5) of it reproduces on any
    * engine. The feature vector is the grid×grid downsampled mean-luma
    * thumbnail (each cell's mean in [0, 255]), the classic cheap visual
    * embedding. Throws on undecodable payloads — callers own quarantine
    * policy. */
  def decodeImage(r: MediaRecord, grid: Int = 4): DecodedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
    require(img != null, s"payload for id ${r.id} is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val (cellSum, cellN, total) = lumaCells(img, grid)
    val meanLuma = meanLumaOf(total, w, h)
    val feature = Array.tabulate(grid * grid)(c =>
      if (cellN(c) == 0) 0.0f
      else (cellSum(c).toDouble / (1000.0 * cellN(c))).toFloat)
    DecodedImage(r.id, w, h, r.data.length, meanLuma, feature)
  }

  /** floor(x + 0.5) rounding of the exact mean luma rational — the ONE
    * copy of the image-family rounding rule (decode, video frames,
    * resize all report through it, so their oracles cannot drift). */
  private[multimodal] def meanLumaOf(total: Long, w: Int, h: Int): Long =
    math.floor(total.toDouble / (1000.0 * w * h) + 0.5).toLong

  /** One shared integer pixel pass: per-cell milli-luma sums over a
    * grid×grid partition plus the whole-image total (BT.601 integer
    * weights). [[decodeImage]], [[perceptualHash]] and the video frame
    * kernel all fold with this order and arithmetic, so their outputs
    * stay bit-identical to the pre-refactor loops. */
  private def lumaCells(img: java.awt.image.BufferedImage, grid: Int)
      : (Array[Long], Array[Long], Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val cellSum = new Array[Long](grid * grid)
    val cellN = new Array[Long](grid * grid)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val milli = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)
        val c = cy * grid + math.min(grid - 1, x * grid / w)
        cellSum(c) += milli
        cellN(c) += 1L
        total += milli
        x += 1
      }
      y += 1
    }
    (cellSum, cellN, total)
  }

  /** aHash bits from a cell pass: bit c set iff cell c's mean milli-luma
    * exceeds the whole-image mean, compared by BigInt cross-products so
    * no image size can overflow and no division is involved. */
  private def hashFromCells(cellSum: Array[Long], cellN: Array[Long],
      total: Long, totalN: Long): Long = {
    var hash = 0L
    var c = 0
    while (c < cellSum.length) {
      if (cellN(c) > 0 &&
        BigInt(cellSum(c)) * totalN > BigInt(total) * cellN(c)) {
        hash |= (1L << c)
      }
      c += 1
    }
    hash
  }

  /** Batch REAL image decode — same typed mapPartitions shape as
    * [[decode]], kernels running per executor partition. */
  def decodeImages(media: Dataset[MediaRecord], grid: Int = 4): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeImage(_, grid)))
  }

  /** Deterministic PNG corpus derived from the documents table — the
    * real-decode fixture: for doc d, a (16 + d%64) × (16 + 7d%48) image
    * of constant gray d%240, so width/height/mean-luma have closed-form
    * oracle values while Spark must recover them through an ACTUAL
    * PNG encode → imageio decode round trip. */
  def imagesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val w = (16 + d % 64).toInt
      val h = (16 + (d * 7) % 48).toInt
      val v = (d % 240).toInt
      val px = (v << 16) | (v << 8) | v
      MediaRecord(d, "image", encodePng(w, h, (_, _) => px), Map.empty)
    }
  }

  /** End-to-end REAL decode over document-derived PNGs (driver-contract
    * query q_multimodal_image). */
  def decodeDocumentImages(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeImages(imagesFromDocuments(spark, docs)).toDF()

  /** 64-bit average-hash (aHash) perceptual fingerprint: the 8×8
    * mean-luma grid thresholded at the whole-image mean — bit
    * c = cy·8+cx set iff cell c's mean milli-luma exceeds the image
    * mean. The threshold compares integer cross-products
    * (cellSum·totalN > totalSum·cellN, in BigInt so no image size can
    * overflow) — never a division — so the hash is bit-deterministic on
    * any platform. The standard near-duplicate key for images: crops,
    * re-encodes and mild filters move few bits, so exact-match groups
    * catch re-encodes and [[graft.dedup.Dedup.fingerprintPairs]] (Hamming
    * ≤ k with pigeonhole chunk blocking) catches the rest at scale. */
  def perceptualHash(r: MediaRecord): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
    require(img != null, s"payload for id ${r.id} is not a decodable image")
    val (cellSum, cellN, total) = lumaCells(img, grid = 8)
    hashFromCells(cellSum, cellN, total, img.getWidth.toLong * img.getHeight)
  }

  /** Batch perceptual hashing: (id, phash) through the same typed
    * mapPartitions seam as [[decodeImages]]. */
  def perceptualHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => (r.id, perceptualHash(r)))).toDF("id", "phash")
  }

  /** Deterministic nearest-neighbor resize: target pixel (tx, ty) copies
    * source pixel (tx·w DIV outW, ty·h DIV outH) — integer floor
    * sampling, identical on any platform (no interpolation arithmetic to
    * drift), re-encoded as PNG with the JDK writer. The thumbnail /
    * normalization step of an image pipeline. */
  def resizeImagePng(data: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW >= 1 && outH >= 1, s"target must be >= 1x1: ${outW}x$outH")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    encodePng(outW, outH, (tx, ty) =>
      img.getRGB((tx.toLong * w / outW).toInt, (ty.toLong * h / outH).toInt)
        & 0xffffff)
  }

  /** Batch resize through the typed mapPartitions seam; the reported
    * mean luma is computed by DECODING the freshly encoded PNG (the same
    * integer pass as [[decodeImage]]) — the value only comes out right if
    * the whole decode → sample → encode → decode chain did. */
  def resizeImages(
      media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val png = resizeImagePng(r.data, outW, outH)
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val (_, _, total) = lumaCells(back, grid = 1)
      val meanLuma = meanLumaOf(total, outW, outH)
      ResizedImage(r.id, outW, outH, png.length, meanLuma, png)
    })
  }

  /** Two-band PNG fixture for the perceptual-hash path: 32×32, left half
    * gray `doc_id % 200`, right half gray `(7·doc_id) % 200`. Each 8×8
    * aHash cell then sits wholly in one band, so the hash has exactly
    * three closed-form values the oracle replays from doc_id arithmetic:
    * left-band bits (0x0F0F…) when v1 > v2, right-band bits (0xF0F0…)
    * when v2 > v1, 0 when the bands tie — while Spark must recover them
    * through a real PNG encode → imageio decode → threshold pipeline. */
  def gradientImagesFromDocuments(
      spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val v1 = (d % 200).toInt
      val v2 = ((7 * d) % 200).toInt
      val png = encodePng(32, 32, (x, _) => {
        val v = if (x < 16) v1 else v2
        (v << 16) | (v << 8) | v
      })
      MediaRecord(d, "image", png, Map.empty)
    }
  }

  // ---- REAL audio kernels (JDK javax.sound.sampled, no external deps) --

  /** Encode interleaved 16-bit PCM samples as a WAV container;
    * `samples.length` must be a multiple of `channels`. Lossless, so
    * decode returns the exact samples — the fixture generator for the
    * real audio-decode path. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat,
      false) // little-endian
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt,
      samples.length.toLong / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode: `javax.sound.sampled` parses the WAV/AIFF/AU
    * container, yielding the true sample rate, channel count and frame
    * count; amplitude statistics are integer-exact sums of squares of the
    * 16-bit samples, so RMS of a fixture signal has a closed form any
    * engine reproduces. `durationMs` = floor(frames · 1000 / rate). The
    * feature vector is the per-window RMS envelope over `windows` equal
    * frame ranges. Only 16-bit PCM payloads are accepted (the only
    * encoding the fixture emits; a real pipeline transcodes first).
    * Throws on undecodable payloads — callers own quarantine policy. */
  def decodeAudio(r: MediaRecord, windows: Int = 8): DecodedAudio = {
    import javax.sound.sampled._
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.data))
    val fmt = in.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16,
      s"payload for id ${r.id} is not 16-bit signed PCM")
    val bytes = in.readAllBytes()
    in.close()
    val channels = fmt.getChannels
    val big = fmt.isBigEndian
    val nSamples = bytes.length / 2
    val frames = nSamples / channels
    val winSumSq = new Array[Long](math.max(1, windows))
    val winN = new Array[Long](math.max(1, windows))
    var totalSq = 0L
    var i = 0
    while (i < nSamples) {
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1) & 0xff
      val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
      val f = i / channels
      val w = if (frames == 0) 0 else math.min(windows - 1, f * windows / frames)
      winSumSq(w) += s.toLong * s
      winN(w) += 1L
      totalSq += s.toLong * s
      i += 1
    }
    val rms =
      if (nSamples == 0) 0L
      else math.round(math.sqrt(totalSq.toDouble / nSamples))
    val feature = Array.tabulate(math.max(1, windows))(w =>
      if (winN(w) == 0) 0.0f
      else math.sqrt(winSumSq(w).toDouble / winN(w)).toFloat)
    val rate = math.round(fmt.getSampleRate)
    val durationMs = if (rate == 0) 0L else frames.toLong * 1000L / rate
    DecodedAudio(r.id, rate, channels, frames, durationMs, r.data.length,
      rms, feature)
  }

  /** Batch REAL audio decode — same typed mapPartitions shape as
    * [[decodeImages]], kernels running per executor partition. */
  def decodeAudios(media: Dataset[MediaRecord], windows: Int = 8): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeAudio(_, windows)))
  }

  /** Deterministic WAV corpus derived from the documents table — the
    * real-decode fixture: for doc d, an 8 kHz mono alternating-sign
    * square wave of amplitude (1 + d%1000) with 800 + 8·(d%100) frames,
    * so sample rate / channels / frame count / duration / RMS all have
    * closed-form oracle values while Spark must recover them through an
    * ACTUAL wav-encode → javax.sound decode round trip. (Alternating sign
    * keeps the mean at zero, so RMS == amplitude only if the decoder
    * recovered the magnitude of every sample.) */
  def audiosFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val frames = (800 + 8 * (d % 100)).toInt
      val amp = (1 + d % 1000).toInt
      val samples = Array.tabulate(frames)(i =>
        (if (i % 2 == 0) amp else -amp).toShort)
      MediaRecord(d, "audio", encodeWav(8000, 1, samples), Map.empty)
    }
  }

  /** End-to-end REAL audio decode over document-derived WAVs
    * (driver-contract query q_multimodal_audio). */
  def decodeDocumentAudios(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAudios(audiosFromDocuments(spark, docs)).toDF()

  /** 64-bit audio envelope fingerprint — the audio twin of
    * [[perceptualHash]]: the signal is split into 64 equal frame
    * windows and bit w is set iff window w's mean squared amplitude
    * exceeds the whole-signal mean squared amplitude, compared via
    * integer cross-products (winSumSq·totalN > totalSq·winN, BigInt —
    * never a division) so the fingerprint is bit-deterministic. Loudness
    * -envelope shape survives re-encoding and level-preserving edits, so
    * exact-match groups catch re-encodes and
    * [[graft.dedup.Dedup.fingerprintPairs]] catches near-variants at
    * scale. 16-bit PCM only, like [[decodeAudio]]. */
  def audioFingerprint(r: MediaRecord): Long = {
    import javax.sound.sampled._
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.data))
    val fmt = in.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16,
      s"payload for id ${r.id} is not 16-bit signed PCM")
    val bytes = in.readAllBytes()
    in.close()
    val channels = fmt.getChannels
    val big = fmt.isBigEndian
    val nSamples = bytes.length / 2
    val frames = nSamples / channels
    val winSumSq = new Array[Long](64)
    val winN = new Array[Long](64)
    var totalSq = 0L
    var i = 0
    while (i < nSamples) {
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1) & 0xff
      val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
      val f = i / channels
      val w = if (frames == 0) 0 else math.min(63, f * 64 / frames)
      winSumSq(w) += s.toLong * s
      winN(w) += 1L
      totalSq += s.toLong * s
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (winN(w) > 0 &&
        BigInt(winSumSq(w)) * nSamples > BigInt(totalSq) * winN(w)) {
        hash |= (1L << w)
      }
      w += 1
    }
    hash
  }

  /** Batch audio fingerprinting: (id, afp) through the typed
    * mapPartitions seam. */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => (r.id, audioFingerprint(r)))).toDF("id", "afp")
  }

  /** Two-phase WAV fixture for the fingerprint path: 8 kHz mono, 128
    * frames, first half amplitude 1 + d%500, second half 1 + (3d)%500
    * (alternating sign, zero mean). Each of the 64 fingerprint windows
    * sits wholly in one phase, so the hash has exactly three closed-form
    * values the oracle replays from doc_id arithmetic: low-32 bits when
    * the first phase is louder, high-32 when the second is, 0 on a tie —
    * while Spark must recover them through a real WAV encode →
    * javax.sound decode → threshold pipeline. */
  def twoPhaseAudiosFromDocuments(
      spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val a1 = (1 + d % 500).toInt
      val a2 = (1 + (3 * d) % 500).toInt
      val samples = Array.tabulate(128) { i =>
        val a = if (i < 64) a1 else a2
        (if (i % 2 == 0) a else -a).toShort
      }
      MediaRecord(d, "audio", encodeWav(8000, 1, samples), Map.empty)
    }
  }

  // ---- REAL video CONTAINER kernels (pure byte parsing, no codecs) ----
  // The JDK ships no video codecs, so frame PIXELS stay out of scope —
  // but container METADATA (duration, dimensions, tracks, frame count)
  // needs none: MP4 is a tree of length-prefixed boxes and AVI a RIFF
  // chunk list, both walkable with plain integer reads. This retires the
  // former video stub on the same zero-dependency argument as the image
  // (imageio) and audio (javax.sound) kernels.

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u32(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  private def u64(d: Array[Byte], o: Int): Long =
    (u32(d, o) << 32) | u32(d, o + 4)
  private def lu32(d: Array[Byte], o: Int): Long =
    (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
      ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)
  private def fourcc(d: Array[Byte], o: Int): String =
    new String(d, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8L + payload.map(_.length.toLong).sum
    be32(len) ++ tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      payload.flatten
  }

  /** Minimal structurally-valid MP4 (ISO BMFF) fixture: ftyp + moov
    * (mvhd with `timescale`/`duration`; a video trak whose tkhd carries
    * 16.16 fixed-point `width`×`height` and whose stbl/stts sums to
    * `frameCount`; optionally a dimensionless second trak) + a stub
    * mdat. Everything the metadata walk recovers is a real header field
    * at its spec offset. */
  def encodeMp4(timescale: Long, duration: Long, width: Int, height: Int,
      frameCount: Long, frameDelta: Long, audioTrack: Boolean): Array[Byte] = {
    val z4 = new Array[Byte](4)
    val matrix = be32(0x10000L) ++ z4 ++ z4 ++ z4 ++ be32(0x10000L) ++ z4 ++
      z4 ++ z4 ++ be32(0x40000000L)
    val mvhd = box("mvhd", z4 /* v0+flags */, z4, z4, be32(timescale),
      be32(duration), be32(0x10000L), Array[Byte](0x01, 0x00),
      new Array[Byte](10), matrix, new Array[Byte](24),
      be32(if (audioTrack) 3L else 2L))
    def tkhd(trackId: Long, w: Int, h: Int) =
      box("tkhd", Array[Byte](0, 0, 0, 7), z4, z4, be32(trackId), z4,
        be32(duration), new Array[Byte](8), new Array[Byte](8), matrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
    val stts = box("stts", z4, be32(1L), be32(frameCount), be32(frameDelta))
    val mdhd = box("mdhd", z4, z4, z4, be32(timescale), be32(duration),
      Array[Byte](0x55, -60 /* 0xc4: und */), Array[Byte](0, 0))
    val videoTrak = box("trak", tkhd(1L, width, height),
      box("mdia", mdhd, box("minf", box("stbl", stts))))
    val traks =
      if (audioTrack) videoTrak ++ box("trak", tkhd(2L, 0, 0))
      else videoTrak
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII), z4,
      "isommp41".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ftyp ++ box("moov", mvhd, traks) ++ box("mdat", new Array[Byte](8))
  }

  /** Minimal AVI (RIFF) fixture: RIFF/AVI header, LIST hdrl holding the
    * 56-byte avih main header (micro-sec/frame, total frames, stream
    * count, dimensions at their spec offsets), empty LIST movi. */
  def encodeAvi(microSecPerFrame: Long, totalFrames: Long, streams: Long,
      width: Int, height: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val avihPayload = le32(microSecPerFrame) ++ le32(0L) ++ le32(0L) ++
      le32(0x10L /* AVIF_HASINDEX */) ++ le32(totalFrames) ++ le32(0L) ++
      le32(streams) ++ le32(0L) ++ le32(width.toLong) ++
      le32(height.toLong) ++ new Array[Byte](16)
    val avih = "avih".getBytes(ascii) ++ le32(avihPayload.length.toLong) ++
      avihPayload
    val hdrl = "LIST".getBytes(ascii) ++ le32(4L + avih.length) ++
      "hdrl".getBytes(ascii) ++ avih
    val movi = "LIST".getBytes(ascii) ++ le32(4L) ++ "movi".getBytes(ascii)
    val body = "AVI ".getBytes(ascii) ++ hdrl ++ movi
    "RIFF".getBytes(ascii) ++ le32(body.length.toLong) ++ body
  }

  private final class TrakAcc {
    var w = 0; var h = 0; var frames = 0L
  }

  // Recursive ISO-BMFF box walk: descends into container boxes, reads
  // mvhd/tkhd (v0 and v1 offsets) and sums stts entries per trak;
  // malformed sizes stop the current level instead of throwing.
  private def walkMp4Boxes(d: Array[Byte], from: Int, to: Int,
      st: scala.collection.mutable.ArrayBuffer[TrakAcc],
      mvhd: Array[Long], trak: TrakAcc): Unit = {
    var p = from
    while (p + 8 <= to) {
      var size = u32(d, p)
      val tpe = fourcc(d, p + 4)
      var hdr = 8
      if (size == 1 && p + 16 <= to) { size = u64(d, p + 8); hdr = 16 }
      else if (size == 0) size = (to - p).toLong
      if (size < hdr || p + size > to) return
      val body = p + hdr
      val bodyEnd = p + size.toInt
      tpe match {
        case "moov" | "mdia" | "minf" | "stbl" =>
          walkMp4Boxes(d, body, bodyEnd, st, mvhd, trak)
        case "trak" =>
          val t = new TrakAcc
          walkMp4Boxes(d, body, bodyEnd, st, mvhd, t)
          st += t
        case "mvhd" if bodyEnd - body >= 24 =>
          if (d(body) == 1) {
            // version-1 layout needs 32 body bytes; a shorter v1 box is
            // truncated — leave mvhd unset (decode fails its require)
            // rather than misreading creation-time bytes via v0 offsets
            if (bodyEnd - body >= 32) {
              mvhd(0) = u32(d, body + 20); mvhd(1) = u64(d, body + 24)
            }
          } else {
            mvhd(0) = u32(d, body + 12); mvhd(1) = u32(d, body + 16)
          }
        case "tkhd" if trak != null =>
          val off = if (d(body) == 1) 96 else 84
          if (bodyEnd - body >= off) {
            trak.w = (u32(d, body + off - 8) >> 16).toInt
            trak.h = (u32(d, body + off - 4) >> 16).toInt
          }
        case "stts" if trak != null && bodyEnd - body >= 8 =>
          val n = u32(d, body + 4).toInt
          var i = 0; var q = body + 8; var tot = 0L
          while (i < n && q + 8 <= bodyEnd) { tot += u32(d, q); q += 8; i += 1 }
          trak.frames = tot
        case _ =>
      }
      p += size.toInt
    }
  }

  // RIFF chunk walk: fourcc+size little-endian, LIST descends past its
  // subtype, chunks pad to even offsets; stops on malformed sizes.
  private def walkRiff(d: Array[Byte], from: Int, to: Int,
      avih: Array[Long]): Unit = {
    var p = from
    while (p + 8 <= to) {
      val tpe = fourcc(d, p)
      val size = lu32(d, p + 4)
      val body = p + 8
      if (size < 0 || body + size > to) return
      if (tpe == "LIST" && size >= 4) walkRiff(d, body + 4, body + size.toInt, avih)
      else if (tpe == "avih" && size >= 40) {
        avih(0) = lu32(d, body)       // dwMicroSecPerFrame
        avih(1) = lu32(d, body + 16)  // dwTotalFrames
        avih(2) = lu32(d, body + 24)  // dwStreams
        avih(3) = lu32(d, body + 32)  // dwWidth
        avih(4) = lu32(d, body + 36)  // dwHeight
      }
      p = body + size.toInt + (size.toInt & 1) // even padding
    }
  }

  /** REAL video container metadata decode: RIFF/AVI payloads go through
    * the avih main header, anything else through the ISO-BMFF box walk
    * (mvhd duration ÷ timescale, video-trak tkhd dimensions, stts frame
    * total). `frameCount`/dimensions come from the first trak with a
    * nonzero width (the video track); durationMs floors. Throws on
    * payloads with neither structure — callers own quarantine policy. */
  def decodeVideoMeta(r: MediaRecord): DecodedVideo = {
    val d = r.data
    // Duration arithmetic over untrusted u32/u64 header fields: a hostile
    // header can overflow num × mul past Long.MaxValue, which would wrap
    // to a silently-negative durationMs — make that a decode failure.
    def durMs(num: Long, mul: Long, den: Long): Long = {
      require(num >= 0,
        s"payload for id ${r.id}: duration field exceeds Long range")
      try Math.multiplyExact(num, mul) / den
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"payload for id ${r.id}: duration overflows (num=$num mul=$mul)")
      }
    }
    if (d.length >= 12 && fourcc(d, 0) == "RIFF" && fourcc(d, 8) == "AVI ") {
      val avih = new Array[Long](5)
      walkRiff(d, 12, d.length, avih)
      require(avih(0) > 0 || avih(1) > 0 || avih(2) > 0,
        s"payload for id ${r.id} has no avih header")
      DecodedVideo(r.id, "avi", avih(3).toInt, avih(4).toInt,
        avih(2).toInt, avih(1), durMs(avih(1), avih(0), 1000L), d.length)
    } else {
      val traks = scala.collection.mutable.ArrayBuffer.empty[TrakAcc]
      val mvhd = new Array[Long](2)
      walkMp4Boxes(d, 0, d.length, traks, mvhd, null)
      require(mvhd(0) > 0, s"payload for id ${r.id} has no mvhd box")
      val video = traks.find(_.w > 0)
      DecodedVideo(r.id, "mp4",
        video.map(_.w).getOrElse(0), video.map(_.h).getOrElse(0),
        traks.length,
        video.map(_.frames).getOrElse(traks.map(_.frames).maxOption.getOrElse(0L)),
        durMs(mvhd(1), 1000L, mvhd(0)), d.length)
    }
  }

  /** Batch video-metadata decode — same typed mapPartitions shape as
    * [[decodeImages]]/[[decodeAudios]]. */
  def decodeVideoMetas(media: Dataset[MediaRecord]): Dataset[DecodedVideo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeVideoMeta))
  }

  /** Deterministic mixed MP4/AVI corpus from the documents table — the
    * real-parse fixture: doc d is MP4 when d is even, AVI when odd, with
    * 50 + d%200 frames at exactly 25 fps (MP4: timescale 90000 / delta
    * 3600; AVI: 40000 µs/frame — both give durationMs = frames·40),
    * (160+16·(d%28)) × (120+8·(d%30)) video dimensions, and a second
    * (dimensionless) track when d%3 == 0. Every decoded column has a
    * closed form the oracle replays from doc_id arithmetic, while Spark
    * must recover them through an actual encode → box/chunk walk. */
  def videosFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val frames = (50 + d % 200).toInt
      val w = (160 + 16 * (d % 28)).toInt
      val h = (120 + 8 * (d % 30)).toInt
      val twoTracks = d % 3 == 0
      val bytes =
        if (d % 2 == 0)
          encodeMp4(90000L, frames.toLong * 3600L, w, h, frames.toLong,
            3600L, audioTrack = twoTracks)
        else
          encodeAvi(40000L, frames.toLong, if (twoTracks) 2L else 1L, w, h)
      MediaRecord(d, "video", bytes, Map.empty)
    }
  }

  /** End-to-end REAL video container decode over document-derived
    * MP4/AVI payloads (driver-contract query q_multimodal_video). */
  def decodeDocumentVideos(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeVideoMetas(videosFromDocuments(spark, docs)).toDF()

  // ---- REAL video FRAME decode (MJPEG-in-AVI, JDK javax.imageio) ------
  //
  // MJPEG is the one video codec the zero-dependency argument reaches:
  // each '00dc' movi chunk is an independently decodable JPEG, and the
  // JDK ships a JPEG codec. The RIFF walk below recovers the frame
  // payloads; ImageIO does the pixel decode; the aHash/luma arithmetic
  // is the shared integer pass images use, so frame fingerprints and
  // image fingerprints live in the same Hamming space.

  private def riffChunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    tpe.getBytes(ascii) ++ le32(payload.length.toLong) ++ payload ++ pad
  }

  private def riffList(subtype: String, payload: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    "LIST".getBytes(ascii) ++ le32(4L + payload.length) ++
      subtype.getBytes(ascii) ++ payload
  }

  /** Encode frames (each an independently decodable image payload — real
    * JPEGs for MJPEG) as an MJPEG AVI: RIFF/AVI with a spec-shaped hdrl
    * (56-byte avih main header, a 'vids'/'MJPG' strh stream header and a
    * BITMAPINFOHEADER strf) and a movi LIST of even-padded '00dc' frame
    * chunks. The fixture generator for the real frame-decode path. */
  def encodeMjpegAvi(microSecPerFrame: Long, width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "an MJPEG AVI needs at least one frame")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val avihPayload = le32(microSecPerFrame) ++ le32(0L) ++ le32(0L) ++
      le32(0x10L /* AVIF_HASINDEX */) ++ le32(frames.length.toLong) ++
      le32(0L) ++ le32(1L /* streams */) ++ le32(0L) ++
      le32(width.toLong) ++ le32(height.toLong) ++ new Array[Byte](16)
    // strh: fccType/fccHandler, flags, prio+lang, initialFrames, then
    // scale/rate (rate/scale = fps), start, length, bufSize, quality,
    // sampleSize, rcFrame
    val strhPayload = "vids".getBytes(ascii) ++ "MJPG".getBytes(ascii) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(microSecPerFrame) ++
      le32(1000000L) ++ le32(0L) ++ le32(frames.length.toLong) ++
      le32(0L) ++ le32(0xffffffffL /* default quality */) ++ le32(0L) ++
      new Array[Byte](8)
    val strfPayload = le32(40L /* biSize */) ++ le32(width.toLong) ++
      le32(height.toLong) ++ Array[Byte](1, 0, 24, 0 /* planes, bpp */) ++
      "MJPG".getBytes(ascii) ++ le32(width.toLong * height * 3L) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val hdrl = riffList("hdrl", riffChunk("avih", avihPayload) ++
      riffList("strl", riffChunk("strh", strhPayload) ++
        riffChunk("strf", strfPayload)))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes(ascii) ++ hdrl ++ movi
    "RIFF".getBytes(ascii) ++ le32(body.length.toLong) ++ body
  }

  /** Real JPEG fixture encoder (ImageIO's JDK codec) — the frame payload
    * builder for [[encodeMjpegAvi]]. Lossy, so oracle-gated columns come
    * from structure (dimensions, counts), not pixel values. */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  // RIFF walk collecting video frame chunks ('NNdc' compressed / 'NNdb'
  // uncompressed, any stream number) in file order; same malformed-size
  // discipline as walkRiff.
  private def walkRiffFrames(d: Array[Byte], from: Int, to: Int,
      out: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Unit = {
    var p = from
    while (p + 8 <= to) {
      val tpe = fourcc(d, p)
      val size = lu32(d, p + 4)
      val body = p + 8
      if (size < 0 || body + size > to) return
      if (tpe == "LIST" && size >= 4) {
        walkRiffFrames(d, body + 4, body + size.toInt, out)
      } else if (size > 0 && tpe.length == 4 &&
          tpe(0).isDigit && tpe(1).isDigit &&
          (tpe.endsWith("dc") || tpe.endsWith("db"))) {
        out += java.util.Arrays.copyOfRange(d, body, body + size.toInt)
      }
      p = body + size.toInt + (size.toInt & 1) // even padding
    }
  }

  /** REAL video frame PIXEL decode: walks the AVI's movi chunks and
    * ImageIO-decodes every `everyN`-th frame (MJPEG frames are plain
    * JPEGs — the one video codec the JDK ships; non-MJPEG codecs still
    * need an external decoder and keep the documented stub). Skipped
    * frames are never decoded — `everyN` is the frame-sample knob, so
    * sampling 1-in-30 pays 1/30th of the codec cost. Per frame: true
    * codec dimensions, integer mean luma, and the same 8×8 aHash the
    * image path emits (shared [[lumaCells]] pass ⇒ same Hamming space).
    * Throws on non-AVI payloads or undecodable frames — callers own
    * quarantine policy. */
  def decodeVideoFrames(r: MediaRecord, everyN: Int = 1,
      external: Option[VideoFrameDecoder] = None): Seq[DecodedFrame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val d = r.data
    val isAvi = d.length >= 12 && fourcc(d, 0) == "RIFF" && fourcc(d, 8) == "AVI "
    if (!isAvi) {
      // non-MJPEG codec: the external-decoder seam, or a clear error
      val dec = external.getOrElse(throw new IllegalArgumentException(
        s"payload for id ${r.id}: built-in frame decode covers MJPEG-in-AVI " +
          "only (the one codec the JDK ships); for H.264/VP9/... set " +
          s"$VideoDecoderClassKey to a ${classOf[VideoFrameDecoder].getName} " +
          "implementation (ffmpeg/JavaCV binding)"))
      return dec.decodeFrames(d, everyN).map { case (idx, w, h, argb) =>
        require(argb.length == w * h,
          s"external decoder returned ${argb.length} pixels for ${w}x$h")
        val (cellSum, cellN, total) = lumaCellsFromArgb(argb, w, h, grid = 8)
        DecodedFrame(r.id, idx, w, h, meanLumaOf(total, w, h),
          hashFromCells(cellSum, cellN, total, w.toLong * h))
      }.toSeq
    }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walkRiffFrames(d, 12, d.length, chunks)
    require(chunks.nonEmpty, s"payload for id ${r.id} has no frame chunks")
    (0 until chunks.length by everyN).map { i =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(chunks(i)))
      require(img != null,
        s"payload for id ${r.id}: frame $i is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val (cellSum, cellN, total) = lumaCells(img, grid = 8)
      val meanLuma = meanLumaOf(total, w, h)
      DecodedFrame(r.id, i, w, h, meanLuma,
        hashFromCells(cellSum, cellN, total, w.toLong * h))
    }
  }

  /** Conf key naming a [[VideoFrameDecoder]] implementation for codecs
    * the JDK cannot decode. Unset (default) = MJPEG-in-AVI only. */
  val VideoDecoderClassKey = "spark.graft.multimodal.videoDecoderClass"

  /** The [[lumaCells]] pixel pass over a raw ARGB array — the external
    * decoder's frames fold with the SAME integer arithmetic as imageio
    * frames, keeping hashes decoder-independent. */
  private def lumaCellsFromArgb(argb: Array[Int], w: Int, h: Int, grid: Int)
      : (Array[Long], Array[Long], Long) = {
    val cellSum = new Array[Long](grid * grid)
    val cellN = new Array[Long](grid * grid)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        val p = argb(y * w + x)
        val milli = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
          114L * (p & 0xff)
        val c = cy * grid + math.min(grid - 1, x * grid / w)
        cellSum(c) += milli
        cellN(c) += 1L
        total += milli
        x += 1
      }
      y += 1
    }
    (cellSum, cellN, total)
  }

  /** Batch frame-sample + decode — the typed mapPartitions stage a
    * frame-level pipeline plugs in after a media scan: one input video
    * row fans out to its sampled frames. Non-MJPEG payloads route through
    * the decoder class configured at [[VideoDecoderClassKey]] (one
    * instance per partition, executor-side Class.forName). */
  def decodeVideoFrameSets(media: Dataset[MediaRecord],
      everyN: Int = 1): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    val decoderClass = media.sparkSession.conf.getOption(VideoDecoderClassKey)
    media.mapPartitions { it =>
      val external = decoderClass.map(c =>
        Class.forName(c).getDeclaredConstructor().newInstance()
          .asInstanceOf[VideoFrameDecoder])
      it.flatMap(decodeVideoFrames(_, everyN, external))
    }
  }

  /** 64-bit video fingerprint: per-bit MAJORITY vote across the sampled
    * frames' aHashes — stable under dropped/inserted frames and mild
    * re-encodes the way a single frame's hash is not. Shuffles only
    * (id, aHash) pairs on id; the per-video fold is a bounded loop over
    * that video's sampled frames. Near-duplicate VIDEOS then go through
    * the same [[graft.dedup.Dedup.fingerprintPairs]] Hamming blocking
    * images and SimHash use. */
  def videoFingerprints(frames: Dataset[DecodedFrame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.id).mapGroups { (id, it) =>
      val hs = it.map(_.aHash).toArray
      var fp = 0L
      var b = 0
      while (b < 64) {
        var c = 0
        var i = 0
        while (i < hs.length) {
          if (((hs(i) >>> b) & 1L) == 1L) c += 1
          i += 1
        }
        if (2 * c > hs.length) fp |= (1L << b)
        b += 1
      }
      (id, fp)
    }.toDF("id", "fingerprint")
  }

  /** Deterministic MJPEG-AVI corpus from the documents table — the
    * frame-decode fixture: doc d carries (2 + d%4) REAL JPEG frames of
    * (16 + 8·(d%10)) × (16 + 8·((3d)%8)), so frame count, indices and
    * dimensions have closed-form oracle values while Spark must recover
    * them through an ACTUAL JPEG encode → AVI container → RIFF walk →
    * imageio pixel decode pipeline. Frames are two-band gray (left
    * 50 + d%150, right shifted +75) with halves aligned to JPEG's 8-px
    * blocks, so each video's aHash band pattern survives quantization —
    * the fingerprint fixtures for the unit tests. */
  def mjpegVideosFromDocuments(
      spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // cpuBound: JPEG encode (here) + decode (downstream mapPartitions)
    // are CPU-bound per row; the ids-only frame is the cheap thing to
    // re-spread before those kernels (guide §2.6)
    graft.ops.Parallel.cpuBoundIfSmall(docs.select(col("doc_id"))).as[Long].map { d =>
      val w = (16 + 8 * (d % 10)).toInt
      val h = (16 + 8 * ((3 * d) % 8)).toInt
      val v1 = (50 + d % 150).toInt
      val v2 = (50 + (d + 75) % 150).toInt
      val jpeg = encodeJpeg(w, h, (x, _) => {
        val v = if (x < w / 2) v1 else v2
        (v << 16) | (v << 8) | v
      })
      val n = (2 + d % 4).toInt
      MediaRecord(d, "video", encodeMjpegAvi(40000L, w, h,
        Seq.fill(n)(jpeg)), Map.empty)
    }
  }

  /** End-to-end REAL frame decode over document-derived MJPEG AVIs
    * (driver-contract query q_multimodal_videoframes): every 2nd frame,
    * so the oracle also gates the frame-SAMPLE arithmetic. */
  def decodeDocumentVideoFrames(spark: SparkSession, docs: DataFrame,
      everyN: Int = 2): DataFrame =
    decodeVideoFrameSets(mjpegVideosFromDocuments(spark, docs), everyN).toDF()
}
