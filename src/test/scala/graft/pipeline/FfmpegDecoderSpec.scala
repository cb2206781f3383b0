package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FfmpegVideoFrameDecoder, MediaRecord, Multimodal}

/** Environment-gated proof of the external-decoder seam with a REAL
  * binding: when `ffmpeg`/`ffprobe` are on PATH, synthesize a tiny
  * H.264 MP4 (a codec the JDK cannot decode) and an MJPEG AVI, decode
  * the MP4 through [[FfmpegVideoFrameDecoder]], and assert aHash PARITY
  * between the built-in MJPEG path and the ffmpeg path over the same
  * AVI — the "fingerprints are decoder-independent" claim. Without the
  * binaries the suite CANCELS (assume), so CI stays green in
  * zero-dependency containers. */
class FfmpegDecoderSpec extends AnyFunSuite {

  private def haveTool(cmd: Seq[String]): Boolean =
    try {
      import scala.sys.process._
      cmd.!(ProcessLogger(_ => ())) == 0
    } catch { case _: Exception => false }

  // Opportunistic gate: `GRAFT_FFMPEG_DIR` (a dir with executable
  // static ffmpeg+ffprobe, e.g. dropped into the sandbox by the test
  // driver) takes precedence over PATH — the same resolution the
  // decoder itself uses, so the parity test runs whenever ANY way of
  // supplying the binaries is available. See TESTDATA.md.
  private val (ffmpegCmd, ffprobeCmd) =
    graft.multimodal.FfmpegVideoFrameDecoder.resolvedFromEnv

  private lazy val haveFfmpeg =
    haveTool(Seq(ffmpegCmd, "-version")) && haveTool(Seq(ffprobeCmd, "-version"))

  /** ffmpeg-synthesized clip bytes: `vcodec` over the testsrc pattern. */
  private def synth(vcodec: String, container: String, frames: Int): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempFile("graft-ffm", "." + container)
    import scala.sys.process._
    val pixFmt = if (vcodec == "libx264") "yuv420p" else "yuvj420p"
    val cmd = Seq(ffmpegCmd, "-y", "-v", "error",
      "-f", "lavfi", "-i", s"testsrc=size=64x48:rate=10:duration=${frames / 10.0}",
      "-vcodec", vcodec, "-pix_fmt", pixFmt, tmp.toString)
    assert(cmd.! == 0, s"ffmpeg synth failed: $cmd")
    val bytes = java.nio.file.Files.readAllBytes(tmp)
    java.nio.file.Files.delete(tmp)
    bytes
  }

  test("H.264 MP4 decodes through the ffmpeg binding (frames, dims, sampling)") {
    assume(haveFfmpeg, "ffmpeg/ffprobe not on PATH")
    val mp4 = synth("libx264", "mp4", frames = 10)
    val dec = new FfmpegVideoFrameDecoder
    val all = dec.decodeFrames(mp4, everyN = 1).toSeq
    assert(all.size == 10, s"expected 10 frames, got ${all.size}")
    assert(all.forall { case (_, w, h, px) => w == 64 && h == 48 && px.length == 64 * 48 })
    val sampled = dec.decodeFrames(mp4, everyN = 3).toSeq
    assert(sampled.size == 4, s"1-in-3 of 10 frames -> 4, got ${sampled.size}")
    assert(sampled.map(_._1) == Seq(0, 3, 6, 9))
    // and the seam end-to-end: decodeVideoFrames folds the frames through
    // the shared luma/aHash pass
    val framesOut = Multimodal.decodeVideoFrames(
      MediaRecord(1L, "video", mp4, Map.empty), everyN = 2, external = Some(dec))
    assert(framesOut.size == 5 && framesOut.forall(f => f.width == 64 && f.height == 48))
  }

  test("aHash parity: built-in MJPEG-AVI path == ffmpeg path on MJPEG-MP4") {
    assume(haveFfmpeg, "ffmpeg/ffprobe not on PATH")
    // same codec (mjpeg), same deterministic testsrc content, two
    // containers: AVI routes through the BUILT-IN imageio path, MP4
    // through the EXTERNAL seam (decodeVideoFrames only keeps AVI
    // in-house). JPEG IDCT rounding can differ ±1 luma between
    // decoders; the 8x8 aHash quantizes far above that, so the
    // fingerprints must MATCH — the decoder-independence claim.
    val avi = synth("mjpeg", "avi", frames = 6)
    val mp4 = synth("mjpeg", "mp4", frames = 6)
    val builtIn = Multimodal.decodeVideoFrames(
      MediaRecord(7L, "video", avi, Map.empty), everyN = 1, external = None)
    val external = Multimodal.decodeVideoFrames(
      MediaRecord(7L, "video", mp4, Map.empty), everyN = 1,
      external = Some(new FfmpegVideoFrameDecoder))
    assert(builtIn.size == external.size)
    assert(builtIn.map(_.aHash) == external.map(_.aHash),
      s"aHash diverged:\n built-in: ${builtIn.map(_.aHash)}\n" +
        s" ffmpeg:   ${external.map(_.aHash)}")
  }
}
