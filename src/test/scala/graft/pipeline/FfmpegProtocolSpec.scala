package graft.pipeline

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.FfmpegVideoFrameDecoder

/** Drives the ffmpeg CLI binding's full protocol — argument
  * construction, the dedicated stdin-feeder thread, stderr draining,
  * and raw-ARGB frame slicing — against FAKE `ffmpeg`/`ffprobe` shell
  * binaries that emit a known byte stream. Runs in every environment
  * (no codecs needed); the real-binary decode parity lives in the
  * env-gated FfmpegDecoderSpec. */
class FfmpegProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: Path = _

  // two 4x3 ARGB frames: frame 0 = bytes 0..47, frame 1 = bytes 128..175
  private val frame0 = (0 until 48).map(_.toByte).toArray
  private val frame1 = (128 until 176).map(_.toByte).toArray

  private def writeScript(name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, ("#!/bin/sh\n" + body).getBytes("UTF-8"))
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    dir = Files.createTempDirectory("graft-fakeffmpeg")
    // both fakes log their argv and CONSUME stdin fully (like the real
    // tools) — an unread stdin would hang the feeder and mask pipe bugs
    writeScript("ffprobe",
      """echo "$@" >> "$(dirname "$0")/ffprobe.args"
        |cat > /dev/null
        |printf '4,3\n'
        |""".stripMargin)
    val octal = (frame0 ++ frame1).map(b => "\\%03o".format(b & 0xff)).mkString
    writeScript("ffmpeg",
      s"""echo "$$@" >> "$$(dirname "$$0")/ffmpeg.args"
         |cat > /dev/null
         |printf '$octal'
         |""".stripMargin)
    writeScript("ffmpeg-fail",
      """cat > /dev/null
        |echo "Invalid data found when processing input" >&2
        |exit 1
        |""".stripMargin)
    System.setProperty("graft.ffprobe.bin", dir.resolve("ffprobe").toString)
    System.setProperty("graft.ffmpeg.bin", dir.resolve("ffmpeg").toString)
  }

  override def afterAll(): Unit = {
    System.clearProperty("graft.ffprobe.bin")
    System.clearProperty("graft.ffmpeg.bin")
    super.afterAll()
  }

  private def argsOf(name: String): String =
    new String(Files.readAllBytes(dir.resolve(name)), "UTF-8")

  test("GRAFT_FFMPEG_DIR resolution: a dir with both executables wins, partial dirs fall back") {
    // a fake dir holding BOTH tools resolves to its absolute paths —
    // this is how the env-gated real-binary spec picks up
    // driver-provided static builds (see TESTDATA.md)
    val (fm, fp) = FfmpegVideoFrameDecoder.resolveBinaries(Some(dir.toString))
    assert(fm == dir.resolve("ffmpeg").toString)
    assert(fp == dir.resolve("ffprobe").toString)
    // a dir missing one of the pair falls back to PLAIN names for both
    // (never a mixed pair)
    val partial = Files.createTempDirectory("graft-partial-ffmpeg")
    Files.copy(dir.resolve("ffmpeg"), partial.resolve("ffmpeg"),
      java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    assert(FfmpegVideoFrameDecoder.resolveBinaries(Some(partial.toString)) ==
      ("ffmpeg", "ffprobe"))
    // unset env → plain names
    assert(FfmpegVideoFrameDecoder.resolveBinaries(None) ==
      ("ffmpeg", "ffprobe"))
  }

  test("protocol end-to-end: argv, stdin feed past the pipe buffer, frame slicing") {
    // 1 MiB payload: larger than any OS pipe buffer, so the run only
    // completes if the feeder genuinely runs on its own thread
    val payload = Array.tabulate[Byte](1 << 20)(i => (i * 31).toByte)
    val dec = new FfmpegVideoFrameDecoder
    val frames = dec.decodeFrames(payload, everyN = 2).toSeq

    assert(frames.map(f => (f._1, f._2, f._3)) == Seq((0, 4, 3), (2, 4, 3)),
      "two 4x3 frames at stride 2 expected")
    // big-endian slicing: pixel j of frame 0 is bytes 4j..4j+3
    val px0 = frames.head._4
    assert(px0.length == 12)
    assert(px0(0) == 0x00010203 && px0(1) == 0x04050607)
    val px1 = frames(1)._4
    assert(px1(0) == 0x80818283 && px1(11) == 0xacadaeaf)

    val probeArgs = argsOf("ffprobe.args")
    assert(probeArgs.contains("-select_streams v:0") &&
      probeArgs.contains("stream=width,height") && probeArgs.contains("pipe:0"),
      s"ffprobe argv malformed: $probeArgs")
    val ffArgs = argsOf("ffmpeg.args")
    assert(ffArgs.contains("-i pipe:0") &&
      ffArgs.contains("select=not(mod(n\\,2))") &&
      ffArgs.contains("-fps_mode passthrough") &&
      ffArgs.contains("-f rawvideo -pix_fmt argb pipe:1"),
      s"ffmpeg argv malformed: $ffArgs")
  }

  test("everyN=1 omits the select filter") {
    val dec = new FfmpegVideoFrameDecoder
    Files.deleteIfExists(dir.resolve("ffmpeg.args"))
    val frames = dec.decodeFrames(Array[Byte](1, 2, 3), everyN = 1).toSeq
    assert(frames.map(_._1) == Seq(0, 1), "stride 1 numbers frames densely")
    val ffArgs = argsOf("ffmpeg.args")
    assert(!ffArgs.contains("select="), s"no -vf select at stride 1: $ffArgs")
  }

  test("nonzero exit surfaces the stderr tail") {
    System.setProperty("graft.ffmpeg.bin", dir.resolve("ffmpeg-fail").toString)
    try {
      val e = intercept[IllegalArgumentException] {
        new FfmpegVideoFrameDecoder().decodeFrames(Array[Byte](1), everyN = 1).toSeq
      }
      assert(e.getMessage.contains("ffmpeg failed (1)") &&
        e.getMessage.contains("Invalid data found"))
    } finally {
      System.setProperty("graft.ffmpeg.bin", dir.resolve("ffmpeg").toString)
    }
  }

  test("truncated raw stream (not a frame multiple) fails fast") {
    // a fake that emits 50 bytes — not a multiple of 4x3x4
    writeScript("ffmpeg-short",
      """cat > /dev/null
        |printf '%050d' 0
        |""".stripMargin)
    System.setProperty("graft.ffmpeg.bin", dir.resolve("ffmpeg-short").toString)
    try {
      val e = intercept[IllegalArgumentException] {
        new FfmpegVideoFrameDecoder().decodeFrames(Array[Byte](1), everyN = 1).toSeq
      }
      assert(e.getMessage.contains("not a multiple"))
    } finally {
      System.setProperty("graft.ffmpeg.bin", dir.resolve("ffmpeg").toString)
    }
  }
}
