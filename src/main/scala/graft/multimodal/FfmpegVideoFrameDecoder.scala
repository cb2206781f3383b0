package graft.multimodal

/** [[VideoFrameDecoder]] binding over the `ffmpeg`/`ffprobe` CLIs — the
  * zero-bundled-dependency way to decode codecs the JDK cannot (H.264,
  * VP9, …): executors shell out to the binaries on their PATH, so the
  * cluster image decides codec support, not this jar.
  *
  * Protocol per payload: one `ffprobe` run reads the first video
  * stream's dimensions from stdin; one `ffmpeg` run selects every
  * `everyN`-th frame and streams raw big-endian ARGB to stdout, which
  * slices into `w*h` int frames. stdin feeding runs on its own thread
  * (pipe deadlock otherwise). Errors surface with ffmpeg's stderr tail
  * — callers own quarantine policy, exactly like the built-in path.
  *
  * Configure with
  * `spark.conf.set(Multimodal.VideoDecoderClassKey,
  * "graft.multimodal.FfmpegVideoFrameDecoder")`; instantiated per
  * partition via the no-arg constructor. Covered by FfmpegDecoderSpec,
  * which is environment-gated (cancels without ffmpeg) and asserts
  * aHash parity with the built-in MJPEG decoder on the same frames. */
class FfmpegVideoFrameDecoder extends VideoFrameDecoder {

  /** Binary names resolve through executor-JVM system properties
    * (`graft.ffmpeg.bin` / `graft.ffprobe.bin`), then the
    * `GRAFT_FFMPEG_DIR` environment variable (a directory holding
    * executable `ffmpeg`+`ffprobe` — e.g. statically-linked builds
    * dropped into a container without package access), then PATH lookup
    * of the plain names — lets a cluster pin absolute paths via
    * `spark.executor.extraJavaOptions` or env, and lets the protocol
    * spec drive the full argv/stdin-feeder/frame-slicing path with fake
    * binaries in environments without codecs. */
  private def ffmpegBin: String = sys.props.getOrElse("graft.ffmpeg.bin",
    FfmpegVideoFrameDecoder.resolvedFromEnv._1)
  private def ffprobeBin: String = sys.props.getOrElse("graft.ffprobe.bin",
    FfmpegVideoFrameDecoder.resolvedFromEnv._2)

  override def decodeFrames(
      data: Array[Byte], everyN: Int): Iterator[(Int, Int, Int, Array[Int])] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val (pCode, pOut, pErr) = run(Seq(ffprobeBin, "-v", "error",
      "-select_streams", "v:0", "-show_entries", "stream=width,height",
      "-of", "csv=p=0", "pipe:0"), data)
    require(pCode == 0, s"ffprobe failed ($pCode): ${tail(pErr)}")
    val dims = new String(pOut, java.nio.charset.StandardCharsets.US_ASCII)
      .trim.split("[,\\s]+")
    require(dims.length >= 2, s"ffprobe returned no dimensions: '${tail(pOut)}'")
    val (w, h) = (dims(0).toInt, dims(1).toInt)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")

    val select =
      if (everyN == 1) Nil
      else Seq("-vf", s"select=not(mod(n\\,$everyN))", "-fps_mode", "passthrough")
    val (code, out, err) = run(Seq(ffmpegBin, "-v", "error", "-i", "pipe:0") ++
      select ++ Seq("-f", "rawvideo", "-pix_fmt", "argb", "pipe:1"), data)
    require(code == 0, s"ffmpeg failed ($code): ${tail(err)}")
    val frameBytes = w * h * 4
    require(out.length % frameBytes == 0,
      s"raw stream ${out.length} B is not a multiple of ${w}x$h ARGB frames")
    val n = out.length / frameBytes
    val buf = java.nio.ByteBuffer.wrap(out) // big-endian: getInt == ARGB
    (0 until n).iterator.map { i =>
      val argb = new Array[Int](w * h)
      buf.position(i * frameBytes)
      buf.asIntBuffer().get(argb)
      (i * everyN, w, h, argb)
    }
  }

  /** Run `cmd` feeding `input` on stdin; returns (exit, stdout, stderr).
    * The feeder runs on its own thread — writing 100 MB into a full pipe
    * from the reading thread deadlocks. */
  private def run(cmd: Seq[String], input: Array[Byte])
      : (Int, Array[Byte], Array[Byte]) = {
    val p = new ProcessBuilder(cmd: _*).start()
    val outBuf = new java.io.ByteArrayOutputStream()
    val errBuf = new java.io.ByteArrayOutputStream()
    val feeder = new Thread(() =>
      try {
        p.getOutputStream.write(input)
        p.getOutputStream.close()
      } catch { case _: java.io.IOException => () } // consumer closed early
    )
    val drainer = new Thread(() => copy(p.getErrorStream, errBuf))
    feeder.setDaemon(true); drainer.setDaemon(true)
    feeder.start(); drainer.start()
    copy(p.getInputStream, outBuf)
    val code = p.waitFor()
    feeder.join(10000); drainer.join(10000)
    (code, outBuf.toByteArray, errBuf.toByteArray)
  }

  private def copy(in: java.io.InputStream, out: java.io.OutputStream): Unit = {
    val b = new Array[Byte](65536)
    var n = in.read(b)
    while (n >= 0) { out.write(b, 0, n); n = in.read(b) }
  }

  private def tail(b: Array[Byte]): String = {
    val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    if (s.length <= 500) s else "…" + s.substring(s.length - 500)
  }
}

object FfmpegVideoFrameDecoder {
  /** `GRAFT_FFMPEG_DIR` resolution, factored for testability: when the
    * directory holds BOTH binaries as executables, their absolute paths
    * win; a missing/partial dir falls back to PATH lookup (never a
    * half-resolved pair — mixing a pinned ffmpeg with a PATH ffprobe
    * would make version skew look like a protocol bug). */
  private[graft] def resolveBinaries(
      dir: Option[String]): (String, String) = dir match {
    case Some(d) =>
      val fm = new java.io.File(d, "ffmpeg")
      val fp = new java.io.File(d, "ffprobe")
      if (fm.canExecute && fp.canExecute)
        (fm.getAbsolutePath, fp.getAbsolutePath)
      else ("ffmpeg", "ffprobe")
    case None => ("ffmpeg", "ffprobe")
  }

  private[graft] lazy val resolvedFromEnv: (String, String) =
    resolveBinaries(sys.env.get("GRAFT_FFMPEG_DIR"))
}
