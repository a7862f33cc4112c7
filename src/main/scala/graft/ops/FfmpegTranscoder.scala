package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A REAL external transcoder for [[Multimodal.transcodeWith]]'s typed
  * rejection seam: shells out to an `ffmpeg` binary on the executors,
  * converting payloads the JDK has no codec for (true MPEG video above
  * all) into a JDK-readable animation (GIF by default — ImageIO reads
  * it frame-by-frame, so the re-decode pass samples REAL frames).
  *
  * This is exactly the `mapPartitions`-at-the-codec-boundary shape the
  * seam's scaladoc prescribes: only the FAILED payloads' bytes flow
  * through the external binary, one process per payload, stdout/stderr
  * discarded (drained output can't deadlock the pipe buffer), input and
  * output through executor-local temp files (ffmpeg wants seekable
  * input for container formats), hard timeout per payload. A payload
  * ffmpeg cannot convert (unsupported codec, timeout, truncated file)
  * is DROPPED from the adapter's output — `transcodeWith` then keeps
  * its first-pass `decoded = false` rejection rows, so failures stay
  * visible instead of silently vanishing.
  *
  * The binary is an OPTIONAL host dependency, never a library one:
  * [[available]] probes for it, callers (and FfmpegTranscoderSpec)
  * gate on the probe, and a missing binary degrades to "everything
  * stays rejected" — the same contract as not attaching a transcoder
  * at all.
  */
object FfmpegTranscoder {

  /** Can `binary` be executed on this host? (Probes `-version`; any
    * failure to launch or a nonzero exit is "not available".)
    */
  def available(binary: String = "ffmpeg"): Boolean =
    try {
      val p = new ProcessBuilder(binary, "-version")
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start()
      p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: Exception => false }

  /** The `transcoder` argument for [[Multimodal.transcodeWith]]: takes
    * the failed-payload frame (`media_id`, `reason`, `content`), returns
    * (`media_id`, `content`) re-encoded as `outFormat` for the payloads
    * ffmpeg could convert. `maxFrames` bounds the re-encoded animation
    * (the re-decode pass samples `k` frames anyway, so shipping every
    * source frame back would be wasted bytes); `timeoutSec` is the hard
    * per-payload wall-clock cap.
    */
  def transcoder(binary: String = "ffmpeg", outFormat: String = "gif",
                 maxFrames: Int = 16, timeoutSec: Int = 120): DataFrame => DataFrame = {
    failed =>
      val spark = failed.sparkSession
      import spark.implicits._
      failed.select(col("media_id").cast("long"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, bytes) =>
            transcodeOne(binary, outFormat, maxFrames, timeoutSec, bytes)
              .map(out => (id, out))
          }
        }
        .toDF("media_id", "content")
  }

  /** One payload through one ffmpeg process; None = could not convert. */
  private def transcodeOne(binary: String, outFormat: String, maxFrames: Int,
                           timeoutSec: Int, bytes: Array[Byte]): Option[Array[Byte]] = {
    import java.nio.file.Files
    val in = Files.createTempFile("graft-ffmpeg-in", ".bin")
    val out = Files.createTempFile("graft-ffmpeg-out", s".$outFormat")
    try {
      Files.write(in, bytes)
      val p = new ProcessBuilder(
        binary, "-y", "-v", "error", "-i", in.toString,
        "-frames:v", maxFrames.toString, "-f", outFormat, out.toString)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start()
      val done = p.waitFor(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); None }
      else if (p.exitValue() != 0) None
      else Some(Files.readAllBytes(out)).filter(_.nonEmpty)
    } catch { case _: Exception => None }
    finally {
      Files.deleteIfExists(in)
      Files.deleteIfExists(out)
      ()
    }
  }
}
