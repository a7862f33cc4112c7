package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The ffmpeg adapter on [[Multimodal.transcodeWith]]'s seam. The real
  * end-to-end case (generate an MPEG with ffmpeg, transcode it back to
  * frames) is gated on the binary being present on the host —
  * `assume(available)` cancels it cleanly where ffmpeg isn't installed;
  * the degradation contract (no binary → every rejection survives) runs
  * everywhere, unconditionally.
  */
class FfmpegTranscoderSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def mpegBytes: Array[Byte] =
    Array[Byte](0x00, 0x00, 0x01, 0xBA.toByte) ++ Array.fill[Byte](200)(0x5a)

  test("a missing binary degrades to 'everything stays rejected', never an error") {
    import spark.implicits._
    assert(!FfmpegTranscoder.available("graft-no-such-binary-exists"))
    val media = Seq((7L, mpegBytes)).toDF("media_id", "content")
    val out = Multimodal.transcodeWith(media, k = 2,
      FfmpegTranscoder.transcoder(binary = "graft-no-such-binary-exists")).collect()
    assert(out.nonEmpty && out.forall(f =>
      !f.decoded && f.reason == "no_jvm_codec:mpeg-ps"))
  }

  test("real MPEG → ffmpeg → GIF → real sampled frames, end to end") {
    assume(FfmpegTranscoder.available(), "ffmpeg not installed on this host")
    import spark.implicits._
    // build a genuine MPEG-PS fixture with ffmpeg itself (testsrc: 8
    // frames of 64x64 synthetic video)
    val fixture = java.nio.file.Files.createTempFile("graft-mpeg-fixture", ".mpg")
    val gen = new ProcessBuilder(
      "ffmpeg", "-y", "-v", "error",
      "-f", "lavfi", "-i", "testsrc=duration=1:size=64x64:rate=8",
      "-f", "mpeg", fixture.toString)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start()
    assert(gen.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) && gen.exitValue() == 0)
    val bytes = java.nio.file.Files.readAllBytes(fixture)
    java.nio.file.Files.deleteIfExists(fixture)
    // first pass must reject it (no JVM MPEG codec)…
    val media = Seq((1L, bytes)).toDF("media_id", "content")
    val firstPass = Multimodal.sampleFrames(media, k = 3).collect()
    assert(firstPass.forall(f => !f.decoded && f.reason.startsWith("no_jvm_codec:mpeg")))
    // …and the adapter turns it into real decoded frames at source size
    val out = Multimodal.transcodeWith(media, k = 3, FfmpegTranscoder.transcoder())
      .collect()
    assert(out.nonEmpty && out.forall(f => f.decoded && f.reason == null))
    assert(out.forall(f => f.width == 64 && f.height == 64))
    assert(out.map(_.frame_idx).distinct.length === out.length)
    // frames are themselves decodable PNGs
    assert(out.forall(f => javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(f.frame)) != null))
  }

  test("transcoder output drops unconvertible payloads so rejections stay visible") {
    assume(FfmpegTranscoder.available(), "ffmpeg not installed on this host")
    import spark.implicits._
    // truncated garbage with an MPEG magic: ffmpeg fails, row is dropped,
    // transcodeWith keeps the first-pass rejection
    val media = Seq((9L, mpegBytes)).toDF("media_id", "content")
    val out = Multimodal.transcodeWith(media, k = 2, FfmpegTranscoder.transcoder())
      .collect()
    assert(out.nonEmpty && out.forall(f => !f.decoded))
    assert(out.forall(f => f.reason == "no_jvm_codec:mpeg-ps"))
  }
}
