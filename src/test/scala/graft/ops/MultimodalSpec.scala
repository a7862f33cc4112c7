package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def fakeMedia = {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ Array.tabulate(200)(i => (i % 251).toByte)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ Array.tabulate(150)(i => (i % 13).toByte)
    val wav = "RIFF".getBytes ++ Array.tabulate(100)(i => (i % 7).toByte)
    val junk = Array.tabulate(50)(i => i.toByte)
    Seq((1L, png), (2L, jpg), (3L, wav), (4L, junk)).toDF("media_id", "content")
  }

  test("media metadata: magic-byte sniffing, sizes, digests — no decode") {
    val meta = Multimodal.withMediaMeta(fakeMedia).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("format"), r.getAs[Long]("n_bytes"))).toMap
    assert(meta(1L) === ("png", 204L))
    assert(meta(2L) === ("jpeg", 154L))
    assert(meta(3L) === ("riff-wav", 104L))
    assert(meta(4L)._1 === "unknown")
  }

  test("batched feature extraction is deterministic and complete") {
    val f1 = Multimodal.extractFeatures(fakeMedia, dim = 8, batchSize = 2).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(fakeMedia.repartition(3), dim = 8, batchSize = 64)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1.keySet === Set(1L, 2L, 3L, 4L))
    assert(f1.values.forall(_.length == 8))
    // partitioning/batching must not change results
    assert(f1 === f2)
  }

  test("resize stub: size tracks target, format survives, deterministic") {
    val small = Multimodal.resize(fakeMedia, 32, 32)
    val rows = small.collect().map(r => r.getAs[Long]("media_id") ->
      r.getAs[Array[Byte]]("content")).toMap
    assert(rows(1L).length === 32 * 32 / 64)
    // magic bytes survive → sniffing still identifies the format
    val sniffed = Multimodal.withMediaMeta(small.where("media_id = 1")).collect()(0)
    assert(sniffed.getAs[String]("format") === "png")
    assert(small.columns.toSeq === Seq("media_id", "content", "width", "height"))
    val again = Multimodal.resize(fakeMedia, 32, 32).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content").toSeq).toMap
    assert(again(2L) === rows(2L).toSeq)
  }

  /** A real PNG: left half black, right half white, encoded by ImageIO. */
  private def realPng(w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to pixel-derived features, not the stub") {
    import spark.implicits._
    val media = Seq((10L, realPng())).toDF("media_id", "content")
    val f = Multimodal.extractFeatures(media, dim = 4).collect()(0).features
    // half the pixels are pure black (bin 0), half pure white (last bin)
    assert(f.toSeq === Seq(0.5f, 0.0f, 0.0f, 0.5f))
    // and NOT the rolling-hash stub value for the same bytes
    assert(f.toSeq !== Multimodal.stubDecode(realPng(), 4).toSeq)
  }

  test("real PNG resize re-samples pixels: output decodes at target dims") {
    import spark.implicits._
    val media = Seq((11L, realPng(16, 8))).toDF("media_id", "content")
    val out = Multimodal.resize(media, 4, 4).collect()(0)
      .getAs[Array[Byte]]("content")
    val back = Multimodal.decodeImage(out).get
    assert(back.getWidth === 4 && back.getHeight === 4)
    // resampled content keeps the black/white halves
    assert((back.getRGB(0, 0) & 0xffffff) === 0x000000)
    assert((back.getRGB(3, 0) & 0xffffff) === 0xffffff)
    // the re-encoded output is itself a sniffable PNG
    val sniffed = Multimodal.withMediaMeta(
      Multimodal.resize(media, 4, 4)).collect()(0)
    assert(sniffed.getAs[String]("format") === "png")
  }

  /** A real WAV: 16-bit mono PCM sine at half amplitude. */
  private def realWav(freqHz: Double = 440.0, ms: Int = 100,
                      rate: Float = 8000f): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freqHz * i / rate) * 16384).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV payloads decode to sample-derived features, not the stub") {
    import spark.implicits._
    val wav = realWav()
    // decoded samples round-trip the sine
    val samples = Multimodal.decodeAudio(wav).get
    assert(samples.length === 800)
    assert(math.abs(samples.map(s => s * s).sum / samples.length - 0.125) < 0.01) // RMS² of 0.5-amp sine
    // features through the distributed path: flat RMS envelope ≈ 0.3536
    val media = Seq((20L, wav)).toDF("media_id", "content")
    val f = Multimodal.extractFeatures(media, dim = 4).collect()(0).features
    assert(f.forall(b => b > 0.33f && b < 0.38f), f.toSeq.toString)
    assert(f.toSeq !== Multimodal.stubDecode(wav, 4).toSeq)
    // sniffing agrees it's a RIFF container
    val sniffed = Multimodal.withMediaMeta(media).collect()(0)
    assert(sniffed.getAs[String]("format") === "riff-wav")
    // text bytes must never accidentally decode as audio
    assert(Multimodal.decodeAudio("just some text".getBytes).isEmpty)
  }

  test("frame sampling yields k fixed-width deterministic slices") {
    val frames = Multimodal.sampleFrames(fakeMedia.where("media_id = 1"), k = 4, frameBytes = 16)
      .collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Array[Byte]]("frame").length).forall(_ == 16))
    val again = Multimodal.sampleFrames(fakeMedia.where("media_id = 1"), k = 4, frameBytes = 16)
      .collect().map(_.getAs[Array[Byte]]("frame").toSeq)
    assert(frames.map(_.getAs[Array[Byte]]("frame").toSeq).toSeq === again.toSeq)
  }
}
