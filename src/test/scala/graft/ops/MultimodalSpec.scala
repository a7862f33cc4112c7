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
    // RIFF magic but neither a WAVE nor an AVI form type → bare container
    assert(meta(3L) === ("riff", 104L))
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

  test("frame sampling yields k fixed-width deterministic slices on the stub path") {
    // media_id 1 is magic bytes + garbage — no ImageIO reader claims it
    val frames = Multimodal.sampleFrames(fakeMedia.where("media_id = 1"), k = 4, frameBytes = 16)
      .collect()
    assert(frames.length === 4)
    assert(frames.forall(!_.decoded))
    assert(frames.map(_.frame.length).forall(_ == 16))
    val again = Multimodal.sampleFrames(fakeMedia.where("media_id = 1"), k = 4, frameBytes = 16)
      .collect().map(_.frame.toSeq)
    assert(frames.map(_.frame.toSeq).toSeq === again.toSeq)
  }

  /** A real animated GIF: one solid web-safe color per frame (web-safe
    * grays survive the GIF writer's palette exactly).
    */
  private def animatedGif(colors: Seq[Int], w: Int = 8, h: Int = 8): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(c))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("animated GIF payloads yield real decoded frames, evenly sampled") {
    import spark.implicits._
    val colors = Seq(0x000000, 0x333333, 0x666666, 0x999999, 0xcccccc)
    val gif = animatedGif(colors)
    // the decoder sees every source frame with its pixels intact
    val decoded = Multimodal.decodeFrames(gif).get
    assert(decoded.length === 5)
    assert(decoded.map(_.getRGB(4, 4) & 0xffffff) === colors)
    // sniffing agrees it's a GIF
    val media = Seq((30L, gif)).toDF("media_id", "content")
    assert(Multimodal.withMediaMeta(media).collect()(0)
      .getAs[String]("format") === "gif")
    // k=3 over 5 frames picks source frames 0, 2, 4 — real pixels, not slices
    val frames = Multimodal.sampleFrames(media, k = 3).collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    assert(frames.forall(_.decoded))
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(frames.forall(f => f.width === 8 && f.height === 8))
    val pixels = frames.map(f => Multimodal.decodeImage(f.frame).get.getRGB(4, 4) & 0xffffff)
    assert(pixels.toSeq === Seq(colors(0), colors(2), colors(4)))
    // a still image is its own single real frame
    val still = Multimodal.sampleFrames(
      Seq((31L, realPng())).toDF("media_id", "content"), k = 4).collect()
    assert(still.length === 1 && still(0).decoded && still(0).frame_idx === 0)
    // k = 1 on a multi-frame payload picks the first frame (regression:
    // the even-spacing formula used to divide by k - 1 = 0)
    val one = Multimodal.sampleFrames(media, k = 1).collect()
    assert(one.length === 1 && one(0).decoded && one(0).frame_idx === 0)
  }

  /** Minimal MJPEG-in-AVI: RIFF("AVI ", LIST(hdrl, avih), LIST(movi,
    * 00dc JPEG chunks)) with word-aligned chunks — the structure any
    * MJPEG-producing capture tool emits.
    */
  private def mjpegAvi(colors: Seq[Int], w: Int = 16, h: Int = 12): Array[Byte] = {
    def le32(n: Int) = Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte)
    def chunk(id: String, data: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(tpe: String, payload: Array[Byte]) =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)
    val jpegs = colors.map { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("MJPEG AVI payloads yield real decoded frames; corrupt AVI falls back to the stub") {
    import spark.implicits._
    val colors = Seq(0x202020, 0x808080, 0xe0e0e0)
    val avi = mjpegAvi(colors)
    val decoded = Multimodal.decodeFrames(avi).get
    assert(decoded.length === 3)
    // JPEG is lossy: solid-gray frames decode within a few counts
    decoded.zip(colors).foreach { case (img, c) =>
      assert(img.getWidth === 16 && img.getHeight === 12)
      assert(math.abs((img.getRGB(8, 6) & 0xff) - (c & 0xff)) <= 4)
    }
    // sniffing separates the AVI form from WAV's
    val media = Seq((40L, avi)).toDF("media_id", "content")
    assert(Multimodal.withMediaMeta(media).collect()(0)
      .getAs[String]("format") === "riff-avi")
    // the distributed sampler returns real frames for every source frame
    val frames = Multimodal.sampleFrames(media, k = 8).collect().sortBy(_.frame_idx)
    assert(frames.length === 3 && frames.forall(_.decoded))
    val pix = frames.map(f => Multimodal.decodeImage(f.frame).get.getRGB(8, 6) & 0xff)
    pix.zip(colors).foreach { case (p, c) => assert(math.abs(p - (c & 0xff)) <= 4) }
    // truncating the movi list mid-chunk loses the tail frames but never throws;
    // chopping into the very first JPEG leaves nothing decodable → stub path
    val headOnly = avi.take(avi.length / 8)
    val stubbed = Multimodal.sampleFrames(
      Seq((41L, headOnly)).toDF("media_id", "content"), k = 2).collect()
    assert(stubbed.forall(!_.decoded))
  }

  test("both frame decoders honor one normalized pick contract") {
    val gif = animatedGif(Seq(0x000000, 0x333333, 0x666666, 0x999999, 0xcccccc))
    val avi = mjpegAvi(Seq(0x202020, 0x808080, 0xe0e0e0, 0x404040, 0xc0c0c0))
    // duplicated, unsorted, out-of-range picks normalize identically on
    // both container paths: dropped / deduped / ascending
    val messy = (_: Int) => IndexedSeq(4, 0, 4, -1, 2, 99, 0)
    Seq(gif, avi).foreach { payload =>
      val got = Multimodal.sampledFrames(payload, messy).get.map(_._1)
      assert(got === IndexedSeq(0, 2, 4), "picks must be distinct, sorted, in-range")
    }
  }

  test("MPEG payloads take the typed-rejection path: decoded=false + format-tagged reason") {
    import spark.implicits._
    // an MPEG program stream pack header (00 00 01 BA) + filler — the
    // payload class with no pure-JVM decoder; the contract is a typed
    // rejection a pipeline can route to an external transcode stage
    val mpeg = Array[Byte](0x00, 0x00, 0x01, 0xBA.toByte) ++
      Array.fill[Byte](200)(0x5a)
    val media = Seq((50L, mpeg)).toDF("media_id", "content")
    assert(Multimodal.withMediaMeta(media).collect()(0)
      .getAs[String]("format") === "mpeg-ps")
    assert(Multimodal.sniffFormat(mpeg) === "mpeg-ps")
    val frames = Multimodal.sampleFrames(media, k = 3).collect()
    assert(frames.length === 3)
    assert(frames.forall(f => !f.decoded && f.reason === "no_jvm_codec:mpeg-ps"))
    // real decodes carry no reason; ISO-BMFF sniffs as mp4 via ftyp
    val gifFrames = Multimodal.sampleFrames(
      Seq((51L, animatedGif(Seq(0x333333)))).toDF("media_id", "content"), k = 1).collect()
    assert(gifFrames.forall(f => f.decoded && f.reason == null))
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("US-ASCII") ++
      Array.fill[Byte](100)(1)
    assert(Multimodal.sniffFormat(mp4) === "mp4")
    val mp4Frames = Multimodal.sampleFrames(
      Seq((52L, mp4)).toDF("media_id", "content"), k = 2).collect()
    assert(mp4Frames.forall(f => !f.decoded && f.reason === "no_jvm_codec:mp4"))
  }

  test("transcodeWith routes rejected payloads through the external seam and re-decodes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val mpeg = Array[Byte](0x00, 0x00, 0x01, 0xBA.toByte) ++ Array.fill[Byte](200)(0x5a)
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("US-ASCII") ++
      Array.fill[Byte](100)(1)
    val media = Seq(
      (60L, realPng()), // decodes first pass — must NOT reach the transcoder
      (61L, mpeg),      // transcoder converts it
      (62L, mp4)        // transcoder drops it — rejection must survive
    ).toDF("media_id", "content")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val fakeTranscoder: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      failed => {
        // the seam hands over (media_id, reason, content) for dispatch
        failed.select(col("media_id"), col("reason")).collect()
          .foreach(r => seen.add((r.getLong(0), r.getString(1))))
        val png = realPng()
        failed.where(col("reason") === "no_jvm_codec:mpeg-ps")
          .select(col("media_id")).as[Long]
          .map(id => (id, png)).toDF("media_id", "content")
      }
    val out = Multimodal.transcodeWith(media, k = 2, fakeTranscoder).collect()
    assert(seen.asScala.toSet === Set(
      (61L, "no_jvm_codec:mpeg-ps"), (62L, "no_jvm_codec:mp4")))
    val byId = out.groupBy(_.media_id)
    // first-pass decode untouched; transcoded payload now yields REAL frames
    assert(byId(60L).forall(_.decoded))
    assert(byId(61L).forall(f => f.decoded && f.reason == null && f.width === 8))
    // dropped payload keeps its typed rejection — failures stay visible
    assert(byId(62L).forall(f => !f.decoded && f.reason === "no_jvm_codec:mp4"))
  }

  test("perceptual hash: re-encode-stable, locally sensitive, and the hamming join finds near-dup images") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gradient(dark: Boolean): BufferedImage = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = if (dark) (x * 2) min 255 else 255 - ((x * 2) min 255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val base = gradient(dark = true)
    // near-dup: same gradient with one small corner patch changed
    val near = gradient(dark = true)
    for (y <- 0 until 8; x <- 0 until 8) near.setRGB(x, y, 0xffffff)
    // far: the inverted gradient
    val far = gradient(dark = false)
    // re-encode of base as BMP: different bytes, same pixels
    val bmp = { val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(base, "bmp", bos); bos.toByteArray }

    val media = Seq((1L, png(base)), (2L, png(near)), (3L, png(far)),
      (4L, bmp), (5L, Array.tabulate(40)(_.toByte)))
      .toDF("media_id", "content")
    val hashed = Multimodal.perceptualHash(media).collect()
      .map(h => h.media_id -> h).toMap
    assert(hashed(1L).decoded && hashed(4L).decoded && !hashed(5L).decoded)
    assert(hashed(1L).phash.length === 56)
    assert(hashed(1L).phash === hashed(4L).phash,
      "a re-encode of the same pixels must hash identically")
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(hashed(1L).phash, hashed(2L).phash) > 0)
    assert(ham(hashed(1L).phash, hashed(2L).phash) <= 6,
      s"a small patch must flip few bits, got ${ham(hashed(1L).phash, hashed(2L).phash)}")
    assert(ham(hashed(1L).phash, hashed(3L).phash) >= 20,
      s"the inverted image must be far, got ${ham(hashed(1L).phash, hashed(3L).phash)}")

    // the banded hamming join surfaces exactly the near pairs
    val pairs = Multimodal.imageNearDups(media, maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the far image must not pair")
    // determinism across partitioning
    val again = Multimodal.perceptualHash(media.repartition(4)).collect()
      .map(h => h.media_id -> h.phash).toMap
    assert(again === hashed.map { case (k, v) => k -> v.phash })
  }

}
