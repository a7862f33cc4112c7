package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus feature extraction shaped for a
  * 1000-executor cluster.
  *
  * Codecs: images (PNG/JPEG/GIF/BMP) decode for real via
  * `javax.imageio`, audio (WAV/PCM and anything the JDK's sampled-audio
  * SPI converts) via `javax.sound.sampled`, and motion payloads decode
  * real frames via `decodeFrames` on two container paths — animated GIF
  * (ImageIO frame iterator + compositing) and MJPEG-in-AVI (RIFF chunk
  * walk + per-frame JPEG decode) — all shipping with the JDK, no native
  * dependencies; features derive from actual pixels / samples. Payloads
  * no JDK codec reads (MPEG-family video, corrupt bytes) fall back to
  * the labeled deterministic STUB, preserving the full-pipeline
  * behavior until a native codec is slotted in.
  *
  * Scale notes:
  *  - payload bytes stay columnar end-to-end (parquet binary chunks);
  *    nothing materializes on the driver;
  *  - decode runs in `mapPartitions` with per-partition "model init" and
  *    fixed-size record batches — the Scala analog of a batched Pandas
  *    UDF: amortized setup, bounded memory per task;
  *  - repartition before decode by target batch count, not by input file
  *    layout, so a few giant media files can't skew task runtimes.
  */
object Multimodal {

  // offscreen BufferedImage work needs no display; pin headless so
  // executors never probe for one
  System.setProperty("java.awt.headless", "true")

  /** Pure-JVM image decode. None ⇒ not an ImageIO-readable image —
    * callers fall back to the stub path.
    *
    * The stream is wrapped in a MemoryCacheImageInputStream EXPLICITLY:
    * `ImageIO.read(InputStream)` defaults to a DISK-backed cache — a
    * temp file created and deleted per payload, which at
    * thousands-of-rows-per-partition turns the decode probe into
    * filesystem churn. The bytes are already in memory; cache there.
    */
  /** Magic-byte pre-gate for [[decodeImage]]: a SUPERSET of the header
    * prefixes the stock JDK ImageIO readers' `canDecodeInput` accepts
    * (PNG 0x89, JPEG FFD8, GIF "GI", BMP "BM", TIFF "II"/"MM", WBMP
    * 00 00). A payload failing this can never be claimed by a stock
    * reader, so skipping the full SPI probe cannot change the decode
    * outcome — it only removes the per-row reader-iteration cost that
    * dominated the feature pass on text corpora (measured at sf0.1:
    * the q33 probe stage spent ~69 s of task time at ~3 s of CPU — the
    * gap is ImageIO probe machinery, not compute). Supersets, never
    * exact signatures: a matching prefix just falls through to the
    * real probe, which stays the deciding authority. Deployments that
    * register third-party ImageIO plugins with other magics can turn
    * the gate off (-Dgraft.media.sniffGate=false).
    */
  private final val SniffGate: Boolean =
    !"false".equalsIgnoreCase(System.getProperty("graft.media.sniffGate", "true"))

  private def mayBeImage(b: Array[Byte]): Boolean =
    b.length >= 2 && {
      val b0 = b(0) & 0xff; val b1 = b(1) & 0xff
      (b0 == 0x89) ||                    // PNG
        (b0 == 0xff && b1 == 0xd8) ||    // JPEG
        (b0 == 'G' && b1 == 'I') ||      // GIF
        (b0 == 'B' && b1 == 'M') ||      // BMP
        (b0 == 'I' && b1 == 'I') ||      // TIFF little-endian
        (b0 == 'M' && b1 == 'M') ||      // TIFF big-endian
        (b0 == 0x00 && b1 == 0x00)       // WBMP (no real magic)
    }

  /** Magic-byte pre-gate for [[decodeAudio]], same contract as
    * [[mayBeImage]]: a superset of the stock JDK sampled-audio SPI
    * headers (WAV "RIFF", AIFF/AIFC "FORM", AU ".snd").
    */
  private def mayBeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && {
      def at(s: String): Boolean =
        s.zipWithIndex.forall { case (c, i) => b(i) == c.toByte }
      at("RIFF") || at("FORM") || at(".snd")
    }

  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (SniffGate && !mayBeImage(bytes)) None
    else try Option(javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))))
    catch { case _: Exception => None }

  /** Pixel-derived feature vector: a `dim`-bin luminance histogram
    * (ITU-R 601 weights), normalized by pixel count. Deterministic for
    * a given decoded image; a real embedding model slots in at the same
    * call site.
    */
  def luminanceHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val bin = math.min((lum * dim / 256.0).toInt, dim - 1)
        out(bin) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    var d = 0
    while (d < dim) { out(d) /= n; d += 1 }
    out
  }

  /** Content sniffing + integrity metadata as pure codegen'd expressions
    * (no decode): magic-byte format detection, byte size, digest.
    */
  def withMediaMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val magic = upper(hex(substring(col(contentCol), 1, 4)))
    // RIFF is a container — bytes 9-12 carry the actual form type
    val riffType = upper(hex(substring(col(contentCol), 9, 4)))
    df
      .withColumn("n_bytes", octet_length(col(contentCol)).cast("long"))
      .withColumn("sha", sha2(col(contentCol), 256))
      .withColumn("format",
        when(magic.startsWith("89504E47"), "png")
          .when(magic.startsWith("FFD8FF"), "jpeg")
          .when(magic.startsWith("47494638"), "gif")
          .when(magic.startsWith("52494646"),
            when(riffType === lit("57415645"), "riff-wav")     // "WAVE"
              .when(riffType === lit("41564920"), "riff-avi")  // "AVI "
              .otherwise("riff"))
          // ISO-BMFF: the 'ftyp' box name at bytes 5-8, not the
          // size-box heuristic (box size varies)
          .when(upper(hex(substring(col(contentCol), 5, 4))) === lit("66747970"), "mp4")
          .when(magic === lit("000001BA"), "mpeg-ps")   // MPEG program stream pack header
          .when(magic === lit("000001B3"), "mpeg-video") // MPEG video sequence header
          .otherwise("unknown"))
  }

  /** JVM-side magic-byte sniff, the row-scope twin of [[withMediaMeta]]
    * — used where a decoder needs the format label inside mapPartitions
    * (e.g. typing WHY a payload took the stub path).
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(off: Int, magic: String): Boolean =
      bytes.length >= off + magic.length &&
        magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          .zipWithIndex.forall { case (b, i) => bytes(off + i) == b }
    def hexAt(off: Int, hexMagic: String): Boolean = {
      val m = hexMagic.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      bytes.length >= off + m.length &&
        m.zipWithIndex.forall { case (b, i) => bytes(off + i) == b }
    }
    if (hexAt(0, "89504E47")) "png"
    else if (hexAt(0, "FFD8FF")) "jpeg"
    else if (at(0, "GIF8")) "gif"
    else if (at(0, "RIFF") && at(8, "WAVE")) "riff-wav"
    else if (at(0, "RIFF") && at(8, "AVI ")) "riff-avi"
    else if (at(0, "RIFF")) "riff"
    else if (at(4, "ftyp")) "mp4"
    else if (hexAt(0, "000001BA")) "mpeg-ps"
    else if (hexAt(0, "000001B3")) "mpeg-video"
    else "unknown"
  }

  /** Pure-JVM audio decode via the JDK's sampled-audio SPI (WAV/PCM,
    * AU, AIFF): mono-folded samples in [-1, 1]. None ⇒ not decodable
    * audio — callers fall back to the stub path.
    */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Double]] =
    if (SniffGate && !mayBeAudio(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate, 16, fmt.getChannels, true, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val ch = target.getChannels
      val nFrames = raw.length / (2 * ch)
      val out = new Array[Double](nFrames)
      var i = 0
      while (i < nFrames) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val idx = (i * ch + c) * 2
          s += (((raw(idx + 1) & 0xff) << 8) | (raw(idx) & 0xff)).toShort / 32768.0
          c += 1
        }
        out(i) = s / ch
        i += 1
      }
      if (nFrames == 0) None else Some(out)
    } catch { case _: Exception => None }

  /** Sample-derived audio features: the RMS energy envelope over `dim`
    * equal time windows — deterministic for decoded samples, the audio
    * analog of the image luminance histogram. A real embedding model
    * slots in at the same call site.
    */
  def rmsEnvelope(samples: Array[Double], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = samples.length
    var d = 0
    while (d < dim) {
      val from = (n.toLong * d / dim).toInt
      val until = math.max((n.toLong * (d + 1) / dim).toInt, from + 1)
      var acc = 0.0
      var i = from
      while (i < until && i < n) { acc += samples(i) * samples(i); i += 1 }
      out(d) = math.sqrt(acc / math.max(math.min(until, n) - from, 1)).toFloat
      d += 1
    }
    out
  }

  /** STUB for the codecs the JDK lacks (video): derives `dim` floats
    * from a rolling hash of the bytes — deterministic, so tests can
    * assert exact plumbing behavior until a real decoder slots in.
    */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(d) = (h & 0xffff).toFloat / 65536.0f
      d += 1
    }
    out
  }

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Batched distributed decode: (media_id, content) → feature vectors.
    * Real images yield pixel-derived luminance histograms, real audio
    * yields sample-derived RMS envelopes; everything else falls back to
    * the labeled stub.
    *
    * `batchSize` mirrors a Pandas-UDF batch: the decoder context is
    * created once per partition (think: model load), then records flow
    * through in fixed-size groups.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens HERE for decoders that need it
        // (model load, codec context); ImageIO readers are stateless.
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val features = decodeImage(bytes) match {
              case Some(img) => luminanceHistogram(img, dim)
              case None => decodeAudio(bytes) match {
                case Some(samples) => rmsEnvelope(samples, dim)
                case None => stubDecode(bytes, dim)
              }
            }
            MediaFeatures(id, features)
          }
        }
      }
  }

  /** Average-hash (aHash) bits of a decoded image: mean luminance per
    * cell of a `gridW`×`gridH` grid, each cell thresholded by the grid
    * mean — the classic perceptual fingerprint: stable under re-encode,
    * resize, and mild noise; flipped bits count structural change.
    */
  def aHashBits(img: java.awt.image.BufferedImage, gridW: Int,
                gridH: Int): Array[Boolean] = {
    val w = img.getWidth.max(1)
    val h = img.getHeight.max(1)
    val cells = new Array[Double](gridW * gridH)
    var cy = 0
    while (cy < gridH) {
      var cx = 0
      while (cx < gridW) {
        val x0 = cx * w / gridW; val x1 = ((cx + 1) * w / gridW).max(x0 + 1).min(w)
        val y0 = cy * h / gridH; val y1 = ((cy + 1) * h / gridH).max(y0 + 1).min(h)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        cells(cy * gridW + cx) = if (n == 0) 0.0 else sum / n
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / cells.length
    cells.map(_ >= mean)
  }

  final case class MediaHash(media_id: Long, phash: String, decoded: Boolean)

  /** PERCEPTUAL HASH per media row — the cross-modal twin of text
    * SimHash: decodable images hash by [[aHashBits]] (gridW×gridH cells,
    * default 8×7 = 56 bits so the hash rides the exact signed-long
    * popcount verify downstream); undecodable payloads take a
    * deterministic stub fingerprint of their bytes (plumbing stays
    * testable; `decoded` says which path fired). Output `phash` is a
    * bitstring column shaped exactly like the text SimHash sketches, so
    * [[imageNearDups]] is a straight reuse of the banded hamming join.
    */
  def perceptualHash(media: DataFrame, gridW: Int = 8, gridH: Int = 7,
                     batchSize: Int = 64): Dataset[MediaHash] = {
    require(gridW * gridH <= 62,
      s"gridW*gridH must fit the signed-long popcount verify (<= 62), got ${gridW * gridH}")
    val spark = media.sparkSession
    import spark.implicits._
    val bits = gridW * gridH
    media.select(col("media_id").cast("long"), col("content"))
      .where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            decodeImage(bytes) match {
              case Some(img) =>
                MediaHash(id,
                  aHashBits(img, gridW, gridH).map(b => if (b) '1' else '0').mkString,
                  decoded = true)
              case None =>
                val f = stubDecode(bytes, bits)
                MediaHash(id, f.map(v => if (v >= 0.5f) '1' else '0').mkString,
                  decoded = false)
            }
          }
        }
      }
  }

  /** Image near-duplicate pairs: perceptual hashes joined by the SAME
    * banded hamming blocking + exact popcount verify the text SimHash
    * path uses ([[graft.ops.Dedup.simhashPairs]]) — pigeonhole bands
    * bound the candidate volume, the popcount makes the answer exact
    * for the hash. The cross-modal dedup composition: one fingerprint
    * op per modality, one scale-proof join for all of them.
    */
  def imageNearDups(media: DataFrame, maxHamming: Int,
                    gridW: Int = 8, gridH: Int = 7,
                    maxBucket: Option[Int] = None): DataFrame =
    graft.ops.Dedup.simhashPairs(
      perceptualHash(media, gridW, gridH).toDF()
        .select(col("media_id"), col("phash").as("simhash")),
      "media_id", gridW * gridH, maxHamming, maxBucket)

  /** Resize. ImageIO-readable payloads are decoded, bilinearly resampled
    * to `targetW`×`targetH`, and re-encoded as PNG (format-normalizing
    * resize, as ingestion pipelines typically do). Unreadable payloads
    * take the deterministic STUB path — head + proportional stride
    * sample so output size tracks the target — keeping the plumbing
    * testable for modalities whose codec isn't wired yet.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
             batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val targetBytes = math.max(targetW * targetH / 64, 16)
    media.select(col("media_id").cast("long"), col("content"))
      .where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          val out = decodeImage(bytes) match {
            case Some(img) =>
              val scaled = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", bos)
              bos.toByteArray
            case None =>
              // STUB: stride-sample down to ~targetBytes, keeping the
              // magic header so format sniffing still works
              if (bytes.length <= targetBytes) bytes
              else {
                val head = bytes.take(8)
                val stride = math.max((bytes.length - 8) / (targetBytes - 8), 1)
                head ++ (8 until bytes.length by stride).take(targetBytes - 8)
                  .map(bytes(_)).toArray
              }
          }
          (id, out, targetW, targetH)
        })
      }
      .toDF("media_id", "content", "width", "height")
  }

  /** Multi-frame decode for motion payloads: animated GIF via the
    * ImageIO frame iterator, MJPEG-in-AVI via the RIFF walk below —
    * the two motion formats a stock JDK can decode for real. None ⇒
    * neither path claims the payload — callers fall back to the stub
    * (true MPEG lands there: no pure-JVM decoder exists).
    *
    * Materializes EVERY frame — fine for inspection and small
    * payloads; the distributed sampler uses [[sampledFrames]], which
    * bounds memory by the selection instead.
    */
  def decodeFrames(bytes: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
    sampledFrames(bytes, n => 0 until n).map(_.map(_._2))

  /** Frame decode bounded by a selection: `pick(n)` names the
    * source-frame indices to return, and only those frames are
    * materialized — a 5,000-frame payload sampled at k = 4 holds one
    * compositing canvas plus 4 snapshots, never 5,000 (GIF deltas up
    * to the last picked index are still DECODED forward onto the
    * canvas, as the format requires, but not retained; AVI frames are
    * independent JPEGs, so unpicked chunks are never decoded at all).
    *
    * The selection is normalized ONCE here — out-of-range dropped,
    * de-duplicated, ascending — so both container paths honor the same
    * contract regardless of what `pick` returns.
    */
  def sampledFrames(bytes: Array[Byte], pick: Int => IndexedSeq[Int])
      : Option[IndexedSeq[(Int, java.awt.image.BufferedImage)]] = {
    val normalized = (n: Int) => pick(n).filter(i => i >= 0 && i < n).distinct.sorted
    imageIoFrames(bytes, normalized).orElse(aviMjpegFrames(bytes, normalized))
  }

  /** AVI (RIFF) walk for Motion-JPEG streams: every video-data chunk
    * (`##dc`/`##db`) inside a `movi` (or `rec `) LIST whose payload
    * starts with the JPEG SOI marker decodes as a standalone frame —
    * MJPEG is intra-only, so no compositing is involved. Defensive
    * against truncated/corrupt containers (malformed sizes end the walk
    * with whatever frames were already recovered). None ⇒ not a
    * RIFF/AVI payload or no decodable frame inside.
    */
  private def aviMjpegFrames(bytes: Array[Byte], pick: Int => IndexedSeq[Int])
      : Option[IndexedSeq[(Int, java.awt.image.BufferedImage)]] = {
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // pass 1: chunk offsets only — nothing decodes yet
    val chunks = IndexedSeq.newBuilder[(Int, Int)] // (dataOff, size)
    def walk(from: Long, until: Long, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(off.toInt)
        val sz = u32(off.toInt + 4)
        val dataOff = off + 8
        if (dataOff + sz > until) return // malformed size: stop here
        if (id == "LIST" && sz >= 4) {
          val listType = fourcc(dataOff.toInt)
          if (listType == "movi" || listType == "rec ")
            walk(dataOff + 4, dataOff + sz, inMovi = true)
        } else if (inMovi && sz >= 2 &&
          (id.regionMatches(true, 2, "dc", 0, 2) || id.regionMatches(true, 2, "db", 0, 2)) &&
          (bytes(dataOff.toInt) & 0xff) == 0xff && (bytes(dataOff.toInt + 1) & 0xff) == 0xd8) {
          chunks += ((dataOff.toInt, sz.toInt))
        }
        off = dataOff + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length.toLong, 8 + u32(4)), inMovi = false)
    val all = chunks.result()
    if (all.isEmpty) return None
    // pass 2: decode ONLY the picked chunks — MJPEG frames are
    // independent (selection already normalized by sampledFrames)
    val out = pick(all.length).flatMap { i =>
      val (off, sz) = all(i)
      decodeImage(java.util.Arrays.copyOfRange(bytes, off, off + sz)).map(i -> _)
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** ImageIO multi-frame path (animated GIF in a stock JDK). Frames are
    * composited cumulatively onto a canvas at each frame's (left, top)
    * offset, because GIF frames after the first are typically partial
    * deltas; the returned images are full-canvas snapshots, one per
    * source frame. The canvas is sized by the first frame (the GIF
    * logical screen in practice); later frames that overflow it are
    * clipped. Disposal methods beyond draw-over are not modeled — fine
    * for feature extraction, not an archival renderer.
    */
  private def imageIoFrames(bytes: Array[Byte], pick: Int => IndexedSeq[Int])
      : Option[IndexedSeq[(Int, java.awt.image.BufferedImage)]] =
    if (SniffGate && !mayBeImage(bytes)) None
    else try {
      // memory-backed stream, NOT ImageIO.createImageInputStream: the
      // registry default is a disk-cached stream (temp file per
      // payload) — see decodeImage
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            if (n < 1) None
            else {
              // selection already normalized by sampledFrames
              val wanted = pick(n)
              if (wanted.isEmpty) None
              else {
                // composite forward to the LAST wanted frame (GIF frames
                // are deltas), snapshotting only the picked indices —
                // memory is one canvas + |wanted| snapshots, not n
                var canvas: java.awt.image.BufferedImage = null
                val wantedSet = wanted.toSet
                val out = IndexedSeq.newBuilder[(Int, java.awt.image.BufferedImage)]
                (0 to wanted.last).foreach { i =>
                  val frame = reader.read(i)
                  val (ox, oy) = frameOffset(reader, i)
                  if (canvas == null)
                    canvas = new java.awt.image.BufferedImage(
                      frame.getWidth + ox, frame.getHeight + oy,
                      java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = canvas.createGraphics()
                  g.drawImage(frame, ox, oy, null)
                  g.dispose()
                  if (wantedSet.contains(i)) {
                    val snap = new java.awt.image.BufferedImage(
                      canvas.getWidth, canvas.getHeight,
                      java.awt.image.BufferedImage.TYPE_INT_RGB)
                    val gs = snap.createGraphics()
                    gs.drawImage(canvas, 0, 0, null)
                    gs.dispose()
                    out += ((i, snap))
                  }
                }
                Some(out.result())
              }
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  /** A frame's placement on the logical screen, from the GIF image
    * descriptor in the reader's per-frame metadata; (0, 0) for formats
    * without placement metadata.
    */
  private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
    try {
      val md = reader.getImageMetadata(i)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val desc = tree.getElementsByTagName("ImageDescriptor")
      if (desc.getLength == 0) (0, 0)
      else {
        val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("imageLeftPosition").toInt,
          e.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  final case class SampledFrame(media_id: Long, frame_idx: Int,
                                frame: Array[Byte], width: Int, height: Int,
                                decoded: Boolean, reason: String)

  /** Deterministic frame sampling for video-like payloads: up to `k`
    * evenly spaced frames per payload. Payloads ImageIO can read yield
    * REAL frames — `decodeFrames` composites the animation and the
    * sampler picks `k` evenly spaced source frames (all of them when
    * the payload has fewer than `k`), re-encoded as PNG with
    * `frame_idx` = the source frame number, `decoded` = true and
    * `reason` = null. A still image is its own single frame.
    *
    * ==Capability boundary==
    * Payloads no JDK codec reads — true MPEG video above all: no
    * pure-JVM MPEG decoder exists, and this library takes no native
    * dependencies — take the labeled STUB path: `k` evenly spaced
    * `frameBytes`-wide byte slices with `decoded` = false and `reason`
    * = `no_jvm_codec:<sniffed format>` (e.g. `no_jvm_codec:mpeg-ps`).
    * The typed rejection is the routing contract: a pipeline filters
    * `decoded = false` rows and sends them by `reason`'s format tag to
    * an external transcode stage, while the plumbing (schema,
    * batching, partitioning) is identical for both paths — swap the
    * decoder when a native codec arrives.
    *
    * Decode runs batched in `mapPartitions` at the codec boundary,
    * like `extractFeatures`; payload bytes stay columnar throughout.
    */
  /** The consumer of the typed-rejection routing contract: sample
    * frames, route every payload the JDK cannot decode (`decoded =
    * false`, `reason = no_jvm_codec:<fmt>`) to a user-supplied
    * external `transcoder`, and decode what comes back through the
    * SAME frame sampler. The transcoder receives one row per failed
    * payload — `(media_id, reason, content)` with the format tag so it
    * can dispatch per codec — and must return `(media_id, content)`
    * with payloads re-encoded into a JDK-readable format (any column
    * order; extra columns ignored). Its output is re-sampled and
    * unioned with the first pass's successful frames; payloads the
    * transcoder dropped or still couldn't convert surface as
    * `decoded = false` rows exactly like before, so failures stay
    * visible rather than silently vanishing.
    *
    * Scale shape: the transcoder is typically a `mapPartitions` over
    * an external binary/service at the same codec boundary the JDK
    * decode runs at; only the FAILED payloads' bytes flow through it,
    * and everything else takes the one-pass path. The returned Dataset
    * references `media` and the transcoder output from multiple
    * branches (first-pass frames, the failed-payload join, re-decode,
    * and the dropped-payload anti-join), so an action evaluates the
    * decode more than once and may invoke the external transcoder per
    * branch — persist `media` upstream, and make the transcoder
    * persist (or materialize) its own output, when either is
    * expensive. Deliberate trade: an internal persist here would have
    * no sound unpersist point for a lazily-returned Dataset.
    */
  def transcodeWith(media: DataFrame, k: Int,
                    transcoder: DataFrame => DataFrame,
                    frameBytes: Int = 32, batchSize: Int = 64): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = sampleFrames(media, k, frameBytes, batchSize)
    val failed = frames.where(!col("decoded"))
      .select(col("media_id"), col("reason")).distinct()
      .join(media.select(col("media_id").cast("long").as("media_id"), col("content")),
        Seq("media_id"))
    val repaired = transcoder(failed)
    require(repaired.columns.contains("media_id") && repaired.columns.contains("content"),
      s"transcoder must return (media_id, content), got ${repaired.columns.mkString(", ")}")
    val redecoded = sampleFrames(
      repaired.select(col("media_id"), col("content")), k, frameBytes, batchSize)
    // payloads the transcoder dropped keep their first-pass rejection rows
    val stillFailed = frames.where(!col("decoded")).as[SampledFrame]
      .join(repaired.select(col("media_id")).distinct(), Seq("media_id"), "left_anti")
      .as[SampledFrame]
    frames.where(col("decoded")).as[SampledFrame]
      .unionByName(redecoded).unionByName(stillFailed)
  }

  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int = 32,
                   batchSize: Int = 64): Dataset[SampledFrame] = {
    require(k > 0, s"need k > 0, got $k")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .where(col("content").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // evenly spaced source indices; k = 1 picks the first frame
        def even(n: Int): IndexedSeq[Int] =
          if (k >= n) 0 until n
          else (0 until k).map(i => (i.toLong * (n - 1) / math.max(k - 1, 1)).toInt)
        rows.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
          sampledFrames(bytes, even) match {
            case Some(frames) =>
              frames.map { case (i, img) =>
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", bos)
                SampledFrame(id, i, bos.toByteArray,
                  img.getWidth, img.getHeight, decoded = true, reason = null)
              }
            case None =>
              val len = bytes.length
              val step = math.max((len - frameBytes) / math.max(k - 1, 1), 1)
              val reason = s"no_jvm_codec:${sniffFormat(bytes)}"
              (0 until k).map { i =>
                val from = math.min(i * step, math.max(len - 1, 0))
                SampledFrame(id, i,
                  bytes.slice(from, math.min(from + frameBytes, len)),
                  -1, -1, decoded = false, reason = reason)
              }
          }
        })
      }
  }
}
