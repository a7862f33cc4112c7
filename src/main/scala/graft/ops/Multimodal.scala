package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus feature extraction shaped for a
  * 1000-executor cluster.
  *
  * The Spark-side plumbing — schema, batching, partitioning, codegen'd
  * metadata exprs — is real and tested; the codec call itself is a
  * clearly-marked STUB (this container has no image/audio libraries):
  * swap `stubDecode` for an actual decoder without touching anything
  * else.
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

  /** Content sniffing + integrity metadata as pure codegen'd expressions
    * (no decode): magic-byte format detection, byte size, digest.
    */
  def withMediaMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val magic = upper(hex(substring(col(contentCol), 1, 4)))
    df
      .withColumn("n_bytes", octet_length(col(contentCol)).cast("long"))
      .withColumn("sha", sha2(col(contentCol), 256))
      .withColumn("format",
        when(magic.startsWith("89504E47"), "png")
          .when(magic.startsWith("FFD8FF"), "jpeg")
          .when(magic.startsWith("52494646"), "riff-wav")
          .when(magic.startsWith("00000018") || magic.startsWith("00000020"), "mp4")
          .otherwise("unknown"))
  }

  /** STUB for the actual codec: a real implementation would decode the
    * image/audio payload and run a feature extractor. This deterministic
    * fake derives `dim` floats from a rolling hash of the bytes so tests
    * can assert exact plumbing behavior.
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
        // per-partition init happens HERE in a real decoder (load model,
        // open codec context); the stub needs none.
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            MediaFeatures(id, stubDecode(bytes, dim))
          }
        }
      }
  }

  /** STUB resize: a real implementation decodes, resamples to
    * `targetW`×`targetH`, and re-encodes. The deterministic fake keeps
    * the payload head and a proportional stride sample of the body so
    * output size tracks the target dimensions — exercising the real
    * plumbing (binary in/binary out through mapPartitions batches,
    * metadata columns updated).
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
          // STUB: stride-sample down to ~targetBytes, keeping the magic
          // header so format sniffing still works on the output
          val out =
            if (bytes.length <= targetBytes) bytes
            else {
              val head = bytes.take(8)
              val stride = math.max((bytes.length - 8) / (targetBytes - 8), 1)
              head ++ (8 until bytes.length by stride).take(targetBytes - 8)
                .map(bytes(_)).toArray
            }
          (id, out, targetW, targetH)
        })
      }
      .toDF("media_id", "content", "width", "height")
  }

  /** Deterministic frame sampling for video-like payloads: `k` evenly
    * spaced fixed-width byte slices per payload (a real implementation
    * would seek to keyframes). Pure exprs — no UDF.
    */
  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int = 32,
                   contentCol: String = "content"): DataFrame = {
    val n = octet_length(col(contentCol))
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("offset",
        (col("frame_idx") * greatest((n - lit(frameBytes)) / lit(math.max(k - 1, 1)), lit(1)) + lit(1))
          .cast("int"))
      .withColumn("frame", substring(col(contentCol), col("offset"), lit(frameBytes)))
      .drop("offset")
  }
}
