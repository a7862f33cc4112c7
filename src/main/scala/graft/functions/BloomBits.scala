package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Fixed-size Bloom filter over STRING renderings — the file-skipping
  * membership sketch for HIGH-cardinality equality, where the bounded
  * distinct-value sets overflow and [min,max] bounds are too wide to
  * prune anything (point lookups on id-like columns: "find/erase this
  * user" on a 100 TB table).
  *
  * Determinism is the whole contract: md5(value) supplies two 64-bit
  * halves, probe i sets bit `(h1 + i*h2) mod m` (classic double
  * hashing) — any process that renders the value the same way computes
  * the same bits, so filters built at write time answer membership at
  * read time across JVMs and releases. Absent/oversubscribed filters
  * only ever degrade toward "keep" (false positives keep files, there
  * are no false negatives) — blooms can never change results, only
  * costs, the same soundness stance as every other stat.
  */
object BloomBits {

  /** 8 KiB of bits (65536) with 6 probes: ~1% false positives at ~6.8k
    * distinct values per file, degrading gracefully (not unsoundly)
    * beyond.
    */
  val DefaultBytes: Int = 8192
  val Probes: Int = 6

  private def hashes(value: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    (bb.getLong(0), bb.getLong(8))
  }

  /** Bit positions value sets/probes — shared by build and test. */
  private def positions(value: String, nBits: Int): Array[Int] = {
    val (h1, h2) = hashes(value)
    Array.tabulate(Probes) { i =>
      val h = h1 + i.toLong * h2
      (((h % nBits) + nBits) % nBits).toInt
    }
  }

  def add(bits: Array[Byte], value: String): Unit =
    positions(value, bits.length * 8).foreach { p =>
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
    }

  def mightContain(bits: Array[Byte], value: String): Boolean =
    positions(value, bits.length * 8).forall { p =>
      (bits(p >> 3) & (1 << (p & 7))) != 0
    }

  def toBase64(bits: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bits)

  def fromBase64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)
}

/** Per-group Bloom construction as a typed Aggregator — rides the same
  * per-file groupBy that collects [min,max]/null/set stats, so bloom
  * tracking adds zero extra passes over a staged commit. NULLs set no
  * bits (`IS NULL` is the null-count stat's job). The buffer is the
  * fixed byte array; merge is bitwise OR.
  */
case class BloomAgg(nBytes: Int = BloomBits.DefaultBytes)
    extends Aggregator[String, Array[Byte], Array[Byte]] {
  require(nBytes > 0 && (nBytes & (nBytes - 1)) == 0,
    s"bloom size must be a positive power of two, got $nBytes")

  override def zero: Array[Byte] = new Array[Byte](nBytes)

  override def reduce(buf: Array[Byte], in: String): Array[Byte] = {
    if (in != null) BloomBits.add(buf, in)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
