package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The cross-engine MinHash permutation family: ONE md5 per shingle,
  * K derived values by integer mixing — the classic (a·h + b) mod p
  * universal-hash construction.
  *
  *   h1  = int(md5_hex(shingle)[1..15])                (60-bit prefix)
  *   h2  = int(md5_hex(shingle)[16..30])               (next 60 bits)
  *   v_k = (A_k · h1 + B_k · h2 + C_k) mod P,  P = 2^61 - 1
  *
  * TWO independent 60-bit bases, not one: with a single base every
  * permutation is an affine function of the same value, so the events
  * "pair agrees on permutation i" and "on permutation j" correlate —
  * measured ~7× inflation of LSH band agreements on the synthetic
  * corpus. Distinct (A_k, B_k) vectors over two bases make any two
  * permutations pairwise independent, which is what banding needs.
  *
  * P is the Mersenne prime 2^61-1: big enough that a 100 TB corpus
  * (~10^9 distinct shingles) stays far from birthday saturation — a
  * 2^31 space would be fully collided at that scale, polluting min
  * ties — while every value still fits a BIGINT column. The oracle
  * side runs the identical formula with INT128 widening
  * (`(a::HUGEINT*h1 + b::HUGEINT*h2 + c) % P`); the JVM side reduces
  * exactly with Math.multiplyHigh (2^64 ≡ 8 mod P folding), no
  * BigInteger.
  *
  * This replaces the previous contract of K full seeded digests
  * (md5(sh||'#k') per k): same shuffle shape, ~K× less hashing work per
  * distinct (doc, shingle) — the dominant cost of the minhash family at
  * every scale.
  */
object Minhash {
  /** Mersenne prime 2^61 - 1. */
  val P: Long = (1L << 61) - 1

  private def md5Const(seed: String, mod: Long): Long =
    (BigInt(1, java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))) % mod).toLong

  /** Per-permutation multipliers in [1, P) and offset in [0, P):
    * derived from md5 of the permutation index, so the K coefficient
    * vectors share NO linear structure (structured constants like
    * a_k = (2k+1)·c would re-introduce the cross-permutation
    * correlation the two-base design removes). Computed in BigInt once
    * at class load — these are literals in the oracle SQL, not hot-path
    * work.
    */
  def a(k: Int): Long = md5Const(s"minhash-a#$k", P - 1) + 1

  /** Second-base multiplier in [1, P). */
  def b(k: Int): Long = md5Const(s"minhash-b#$k", P - 1) + 1

  /** Per-permutation offset in [0, P). */
  def c(k: Int): Long = md5Const(s"minhash-c#$k", P)

  /** (a · x) mod P exactly, for 0 <= a, x < P, without 128-bit types:
    * split the 122-bit product into (hi «64» lo) via multiplyHigh, fold
    * with 2^64 ≡ 8 (mod P), then one final carry fold.
    */
  def mulmod(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // signed ok: product < 2^122
    val lo = a * x                   // low 64 bits (wrapped)
    // value = hi·2^64 + lo_unsigned; split at bit 61
    val low61 = lo & P
    val rest = (hi << 3) | (lo >>> 61) // value >> 61, fits: hi < 2^58
    var r = low61 + rest               // < 2^62
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  /** (a · h1 + b · h2 + c) mod P exactly. */
  def mix(a: Long, h1: Long, b: Long, h2: Long, c: Long): Long = {
    var r = mulmod(a, h1) + mulmod(b, h2) // < 2^62
    r = (r & P) + (r >>> 61)
    if (r >= P) r -= P
    r += c // < 2^62
    if (r >= P) r - P else r
  }
}

/** All K mixed MinHash values of one shingle in a single call: one
  * UTF8String→bytes conversion, one thread-local md5 digest, K integer
  * mixes — no hex-string materialization at all on the hot path.
  */
case class MinhashMixes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= MinhashMixes.MaxK,
    s"minhash_mixes: k must be in [1, ${MinhashMixes.MaxK}], got $k")

  override def prettyName: String = "minhash_mixes"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_mixes expects a string column, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any =
    MinhashMixes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashMixes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashMixes =
    copy(child = newChild)
}

object MinhashMixes {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val md = digests.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    // hex chars 1-15 == bytes 0-6 + high nibble of byte 7; hex chars
    // 16-30 == low nibble of byte 7 + bytes 8-14 — bit-equal to the
    // oracle's ('0x'||substr(md5(sh),1,15))::BIGINT /
    // ('0x'||substr(md5(sh),16,15))::BIGINT
    var h1 = 0L
    var h2 = d(7) & 0xfL
    var i = 0
    while (i < 7) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    h1 = (h1 << 4) | ((d(7) >> 4) & 0xfL) // 60 bits — already < P
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      out(i) = Minhash.mix(as(i), h1, bs(i), h2, cs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Permutation-count ceiling: the coefficient tables below cover every
    * legal k, so the hot path never falls back to per-row BigInt/digest
    * coefficient derivation. 256 permutations is far beyond any banding
    * scheme in practice.
    */
  val MaxK = 256

  // mix constants precomputed for the full legal k range (a()/b()/c()
  // run BigInt math — fine at class load, not per row)
  private val as: Array[Long] = Array.tabulate(MaxK)(Minhash.a)
  private val bs: Array[Long] = Array.tabulate(MaxK)(Minhash.b)
  private val cs: Array[Long] = Array.tabulate(MaxK)(Minhash.c)
}
