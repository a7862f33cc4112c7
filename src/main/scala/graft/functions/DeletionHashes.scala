package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of a string's deletion neighborhood (the string plus
  * every 1-char — and at depth 2 every 2-char — deletion), deduped, as
  * a native expression.
  *
  * Semantically this replaces the declarative
  * `explode(array_distinct(concat(array(s), transform(...), flatten(transform(...)))))
  *  → xxhash64(variant)` chain in FuzzyJoin: higher-order functions
  * evaluate INTERPRETED per element, and at depth 2 a 20-char key's
  * ~200 variants × (3 substrs + concat + per-element closure) made
  * neighborhood generation ~90% of the fuzzy-join wall (3.5s of q86's
  * 4.3s at sf0.1 was the full side's 1.6M-variant explode). Here each
  * variant is a byte-range skip over the UTF8 payload hashed in place
  * — no per-variant string materializes at all; the blocking join only
  * ever needed the variants' IDENTITY, not their text. A hash collision
  * can only ADD a candidate pair, and every candidate passes FuzzyJoin's
  * exact levenshtein verify, so exactness is untouched.
  *
  * Deletions are CHARACTER-level (a deleted char skips its full UTF-8
  * byte run), preserving the SymSpell guarantee — strings within
  * char-level edit distance d share a depth-d deletion variant — for
  * multibyte text, matching the substr semantics of the HOF chain this
  * replaces.
  */
case class DeletionHashes(child: Expression, depth: Int) extends UnaryExpression {
  require(depth == 1 || depth == 2, s"depth must be 1 or 2, got $depth")

  override def prettyName: String = "deletion_hashes"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_hashes expects a string column, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any =
    DeletionHashes.compute(input.asInstanceOf[UTF8String], depth)

  // one static call — the loop body lives in compiled Scala, the stage
  // stays whole-stage-codegen'd around it (freshName discipline as per
  // CharShingles: no fixed locals)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeletionHashes.compute($c, $depth);")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

object DeletionHashes {

  // same seed family as Spark's xxhash64 default — any fixed seed works,
  // both join sides use this expression
  private final val Seed = 42L

  /** All deduped deletion-neighborhood hashes of `s` up to `depth`. */
  def compute(s: UTF8String, depth: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char start offsets (offs(k) = byte offset of char k; offs(nc) = len)
    var nc = 0
    var p = 0
    while (p < nBytes) {
      p += UTF8String.numBytesForFirstByte(bytes(p))
      nc += 1
    }
    val offs = new Array[Int](nc + 1)
    p = 0
    var k = 0
    while (p < nBytes) {
      offs(k) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      k += 1
    }
    offs(nc) = nBytes

    val count = 1 + nc + (if (depth == 2 && nc >= 2) nc * (nc - 1) / 2 else 0)
    val hashes = new Array[Long](count)
    var m = 0
    hashes(m) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, nBytes, Seed)
    m += 1

    val buf = new Array[Byte](nBytes)
    // single deletions: prefix + suffix around char i's byte run
    var i = 0
    while (i < nc) {
      val pre = offs(i)
      val sufLen = nBytes - offs(i + 1)
      System.arraycopy(bytes, 0, buf, 0, pre)
      System.arraycopy(bytes, offs(i + 1), buf, pre, sufLen)
      hashes(m) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pre + sufLen, Seed)
      m += 1
      i += 1
    }
    // double deletions: skip char i's and char j's byte runs (i < j)
    if (depth == 2 && nc >= 2) {
      i = 0
      while (i < nc - 1) {
        val pre = offs(i)
        System.arraycopy(bytes, 0, buf, 0, pre)
        var j = i + 1
        while (j < nc) {
          val midLen = offs(j) - offs(i + 1)
          System.arraycopy(bytes, offs(i + 1), buf, pre, midLen)
          val sufLen = nBytes - offs(j + 1)
          System.arraycopy(bytes, offs(j + 1), buf, pre + midLen, sufLen)
          hashes(m) = XXH64.hashUnsafeBytes(
            buf, Platform.BYTE_ARRAY_OFFSET, pre + midLen + sufLen, Seed)
          m += 1
          j += 1
        }
        i += 1
      }
    }

    // dedup (repeated characters make duplicate variants): sort + sweep
    java.util.Arrays.sort(hashes, 0, m)
    var uniq = 0
    var q = 0
    while (q < m) {
      if (q == 0 || hashes(q) != hashes(q - 1)) {
        hashes(uniq) = hashes(q)
        uniq += 1
      }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, uniq))
  }
}
