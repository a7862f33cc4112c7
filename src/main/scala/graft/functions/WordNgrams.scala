package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling word n-grams over a token array, as ONE codegen'd pass.
  *
  * Bit-identical to the declarative reference
  * `TextOps.wordNgramsHof(toks, n)` — grams are the space-joined token
  * runs at every start offset, fewer than `n` tokens yields an EMPTY
  * array (never a truncated gram), and null tokens are skipped exactly
  * like `concat_ws` skips them. Why native: the HOF form
  * (`transform(sequence(...), i -> concat_ws(" ", element_at...))`)
  * evaluates INTERPRETED — lambda-variable boxing per element, n
  * `element_at` walks per gram — and profiled at ~8 ms/doc on ~50-token
  * documents (40+ s of executor CPU per corpus pass at sf0.1), with the
  * span queries paying it twice.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def prettyName: String = "word_ngrams"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // one materialization of the token refs; grams then re-slice it
    val ts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      System.arraycopy(ts, i, parts, 0, n)
      // concatWs skips null inputs — same semantics as the HOF form's
      // concat_ws over element_at
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The 60-bit md5 hex-prefix values of the rolling word n-grams, in ONE
  * codegen'd pass — the fused form of
  * `transform(word_ngrams(toks, n), g -> conv(substring(md5(g), 1, 15), 16, 10))`
  * the span-dedup operators shuffle on. Value-identical to that chain
  * (md5 over the gram's UTF-8 bytes; hex chars 1-15 = bytes 0-6 plus
  * the high nibble of byte 7, the same extraction the MinHash base
  * uses), without materializing the gram string, the 32-char hex
  * string, or the conv decimal string per span.
  */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngram_hashes: n must be >= 1, got $n")

  override def prettyName: String = "word_ngram_hashes"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes expects array<string>, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordNgramHashes.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object WordNgramHashes {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    // token bytes copied out ONCE per row, not once per overlapping gram
    val bs = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bs(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      md.reset()
      // concat_ws semantics: null tokens are skipped along with their
      // separator — join the non-null parts with a single space
      var first = true
      var j = 0
      while (j < n) {
        val t = bs(i + j)
        if (t != null) {
          if (!first) md.update(' '.toByte)
          md.update(t)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // hex chars 1-15 == bytes 0-6 + high nibble of byte 7 — bit-equal
      // to conv(substring(md5(g), 1, 15), 16, 10)
      var h = 0L
      var b = 0
      while (b < 7) {
        h = (h << 8) | (d(b) & 0xffL)
        b += 1
      }
      out(i) = (h << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }
}
