package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All K seeded MinHash hashes of one shingle in a single call:
  * element i == md5(shingle || "#i") hex — the exact per-k formula the
  * DuckDB oracle computes — but with ONE UTF8String→bytes conversion, a
  * thread-local reused MessageDigest, and no K-way concat expression
  * fan-out. Replaces K independent `md5(concat(sh, lit("#k")))` trees
  * in the signature aggregation.
  */
case class MinhashHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"minhash_hashes: k must be positive, got $k")

  override def prettyName: String = "minhash_hashes"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_hashes expects a string column, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any =
    MinhashHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashHashes =
    copy(child = newChild)
}

object MinhashHashes {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray
  private val cachedSuffixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"#$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def suffix(i: Int): Array[Byte] =
    if (i < cachedSuffixes.length) cachedSuffixes(i)
    else s"#$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val base = s.getBytes
    val md = digests.get()
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      md.reset()
      md.update(base)
      md.update(suffix(i))
      out(i) = hex(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}
