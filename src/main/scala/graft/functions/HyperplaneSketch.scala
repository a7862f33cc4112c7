package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `planes`-bit random-hyperplane (sign) sketch of an `array<float>`
  * embedding: bit p = [ Σ_i w(p,i)·v_i > 0 ] with pseudo-random ±1
  * weights w(p,i) derived from md5("p-i") — the same cross-engine
  * formula as the declarative VectorOps.hyperplaneSketch and the DuckDB
  * oracle (first hex digit ≥ 8 ⇒ +1).
  *
  * Why a native expression: the declarative form evaluates
  * md5(concat("p-", i)) per ROW per plane per element — ~5 million
  * digests for 5k rows at 16 planes × 64 dims — although the weight
  * matrix is CONSTANT. Here the ±1 matrix is computed once per
  * (planes, dim) shape and cached; each row then costs planes×dim fused
  * multiply-adds in the same index-ascending double fold order, so the
  * bitstring is identical to the declarative form (spec-asserted).
  */
case class HyperplaneSketch(child: Expression, planes: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 64,
    s"hyperplane_sketch: planes must be in [1, 64], got $planes")

  override def prettyName: String = "hyperplane_sketch"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch expects array<float>, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneSketch.compute(input.asInstanceOf[ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSketch.compute($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object HyperplaneSketch {

  /** w(p,i) = +1 iff the first hex digit of md5("p-" + (i+1)) is >= 8 —
    * matching the declarative form's 1-based element index (zip_with
    * over sequence(1, size)).
    */
  private def weightRow(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      md.reset()
      val d = md.digest(s"$p-${i + 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first hex digit = high nibble of byte 0
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def weights(planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dim),
      _ => Array.tabulate(planes)(p => weightRow(p, dim)))

  /** Called from both interpreted eval and generated code. */
  def compute(v: ArrayData, planes: Int): UTF8String = {
    val n = v.numElements()
    val w = weights(planes, n)
    val bits = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        // same index-ascending fold as the declarative aggregate()
        acc += (if (wp(i) > 0) v.getFloat(i).toDouble else -v.getFloat(i).toDouble)
        i += 1
      }
      bits(p) = if (acc > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(bits)
  }
}
