package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `planes`-bit random-hyperplane (sign) sketch of an `array<float>` /
  * `array<double>` embedding: bit p = [ Σ_i w(p,i)·v_i > 0 ] with
  * pseudo-random ±1 weights w(p,i) derived from md5("p-i") — the same
  * cross-engine formula as the declarative VectorOps fold and the
  * DuckDB oracle (first hex digit ≥ 8 ⇒ +1). A null element
  * null-propagates through the fold exactly like both of those: every
  * projection becomes null, null > 0 is false, so the sketch is the
  * all-'0' bitstring.
  *
  * Why a native expression: the declarative form evaluates
  * md5(concat("p-", i)) per ROW per plane per element — ~5 million
  * digests for 5k rows at 16 planes × 64 dims — although the weight
  * matrix is CONSTANT. Here the ±1 matrix is computed once per planes
  * value (rows grown to the largest dimension seen — w(p,i) depends
  * only on (p,i), so shorter dims are prefixes) and cached; each row
  * then costs planes×dim fused multiply-adds in the same
  * index-ascending double fold order, so the bitstring is identical to
  * the declarative form (spec-asserted).
  */
case class HyperplaneSketch(child: Expression, planes: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 1024,
    s"hyperplane_sketch: planes must be in [1, 1024], got $planes")

  override def prettyName: String = "hyperplane_sketch"

  override def dataType: DataType = StringType

  private lazy val elementIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch expects array<float> or array<double>, got ${other.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneSketch.compute(input.asInstanceOf[ArrayData], planes, elementIsDouble)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSketch.compute($c, $planes, $elementIsDouble);")

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
      val d = md.digest(s"$p-${i + 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      // first hex digit = high nibble of byte 0
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
  }

  // one growing matrix per planes value (not per (planes, dim)): ragged
  // per-row array lengths would otherwise insert an entry per distinct
  // length for the life of the executor
  private val cache =
    new ConcurrentHashMap[Int, AtomicReference[Array[Array[Double]]]]()

  private def weights(planes: Int, dim: Int): Array[Array[Double]] = {
    val ref = cache.computeIfAbsent(planes,
      p => new AtomicReference(Array.tabulate(p)(weightRow(_, dim))))
    var w = ref.get()
    while (w(0).length < dim) {
      // grow geometrically so concurrent mixed-dim callers settle fast
      val target = math.max(dim, w(0).length * 2)
      ref.compareAndSet(w, Array.tabulate(planes)(weightRow(_, target)))
      w = ref.get()
    }
    w
  }

  /** Called from both interpreted eval and generated code. */
  def compute(v: ArrayData, planes: Int, elementIsDouble: Boolean): UTF8String = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) {
        // null element ⇒ every projection is null ⇒ no bit tests true
        return UTF8String.fromBytes(Array.fill(planes)('0'.toByte))
      }
      i += 1
    }
    val w = weights(planes, n)
    val bits = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0.0
      i = 0
      while (i < n) {
        val x = if (elementIsDouble) v.getDouble(i) else v.getFloat(i).toDouble
        // same index-ascending fold as the declarative aggregate()
        acc += (if (wp(i) > 0) x else -x)
        i += 1
      }
      bits(p) = if (acc > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(bits)
  }
}
