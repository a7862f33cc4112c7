package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector primitives over `array<float>` embedding
  * columns — UDF-free (zip_with/aggregate are codegen-friendly Catalyst
  * expressions, and the same fold is expressible in ANSI SQL).
  *
  * Determinism contract: elements are widened float→double (exact), the
  * reduction is a LEFT FOLD in index order with initial 0.0 — IEEE
  * addition applied in a fixed order is bit-reproducible across engines,
  * unlike parallel/tree reductions.
  */
object VectorOps {

  /** Elementwise product in double precision. */
  private def products(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))

  /** dot(a, b) as a declarative index-ascending left fold — the readable
    * reference implementation of the numeric contract. Higher-order
    * functions are interpreted (no codegen), so the hot paths use the
    * bit-identical native expression instead; OpsSpec asserts equality.
    */
  private[ops] def dotFold(a: Column, b: Column): Column =
    aggregate(products(a, b), lit(0.0), (acc, p) => acc + p)

  /** dot(a, b) — native codegen'd loop, same fold order as dotFold. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Fused single-pass cosine (native expression). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_cosine(a, b)

  /** Deterministic random-hyperplane (sign) sketch for cosine LSH:
    * bit p = [ sum_i w(p,i) * v_i > 0 ] with pseudo-random weights
    * w(p,i) = ±1 derived from md5("p-i") — reproducible in any engine
    * with md5, no RNG state to ship. Native expression: the declarative
    * form below re-derives the CONSTANT weight matrix by md5 per row
    * per element (millions of digests per scan); the native one caches
    * it per (planes, dim) and fuses the projections (bit-identical,
    * spec-asserted).
    */
  def hyperplaneSketch(v: Column, planes: Int): Column =
    graft.functions.GraftFunctions.hyperplane_sketch(v, planes)

  /** The readable declarative reference of the sketch contract — used
    * by the equality spec, not the hot path.
    */
  private[ops] def hyperplaneSketchFold(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val signedTerms = zip_with(v, sequence(lit(1), size(v)), (x, i) => {
        val w = substring(md5(concat(lit(s"$p-"), i.cast("string"))), 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f")
        when(w, x.cast("double")).otherwise(-x.cast("double"))
      })
      val proj = aggregate(signedTerms, lit(0.0), (acc, t) => acc + t)
      when(proj > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }
}
