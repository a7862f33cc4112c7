package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column API for graft's native expressions.
  *
  * Use from SQL via `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `GraftFunctions.register(spark)` on an existing session), or from
  * the DataFrame DSL via the `Column` wrappers.
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "",
      "array_funcs", "4.0.0", "", "built-in")

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info(classOf[VecDot], "vec_dot", "vec_dot(a, b) - dot product of two float vectors in double precision"),
      (e: Seq[Expression]) => VecDot(e(0), e(1))),
    (FunctionIdentifier("vec_cosine"),
      info(classOf[VecCosine], "vec_cosine", "vec_cosine(a, b) - cosine similarity of two float vectors"),
      (e: Seq[Expression]) => VecCosine(e(0), e(1))),
    (FunctionIdentifier("char_shingles"),
      info(classOf[CharShingles], "char_shingles", "char_shingles(text, n) - array of character n-gram shingles"),
      (e: Seq[Expression]) => {
        val n = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"char_shingles(text, n): n must be an integer literal, got $other")
        }
        CharShingles(e(0), n)
      }),
    (FunctionIdentifier("minhash_mixes"),
      info(classOf[MinhashMixes], "minhash_mixes",
        "minhash_mixes(sh, k) - array of (a_i*h1+b_i*h2+c_i) mod 2^61-1 for i < k, " +
          "h1/h2 = the two 60-bit md5 hex-prefix bases of sh"),
      (e: Seq[Expression]) => {
        val k = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_mixes(sh, k): k must be an integer literal, got $other")
        }
        MinhashMixes(e(0), k)
      }),
    (FunctionIdentifier("deletion_hashes"),
      info(classOf[DeletionHashes], "deletion_hashes",
        "deletion_hashes(s, depth) - deduped xxhash64 ids of s's deletion neighborhood up to depth (1 or 2)"),
      (e: Seq[Expression]) => {
        val d = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"deletion_hashes(s, depth): depth must be an integer literal, got $other")
        }
        DeletionHashes(e(0), d)
      }),
    (FunctionIdentifier("hyperplane_sketch"),
      info(classOf[HyperplaneSketch], "hyperplane_sketch",
        "hyperplane_sketch(v, planes) - sign-bitstring of planes md5-derived hyperplane projections"),
      (e: Seq[Expression]) => {
        val planes = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"hyperplane_sketch(v, planes): planes must be an integer literal, got $other")
        }
        HyperplaneSketch(e(0), planes)
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      info(classOf[SortedIntersectCount], "sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A ∩ B| of two ascending-sorted duplicate-free bigint arrays"),
      (e: Seq[Expression]) => SortedIntersectCount(e(0), e(1))),
    (FunctionIdentifier("word_ngrams"),
      info(classOf[WordNgrams], "word_ngrams",
        "word_ngrams(toks, n) - space-joined rolling word n-grams; empty when fewer than n tokens"),
      (e: Seq[Expression]) => {
        val n = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"word_ngrams(toks, n): n must be an integer literal, got $other")
        }
        WordNgrams(e(0), n)
      }),
    (FunctionIdentifier("word_ngram_hashes"),
      info(classOf[WordNgramHashes], "word_ngram_hashes",
        "word_ngram_hashes(toks, n) - 60-bit md5 hex-prefix of each rolling word n-gram"),
      (e: Seq[Expression]) => {
        val n = e(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"word_ngram_hashes(toks, n): n must be an integer literal, got $other")
        }
        WordNgramHashes(e(0), n)
      }))

  /** For spark.sql.extensions: the native functions plus the SQL DML
    * parser ([[graft.etl.GraftSqlParser]] — `MERGE INTO` / `UPDATE` /
    * `DELETE` on `graft-manifest` tables; all other SQL untouched).
    */
  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectParser((session, delegate) =>
      new graft.etl.GraftSqlParser(session, delegate))
    // NAMED manifest tables (spark.sql.catalog.<name>=graft.etl.GraftCatalog):
    // spark.table(...) reads and df.writeTo(...) verbs resolve through
    // the catalog into GraftNamedTable; this rule swaps them for the
    // engine's plans/commands (SQL statements are claimed by the parser
    // above, which resolves catalog names itself)
    ext.injectResolutionRule(session =>
      new graft.etl.GraftCatalogRule(session))
    // generated-partition-column filter inference: equality/IN filters
    // on a generated partition column's base column derive the
    // partition predicate (Delta's OptimizeGeneratedColumn idiom) —
    // the 100 TB prune for tables partitioned by a derived bucket/date
    ext.injectOptimizerRule(session =>
      new graft.etl.GraftGeneratedPartitionFilter(session))
  }

  /** Imperative registration on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }

  // ---- DataFrame DSL wrappers ----
  // Resolved through the function registry (public API), so callers must
  // have run register(spark) / the extension — Similarity does this
  // automatically.

  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def vec_cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)

  def char_shingles(text: Column, n: Int): Column =
    call_function("char_shingles", text, org.apache.spark.sql.functions.lit(n))

  def minhash_mixes(sh: Column, k: Int): Column =
    call_function("minhash_mixes", sh, org.apache.spark.sql.functions.lit(k))

  def deletion_hashes(s: Column, depth: Int): Column =
    call_function("deletion_hashes", s, org.apache.spark.sql.functions.lit(depth))

  def hyperplane_sketch(v: Column, planes: Int): Column =
    call_function("hyperplane_sketch", v, org.apache.spark.sql.functions.lit(planes))

  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  def word_ngrams(toks: Column, n: Int): Column =
    call_function("word_ngrams", toks, org.apache.spark.sql.functions.lit(n))

  def word_ngram_hashes(toks: Column, n: Int): Column =
    call_function("word_ngram_hashes", toks, org.apache.spark.sql.functions.lit(n))
}

/** Entry point for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
