package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Equivalence pins for the round-21 optimization expressions: each
  * native form must be VALUE-identical to the declarative chain it
  * replaced on the hot path — including the edge shapes (empty/short
  * docs, duplicate tokens, multi-space runs, unicode) — so swapping it
  * in can never move an oracle-gated result.
  */
class NativeOptExprSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a a a a a a a",
    "one",
    "",
    "  leading and   multi  space runs  ",
    "unicode tøkens über ålle grenzen immer wieder über ålle",
    "exactly ten tokens here to hit the boundary case now",
    "nine tokens just under the rolling span boundary here")

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("word_ngrams matches the declarative HOF form on every edge shape") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(1, 2, 3, 10)) {
      val toks = TextOps.tokens(col("text"))
      val rows = docs.select(
        col("doc_id"),
        TextOps.wordNgrams(toks, n).as("native"),
        TextOps.wordNgramsHof(toks, n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("word_ngram_hashes matches conv(substring(md5(gram),1,15),16,10)") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(2, 10)) {
      val toks = TextOps.tokens(col("text"))
      val rows = docs.select(
        col("doc_id"),
        GraftFunctions.word_ngram_hashes(toks, n).as("native"),
        transform(TextOps.wordNgramsHof(toks, n),
          g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("chain"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)),
      (Seq(1L, 2L, 3L), Seq(10L, 20L))).toDF("a", "b")
    val rows = pairs.select(
      GraftFunctions.sorted_intersect_count(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("sorted_intersect_count null array yields null") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L))").head()
    assert(r.isNullAt(0))
  }

  test("word_ngrams NULL-input divergence is pinned: native null-propagates, HOF yields empty") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val nullDoc = Seq((0L, Option.empty[String])).toDF("doc_id", "text")
    val r = nullDoc.select(
      TextOps.wordNgrams(TextOps.tokens(col("text")), 2).as("native"),
      TextOps.wordNgramsHof(TextOps.tokens(col("text")), 2).as("hof")).head()
    assert(r.isNullAt(0), "native word_ngrams must null-propagate on NULL tokens")
    assert(r.getSeq[String](1) === Seq.empty,
      "HOF reference yields an empty array on NULL tokens — documented divergence")
    // the divergence is invisible to explode()-side callers: no rows either way
    assert(nullDoc.select(explode(TextOps.wordNgrams(TextOps.tokens(col("text")), 2))).count() === 0L)
    assert(nullDoc.select(explode(TextOps.wordNgramsHof(TextOps.tokens(col("text")), 2))).count() === 0L)
  }

  test("sorted_intersect_count debug guard rejects unsorted and duplicate-bearing arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Long*): ArrayData = ArrayData.toArrayData(xs.toArray)
    // strictly ascending passes
    SortedIntersectCount.requireStrictlyAscending(arr(-3L, 0L, 7L))
    SortedIntersectCount.requireStrictlyAscending(arr())
    intercept[IllegalArgumentException] {
      SortedIntersectCount.requireStrictlyAscending(arr(5L, 3L))
    }
    intercept[IllegalArgumentException] {
      SortedIntersectCount.requireStrictlyAscending(arr(1L, 1L, 2L))
    }
  }
}
