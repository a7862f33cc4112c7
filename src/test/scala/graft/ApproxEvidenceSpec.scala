package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantified evidence behind the rows-only q38_approx gate entry: the
  * approximate aggregates aren't hash-comparable across engines (sketch
  * internals differ), so their accuracy contracts are pinned here
  * against the exact answers on the same tables.
  */
class ApproxEvidenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 5% of the exact distinct count") {
    val l = Tables.lineitem(spark, dir)
    val row = l.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("percentile_approx(0.5, acc=1000) lands within rank-epsilon of the true median") {
    val l = Tables.lineitem(spark, dir)
    val approxP50 = l
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // rank guarantee: with accuracy=1000 the returned value's rank is
    // within ~n/1000 of the target rank; allow 1% of n as the bound
    val row = l.agg(
      count(when(col("l_extendedprice") <= approxP50, 1)).as("below"),
      count(lit(1)).as("n")).head()
    val rank = row.getLong(0).toDouble / row.getLong(1)
    assert(math.abs(rank - 0.5) <= 0.01, s"approx median at rank $rank")
  }
}
