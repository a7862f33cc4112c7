package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggAndSkewSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("BoundedSortedSetAgg keeps the N smallest distinct values, sorted") {
    import spark.implicits._
    val df = Seq("g1" -> "d", "g1" -> "b", "g1" -> "b", "g1" -> "a",
      "g1" -> "c", "g1" -> "e", "g2" -> "z").toDF("k", "v")
    val bounded = udaf(BoundedSortedSetAgg(3))
    val out = df.repartition(4).groupBy("k").agg(bounded(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("g1") === Seq("a", "b", "c"))
    assert(out("g2") === Seq("z"))
  }

  test("BoundedSortedSetAgg is partitioning-invariant (bounded partials merge)") {
    import spark.implicits._
    val vals = (0 until 500).map(i => "k" -> f"v${(i * 37) % 250}%03d")
    val bounded = udaf(BoundedSortedSetAgg(5))
    val r1 = vals.toDF("k", "v").repartition(1).groupBy("k")
      .agg(bounded(col("v"))).collect()(0).getSeq[String](1)
    val r16 = vals.toDF("k", "v").repartition(16).groupBy("k")
      .agg(bounded(col("v"))).collect()(0).getSeq[String](1)
    assert(r1 === r16)
    assert(r1 === (0 until 250).map(i => f"v$i%03d").sorted.take(5))
  }

  test("BoundedSortedSetAgg works from SQL after registration") {
    import spark.implicits._
    Seq("k" -> "b", "k" -> "a").toDF("k", "v").createOrReplaceTempView("bs_in")
    val name = BoundedSortedSetAgg.register(spark, 2)
    val out = spark.sql(s"SELECT $name(v) FROM bs_in GROUP BY k")
      .collect()(0).getSeq[String](0)
    assert(out === Seq("a", "b"))
  }

  test("saltedSum matches the direct aggregate (skewed long values)") {
    import spark.implicits._
    // one hot key with 10k rows + a cold tail
    val rows = (0 until 10000).map(i => ("hot", i.toLong)) ++
      (0 until 100).map(i => (s"cold$i", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.ops.Skew.saltedSum(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }
}
