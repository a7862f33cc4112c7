package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed tables join AND aggregate with zero shuffle exchanges") {
    val li = graft.Tables.lineitem(spark, sf)
    val ord = graft.Tables.orders(spark, sf)
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_bkt", "o_orderkey", 8, Seq("o_orderkey"))

    // force a sort-merge join: at this size the planner would broadcast,
    // whose plan trivially has no hash exchange and proves nothing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "control precondition: must plan as SMJ, not broadcast")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no exchanges, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === li.count())

      // negative control: the same SMJ on NON-bucketed reads must shuffle
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(!Bucketing.isShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    val agged = spark.table("li_bkt")
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(Bucketing.isShuffleFree(agged))
    assert(agged.count() === li.select("l_orderkey").distinct().count())

    // negative control: grouping the bucketed table by a NON-bucket key
    // must still hash-shuffle (a plain join is no control here — AQE
    // broadcasts it at this size)
    val offKey = spark.table("li_bkt")
      .groupBy(col("l_partkey")).agg(sum(col("l_quantity")))
    assert(!Bucketing.isShuffleFree(offKey))
  }
}
