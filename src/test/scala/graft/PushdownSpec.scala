package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the scan-pushdown properties the engine
  * relies on at scale (the .explain audit, as executable tests).
  */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("filters and projection reach the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .where(col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_discount"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_discount,0.05)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_discount:double>"),
      s"projection not pruned:\n$plan")
  }

  test("MIN/MAX/COUNT aggregates push down to parquet footers when enabled") {
    // aggregate pushdown is a DSv2 feature: route parquet through v2
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevAgg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(min(col("l_shipdate")), max(col("l_shipdate")), count(lit(1)))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"aggregate not pushed:\n$plan")
      assert(df.collect()(0).getLong(2) === 6000L)
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevAgg)
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }

  test("partition pruning on the hive-partitioned lake layout") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("prune").toString
    Seq(("a", 1L, 10), ("b", 2L, 20), ("c", 3L, 30))
      .toDF("chrom", "pos_bucket", "pos")
      .write.mode("overwrite").partitionBy("chrom", "pos_bucket").parquet(out)
    val q = spark.read.parquet(out).where(col("chrom") === "b")
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must be INSIDE the PartitionFilters bracket — a bare
    // 'PartitionFilters: []' metadata line appears on every partitioned
    // scan and would make a contains-only check vacuous
    assert("PartitionFilters: \\[[^\\]]*chrom[^\\]]*= b".r.findFirstIn(plan).isDefined,
      s"chrom predicate not in PartitionFilters:\n$plan")
    assert(q.count() === 1)
  }
}
