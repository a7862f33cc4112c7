package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake.compact: collapses fragmented partition directories, preserves
  * every row, and leaves well-compacted partitions untouched.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("compact merges fragmented partitions and preserves data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toString + "/lake"
    val df = (0 until 400).map { i =>
      (s"chr${i % 2 + 1}", (i % 4).toLong, i, s"payload$i")
    }.toDF("chrom", "pos_bucket", "pos", "payload")
    // 6-way repartition before partitionBy → up to 6 files per directory
    df.repartition(6).write.partitionBy("chrom", "pos_bucket").parquet(dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileCounts: Map[String, Int] = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory))
      .map(p => p.getPath.toString ->
        fs.listStatus(p.getPath).count(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
      .toMap
    val before = fileCounts
    assert(before.values.forall(_ > 1), s"fixture should be fragmented: $before")
    val expected = spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq

    val report = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(report.size === before.size) // every partition was fragmented
    assert(report.forall { case (_, b, a) => b > 1 && a === 1 })
    val after = fileCounts
    assert(after.values.forall(_ === 1))
    assert(spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq === expected)

    // idempotent: a second pass finds nothing to do
    assert(Lake.compact(spark, dir, targetBytes = 1L << 30).isEmpty)
  }
}
