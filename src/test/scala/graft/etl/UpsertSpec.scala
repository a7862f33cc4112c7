package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Lake.upsert semantics: update-wins merge, partition isolation,
  * crash safety (same contract as CompactionSpec's), and the
  * key-uniqueness precondition.
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("upsert").toString + "/lake"
    Seq(
      ("chr1", 0L, 100, "v1-a"),
      ("chr1", 0L, 200, "v1-b"),
      ("chr2", 0L, 100, "v1-c"),
      ("chr2", 1L, 999999, "v1-d"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
      .write.partitionBy("chrom", "pos_bucket").parquet(dir)
    dir
  }

  private def readBack(dir: String): Map[(String, Long, Int), String] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("chrom"), r.getAs[Long]("pos_bucket"),
        r.getAs[Int]("pos")) -> r.getAs[String]("payload")).toMap

  private def fileNames(dir: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap(s =>
        if (s.isDirectory) walk(s.getPath) else Seq(s.getPath.toString))
    walk(new org.apache.hadoop.fs.Path(dir))
      .filter(n => n.endsWith(".parquet") && !n.contains("/.")).toSet
  }

  test("upsert: updates win, new keys append, new partitions appear, others untouched") {
    val dir = freshLake()
    val untouchedBefore = fileNames(dir).filter(_.contains("chrom=chr2"))
    val updates = Seq(
      ("chr1", 0L, 100, "v2-a"),      // overwrite existing key
      ("chr1", 0L, 300, "v2-new"),    // new key, existing partition
      ("chr3", 5L, 42, "v2-part"))    // entirely new partition
      .toDF("chrom", "pos_bucket", "pos", "payload")

    val report = Lake.upsert(spark, dir, updates)
    assert(report.map(_._1).exists(_.contains("chrom=chr1/pos_bucket=0")))
    assert(report.map(_._1).exists(_.contains("chrom=chr3/pos_bucket=5")))

    val r = readBack(dir)
    assert(r(("chr1", 0L, 100)) === "v2-a")        // replaced
    assert(r(("chr1", 0L, 200)) === "v1-b")        // survived the merge
    assert(r(("chr1", 0L, 300)) === "v2-new")      // appended
    assert(r(("chr3", 5L, 42)) === "v2-part")      // new partition
    assert(r(("chr2", 0L, 100)) === "v1-c")
    assert(r.size === 6)
    // unaffected partitions keep their exact files — never rewritten
    assert(fileNames(dir).filter(_.contains("chrom=chr2")) === untouchedBefore)
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val dir = freshLake()
    val updates = Seq(("chr1", 0L, 100, "v2-a"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
    Lake.upsert(spark, dir, updates)
    val first = readBack(dir)
    Lake.upsert(spark, dir, updates)
    assert(readBack(dir) === first)
  }

  test("a crash between verification and swap leaves the lake fully intact") {
    val dir = freshLake()
    val before = (readBack(dir), fileNames(dir))
    val boom = intercept[RuntimeException] {
      Lake.upsert(spark, dir,
        Seq(("chr1", 0L, 100, "v2-a")).toDF("chrom", "pos_bucket", "pos", "payload"),
        failpoint = _ => throw new RuntimeException("simulated crash"))
    }
    assert(boom.getMessage === "simulated crash")
    assert((readBack(dir), fileNames(dir)) === before)
    // a later clean upsert recovers past the stale temp dir
    Lake.upsert(spark, dir,
      Seq(("chr1", 0L, 100, "v2-a")).toDF("chrom", "pos_bucket", "pos", "payload"))
    assert(readBack(dir)(("chr1", 0L, 100)) === "v2-a")
  }

  test("a non-key-unique batch is rejected before anything is written") {
    val dir = freshLake()
    val before = readBack(dir)
    val dup = Seq(
      ("chr1", 0L, 100, "first"),
      ("chr1", 0L, 100, "second"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
    val err = intercept[IllegalArgumentException] { Lake.upsert(spark, dir, dup) }
    assert(err.getMessage.contains("not key-unique"))
    assert(readBack(dir) === before)
  }

  test("upsert into a missing lake path is a plain partitioned write") {
    val dir = Files.createTempDirectory("upsert-fresh").toString + "/lake"
    val report = Lake.upsert(spark, dir,
      Seq(("chr1", 0L, 100, "v1")).toDF("chrom", "pos_bucket", "pos", "payload"))
    assert(report.nonEmpty)
    assert(readBack(dir) === Map(("chr1", 0L, 100) -> "v1"))
  }

  test("upsert works at single-level (non-genomic) partitioning: fresh write then merge") {
    // regression: the fresh-lake branch hard-coded the genomic writer
    // (crashed on foreign schemas) and the swap walk assumed exactly
    // two partition levels (single-level merges were silent no-ops)
    val dir = Files.createTempDirectory("upsert-1lvl").toString + "/lake"
    def df(rows: Seq[(String, Long, String)]) =
      rows.toDF("lang", "doc_id", "payload")
    val first = Lake.upsert(spark, dir,
      df(Seq(("en", 1L, "v1"), ("fr", 2L, "v1"))),
      partitionCols = Seq("lang"), keyCols = Seq("lang", "doc_id"))
    assert(first.nonEmpty)
    val second = Lake.upsert(spark, dir,
      df(Seq(("en", 1L, "v2"), ("en", 3L, "v1"))),   // rewrite + new key
      partitionCols = Seq("lang"), keyCols = Seq("lang", "doc_id"))
    assert(second.nonEmpty)
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")) ->
        r.getAs[String]("payload")).toMap
    assert(rows === Map(
      ("en", 1L) -> "v2",   // update won the collision
      ("en", 3L) -> "v1",   // new key appended
      ("fr", 2L) -> "v1"))  // untouched partition intact
  }
}
