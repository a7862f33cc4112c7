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

  test("compact hits the file-count target even when the scan bin-packs tiny files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact-target").toString + "/lake"
    // one partition directory, 12 tiny files — Spark's scan bin-packs
    // these into far fewer splits than the byte-derived target, which
    // the old coalesce-only rewrite silently undershot
    (0 until 1200).map(i => ("chr1", 0L, i, s"payload$i" * 40))
      .toDF("chrom", "pos_bucket", "pos", "payload")
      .repartition(12).write.partitionBy("chrom", "pos_bucket").parquet(dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pDir = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory))
      .head.getPath
    val bytes = fs.listStatus(pDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    // pick targetBytes so want is ~4 (strictly between 1 and filesBefore)
    val target = bytes / 4 + 1
    val want = math.ceil(bytes.toDouble / target).toInt
    assert(want > 1 && want < 12, s"fixture should target a middle count, got $want")

    val expected = spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq
    val report = Lake.compact(spark, dir, targetBytes = target)
    assert(report.size === 1)
    assert(report.head._3 === want, s"filesAfter should equal the target $want: $report")
    assert(spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq === expected)
  }

  test("inventory reports fragmentation metadata-only and agrees with compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("inventory").toString + "/lake"
    (0 until 400).map(i => (s"chr${i % 2 + 1}", (i % 4).toLong, i, s"payload$i"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
      .repartition(6).write.partitionBy("chrom", "pos_bucket").parquet(dir)

    val inv = Lake.inventory(spark, dir, targetBytes = 1L << 30).collect()
    assert(inv.length === 4) // 2 chroms x 2 buckets
    assert(inv.forall(_.getAs[Long]("n_files") > 1))
    assert(inv.forall(_.getAs[Boolean]("needs_compaction")))
    assert(inv.forall(r => r.getAs[Long]("total_bytes") >= r.getAs[Long]("max_file_bytes")))

    // compact exactly the partitions inventory flagged; a fresh
    // inventory then reports nothing left to do
    val report = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(report.map(_._1).toSet ===
      inv.map(_.getAs[String]("partition_dir")).toSet)
    val after = Lake.inventory(spark, dir, targetBytes = 1L << 30).collect()
    assert(after.forall(r => !r.getAs[Boolean]("needs_compaction")))
    assert(after.forall(_.getAs[Long]("n_files") === 1))
    // missing lake → empty inventory, not an error
    assert(Lake.inventory(spark, dir + "-nope").isEmpty)
  }

  test("partitionLeaves: parallel walk equals a serial reference walk on a 300-leaf tree") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("leafwalk").toString + "/lake"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 12 x 25 = 300 leaves, built directly on the filesystem — the walk
    // is metadata-only, so the fixture needs structure, not data
    val leaves = for { a <- 0 until 12; b <- 0 until 25 }
      yield new Path(root, s"a=$a/b=$b")
    leaves.foreach { p =>
      fs.mkdirs(p)
      fs.createNewFile(new Path(p, "part-00000.parquet"))
    }
    // hidden maintenance dirs and their contents must stay invisible
    fs.mkdirs(new Path(root, ".compact_tmp/x=1"))
    fs.mkdirs(new Path(root, "a=0/.upsert_old"))
    // the pre-parallelization walk, verbatim, as the reference
    def serial(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (kids.isEmpty) Seq(p) else kids.toSeq.flatMap(k => serial(k.getPath))
    }
    val expected = serial(root).map(_.toString).sorted
    assert(expected.length === 300)
    val found = Lake.inventory(spark, dir).collect()
      .map(_.getAs[String]("partition_dir")).toSeq.sorted
    assert(found === expected)
  }

  test("compact discovers partitions at any depth — 1-level, 3-level, and unpartitioned") {
    import spark.implicits._
    val fsConf = spark.sparkContext.hadoopConfiguration
    def parquetCount(p: String): Int = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(fsConf)
      def walk(q: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(q).map { s =>
          if (s.isDirectory && !s.getPath.getName.startsWith(".")) walk(s.getPath)
          else if (s.isFile && s.getPath.getName.endsWith(".parquet")) 1
          else 0
        }.sum
      walk(path)
    }
    val df = (0 until 200).map(i => (s"chr${i % 2 + 1}", (i % 2).toLong, i, s"p$i"))
      .toDF("chrom", "pos_bucket", "pos", "payload")

    // 1-level layout — the old walker expected exactly two levels and
    // silently returned no work here
    val one = Files.createTempDirectory("compact-1l").toString + "/lake"
    df.repartition(5).write.partitionBy("chrom").parquet(one)
    val expected1 = spark.read.parquet(one).orderBy(col("pos")).collect().toSeq
    val r1 = Lake.compact(spark, one, targetBytes = 1L << 30)
    assert(r1.nonEmpty && r1.forall { case (_, b, a) => b > 1 && a === 1 })
    assert(spark.read.parquet(one).orderBy(col("pos")).collect().toSeq === expected1)

    // 3-level layout
    val three = Files.createTempDirectory("compact-3l").toString + "/lake"
    df.withColumn("third", col("pos") % 2)
      .repartition(5).write.partitionBy("chrom", "pos_bucket", "third").parquet(three)
    val expected3 = spark.read.parquet(three).orderBy(col("pos")).collect().toSeq
    val r3 = Lake.compact(spark, three, targetBytes = 1L << 30)
    assert(r3.nonEmpty && r3.forall { case (_, b, a) => b > 1 && a === 1 })
    assert(spark.read.parquet(three).orderBy(col("pos")).collect().toSeq === expected3)

    // unpartitioned table — the root itself is the single leaf
    val flat = Files.createTempDirectory("compact-0l").toString + "/lake"
    df.repartition(5).write.parquet(flat)
    assert(parquetCount(flat) === 5)
    val expected0 = spark.read.parquet(flat).orderBy(col("pos")).collect().toSeq
    val r0 = Lake.compact(spark, flat, targetBytes = 1L << 30, clusterBy = Seq("pos"))
    assert(r0.size === 1 && r0.head._2 === 5 && r0.head._3 === 1)
    assert(parquetCount(flat) === 1)
    assert(spark.read.parquet(flat).orderBy(col("pos")).collect().toSeq === expected0)
  }

  test("a failure after write but before swap leaves the originals fully intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact-crash").toString + "/lake"
    (0 until 300).map(i => ("chr1", 0L, i, s"payload$i"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
      .repartition(5).write.partitionBy("chrom", "pos_bucket").parquet(dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def liveFiles: Set[String] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).toSeq.flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s))
      walk(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.toString)
        .filter(n => n.endsWith(".parquet") && !n.contains("/."))
        .toSet
    }
    val originals = liveFiles
    val expected = spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq

    // simulated crash between verification and swap
    val boom = intercept[RuntimeException] {
      Lake.compact(spark, dir, targetBytes = 1L << 30,
        failpoint = _ => throw new RuntimeException("simulated crash"))
    }
    assert(boom.getMessage === "simulated crash")
    assert(liveFiles === originals, "every original file must survive the crash")
    assert(spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq === expected,
      "the partition must still read back exactly (hidden temp dir ignored)")

    // a later clean pass recovers: stale temp dir is replaced, swap completes
    val report = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(report.size === 1 && report.head._3 === 1)
    assert(spark.read.parquet(dir).orderBy(col("pos")).collect().toSeq === expected)
  }
}
