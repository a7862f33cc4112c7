package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter file skipping — the HIGH-cardinality membership stat:
  * point lookups on id-like columns where every file's [min,max] spans
  * the whole domain (interleaved ids) and the bounded value sets
  * overflow. Pins: strictly-fewer-files on point lookups, exhaustive
  * result soundness (present AND absent keys), maintenance through
  * compaction and delete, vacuum keeping referenced sidecars, and
  * composition with column mapping.
  */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def scanOf(plan: SparkPlan): Seq[FileSourceScanExec] = {
    val here = plan match {
      case s: FileSourceScanExec
        if s.relation.location.isInstanceOf[ManifestFileIndex] => Seq(s)
      case _ => Seq.empty
    }
    here ++ (plan.children ++ plan.subqueries).flatMap(scanOf)
  }

  private def lookupFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val n = df.collect().length.toLong
    (n, scanOf(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum)
  }

  test("point lookups on an interleaved id scan strictly fewer files; every key exact, absent keys empty") {
    import spark.implicits._
    val dir = freshDir("mlake-bloom")
    // ids SHUFFLED across files: every file's [min,max] covers ~the
    // whole domain, so bounds prune nothing and the 2000 distinct
    // values overflow the 24-entry value-set cap — only the bloom bites
    val df = (0 until 2000).map(i => ("chr1", i.toLong, s"user-$i"))
      .toDF("chrom", "pos", "uid")
      .repartition(10) // hash-interleaves ids across 10 files
    ManifestLake.write(spark, df, dir, Seq("chrom"),
      statsCols = Seq("pos"), bloomCols = Seq("uid", "pos"))
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m = ManifestLake.readManifest(fs, root, 1L)
    assert(m.bloomCols.toSet === Set("uid", "pos"))
    val total = m.files.length
    assert(total === 10)
    assert(m.files.forall(_.bloom.isDefined), "every staged file carries a bloom ref")

    // exhaustive soundness: every present key returns exactly its row
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      var prunedAtLeastOnce = false
      (0 until 2000 by 97).foreach { i =>
        val (n, files) = lookupFiles(
          ManifestLake.read(spark, dir).where(col("uid") === s"user-$i"))
        assert(n === 1L, s"user-$i must be found exactly once")
        if (files < total) prunedAtLeastOnce = true
      }
      assert(prunedAtLeastOnce, "bloom skipping never pruned a single lookup")
      // a typical lookup prunes MOST files (10 files ≈ 200 ids each;
      // 1% fp on 9 non-owners → overwhelmingly 1-2 files scanned)
      val (_, f1) = lookupFiles(
        ManifestLake.read(spark, dir).where(col("uid") === "user-1234"))
      assert(f1 <= 3, s"expected <= 3 files for a point lookup, scanned $f1 of $total")
      // absent keys: zero rows, and typically zero files
      val (n0, _) = lookupFiles(
        ManifestLake.read(spark, dir).where(col("uid") === "user-99999"))
      assert(n0 === 0L)
      // IN over present + absent values stays exact
      val (nIn, _) = lookupFiles(ManifestLake.read(spark, dir)
        .where(col("uid").isin("user-5", "user-1999", "ghost")))
      assert(nIn === 2L)
      // the bloom on a NUMERIC column prunes too (typed rendering parity)
      val (nNum, fNum) = lookupFiles(
        ManifestLake.read(spark, dir).where(col("pos") === 777L))
      assert(nNum === 1L)
      assert(fNum < total, "numeric bloom must prune (bounds span everything)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("bloom tracking survives compaction, delete rewrites, vacuum, and column rename") {
    import spark.implicits._
    val dir = freshDir("mlake-bloom-life")
    val df = (0 until 1000).map(i => ("chr1", i.toLong, s"u$i"))
      .toDF("chrom", "pos", "uid").repartition(8)
    ManifestLake.write(spark, df, dir, Seq("chrom"), bloomCols = Seq("uid")) // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)

    // appends MAINTAIN tracking without re-declaring it
    ManifestLake.write(spark,
      Seq(("chr1", 5000L, "u5000")).toDF("chrom", "pos", "uid"),
      dir, Seq("chrom"), replace = false)                                    // v2
    val m2 = ManifestLake.readManifest(fs, root, 2L)
    assert(m2.bloomCols === Seq("uid"))
    assert(m2.files.forall(_.bloom.isDefined))

    // compaction re-collects blooms for the rewritten files
    ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)            // v3
    val m3 = ManifestLake.readManifest(fs, root, 3L)
    assert(m3.files.forall(_.bloom.isDefined), "compaction must maintain blooms")
    assert(ManifestLake.read(spark, dir).where(col("uid") === "u5000").count() === 1)

    // delete rewrite maintains them; the lookup stays exact
    ManifestLake.delete(spark, dir, col("uid") === "u17")                    // v4
    val m4 = ManifestLake.readManifest(fs, root, 4L)
    assert(m4.files.forall(_.bloom.isDefined))
    assert(ManifestLake.read(spark, dir).where(col("uid") === "u17").count() === 0)
    assert(ManifestLake.read(spark, dir).where(col("uid") === "u18").count() === 1)

    // vacuum keeps the sidecars kept versions reference
    val refs = m4.files.flatMap(_.bloom).distinct
    ManifestLake.vacuum(spark, dir, keepVersions = 1)
    refs.foreach(r => assert(fs.exists(new org.apache.hadoop.fs.Path(root, r)),
      s"kept version's bloom sidecar must survive vacuum: $r"))
    assert(ManifestLake.read(spark, dir).where(col("uid") === "u42").count() === 1)

    // rename the bloom-tracked column: lookups under the NEW name still
    // resolve (physical bits unchanged, predicate pushes through alias)
    ManifestLake.renameColumn(spark, dir, "uid", "user_id")                  // v5+
    val r = ManifestLake.read(spark, dir)
    assert(r.where(col("user_id") === "u42").count() === 1)
    assert(r.where(col("user_id") === "ghost").count() === 0)
  }

  test("type widening never manufactures bloom false negatives; rendering-stable widening keeps skipping") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // int ids bloom-tracked, interleaved so only the bloom can prune
    def build(tag: String): String = {
      val dir = freshDir(tag)
      val df = (0 until 1000).map(i => ("chr1", i, s"p$i"))
        .toDF("chrom", "id", "payload").repartition(8)
      ManifestLake.write(spark, df, dir, Seq("chrom"), bloomCols = Seq("id"))
      dir
    }
    // int -> long renders identically: tracking survives, skipping lives
    val dirA = build("mlake-bloom-widen-a")
    ManifestLake.widenColumnType(spark, dirA, "id", LongType)
    val (fsA, rootA) = ManifestLake.fsFor(spark, dirA)
    assert(ManifestLake.readManifest(fsA, rootA, 2L).bloomCols === Seq("id"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (nA, fA) = lookupFiles(
        ManifestLake.read(spark, dirA).where(col("id") === 777L))
      assert(nA === 1L, "post-widen lookup must stay exact")
      assert(fA < 8, "rendering-stable widening must keep bloom skipping")
      // int -> double renders "5" as "5.0": the stale bits would skip
      // files HOLDING the value — tracking must drop, lookups stay exact
      val dirB = build("mlake-bloom-widen-b")
      ManifestLake.widenColumnType(spark, dirB, "id", DoubleType)
      val (fsB, rootB) = ManifestLake.fsFor(spark, dirB)
      assert(ManifestLake.readManifest(fsB, rootB, 2L).bloomCols.isEmpty,
        "a rendering-changing widen must untrack the bloom column")
      val (nB, _) = lookupFiles(
        ManifestLake.read(spark, dirB).where(col("id") === 777.0))
      assert(nB === 1L,
        "the widened lookup must find its row — a stale bloom probe would skip it")
      assert(ManifestLake.read(spark, dirB).where(col("id") === 99999.0).count() === 0L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("float->double widening strips stale float-rendered min/max (skipping can never undershoot the served values)") {
    import spark.implicits._
    import org.apache.spark.sql.types.DoubleType
    val dir = freshDir("mlake-widen-stats")
    // 1.1f's exact binary value is 1.10000002384… — ABOVE the double
    // its shortest rendering "1.1" casts to. A post-widen predicate
    // `score > 1.1` matches the served row, but the stale recorded max
    // ("1.1") would prove the file out and silently drop it.
    val df = Seq(("chr1", 1L, 1.1f), ("chr1", 2L, 0.5f))
      .toDF("chrom", "pos", "score")
    ManifestLake.write(spark, df, dir, Seq("chrom"),
      statsCols = Seq("pos", "score"))
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 1L).files.exists(_.stats.contains("score")))
    ManifestLake.widenColumnType(spark, dir, "score", DoubleType)
    val m2 = ManifestLake.readManifest(fs, root, 2L)
    assert(m2.files.forall(f => !f.stats.contains("score") &&
      !f.valueSets.contains("score")),
      "float-rendered bounds are unsound under the double reader — strip them")
    assert(m2.files.exists(_.stats.contains("pos")),
      "other columns' stats must survive the widen")
    val got = ManifestLake.read(spark, dir).where(col("score") > 1.1)
    assert(got.count() === 1L,
      "the 1.1f row serves as 1.10000002… > 1.1 and must not be skipped away")
    assert(got.collect().head.getLong(1) === 1L)
  }
}
