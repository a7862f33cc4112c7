package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ManifestLake

/** Z-order clustering: the multi-dimension file-skipping layout. The
  * semantic test IS the pruning comparison — on the same data at the
  * same file count, lexicographic (x, y) clustering skips perfectly on
  * x and not at all on y, while z-order skips on BOTH — plus content
  * invariance (the z-value is transient layout, never data).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def filesRead(filtered: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val n = filtered.collect().length.toLong
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    (n, scan.metrics("numFiles").value)
  }

  test("z-order prunes on BOTH dimensions; lexicographic only on the first") {
    import spark.implicits._
    // a 100x100 independent grid: x and y uncorrelated, both uniform
    val df = (0 until 10000).map { i =>
      ((i % 100).toLong * 10, (i / 100).toLong * 10, s"p$i")
    }.toDF("x", "y", "payload")
    val nFiles = 16

    val lexDir = freshDir("zorder-lex")
    ManifestLake.write(spark,
      df.repartitionByRange(nFiles, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")),
      lexDir, Seq.empty, statsCols = Seq("x", "y"))
    val zDir = freshDir("zorder-z")
    ManifestLake.write(spark, ZOrder.cluster(df, Seq("x", "y"), nFiles),
      zDir, Seq.empty, statsCols = Seq("x", "y"))

    val (fsL, rootL) = ManifestLake.fsFor(spark, lexDir)
    val (fsZ, rootZ) = ManifestLake.fsFor(spark, zDir)
    assert(ManifestLake.readManifest(fsL, rootL, 1L).files.length === nFiles)
    assert(ManifestLake.readManifest(fsZ, rootZ, 1L).files.length === nFiles)

    // y-range filter (5% of the domain): lexicographic files all span
    // the full y range — zero skipping; z-order reads a strict subset
    def yQuery(dir: String) = ManifestLake.read(spark, dir)
      .where(col("y") >= 400L && col("y") < 450L)
    val (nyL, fyL) = filesRead(yQuery(lexDir))
    val (nyZ, fyZ) = filesRead(yQuery(zDir))
    assert(nyL === 500 && nyZ === 500)
    assert(fyZ < fyL,
      s"z-order must out-prune lexicographic on the second dimension: z=$fyZ lex=$fyL")
    assert(fyZ < nFiles, s"z-order must actually skip on y: read $fyZ of $nFiles")

    // x-range filter: z-order still prunes (coarser than lex's perfect
    // split, but a strict subset of the table)
    val (nxZ, fxZ) = filesRead(ManifestLake.read(spark, zDir)
      .where(col("x") >= 400L && col("x") < 450L))
    assert(nxZ === 500)
    assert(fxZ < nFiles, s"z-order must skip on x too: read $fxZ of $nFiles")

    // layout only — content identical across both layouts
    assert(ManifestLake.read(spark, zDir).select("x", "y", "payload")
      .except(df.select("x", "y", "payload")).isEmpty)
    assert(df.select("x", "y", "payload")
      .except(ManifestLake.read(spark, zDir).select("x", "y", "payload")).isEmpty)
  }

  test("compact(zOrderBy) rewrites under the manifest commit with stats maintained") {
    import spark.implicits._
    val dir = freshDir("zorder-compact")
    val df = (0 until 4000).map { i =>
      ((i % 2).toString, (i % 64).toLong, (i / 64).toLong, s"p$i")
    }.toDF("part", "a", "b", "payload")
    ManifestLake.write(spark, df.repartition(8), dir, Seq("part"),
      statsCols = Seq("a", "b"))
    val report = ManifestLake.compact(spark, dir,
      targetBytes = Long.MaxValue, zOrderBy = Seq("a", "b"))
    assert(report.nonEmpty && report.forall(_._3 == 1))
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m = ManifestLake.readManifest(fs, root, 2L)
    assert(m.files.forall(f => f.stats.contains("a") && f.stats.contains("b")),
      "compaction must re-collect the tracked stats")
    assert(ManifestLake.read(spark, dir).select("part", "a", "b", "payload")
      .except(df).isEmpty)
    assert(ManifestLake.read(spark, dir).count() === 4000)
    // guards: unknown columns and conflicting layout choices are loud
    intercept[IllegalArgumentException] {
      ManifestLake.compact(spark, dir, zOrderBy = Seq("nope", "a"))
    }
    intercept[IllegalArgumentException] {
      ManifestLake.compact(spark, dir, clusterBy = Seq("a"), zOrderBy = Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      ManifestLake.compact(spark, dir, zOrderBy = Seq("part", "a"))
    }
  }

  test("type and arity guards; nulls take the low curve end") {
    import spark.implicits._
    val df = Seq((1L, "s", 2.0)).toDF("n", "s", "d")
    intercept[IllegalArgumentException] { ZOrder.zvalue(df, Seq("n", "s")) }
    intercept[IllegalArgumentException] { ZOrder.zvalue(df, Seq("n")) }
    intercept[IllegalArgumentException] { ZOrder.zvalue(df, Seq("n", "d"), bits = 32) }
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(9L)), (Some(5L), None))
      .toDF("a", "b")
    val z = withNulls.select(ZOrder.zvalue(withNulls, Seq("a", "b")).as("z"))
      .as[Long].collect()
    assert(z.length === 3 && z.forall(_ >= 0L))
  }

  test("cluster() never clobbers a user column named __zvalue") {
    import spark.implicits._
    // a table that happens to carry the transient key's name: layout-only
    // means THIS column's data must survive the re-layout untouched
    val df = Seq((1L, 10L, "keep-me"), (2L, 20L, "and-me"))
      .toDF("a", "b", "__zvalue")
    val out = ZOrder.cluster(df, Seq("a", "b"), numFiles = 1)
    assert(out.columns.toSeq === df.columns.toSeq)
    assert(out.select("__zvalue").as[String].collect().sorted
      === Array("and-me", "keep-me"))
  }
}
