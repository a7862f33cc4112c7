package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Generated columns: declared `GENERATED ALWAYS AS (expr)` — computed
  * when a batch omits the column, VALIDATED row-by-row when supplied
  * (the synthetic null-safe equality rides the constraint enforcement),
  * backfilled on demand for pre-existing rows, and composable with
  * generated-column partitioning.
  */
class GeneratedColumnSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("omitted generated columns compute on write; supplied-but-wrong values fail pre-publish") {
    import spark.implicits._
    val dir = freshDir("mlake-gen")
    // declare before loading: create empty via a replace of zero rows
    ManifestLake.write(spark,
      Seq.empty[(String, Long, String)].toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1 (empty)
    assert(ManifestLake.addGeneratedColumn(spark, dir, "pos_bucket", LongType,
      "pos DIV 100") === 2L)
    // a batch WITHOUT the column: computed during the write
    ManifestLake.write(spark,
      (0 until 250).map(i => ("chr1", i.toLong, s"p$i")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false)                                      // v3
    val got = ManifestLake.read(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("chrom", "pos", "payload", "pos_bucket"))
    assert(got.where(col("pos_bucket") =!= (col("pos") / 100).cast("long")).count() === 0)
    assert(got.where(col("pos") === 123L).select("pos_bucket")
      .collect().head.getLong(0) === 1L)
    // a batch WITH the column and a wrong value: loud pre-publish failure
    val e = intercept[IllegalStateException] {
      ManifestLake.write(spark,
        Seq(("chr1", 500L, "bad", 99L)).toDF("chrom", "pos", "payload", "pos_bucket"),
        dir, Seq("chrom"), replace = false)
    }
    assert(e.getMessage.contains("__gen_pos_bucket"))
    assert(ManifestLake.read(spark, dir).count() === 250)
    // a batch with the CORRECT value passes
    assert(ManifestLake.write(spark,
      Seq(("chr1", 500L, "ok", 5L)).toDF("chrom", "pos", "payload", "pos_bucket"),
      dir, Seq("chrom"), replace = false) === 4L)
    // upsert with a wrong generated value also refuses; correct lands
    intercept[IllegalStateException] {
      ManifestLake.upsert(spark, dir,
        Seq(("chr1", 500L, "upd", 0L)).toDF("chrom", "pos", "payload", "pos_bucket"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
    assert(ManifestLake.upsert(spark, dir,
      Seq(("chr1", 500L, "upd", 5L)).toDF("chrom", "pos", "payload", "pos_bucket"),
      Seq("chrom"), Seq("chrom", "pos")) === 5L)
    // UPDATE that would break consistency (SET source without the
    // generated twin) refuses; a consistent SET pair lands
    intercept[IllegalStateException] {
      ManifestLake.update(spark, dir, col("pos") === 500L,
        Map("pos" -> lit(777L)))
    }
    assert(ManifestLake.update(spark, dir, col("pos") === 500L,
      Map("pos" -> lit(777L), "pos_bucket" -> lit(7L))) === 6L)
    // nondeterministic or unresolvable declarations refuse typed
    intercept[IllegalArgumentException] {
      ManifestLake.addGeneratedColumn(spark, dir, "r", DoubleType, "rand()")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.addGeneratedColumn(spark, dir, "g", LongType, "ghost + 1")
    }
    // source columns of a generated column refuse rename/drop
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "pos", "position")
    }
  }

  test("backfill rewrites existing rows once; generated PARTITION columns drive the layout") {
    import spark.implicits._
    val dir = freshDir("mlake-gen-backfill")
    ManifestLake.write(spark,
      (0 until 100).map(i => ("chr1", i.toLong, s"p$i")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), statsCols = Seq("pos"))                               // v1
    // non-empty without backfill: typed refusal
    val e = intercept[IllegalArgumentException] {
      ManifestLake.addGeneratedColumn(spark, dir, "parity", StringType,
        "CASE WHEN pos % 2 = 0 THEN 'even' ELSE 'odd' END")
    }
    assert(e.getMessage.contains("backfill"))
    assert(ManifestLake.addGeneratedColumn(spark, dir, "parity", StringType,
      "CASE WHEN pos % 2 = 0 THEN 'even' ELSE 'odd' END", backfill = true) === 2L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() === 100)
    assert(got.where(col("parity") === "even").count() === 50)
    // v1 time-travels WITHOUT the column
    assert(ManifestLake.readVersion(spark, dir, 1L).schema.fieldNames.toSeq
      === Seq("chrom", "pos", "payload"))
    // later appends compute it
    ManifestLake.write(spark, Seq(("chr1", 101L, "new")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false)                                      // v3
    assert(ManifestLake.read(spark, dir).where(col("pos") === 101L)
      .select("parity").collect().head.getString(0) === "odd")

    // generated PARTITION column: create an EMPTY table already
    // partitioned by the column, ADOPT it as generated, then append
    // batches WITHOUT it — the computed value drives the hive layout
    val dir2 = freshDir("mlake-gen-part")
    ManifestLake.write(spark,
      Seq.empty[(Long, String, String)].toDF("pos", "payload", "bucket"),
      dir2, Seq("bucket"))                                                     // v1 (empty, partitioned)
    assert(ManifestLake.addGeneratedColumn(spark, dir2, "bucket", StringType,
      "CAST(pos DIV 50 AS STRING)") === 2L)
    ManifestLake.write(spark,
      (0 until 100).map(i => (i.toLong, s"p$i")).toDF("pos", "payload"),
      dir2, Seq("bucket"), replace = false)                                    // v3
    val r2 = ManifestLake.read(spark, dir2)
    assert(r2.count() === 100)
    assert(r2.where(col("bucket") === "0").count() === 50)
    val (fs2, root2) = ManifestLake.fsFor(spark, dir2)
    val parts = ManifestLake.readManifest(fs2, root2, 3L).files
      .map(_.path.split("/")(2)).distinct.sorted
    assert(parts.toSeq === Seq("bucket=0", "bucket=1"),
      "the COMPUTED generated value must drive the partition layout")
    // partition pruning through the generated column
    assert(r2.where(col("bucket") === "1").count() === 50)
  }

  test("generated declarations survive compaction and type widening") {
    import spark.implicits._
    val dir = freshDir("mlake-gen-surv")
    ManifestLake.write(spark,
      Seq.empty[(String, Long, String, Int)].toDF("chrom", "pos", "payload", "n"),
      dir, Seq("chrom"))                                                       // v1 (empty)
    ManifestLake.addGeneratedColumn(spark, dir, "pos_bucket", LongType,
      "pos DIV 100")                                                           // v2
    ManifestLake.write(spark,
      (0 until 120).map(i => ("chr1", i.toLong, s"p$i", i)).toDF("chrom", "pos", "payload", "n"),
      dir, Seq("chrom"), replace = false)                                      // v3
    ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)              // v4
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 4L).generated ===
      Seq("pos_bucket" -> "pos DIV 100"),
      "compaction is layout-only — it must not erase generated declarations")
    // post-compaction: an omitted generated column still computes...
    ManifestLake.write(spark,
      Seq(("chr1", 500L, "x", 1)).toDF("chrom", "pos", "payload", "n"),
      dir, Seq("chrom"), replace = false)                                      // v5
    assert(ManifestLake.read(spark, dir).where(col("pos") === 500L)
      .select("pos_bucket").collect().head.getLong(0) === 5L)
    // ...and a supplied-but-wrong value still refuses
    val e = intercept[IllegalStateException] {
      ManifestLake.write(spark,
        Seq(("chr1", 600L, "bad", 1, 99L)).toDF("chrom", "pos", "payload", "n", "pos_bucket"),
        dir, Seq("chrom"), replace = false)
    }
    assert(e.getMessage.contains("__gen_pos_bucket"))
    // a metadata-only widen of an UNRELATED column keeps the declaration
    ManifestLake.widenColumnType(spark, dir, "n", LongType)                    // v6
    assert(ManifestLake.readManifest(fs, root, 6L).generated ===
      Seq("pos_bucket" -> "pos DIV 100"),
      "type widening must not erase generated declarations")
    val e2 = intercept[IllegalStateException] {
      ManifestLake.write(spark,
        Seq(("chr1", 700L, "bad", 1L, 99L)).toDF("chrom", "pos", "payload", "n", "pos_bucket"),
        dir, Seq("chrom"), replace = false)
    }
    assert(e2.getMessage.contains("__gen_pos_bucket"))
  }

  test("an upsert racing a concurrent generated-column adoption conflicts instead of publishing unvalidated rows") {
    import spark.implicits._
    val dir = freshDir("mlake-gen-race")
    // empty table already carrying the column-to-be-adopted: the one
    // shape where adoption changes NO schema, NO colMap, NO raw
    // constraints — only the effective (generated-synthetic) set
    ManifestLake.write(spark,
      Seq.empty[(String, Long, Long)].toDF("chrom", "pos", "doubled"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.raceHook.set { _ =>
      ManifestLake.addGeneratedColumn(spark, dir, "doubled", LongType,
        "pos * 2"): Unit                                                       // v2, metadata-only
    }
    val e = try intercept[IllegalStateException] {
      ManifestLake.upsert(spark, dir,
        Seq(("chr1", 3L, 999L)).toDF("chrom", "pos", "doubled"),
        Seq("chrom"), Seq("chrom", "pos"))
    } finally ManifestLake.raceHook.set(null)
    assert(e.getMessage.contains("lost its race"))
    assert(ManifestLake.read(spark, dir).count() === 0,
      "the unvalidated stage must be withdrawn, not published")
    // re-run after the adoption: validation now applies — wrong refuses,
    // right lands
    intercept[IllegalStateException] {
      ManifestLake.upsert(spark, dir,
        Seq(("chr1", 3L, 999L)).toDF("chrom", "pos", "doubled"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
    ManifestLake.upsert(spark, dir,
      Seq(("chr1", 3L, 6L)).toDF("chrom", "pos", "doubled"),
      Seq("chrom"), Seq("chrom", "pos")): Unit
    assert(ManifestLake.read(spark, dir).count() === 1)
  }
}
