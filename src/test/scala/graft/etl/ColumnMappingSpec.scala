package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column mapping: rename/drop WITHOUT rewriting data files — the
  * manifest records (logical → physical) name indirection; files keep
  * their physical names forever; reads alias at the boundary, writes
  * rename batches on entry. Old versions time-travel-read under their
  * own manifest's names; a re-added logical name maps to a fresh
  * physical column so dropped data never resurrects.
  */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("rename → append under the new name → merged read; time travel serves each version's own names") {
    import spark.implicits._
    val dir = freshDir("cmap-rename")
    ManifestLake.write(spark,
      (0 until 20).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), statsCols = Seq("pos"))                               // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val filesBefore = ManifestLake.readManifest(fs, root, 1L).files.toSet

    assert(ManifestLake.renameColumn(spark, dir, "payload", "body") === 2L)
    // metadata-only: the live file set is IDENTICAL, byte for byte
    assert(ManifestLake.readManifest(fs, root, 2L).files.toSet === filesBefore)
    val r2 = ManifestLake.read(spark, dir)
    assert(r2.schema.fieldNames.toSeq === Seq("chrom", "pos", "body"))
    assert(r2.where(col("body") === "p3").count() === 1)

    // append under the NEW name: rows land in the renamed column
    ManifestLake.write(spark,
      (20 until 25).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "body"),
      dir, Seq("chrom"), replace = false, statsCols = Seq("pos"))              // v3
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.count() === 25)
    assert(r3.where(col("body") === "p22").count() === 1)
    // filters on the renamed column still push through to the scan and
    // the stats-tracked column keeps skipping (values correct)
    assert(r3.where(col("pos") >= 20L).count() === 5)

    // time travel: v1 serves the OLD name, v2+ the new
    assert(ManifestLake.readVersion(spark, dir, 1L).schema.fieldNames.toSeq
      === Seq("chrom", "pos", "payload"))
    assert(ManifestLake.readVersion(spark, dir, 1L)
      .where(col("payload") === "p3").count() === 1)
    assert(ManifestLake.readVersion(spark, dir, 2L).schema.fieldNames.toSeq
      === Seq("chrom", "pos", "body"))

    // the raw DSv1 relation would serve physical names: typed refusal
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest").load(dir).collect()
    }
    assert(e.getMessage.contains("column mapping"))

    // rename refusals: partition column, collision, reserved
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "chrom", "contig")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "body", "pos")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "body", "_change_type")
    }
  }

  test("drop is metadata-only; a re-added logical name never resurrects dropped data") {
    import spark.implicits._
    val dir = freshDir("cmap-drop")
    ManifestLake.write(spark,
      (0 until 10).map(i => (s"chr1", i.toLong, s"old$i"))
        .toDF("chrom", "pos", "note"),
      dir, Seq("chrom"))                                                       // v1
    assert(ManifestLake.dropColumn(spark, dir, "note") === 2L)
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq
      === Seq("chrom", "pos"))
    // v1 still serves the dropped column (its files are untouched)
    assert(ManifestLake.readVersion(spark, dir, 1L)
      .where(col("note") === "old3").count() === 1)
    // re-add a column with the SAME logical name via widening append
    ManifestLake.write(spark,
      Seq(("chr1", 100L, "fresh")).toDF("chrom", "pos", "note"),
      dir, Seq("chrom"), replace = false)                                      // v3
    val r = ManifestLake.read(spark, dir)
    assert(r.schema.fieldNames.toSeq === Seq("chrom", "pos", "note"))
    assert(r.where(col("note") === "fresh").count() === 1)
    assert(r.where(col("note").isNotNull).count() === 1,
      "old files' dropped data must NOT resurrect under the re-added name")
    // and the physical name underneath is fresh, not 'note'
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m3 = ManifestLake.readManifest(fs, root, 3L)
    assert(m3.colMap.get.find(_._1 == "note").get._2 !== "note")
    intercept[IllegalArgumentException] {
      ManifestLake.dropColumn(spark, dir, "chrom") // partition column
    }
  }

  test("change feed across a rename is exact, served under the head's logical names") {
    import spark.implicits._
    val dir = freshDir("cmap-feed")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a"), ("chr1", 2L, "b")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v2
    ManifestLake.write(spark, Seq(("chr2", 3L, "c")).toDF("chrom", "pos", "body"),
      dir, Seq("chrom"), replace = false)                                      // v3
    val feed = ManifestLake.readChangeFeed(spark, dir, 0L, 3L)
    assert(feed.schema.fieldNames.toSeq
      === Seq("chrom", "pos", "body", "_change_type", "_commit_version"))
    val rows = feed.orderBy(col("pos"))
      .select("pos", "body", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 3L)),
      "the rename commit contributes nothing; pre-rename rows serve under the new name")
  }

  test("upsert and delete compose with mapping; constraints enforce through the rename indirection") {
    import spark.implicits._
    val dir = freshDir("cmap-dml")
    ManifestLake.write(spark,
      (0 until 12).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v2
    // upsert keyed on logical names, updating the renamed column
    ManifestLake.upsert(spark, dir,
      Seq(("chr1", 0L, "UPDATED"), ("chr1", 500L, "NEW"))
        .toDF("chrom", "pos", "body"),
      Seq("chrom"), Seq("chrom", "pos"))                                       // v3
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.count() === 13)
    assert(r3.where(col("body") === "UPDATED").count() === 1)
    // delete by a predicate over the renamed column (rewrite path)
    ManifestLake.delete(spark, dir, col("body") === "NEW")                     // v4
    assert(ManifestLake.read(spark, dir).count() === 12)
    // metadata-only delete still fast-paths (partition predicate)
    ManifestLake.delete(spark, dir, col("chrom") === "chr2",
      changeFeed = false)                                                      // v5
    assert(ManifestLake.read(spark, dir)
      .select("chrom").distinct().collect().map(_.getString(0)).toSeq === Seq("chr1"))
    // a constraint declared on the LOGICAL name enforces on appends
    // (translated to the physical column under the hood)
    ManifestLake.addConstraint(spark, dir, "body_nonempty", "length(body) > 0") // v6
    intercept[IllegalStateException] {
      ManifestLake.write(spark, Seq(("chr1", 900L, "")).toDF("chrom", "pos", "body"),
        dir, Seq("chrom"), replace = false)
    }
    assert(ManifestLake.write(spark,
      Seq(("chr1", 900L, "ok")).toDF("chrom", "pos", "body"),
      dir, Seq("chrom"), replace = false) === 7L)
    // renaming a constrained column refuses until the constraint drops
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "body", "content")
    }
    ManifestLake.dropConstraint(spark, dir, "body_nonempty")                   // v8
    assert(ManifestLake.renameColumn(spark, dir, "body", "content") === 9L)
    assert(ManifestLake.read(spark, dir).where(col("content") === "ok").count() === 1)
  }

  test("type widening is metadata-only: old files serve the wider type; narrowing refuses") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = freshDir("cmap-widen")
    ManifestLake.write(spark,
      Seq(("chr1", 1, 1.5f), ("chr1", 2, 2.5f)).toDF("chrom", "n", "score"),
      dir, Seq("chrom"), statsCols = Seq("n"))                                 // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val before = ManifestLake.readManifest(fs, root, 1L).files.toSet
    assert(ManifestLake.widenColumnType(spark, dir, "n", LongType) === 2L)
    assert(ManifestLake.widenColumnType(spark, dir, "score", DoubleType) === 3L)
    assert(ManifestLake.readManifest(fs, root, 3L).files.toSet === before,
      "widening must move zero data files")
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("n").dataType === LongType)
    assert(r.schema("score").dataType === DoubleType)
    assert(r.where(col("n") === 2L).select("score").collect().head.getDouble(0) === 2.5)
    // appends arrive at the widened type; stats on the widened column
    // keep working (the recorded string bounds re-type)
    ManifestLake.write(spark,
      Seq(("chr1", 3L, 9.5d)).toDF("chrom", "n", "score"),
      dir, Seq("chrom"), replace = false, statsCols = Seq("n"))                // v4
    assert(ManifestLake.read(spark, dir).where(col("n") >= 2L).count() === 2)
    // time travel serves the version's own (narrow) type
    assert(ManifestLake.readVersion(spark, dir, 1L).schema("n").dataType === IntegerType)
    // narrowing / lossy changes refuse typed
    intercept[IllegalArgumentException] {
      ManifestLake.widenColumnType(spark, dir, "n", IntegerType)
    }
    intercept[IllegalArgumentException] {
      ManifestLake.widenColumnType(spark, dir, "n", DoubleType) // long->double loses ints
    }
    // composes with rename: widen the RENAMED name
    ManifestLake.renameColumn(spark, dir, "n", "count")                        // v5
    intercept[IllegalArgumentException] {
      ManifestLake.widenColumnType(spark, dir, "n", LongType) // old name gone
    }
    assert(ManifestLake.widenColumnType(spark, dir, "count",
      DecimalType(22, 0)) === 6L)
    assert(ManifestLake.read(spark, dir).schema("count").dataType === DecimalType(22, 0))
    assert(ManifestLake.read(spark, dir).where(col("count") >= 2).count() === 2)
  }

  test("addColumn is metadata-only: old files serve nulls; under mapping a re-added name gets a fresh physical column") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = freshDir("cmap-addcol")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a"), ("chr1", 2L, "b")).toDF("chrom", "pos", "note"),
      dir, Seq("chrom"))                                                       // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val before = ManifestLake.readManifest(fs, root, 1L).files.toSet
    assert(ManifestLake.addColumn(spark, dir, "score", DoubleType) === 2L)
    assert(ManifestLake.readManifest(fs, root, 2L).files.toSet === before)
    val r = ManifestLake.read(spark, dir)
    assert(r.schema.fieldNames.toSeq === Seq("chrom", "pos", "note", "score"))
    assert(r.where(col("score").isNull).count() === 2)
    // next append populates it
    ManifestLake.write(spark,
      Seq(("chr1", 3L, "c", 0.5)).toDF("chrom", "pos", "note", "score"),
      dir, Seq("chrom"), replace = false)                                      // v3
    assert(ManifestLake.read(spark, dir).where(col("score") === 0.5).count() === 1)
    // drop note, then ADD a column named note again: fresh physical,
    // no resurrection
    ManifestLake.dropColumn(spark, dir, "note")                                // v4
    assert(ManifestLake.addColumn(spark, dir, "note", StringType) === 5L)
    val r5 = ManifestLake.read(spark, dir)
    assert(r5.where(col("note").isNotNull).count() === 0,
      "re-added column must start all-null — dropped data never resurrects")
    val m5 = ManifestLake.readManifest(fs, root, 5L)
    assert(m5.colMap.get.find(_._1 == "note").get._2 !== "note")
    intercept[IllegalArgumentException] {
      ManifestLake.addColumn(spark, dir, "pos", LongType) // exists
    }
    // detail() surfaces constraints and the non-identity mapping
    ManifestLake.addConstraint(spark, dir, "pos_pos", "pos > 0")
    val d = ManifestLake.detail(spark, dir).collect().head
    assert(d.getAs[String]("constraints") === "pos_pos: pos > 0")
    assert(d.getAs[String]("column_mapping").startsWith("note->note__"))
  }

  test("compact and restore carry the mapping; replace resets it") {
    import spark.implicits._
    val dir = freshDir("cmap-life")
    ManifestLake.write(spark,
      (0 until 30).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload").repartition(6),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v2
    ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)              // v3
    val r3 = ManifestLake.read(spark, dir)
    assert(r3.schema.fieldNames.toSeq === Seq("chrom", "pos", "body"))
    assert(r3.count() === 30)
    // restore to v1: the pre-rename names come back with the data
    ManifestLake.restore(spark, dir, 1L)                                       // v4
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq
      === Seq("chrom", "pos", "payload"))
    // a replace resets mapping entirely: physical = logical again
    ManifestLake.restore(spark, dir, 3L)                                       // v5 (mapped again)
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "x")).toDF("chrom", "pos", "fresh"), dir, Seq("chrom")) // v6 replace
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 6L).colMap.isEmpty)
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq
      === Seq("chrom", "pos", "fresh"))
  }
}
