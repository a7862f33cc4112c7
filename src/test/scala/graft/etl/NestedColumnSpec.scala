package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Nested-column story for the schema-evolution / DML stack over the
  * genomic lake shape (`entries: array<struct<…>>`, `meta: struct<…>`):
  * every operation either works correctly (whole struct columns are
  * ordinary top-level columns; constraint and generation EXPRESSIONS
  * may read nested fields) or refuses loudly and typed — never a
  * silent wrong answer, never a wedged table whose appends die with an
  * unresolvable-constraint analysis error.
  */
class NestedColumnSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  /** chrom-partitioned table with a struct column and an array<struct>
    * column — the genomic lake shape.
    */
  private def build(tag: String): String = {
    import spark.implicits._
    val dir = freshDir(tag)
    val df = (0 until 20)
      .map(i => (s"chr${i % 2 + 1}", i.toLong, (s"rs$i", i % 3), Seq((i.toLong, s"alt$i"))))
      .toDF("chrom", "pos", "meta", "entries")
      .select(col("chrom"), col("pos"),
        col("meta").cast("struct<rsid:string,qual:int>"),
        col("entries").cast("array<struct<apos:bigint,alt:string>>"))
    ManifestLake.write(spark, df, dir, Seq("chrom"), statsCols = Seq("pos"))
    dir
  }

  test("rename/drop/widen refuse a nested-field target loudly; dotted new names refuse") {
    val dir = build("nested-refuse")
    val e1 = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "meta.rsid", "meta.id"))
    assert(e1.getMessage.contains("field inside struct column"))
    val e2 = intercept[IllegalArgumentException](
      ManifestLake.dropColumn(spark, dir, "entries.apos"))
    assert(e2.getMessage.contains("field inside struct column"))
    val e3 = intercept[IllegalArgumentException](
      ManifestLake.widenColumnType(spark, dir, "meta.qual", LongType))
    assert(e3.getMessage.contains("field inside struct column"))
    // widening the struct column itself is not an admitted widening
    val e4 = intercept[IllegalArgumentException](
      ManifestLake.widenColumnType(spark, dir, "meta",
        org.apache.spark.sql.types.StructType(Seq())))
    assert(e4.getMessage.contains("cannot change"))
    // a dotted NEW name would be indistinguishable from a nested ref
    val e5 = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "pos", "meta.pos"))
    assert(e5.getMessage.contains("'.'"))
    val e6 = intercept[IllegalArgumentException](
      ManifestLake.addGeneratedColumn(spark, dir, "meta.derived", LongType, "pos + 1"))
    assert(e6.getMessage.contains("'.'"))
    // a dotted target whose root is NOT a column falls through to the
    // ordinary unknown-column refusal (no false nested diagnosis)
    val e7 = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "ghost.x", "y"))
    assert(e7.getMessage.contains("no column named"))
    // nothing committed: the table is untouched at v1
    assert(ManifestLake.currentVersion(spark, dir).contains(1L))
    assert(ManifestLake.read(spark, dir).count() === 20)
  }

  test("whole struct-typed columns rename and drop as ordinary top-level columns") {
    import spark.implicits._
    val dir = build("nested-structcol")
    assert(ManifestLake.renameColumn(spark, dir, "meta", "info") === 2L)
    val r = ManifestLake.read(spark, dir)
    assert(r.schema.fieldNames.toSeq === Seq("chrom", "pos", "info", "entries"))
    assert(r.where(col("info.rsid") === "rs3").count() === 1)
    // append under the new name composes with the physical indirection
    ManifestLake.write(spark,
      Seq(("chr1", 100L, ("rs100", 1), Seq((100L, "alt100"))))
        .toDF("chrom", "pos", "info", "entries")
        .select(col("chrom"), col("pos"),
          col("info").cast("struct<rsid:string,qual:int>"),
          col("entries").cast("array<struct<apos:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)                                      // v3
    assert(ManifestLake.read(spark, dir).where(col("info.rsid") === "rs100").count() === 1)
    assert(ManifestLake.dropColumn(spark, dir, "entries") === 4L)
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq ===
      Seq("chrom", "pos", "info"))
    // time travel still serves the dropped array<struct> under v3
    assert(ManifestLake.readVersion(spark, dir, 3L)
      .selectExpr("entries[0].alt").where(col("`entries[0].alt`").isNotNull).count() === 21)
  }

  test("constraints and generated columns may READ nested fields; renaming/dropping their root refuses") {
    import spark.implicits._
    val dir = build("nested-expr")
    // a constraint over a nested field enforces on appends
    ManifestLake.addConstraint(spark, dir, "qual_ok", "meta.qual >= 0")        // v2
    val bad = Seq(("chr1", 200L, ("rsX", -1), Seq((200L, "a"))))
      .toDF("chrom", "pos", "meta", "entries")
      .select(col("chrom"), col("pos"),
        col("meta").cast("struct<rsid:string,qual:int>"),
        col("entries").cast("array<struct<apos:bigint,alt:string>>"))
    val ex = intercept[IllegalStateException](
      ManifestLake.write(spark, bad, dir, Seq("chrom"), replace = false))
    assert(ex.getMessage.contains("qual_ok"))
    assert(ManifestLake.read(spark, dir).count() === 20, "violating append must not land")
    // a generated column DERIVING from a nested field computes on write
    ManifestLake.addGeneratedColumn(spark, dir, "first_apos", LongType,
      "entries[0].apos", backfill = true)                                      // v3
    ManifestLake.write(spark,
      Seq(("chr1", 300L, ("rs300", 2), Seq((300L, "g"))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<rsid:string,qual:int>"),
          col("entries").cast("array<struct<apos:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)                                      // v4
    val got = ManifestLake.read(spark, dir).where(col("pos") === 300L)
    assert(got.select("first_apos").head().getLong(0) === 300L)
    // the roots those expressions anchor at are rename/drop-locked:
    // without the lock the next append would die unresolvable forever
    val r1 = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "meta", "info"))
    assert(r1.getMessage.contains("qual_ok"))
    val r2 = intercept[IllegalArgumentException](
      ManifestLake.dropColumn(spark, dir, "entries"))
    assert(r2.getMessage.contains("first_apos"))
    // a lambda VARIABLE sharing a column's name is not a reference:
    // `exists(entries, pos -> …)` must not lock the real pos column
    ManifestLake.addConstraint(spark, dir, "has_entry",
      "exists(entries, pos -> pos.apos >= 0)")                                 // v5
    assert(ManifestLake.renameColumn(spark, dir, "pos", "position") === 6L)
    val r = ManifestLake.read(spark, dir)
    assert(r.schema.fieldNames.contains("position"))
    assert(r.count() === 21)
  }
}
