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

  test("drop refuses a nested-field target; deep/invalid nested shapes refuse; dotted new names refuse") {
    val dir = build("nested-refuse")
    // nested DROP exists (round 17) — but an UNKNOWN nested path still
    // refuses loudly (the last-field refusal is pinned in the
    // dedicated drop test below, where commits are expected)
    val e2 = intercept[IllegalArgumentException](
      ManifestLake.dropColumn(spark, dir, "entries.ghost"))
    assert(e2.getMessage.contains("no field named"), e2.getMessage)
    // rename/widen reach ANY depth through struct/array<struct>
    // layers (round 16) — but a path through a NON-struct still
    // refuses loudly with the shape it hit
    val e1 = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "meta.rsid.x", "y"))
    assert(e1.getMessage.contains("not a struct or array<struct>"),
      e1.getMessage)
    val e3 = intercept[IllegalArgumentException](
      ManifestLake.widenColumnType(spark, dir, "pos.low", LongType))
    assert(e3.getMessage.contains("not a"), e3.getMessage)
    // a nested rename to a dotted name refuses
    val e3b = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "meta.rsid", "a.b"))
    assert(e3b.getMessage.contains("plain field name"))
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

  test("nested-field RENAME and WIDEN one level in are metadata-only: reads, writes, DML, time travel, constraints") {
    import spark.implicits._
    val dir = build("nested-evolve")
    // rename meta.rsid -> meta.id (struct) and entries.apos -> entries.position
    // (array<struct>): zero data files move
    assert(ManifestLake.renameColumn(spark, dir, "meta.rsid", "id") === 2L)
    assert(ManifestLake.renameColumn(spark, dir, "entries.apos", "position") === 3L)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 3L).files.map(_.path).toSet ===
      ManifestLake.readManifest(fs, root, 1L).files.map(_.path).toSet,
      "nested renames must move zero data files")
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("meta").dataType.catalogString === "struct<id:string,qual:int>")
    assert(r.where(col("meta.id") === "rs7").count() === 1)
    assert(r.selectExpr("entries[0].position").where(col("`entries[0].position`") === 7L)
      .count() === 1)
    // time travel serves v1 under the ORIGINAL field names
    val v1 = ManifestLake.readVersion(spark, dir, 1L)
    assert(v1.schema("meta").dataType.catalogString === "struct<rsid:string,qual:int>")
    // appends arrive under the NEW names and land physically uniform
    ManifestLake.write(spark,
      Seq(("chr1", 100L, ("rs100", 3), Seq((100L, "alt100"))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<id:string,qual:int>"),
          col("entries").cast("array<struct<position:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)                                      // v4
    assert(ManifestLake.read(spark, dir).where(col("meta.id") === "rs100").count() === 1)
    // constraints written against the RENAMED field enforce on appends
    ManifestLake.addConstraint(spark, dir, "qual_ok", "meta.qual >= 0")        // v5
    val bad = Seq(("chr2", 999L, ("rsbad", -5), Seq((1L, "x"))))
      .toDF("chrom", "pos", "meta", "entries")
      .select(col("chrom"), col("pos"),
        col("meta").cast("struct<id:string,qual:int>"),
        col("entries").cast("array<struct<position:bigint,alt:string>>"))
    val ex = intercept[IllegalStateException](
      ManifestLake.write(spark, bad, dir, Seq("chrom"), replace = false))
    assert(ex.getMessage.contains("qual_ok"))
    // DML across the rename: upsert + DV delete + merge read-back exact
    ManifestLake.upsert(spark, dir,
      Seq(("chr1", 0L, ("rs0U", 9), Seq((0L, "altU"))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<id:string,qual:int>"),
          col("entries").cast("array<struct<position:bigint,alt:string>>")),
      Seq("chrom"), Seq("chrom", "pos"))                                       // v6
    val up = ManifestLake.read(spark, dir).where(col("pos") === 0L)
    assert(up.select("meta.id").head().getString(0) === "rs0U")
    ManifestLake.delete(spark, dir, col("meta.id") === "rs3",
      deletionVectors = true)                                                  // v7
    assert(ManifestLake.read(spark, dir).where(col("meta.id") === "rs3").count() === 0)
    // the change feed serves logical nested names end to end
    val feed = ManifestLake.readChangeFeed(spark, dir, fromV = 5L, toV = 7L)
    assert(feed.schema("meta").dataType.catalogString === "struct<id:string,qual:int>")
    assert(feed.where(col("_change_type") === "delete")
      .select("meta.id").collect().map(_.getString(0)).toSeq === Seq("rs3"))
    // nested WIDEN: meta.qual int -> long, metadata-only; old files
    // up-cast at scan, new appends land wide
    assert(ManifestLake.widenColumnType(spark, dir, "meta.qual", LongType) === 8L)
    val rw = ManifestLake.read(spark, dir)
    assert(rw.schema("meta").dataType.catalogString === "struct<id:string,qual:bigint>")
    assert(rw.select(sum(col("meta.qual"))).head().getLong(0) >= 0L)
    ManifestLake.write(spark,
      Seq(("chr2", 200L, ("rs200", 7000000000L), Seq((2L, "w"))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<id:string,qual:bigint>"),
          col("entries").cast("array<struct<position:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)                                      // v9
    assert(ManifestLake.read(spark, dir)
      .where(col("meta.qual") === 7000000000L).count() === 1)
    // nested SET one level in: pre-update-row semantics, NULL-struct
    // stays NULL, other fields untouched — composed with the RENAMED
    // field names
    ManifestLake.update(spark, dir, col("meta.id") === "rs5",
      Map("meta.qual" -> (col("meta.qual") + lit(100L))))
    assert(ManifestLake.read(spark, dir).where(col("meta.id") === "rs5")
      .select("meta.qual").head().getLong(0) === (5 % 3) + 100L)
    assert(ManifestLake.read(spark, dir).where(col("meta.id") === "rs5")
      .select("meta.id").head().getString(0) === "rs5",
      "sibling fields must ride through a nested SET untouched")
    val eSet = intercept[IllegalArgumentException](
      ManifestLake.update(spark, dir, lit(true),
        Map("entries.alt" -> lit("x"))))
    assert(eSet.getMessage.contains("array<struct>"), eSet.getMessage)

    // rename BACK to the physical name clears the mapping entry
    assert(ManifestLake.renameColumn(spark, dir, "meta.id", "rsid") === 11L)
    assert(ManifestLake.read(spark, dir)
      .schema("meta").dataType.catalogString === "struct<rsid:string,qual:bigint>")
    // a narrowing nested change still refuses
    val eN = intercept[IllegalArgumentException](
      ManifestLake.widenColumnType(spark, dir, "meta.qual",
        org.apache.spark.sql.types.IntegerType))
    assert(eN.getMessage.contains("value-preserving"))
    // the raw SQL relation refuses a field-mapped table, like colMap
    ManifestLake.renameColumn(spark, dir, "entries.alt", "allele")             // v12
    val eR = intercept[IllegalArgumentException](
      spark.read.format("graft-manifest").load(dir).collect())
    assert(eR.getMessage.contains("nested-field mapping") ||
      eR.getMessage.contains("deletion vectors"), eR.getMessage)
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

  test("nested RENAME and WIDEN reach depth 2+ through array<struct< ... array<struct<...>> >> - metadata-only, chained, reversible") {
    import spark.implicits._
    val dir = freshDir("nested-deep")
    // the true genomic evidence shape: entries is array<struct> whose
    // elements carry their OWN array<struct> of per-sample evidence
    val df = (0 until 10).map { i =>
      (s"chr${i % 2 + 1}", i.toLong,
        Seq((s"ref$i", Seq((s"s$i", i, i * 2)))))
    }.toDF("chrom", "pos", "entries")
      .select(col("chrom"), col("pos"), col("entries").cast(
        "array<struct<ref:string,hom:array<struct<id:string,qual:int,ad:int>>>>"))
    ManifestLake.write(spark, df, dir, Seq("chrom"), statsCols = Seq("pos")) // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    // depth-1 rename of the INTERMEDIATE node, then depth-2 rename and
    // widen THROUGH the renamed parent - all metadata-only
    assert(ManifestLake.renameColumn(spark, dir, "entries.hom", "evidence") === 2L)
    assert(ManifestLake.renameColumn(spark, dir, "entries.evidence.qual", "quality") === 3L)
    assert(ManifestLake.widenColumnType(spark, dir, "entries.evidence.ad",
      LongType) === 4L)
    assert(ManifestLake.readManifest(fs, root, 4L).files.map(_.path).toSet ===
      ManifestLake.readManifest(fs, root, 1L).files.map(_.path).toSet,
      "deep renames/widens must move zero data files")
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("entries").dataType.catalogString ===
      "array<struct<ref:string,evidence:array<struct<id:string,quality:int,ad:bigint>>>>")
    assert(r.selectExpr("entries[0].evidence[0].quality").where(col("pos") === 7L)
      .head().getInt(0) === 7)
    assert(r.selectExpr("entries[0].evidence[0].ad").where(col("pos") === 7L)
      .head().getLong(0) === 14L, "old files up-cast at scan through the widen")
    // time travel serves each version under ITS recorded names/types
    assert(ManifestLake.readVersion(spark, dir, 1L).schema("entries")
      .dataType.catalogString ===
      "array<struct<ref:string,hom:array<struct<id:string,qual:int,ad:int>>>>")
    assert(ManifestLake.readVersion(spark, dir, 2L).schema("entries")
      .dataType.catalogString ===
      "array<struct<ref:string,evidence:array<struct<id:string,qual:int,ad:int>>>>")
    // appends arrive under the NEW names at the WIDE type
    ManifestLake.write(spark,
      Seq(("chr1", 100L, Seq(("ref100", Seq(("s100", 5, 10L))))))
        .toDF("chrom", "pos", "entries")
        .select(col("chrom"), col("pos"), col("entries").cast(
          "array<struct<ref:string,evidence:array<struct<id:string,quality:int,ad:bigint>>>>")),
      dir, Seq("chrom"), replace = false)                                    // v5
    assert(ManifestLake.read(spark, dir)
      .selectExpr("entries[0].evidence[0].quality").where(col("pos") === 100L)
      .head().getInt(0) === 5)
    // CHAINED deep rename keeps pointing at the original file field,
    // and renaming BACK to the physical spelling collapses to identity
    assert(ManifestLake.renameColumn(spark, dir, "entries.evidence.quality", "q2") === 6L)
    assert(ManifestLake.read(spark, dir)
      .selectExpr("entries[0].evidence[0].q2").where(col("pos") === 7L)
      .head().getInt(0) === 7)
    assert(ManifestLake.renameColumn(spark, dir, "entries.evidence.q2", "qual") === 7L)
    val fm7 = ManifestLake.readManifest(fs, root, 7L).fieldMap
    assert(fm7 === Seq(("entries", "evidence", "hom")),
      s"renaming back to the physical spelling must collapse to identity, got $fm7")
    // deep predicates and DML work through the mapped names
    ManifestLake.delete(spark, dir, expr("entries[0].evidence[0].qual") === 3)  // v8
    assert(ManifestLake.read(spark, dir).where(col("pos") === 3L).count() === 0)
    // a deep path through a NON-struct refuses loudly
    val eBad = intercept[IllegalArgumentException](
      ManifestLake.renameColumn(spark, dir, "entries.ref.x", "y"))
    assert(eBad.getMessage.contains("not a struct or array<struct>"), eBad.getMessage)
    val eW = intercept[IllegalArgumentException](
      ManifestLake.widenColumnType(spark, dir, "entries.evidence.id",
        org.apache.spark.sql.types.IntegerType))
    assert(eW.getMessage.contains("cannot change"), eW.getMessage)
  }

  test("the SQL ALTER spelling reaches deep nested paths too") {
    import spark.implicits._
    val dir = freshDir("nested-deep-sql")
    val df = (0 until 6).map { i =>
      (s"chr${i % 2 + 1}", i.toLong, Seq((s"ref$i", Seq((s"s$i", i)))))
    }.toDF("chrom", "pos", "entries")
      .select(col("chrom"), col("pos"), col("entries").cast(
        "array<struct<ref:string,hom:array<struct<id:string,qual:int>>>>"))
    ManifestLake.write(spark, df, dir, Seq("chrom"))
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"ALTER TABLE $t RENAME COLUMN entries.hom.qual TO quality")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN entries.hom.quality TYPE BIGINT")
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("entries").dataType.catalogString ===
      "array<struct<ref:string,hom:array<struct<id:string,quality:bigint>>>>")
    assert(r.selectExpr("entries[0].hom[0].quality").where(col("pos") === 4L)
      .head().getLong(0) === 4L)
  }

  test("nested-field DROP is metadata-only; a re-ADDED same name never resurrects dropped data; depth-2 works") {
    import spark.implicits._
    val dir = build("nested-drop")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    // drop entries.alt (array<struct>): zero files move, the logical
    // view loses the field, old files serve the survivors
    assert(ManifestLake.dropColumn(spark, dir, "entries.alt") === 2L)
    assert(ManifestLake.readManifest(fs, root, 2L).files.map(f => (f.path, f.bytes)).toSet ===
      ManifestLake.readManifest(fs, root, 1L).files.map(f => (f.path, f.bytes)).toSet,
      "nested drop must move zero data files")
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("entries").dataType.catalogString ===
      "array<struct<apos:bigint>>")
    assert(r.selectExpr("entries[0].apos").where(col("pos") === 7L)
      .head().getLong(0) === 7L, "surviving fields serve old data")
    // time travel: v1 still carries the dropped field with its values
    val v1 = ManifestLake.readVersion(spark, dir, 1L)
    assert(v1.selectExpr("entries[0].alt").where(col("pos") === 7L)
      .head().getString(0) === "alt7")
    // appends carry the EVOLVED struct (no absent-field backfill inside
    // structs — the boundary is a positional cast)
    ManifestLake.write(spark,
      Seq(("chr1", 100L, ("rs100", 3), Seq(Tuple1(100L))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<rsid:string,qual:int>"),
          col("entries").cast("array<struct<apos:bigint>>")),
      dir, Seq("chrom"), replace = false)                                // v3
    assert(ManifestLake.read(spark, dir).where(col("pos") === 100L).count() === 1)
    // re-ADD the dropped name: fresh physical field, values are NULL
    // for every pre-add row — old 'alt' data can NEVER resurrect
    assert(ManifestLake.addColumn(spark, dir, "entries.alt",
      org.apache.spark.sql.types.StringType) === 4L)
    val r2 = ManifestLake.read(spark, dir)
    assert(r2.schema("entries").dataType.catalogString ===
      "array<struct<apos:bigint,alt:string>>")
    assert(r2.selectExpr("entries[0].alt").where(col("pos") === 7L)
      .head().isNullAt(0),
      "the re-added field must serve NULL, not the dropped data")
    assert(r2.selectExpr("entries[0].alt").where(col("pos") === 100L)
      .head().isNullAt(0))
    // the indirection is recorded: the fresh physical name differs
    val m4 = ManifestLake.readManifest(fs, root, 4L)
    assert(m4.fieldMap.exists { case (c, l, pp) =>
      c == "entries" && l == "alt" && pp != "alt" })
    assert(m4.fieldDropped.contains(("entries", "alt")))
    // new writes land values in the fresh field and read back
    ManifestLake.write(spark,
      Seq(("chr2", 200L, ("rs200", 1), Seq((200L, "fresh"))))
        .toDF("chrom", "pos", "meta", "entries")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<rsid:string,qual:int>"),
          col("entries").cast("array<struct<apos:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)                                // v5
    assert(ManifestLake.read(spark, dir).where(col("pos") === 200L)
      .selectExpr("entries[0].alt").head().getString(0) === "fresh")
    // last-field refusal: dropping apos would empty the struct
    val e = intercept[IllegalArgumentException] {
      ManifestLake.dropColumn(spark, dir, "entries.alt")   // v6, legal
      ManifestLake.dropColumn(spark, dir, "entries.apos")  // refuses
    }
    assert(e.getMessage.contains("last field"), e.getMessage)
    // SQL spelling, at depth 2 through array<struct<array<struct>>>
    val dir2 = freshDir("nested-drop-deep")
    val df2 = (0 until 10).map { i =>
      (s"chr${i % 2 + 1}", i.toLong, Seq((s"ref$i", Seq((s"s$i", i)))))
    }.toDF("chrom", "pos", "entries")
      .select(col("chrom"), col("pos"), col("entries").cast(
        "array<struct<ref:string,hom:array<struct<id:string,qual:int>>>>"))
    ManifestLake.write(spark, df2, dir2, Seq("chrom"))
    val t2 = s"`graft-manifest`.`$dir2`"
    spark.sql(s"ALTER TABLE $t2 DROP COLUMN entries.hom.qual")           // v2
    assert(ManifestLake.read(spark, dir2).schema("entries").dataType.catalogString
      === "array<struct<ref:string,hom:array<struct<id:string>>>>")
    spark.sql(s"ALTER TABLE $t2 ADD COLUMNS (entries.hom.qual BIGINT)")  // v3
    val r3 = ManifestLake.read(spark, dir2)
    assert(r3.schema("entries").dataType.catalogString
      === "array<struct<ref:string,hom:array<struct<id:string,qual:bigint>>>>")
    assert(r3.selectExpr("entries[0].hom[0].qual").collect().forall(_.isNullAt(0)),
      "re-added deep field serves NULL everywhere, at the NEW type")
    // a bad second entry applies nothing (pre-validated whole list)
    val v0 = ManifestLake.currentVersion(spark, dir2).get
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t2 DROP COLUMN entries.ref, entries.hom.ghost")
    }
    assert(e2.getMessage.contains("no field named"), e2.getMessage)
    assert(ManifestLake.currentVersion(spark, dir2).get === v0,
      "half-applied multi-column DROP must not commit")
  }

  test("nested DROP composes with TOP-LEVEL column mapping: rename the root, drop inside it, re-add, read exact") {
    import spark.implicits._
    val dir = build("nested-drop-mapped")
    // rename the ROOT column (engages colMap), then drop a field
    // INSIDE it under the NEW name — fieldMap/fieldDropped key by the
    // PHYSICAL root, so the indirections compose
    assert(ManifestLake.renameColumn(spark, dir, "entries", "evidence") === 2L)
    assert(ManifestLake.dropColumn(spark, dir, "evidence.alt") === 3L)
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("evidence").dataType.catalogString ===
      "array<struct<apos:bigint>>")
    assert(r.selectExpr("evidence[0].apos").where(col("pos") === 5L)
      .head().getLong(0) === 5L)
    // re-add under the renamed root: fresh physical, NULL everywhere
    assert(ManifestLake.addColumn(spark, dir, "evidence.alt",
      org.apache.spark.sql.types.StringType) === 4L)
    assert(ManifestLake.read(spark, dir)
      .selectExpr("evidence[0].alt").collect().forall(_.isNullAt(0)))
    // time travel: v1 serves the ORIGINAL names and values
    val v1 = ManifestLake.readVersion(spark, dir, 1L)
    assert(v1.selectExpr("entries[0].alt").where(col("pos") === 5L)
      .head().getString(0) === "alt5")
    // and the whole evolved table still appends + reads back
    ManifestLake.write(spark,
      Seq(("chr1", 300L, ("rs300", 1), Seq((300L, "a300"))))
        .toDF("chrom", "pos", "meta", "evidence")
        .select(col("chrom"), col("pos"),
          col("meta").cast("struct<rsid:string,qual:int>"),
          col("evidence").cast("array<struct<apos:bigint,alt:string>>")),
      dir, Seq("chrom"), replace = false)
    assert(ManifestLake.read(spark, dir).where(col("pos") === 300L)
      .selectExpr("evidence[0].alt").head().getString(0) === "a300")
  }
}
