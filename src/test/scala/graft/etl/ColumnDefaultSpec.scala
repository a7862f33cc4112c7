package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values as a manifest header fact: literal-only,
  * materialized when an INSERT/MERGE column list omits the column,
  * metadata-only SET/DROP commits, and the interplay with the rest of
  * the schema machinery (rename carries the default, drop removes it,
  * generated columns refuse, replace commits keep it).
  */
class ColumnDefaultSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def defaultsOf(path: String): Seq[(String, String)] = {
    val (fs, root) = ManifestLake.fsFor(spark, path)
    ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, path).get).defaults
  }

  test("omitted-column fill: explicit NULL stays NULL; positional arity unaffected") {
    import spark.implicits._
    val dir = freshDir("defaults-fill")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, " +
      "state STRING DEFAULT 'new') USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, id) VALUES ('a', 1)")
    // an explicit NULL in the list is NOT absence — it stays NULL
    spark.sql(s"INSERT INTO $t (grp, id, state) VALUES ('a', 2, NULL)")
    // positional INSERT still needs full arity, default notwithstanding
    val e = intercept[Exception](spark.sql(s"INSERT INTO $t VALUES ('a', 3)"))
    assert(e.getMessage.contains("expects 3"))
    spark.sql(s"INSERT INTO $t VALUES ('a', 3, 'done')")
    assert(spark.sql(s"SELECT id, state FROM $t ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq ===
      Seq((1L, Some("new")), (2L, None), (3L, Some("done"))))
  }

  test("SET DEFAULT is a metadata-only commit affecting only later statements") {
    import spark.implicits._
    val dir = freshDir("defaults-set")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, rev BIGINT) " +
      s"USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"INSERT INTO $t (grp, id) VALUES ('a', 1)")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val before = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $t ALTER COLUMN rev SET DEFAULT 5")
    val m = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(m.files.map(_.path).toSet === before, "metadata-only: no data moved")
    assert(m.defaults === Seq("rev" -> "5L"))
    spark.sql(s"INSERT INTO $t (grp, id) VALUES ('a', 2)")
    assert(spark.sql(s"SELECT id, rev FROM $t ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq ===
      Seq((1L, None), (2L, Some(5L))), "pre-SET rows stay untouched")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN rev DROP DEFAULT")
    assert(defaultsOf(dir).isEmpty)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN rev DROP DEFAULT"))
    assert(e.getMessage.contains("no DEFAULT"))
  }

  test("refusals: non-literal, column refs, type mismatch, generated, nested, ADD COLUMN") {
    val dir = freshDir("defaults-refuse")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, nest STRUCT<a: BIGINT>, " +
      "gen BIGINT GENERATED ALWAYS AS (id + 1)) USING `graft-manifest` " +
      "PARTITIONED BY (grp)")
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"for $sql got: ${e.getMessage.take(200)}")
    }
    refuses(s"ALTER TABLE $t ALTER COLUMN id SET DEFAULT current_timestamp()",
      "literal")
    refuses(s"ALTER TABLE $t ALTER COLUMN id SET DEFAULT grp", "literal")
    refuses(s"ALTER TABLE $t ALTER COLUMN id SET DEFAULT 'nope'", "id")
    refuses(s"ALTER TABLE $t ALTER COLUMN gen SET DEFAULT 1", "GENERATED")
    refuses(s"ALTER TABLE $t ALTER COLUMN nest.a SET DEFAULT 1", "nested")
    refuses(s"ALTER TABLE $t ADD COLUMN extra STRING DEFAULT 'x'", "DEFAULT")
    // an invalid CREATE-time default leaves NO half-created table
    val dir2 = freshDir("defaults-refuse-create")
    intercept[Exception](spark.sql(
      s"CREATE TABLE `graft-manifest`.`$dir2` (id BIGINT DEFAULT 'abc') " +
        "USING `graft-manifest`"))
    assert(ManifestLake.currentVersion(spark, dir2).isEmpty)
    // a default whose CANONICAL literal carries a control character
    // would corrupt the line-oriented manifest header — it must refuse
    // at declare time (and a CREATE-time one leaves no half-created
    // table, not a post-create publish failure)
    val dirCtl = freshDir("defaults-ctl")
    spark.sql(s"CREATE TABLE `graft-manifest`.`$dirCtl` (s STRING) " +
      "USING `graft-manifest`")
    refuses(s"ALTER TABLE `graft-manifest`.`$dirCtl` ALTER COLUMN s " +
      "SET DEFAULT 'a\nb'", "tab/newline")
    val dir3 = freshDir("defaults-refuse-ctl")
    intercept[Exception](spark.sql(
      s"CREATE TABLE `graft-manifest`.`$dir3` (s STRING DEFAULT 'a\tb') " +
        "USING `graft-manifest`"))
    assert(ManifestLake.currentVersion(spark, dir3).isEmpty,
      "a control-char default must leave no half-created table")
  }

  test("rename carries the default; drop column removes it; replace commit keeps it") {
    import spark.implicits._
    val dir = freshDir("defaults-schema")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, " +
      "state STRING DEFAULT 'new', rev BIGINT DEFAULT 0) " +
      "USING `graft-manifest` PARTITIONED BY (grp)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN state TO phase")
    assert(defaultsOf(dir).toMap === Map("phase" -> "'new'", "rev" -> "0L"))
    spark.sql(s"INSERT INTO $t (grp, id) VALUES ('a', 1)")
    assert(spark.sql(s"SELECT phase FROM $t").as[String].head() === "new")
    spark.sql(s"ALTER TABLE $t DROP COLUMN rev")
    assert(defaultsOf(dir).toMap === Map("phase" -> "'new'"))
    // a replace commit (INSERT OVERWRITE wholesale) keeps the header fact
    Seq(("a", 9L, "kept")).toDF("grp", "id", "phase")
      .createOrReplaceTempView("defaults_repl")
    spark.sql(s"INSERT OVERWRITE $t SELECT grp, id, phase FROM defaults_repl")
    assert(defaultsOf(dir).toMap === Map("phase" -> "'new'"))
    spark.sql(s"INSERT INTO $t (grp, id) VALUES ('a', 10)")
    assert(spark.sql(s"SELECT id, phase FROM $t ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((9L, "kept"), (10L, "new")))
  }

  test("Scala API twin + date/decimal canonical literals round-trip the manifest text") {
    import spark.implicits._
    val dir = freshDir("defaults-scala")
    ManifestLake.write(spark, Seq(("a", 1L)).toDF("grp", "id"), dir, Seq("grp"))
    ManifestLake.setColumnDefault(spark, dir, "id", Some("41 + 1"))
    assert(defaultsOf(dir) === Seq("id" -> "42L"),
      "foldable arithmetic canonicalizes to the literal")
    // widen after declare: the stored literal still store-assigns
    spark.sql(s"ALTER TABLE `graft-manifest`.`$dir` ALTER COLUMN id TYPE DECIMAL(20, 0)")
    spark.sql(s"INSERT INTO `graft-manifest`.`$dir` (grp) VALUES ('b')")
    assert(spark.sql(s"SELECT CAST(id AS LONG) FROM `graft-manifest`.`$dir` " +
      "WHERE grp = 'b'").as[Long].head() === 42L)
    // typed literals canonicalize through the ANSI store-assign cast
    ManifestLake.setColumnDefault(spark, dir, "grp", Some("DATE '2024-01-01'"))
    assert(defaultsOf(dir).toMap.apply("grp") === "'2024-01-01'")
  }
}
