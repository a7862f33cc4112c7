package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text DML on manifest tables: `spark.sql("MERGE INTO …")` /
  * `UPDATE` / `DELETE` driving the SAME ManifestLake engine as the
  * Scala API, via the injected parser. Pins: statement→engine
  * dispatch, clause ORDER semantics, partial SET, explicit INSERT
  * lists, NOT MATCHED BY SOURCE, temp-view targets, loud refusals for
  * unsupported shapes, and byte-identical passthrough of non-manifest
  * SQL.
  */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def seed(dir: String): Unit = {
    import spark.implicits._
    val df = (0 until 40).map(i =>
      (if (i % 2 == 0) "aa" else "bb", i.toLong, s"p$i", i * 10L))
      .toDF("grp", "id", "payload", "score")
    ManifestLake.write(spark, df, dir, Seq("grp"), statsCols = Seq("id"))
  }

  test("DELETE FROM `graft-manifest`.`path` WHERE … runs the engine; SELECT and non-manifest DML pass through") {
    seed(dirDel)
    val res = spark.sql(
      s"DELETE FROM `graft-manifest`.`$dirDel` WHERE id < 10 AND grp = 'aa'")
      .collect()
    assert(res.map(_.getLong(0)).toSeq === Seq(2L), "returns the published version")
    assert(ManifestLake.read(spark, dirDel).count() === 35)
    assert(ManifestLake.read(spark, dirDel)
      .where(col("id") < 10 && col("grp") === "aa").count() === 0)
    // alias form
    spark.sql(s"DELETE FROM `graft-manifest`.`$dirDel` t WHERE t.id = 39")
    assert(ManifestLake.read(spark, dirDel).count() === 34)
    // passthrough: plain SQL over a normal view is untouched
    spark.range(5).createOrReplaceTempView("sqldml_plain")
    assert(spark.sql("SELECT count(*) c FROM sqldml_plain").collect()
      .head.getLong(0) === 5L)
    // passthrough: DML on a non-manifest relation fails with SPARK's
    // error, not ours
    val e = intercept[Exception] {
      spark.sql("DELETE FROM sqldml_plain WHERE id = 1")
    }
    assert(!e.getMessage.contains("manifest"),
      s"non-manifest DELETE must surface Spark's own error, got: ${e.getMessage}")
  }
  private val dirDel = freshDir("sqldml-del")

  test("UPDATE … SET expr WHERE … runs the engine (alias stripped, functions allowed)") {
    seed(dirUpd)
    val res = spark.sql(
      s"UPDATE `graft-manifest`.`$dirUpd` u SET payload = upper(u.payload), " +
        s"score = u.score + 1000 WHERE u.id % 10 = 3").collect()
    assert(res.map(_.getLong(0)).toSeq === Seq(2L))
    val r = ManifestLake.read(spark, dirUpd)
    assert(r.where(col("payload") === "P3" && col("score") === 1030L).count() === 1)
    assert(r.where(col("id") === 13L && col("payload") === "P13").count() === 1)
    assert(r.where(col("id") === 2L && col("payload") === "p2").count() === 1,
      "non-matching rows unchanged")
  }
  private val dirUpd = freshDir("sqldml-upd")

  test("UPDATE … SET on a field one level inside a struct runs the engine (nested SET)") {
    import spark.implicits._
    val df = (0 until 10).map(i => ("aa", i.toLong, (s"rs$i", i)))
      .toDF("grp", "id", "meta")
      .select(col("grp"), col("id"), col("meta").cast("struct<rsid:string,qual:int>"))
    ManifestLake.write(spark, df, dirNUpd, Seq("grp"))
    val v = spark.sql(s"UPDATE `graft-manifest`.`$dirNUpd` " +
      "SET meta.qual = meta.qual + 50 WHERE id % 2 = 0").collect().head.getLong(0)
    assert(v === 2L)
    val r = ManifestLake.read(spark, dirNUpd)
    assert(r.where(col("id") === 4L).select("meta.qual").head().getInt(0) === 54)
    assert(r.where(col("id") === 5L).select("meta.qual").head().getInt(0) === 5)
    assert(r.where(col("id") === 4L).select("meta.rsid").head().getString(0) === "rs4",
      "sibling fields untouched")
  }
  private val dirNUpd = freshDir("sqldml-nupd")

  test("MERGE INTO with SET * / INSERT * and per-clause conditions matches the Scala clause matrix") {
    import spark.implicits._
    seed(dirMrg)
    (0 until 60).filter(_ % 3 == 0).map(i =>
      (if (i % 2 == 0) "aa" else "bb", i.toLong, s"NEW$i", i * 100L))
      .toDF("grp", "id", "payload", "score")
      .createOrReplaceTempView("sqldml_src")
    val res = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dirMrg` t
         |USING sqldml_src s
         |ON t.grp = s.grp AND t.id = s.id
         |WHEN MATCHED AND s.id % 12 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.score > 4000 THEN INSERT *
         |""".stripMargin).collect().head
    assert(res.getLong(0) === 2L)
    val (upd, del, ins) = (res.getLong(1), res.getLong(2), res.getLong(3))
    // table rows: ids 0..39; source ids 0,3,..,57. matched = ids in both
    // (multiples of 3 < 40 with matching grp — grp is id-parity-derived
    // on both sides, so all match): 0,3,...,39 → 14 ids; of those %12==0:
    // 0,12,24,36 → 4 deletes; 10 updates. unmatched source ids 42..57
    // (6 ids) + none below 40; insert requires score>4000 → ids 42,45,
    // ...,57 with id*100>4000 → all 6 qualify... score = id*100 > 4000
    // means id > 40 → all 6.
    assert((upd, del, ins) === (10L, 4L, 6L))
    val r = ManifestLake.read(spark, dirMrg)
    assert(r.count() === 40L - 4L + 6L)
    assert(r.where(col("id") === 6L).select("payload").head().getString(0) === "NEW6")
    assert(r.where(col("id") === 12L).count() === 0)
    assert(r.where(col("id") === 57L).select("score").head().getLong(0) === 5700L)
    assert(r.where(col("id") === 1L).select("payload").head().getString(0) === "p1",
      "unmatched target rows survive untouched")
  }
  private val dirMrg = freshDir("sqldml-merge")

  test("MERGE clause ORDER is SQL first-true-wins; partial SET keeps unassigned columns; explicit INSERT lists NULL unlisted") {
    import spark.implicits._
    seed(dirOrd)
    (0 until 50).filter(_ % 5 == 0).map(i =>
      (if (i % 2 == 0) "aa" else "bb", i.toLong, i * 100L))
      .toDF("grp", "id", "score")
      .createOrReplaceTempView("sqldml_src2")
    // UPDATE listed FIRST: a matched id%10==0 row hits the UPDATE (cond
    // id%2=0 true for multiples of 10) BEFORE the later DELETE — SQL
    // order, the opposite of the engine's old fixed delete-first
    val res = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dirOrd` t
         |USING sqldml_src2 s
         |ON t.grp = s.grp AND t.id = s.id
         |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET score = s.score + t.score
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (grp, id, score) VALUES (s.grp, s.id, s.score)
         |""".stripMargin).collect().head
    // matched ids: 0,5,...,35 within 0..39 → 8; even ones (0,10,20,30)
    // update (order wins), odd ones (5,15,25,35) delete; source ids
    // 40,45 insert
    assert((res.getLong(1), res.getLong(2), res.getLong(3)) === (4L, 4L, 2L))
    val r = ManifestLake.read(spark, dirOrd)
    // partial SET: payload kept from target, score = s+t
    assert(r.where(col("id") === 20L).select("payload", "score").head()
      .toSeq === Seq("p20", 20L * 100 + 20L * 10))
    assert(r.where(col("id") === 15L).count() === 0)
    // explicit INSERT list: payload unlisted → NULL
    assert(r.where(col("id") === 45L).select("payload").head().isNullAt(0))
    assert(r.where(col("id") === 45L).select("score").head().getLong(0) === 4500L)
  }
  private val dirOrd = freshDir("sqldml-order")

  test("NOT MATCHED BY SOURCE UPDATE/DELETE act on unnamed target rows (whole-table rewrite)") {
    import spark.implicits._
    seed(dirBys)
    Seq(("aa", 0L), ("aa", 2L), ("bb", 1L)).toDF("grp", "id")
      .createOrReplaceTempView("sqldml_src3")
    val res = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dirBys` t
         |USING sqldml_src3 s
         |ON t.grp = s.grp AND t.id = s.id
         |WHEN MATCHED THEN UPDATE SET score = t.score + 1
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 30 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET payload = 'stale'
         |""".stripMargin).collect().head
    // 3 matched update; by-source: ids 30..39 delete (10), remaining
    // 40-3-10=27 update payload='stale'
    assert((res.getLong(1), res.getLong(2), res.getLong(3)) === (3L + 27L, 10L, 0L))
    val r = ManifestLake.read(spark, dirBys)
    assert(r.count() === 30)
    assert(r.where(col("id") === 0L).select("score").head().getLong(0) === 1L)
    assert(r.where(col("id") === 5L).select("payload").head().getString(0) === "stale")
    assert(r.where(col("id") >= 30L).count() === 0)
  }
  private val dirBys = freshDir("sqldml-bysource")

  test("a temp view over graft-manifest is a valid DML target (resolved to its table path)") {
    seed(dirView)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW sqldml_view
         |USING `graft-manifest` OPTIONS (path '$dirView')""".stripMargin)
    spark.sql("DELETE FROM sqldml_view WHERE id < 4")
    assert(ManifestLake.read(spark, dirView).count() === 36)
  }
  private val dirView = freshDir("sqldml-view")

  test("INSERT INTO / OVERWRITE / column list / BY NAME / static PARTITION run the engine; arity mismatches refuse") {
    import spark.implicits._
    seed(dirIns)
    // positional INSERT INTO … VALUES appends
    val v2 = spark.sql(s"INSERT INTO `graft-manifest`.`$dirIns` " +
      "VALUES ('aa', 100, 'p100', 1000)").collect().head.getLong(0)
    assert(v2 === 2L)
    assert(ManifestLake.read(spark, dirIns).count() === 41)
    assert(ManifestLake.read(spark, dirIns)
      .where(col("id") === 100L).select("payload").head().getString(0) === "p100")
    // column list: unlisted columns land NULL
    spark.sql(s"INSERT INTO `graft-manifest`.`$dirIns` (grp, id, score) " +
      "VALUES ('bb', 101, 42)")
    val r101 = ManifestLake.read(spark, dirIns).where(col("id") === 101L)
    assert(r101.select("payload").head().isNullAt(0))
    assert(r101.select("score").head().getLong(0) === 42L)
    // static PARTITION spec becomes a literal column
    spark.sql(s"INSERT INTO `graft-manifest`.`$dirIns` PARTITION (grp='cc') " +
      "VALUES (102, 'p102', 7)")
    assert(ManifestLake.read(spark, dirIns)
      .where(col("grp") === "cc" && col("id") === 102L).count() === 1)
    // BY NAME aligns a reordered query
    spark.range(1).select(lit(103L).as("id"), lit("bn").as("payload"),
      lit("aa").as("grp"), lit(5L).as("score"))
      .createOrReplaceTempView("sqldml_bn")
    spark.sql(s"INSERT INTO `graft-manifest`.`$dirIns` BY NAME " +
      "SELECT * FROM sqldml_bn")
    assert(ManifestLake.read(spark, dirIns)
      .where(col("id") === 103L).select("payload").head().getString(0) === "bn")
    // INSERT OVERWRITE replaces the table wholesale
    val vN = spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dirIns` " +
      "VALUES ('zz', 1, 'only', 9)").collect().head.getLong(0)
    assert(ManifestLake.read(spark, dirIns).count() === 1)
    assert(ManifestLake.readVersion(spark, dirIns, vN - 1).count() === 44,
      "time travel must still serve the pre-overwrite content")
    // arity mismatch refuses loudly, nothing lands
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-manifest`.`$dirIns` VALUES ('a', 2)")
    }
    assert(e.getMessage.contains("column") || e.getMessage.contains("COLUMN"),
      e.getMessage)
    assert(ManifestLake.read(spark, dirIns).count() === 1)
  }
  private val dirIns = freshDir("sqldml-insert")

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on manifest references, anywhere in the tree") {
    import spark.implicits._
    val dir = freshDir("sqldml-tt")
    ManifestLake.write(spark,
      Seq(("aa", 1L), ("aa", 2L)).toDF("grp", "id"), dir, Seq("grp")) // v1
    ManifestLake.write(spark,
      Seq(("bb", 3L)).toDF("grp", "id"), dir, Seq("grp"),
      replace = false) // v2 append
    spark.sql(s"DELETE FROM `graft-manifest`.`$dir` WHERE id = 1") // v3
    def ids(sql: String): Seq[Long] =
      spark.sql(sql).as[Long].collect().toSeq.sorted
    val t = s"`graft-manifest`.`$dir`"
    assert(ids(s"SELECT id FROM $t VERSION AS OF 1") === Seq(1L, 2L))
    assert(ids(s"SELECT id FROM $t VERSION AS OF 2") === Seq(1L, 2L, 3L))
    assert(ids(s"SELECT id FROM $t VERSION AS OF 3") === Seq(2L, 3L))
    // a pinned reference composes inside a join leg
    assert(spark.sql(
      s"""SELECT count(*) FROM $t cur
         |JOIN $t VERSION AS OF 1 old ON cur.id = old.id""".stripMargin)
      .as[Long].head() === 1L)
    // temp-view spelling works too, and tracks the view's table path
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW sqldml_tt
                 |USING `graft-manifest` OPTIONS (path '$dir')""".stripMargin)
    assert(ids("SELECT id FROM sqldml_tt VERSION AS OF 1") === Seq(1L, 2L))
    // the DIRECT head read — `graft-manifest`.`/path` with no temp
    // view at all (the delta.`/path` idiom)
    assert(ids(s"SELECT id FROM $t") === Seq(2L, 3L))
    assert(ids(s"SELECT t2.id FROM $t t2 WHERE t2.id > 2") === Seq(3L))
    // TIMESTAMP AS OF resolves through the SAME versionAtTimestamp the
    // read option serves — assert the SQL spelling against the API's
    // own resolution of the identical instant (mtime-tie semantics are
    // versionAtTimestamp's own spec'd concern, not this plumbing's)
    assert(ManifestLake.versions(spark, dir).map(_._1) === Seq(1L, 2L, 3L))
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val ts2millis = fs.getFileStatus(new org.apache.hadoop.fs.Path(root,
      "_manifest/v000002.list.gz")).getModificationTime
    val iso = java.time.Instant.ofEpochMilli(ts2millis).toString
    val apiV = ManifestLake.versionAtTimestamp(spark, dir, ts2millis)
    assert(ids(s"SELECT id FROM $t TIMESTAMP AS OF '$iso'") ===
      ManifestLake.readVersion(spark, dir, apiV)
        .select(col("id")).as[Long].collect().toSeq.sorted)
    // refusals: non-numeric version; non-literal timestamp. Both loud.
    val badV = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT id FROM $t VERSION AS OF 'branchname'")
    }
    assert(badV.getMessage.contains("version number"))
    val badT = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT id FROM $t TIMESTAMP AS OF current_timestamp()")
    }
    assert(badT.getMessage.contains("literal"))
    // non-manifest time travel is untouched: Spark raises ITS error
    spark.range(3).createOrReplaceTempView("sqldml_tt_plain")
    intercept[Exception] {
      spark.sql("SELECT * FROM sqldml_tt_plain VERSION AS OF 1").collect()
    }
    ()
  }

  test("ALTER TABLE: ADD/RENAME/DROP COLUMN, TYPE widening, ADD/DROP CONSTRAINT run the engine; unsupported clauses refuse") {
    import spark.implicits._
    val dir = freshDir("sqldml-alter")
    ManifestLake.write(spark,
      Seq(("aa", 1L, 7), ("bb", 2L, 9)).toDF("grp", "id", "n"),
      dir, Seq("grp"))
    val t = s"`graft-manifest`.`$dir`"
    def cols(): Seq[String] =
      ManifestLake.read(spark, dir).schema.fieldNames.toSeq

    spark.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING, score DOUBLE)")
    assert(cols().toSet === Set("grp", "id", "n", "note", "score"))
    spark.sql(s"ALTER TABLE $t RENAME COLUMN note TO remark")
    assert(cols().contains("remark") && !cols().contains("note"))
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT")
    assert(ManifestLake.read(spark, dir).schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    spark.sql(s"ALTER TABLE $t DROP COLUMN score")
    assert(!cols().contains("score"))
    // IF EXISTS skips a missing column silently; without it, loud
    spark.sql(s"ALTER TABLE $t DROP COLUMN IF EXISTS ghost")
    val miss = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t DROP COLUMN ghost")
    }
    assert(miss.getMessage.contains("no column"))
    // data survived the whole surgery chain under the original values
    assert(ManifestLake.read(spark, dir).select("grp", "id", "n")
      .as[(String, Long, Long)].collect().toSet ===
      Set(("aa", 1L, 7L), ("bb", 2L, 9L)))

    // CHECK constraints through SQL DDL: enforced on the next write
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pos_id CHECK (id > 0)")
    val viol = intercept[Exception] {
      ManifestLake.write(spark, Seq(("aa", -5L, 1L, "x", null: java.lang.Double))
        .toDF("grp", "id", "n", "remark", "score")
        .drop("score"), dir, Seq("grp"), replace = false)
    }
    assert(viol.getMessage.contains("pos_id"))
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT pos_id")
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS pos_id") // now silent
    val missC = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP CONSTRAINT pos_id")
    }
    assert(missC.getMessage.toLowerCase.contains("constraint"))

    // a temp view over the source is a valid ALTER target too (fresh
    // table: the raw SQL view deliberately refuses column-mapped ones)
    val dir2 = freshDir("sqldml-alter2")
    ManifestLake.write(spark, Seq(("aa", 1L)).toDF("grp", "id"), dir2, Seq("grp"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW sqldml_alter_v
                 |USING `graft-manifest` OPTIONS (path '$dir2')""".stripMargin)
    spark.sql("ALTER TABLE sqldml_alter_v ADD COLUMNS (extra STRING)")
    assert(ManifestLake.read(spark, dir2).schema.fieldNames.contains("extra"))

    // unsupported clauses refuse loudly, nothing half-applies
    val narrow = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE INT")
    }
    assert(narrow.getMessage.toLowerCase.contains("widen"))
    val posn = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t ADD COLUMNS (early STRING FIRST)")
    }
    assert(posn.getMessage.contains("FIRST/AFTER"))
    // ADD COLUMN with COMMENT records the fact (round 19) — the
    // dedicated comments test pins the full surface
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (c2 STRING COMMENT 'hi')")
    assert(ManifestLake.comments(spark, dir)._2.get("c2").contains("hi"))
    // non-manifest ALTER passes through to Spark's own error
    spark.range(3).createOrReplaceTempView("sqldml_alter_plain")
    intercept[Exception] {
      spark.sql("ALTER TABLE sqldml_alter_plain ADD COLUMNS (x STRING)")
    }
    ()
  }

  test("table utilities: DESCRIBE / SHOW PARTITIONS / SHOW COLUMNS / TRUNCATE on the multipart spelling") {
    import spark.implicits._
    val dir = freshDir("sqldml-util")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "x"), ("aa", 2L, "y"), ("bb", 3L, "z"))
        .toDF("grp", "id", "payload"), dir, Seq("grp"))
    val t = s"`graft-manifest`.`$dir`"
    // DESCRIBE: logical columns + partition block
    val desc = spark.sql(s"DESCRIBE TABLE $t")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc.take(3) ===
      Seq(("grp", "string"), ("id", "bigint"), ("payload", "string")))
    assert(desc.contains(("# Partition Information", "")) &&
      desc.last === (("grp", "string")))
    // EXTENDED appends provider/location/version
    val ext = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("Provider") === "graft-manifest" && ext("Version") === "1")
    // SHOW COLUMNS / SHOW PARTITIONS (+ partial spec filter)
    assert(spark.sql(s"SHOW COLUMNS IN $t").as[String].collect().toSeq ===
      Seq("grp", "id", "payload"))
    assert(spark.sql(s"SHOW PARTITIONS $t").as[String].collect().toSeq ===
      Seq("grp=aa", "grp=bb"))
    assert(spark.sql(s"SHOW PARTITIONS $t PARTITION (grp='bb')")
      .as[String].collect().toSeq === Seq("grp=bb"))
    // TRUNCATE a named partition, then the whole table
    spark.sql(s"TRUNCATE TABLE $t PARTITION (grp='aa')")
    assert(ManifestLake.read(spark, dir).select("id").as[Long]
      .collect().toSeq === Seq(3L))
    spark.sql(s"TRUNCATE TABLE $t")
    assert(ManifestLake.read(spark, dir).isEmpty)
    // schema survives a full truncate (that is what separates it from drop)
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq ===
      Seq("grp", "id", "payload"))
    // refusals: unknown partition column; DESCRIBE ... PARTITION
    val badCol = intercept[IllegalArgumentException] {
      spark.sql(s"TRUNCATE TABLE $t PARTITION (ghost='x')")
    }
    assert(badCol.getMessage.contains("not a partition column"))
    val descPart = intercept[IllegalArgumentException] {
      spark.sql(s"DESCRIBE TABLE $t PARTITION (grp='aa')")
    }
    assert(descPart.getMessage.contains("SHOW PARTITIONS"))
    // native DESCRIBE on a plain temp view is untouched
    spark.range(3).createOrReplaceTempView("sqldml_util_plain")
    assert(spark.sql("DESCRIBE TABLE sqldml_util_plain").count() >= 1)
    ()
  }

  test("CREATE TABLE / CTAS / REPLACE TABLE on the multipart spelling create manifest tables") {
    import spark.implicits._
    val dir = freshDir("sqldml-create")
    val t = s"`graft-manifest`.`$dir`"
    // empty CREATE: schema + partitioning + CHECK constraint recorded
    spark.sql(
      s"""CREATE TABLE $t (grp STRING, id BIGINT, n BIGINT,
         |  CONSTRAINT pos_n CHECK (n >= 0))
         |PARTITIONED BY (grp)""".stripMargin)
    assert(ManifestLake.read(spark, dir).isEmpty)
    assert(ManifestLake.read(spark, dir).schema.fieldNames.toSeq ===
      Seq("grp", "id", "n"))
    // the constraint enforces on the first write
    val viol = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES ('aa', 1, -5)")
    }
    assert(viol.getMessage.contains("pos_n"))
    spark.sql(s"INSERT INTO $t VALUES ('aa', 1, 5)")
    assert(spark.sql(s"SELECT id FROM $t").as[Long].collect().toSeq === Seq(1L))
    // IF NOT EXISTS no-ops; bare CREATE on an existing table refuses
    spark.sql(s"CREATE TABLE IF NOT EXISTS $t (x STRING)")
    assert(ManifestLake.read(spark, dir).schema.fieldNames.length === 3)
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE $t (x STRING)")
    }
    // CTAS: schema from the query, partitioned; generated column trails
    val dir2 = freshDir("sqldml-ctas")
    val t2 = s"`graft-manifest`.`$dir2`"
    spark.sql(
      s"""CREATE TABLE $t2 PARTITIONED BY (grp) AS
         |SELECT 'g' || CAST(id % 2 AS STRING) AS grp, id, id * 10 AS n
         |FROM range(6)""".stripMargin)
    assert(spark.sql(s"SELECT CAST(sum(n) AS BIGINT) FROM $t2")
      .as[Long].head() === 150L)
    assert(spark.sql(s"SHOW PARTITIONS $t2").as[String].collect().toSeq ===
      Seq("grp=g0", "grp=g1"))
    // REPLACE TABLE swaps content; plain REPLACE of a missing table refuses
    spark.sql(s"REPLACE TABLE $t2 AS SELECT 'x' AS grp, 9L AS id")
    assert(spark.sql(s"SELECT id FROM $t2").as[Long].collect().toSeq === Seq(9L))
    intercept[IllegalArgumentException] {
      spark.sql(s"REPLACE TABLE `graft-manifest`.`${freshDir("sqldml-rt")}` " +
        "AS SELECT 1 AS id")
    }
    // generated column declared last computes on write
    val dir3 = freshDir("sqldml-gen")
    val t3 = s"`graft-manifest`.`$dir3`"
    spark.sql(
      s"""CREATE TABLE $t3 (id BIGINT, n BIGINT,
         |  n2 BIGINT GENERATED ALWAYS AS (n * 2))""".stripMargin)
    spark.sql(s"INSERT INTO $t3 (id, n) VALUES (1, 21)")
    assert(spark.sql(s"SELECT n2 FROM $t3").as[Long].head() === 42L)
    // refusals: foreign provider, LOCATION, TBLPROPERTIES
    val prov = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE `graft-manifest`.`${freshDir("sqldml-p")}` " +
        "(id BIGINT) USING parquet")
    }
    assert(prov.getMessage.contains("only creates graft-manifest"))
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE `graft-manifest`.`${freshDir("sqldml-l")}` " +
        "(id BIGINT) LOCATION '/tmp/elsewhere'")
    }
    // NOT NULL is first-class DDL (round 19): it lowers to the reserved
    // CHECK pair instead of refusing — the dedicated NOT NULL test pins
    // the full surface
    val nnDir = freshDir("sqldml-nn")
    spark.sql(s"CREATE TABLE `graft-manifest`.`$nnDir` (id BIGINT NOT NULL)")
    val (nnFs, nnRoot) = ManifestLake.fsFor(spark, nnDir)
    assert(ManifestLake.readManifest(nnFs, nnRoot,
      ManifestLake.currentVersion(spark, nnDir).get)
      .constraints.contains("graft_nn_id"))
    ()
  }

  test("passthrough zoo: vanilla SQL on non-manifest relations is untouched by the wrapper") {
    import spark.implicits._
    // the wrapper matches many statement SHAPES (CREATE/ALTER/SHOW/
    // DESCRIBE/TRUNCATE/MERGE/…) — none may fire off a non-manifest
    // target; this zoo exercises each shape against normal relations
    spark.range(4).select(col("id"), (col("id") % 2).as("g"))
      .createOrReplaceTempView("zoo_v")
    assert(spark.sql("SELECT g, count(*) c FROM zoo_v GROUP BY g ORDER BY g")
      .as[(Long, Long)].collect().toSeq === Seq((0L, 2L), (1L, 2L)))
    assert(spark.sql("DESCRIBE zoo_v").count() === 2)
    assert(spark.sql("SHOW COLUMNS IN zoo_v").as[String].collect().toSet ===
      Set("id", "g"))
    assert(spark.sql("EXPLAIN SELECT * FROM zoo_v").count() === 1)
    spark.sql("CACHE TABLE zoo_v")
    spark.sql("UNCACHE TABLE zoo_v")
    // WITH + window + subquery, parsed through the wrapper unchanged
    assert(spark.sql(
      """WITH t AS (SELECT id, row_number() OVER (ORDER BY id) rn FROM zoo_v)
        |SELECT max(rn) FROM t WHERE id IN (SELECT id FROM zoo_v)""".stripMargin)
      .as[Int].head() === 4)
    // DDL/DML shapes against catalog/views fail with SPARK's errors,
    // not the wrapper's (the wrapper's messages all name the manifest)
    for (q <- Seq(
      "ALTER TABLE zoo_v ADD COLUMNS (x STRING)",
      "TRUNCATE TABLE zoo_v",
      "SHOW PARTITIONS zoo_v",
      "DELETE FROM zoo_v WHERE id = 1",
      "UPDATE zoo_v SET id = 2",
      "CREATE TABLE zoo_missing_cat.t (id BIGINT)")) {
      val e = intercept[Exception] { spark.sql(q) }
      assert(!String.valueOf(e.getMessage).contains("manifest"),
        s"wrapper leaked into: $q -> ${e.getMessage}")
    }
    ()
  }

  test("stat tracking is sticky: CREATE declares it via TBLPROPERTIES, every later write keeps collecting") {
    import spark.implicits._
    val dir = freshDir("sqldml-stats")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (grp STRING, id BIGINT, payload STRING)
         |PARTITIONED BY (grp)
         |TBLPROPERTIES ('graft.statsCols' = 'id')""".stripMargin)
    spark.sql(s"INSERT INTO $t VALUES ('aa', 1, 'x'), ('aa', 9, 'y')")
    spark.sql(s"INSERT INTO $t VALUES ('bb', 20, 'z')") // plain append: must KEEP collecting
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    val dataFiles = m.files.filter(_.rows.exists(_ > 0))
    assert(dataFiles.nonEmpty &&
      dataFiles.forall(_.stats.contains("id")),
      s"every data file must carry id bounds: ${m.files.map(f => f.path -> f.stats.keys)}")
    // the Scala API inherits the same stickiness: one declared write,
    // then a plain append without options still collects
    val dir2 = freshDir("sqldml-stats2")
    ManifestLake.write(spark, Seq(("aa", 1L)).toDF("grp", "id"), dir2,
      Seq("grp"), statsCols = Seq("id"))
    ManifestLake.write(spark, Seq(("bb", 2L)).toDF("grp", "id"), dir2,
      Seq("grp"), replace = false) // no statsCols passed
    val (fs2, root2) = ManifestLake.fsFor(spark, dir2)
    val m2 = ManifestLake.readManifest(fs2, root2, 2L)
    assert(m2.files.forall(_.stats.contains("id")),
      s"append must inherit the declared stat columns: ${m2.files.map(f => f.path -> f.stats.keys)}")
    // DESCRIBE EXTENDED surfaces the declared tracking
    val ext = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("StatsCols") === "id")
    // a REPLACE resets the declaration, like every other header fact
    spark.sql(s"REPLACE TABLE $t AS SELECT 'cc' AS grp, 5L AS id")
    val m3 = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(m3.statsColsDefault.isEmpty)
    // unknown ENGINE-namespace TBLPROPERTIES still refuse (non-graft
    // keys store as user properties since round 19 — spec'd separately)
    val bad = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE `graft-manifest`.`${freshDir("sqldml-prop")}` " +
        "(id BIGINT) TBLPROPERTIES ('graft.foo' = 'bar')")
    }
    assert(bad.getMessage.contains("graft.statsCols"))
    ()
  }

  test("ANALYZE TABLE backfills per-file stats metadata-only; SHOW TBLPROPERTIES surfaces the declared machinery") {
    import spark.implicits._
    val dir = freshDir("sqldml-analyze")
    val t = s"`graft-manifest`.`$dir`"
    // a table written WITHOUT stats: files carry no bounds
    ManifestLake.write(spark,
      Seq(("aa", 1L, 10L), ("aa", 9L, 20L)).toDF("grp", "id", "n"),
      dir, Seq("grp"))
    ManifestLake.write(spark,
      Seq(("bb", 20L, 30L)).toDF("grp", "id", "n"),
      dir, Seq("grp"), replace = false)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    def head() = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(head().files.forall(_.stats.isEmpty))
    val dataPathsBefore = head().files.map(_.path).toSet
    // backfill: one metadata-only commit — bounds appear, files don't move
    val v = spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS id, n")
      .collect().head.getLong(0)
    assert(v === 3L)
    val m = head()
    assert(m.files.map(_.path).toSet === dataPathsBefore,
      "ANALYZE must not move or rewrite data files")
    assert(m.files.forall(f => f.stats.contains("id") && f.stats.contains("n")))
    assert(m.files.forall(_.rows.exists(_ > 0)))
    assert(m.statsColsDefault.toSet === Set("id", "n"), "columns join the sticky set")
    assert(m.op === Some("analyze"))
    // content identical before/after
    assert(ManifestLake.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 9L, 20L))
    // idempotent: nothing missing -> no new version
    assert(spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      .collect().head.getLong(0) === 3L)
    // a later plain append keeps collecting (sticky), so ANALYZE stays a no-op
    ManifestLake.write(spark, Seq(("bb", 40L, 50L)).toDF("grp", "id", "n"),
      dir, Seq("grp"), replace = false)
    assert(head().files.forall(_.stats.contains("id")))
    // SHOW TBLPROPERTIES
    val props = spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(props("graft.statsCols").split(",").toSet === Set("id", "n"))
    assert(props("provider") === "graft-manifest")
    assert(spark.sql(s"SHOW TBLPROPERTIES $t ('graft.partitionCols')")
      .collect().head.getString(1) === "grp")
    // refusals: NOSCAN, unknown column, partition column
    val noscan = intercept[IllegalArgumentException] {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS NOSCAN")
    }
    assert(noscan.getMessage.contains("NOSCAN"))
    intercept[IllegalArgumentException] {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS ghost")
    }
    val part = intercept[IllegalArgumentException] {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS grp")
    }
    assert(part.getMessage.contains("partition column"))
    ()
  }

  test("the direct SQL read plans the SAME single pruned, pushed-down, stats-skipping scan as the API read") {
    import spark.implicits._
    val dir = freshDir("sqldml-plan")
    val df = (0 until 200).map(i => (s"g${i % 2}", i.toLong, s"p$i"))
      .toDF("grp", "id", "payload")
      .repartitionByRange(4, col("id"))
    df.write.format("graft-manifest").partitionBy("grp")
      .option("statsCols", "id").mode("overwrite").save(dir)
    val q = spark.sql(
      s"""SELECT id, payload FROM `graft-manifest`.`$dir`
         |WHERE grp = 'g1' AND id >= 150""".stripMargin)
    assert(q.collect().length === 25)
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length === 1, "the direct SQL read must stay one scan node")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("grp"), s"partition filter must prune at the scan:\n$plan")
    assert(plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("GreaterThanOrEqual(id,150)"),
      s"data filter must push to parquet:\n$plan")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val g1Files = ManifestLake.readManifest(fs, root, 1L)
      .files.count(_.path.contains("grp=g1"))
    assert(scans.head.metrics("numFiles").value < g1Files,
      s"manifest stats must skip files: read " +
        s"${scans.head.metrics("numFiles").value} of $g1Files")
  }

  test("ANALYZE races: a concurrent append rebases and lands; a rewrite of a measured file is a loud conflict") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir("sqldml-an-race")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "x"), ("bb", 2L, "y")).toDF("grp", "id", "payload"),
      dir, Seq("grp"))
    // an APPEND between the backfill's scan and its publish: the
    // measured entries are untouched — the analyze rebases and lands
    ManifestLake.raceHook.set { op =>
      assert(op === "analyze")
      Await.result(Future {
        spark.sparkContext.clearJobGroup()
        ManifestLake.write(spark, Seq(("aa", 3L, "z")).toDF("grp", "id", "payload"),
          dir, Seq("grp"), replace = false)
      }, 2.minutes): Unit
    }
    val v = try ManifestLake.analyzeStats(spark, dir, Seq("id"))
      finally ManifestLake.raceHook.set(null)
    assert(v === 3L, "analyze must land AFTER the interloping append")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m = ManifestLake.readManifest(fs, root, v)
    assert(ManifestLake.read(spark, dir).count() === 3, "no rows lost")
    assert(m.files.filter(_.path.contains("grp=bb"))
      .forall(_.stats.contains("id")), "measured files keep their backfill")
    // an UPSERT that rewrites a measured file: the computed stats are
    // stale for that path — loud conflict, nothing publishes
    val dir2 = freshDir("sqldml-an-race2")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "x"), ("bb", 2L, "y")).toDF("grp", "id", "payload"),
      dir2, Seq("grp"))
    ManifestLake.raceHook.set { _ =>
      Await.result(Future {
        spark.sparkContext.clearJobGroup()
        ManifestLake.upsert(spark, dir2,
          Seq(("aa", 1L, "REWRITTEN")).toDF("grp", "id", "payload"),
          Seq("grp"), Seq("grp", "id"))
      }, 2.minutes): Unit
    }
    val e = try intercept[IllegalStateException] {
      ManifestLake.analyzeStats(spark, dir2, Seq("id"))
    } finally ManifestLake.raceHook.set(null)
    assert(e.getMessage.contains("rewrote or re-masked"))
    // the table is intact at the upsert's version, stats-less as before
    assert(ManifestLake.read(spark, dir2)
      .where(col("payload") === "REWRITTEN").count() === 1)
    ()
  }

  test("unsupported shapes refuse loudly: non-equi ON, schema evolution, partition-column SET") {
    import spark.implicits._
    seed(dirRef)
    Seq(("aa", 1L)).toDF("grp", "id").createOrReplaceTempView("sqldml_src4")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"MERGE INTO `graft-manifest`.`$dirRef` t USING sqldml_src4 s " +
        "ON t.grp = s.grp AND t.id > s.id WHEN MATCHED THEN DELETE")
    }
    assert(e1.getMessage.contains("conjunction of t.col = s.col"))
    // WITH SCHEMA EVOLUTION no longer refuses wholesale — but a
    // re-typed EXISTING column still does (the merge never widens)
    seed(dirRef + "-retype")
    Seq(("aa", "1")).toDF("grp", "id").createOrReplaceTempView("sqldml_src4b")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO " +
        s"`graft-manifest`.`${dirRef}-retype` t " +
        "USING sqldml_src4b s ON t.grp = s.grp AND t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e2.getMessage.contains("re-typed") ||
      e2.getMessage.contains("exact type"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE `graft-manifest`.`$dirRef` SET grp = 'cc' WHERE id = 1")
    }
    assert(e3.getMessage.toLowerCase.contains("partition"))
    // an explicit INSERT list missing a partition column refuses
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(s"MERGE INTO `graft-manifest`.`$dirRef` t USING sqldml_src4 s " +
        "ON t.grp = s.grp AND t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)")
    }
    assert(e4.getMessage.contains("partition column"))
  }
  private val dirRef = freshDir("sqldml-refuse")

  test("MERGE WITH SCHEMA EVOLUTION adds the source's new columns; untouched rows serve NULL") {
    import spark.implicits._
    val dir = freshDir("sqldml-evolve")
    seed(dir)                                                            // v1
    val v0 = ManifestLake.currentVersion(spark, dir).get
    (0 until 50).filter(_ % 5 == 0).map(i =>
      (if (i % 2 == 0) "aa" else "bb", i.toLong, s"NEW$i", i * 100L, s"t$i"))
      .toDF("grp", "id", "payload", "score", "tag")
      .createOrReplaceTempView("sqldml_evo_src")
    val st = spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO `graft-manifest`.`$dir` t
         |USING sqldml_evo_src s
         |ON t.grp = s.grp AND t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin).collect().head
    // the evolution folds into the merge's OWN commit: ONE version,
    // never an intermediate evolved-but-unmerged schema
    assert(ManifestLake.currentVersion(spark, dir).get === v0 + 1)
    // matched ids 0,5,...,35 -> 8 updates; source ids 40,45 insert
    assert((st.getLong(1), st.getLong(3)) === (8L, 2L))
    val r = ManifestLake.read(spark, dir)
    assert(r.columns.contains("tag"))
    assert(r.where(col("id") === 20L).select("tag").head().getString(0) === "t20")
    assert(r.where(col("id") === 45L).select("tag").head().getString(0) === "t45")
    assert(r.where(col("id") === 1L).select("tag").head().isNullAt(0),
      "untouched target rows serve NULL for the evolved column")
    assert(r.count() === 42)
    // the evolved column participates in later DML like any other
    spark.sql(s"UPDATE `graft-manifest`.`$dir` SET tag = 'x' WHERE id = 1")
    assert(ManifestLake.read(spark, dir).where(col("id") === 1L)
      .select("tag").head().getString(0) === "x")
  }

  test("MERGE WITH SCHEMA EVOLUTION is atomic: a failing merge leaves NO schema residue") {
    import spark.implicits._
    val dir = freshDir("sqldml-evolve-atomic")
    seed(dir)
    val v0 = ManifestLake.currentVersion(spark, dir).get
    val schema0 = ManifestLake.read(spark, dir).schema
    // duplicate source keys: admissibility fails AFTER classification —
    // under the old one-commit-per-column evolution the adds would
    // already have published; atomically, nothing may change
    Seq(("aa", 2L, "A", 1L, "dup1"), ("aa", 2L, "B", 2L, "dup2"))
      .toDF("grp", "id", "payload", "score", "tag")
      .createOrReplaceTempView("sqldml_evo_dup")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO `graft-manifest`.`$dir` t
           |USING sqldml_evo_dup s
           |ON t.grp = s.grp AND t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
    }
    assert(e.getMessage.contains("not key-unique"))
    assert(ManifestLake.currentVersion(spark, dir).get === v0,
      "a failed evolving merge must publish nothing")
    assert(ManifestLake.read(spark, dir).schema === schema0,
      "a failed evolving merge must leave no evolved-column residue")
    assert(!ManifestLake.read(spark, dir).columns.contains("tag"))
  }

  test("CTAS / REPLACE TABLE … AS SELECT read FROM manifest references, incl. VERSION AS OF (snapshot clone)") {
    import spark.implicits._
    val src = freshDir("sqldml-ctas-src")
    ManifestLake.write(spark,
      Seq(("aa", 1L), ("aa", 2L)).toDF("grp", "id"), src, Seq("grp")) // v1
    ManifestLake.write(spark,
      Seq(("bb", 3L)).toDF("grp", "id"), src, Seq("grp"),
      replace = false) // v2
    val s = s"`graft-manifest`.`$src`"
    // CTAS from the live head
    val clone1 = freshDir("sqldml-ctas-head")
    spark.sql(s"CREATE TABLE `graft-manifest`.`$clone1` USING `graft-manifest` " +
      s"PARTITIONED BY (grp) AS SELECT * FROM $s")
    assert(ManifestLake.read(spark, clone1).select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // CTAS from a PINNED version — the snapshot-clone idiom
    val clone2 = freshDir("sqldml-ctas-v1")
    spark.sql(s"CREATE TABLE `graft-manifest`.`$clone2` USING `graft-manifest` " +
      s"PARTITIONED BY (grp) AS SELECT * FROM $s VERSION AS OF 1")
    assert(ManifestLake.read(spark, clone2).select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
    // REPLACE TABLE … AS SELECT from a manifest reference
    spark.sql(s"REPLACE TABLE `graft-manifest`.`$clone2` USING `graft-manifest` " +
      s"PARTITIONED BY (grp) AS SELECT * FROM $s WHERE id > 1")
    assert(ManifestLake.read(spark, clone2).select("id").as[Long]
      .collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("MERGE ON `=` carries standard NULL semantics (NULL matches nothing); `<=>` opts into null-safe matching") {
    import spark.implicits._
    def seedNull(dir: String): Unit =
      ManifestLake.write(spark,
        Seq(("aa", Option(1L), "p1"), ("aa", Option.empty[Long], "pn"))
          .toDF("grp", "k", "payload"), dir, Seq("grp"))
    def srcView(name: String): Unit =
      Seq(("aa", Option(1L), "S1"), ("aa", Option.empty[Long], "SN"))
        .toDF("grp", "k", "payload").createOrReplaceTempView(name)
    // `=` spelling: the NULL-keyed source row matches NOTHING → INSERT;
    // the NULL-keyed target row stays untouched
    val dEq = freshDir("sqldml-nullk-eq")
    seedNull(dEq); srcView("sqldml_nullk_eq")
    val rEq = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dEq` t USING sqldml_nullk_eq s
         |ON t.grp = s.grp AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    assert((rEq.getLong(1), rEq.getLong(2), rEq.getLong(3)) === (1L, 0L, 1L),
      "1 update (k=1), 0 deletes, 1 insert (the NULL-keyed source row)")
    val tEq = ManifestLake.read(spark, dEq)
    assert(tEq.count() === 3)
    assert(tEq.where(col("k").isNull).select("payload").as[String]
      .collect().sorted.toSeq === Seq("SN", "pn"),
      "the NULL-keyed target row survives; the NULL-keyed source row inserts")
    assert(tEq.where(col("k") === 1L).select("payload").head().getString(0) === "S1")
    // `<=>` spelling: NULL matches NULL → UPDATE
    val dNs = freshDir("sqldml-nullk-ns")
    seedNull(dNs); srcView("sqldml_nullk_ns")
    val rNs = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dNs` t USING sqldml_nullk_ns s
         |ON t.grp = s.grp AND t.k <=> s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    assert((rNs.getLong(1), rNs.getLong(2), rNs.getLong(3)) === (2L, 0L, 0L))
    val tNs = ManifestLake.read(spark, dNs)
    assert(tNs.count() === 2)
    assert(tNs.where(col("k").isNull).select("payload").head().getString(0) === "SN")
    // TWO NULL-keyed source rows: independent inserts under `=` (they
    // can match no common target row), a duplicate-key refusal under
    // `<=>` (they name the same null-safe key)
    val dDup = freshDir("sqldml-nullk-dup")
    seedNull(dDup)
    Seq(("aa", Option.empty[Long], "N1"), ("aa", Option.empty[Long], "N2"))
      .toDF("grp", "k", "payload").createOrReplaceTempView("sqldml_nullk_2")
    val rDup = spark.sql(
      s"""MERGE INTO `graft-manifest`.`$dDup` t USING sqldml_nullk_2 s
         |ON t.grp = s.grp AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    assert(rDup.getLong(3) === 2L, "both NULL-keyed rows insert independently")
    assert(ManifestLake.read(spark, dDup).count() === 4)
    val eDup = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO `graft-manifest`.`$dDup` t USING sqldml_nullk_2 s
           |ON t.grp = s.grp AND t.k <=> s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(eDup.getMessage.contains("key-unique"))
  }

  test("INSERT OVERWRITE partial static PARTITION: static mode clears the WHOLE static prefix, dynamic mode only touched partitions") {
    import spark.implicits._
    def seed2(dir: String): Unit =
      ManifestLake.write(spark,
        Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L), ("b", "y", 4L))
          .toDF("p1", "p2", "id"), dir, Seq("p1", "p2"))
    def ids(dir: String): Seq[Long] =
      ManifestLake.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    // STATIC mode (the default): PARTITION (p1='a', p2) clears EVERY
    // p1='a' partition — including (a,y), which the batch writes no
    // rows for — in ONE commit
    val dSt = freshDir("sqldml-iow-static")
    seed2(dSt)
    val v0 = ManifestLake.currentVersion(spark, dSt).get
    spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dSt` " +
      "PARTITION (p1='a', p2) VALUES ('x', 10)")
    assert(ids(dSt) === Seq(3L, 4L, 10L),
      "(a,x) replaced, (a,y) cleared, b untouched")
    assert(ManifestLake.currentVersion(spark, dSt).get === v0 + 1,
      "prefix clear + replace is ONE commit")
    // an EMPTY batch under a partial static prefix still clears it
    spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dSt` " +
      "PARTITION (p1='b', p2) SELECT 'x', 99 WHERE FALSE")
    assert(ids(dSt) === Seq(10L), "every p1='b' partition cleared")
    // DYNAMIC mode: same statement replaces ONLY touched partitions
    val dDy = freshDir("sqldml-iow-dyn")
    seed2(dDy)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dDy` " +
        "PARTITION (p1='a', p2) VALUES ('x', 10)")
      assert(ids(dDy) === Seq(2L, 3L, 4L, 10L),
        "(a,x) replaced, (a,y) SURVIVES under dynamic mode")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // all-dynamic spec in static mode matches every partition — the
    // table replaces wholesale
    val dAll = freshDir("sqldml-iow-alldyn")
    seed2(dAll)
    spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dAll` " +
      "PARTITION (p1, p2) VALUES ('z', 'z', 7)")
    assert(ids(dAll) === Seq(7L))
    // refusals: a non-leading static column; a non-partition column
    val dRef = freshDir("sqldml-iow-refuse")
    seed2(dRef)
    val eLead = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dRef` " +
        "PARTITION (p2='x', p1) VALUES ('a', 8)")
    }
    assert(eLead.getMessage.contains("leading partition columns"),
      eLead.getMessage)
    val eCol = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE `graft-manifest`.`$dRef` " +
        "PARTITION (id=3) SELECT 'a', 'x' ")
    }
    assert(eCol.getMessage.contains("not a partition column"), eCol.getMessage)
    assert(ids(dRef) === Seq(1L, 2L, 3L, 4L), "refusals publish nothing")
  }

  test("maintenance SQL: OPTIMIZE [ZORDER BY] / DESCRIBE HISTORY / RESTORE / VACUUM drive the engine; vanilla DESCRIBE shapes pass through") {
    import spark.implicits._
    val dir = freshDir("sqldml-maint")
    def batch(lo: Int): org.apache.spark.sql.DataFrame =
      (lo until lo + 10).map(i =>
        (if (i % 2 == 0) "aa" else "bb", i.toLong, i * 3L)).toDF("grp", "id", "n")
    ManifestLake.write(spark, batch(0), dir, Seq("grp"))                 // v1
    ManifestLake.write(spark, batch(10), dir, Seq("grp"), replace = false) // v2
    ManifestLake.write(spark, batch(20), dir, Seq("grp"), replace = false) // v3
    val t = s"`graft-manifest`.`$dir`"
    // OPTIMIZE compacts the fragmented partitions; one row per rewrite
    val opt = spark.sql(s"OPTIMIZE $t").collect()
    assert(opt.nonEmpty && opt.forall(r => r.getInt(1) > r.getInt(2)),
      s"every rewritten partition must shrink: ${opt.mkString(", ")}")
    assert(ManifestLake.read(spark, dir).count() === 30)
    // DESCRIBE HISTORY: newest first, ops recorded, LIMIT honored
    val hist = spark.sql(s"DESCRIBE HISTORY $t").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(4L, 3L, 2L, 1L))
    assert(hist.head.getString(1) === "compact")
    assert(hist.last.getString(1) === "replace")
    assert(spark.sql(s"DESCRIBE HISTORY $t LIMIT 2")
      .collect().map(_.getLong(0)).toSeq === Seq(4L, 3L))
    // DESCRIBE DETAIL: the one-row operational summary
    val det = spark.sql(s"DESCRIBE DETAIL $t").collect()
    assert(det.length === 1)
    assert(det.head.getAs[Long]("version") === 4L)
    assert(det.head.getAs[String]("partition_cols") === "grp")
    // a table literally named detail still describes normally
    spark.range(2).createOrReplaceTempView("detail")
    assert(spark.sql("DESCRIBE detail").collect()
      .exists(_.getString(0) == "id"))
    // vanilla DESCRIBE shapes survive the interception untouched —
    // including a table literally named history
    spark.range(3).createOrReplaceTempView("history")
    assert(spark.sql("DESCRIBE history").collect()
      .exists(_.getString(0) == "id"))
    intercept[Exception] { // Spark's own error, not ours
      spark.sql("DESCRIBE HISTORY nonexistent_xyz").collect()
    }
    // RESTORE to v1: zero data I/O, v1's content is the new head
    val rv = spark.sql(s"RESTORE TABLE $t TO VERSION AS OF 1")
      .collect().head.getLong(0)
    assert(rv === 5L)
    assert(ManifestLake.read(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq === (0L until 10L))
    // VACUUM DRY RUN lists what a real run would reap, touches nothing
    val dry = spark.sql(s"VACUUM $t KEEP 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0)).toSet
    assert(dry.nonEmpty)
    assert(ManifestLake.readVersion(spark, dir, 3L).count() === 30,
      "DRY RUN must not reap")
    // the real run reaps exactly the dry-run list; head stays readable
    val gone = spark.sql(s"VACUUM $t KEEP 1 VERSIONS")
      .collect().map(_.getString(0)).toSet
    assert(gone === dry)
    assert(ManifestLake.read(spark, dir).count() === 10)
    intercept[Exception] {
      ManifestLake.readVersion(spark, dir, 3L).count()
    }
    // RETAIN n HOURS: a horizon WIDER than the table keeps every
    // version (only never-referenced junk like _SUCCESS markers reaps)
    val dir2 = freshDir("sqldml-maint2")
    ManifestLake.write(spark, batch(0), dir2, Seq("grp"))
    ManifestLake.write(spark, batch(10), dir2, Seq("grp"), replace = false)
    val t2 = s"`graft-manifest`.`$dir2`"
    // a BARE VACUUM defaults to the conservative 168-hour horizon (the
    // upstream's 7-day retention), NOT keep-2-versions: on this
    // minutes-old table it must reap no data file or manifest at all
    val bare = spark.sql(s"VACUUM $t2").collect().map(_.getString(0))
    assert(!bare.exists(p => p.endsWith(".parquet") || p.contains("_manifest")),
      s"bare VACUUM must be conservative (168h default), reaped: " +
        bare.mkString(", "))
    assert(ManifestLake.readVersion(spark, dir2, 1L).count() === 10,
      "time travel must survive a bare VACUUM on a young table")
    val reaped = spark.sql(s"VACUUM $t2 RETAIN 1000 HOURS")
      .collect().map(_.getString(0))
    assert(!reaped.exists(p => p.endsWith(".parquet") || p.contains("_manifest")),
      s"a horizon wider than the table must reap no data or manifests: " +
        reaped.mkString(", "))
    assert(ManifestLake.readVersion(spark, dir2, 1L).count() === 10)
    // OPTIMIZE ZORDER BY clusters on the named columns; a single
    // column degenerates to range clustering — both stay green
    spark.sql(s"OPTIMIZE $t2 ZORDER BY (id, n)")
    assert(ManifestLake.read(spark, dir2).count() === 20)
    spark.sql(s"OPTIMIZE $t2 ZORDER BY (id)")
    assert(ManifestLake.read(spark, dir2).count() === 20)
    // RESTORE ... TO TIMESTAMP AS OF resolves through versionAtTimestamp
    val (fs2, root2) = ManifestLake.fsFor(spark, dir2)
    val ts1 = fs2.getFileStatus(new org.apache.hadoop.fs.Path(root2,
      "_manifest/v000001.list.gz")).getModificationTime
    val expectV = ManifestLake.versionAtTimestamp(spark, dir2, ts1)
    val expectIds = ManifestLake.readVersion(spark, dir2, expectV)
      .select("id").as[Long].collect().sorted.toSeq
    spark.sql(s"RESTORE TABLE $t2 TO TIMESTAMP AS OF " +
      s"'${java.time.Instant.ofEpochMilli(ts1)}'")
    assert(ManifestLake.read(spark, dir2).select("id").as[Long]
      .collect().sorted.toSeq === expectIds)
    // refusals are loud and name the reason
    val eBad = intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM $t2 RETAIN 5 HOURS KEEP 2 VERSIONS")
    }
    assert(eBad.getMessage.contains("mutually exclusive"))
    spark.range(2).createOrReplaceTempView("sqldml_maint_plain")
    val eTgt = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE sqldml_maint_plain")
    }
    assert(eTgt.getMessage.contains("temp view that is not manifest-backed"),
      eTgt.getMessage)
    // an UNKNOWN bare name (no view, no table) still gets the
    // targets-manifest-tables refusal
    val eUnk = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE sqldml_maint_nosuch")
    }
    assert(eUnk.getMessage.contains("targets manifest tables"), eUnk.getMessage)
  }

  test("table_changes TVF: the row-level change feed through SQL, inclusive versions, timestamp bounds, empty windows") {
    import spark.implicits._
    val dir = freshDir("sqldml-tvf")
    ManifestLake.write(spark,
      Seq(("aa", 1L, "p1"), ("aa", 2L, "p2")).toDF("grp", "id", "payload"),
      dir, Seq("grp"))                                                   // v1
    ManifestLake.write(spark,
      Seq(("aa", 3L, "p3")).toDF("grp", "id", "payload"),
      dir, Seq("grp"), replace = false)                                  // v2
    spark.sql(s"DELETE FROM `graft-manifest`.`$dir` WHERE id = 1")       // v3
    // inclusive versions, Delta's convention: (t, 2, 2) is exactly v2
    def feed(sql: String): Seq[(String, Long, Long)] =
      spark.sql(sql).select(col("_change_type"), col("_commit_version"),
        col("id")).as[(String, Long, Long)].collect().sorted.toSeq
    assert(feed(s"SELECT * FROM table_changes('$dir', 2, 2)") ===
      Seq(("insert", 2L, 3L)))
    assert(feed(s"SELECT * FROM table_changes('$dir', 2, 3)") ===
      Seq(("delete", 3L, 1L), ("insert", 2L, 3L)))
    // end bound defaults to the head
    assert(feed(s"SELECT * FROM table_changes('$dir', 3)") ===
      Seq(("delete", 3L, 1L)))
    // the TVF result composes like any table reference
    assert(spark.sql(
      s"""SELECT count(*) FROM table_changes('$dir', 2, 3) c
         |JOIN `graft-manifest`.`$dir` t ON c.id = t.id
         |WHERE c._change_type = 'insert'""".stripMargin)
      .as[Long].head() === 1L)
    // the SAME rows the Scala API serves
    assert(feed(s"SELECT * FROM table_changes('$dir', 2, 3)") ===
      ManifestLake.readChangeFeed(spark, dir, 1L, 3L)
        .select(col("_change_type"), col("_commit_version"), col("id"))
        .as[(String, Long, Long)].collect().sorted.toSeq)
    // a temp-view name works as the table argument
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW sqldml_tvf_view
                 |USING `graft-manifest` OPTIONS (path '$dir')""".stripMargin)
    assert(feed("SELECT * FROM table_changes('sqldml_tvf_view', 3, 3)") ===
      Seq(("delete", 3L, 1L)))
    // timestamp bounds, Delta's CDF conventions: a START timestamp
    // includes every commit AT or after the instant (earliest such
    // version - 1 as the exclusive bound); an END timestamp is
    // latest-at-or-before. t1 is v1's own publish instant, so the
    // (t1, t2) window carries v1's initial inserts AND v2's
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val t1 = fs.getFileStatus(new org.apache.hadoop.fs.Path(root,
      "_manifest/v000001.list.gz")).getModificationTime
    val t2 = fs.getFileStatus(new org.apache.hadoop.fs.Path(root,
      "_manifest/v000002.list.gz")).getModificationTime
    val iso2 = java.time.Instant.ofEpochMilli(t2).toString
    val epochFrom = java.time.Instant.ofEpochMilli(t1).toString
    assert(feed(s"SELECT * FROM table_changes('$dir', '$epochFrom', '$iso2')")
      === Seq(("insert", 1L, 1L), ("insert", 1L, 2L), ("insert", 2L, 3L)))
    // a commit landing EXACTLY at the start timestamp is INCLUDED — the
    // exact-instant case the old latest-at-or-before resolution missed
    val atV2 = feed(s"SELECT * FROM table_changes('$dir', '$iso2', '$iso2')")
    assert(atV2.contains(("insert", 2L, 3L)),
      s"start == v2's publish instant must include v2's changes, got $atV2")
    assert(atV2.forall(_._2 >= 2L), "nothing before v2 may leak in")
    // a start timestamp after the last commit refuses loudly
    val eLate = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM table_changes('$dir', " +
        s"'${java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 3600000L).toString}')")
    }
    assert(eLate.getMessage.contains("at or after"))
    // an empty window is the empty frame WITH the feed's schema
    val empty = spark.sql(s"SELECT * FROM table_changes('$dir', 3, 3) " +
      "WHERE _change_type = 'nope'")
    assert(empty.columns.contains("_commit_version") && empty.count() === 0)
    val sameV = spark.sql(s"SELECT * FROM table_changes('$dir', 4, 3)")
    assert(sameV.columns.contains("_change_type") && sameV.count() === 0)
    // refusals: non-literal bounds, version 0, unknown table
    val eExpr = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM table_changes('$dir', now())")
    }
    assert(eExpr.getMessage.contains("literal"))
    val eZero = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM table_changes('$dir', 0)")
    }
    assert(eZero.getMessage.contains(">= 1"))
    // a non-string first argument is NOT claimed — Spark's own
    // unresolved-TVF error surfaces
    val eSpark = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes(42, 1)").collect()
    }
    assert(!eSpark.getMessage.contains("manifest"), eSpark.getMessage)
  }

  test("generated PARTITION columns through SQL CREATE: computed on write, validated when supplied, declaration order pinned") {
    import spark.implicits._
    val dir = freshDir("sqldml-genpart")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (
         |  id BIGINT, ts STRING,
         |  day STRING GENERATED ALWAYS AS (substring(ts, 1, 10)))
         |USING `graft-manifest` PARTITIONED BY (day)""".stripMargin)
    // a batch OMITTING the generated column: the engine computes it,
    // and the computed value drives the hive layout
    spark.sql(s"INSERT INTO $t BY NAME " +
      "SELECT * FROM VALUES (1L, '2026-01-02 10:00'), (2L, '2026-01-03 11:00') AS v(id, ts)")
    val r = ManifestLake.read(spark, dir)
    assert(r.count() === 2)
    assert(r.where(col("id") === 1L).select("day").head().getString(0) === "2026-01-02")
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).sorted
      === Array("day=2026-01-02", "day=2026-01-03"))
    // supplying the RIGHT value passes; a WRONG one refuses pre-publish
    spark.sql(s"INSERT INTO $t VALUES (3L, '2026-01-04 09:00', '2026-01-04')")
    assert(ManifestLake.read(spark, dir).count() === 3)
    val eBad = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (4L, '2026-01-05 09:00', '1999-01-01')")
    }
    assert(eBad.getMessage.contains("__gen_day") ||
      eBad.getMessage.toLowerCase.contains("constraint"), eBad.getMessage)
    assert(ManifestLake.read(spark, dir).count() === 3, "nothing published")
    // partition pruning rides the generated value like any hive dir
    assert(ManifestLake.read(spark, dir).where(col("day") === "2026-01-03")
      .select("id").head().getLong(0) === 2L)
    // declaration order: a non-partition generated column BEFORE the
    // generated partition column would silently permute — refuse
    val dir2 = freshDir("sqldml-genpart2")
    val eOrd = intercept[IllegalArgumentException] {
      spark.sql(
        s"""CREATE TABLE `graft-manifest`.`$dir2` (
           |  id BIGINT,
           |  twice BIGINT GENERATED ALWAYS AS (id * 2),
           |  day STRING GENERATED ALWAYS AS (CAST(id AS STRING)))
           |USING `graft-manifest` PARTITIONED BY (day)""".stripMargin)
    }
    assert(eOrd.getMessage.contains("declared before"), eOrd.getMessage)
    // and the accepted order composes: part-generated first, then others
    spark.sql(
      s"""CREATE TABLE `graft-manifest`.`$dir2` (
         |  id BIGINT,
         |  day STRING GENERATED ALWAYS AS (CAST(id % 2 AS STRING)),
         |  twice BIGINT GENERATED ALWAYS AS (id * 2))
         |USING `graft-manifest` PARTITIONED BY (day)""".stripMargin)
    spark.sql(s"INSERT INTO `graft-manifest`.`$dir2` (id) VALUES (7)")
    val r2 = ManifestLake.read(spark, dir2)
    assert(r2.columns.toSeq === Seq("id", "day", "twice"),
      "declared column order survives creation")
    assert(r2.select("day", "twice").head().toSeq === Seq("1", 14L))
  }

  test("SHOW CREATE TABLE emits runnable DDL: the clone accepts the original rows unchanged") {
    import spark.implicits._
    val dir = freshDir("sqldml-showcreate")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (
         |  id BIGINT, ts STRING, grp STRING,
         |  day STRING GENERATED ALWAYS AS (substring(ts, 1, 10)),
         |  CONSTRAINT pos_id CHECK (id > 0))
         |USING `graft-manifest` PARTITIONED BY (grp)
         |TBLPROPERTIES ('graft.statsCols' = 'id')""".stripMargin)
    spark.sql(s"INSERT INTO $t (id, ts, grp) VALUES " +
      "(1, '2026-01-02 10:00', 'aa'), (2, '2026-01-03 11:00', 'bb')")
    val stmt = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(stmt.contains("GENERATED ALWAYS AS"), stmt)
    assert(stmt.contains("CONSTRAINT `pos_id` CHECK (id > 0)"), stmt)
    assert(stmt.contains("PARTITIONED BY (`grp`)"), stmt)
    assert(stmt.contains("'graft.statsCols' = 'id'"), stmt)
    // the emitted DDL RUNS on a fresh path, and the original's rows
    // (generated column included — validated-as-supplied) land intact
    val clone = freshDir("sqldml-showcreate2")
    spark.sql(stmt.replace(dir, clone))
    spark.sql(s"INSERT INTO `graft-manifest`.`$clone` BY NAME " +
      s"SELECT * FROM $t")
    val a = ManifestLake.read(spark, dir).orderBy("id").collect().toSeq
    val b = ManifestLake.read(spark, clone)
      .select(ManifestLake.read(spark, dir).columns.map(col): _*)
      .orderBy("id").collect().toSeq
    assert(a === b)
    // the clone enforces the cloned constraint
    intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-manifest`.`$clone` (id, ts, grp) " +
        "VALUES (-1, '2026-01-04 09:00', 'aa')")
    }
    // vanilla SHOW CREATE TABLE stays Spark's own (temp views refuse
    // with SPARK's error, not ours)
    spark.range(2).createOrReplaceTempView("sqldml_sct_plain")
    val e = intercept[Exception] {
      spark.sql("SHOW CREATE TABLE sqldml_sct_plain").collect()
    }
    assert(!e.getMessage.contains("manifest"), e.getMessage)
  }

  test("table_changes plans distributed parquet scans with pushdown - no driver-side collect") {
    import spark.implicits._
    val dir = freshDir("sqldml-tvf-plan")
    ManifestLake.write(spark,
      (0 until 200).map(i => ("aa", i.toLong, s"p$i")).toDF("grp", "id", "payload"),
      dir, Seq("grp"), statsCols = Seq("id"))                            // v1
    ManifestLake.write(spark,
      (200 until 400).map(i => ("aa", i.toLong, s"p$i")).toDF("grp", "id", "payload"),
      dir, Seq("grp"), replace = false)                                  // v2
    val df = spark.sql(
      s"SELECT id, payload FROM table_changes('$dir', 2, 2) WHERE id > 390")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
      s"the TVF must serve a real distributed file scan:\n$plan")
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(id,390"),
      s"data-column predicates must push into the feed's scans:\n$plan")
    assert(df.count() === 9)
  }

  test("OPTIMIZE ... WHERE compacts exactly the selected partitions; data-column predicates refuse") {
    import spark.implicits._
    // a path CONTAINING the word "where" must not trip the quote-aware
    // predicate splitter
    val dir = Files.createTempDirectory("sqldml-where").toString + "/wherehouse/table"
    val t = s"`graft-manifest`.`$dir`"
    // two partitions, heavily fragmented (10 files each)
    (0 until 10).foreach { i =>
      ManifestLake.write(spark,
        Seq(("a", i.toLong, s"pa$i"), ("b", i.toLong, s"pb$i"))
          .toDF("part", "id", "payload").repartition(1),
        dir, Seq("part"), replace = i == 0)
    }
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    def filesByPart(): Map[String, Int] =
      ManifestLake.readManifest(fs, root,
        ManifestLake.currentVersion(spark, dir).get)
        .files.groupBy(f => f.path.split("/").find(_.contains("=")).getOrElse(""))
        .map { case (k, v) => k -> v.size }
    assert(filesByPart() === Map("part=a" -> 10, "part=b" -> 10))
    val before = ManifestLake.read(spark, dir).collect().toSet
    // compact ONLY part=a; b stays fragmented
    val report = spark.sql(s"OPTIMIZE $t WHERE part = 'a'").collect()
    assert(report.map(_.getString(0)).toSeq === Seq("part=a"),
      s"only the selected partition rewrites, got ${report.toSeq}")
    assert(report.head.getInt(1) === 10 && report.head.getInt(2) < 10)
    val after = filesByPart()
    assert(after("part=b") === 10, "the unselected partition must not move")
    assert(after("part=a") < 10)
    assert(ManifestLake.read(spark, dir).collect().toSet === before,
      "compaction is a content no-op")
    // WHERE composes with ZORDER BY; an already-compacted selection is a no-op
    assert(spark.sql(s"OPTIMIZE $t WHERE part = 'a' ZORDER BY (id)").collect()
      .map(_.getString(0)).forall(_ == "part=a"))
    // predicates beyond partition columns refuse loudly
    val e1 = intercept[Exception](spark.sql(s"OPTIMIZE $t WHERE payload = 'x'"))
    assert(e1.getMessage.contains("partition columns only"))
    val e2 = intercept[Exception](spark.sql(s"OPTIMIZE $t WHERE part ="))
    assert(e2.getMessage.contains("does not parse"))
    // a predicate matching nothing compacts nothing
    assert(spark.sql(s"OPTIMIZE $t WHERE part = 'zz'").collect().isEmpty)
  }

  test("FSCK REPAIR TABLE un-references out-of-band deletions; missing DV sidecars refuse") {
    import spark.implicits._
    val dir = freshDir("sqldml-fsck")
    val t = s"`graft-manifest`.`$dir`"
    (0 until 3).foreach { i =>
      ManifestLake.write(spark,
        Seq((s"p${i % 2}", i.toLong, s"v$i")).toDF("part", "id", "payload")
          .repartition(1),
        dir, Seq("part"), replace = i == 0)
    }
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val victim = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
      .files.find(_.path.contains("part=p1")).get.path
    // out-of-band deletion: scans now fail
    assert(fs.delete(new org.apache.hadoop.fs.Path(root, victim), false))
    intercept[Exception](ManifestLake.read(spark, dir).collect())
    // DRY RUN reports without repairing
    val headBefore = ManifestLake.currentVersion(spark, dir).get
    val dry = spark.sql(s"FSCK REPAIR TABLE $t DRY RUN").collect()
      .map(_.getString(0))
    assert(dry.toSeq === Seq(victim))
    assert(ManifestLake.currentVersion(spark, dir).get === headBefore)
    // the repair drops exactly the dangling entry; scans work again
    assert(spark.sql(s"FSCK REPAIR TABLE $t").collect()
      .map(_.getString(0)).toSeq === Seq(victim))
    assert(ManifestLake.read(spark, dir).select("id").as[Long]
      .collect().toSet === Set(0L, 2L))
    // idempotent: a clean table reports nothing and publishes nothing
    val headAfter = ManifestLake.currentVersion(spark, dir).get
    assert(spark.sql(s"FSCK REPAIR TABLE $t").collect().isEmpty)
    assert(ManifestLake.currentVersion(spark, dir).get === headAfter)
    // a live file whose DV sidecar vanished refuses (both repairs lossy)
    val dvDir = freshDir("sqldml-fsck-dv")
    ManifestLake.write(spark,
      (0 until 8).map(i => ("a", i.toLong, s"x$i")).toDF("part", "id", "payload"),
      dvDir, Seq("part"))
    ManifestLake.delete(spark, dvDir, col("id") % 2 === 0,
      deletionVectors = true)
    val (dfs, droot) = ManifestLake.fsFor(spark, dvDir)
    val dvRef = ManifestLake.readManifest(dfs, droot,
      ManifestLake.currentVersion(spark, dvDir).get)
      .files.flatMap(_.dv).head
    assert(dfs.delete(new org.apache.hadoop.fs.Path(droot, dvRef), true))
    val e = intercept[Exception](
      spark.sql(s"FSCK REPAIR TABLE `graft-manifest`.`$dvDir`").collect())
    assert(e.getMessage.contains("ambiguous"))
    // a vanished BLOOM sidecar is unambiguous: FSCK un-references it
    // (scans already degrade to no-skip) — the entry and its rows stay
    val blDir = freshDir("sqldml-fsck-bloom")
    ManifestLake.write(spark,
      (0 until 8).map(i => ("a", i.toLong, s"x$i")).toDF("part", "id", "payload"),
      blDir, Seq("part"), bloomCols = Seq("payload"))
    val (bfs, broot) = ManifestLake.fsFor(spark, blDir)
    def blHead() = ManifestLake.readManifest(bfs, broot,
      ManifestLake.currentVersion(spark, blDir).get)
    val blRef = blHead().files.flatMap(_.bloom).head
    assert(bfs.delete(new org.apache.hadoop.fs.Path(broot, blRef), true))
    val tb = s"`graft-manifest`.`$blDir`"
    assert(spark.sql(s"FSCK REPAIR TABLE $tb DRY RUN").collect()
      .map(_.getString(0)).toSeq === Seq(blRef))
    assert(spark.sql(s"FSCK REPAIR TABLE $tb").collect()
      .map(_.getString(0)).toSeq === Seq(blRef))
    assert(blHead().files.forall(f => !f.bloom.contains(blRef)),
      "the dangling bloom ref must be gone")
    assert(ManifestLake.read(spark, blDir).count() === 8,
      "bloom repair must not drop rows")
    assert(spark.sql(s"FSCK REPAIR TABLE $tb").collect().isEmpty)
    // a bloom-only fsck keeps the path set — the row-level change feed
    // spans it (serves nothing for it), never refuses
    assert(ManifestLake.readChangeFeed(spark, blDir, 0L,
      ManifestLake.currentVersion(spark, blDir).get)
      .where(col("_change_type") === "insert").count() === 8)
  }

  test("maintenance statements refuse malformed shapes with the REAL reason, never a generic syntax error") {
    import spark.implicits._
    val dir = freshDir("sqldml-maint-neg")
    ManifestLake.write(spark,
      Seq(("aa", 1L)).toDF("grp", "id"), dir, Seq("grp"))
    val t = s"`graft-manifest`.`$dir`"
    def refusal(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { spark.sql(sql) }
      assert(e.getMessage.contains(needle), s"$sql -> ${e.getMessage}")
    }
    refusal(s"VACUUM $t RETAIN x HOURS", "integer")
    refusal(s"VACUUM $t KEEP 0 VERSIONS", "at least 1")
    refusal(s"VACUUM $t FROBNICATE", "VACUUM options")
    refusal(s"OPTIMIZE $t ZORDER BY ()", "at least one column")
    refusal(s"OPTIMIZE $t SORT BY (id)", "OPTIMIZE options")
    refusal(s"RESTORE TABLE $t", "RESTORE needs TO VERSION AS OF")
    refusal(s"RESTORE TABLE $t TO VERSION AS OF 'one'", "integer")
    refusal("VACUUM nonexistent_view_xyz", "targets manifest tables")
    // RESTORE to a vacuumed/never-published version is the ENGINE's
    // typed error (names the available versions)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"RESTORE TABLE $t TO VERSION AS OF 99")
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    // nothing above published anything
    assert(ManifestLake.currentVersion(spark, dir).contains(1L))
  }

  test("multi-column ALTER COLUMN pre-validates the whole list: an inadmissible second widen applies NOTHING") {
    import spark.implicits._
    val dir = freshDir("sqldml-widen-pre")
    ManifestLake.write(spark,
      Seq(("aa", 1, 7), ("bb", 2, 9)).toDF("grp", "n", "m"), dir, Seq("grp"))
    val t = s"`graft-manifest`.`$dir`"
    val v0 = ManifestLake.currentVersion(spark, dir).get
    // second widen is a narrowing — the WHOLE statement refuses and
    // the first column keeps its type (no half-applied commit)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT, m TYPE SMALLINT")
    }
    assert(e.getMessage.contains("value-preserving"), e.getMessage)
    assert(ManifestLake.currentVersion(spark, dir).get === v0,
      "nothing committed")
    assert(ManifestLake.read(spark, dir).schema("n").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // an unknown second column likewise applies nothing
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT, nope TYPE BIGINT")
    }
    assert(e2.getMessage.contains("no column named nope"), e2.getMessage)
    assert(ManifestLake.currentVersion(spark, dir).get === v0)
    // the same column twice in one statement is ill-formed
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT, n TYPE BIGINT")
    }
    assert(e3.getMessage.contains("twice"), e3.getMessage)
    // the happy multi-column path commits one version per column
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n TYPE BIGINT, m TYPE BIGINT")
    val sch = ManifestLake.read(spark, dir).schema
    assert(sch("n").dataType === org.apache.spark.sql.types.LongType)
    assert(sch("m").dataType === org.apache.spark.sql.types.LongType)
    assert(ManifestLake.currentVersion(spark, dir).get === v0 + 2)
  }

  test("SET/UNSET TBLPROPERTIES flips stats tracking on a LIVE table: SET → ANALYZE → skipping engages; unknown keys refuse") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import spark.implicits._
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def walk(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
        case s: FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }) ++ (p.children ++ p.subqueries).flatMap(walk)
      walk(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val dir = freshDir("sqldml-props")
    // created WITHOUT any stats declaration; ids range-clustered across
    // files so min/max skipping CAN bite once stats exist
    val df = (0 until 2000).map(i => ("aa", i.toLong, s"p$i"))
      .toDF("grp", "id", "payload")
      .repartitionByRange(10, col("id"))
    ManifestLake.write(spark, df, dir, Seq("grp"))
    val t = s"`graft-manifest`.`$dir`"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val total = ManifestLake.readManifest(
        ManifestLake.fsFor(spark, dir)._1, ManifestLake.fsFor(spark, dir)._2,
        1L).files.length
      val before = scanFiles(
        ManifestLake.read(spark, dir).where(col("id") === 1500L))
      assert(before === total.toLong, "no stats yet — nothing can skip")
      // flip the table fact through SQL, then backfill
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.statsCols' = 'id')")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      val after = scanFiles(
        ManifestLake.read(spark, dir).where(col("id") === 1500L))
      assert(after < before,
        s"stats skipping must engage after SET + ANALYZE ($after vs $before)")
      assert(ManifestLake.read(spark, dir)
        .where(col("id") === 1500L).count() === 1L)
      // SHOW TBLPROPERTIES reflects the live fact
      val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.statsCols").contains("id"))
      // unknown ENGINE-namespace keys refuse loudly — never silently
      // recorded (non-graft keys store as user properties, round 19)
      val e = intercept[IllegalArgumentException] {
        spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.foo' = 'bar')")
      }
      assert(e.getMessage.contains("not supported"), e.getMessage)
      // partition columns refuse — they prune by directory
      val e2 = intercept[IllegalArgumentException] {
        spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.statsCols' = 'grp')")
      }
      assert(e2.getMessage.contains("partition column"), e2.getMessage)
      // UNSET clears; a second bare UNSET refuses (nothing to clear);
      // IF EXISTS tolerates both an absent and an unknown key
      spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.statsCols')")
      val (fs, root) = ManifestLake.fsFor(spark, dir)
      val head = ManifestLake.currentVersion(spark, dir).get
      assert(ManifestLake.readManifest(fs, root, head).statsColsDefault.isEmpty)
      val e3 = intercept[IllegalArgumentException] {
        spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.statsCols')")
      }
      assert(e3.getMessage.contains("not set"), e3.getMessage)
      spark.sql(
        s"ALTER TABLE $t UNSET TBLPROPERTIES IF EXISTS ('graft.statsCols', 'foo')")
      // bloom tracking flips the same way: future writes carry sidecars
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.bloomCols' = 'payload')")
      ManifestLake.write(spark,
        Seq(("aa", 9001L, "p9001")).toDF("grp", "id", "payload"),
        dir, Seq("grp"), replace = false)
      val headM = ManifestLake.readManifest(fs, root,
        ManifestLake.currentVersion(spark, dir).get)
      assert(headM.bloomCols === Seq("payload"))
      assert(headM.files.exists(_.bloom.isDefined),
        "the post-SET append must carry a bloom sidecar")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("user TBLPROPERTIES store verbatim: CREATE + SET + UNSET + renders; " +
    "unknown graft.* keys still refuse") {
    import spark.implicits._
    val dir = freshDir("sqldml-uprops")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (id BIGINT) USING `graft-manifest` " +
      "TBLPROPERTIES ('team' = 'data-eng', 'pipeline.stage' = 'bronze')")
    def props() = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("team").contains("data-eng"))
    assert(props().get("pipeline.stage").contains("bronze"))
    // SET replaces one key, leaves the other; survives an append
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('team' = 'ml')")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    assert(props().get("team").contains("ml"))
    assert(props().get("pipeline.stage").contains("bronze"))
    // SHOW CREATE renders them runnable; the round-trip carries them
    val stmt = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(stmt.contains("'team' = 'ml'") &&
      stmt.contains("'pipeline.stage' = 'bronze'"), stmt)
    val dir2 = freshDir("sqldml-uprops-rt")
    spark.sql(stmt.replace(dir, dir2))
    assert(spark.sql(s"SHOW TBLPROPERTIES `graft-manifest`.`$dir2`").collect()
      .exists(r => r.getString(0) == "team" && r.getString(1) == "ml"))
    // UNSET removes; IF EXISTS tolerates absence; engine keys coexist
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('team')")
    assert(!props().contains("team"))
    val e0 = intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('team')"))
    assert(e0.getMessage.contains("not set"), e0.getMessage)
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES IF EXISTS ('team')")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.statsCols' = 'id')")
    assert(props().get("graft.statsCols").contains("id"))
    assert(props().get("pipeline.stage").contains("bronze"))
    // unknown ENGINE-namespace keys refuse — never silently recorded
    val e1 = intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.nope' = 'x')"))
    assert(e1.getMessage.contains("not supported"), e1.getMessage)
    // the comment key routes to COMMENT ON, not the property store
    val e2 = intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('comment' = 'x')"))
    assert(e2.getMessage.contains("COMMENT ON TABLE"), e2.getMessage)
  }

  test("COMMENTs are header facts: CREATE/ALTER/COMMENT ON record them, " +
    "DESCRIBE + SHOW CREATE render, renames carry, drops remove") {
    val dir = freshDir("sqldml-comment")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (
         |  grp STRING COMMENT 'partition bucket',
         |  id BIGINT NOT NULL COMMENT 'the key',
         |  payload STRING)
         |USING `graft-manifest` PARTITIONED BY (grp)
         |COMMENT 'round-trip demo table'""".stripMargin)
    val (tc, cc) = ManifestLake.comments(spark, dir)
    assert(tc.contains("round-trip demo table"))
    assert(cc === Map("grp" -> "partition bucket", "id" -> "the key"))
    // DESCRIBE: comment column carries comment and the NOT NULL marker
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
    assert(desc.exists(r => r.getString(0) == "id" &&
      r.getString(2) == "not null; the key"), desc.mkString("\n"))
    assert(desc.exists(r => r.getString(0) == "grp" &&
      r.getString(2) == "partition bucket"))
    assert(desc.exists(r => r.getString(0) == "Comment" &&
      r.getString(1) == "round-trip demo table"))
    // SHOW TBLPROPERTIES exposes the conventional 'comment' key
    assert(spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .exists(r => r.getString(0) == "comment" &&
        r.getString(1) == "round-trip demo table"))
    // SHOW CREATE renders runnable COMMENT clauses (quote-escaped)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN payload COMMENT 'it''s text'")
    val stmt = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(stmt.contains("`id` BIGINT NOT NULL COMMENT 'the key'"), stmt)
    assert(stmt.contains("COMMENT 'it''s text'"), stmt)
    assert(stmt.contains("\nCOMMENT 'round-trip demo table'"), stmt)
    val dir2 = freshDir("sqldml-comment-rt")
    spark.sql(stmt.replace(dir, dir2))
    assert(ManifestLake.comments(spark, dir2) ===
      ((Some("round-trip demo table"),
        Map("grp" -> "partition bucket", "id" -> "the key",
          "payload" -> "it's text"))))
    // COMMENT ON TABLE sets and IS NULL drops
    spark.sql(s"COMMENT ON TABLE $t IS 'updated'")
    assert(ManifestLake.comments(spark, dir)._1.contains("updated"))
    spark.sql(s"COMMENT ON TABLE $t IS NULL")
    assert(ManifestLake.comments(spark, dir)._1.isEmpty)
    // ADD COLUMN with COMMENT records it
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING COMMENT 'freeform'")
    assert(ManifestLake.comments(spark, dir)._2.get("note").contains("freeform"))
    // rename carries the fact under the new name; drop removes it
    spark.sql(s"ALTER TABLE $t RENAME COLUMN note TO remark")
    assert(ManifestLake.comments(spark, dir)._2.get("remark").contains("freeform"))
    spark.sql(s"ALTER TABLE $t DROP COLUMN remark")
    assert(!ManifestLake.comments(spark, dir)._2.contains("remark"))
    // a comment commit is metadata-only: the stream-safe op kind
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).op.contains("schema"))
    // refusals: control chars, nested fields, mixing with TYPE changes
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t ALTER COLUMN payload COMMENT 'bad\ttext'"))
    assert(e1.getMessage.contains("tabs or newlines"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t ALTER COLUMN id COMMENT 'x', payload TYPE STRING"))
    assert(e2.getMessage.contains("separate"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t ALTER COLUMN nope COMMENT 'x'"))
    assert(e3.getMessage.contains("no column"), e3.getMessage)
  }

  test("REORG TABLE … APPLY (PURGE) rewrites exactly the DV-masked files; " +
    "clean files stay by reference") {
    import spark.implicits._
    val dir = freshDir("sqldml-reorg")
    val t = s"`graft-manifest`.`$dir`"
    // two partitions, several files each; DV-delete touches only p0
    ManifestLake.write(spark,
      (0 until 40).map(i => (s"p${i % 2}", i.toLong, s"v$i"))
        .toDF("part", "id", "payload").repartition(4),
      dir, Seq("part"))
    ManifestLake.delete(spark, dir,
      col("part") === "p0" && col("id") % 4 === 0, deletionVectors = true)
    def files() = {
      val (fs, root) = ManifestLake.fsFor(spark, dir)
      ManifestLake.readManifest(fs, root,
        ManifestLake.currentVersion(spark, dir).get).files
    }
    val before = files()
    val clean = before.filter(_.dv.isEmpty).map(_.path).toSet
    assert(before.exists(_.dv.isDefined), "setup must mask some files")
    val expect = ManifestLake.read(spark, dir)
      .select("id").as[Long].collect().toSet
    val rows = spark.sql(s"REORG TABLE $t APPLY (PURGE)").collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "part=p0"),
      s"only the masked partition may rewrite, got ${rows.mkString(", ")}")
    val after = files()
    assert(after.forall(_.dv.isEmpty), "PURGE must materialize every mask")
    assert(clean.subsetOf(after.map(_.path).toSet),
      "clean files must carry by reference, not rewrite")
    assert(ManifestLake.read(spark, dir)
      .select("id").as[Long].collect().toSet === expect,
      "content is invariant under the purge")
    // idempotent: a mask-free table is a no-op (no rows, no commit)
    val head = ManifestLake.currentVersion(spark, dir).get
    assert(spark.sql(s"REORG TABLE $t APPLY (PURGE)").collect().isEmpty)
    assert(ManifestLake.currentVersion(spark, dir).get === head)
    // WHERE scopes by partition; malformed shapes refuse loudly
    ManifestLake.delete(spark, dir, col("id") % 9 === 1, deletionVectors = true)
    val scoped = spark.sql(s"REORG TABLE $t WHERE part = 'p1' APPLY (PURGE)")
      .collect()
    assert(scoped.nonEmpty && scoped.forall(_.getString(0) == "part=p1"))
    assert(files().filter(_.path.contains("part=p0")).exists(_.dv.isDefined),
      "the unscoped partition keeps its mask")
    val e = intercept[IllegalArgumentException](
      spark.sql(s"REORG TABLE $t APPLY (VACUUM)"))
    assert(e.getMessage.contains("APPLY (PURGE)"), e.getMessage)
  }

  test("CLUSTER BY is a header fact: bare OPTIMIZE lays files out by the " +
    "declared keys; renders, flips, and refuses") {
    import spark.implicits._
    val dirC = freshDir("sqldml-cluster")
    val dirL = freshDir("sqldml-cluster-ctl")
    val t = s"`graft-manifest`.`$dirC`"
    spark.sql(
      s"""CREATE TABLE $t (id BIGINT, x BIGINT, y BIGINT)
         |USING `graft-manifest` CLUSTER BY (x, y)
         |TBLPROPERTIES ('graft.statsCols' = 'x,y')""".stripMargin)
    spark.sql(s"CREATE TABLE `graft-manifest`.`$dirL` " +
      "(id BIGINT, x BIGINT, y BIGINT) USING `graft-manifest` " +
      "TBLPROPERTIES ('graft.statsCols' = 'x,y')")
    // every appended file spans BOTH value ranges — nothing skips until
    // a rewrite actually clusters
    val rows = (0 until 20000).map(i =>
      (i.toLong, (i % 64).toLong, ((i * 37) % 64).toLong))
      .toDF("id", "x", "y").repartition(3)
    (1 to 4).foreach { _ =>
      ManifestLake.write(spark, rows, dirC, Seq.empty, replace = false,
        statsCols = Seq("x", "y"))
      ManifestLake.write(spark, rows, dirL, Seq.empty, replace = false,
        statsCols = Seq("x", "y"))
    }
    def files(path: String): Seq[ManifestLake.LiveFile] = {
      val (fs, root) = ManifestLake.fsFor(spark, path)
      ManifestLake.readManifest(fs, root,
        ManifestLake.currentVersion(spark, path).get).files
    }
    val target = files(dirC).map(_.bytes).sum / 8 + 1
    // bare compact — NO layout args: the clustered table z-orders by
    // its declared keys, the control round-robins
    assert(ManifestLake.compact(spark, dirC, targetBytes = target).nonEmpty)
    assert(ManifestLake.compact(spark, dirL, targetBytes = target).nonEmpty)
    def overlapping(path: String): Int = files(path).count { f =>
      Seq("x", "y").forall(c => f.stats.get(c).forall { case (lo, hi) =>
        lo.toLong <= 7L && hi.toLong >= 0L })
    }
    assert(files(dirC).size > 1 && files(dirL).size > 1,
      "the comparison needs multiple post-compact files on both sides")
    assert(overlapping(dirC) < overlapping(dirL),
      s"declared clustering must skip files a round-robin layout cannot " +
        s"(clustered ${overlapping(dirC)}/${files(dirC).size} vs control " +
        s"${overlapping(dirL)}/${files(dirL).size})")
    // content is invariant under the layout
    assert(ManifestLake.read(spark, dirC).count() === 80000)
    // SQL OPTIMIZE without ZORDER rides the same declaration (further
    // compacts at the default target; must not require a re-spell)
    spark.sql(s"OPTIMIZE $t").collect()
    // now the table is ONE well-compacted file: bare OPTIMIZE is a
    // no-op, but OPTIMIZE FULL re-lays it out anyway — the verb for
    // applying clustering (or a new declaration) to compacted data
    assert(spark.sql(s"OPTIMIZE $t").collect().isEmpty,
      "an already-compacted clustered table must be a bare-OPTIMIZE no-op")
    val fullRows = spark.sql(s"OPTIMIZE $t FULL").collect()
    assert(fullRows.nonEmpty && fullRows.forall(_.getInt(1) >= 1),
      s"OPTIMIZE FULL must rewrite regardless of fragmentation, got " +
        fullRows.mkString(", "))
    assert(ManifestLake.read(spark, dirC).count() === 80000)
    // renders: SHOW CREATE carries a runnable CLUSTER BY clause,
    // properties expose it, DESCRIBE EXTENDED lists it
    val stmt = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(stmt.contains("CLUSTER BY (`x`, `y`)"), stmt)
    val dirRt = freshDir("sqldml-cluster-rt")
    spark.sql(stmt.replace(dirC, dirRt))
    val props = spark.sql(s"SHOW TBLPROPERTIES `graft-manifest`.`$dirRt`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.clusterCols").contains("x,y"))
    // flips live: SET replaces, UNSET clears (bare OPTIMIZE then
    // round-robins again)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.clusterCols' = 'y')")
    assert(spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .exists(r => r.getString(0) == "graft.clusterCols" && r.getString(1) == "y"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.clusterCols')")
    assert(spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .exists(r => r.getString(0) == "graft.clusterCols" && r.getString(1).isEmpty))
    // refusals: unknown column, partition column, double declaration
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE `graft-manifest`.`${freshDir("sqldml-cl-bad")}` " +
        "(id BIGINT) USING `graft-manifest` CLUSTER BY (nope)")
    }
    assert(e1.getMessage.contains("not a declared column"), e1.getMessage)
    // (Spark's own grammar already refuses CLUSTER BY + PARTITIONED BY
    // in one statement — the property spelling reaches OUR refusal)
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE `graft-manifest`.`${freshDir("sqldml-cl-part")}` " +
        "(grp STRING, id BIGINT) USING `graft-manifest` " +
        "PARTITIONED BY (grp) TBLPROPERTIES ('graft.clusterCols' = 'grp')")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.clusterCols' = 'id')")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.clusterCols' = 'zz')")
    }
    assert(e3.getMessage.contains("not a table column"), e3.getMessage)
    // a SINGLE declared key range-clusters lexicographically (no curve)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.clusterCols' = 'x')")
    (1 to 4).foreach(_ => ManifestLake.write(spark, rows, dirC, Seq.empty,
      replace = false, statsCols = Seq("x", "y")))
    assert(ManifestLake.compact(spark, dirC,
      targetBytes = files(dirC).map(_.bytes).sum / 8 + 1).nonEmpty)
    val xTight = files(dirC).count(f => f.stats.get("x").exists {
      case (lo, hi) => hi.toLong - lo.toLong <= 16L })
    assert(xTight > 0, "single-key clustering must narrow x bounds")
  }

  test("NOT NULL is first-class DDL: lowers to the reserved CHECK pair, " +
    "enforces on write, renders back, ALTER COLUMN SET/DROP NOT NULL") {
    import spark.implicits._
    val dir = freshDir("sqldml-notnull")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (
         |  grp STRING, id BIGINT NOT NULL, payload STRING,
         |  CONSTRAINT pos_id CHECK (id >= 0))
         |USING `graft-manifest` PARTITIONED BY (grp)""".stripMargin)
    // the lowering is the documented CHECK pair — visible to the engine
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    def headM() = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(headM().constraints.get("graft_nn_id").contains("`id` IS NOT NULL"))
    // enforcement rides every write: a null id refuses, table untouched
    spark.sql(s"INSERT INTO $t VALUES ('aa', 1, 'p1'), ('bb', 2, NULL)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES ('aa', NULL, 'p3')")
    }
    assert(e.getMessage.contains("graft_nn_id"), e.getMessage)
    assert(ManifestLake.read(spark, dir).count() === 2)
    // SHOW CREATE renders NOT NULL on the column line, NOT as a
    // CONSTRAINT line; the hand-declared CHECK still renders
    val stmt = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    assert(stmt.contains("`id` BIGINT NOT NULL"), stmt)
    assert(!stmt.contains("graft_nn_id"), stmt)
    assert(stmt.contains("CONSTRAINT `pos_id` CHECK (id >= 0)"), stmt)
    // DESCRIBE surfaces it in the comment column and hides the lowering
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
    assert(desc.exists(r => r.getString(0) == "id" &&
      r.getString(2) == "not null"), desc.mkString("\n"))
    assert(!desc.exists(r => r.getString(0).contains("graft_nn_id")),
      desc.mkString("\n"))
    // DROP NOT NULL lifts the invariant; nulls then insert
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id DROP NOT NULL")
    assert(!headM().constraints.contains("graft_nn_id"))
    spark.sql(s"INSERT INTO $t VALUES ('aa', NULL, 'p3')")
    assert(ManifestLake.read(spark, dir).where(col("id").isNull).count() === 1)
    // SET NOT NULL validates EXISTING rows first — refuses on the null
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id SET NOT NULL")
    }
    assert(e2.getMessage.contains("existing rows violate"), e2.getMessage)
    spark.sql(s"DELETE FROM $t WHERE id IS NULL")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id SET NOT NULL")
    assert(headM().constraints.get("graft_nn_id").contains("`id` IS NOT NULL"))
    // a second SET refuses as already-not-null; DROP on a never-declared
    // column refuses with a typed message
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id SET NOT NULL")
    }
    assert(e3.getMessage.contains("already NOT NULL"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN payload DROP NOT NULL")
    }
    assert(e4.getMessage.contains("carries no NOT NULL"), e4.getMessage)
    // the emitted DDL is runnable and re-lowers: round-trip to a fresh
    // path, then the same null refusal fires there
    val dir2 = freshDir("sqldml-notnull-rt")
    spark.sql(spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
      .replace(dir, dir2))
    val e5 = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-manifest`.`$dir2` VALUES ('aa', NULL, 'x')")
    }
    assert(e5.getMessage.contains("graft_nn_id"), e5.getMessage)
    // a hand-declared CHECK that merely reuses the reserved name refuses
    // at CREATE (it would collide with the lowering on rename/render)
    val e6 = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE `graft-manifest`.`${freshDir("sqldml-nn-clash")}` (
           |  id BIGINT NOT NULL,
           |  CONSTRAINT graft_nn_id CHECK (id > 5))
           |USING `graft-manifest`""".stripMargin)
    }
    assert(e6.getMessage.contains("reserved"), e6.getMessage)
    // mixing NOT NULL with TYPE/DEFAULT in one statement refuses
    val e7 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN payload SET NOT NULL, " +
        "id TYPE DECIMAL(20,0)")
    }
    assert(e7.getMessage.contains("separate"), e7.getMessage)
  }
}
