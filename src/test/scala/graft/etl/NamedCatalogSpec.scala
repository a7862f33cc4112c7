package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NAMED manifest tables through the DSv2 catalog plugin
  * (`spark.sql.catalog.graft=graft.etl.GraftCatalog`): every verb the
  * path spelling supports works by `graft.ns.t` name — CREATE/CTAS,
  * INSERT, MERGE/UPDATE/DELETE, ALTER, SET TBLPROPERTIES, time travel,
  * maintenance, table_changes — plus the catalog-only surface: SHOW
  * TABLES/NAMESPACES, DROP TABLE, spark.table(), df.writeTo() verbs.
  * The two spellings address the SAME table state (the filesystem IS
  * the catalog).
  */
class NamedCatalogSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark = {
    val s = graft.TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", "graft.etl.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    s
  }

  test("CREATE / INSERT / SELECT by name; name and path spellings address the same table") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ns1.t1 (grp STRING, id BIGINT, payload STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO graft.ns1.t1 VALUES ('aa', 1, 'p1'), ('bb', 2, 'p2')")
    assert(spark.sql("SELECT id FROM graft.ns1.t1 ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // the path spelling reads the same state
    val path = s"$warehouse/ns1/t1"
    assert(spark.sql(s"SELECT count(*) FROM `graft-manifest`.`$path`")
      .as[Long].head() === 2L)
    // and a path-side mutation is visible by name
    ManifestLake.write(spark, Seq(("cc", 3L, "p3")).toDF("grp", "id", "payload"),
      path, Seq("grp"), replace = false)
    assert(spark.sql("SELECT count(*) FROM graft.ns1.t1").as[Long].head() === 3L)
    // SHOW TABLES sees it; tableExists through the catalog API
    val shown = spark.sql("SHOW TABLES IN graft.ns1").collect().map(_.getString(1))
    assert(shown.contains("t1"))
    assert(spark.catalog.tableExists("graft.ns1.t1"))
  }

  test("MERGE clause matrix + UPDATE + DELETE by name; qualified references resolve") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ns1.t2 (grp STRING, id BIGINT, payload STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO graft.ns1.t2 " +
      "VALUES ('aa', 1, 'p1'), ('aa', 2, 'p2'), ('bb', 3, 'p3')")
    Seq(("aa", 1L, "U1", "u"), ("aa", 2L, "D2", "d"), ("aa", 9L, "I9", "i"))
      .toDF("grp", "id", "payload", "op").createOrReplaceTempView("named_src")
    val st = spark.sql(
      """MERGE INTO graft.ns1.t2 t USING named_src s
        |ON t.grp = s.grp AND t.id = s.id
        |WHEN MATCHED AND s.op = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET payload = s.payload
        |WHEN NOT MATCHED THEN INSERT (grp, id, payload) VALUES (s.grp, s.id, s.payload)
        |""".stripMargin).collect().head
    assert((st.getLong(1), st.getLong(2), st.getLong(3)) === (1L, 1L, 1L))
    // UNALIASED: the table name itself qualifies references
    spark.sql("UPDATE graft.ns1.t2 SET payload = upper(payload) WHERE id = 3")
    assert(spark.sql("SELECT payload FROM graft.ns1.t2 WHERE id = 3")
      .as[String].head() === "P3")
    spark.sql("DELETE FROM graft.ns1.t2 WHERE graft.ns1.t2.id = 9")
    assert(spark.sql("SELECT count(*) FROM graft.ns1.t2").as[Long].head() === 2L)
  }

  test("ALTER chain + SET TBLPROPERTIES + ANALYZE + time travel + maintenance + table_changes by name") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ns1.t3 (grp STRING, id BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO graft.ns1.t3 VALUES ('aa', 1), ('bb', 2)")      // v2
    spark.sql("ALTER TABLE graft.ns1.t3 ADD COLUMNS (note STRING)")        // v3
    spark.sql("ALTER TABLE graft.ns1.t3 RENAME COLUMN note TO remark")     // v4
    spark.sql("ALTER TABLE graft.ns1.t3 ALTER COLUMN id TYPE DECIMAL(20,0)") // v5
    val cols = spark.sql("SELECT * FROM graft.ns1.t3").schema
    assert(cols.fieldNames.toSeq === Seq("grp", "id", "remark"))
    assert(cols("id").dataType ===
      org.apache.spark.sql.types.DecimalType(20, 0))
    spark.sql("ALTER TABLE graft.ns1.t3 SET TBLPROPERTIES ('graft.statsCols' = 'id')")
    spark.sql("ANALYZE TABLE graft.ns1.t3 COMPUTE STATISTICS")
    val props = spark.sql("SHOW TBLPROPERTIES graft.ns1.t3").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.statsCols").contains("id"))
    // time travel by name (SQL) — v2 predates the ALTERs
    assert(spark.sql("SELECT * FROM graft.ns1.t3 VERSION AS OF 2")
      .schema.fieldNames.toSeq === Seq("grp", "id"))
    // maintenance by name
    assert(spark.sql("DESCRIBE HISTORY graft.ns1.t3").collect().length >= 5)
    spark.sql("OPTIMIZE graft.ns1.t3")
    // the change feed TVF accepts the dotted name
    val feed = spark.sql("SELECT * FROM table_changes('graft.ns1.t3', 2, 2)")
    assert(feed.where(col("_change_type") === "insert").count() === 2L)
  }

  test("spark.table() and df.writeTo() verbs reach the engine; bad shapes refuse") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ns2.w (grp STRING, id BIGINT) PARTITIONED BY (grp)")
    // writeTo.append commits through the manifest
    Seq(("aa", 1L), ("bb", 2L)).toDF("grp", "id").writeTo("graft.ns2.w").append()
    assert(spark.table("graft.ns2.w").count() === 2L)
    // column order differs — byName alignment handles it
    Seq((3L, "aa")).toDF("id", "grp").writeTo("graft.ns2.w").append()
    assert(spark.table("graft.ns2.w").where(col("id") === 3L).count() === 1L)
    // store-assignment cast: an INT batch column lands in the BIGINT
    // table column (DSv2 byName semantics)
    Seq(("bb", 7)).toDF("grp", "id").writeTo("graft.ns2.w").append()
    assert(spark.table("graft.ns2.w").where(col("id") === 7L).count() === 1L)
    // dynamic partition overwrite: only 'aa' swaps
    Seq(("aa", 10L)).toDF("grp", "id").writeTo("graft.ns2.w").overwritePartitions()
    val r = spark.table("graft.ns2.w").select("grp", "id").as[(String, Long)]
      .collect().toSet
    assert(r === Set(("aa", 10L), ("bb", 2L), ("bb", 7L)))
    // truncate-overwrite replaces wholesale
    Seq(("cc", 99L)).toDF("grp", "id").writeTo("graft.ns2.w").overwrite(lit(true))
    assert(spark.table("graft.ns2.w").select("grp", "id").as[(String, Long)]
      .collect().toSeq === Seq(("cc", 99L)))
    // the engine validated every commit (5 writeTo commits + create)
    val hist = spark.sql("DESCRIBE HISTORY graft.ns2.w").collect()
    assert(hist.length === 6)
    // a conditional overwrite refuses loudly — no vanilla fall-through
    val e = intercept[Exception] {
      Seq(("aa", 1L)).toDF("grp", "id").writeTo("graft.ns2.w")
        .overwrite(col("grp") === "aa")
    }
    assert(e.getMessage.contains("truncate"), e.getMessage)
    // a batch missing a column refuses
    val e2 = intercept[Exception] {
      Seq("aa").toDF("grp").writeTo("graft.ns2.w").append()
    }
    assert(e2.getMessage.contains("missing") ||
      e2.getMessage.toLowerCase.contains("cannot"), e2.getMessage)
  }

  test("namespaces, DROP TABLE, rename, and safety refusals") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE graft.ns3")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("ns3"))
    spark.sql("CREATE TABLE graft.ns3.d (grp STRING, id BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO graft.ns3.d VALUES ('aa', 1)")
    // DROP of a NAMED table deletes the managed directory
    spark.sql("DROP TABLE graft.ns3.d")
    assert(!spark.catalog.tableExists("graft.ns3.d"))
    assert(!new java.io.File(s"$warehouse/ns3/d/_manifest").exists())
    // identifier segments that would escape the warehouse refuse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.ns3.`..` (id BIGINT)")
    }
    assert(e.getMessage.contains("illegal catalog identifier"), e.getMessage)
    // a two-part name routes through the default namespace
    spark.sql("CREATE TABLE graft.two (grp STRING, id BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO graft.two VALUES ('aa', 7)")
    assert(spark.sql("SELECT id FROM graft.default.two").as[Long].head() === 7L)
    assert(new java.io.File(s"$warehouse/default/two/_manifest").exists())
    // CTAS by name, reading a named table
    spark.sql("CREATE TABLE graft.ns3.clone PARTITIONED BY (grp) AS " +
      "SELECT * FROM graft.default.two")
    assert(spark.sql("SELECT id FROM graft.ns3.clone").as[Long].head() === 7L)
    // non-graft references pass through untouched
    spark.range(3).createOrReplaceTempView("vanilla_v")
    assert(spark.sql("SELECT count(*) FROM vanilla_v").as[Long].head() === 3L)
  }

  test("USE graft.ns: unqualified names resolve for every verb; temp views still win") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ns4")
    spark.sql("USE graft.ns4")
    try {
      // CREATE + INSERT + SELECT + DML + ALTER + maintenance, all bare
      spark.sql("CREATE TABLE u (grp STRING, id BIGINT, payload STRING) " +
        "PARTITIONED BY (grp)")
      spark.sql("INSERT INTO u VALUES ('aa', 1, 'p1'), ('bb', 2, 'p2')")
      assert(spark.sql("SELECT count(*) FROM u").as[Long].head() === 2L)
      spark.sql("UPDATE u SET payload = upper(payload) WHERE id = 1")
      assert(spark.sql("SELECT payload FROM u WHERE id = 1")
        .as[String].head() === "P1")
      Seq(("aa", 1L, "M1"), ("aa", 9L, "M9")).toDF("grp", "id", "payload")
        .createOrReplaceTempView("named_use_src")
      spark.sql(
        """MERGE INTO u t USING named_use_src s
          |ON t.grp = s.grp AND t.id = s.id
          |WHEN MATCHED THEN UPDATE SET payload = s.payload
          |WHEN NOT MATCHED THEN INSERT (grp, id, payload)
          |  VALUES (s.grp, s.id, s.payload)""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM u").as[Long].head() === 3L)
      spark.sql("DELETE FROM u WHERE id = 9")
      spark.sql("ALTER TABLE u ADD COLUMNS (note STRING)")
      assert(spark.table("u").columns.contains("note"))
      assert(spark.sql("DESCRIBE HISTORY u").collect().length >= 5)
      assert(spark.sql("SELECT * FROM table_changes('u', 2, 2)")
        .count() === 2L)
      // the underlying path is the warehouse dir
      assert(ManifestLake.read(spark, s"$warehouse/ns4/u").count() === 2L)
      // a TEMP VIEW with the same name wins over the catalog table —
      // Spark's own resolution order, preserved
      spark.range(7).createOrReplaceTempView("u_view_probe")
      assert(spark.sql("SELECT count(*) FROM u_view_probe").as[Long].head() === 7L)
    } finally spark.sql("USE spark_catalog.default")
  }

  test("CONVERT TO GRAFT adopts INTO a catalog name; RESTORE/VACUUM work by name") {
    import spark.implicits._
    // a plain parquet tree already sitting under the warehouse layout
    val plainDir = s"$warehouse/ns6/adopted"
    Seq(("aa", 1L), ("bb", 2L), ("aa", 3L)).toDF("grp", "id")
      .write.partitionBy("grp").parquet(plainDir)
    val row = spark.sql("CONVERT TO GRAFT graft.ns6.adopted").collect().head
    assert(row.getLong(0) === 1L)
    // immediately addressable by name, full lifecycle
    assert(spark.sql("SELECT count(*) FROM graft.ns6.adopted")
      .as[Long].head() === 3L)
    spark.sql("DELETE FROM graft.ns6.adopted WHERE id = 2")               // v2
    assert(spark.table("graft.ns6.adopted").count() === 2L)
    spark.sql("RESTORE TABLE graft.ns6.adopted TO VERSION AS OF 1")       // v3
    assert(spark.table("graft.ns6.adopted").count() === 3L)
    val reaped = spark.sql("VACUUM graft.ns6.adopted KEEP 1 VERSIONS")
      .collect().map(_.getString(0))
    assert(!reaped.exists(_.contains("grp=")),
      s"vacuum must never reap ADOPTED data files, got ${reaped.mkString(", ")}")
    assert(spark.table("graft.ns6.adopted").count() === 3L)
  }

  test("df.writeTo(...).create() / createOrReplace() / replace() reach the engine") {
    import spark.implicits._
    // create with partitioning through the programmatic route
    Seq(("aa", 1L), ("bb", 2L)).toDF("grp", "id")
      .writeTo("graft.ns5.c").partitionedBy(col("grp")).create()
    assert(spark.table("graft.ns5.c").count() === 2L)
    val (fs, root) = ManifestLake.fsFor(spark, s"$warehouse/ns5/c")
    assert(ManifestLake.readManifest(fs, root, 1L).partCols === Seq("grp"))
    // a second create refuses (the table exists)
    val e = intercept[Exception] {
      Seq(("cc", 3L)).toDF("grp", "id").writeTo("graft.ns5.c").create()
    }
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    // createOrReplace replaces wholesale
    Seq(("cc", 3L)).toDF("grp", "id")
      .writeTo("graft.ns5.c").partitionedBy(col("grp")).createOrReplace()
    assert(spark.table("graft.ns5.c").select("id").as[Long]
      .collect().toSeq === Seq(3L))
    // the replaced table keeps working through SQL
    spark.sql(s"INSERT INTO graft.ns5.c VALUES ('dd', 4)")
    assert(spark.table("graft.ns5.c").count() === 2L)
  }

  test("a non-manifest temp view SHADOWS a same-named catalog table: DML and maintenance never fall through to the table") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ns7")
    spark.sql("USE graft.ns7")
    try {
      spark.sql("CREATE TABLE sh (grp STRING, id BIGINT) PARTITIONED BY (grp)")
      spark.sql("INSERT INTO sh VALUES ('aa', 1), ('bb', 2)")
      // an ORDINARY temp view (not manifest-backed) takes the name —
      // Spark's resolution order puts local temp views first, so every
      // single-part-name verb must now see the VIEW, never the table
      spark.range(5).toDF("id").createOrReplaceTempView("sh")
      try {
        // reads resolve the view (Spark's own order, preserved)
        assert(spark.sql("SELECT count(*) FROM sh").as[Long].head() === 5L)
        // DML declines to claim → Spark picks the view and refuses with
        // ITS error; the catalog table is untouched
        val eU = intercept[Exception] {
          spark.sql("UPDATE sh SET id = 99 WHERE id = 1") }
        assert(!eU.getMessage.contains("manifest"),
          s"shadowed UPDATE must surface Spark's error, got: ${eU.getMessage}")
        val eD = intercept[Exception] { spark.sql("DELETE FROM sh WHERE id = 1") }
        assert(!eD.getMessage.contains("manifest"), eD.getMessage)
        intercept[Exception] {
          spark.sql("MERGE INTO sh t USING (SELECT 1 AS id) s ON t.id = s.id " +
            "WHEN MATCHED THEN DELETE") }
        // maintenance refuses LOUDLY naming the shadow (no Spark grammar
        // to fall back to)
        val eV = intercept[Exception] { spark.sql("VACUUM sh") }
        assert(eV.getMessage.contains("temp view"), eV.getMessage)
        val eT = intercept[Exception] {
          spark.sql("SELECT * FROM table_changes('sh', 1)").collect() }
        assert(eT.getMessage.contains("temp view"), eT.getMessage)
        // the catalog table is byte-for-byte intact underneath
        assert(spark.sql("SELECT count(*) FROM graft.ns7.sh").as[Long].head() === 2L)
        assert(spark.sql("SELECT id FROM graft.ns7.sh WHERE id = 1").count() === 1L)
        // the QUALIFIED spelling still mutates the table
        spark.sql("DELETE FROM graft.ns7.sh WHERE id = 2")
        assert(spark.sql("SELECT count(*) FROM graft.ns7.sh").as[Long].head() === 1L)
      } finally spark.catalog.dropTempView("sh")
      // with the view gone, the bare name reaches the table again
      spark.sql("UPDATE sh SET id = 42 WHERE id = 1")
      assert(spark.sql("SELECT id FROM sh").as[Long].head() === 42L)
    } finally spark.sql("USE spark_catalog.default")
  }

  test("writeTo casts honor storeAssignmentPolicy: ANSI overflow fails LOUDLY, LEGACY wraps, inadmissible casts refuse at analysis") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ns8.cast (grp STRING, n INT) PARTITIONED BY (grp)")
    // in-range values store fine through the by-name cast
    Seq(("aa", 7L)).toDF("grp", "n").writeTo("graft.ns8.cast").append()
    assert(spark.table("graft.ns8.cast").select("n").as[Int].head() === 7)
    // ANSI (the default policy): a LONG overflowing INT fails the JOB,
    // never silently wraps into the table
    val eOv = intercept[Exception] {
      Seq(("aa", 4000000000L)).toDF("grp", "n")
        .writeTo("graft.ns8.cast").append() }
    assert(eOv.getMessage != null)
    assert(spark.table("graft.ns8.cast").count() === 1L,
      "the overflowing append must not land rows")
    // a cast ANSI store assignment forbids (struct into INT) refuses at
    // analysis time with the writeTo message
    val eBad = intercept[Exception] {
      Seq(("aa", (1, 2))).toDF("grp", "n").writeTo("graft.ns8.cast").append() }
    assert(eBad.getMessage.contains("cannot cast") ||
      eBad.getMessage.toLowerCase.contains("cast"), eBad.getMessage)
    // LEGACY policy: Spark itself disallows it for DSv2 writes at
    // analysis — OUR path must surface that refusal, not bypass it
    spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")
    try {
      val eLeg = intercept[Exception] {
        Seq(("aa", 4000000000L)).toDF("grp", "n")
          .writeTo("graft.ns8.cast").append() }
      assert(eLeg.getMessage.contains("LEGACY store assignment"),
        eLeg.getMessage)
      assert(spark.table("graft.ns8.cast").count() === 1L)
    } finally spark.conf.set("spark.sql.storeAssignmentPolicy", "ANSI")
  }

  test("programmatic createTable refuses a USER location; a comment is RECORDED (round 19)") {
    import spark.implicits._
    val eLoc = intercept[Exception] {
      Seq(("aa", 1L)).toDF("grp", "id").writeTo("graft.ns8.badloc")
        .tableProperty("location", "/somewhere/else").create() }
    assert(eLoc.getMessage.contains("LOCATION"), eLoc.getMessage)
    assert(!spark.catalog.tableExists("graft.ns8.badloc"))
    // comments are header facts now — the property records instead of
    // refusing, and DESCRIBE/SHOW CREATE render it
    Seq(("aa", 1L)).toDF("grp", "id").writeTo("graft.ns8.withcom")
      .tableProperty("comment", "a note").create()
    val p = GraftCatalog.identPath(spark, Seq("graft", "ns8", "withcom")).get
    assert(ManifestLake.comments(spark, p)._1.contains("a note"))
  }
}
