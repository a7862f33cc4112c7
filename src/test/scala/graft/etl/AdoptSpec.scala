package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-place adoption of an existing parquet directory (the CONVERT TO
  * DELTA idiom): the v1 manifest is built OVER the files already there
  * — byte-identical file set, zero data movement — and the full engine
  * surface (DML, time travel, SQL, skipping) then runs on the
  * directory. Pins: layout discovery, partition-type round-trip
  * canonicality, second-adopt refusal, post-adopt DML correctness, and
  * the SQL `CONVERT TO GRAFT` spelling.
  */
class AdoptSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def listParquet(dir: String): Set[(String, Long)] = {
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val out = Set.newBuilder[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.toString.contains("/_") &&
        !st.getPath.toString.contains("/data/"))
        out += ((st.getPath.toString, st.getLen))
    }
    out.result()
  }

  test("adopt a plain hive-partitioned tree: zero file movement, then DML + time travel work") {
    import spark.implicits._
    val dir = freshDir("mlake-adopt")
    val df = (0 until 200).map(i =>
      (if (i % 2 == 0) "aa" else "bb", i.toLong, s"p$i"))
      .toDF("grp", "id", "payload")
    // a PLAIN spark write — no manifest anywhere
    df.write.partitionBy("grp").parquet(dir)
    val before = listParquet(dir)
    assert(before.nonEmpty)
    val v = ManifestLake.adopt(spark, dir, statsCols = Seq("id"))
    assert(v === 1L)
    // byte-identical file set — adoption moved nothing
    assert(listParquet(dir) === before)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val m = ManifestLake.readManifest(fs, root, 1L)
    assert(m.partCols === Seq("grp"))
    assert(m.files.length === before.size)
    assert(m.statsColsDefault === Seq("id"))
    // reads serve the adopted rows; partition values are typed STRING
    val r = ManifestLake.read(spark, dir)
    assert(r.count() === 200L)
    assert(r.schema("grp").dataType === org.apache.spark.sql.types.StringType)
    assert(r.where(col("grp") === "aa").count() === 100L)
    // DML runs on the adopted table: delete rewrites ONLY matched files
    val vDel = ManifestLake.delete(spark, dir, col("id") < 10L)
    assert(vDel === 2L)
    assert(ManifestLake.read(spark, dir).count() === 190L)
    // time travel back to the adopted snapshot
    assert(ManifestLake.readVersion(spark, dir, 1L).count() === 200L)
    // appends land in the engine layout and coexist with adopted files
    ManifestLake.write(spark, Seq(("cc", 900L, "x")).toDF("grp", "id", "payload"),
      dir, Seq("grp"), replace = false)
    assert(ManifestLake.read(spark, dir).count() === 191L)
    // ANALYZE backfills stats onto the adopted files → skipping engages
    ManifestLake.analyzeStats(spark, dir)
    val head = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get)
    assert(head.files.filter(f => !f.path.startsWith("data/"))
      .forall(_.stats.contains("id")),
      "ANALYZE must backfill adopted files' id bounds")
    // a second adopt refuses — the history would be orphaned
    val e = intercept[IllegalArgumentException] {
      ManifestLake.adopt(spark, dir)
    }
    assert(e.getMessage.contains("already a manifest table"))
  }

  test("partition-type declaration: canonical values adopt typed; non-canonical refuse; flat dirs adopt too") {
    import spark.implicits._
    val dir = freshDir("mlake-adopt-typed")
    (1 to 50).map(i => (i % 3, i.toLong)).toDF("p", "id")
      .write.partitionBy("p").parquet(dir)
    val v = ManifestLake.adopt(spark, dir,
      partitionTypes = Map("p" -> org.apache.spark.sql.types.IntegerType))
    assert(v === 1L)
    val r = ManifestLake.read(spark, dir)
    assert(r.schema("p").dataType === org.apache.spark.sql.types.IntegerType)
    assert(r.where(col("p") === 1).count() === 17L)
    // partition-targeted DML renders the SAME dir spelling: overwrite
    // exactly p=2 (works only if typed values round-trip canonically)
    ManifestLake.overwritePartitions(spark, dir,
      Seq((2, 999L)).toDF("p", "id"), staticPrefix = Seq("p" -> "2"))
    assert(ManifestLake.read(spark, dir).where(col("p") === 2)
      .select("id").as[Long].collect().toSeq === Seq(999L))
    // NON-canonical dir spelling under a declared type refuses loudly
    val dir2 = freshDir("mlake-adopt-noncanon")
    Seq((1L, "x")).toDF("id", "v").write.parquet(dir2 + "/p=01")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.adopt(spark, dir2,
        partitionTypes = Map("p" -> org.apache.spark.sql.types.IntegerType))
    }
    assert(e.getMessage.contains("round-trip"), e.getMessage)
    // …but adopts fine as the default STRING
    assert(ManifestLake.adopt(spark, dir2) === 1L)
    assert(ManifestLake.read(spark, dir2).where(col("p") === "01").count() === 1L)
    // a FLAT (unpartitioned) tree adopts with no partition columns
    val dir3 = freshDir("mlake-adopt-flat")
    (0 until 30).map(_.toLong).toDF("id").write.parquet(dir3)
    assert(ManifestLake.adopt(spark, dir3) === 1L)
    assert(ManifestLake.read(spark, dir3).count() === 30L)
  }

  test("SQL CONVERT TO GRAFT adopts; reference-layout Lake.write output converts and queries") {
    import spark.implicits._
    val dir = freshDir("mlake-convert-sql")
    (0 until 60).map(i => (s"chr${i % 2 + 1}", i.toLong % 5, i.toLong, s"s$i"))
      .toDF("chrom", "pos_bucket", "pos", "payload")
      .createOrReplaceTempView("adopt_src")
    // the reference's own output layout (repartition + partitionBy)
    Lake.write(spark.table("adopt_src"), dir)
    val row = spark.sql(s"CONVERT TO GRAFT parquet.`$dir` " +
      "PARTITIONED BY (chrom STRING, pos_bucket BIGINT)").collect().head
    assert(row.getLong(0) === 1L && row.getLong(1) > 0L)
    // the adopted table serves SQL like any manifest table
    assert(spark.sql(s"SELECT count(*) FROM `graft-manifest`.`$dir`")
      .as[Long].head() === 60L)
    assert(spark.sql(
      s"SELECT count(*) FROM `graft-manifest`.`$dir` WHERE chrom = 'chr1'")
      .as[Long].head() === 30L)
    spark.sql(s"DELETE FROM `graft-manifest`.`$dir` WHERE pos < 6")
    assert(spark.sql(s"SELECT count(*) FROM `graft-manifest`.`$dir`")
      .as[Long].head() === 54L)
    // converting an already-manifested path refuses through SQL too
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO GRAFT parquet.`$dir`")
    }
    assert(e.getMessage.contains("already a manifest table"))
    // nothing to adopt refuses
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO GRAFT `${freshDir("mlake-convert-empty")}`")
    }
    assert(e2.getMessage.contains("no directory") ||
      e2.getMessage.contains("nothing to adopt"), e2.getMessage)
  }
}
