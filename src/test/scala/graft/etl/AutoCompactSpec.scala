package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Write-time bin packing: a table that opts in via
  * `graft.autoCompact.targetFileBytes` gets its small files packed by a
  * follow-on commit as soon as a partition accumulates
  * `graft.autoCompact.minNumFiles` of them — streaming sinks and
  * frequent tiny appends stop fragmenting until someone remembers to
  * OPTIMIZE. Content is invariant, the ledger shows the extra compact
  * commit, right-sized files are never rewritten, and a table without
  * the property never auto-fires.
  */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def liveFiles(dir: String): Seq[ManifestLake.LiveFile] = {
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).files
  }

  private def history(dir: String): Seq[String] = {
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    (1L to ManifestLake.currentVersion(spark, dir).get)
      .map(v => ManifestLake.readManifest(fs, root, v).op.getOrElse(""))
  }

  test("N tiny appends fire auto-compact once; content invariant; ledger shows it") {
    import spark.implicits._
    val dir = freshDir("autocompact")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) USING `graft-manifest` " +
      "TBLPROPERTIES ('graft.autoCompact.targetFileBytes' = '1048576', " +
      "'graft.autoCompact.minNumFiles' = '4')")
    // CREATE itself stages one zero-row part file, so the live count
    // starts at 1; two tiny appends stay below minNumFiles=4
    (0 until 2).foreach { i =>
      ManifestLake.write(spark,
        Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), dir,
        Seq.empty, replace = false)
    }
    assert(liveFiles(dir).length === 3, "below the threshold nothing packs")
    assert(!history(dir).contains("compact"))
    // the third append makes 4 small files -> ONE follow-on compact
    ManifestLake.write(spark,
      Seq((2L, "r2")).toDF("id", "v").coalesce(1), dir,
      Seq.empty, replace = false)
    val files = liveFiles(dir)
    assert(files.length === 1,
      s"4 tiny files must pack to one (got ${files.length})")
    assert(history(dir).count(_ == "compact") === 1,
      s"exactly one auto-compact commit: ${history(dir)}")
    // content invariant
    assert(spark.sql(s"SELECT count(*), count(DISTINCT id) FROM $t").head()
      .toSeq === Seq(3L, 3L))
    // and the packed state resets the counter: one more tiny append
    // leaves 2 files (1 packed + 1 new), no re-fire
    ManifestLake.write(spark,
      Seq((4L, "r4")).toDF("id", "v").coalesce(1), dir,
      Seq.empty, replace = false)
    assert(liveFiles(dir).length === 2)
    assert(history(dir).count(_ == "compact") === 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 4L)
  }

  test("right-sized files are never rewritten; partitions pack independently") {
    import spark.implicits._
    val dir = freshDir("autocompact-big")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (grp STRING, id BIGINT, pad STRING) " +
      s"USING `graft-manifest` PARTITIONED BY (grp) " +
      "TBLPROPERTIES ('graft.autoCompact.targetFileBytes' = '4096', " +
      "'graft.autoCompact.minNumFiles' = '3')")
    // one file well over the 4KB target in partition a — per-row
    // DISTINCT padding, or parquet compresses the fixture under it
    ManifestLake.write(spark,
      (0 until 400).map(i => ("a", i.toLong,
        java.util.UUID.nameUUIDFromBytes(Array(i.toByte, (i >> 8).toByte))
          .toString * 4)).toDF("grp", "id", "pad")
        .coalesce(1), dir, Seq("grp"), replace = false)
    val bigPath = liveFiles(dir).head.path
    assert(liveFiles(dir).head.bytes > 4096,
      s"fixture must exceed the target (got ${liveFiles(dir).head.bytes})")
    // three tiny appends to partition a (crosses minNumFiles=3 counting
    // only SMALL files), plus one tiny file in partition b (below)
    (0 until 3).foreach { i =>
      ManifestLake.write(spark,
        Seq(("a", (1000 + i).toLong, "t")).toDF("grp", "id", "pad")
          .coalesce(1), dir, Seq("grp"), replace = false)
    }
    ManifestLake.write(spark,
      Seq(("b", 2000L, "t")).toDF("grp", "id", "pad").coalesce(1),
      dir, Seq("grp"), replace = false)
    val after = liveFiles(dir)
    // partition a: big file UNTOUCHED (same manifest path), 3 tiny -> 1
    assert(after.exists(_.path == bigPath),
      "an already-right-sized file must never be rewritten by auto-compact")
    val aFiles = after.filter(_.path.contains("/grp=a/"))
    assert(aFiles.length === 2,
      s"partition a must hold the big file + one packed file: " +
        s"${aFiles.map(f => s"${f.path}(${f.bytes})")}")
    // partition b: 1 small file, below threshold, untouched
    assert(after.count(_.path.contains("/grp=b/")) === 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 404L)
  }

  test("no property, no auto-fire; ALTER TABLE turns it on and UNSET turns it off") {
    import spark.implicits._
    val dir = freshDir("autocompact-off")
    val t = s"`graft-manifest`.`$dir`"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING) USING `graft-manifest`")
    (0 until 6).foreach { i =>
      ManifestLake.write(spark,
        Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), dir,
        Seq.empty, replace = false)
    }
    // 6 appends + the CREATE's zero-row part file
    assert(liveFiles(dir).length === 7, "opt-in means OFF by default")
    // SHOW TBLPROPERTIES surfaces the knobs once set
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.autoCompact.targetFileBytes' = '1048576')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("graft.autoCompact.targetFileBytes") === "1048576")
    // next append packs the backlog (6 small + 1 new >= default minNumFiles 4)
    ManifestLake.write(spark,
      Seq((100L, "x")).toDF("id", "v").coalesce(1), dir,
      Seq.empty, replace = false)
    assert(liveFiles(dir).length === 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 7L)
    // UNSET stops it again
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES " +
      "('graft.autoCompact.targetFileBytes')")
    (0 until 5).foreach { i =>
      ManifestLake.write(spark,
        Seq((200L + i, "y")).toDF("id", "v").coalesce(1), dir,
        Seq.empty, replace = false)
    }
    assert(liveFiles(dir).length === 6, "UNSET must stop auto-compact")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) === 12L)
    // invalid values refuse loudly
    val e = intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.autoCompact.targetFileBytes' = '-5')"))
    assert(e.getMessage.contains("positive"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.autoCompact.minNumFiles' = '1')"))
    assert(e2.getMessage.contains(">= 2"), e2.getMessage)
  }
}
