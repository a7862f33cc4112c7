package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints on the manifest lake — the declared-contract
  * surface: a recorded constraint is an INVARIANT of the live data
  * (validated on add, enforced pre-publish on every append/replace/
  * upsert), never an aspiration. SQL CHECK semantics throughout: TRUE
  * or NULL passes, FALSE violates.
  */
class ConstraintSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("violating append/replace/upsert fail pre-publish with the table untouched; passing ones land") {
    import spark.implicits._
    val dir = freshDir("mlake-check")
    ManifestLake.write(spark,
      (0 until 30).map(i => (s"chr${i % 3 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                        // v1
    assert(ManifestLake.addConstraint(spark, dir, "pos_nonneg", "pos >= 0") === 2L)
    assert(ManifestLake.constraintsOf(spark, dir) === Map("pos_nonneg" -> "pos >= 0"))

    // violating append: fails typed, nothing published, stage withdrawn
    val e = intercept[IllegalStateException] {
      ManifestLake.write(spark,
        Seq(("chr1", -5L, "bad")).toDF("chrom", "pos", "payload"),
        dir, Seq("chrom"), replace = false)
    }
    assert(e.getMessage.contains("pos_nonneg") && e.getMessage.contains("violated"))
    assert(ManifestLake.currentVersion(spark, dir) === Some(2L))
    assert(ManifestLake.read(spark, dir).count() === 30)
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "data"))
      .map(_.getPath.getName).toSet
    assert(dataDirs === Set("v000001"), s"violating stage must be withdrawn: $dataDirs")

    // passing append lands
    assert(ManifestLake.write(spark,
      Seq(("chr1", 100L, "ok")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false) === 3L)

    // violating upsert: fails typed, table unchanged
    val e2 = intercept[IllegalStateException] {
      ManifestLake.upsert(spark, dir,
        Seq(("chr1", -1L, "bad")).toDF("chrom", "pos", "payload"),
        Seq("chrom"), Seq("chrom", "pos"))
    }
    assert(e2.getMessage.contains("pos_nonneg"))
    assert(ManifestLake.currentVersion(spark, dir) === Some(3L))
    assert(ManifestLake.read(spark, dir).where(col("pos") < 0).count() === 0)

    // passing upsert lands
    assert(ManifestLake.upsert(spark, dir,
      Seq(("chr1", 0L, "UPDATED")).toDF("chrom", "pos", "payload"),
      Seq("chrom"), Seq("chrom", "pos")) === 4L)
    assert(ManifestLake.read(spark, dir).where(col("payload") === "UPDATED").count() === 1)

    // violating replace: the contract survives a wholesale rewrite
    intercept[IllegalStateException] {
      ManifestLake.write(spark,
        Seq(("chr1", -9L, "bad")).toDF("chrom", "pos", "payload"),
        dir, Seq("chrom"))
    }
    assert(ManifestLake.currentVersion(spark, dir) === Some(4L))
  }

  test("adding a constraint existing rows violate is refused; NULL rows pass (SQL CHECK semantics)") {
    import spark.implicits._
    val dir = freshDir("mlake-check-add")
    ManifestLake.write(spark,
      Seq(("chr1", 5L, "a"), ("chr1", -3L, "b")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))
    val e = intercept[IllegalStateException] {
      ManifestLake.addConstraint(spark, dir, "pos_nonneg", "pos >= 0")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(ManifestLake.constraintsOf(spark, dir) === Map.empty)
    assert(ManifestLake.currentVersion(spark, dir) === Some(1L))

    // NULL evaluates as pass, for existing rows and for new batches
    val dir2 = freshDir("mlake-check-null")
    ManifestLake.write(spark,
      Seq(("chr1", Some(5L), "a"), ("chr1", None, "b"))
        .toDF("chrom", "pos", "payload"),
      dir2, Seq("chrom"))
    assert(ManifestLake.addConstraint(spark, dir2, "pos_pos", "pos > 0") === 2L)
    assert(ManifestLake.write(spark,
      Seq(("chr2", None: Option[Long], "c")).toDF("chrom", "pos", "payload"),
      dir2, Seq("chrom"), replace = false) === 3L)
    assert(ManifestLake.read(spark, dir2).count() === 3)

    // garbage SQL and duplicate names are typed refusals
    intercept[IllegalArgumentException] {
      ManifestLake.addConstraint(spark, dir2, "bad", "SELECT FROM WHERE")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.addConstraint(spark, dir2, "pos_pos", "pos > 1")
    }
    // a batch the expression can't even resolve against is typed too
    intercept[IllegalArgumentException] {
      ManifestLake.addConstraint(spark, dir2, "ghost", "no_such_column > 0")
    }
  }

  test("dropConstraint lifts enforcement; constraints survive delete/compact and restore with their version") {
    import spark.implicits._
    val dir = freshDir("mlake-check-life")
    ManifestLake.write(spark,
      (0 until 20).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
        .toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                        // v1
    ManifestLake.addConstraint(spark, dir, "pos_nonneg", "pos >= 0")            // v2
    ManifestLake.delete(spark, dir, col("chrom") === "chr2")                    // v3
    assert(ManifestLake.constraintsOf(spark, dir) === Map("pos_nonneg" -> "pos >= 0"),
      "a delete must carry the constraint forward")
    ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)               // v4
    assert(ManifestLake.constraintsOf(spark, dir) === Map("pos_nonneg" -> "pos >= 0"),
      "a compaction must carry the constraint forward")
    intercept[IllegalStateException] {
      ManifestLake.write(spark, Seq(("chr1", -1L, "bad")).toDF("chrom", "pos", "payload"),
        dir, Seq("chrom"), replace = false)
    }
    assert(ManifestLake.dropConstraint(spark, dir, "pos_nonneg") === 5L)
    assert(ManifestLake.write(spark,
      Seq(("chr1", -1L, "now ok")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false) === 6L)
    // restore to v2 brings the v2 constraint set back with the v2 data
    val rv = ManifestLake.restore(spark, dir, 2L)
    assert(ManifestLake.constraintsOf(spark, dir) === Map("pos_nonneg" -> "pos >= 0"))
    assert(ManifestLake.read(spark, dir).count() === 20)
    assert(rv === 7L)
  }

  test("constraint commits are metadata-only and invisible to the change feed") {
    import spark.implicits._
    val dir = freshDir("mlake-check-feed")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a"), ("chr1", 2L, "b")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"))                                                        // v1
    ManifestLake.addConstraint(spark, dir, "pos_pos", "pos > 0")                // v2
    ManifestLake.write(spark, Seq(("chr2", 3L, "c")).toDF("chrom", "pos", "payload"),
      dir, Seq("chrom"), replace = false)                                       // v3
    val (fs, _) = ManifestLake.fsFor(spark, dir)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "data"))
      .map(_.getPath.getName)
    assert(dataDirs.count(_.startsWith("v000002")) === 0,
      "a constraint commit writes no data dir")
    // the feed across the constraint commit: v2 contributes nothing
    val feed = ManifestLake.readChangeFeed(spark, dir, 1L, 3L)
    assert(feed.count() === 1)
    assert(feed.select("payload").collect().head.getString(0) === "c")
    // history names the op
    val ops = ManifestLake.history(spark, dir).select("version", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(2L) === "constraint")
  }

  test("an append under a constraint still runs exactly ONE Spark job (enforcement rides the write)") {
    import spark.implicits._
    val dir = freshDir("mlake-check-onejob")
    ManifestLake.write(spark,
      Seq(("chr1", 1L, "a")).toDF("chrom", "pos", "payload"), dir, Seq("chrom"))
    ManifestLake.addConstraint(spark, dir, "pos_nonneg", "pos >= 0")
    val df = (0 until 100).map(i => (s"chr${i % 2 + 1}", i.toLong, s"p$i"))
      .toDF("chrom", "pos", "payload")
    val sc = spark.sparkContext
    val group = s"check-onejob-${System.nanoTime()}"
    sc.setJobGroup(group, "append with constraint", interruptOnCancel = false)
    try ManifestLake.write(spark, df, dir, Seq("chrom"), replace = false)
    finally sc.clearJobGroup()
    def jobs(): Int = sc.statusTracker.getJobIdsForGroup(group).length
    val deadline = System.currentTimeMillis() + 10000
    while (jobs() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(jobs() === 1,
      s"constraint enforcement must ride the write job, saw ${jobs()}")
    assert(ManifestLake.read(spark, dir).count() === 101)
  }
}
