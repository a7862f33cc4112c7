package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level UPDATE: condition + SET over only the match-bearing
  * files, pre-update row semantics for SET expressions, NULL-condition
  * rows untouched, exact pre/post change images, by-reference carry of
  * unmatched files, and composition with constraints / column mapping /
  * deletion vectors.
  */
class UpdateSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("UPDATE rewrites only match-bearing files; SET sees pre-update values; NULL conditions skip") {
    import spark.implicits._
    val dir = freshDir("mlake-upd")
    val df = (0 until 40).map(i =>
      (s"chr${i % 2 + 1}", i.toLong, if (i % 10 == 0) None else Some(i * 2L), s"p$i"))
      .toDF("chrom", "pos", "score", "payload")
    ManifestLake.write(spark, df, dir, Seq("chrom"), statsCols = Seq("pos"))   // v1
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val chr2Before = ManifestLake.readManifest(fs, root, 1L).files
      .filter(_.path.contains("chrom=chr2")).toSet

    // only chr1 rows match (even pos i%2==0 → chr1): chr2 files carry
    // by reference. SET swaps score and derives payload from the OLD
    // score — pre-update semantics make the order irrelevant.
    val v = ManifestLake.update(spark, dir,
      col("chrom") === "chr1" && col("score") < 20L,
      Map("score" -> (col("score") + 1000L),
        "payload" -> concat(lit("was-"), col("score"))))
    assert(v === 2L)
    val m2 = ManifestLake.readManifest(fs, root, 2L)
    assert(m2.op === Some("update"))
    assert(m2.files.filter(_.path.contains("chrom=chr2")).toSet === chr2Before,
      "files without matches must carry by reference")
    val got = ManifestLake.read(spark, dir)
    assert(got.count() === 40, "UPDATE must not change row count")
    // matched: chr1 rows with score < 20 → i ∈ {2,4,6,8} (i=0 has NULL score)
    val updated = got.where(col("score") >= 1000L).orderBy("pos")
      .select("pos", "score", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(updated.toSeq === Seq(
      (2L, 1004L, "was-4"), (4L, 1008L, "was-8"),
      (6L, 1012L, "was-12"), (8L, 1016L, "was-16")))
    // NULL-score rows (condition NULL) are untouched
    assert(got.where(col("pos") === 0L).select("payload")
      .collect().head.getString(0) === "p0")
    // the feed serves exact pre/post images
    val feed = ManifestLake.readChangeFeed(spark, dir, 1L, 2L)
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("update_preimage" -> 4L, "update_postimage" -> 4L))
    assert(feed.where(col("_change_type") === "update_preimage" && col("pos") === 2L)
      .select("score").collect().head.getLong(0) === 4L)

    // a no-match update publishes nothing
    assert(ManifestLake.update(spark, dir, col("pos") === 99999L,
      Map("payload" -> lit("x"))) === 2L)
    // partition-column SET and unknown columns refuse
    intercept[IllegalArgumentException] {
      ManifestLake.update(spark, dir, lit(true), Map("chrom" -> lit("chrX")))
    }
    intercept[IllegalArgumentException] {
      ManifestLake.update(spark, dir, lit(true), Map("ghost" -> lit(1)))
    }
  }

  test("UPDATE composes with constraints, column mapping, and deletion vectors") {
    import spark.implicits._
    val dir = freshDir("mlake-upd-compose")
    ManifestLake.write(spark,
      (0 until 20).map(i => (s"chr1", i.toLong, i * 1L, s"p$i"))
        .toDF("chrom", "pos", "score", "payload"),
      dir, Seq("chrom"))                                                       // v1
    ManifestLake.addConstraint(spark, dir, "score_nonneg", "score >= 0")       // v2
    ManifestLake.renameColumn(spark, dir, "payload", "body")                   // v3
    ManifestLake.delete(spark, dir, col("pos") < 3L, deletionVectors = true)   // v4
    // an update that would violate the constraint fails pre-publish
    intercept[IllegalStateException] {
      ManifestLake.update(spark, dir, col("pos") === 5L,
        Map("score" -> lit(-1L)))
    }
    assert(ManifestLake.currentVersion(spark, dir) === Some(4L))
    // a passing update through the mapping, over the masked slice:
    // masked rows must not resurrect in the rewritten file
    val v = ManifestLake.update(spark, dir, col("pos") < 10L,
      Map("body" -> upper(col("body"))))
    assert(v === 5L)
    val got = ManifestLake.read(spark, dir)
    assert(got.count() === 17, "DV-masked rows must not resurrect through the rewrite")
    assert(got.where(col("pos") < 3L).count() === 0)
    assert(got.where(col("body") === "P5").count() === 1)
    assert(got.where(col("body") === "p15").count() === 1, "unmatched rows untouched")
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    assert(ManifestLake.readManifest(fs, root, 5L).files.forall(_.dv.isEmpty),
      "the rewrite materializes the mask")
    // exactly-once via the txn ledger
    val v2 = ManifestLake.update(spark, dir, col("pos") === 15L,
      Map("body" -> lit("ONCE")), txn = Some(("upd-app", 7L)))
    assert(v2 === 6L)
    assert(ManifestLake.update(spark, dir, col("pos") === 16L,
      Map("body" -> lit("TWICE")), txn = Some(("upd-app", 7L))) === 6L)
    assert(ManifestLake.read(spark, dir).where(col("body") === "TWICE").count() === 0)
  }
}
