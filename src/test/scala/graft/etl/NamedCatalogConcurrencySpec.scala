package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Races and reader-API edges on the round-17 surfaces: SET
  * TBLPROPERTIES losing a version race refuses loudly with the table
  * intact; two adopts of one directory produce exactly one winner;
  * DataFrameReader time travel (`option("versionAsOf")`) resolves
  * through the catalog's loadTable overloads.
  */
class NamedCatalogConcurrencySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  test("SET TBLPROPERTIES losing a version race refuses loudly; the winner's commit stands") {
    import spark.implicits._
    val dir = freshDir("props-race")
    ManifestLake.write(spark,
      Seq(("aa", 1L)).toDF("grp", "id"), dir, Seq("grp"))                // v1
    // a racer lands an append at v2 between the properties read and its
    // publish — the metadata commit must lose LOUDLY, not clobber
    val t = s"`graft-manifest`.`$dir`"
    val e = intercept[Exception] {
      ManifestLake.raceHook.set { _ =>
        ManifestLake.write(spark,
          Seq(("bb", 2L)).toDF("grp", "id"), dir, Seq("grp"),
          replace = false)
      }
      try spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.statsCols' = 'id')")
      finally ManifestLake.raceHook.set(null)
    }
    assert(e.getMessage.contains("already published") ||
      e.getMessage.contains("lost a commit race"), e.getMessage)
    // the racer's append IS the head; the properties never half-landed
    val (fs, root) = ManifestLake.fsFor(spark, dir)
    val head = ManifestLake.currentVersion(spark, dir).get
    assert(ManifestLake.read(spark, dir).count() === 2L)
    assert(ManifestLake.readManifest(fs, root, head).statsColsDefault.isEmpty)
    // a clean retry succeeds
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.statsCols' = 'id')")
    assert(ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dir).get).statsColsDefault === Seq("id"))
  }

  test("two adopts of one directory: exactly one winner, one loud loser") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir("adopt-race")
    (0 until 50).map(i => (s"p${i % 2}", i.toLong)).toDF("grp", "id")
      .write.partitionBy("grp").parquet(dir)
    val attempts = (0 until 2).map(_ => Future {
      try { ManifestLake.adopt(spark, dir); Right(()) }
      catch { case e: Exception => Left(e) }
    })
    val results = Await.result(Future.sequence(attempts), 120.seconds)
    val (losers, winners) = results.partition(_.isLeft)
    assert(winners.size === 1, s"exactly one adopt must win, got $results")
    assert(losers.size === 1)
    losers.head.left.foreach(e =>
      assert(e.getMessage.contains("already a manifest table") ||
        e.getMessage.contains("already published") ||
        e.getMessage.contains("lost a commit race"), e.getMessage))
    assert(ManifestLake.read(spark, dir).count() === 50L)
    assert(ManifestLake.currentVersion(spark, dir).contains(1L))
  }

  test("DataFrameReader time travel resolves through the catalog's loadTable overloads") {
    import spark.implicits._
    val warehouse = Files.createTempDirectory("graft-wh-tt").toString
    spark.conf.set("spark.sql.catalog.grafttt", "graft.etl.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grafttt.warehouse", warehouse)
    spark.sql("CREATE TABLE grafttt.ns.t (grp STRING, id BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO grafttt.ns.t VALUES ('aa', 1)")               // v2
    spark.sql("INSERT INTO grafttt.ns.t VALUES ('bb', 2)")               // v3
    assert(spark.read.option("versionAsOf", "2").table("grafttt.ns.t")
      .count() === 1L)
    assert(spark.read.option("versionAsOf", "3").table("grafttt.ns.t")
      .count() === 2L)
    // timestampAsOf resolves through loadTable(ident, micros)
    val (fs, root) = ManifestLake.fsFor(spark, s"$warehouse/ns/t")
    val t2 = fs.getFileStatus(new org.apache.hadoop.fs.Path(root,
      "_manifest/v000002.list.gz")).getModificationTime
    val iso = java.time.Instant.ofEpochMilli(t2).toString
    val n = spark.read.option("timestampAsOf", iso).table("grafttt.ns.t").count()
    assert(n >= 1L && n <= 2L,
      s"timestampAsOf at v2's instant must serve v2 (or v3 on an mtime tie), got $n")
  }
}
