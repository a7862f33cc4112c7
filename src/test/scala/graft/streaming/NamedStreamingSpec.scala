package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ManifestLake

/** STREAMING BY NAME — the catalog round's missing half:
  * `spark.readStream.table("graft.ns.t")` resolves through the DSv2
  * catalog onto the SAME [[ManifestStreamSource]] (same offsets, so
  * checkpoints are interchangeable with the path spelling), and
  * `writeStream.format("graft-manifest").toTable("graft.ns.t")` rides
  * the V1-fallback seam onto the SAME exactly-once
  * [[ManifestStreamSink]]. Twin cases of the path-spelling specs,
  * including a forced restart on each side.
  */
class NamedStreamingSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("graft-stream-wh").toString

  private lazy val spark = {
    val s = graft.TestSpark.spark
    s.conf.set("spark.sql.catalog.gstream", "graft.etl.GraftCatalog")
    s.conf.set("spark.sql.catalog.gstream.warehouse", warehouse)
    s
  }

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (s"g${i % 2}", i.toLong, s"p$i")).toDF("grp", "x", "payload")
  }

  test("readStream.table: snapshot + appends; checkpoint interchangeable with the path spelling") {
    val ckpt = Files.createTempDirectory("named-src-ckpt").toString
    spark.sql("CREATE TABLE gstream.ns.src (grp STRING, x BIGINT, payload STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gstream.ns.src VALUES ('g0', 0, 'p0'), ('g1', 1, 'p1')")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]) = df
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("x").collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    val q1 = drain(spark.readStream.table("gstream.ns.src"))
    try {
      q1.processAllAvailable()
      assert(seen.size === 2)
      spark.sql("INSERT INTO gstream.ns.src VALUES ('g0', 2, 'p2')")
      q1.processAllAvailable()
      assert(seen.size === 3)
    } finally q1.stop()
    // append while the stream is DOWN, then restart over the same
    // checkpoint — by PATH spelling: the two spellings must share
    // source identity and offsets, or a checkpoint would silently
    // replay/lose on a spelling change
    spark.sql("INSERT INTO gstream.ns.src VALUES ('g1', 3, 'p3')")
    val q2 = drain(
      spark.readStream.format("graft-manifest").load(s"$warehouse/ns/src"))
    try {
      q2.processAllAvailable()
      assert(seen.size === 4, "path-spelling restart over the " +
        "name-spelling checkpoint must resume, not re-snapshot")
    } finally q2.stop()
    // ...and back by name again
    spark.sql("INSERT INTO gstream.ns.src VALUES ('g0', 4, 'p4')")
    val q3 = drain(spark.readStream.table("gstream.ns.src"))
    try {
      q3.processAllAvailable()
      assert(seen.asScala.toSeq.sorted === (0L to 4L),
        "no replay, no loss across the three spellings/restarts")
    } finally q3.stop()
  }

  test("readStream.table with readChangeFeed streams stamped change rows") {
    spark.sql("CREATE TABLE gstream.ns.cdf (grp STRING, x BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gstream.ns.cdf VALUES ('g0', 1), ('g1', 2)")
    spark.sql("UPDATE gstream.ns.cdf SET x = 20 WHERE x = 2")
    val q = spark.readStream.option("readChangeFeed", "true")
      .option("startingVersion", "0").table("gstream.ns.cdf")
      .writeStream.format("memory").queryName("named_cdf").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("named_cdf")
        .select("grp", "x", "_change_type", "_commit_version").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      // v1 = the empty CREATE commit, v2 = INSERT, v3 = UPDATE
      assert(rows === Set(
        ("g0", 1L, "insert", 2L), ("g1", 2L, "insert", 2L),
        ("g1", 2L, "update_preimage", 3L), ("g1", 20L, "update_postimage", 3L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS named_cdf")
    }
  }

  test("writeStream.toTable: exactly-once across a forced restart; creates the table when missing") {
    val src = Files.createTempDirectory("named-sink-src").toString + "/table"
    val ckpt = Files.createTempDirectory("named-sink-ckpt").toString
    ManifestLake.write(spark, batch(0, 24).repartition(6), src, Seq.empty)
    def start(trigger: Option[Trigger]) = {
      val w = spark.readStream.format("graft-manifest")
        .option("maxFilesPerTrigger", "2").load(src)
        .writeStream.format("graft-manifest")
        .option("txnAppId", "named-roundtrip")
        .option("checkpointLocation", ckpt)
        .partitionBy("grp")
      trigger.foreach(w.trigger)
      w.toTable("gstream.ns.dst")
    }
    // table does not exist yet: toTable creates it through the catalog,
    // then streams through the ledgered v1 sink; two Trigger.Once
    // cycles = a forced engine restart between bounded batches
    val q1 = start(Some(Trigger.Once())); q1.awaitTermination()
    val afterOne = spark.sql("SELECT count(*) FROM gstream.ns.dst").head().getLong(0)
    assert(afterOne < 24, s"first cycle must land a strict subset, got $afterOne")
    val q2 = start(Some(Trigger.Once())); q2.awaitTermination()
    val q3 = start(None)
    try q3.processAllAvailable() finally q3.stop()
    val got = spark.table("gstream.ns.dst")
    assert(got.count() === 24)
    assert(got.select("grp", "x", "payload").except(batch(0, 24)).isEmpty)
    assert(batch(0, 24).except(got.select("grp", "x", "payload")).isEmpty)
    // the ledger watermark and partitioning were recorded on the NAMED table
    val dst = s"$warehouse/ns/dst"
    val (fs, root) = ManifestLake.fsFor(spark, dst)
    val m = ManifestLake.readManifest(fs, root,
      ManifestLake.currentVersion(spark, dst).get)
    assert(m.txns.contains("named-roundtrip"))
    assert(m.partCols === Seq("grp"))
  }

  test("refusals: bare toTable names the provider mismatch; a conflicting path option refuses") {
    spark.sql("CREATE TABLE gstream.ns.ref (grp STRING, x BIGINT) PARTITIONED BY (grp)")
    // toTable without .format(): Spark's own provider check fires —
    // loud, names both sources, nothing written
    val e1 = intercept[Exception] {
      spark.readStream.table("gstream.ns.ref")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("named-ref-ckpt").toString)
        .toTable("gstream.ns.ref")
    }
    assert(e1.getMessage.contains("graft-manifest"))
    // a user path option fighting the resolved name refuses at analysis
    val e2 = intercept[Exception] {
      spark.readStream.option("path", "/somewhere/else").table("gstream.ns.ref")
    }
    assert(e2.getMessage.contains("path"))
    spark.sql("DROP TABLE gstream.ns.ref")
  }
}
