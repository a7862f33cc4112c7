package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ManifestLake

/** The manifest lake as a STREAMING SINK through the format
  * registration: `writeStream.format("graft-manifest")` — the write
  * half of the q95 SQL surface, so lake-to-lake pipelines need no
  * Scala helper. Pins the source→sink round trip under rate limiting
  * and forced restarts, the exactly-once replayed-batch lifecycle
  * through the format path, the mode→commit-kind mapping, and the
  * required-txnAppId stance.
  */
class ManifestStreamSinkSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (s"g${i % 2}", i.toLong, s"p$i")).toDF("grp", "x", "payload")
  }

  test("rate-limited source -> format sink round trip is exactly-once across forced restarts") {
    val src = freshDir("msink-src")
    val dst = freshDir("msink-dst")
    val ckpt = Files.createTempDirectory("msink-ckpt").toString
    ManifestLake.write(spark, batch(0, 24).repartition(6), src, Seq.empty)
    def start(trigger: Option[Trigger]) = {
      val w = spark.readStream.format("graft-manifest")
        .option("maxFilesPerTrigger", "2").load(src)
        .writeStream.format("graft-manifest")
        .option("txnAppId", "roundtrip")
        .option("checkpointLocation", ckpt)
        .option("partitionCols", "grp")
      trigger.foreach(w.trigger)
      w.start(dst)
    }
    // two Trigger.Once cycles = two bounded batches with a full engine
    // restart between them — the forced-restart half of exactly-once
    val q1 = start(Some(Trigger.Once())); q1.awaitTermination()
    val afterOne = ManifestLake.read(spark, dst).count()
    assert(afterOne > 0 && afterOne < 24,
      s"first restart cycle must land a strict subset, got $afterOne")
    val q2 = start(Some(Trigger.Once())); q2.awaitTermination()
    // drain the rest continuously over the same checkpoint
    val q3 = start(None)
    try q3.processAllAvailable() finally q3.stop()
    val got = ManifestLake.read(spark, dst)
    assert(got.count() === 24)
    assert(got.select("grp", "x", "payload").except(batch(0, 24)).isEmpty)
    assert(batch(0, 24).except(got.select("grp", "x", "payload")).isEmpty)
    // the ledger carries the stream's watermark; partitioning was recorded
    val (fs, root) = ManifestLake.fsFor(spark, dst)
    val head = ManifestLake.currentVersion(spark, dst).get
    val m = ManifestLake.readManifest(fs, root, head)
    assert(m.txns.contains("roundtrip"))
    assert(m.partCols === Seq("grp"))
    // appends landing AFTER the snapshot flow through incrementally
    ManifestLake.write(spark, batch(24, 30), src, Seq.empty, replace = false)
    val q4 = start(None)
    try q4.processAllAvailable() finally q4.stop()
    assert(ManifestLake.read(spark, dst).count() === 30)
  }

  test("a replayed (appId, batchId) through the format sink publishes nothing") {
    val dst = freshDir("msink-replay")
    val sink = new ManifestStreamSink(spark, dst, Seq("grp"),
      OutputMode.Append(), "replay-app", Seq.empty, Seq.empty, None)
    sink.addBatch(0L, batch(0, 10))
    sink.addBatch(1L, batch(10, 15))
    assert(ManifestLake.currentVersion(spark, dst) === Some(2L))
    assert(ManifestLake.read(spark, dst).count() === 15)
    // at-least-once delivery replays batch 1: the ledger must swallow it
    sink.addBatch(1L, batch(10, 15))
    assert(ManifestLake.currentVersion(spark, dst) === Some(2L),
      "a replayed batch must not publish a new version")
    assert(ManifestLake.read(spark, dst).count() === 15)
    // ...and batch 0 arriving late (below the watermark) is also a replay
    sink.addBatch(0L, batch(0, 10))
    assert(ManifestLake.currentVersion(spark, dst) === Some(2L))
    // the next NEW batch still lands
    sink.addBatch(2L, batch(15, 18))
    assert(ManifestLake.read(spark, dst).count() === 18)
  }

  test("Update mode upserts by keyCols; Complete mode replaces per batch") {
    import spark.implicits._
    val upd = freshDir("msink-upd")
    val updSink = new ManifestStreamSink(spark, upd, Seq("grp"),
      OutputMode.Update(), "upd-app", Seq("grp", "x"), Seq.empty, None)
    updSink.addBatch(0L, batch(0, 10))
    // re-delivered key overwrites, new key inserts
    updSink.addBatch(1L,
      Seq(("g0", 0L, "REWRITTEN"), ("g0", 100L, "fresh"))
        .toDF("grp", "x", "payload"))
    val got = ManifestLake.read(spark, upd)
    assert(got.count() === 11)
    assert(got.where(col("x") === 0L).head.getAs[String]("payload") === "REWRITTEN")

    val cmp = freshDir("msink-complete")
    val cmpSink = new ManifestStreamSink(spark, cmp, Seq.empty,
      OutputMode.Complete(), "cmp-app", Seq.empty, Seq.empty, None)
    cmpSink.addBatch(0L, batch(0, 10))
    cmpSink.addBatch(1L, batch(0, 4))
    assert(ManifestLake.read(spark, cmp).count() === 4,
      "Complete mode must replace, not accrete")

    // changeFeed=false: the upsert stream skips the per-trigger change
    // stamping — no _cdf anywhere, the merge itself intact
    val nocdf = freshDir("msink-nocdf")
    val nocdfSink = new ManifestStreamSink(spark, nocdf, Seq("grp"),
      OutputMode.Update(), "nocdf-app", Seq("grp", "x"), Seq.empty, None,
      changeFeed = false)
    nocdfSink.addBatch(0L, batch(0, 10))
    nocdfSink.addBatch(1L, Seq(("g0", 0L, "NEW")).toDF("grp", "x", "payload"))
    assert(ManifestLake.read(spark, nocdf).count() === 10)
    val (fs, _) = ManifestLake.fsFor(spark, nocdf)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(nocdf), true)
    while (it.hasNext)
      assert(!it.next().getPath.toString.contains("_cdf"),
        "changeFeed=false must stamp nothing")
  }

  test("txnAppId is required; Update without keyCols is refused") {
    val e = intercept[IllegalArgumentException] {
      new ManifestStreamSink(spark, freshDir("msink-noid"), Seq.empty,
        OutputMode.Append(), "", Seq.empty, Seq.empty, None)
    }
    assert(e.getMessage.contains("txnAppId"))
    val e2 = intercept[IllegalArgumentException] {
      new ManifestStreamSink(spark, freshDir("msink-nokeys"), Seq("grp"),
        OutputMode.Update(), "app", Seq.empty, Seq.empty, None)
    }
    assert(e2.getMessage.contains("keyCols"))
    // ...and the same stance holds end-to-end through the format path
    val src = freshDir("msink-src2")
    ManifestLake.write(spark, batch(0, 4), src, Seq.empty)
    val q = intercept[Exception] {
      spark.readStream.format("graft-manifest").load(src)
        .writeStream.format("graft-manifest")
        .option("checkpointLocation",
          Files.createTempDirectory("msink-ckpt2").toString)
        .start(freshDir("msink-dst2"))
    }
    assert(q.getMessage.contains("txnAppId") ||
      Option(q.getCause).exists(_.getMessage.contains("txnAppId")))
  }
}
