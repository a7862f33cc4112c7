package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ManifestLake

/** The manifest lake as a STREAMING SOURCE: offsets are manifest
  * versions, batch 0 is the live snapshot, later batches are verified
  * appends. Driven through real micro-batch execution against memory
  * sinks, including a checkpointed restart (the exactly-once half the
  * manifest SINKS already pin, now round-tripped end to end).
  */
class ManifestStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/table"

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (s"g${i % 2}", i.toLong, s"p$i")).toDF("grp", "x", "payload")
  }

  test("snapshot then appends; offsets are versions; compaction fails the stream loudly") {
    import spark.implicits._
    val dir = freshDir("msrc-basic")
    ManifestLake.write(spark, batch(0, 20), dir, Seq("grp"))
    ManifestLake.write(spark, batch(20, 30), dir, Seq("grp"), replace = false)
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("msrc_basic").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // batch 0 = the full live set at the first-seen head (v2)
      assert(spark.table("msrc_basic").count() === 30)
      // an append lands as exactly its own rows
      ManifestLake.write(spark, batch(30, 37), dir, Seq("grp"), replace = false)
      q.processAllAvailable()
      assert(spark.table("msrc_basic").count() === 37)
      assert(spark.table("msrc_basic").select("grp", "x", "payload")
        .except(batch(0, 37)).isEmpty)
      // a compaction mid-stream is a typed failure, not silent duplication
      ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)
      ManifestLake.write(spark, batch(37, 40), dir, Seq("grp"), replace = false)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("not an append"))
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_basic")
    }
  }

  test("ignoreNonAppend skips maintenance commits; startingVersion skips the snapshot") {
    import spark.implicits._
    val dir = freshDir("msrc-ignore")
    ManifestLake.write(spark, batch(0, 10), dir, Seq("grp"))
    ManifestLake.write(spark, batch(10, 15), dir, Seq("grp"), replace = false)
    // startingVersion=1: no snapshot, feed begins after v1
    val q = spark.readStream.format("graft-manifest")
      .option("startingVersion", "1").option("ignoreNonAppend", "true")
      .load(dir)
      .writeStream.format("memory").queryName("msrc_ignore").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("msrc_ignore").select("grp", "x", "payload")
        .except(batch(10, 15)).isEmpty)
      assert(spark.table("msrc_ignore").count() === 5)
      // compaction adds no rows to the feed; the append after it does
      ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)
      ManifestLake.write(spark, batch(15, 18), dir, Seq("grp"), replace = false)
      q.processAllAvailable()
      assert(spark.table("msrc_ignore").count() === 8)
      assert(spark.table("msrc_ignore").select("grp", "x", "payload")
        .except(batch(10, 18)).isEmpty)
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_ignore")
    }
  }

  test("metadata-only commits mid-stream serve an empty diff, never kill " +
    "the stream; a schema BACKFILL (files rewritten) still refuses") {
    import spark.implicits._
    val dir = freshDir("msrc-meta")
    ManifestLake.write(spark, batch(0, 10), dir, Seq("grp"))
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("msrc_meta").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("msrc_meta").count() === 10)
      // routine maintenance: constraint + properties + analyze + a
      // metadata-only ALTER — none may fail the stream or feed a row
      ManifestLake.addConstraint(spark, dir, "pos_x", "x >= 0")
      ManifestLake.setTableProperties(spark, dir,
        set = Map("graft.statsCols" -> "x"))
      ManifestLake.analyzeStats(spark, dir, Seq("x"))
      ManifestLake.addColumn(spark, dir, "note",
        org.apache.spark.sql.types.StringType)
      q.processAllAvailable()
      assert(spark.table("msrc_meta").count() === 10,
        "metadata commits must contribute zero rows")
      // appends after the maintenance flow normally
      ManifestLake.write(spark, batch(10, 14).withColumn("note", lit("n")),
        dir, Seq("grp"), replace = false)
      q.processAllAvailable()
      assert(spark.table("msrc_meta").count() === 14)
      // a generated-column BACKFILL carries op=schema but REWRITES the
      // files — rows moved, and the feed must refuse, not re-feed
      ManifestLake.addGeneratedColumn(spark, dir, "x2",
        org.apache.spark.sql.types.LongType, "x * 2", backfill = true)
      ManifestLake.write(spark,
        batch(14, 15).withColumn("note", lit("n")),
        dir, Seq("grp"), replace = false)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("not an append"), e.getCause.getMessage)
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_meta")
    }
    // the batch twin agrees: readChanges over a range spanning the
    // metadata commits serves exactly the appended rows
    val v = ManifestLake.currentVersion(spark, dir).get
    val changes = ManifestLake.readChanges(spark, dir, 1L, v - 2)
    assert(changes.count() === 4,
      "readChanges must span metadata commits and serve only the appends")
  }

  test("checkpointed restart resumes at the committed version — no replay, no loss") {
    import spark.implicits._
    val dir = freshDir("msrc-restart")
    val ckpt = Files.createTempDirectory("msrc-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("x").collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    ManifestLake.write(spark, batch(0, 8), dir, Seq("grp"))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size === 8)
    // appends while the stream is DOWN...
    ManifestLake.write(spark, batch(8, 13), dir, Seq("grp"), replace = false)
    ManifestLake.write(spark, batch(13, 15), dir, Seq("grp"), replace = false)
    // ...arrive exactly once on restart: no snapshot replay, no gap
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(seen.size === 15, s"restart must deliver exactly the missed appends, saw ${seen.size}")
    assert(seen.iterator().asInstanceOf[java.util.Iterator[Long]].hasNext)
    val all = { val b = Seq.newBuilder[Long]; seen.forEach(x => b += x); b.result() }
    assert(all.sorted === (0L until 15L))
  }

  test("mid-stream additive widening is projected to the pinned schema, not a crash") {
    import spark.implicits._
    val dir = freshDir("msrc-widen")
    ManifestLake.write(spark, batch(0, 6), dir, Seq("grp"))
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("msrc_widen").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("msrc_widen").count() === 6)
      // an append that WIDENS the table (new nullable column) mid-stream:
      // the stream keeps its pinned 3-column schema and delivers the rows
      val widened = (6 until 9).map(i => (s"g${i % 2}", i.toLong, s"p$i", i * 1.5))
        .toDF("grp", "x", "payload", "score")
      ManifestLake.write(spark, widened, dir, Seq("grp"), replace = false)
      q.processAllAvailable()
      assert(spark.table("msrc_widen").columns.toSeq === Seq("grp", "x", "payload"))
      assert(spark.table("msrc_widen").count() === 9)
      // the table itself DID widen — visible to batch reads and restarts
      assert(ManifestLake.read(spark, dir).columns.contains("score"))
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_widen")
    }
  }

  test("maxFilesPerTrigger chunks the snapshot into ceil(N/k) batches, no row lost or duplicated") {
    import spark.implicits._
    val dir = freshDir("msrc-ratelimit")
    // 6 data files, unpartitioned: repartition(6) over distinct rows
    ManifestLake.write(spark, batch(0, 24).repartition(6), dir, Seq.empty)
    assert(ManifestLake.liveFilesAt(spark, dir, 1L).size === 6)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val xs = df.select("x").collect().map(_.getLong(0))
        batches.add(xs.length.toLong); xs.foreach(rows.add); ()
      }.start()
    try {
      q.processAllAvailable()
      // ceil(6 files / 2 per trigger) = 3 batches, union exact
      assert(batches.size === 3, s"expected 3 bounded batches, got ${batches.size}")
      val all = { val b = Seq.newBuilder[Long]; rows.forEach(x => b += x); b.result() }
      assert(all.sorted === (0L until 24L))
      // an append burst is bounded too: 4 new files -> 2 more batches
      ManifestLake.write(spark, batch(24, 32).repartition(4), dir, Seq.empty,
        replace = false)
      q.processAllAvailable()
      assert(batches.size === 5, s"append burst should add 2 batches, got ${batches.size}")
      val all2 = { val b = Seq.newBuilder[Long]; rows.forEach(x => b += x); b.result() }
      assert(all2.sorted === (0L until 32L))
    } finally if (q.isActive) q.stop()
  }

  test("maxBytesPerTrigger bounds intake and always admits at least one file") {
    import spark.implicits._
    val dir = freshDir("msrc-bytes")
    ManifestLake.write(spark, batch(0, 12).repartition(4), dir, Seq.empty)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    // 1 byte per trigger: every file is over budget, so each batch is
    // exactly one file — the stream still drains (at-least-one rule)
    val q = spark.readStream.format("graft-manifest")
      .option("maxBytesPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); rows.addAndGet(df.count()); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.get === 4, s"1-byte budget = one file per batch, got ${batches.get}")
      assert(rows.get === 12L)
    } finally if (q.isActive) q.stop()
  }

  test("mid-snapshot restart resumes at the checkpointed slice — exactly once") {
    import spark.implicits._
    val dir = freshDir("msrc-midsnap")
    val ckpt = Files.createTempDirectory("msrc-midsnap-ckpt").toString
    ManifestLake.write(spark, batch(0, 30).repartition(6), dir, Seq.empty)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("x").collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    // Trigger.Once = one getOffset advance = one bounded chunk, then
    // stop MID-SNAPSHOT; each restart must resume at the next slice
    val q1 = start(); q1.awaitTermination()
    val afterOne = seen.size
    assert(afterOne > 0 && afterOne < 30,
      s"first chunk must be a strict subset of the snapshot, saw $afterOne rows")
    val q2 = start(); q2.awaitTermination()
    assert(seen.size > afterOne && seen.size < 30,
      s"second chunk must advance and stay partial, saw ${seen.size}")
    // drain the rest with a continuous run over the same checkpoint
    val q3 = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("x").collect().foreach(r => seen.add(r.getLong(0))); ()
      }.start()
    try q3.processAllAvailable() finally q3.stop()
    val all = { val b = Seq.newBuilder[Long]; seen.forEach(x => b += x); b.result() }
    assert(all.length === 30, s"exactly-once across restarts: saw ${all.length} rows")
    assert(all.sorted === (0L until 30L))
  }

  test("Trigger.AvailableNow drains exactly the commits present at start, split per trigger bound, then terminates") {
    import spark.implicits._
    val dir = freshDir("msrc-avnow")
    val ckpt = Files.createTempDirectory("msrc-avnow-ckpt").toString
    ManifestLake.write(spark, batch(0, 10), dir, Seq("grp")) // v1
    ManifestLake.write(spark, batch(10, 14), dir, Seq("grp"), replace = false) // v2
    ManifestLake.write(spark, batch(14, 16), dir, Seq("grp"), replace = false) // v3
    def run(): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // AvailableNow SELF-TERMINATES once the start-time head drains —
      // the batch-job-over-a-stream contract (no manual stop)
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      n.get()
    }
    assert(run() === 16)
    // commits landing AFTER the drain belong to the NEXT run: a second
    // AvailableNow run picks up exactly the new versions from the same
    // checkpoint — the incremental-batch cadence this trigger exists for
    ManifestLake.write(spark, batch(16, 19), dir, Seq("grp"), replace = false) // v4
    assert(run() === 3)
    ()
  }

  test("streaming from a nonexistent table is a typed error") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-manifest").load(freshDir("msrc-none"))
        .writeStream.format("memory").queryName("msrc_none").start()
    }
    assert(e.getMessage.contains("no manifest table"))
  }

  test("change-feed stream: upserts and deletes arrive as exact change rows; compaction contributes nothing") {
    import spark.implicits._
    val dir = freshDir("msrc-cdf")
    ManifestLake.write(spark, batch(0, 10), dir, Seq("grp"))                    // v1
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName("msrc_cdf").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val t = () => spark.table("msrc_cdf")
      assert(t().columns.takeRight(2).toSeq === Seq("_change_type", "_commit_version"))
      // the table-creating v1 serves as inserts (replace-at-birth = append)
      assert(t().count() === 10)
      assert(t().where(col("_change_type") === "insert" &&
        col("_commit_version") === 1L).count() === 10)
      // an upsert serves its exact pre/post images and inserts
      val upd = Seq(("g0", 0L, "NEW"), ("g0", 100L, "ADDED")).toDF("grp", "x", "payload")
      ManifestLake.upsert(spark, dir, upd, Seq("grp"), Seq("grp", "x"))        // v2
      q.processAllAvailable()
      val v2 = t().where(col("_commit_version") === 2L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      assert(v2 === Set(
        ("g0", 0L, "p0", "update_preimage"),
        ("g0", 0L, "NEW", "update_postimage"),
        ("g0", 100L, "ADDED", "insert")))
      // a delete serves its exact deleted rows
      ManifestLake.delete(spark, dir, col("x") === 1L)                          // v3
      q.processAllAvailable()
      val v3 = t().where(col("_commit_version") === 3L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      assert(v3 === Set(("g1", 1L, "p1", "delete")))
      // compaction is provably zero changes; the append after it flows
      ManifestLake.compact(spark, dir, targetBytes = Long.MaxValue)             // v4
      ManifestLake.write(spark, batch(10, 12), dir, Seq("grp"), replace = false) // v5
      q.processAllAvailable()
      assert(t().where(col("_commit_version") === 4L).count() === 0)
      assert(t().where(col("_commit_version") === 5L &&
        col("_change_type") === "insert").count() === 2)
      assert(t().count() === 16)
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_cdf")
    }
  }

  test("change-feed stream under mid-stream widening: pinned projection, typed nulls on pre-widening rows after restart") {
    import spark.implicits._
    val dir = freshDir("msrc-cdf-widen")
    ManifestLake.write(spark, batch(0, 4), dir, Seq("grp"))                      // v1
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName("msrc_cdf_widen").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("msrc_cdf_widen").count() === 4)
      // a widening upsert mid-stream: the running stream keeps its
      // pinned columns and still serves the exact change rows
      val widened = Seq(("g0", 0L, "NEW", 9.5)).toDF("grp", "x", "payload", "score")
      ManifestLake.upsert(spark, dir, widened, Seq("grp"), Seq("grp", "x"))      // v2
      q.processAllAvailable()
      val t = spark.table("msrc_cdf_widen")
      assert(!t.columns.contains("score"))
      assert(t.where(col("_commit_version") === 2L).count() === 2) // pre+post
      assert(t.where(col("_change_type") === "update_postimage")
        .head.getAs[String]("payload") === "NEW")
    } finally {
      if (q.isActive) q.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_cdf_widen")
    }
    // a FRESH stream over the same range serves the widened schema,
    // pre-widening rows carrying typed nulls — the batch feed contract
    val q2 = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName("msrc_cdf_widen2").outputMode("append")
      .start()
    try {
      q2.processAllAvailable()
      val t2 = spark.table("msrc_cdf_widen2")
      assert(t2.columns.contains("score"))
      assert(t2.where(col("_commit_version") === 1L && col("score").isNotNull).count() === 0)
      assert(t2.where(col("_change_type") === "update_postimage")
        .head.getAs[Double]("score") === 9.5)
    } finally {
      if (q2.isActive) q2.stop()
      spark.sql("DROP TABLE IF EXISTS msrc_cdf_widen2")
    }
  }

  test("CDC mirror end to end: applying the change-feed stream keeps a downstream mirror identical through upserts and deletes") {
    import spark.implicits._
    val srcDir = freshDir("msrc-cdc-src")
    val mirrorDir = freshDir("msrc-cdc-mirror")
    ManifestLake.write(spark, batch(0, 20), srcDir, Seq("grp"))                 // v1
    // the consumer: per version in order, postimages+inserts upsert into
    // the mirror, deletes remove their keys — the standard CDC-apply
    // loop, driven entirely by the stream's change rows
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(srcDir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val versions = df.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          val w = df.where(col("_commit_version") === v)
          val ups = w.where(col("_change_type").isin("insert", "update_postimage"))
            .drop("_change_type", "_commit_version")
          if (!ups.isEmpty)
            ManifestLake.upsert(spark, mirrorDir, ups, Seq("grp"), Seq("grp", "x"))
          val delKeys = w.where(col("_change_type") === "delete")
            .select("grp", "x").collect().map(r => (r.getString(0), r.getLong(1)))
          if (delKeys.nonEmpty) {
            val pred = delKeys.map { case (g, x) =>
              col("grp") === g && col("x") === x
            }.reduce(_ || _)
            ManifestLake.delete(spark, mirrorDir, pred): Unit
          }
        }
        ()
      }.start()
    def assertMirrored(): Unit = {
      val src = ManifestLake.read(spark, srcDir).select("grp", "x", "payload")
      val mir = ManifestLake.read(spark, mirrorDir).select("grp", "x", "payload")
      assert(src.count() === mir.count())
      assert(src.except(mir).isEmpty && mir.except(src).isEmpty,
        "mirror must equal source exactly")
    }
    try {
      q.processAllAvailable()
      assertMirrored()
      // a wave of changes: upsert, append, delete
      val upd = Seq(("g0", 0L, "CHANGED"), ("g1", 777L, "NEWKEY")).toDF("grp", "x", "payload")
      ManifestLake.upsert(spark, srcDir, upd, Seq("grp"), Seq("grp", "x"))      // v2
      ManifestLake.write(spark, batch(20, 25), srcDir, Seq("grp"), replace = false) // v3
      ManifestLake.delete(spark, srcDir, col("x").between(3L, 7L))              // v4
      q.processAllAvailable()
      assertMirrored()
      // maintenance on the source is invisible to the mirror
      ManifestLake.compact(spark, srcDir, targetBytes = Long.MaxValue)          // v5
      ManifestLake.delete(spark, srcDir, col("grp") === "g0")                   // v6 (metadata-only)
      q.processAllAvailable()
      assertMirrored()
      assert(ManifestLake.read(spark, mirrorDir).where(col("grp") === "g0").count() === 0)
      // the NEW DML kinds flow through the same CDC-apply loop: a
      // conditional merge, a row-level UPDATE, and a deletion-vector
      // delete — the mirror must track all three without special cases
      ManifestLake.merge(spark, srcDir,
        Seq(("g1", 1L, "MERGED"), ("g2", 888L, "MNEW")).toDF("grp", "x", "payload"),
        Seq("grp"), Seq("grp", "x"),
        deleteWhen = Some(col("s.x") === 1L && lit(false)))                     // v7
      ManifestLake.update(spark, srcDir, col("x") === 888L,
        Map("payload" -> concat(col("payload"), lit("-upd"))))                  // v8
      ManifestLake.delete(spark, srcDir, col("x") === 2L,
        deletionVectors = true)                                                 // v9
      q.processAllAvailable()
      assertMirrored()
      assert(ManifestLake.read(spark, mirrorDir)
        .where(col("payload") === "MNEW-upd").count() === 1)
      assert(ManifestLake.read(spark, mirrorDir).where(col("x") === 2L).count() === 0)
    } finally {
      if (q.isActive) q.stop()
    }
  }

  test("change-feed stream: maxVersionsPerTrigger bounds windows, checkpointed restart is exactly-once, startingVersion is required") {
    import spark.implicits._
    val dir = freshDir("msrc-cdf-rl")
    val ckpt = Files.createTempDirectory("msrc-cdf-ckpt").toString
    ManifestLake.write(spark, batch(0, 6), dir, Seq("grp"))                     // v1
    ManifestLake.write(spark, batch(6, 9), dir, Seq("grp"), replace = false)    // v2
    ManifestLake.delete(spark, dir, col("x") === 0L)                            // v3
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.select("_commit_version").collect().foreach(r => batches.add((id, r.getLong(0)))); ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val firstRun = { val b = Seq.newBuilder[(Long, Long)]; batches.forEach(x => b += x); b.result() }
    // one version per micro-batch: no batch mixes commit versions
    assert(firstRun.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1),
      s"each bounded batch must cover one version: $firstRun")
    assert(firstRun.map(_._2).toSet === Set(1L, 2L, 3L))
    assert(firstRun.length === 6 + 3 + 1)
    // commits while the stream is DOWN, then restart: only the new
    // versions flow — the bounded cursor never re-offers committed ones
    ManifestLake.write(spark, batch(9, 11), dir, Seq("grp"), replace = false)   // v4
    val upd = Seq(("g1", 1L, "NEW1")).toDF("grp", "x", "payload")
    ManifestLake.upsert(spark, dir, upd, Seq("grp"), Seq("grp", "x"))           // v5
    // a stray non-numeric cursor entry (partial write, editor droppings)
    // must be SKIPPED on restart, not crash getOffset forever
    val cursorDir = java.nio.file.Paths.get(ckpt, "sources", "0", "graft-cdf-cursor")
    assert(java.nio.file.Files.isDirectory(cursorDir),
      s"cursor log expected under the checkpoint: $cursorDir")
    java.nio.file.Files.write(cursorDir.resolve("cursor-garbage"),
      "not-a-version\n".getBytes("UTF-8"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = { val b = Seq.newBuilder[(Long, Long)]; batches.forEach(x => b += x); b.result() }
    val secondRun = all.drop(firstRun.length)
    assert(secondRun.map(_._2).toSet === Set(4L, 5L),
      s"restart must continue after the committed cursor: $secondRun")
    assert(secondRun.length === 2 + 2, s"v4 = 2 inserts, v5 = pre+post: $secondRun")
    // a change-feed stream without startingVersion is a typed refusal
    val e = intercept[Exception] {
      val qq = spark.readStream.format("graft-manifest")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("memory").queryName("msrc_cdf_bad").start()
      try qq.processAllAvailable() finally if (qq.isActive) qq.stop()
    }
    assert(e.getMessage.contains("startingVersion") ||
      Option(e.getCause).exists(_.getMessage.contains("startingVersion")))
  }
}
