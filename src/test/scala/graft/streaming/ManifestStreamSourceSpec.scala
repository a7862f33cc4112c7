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

  test("streaming from a nonexistent table is a typed error") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-manifest").load(freshDir("msrc-none"))
        .writeStream.format("memory").queryName("msrc_none").start()
    }
    assert(e.getMessage.contains("no manifest table"))
  }
}
