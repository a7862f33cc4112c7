package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.etl.ManifestLake

/** Structured-Streaming SOURCE over a manifested table — the read twin
  * of the manifest sinks: `spark.readStream.format("graft-manifest")
  * .load(path)` turns the table's commit log into a micro-batch
  * stream. Offsets ARE manifest versions (a `LongOffset` of the
  * version number — durable, human-readable in the checkpoint, and
  * exactly the granularity the ledger commits at), so restart
  * semantics come for free: the engine replays `(lastCommitted,
  * head]` and every batch is the rows [[ManifestLake.readChanges]]
  * computes for that version window through the SAME batch read path
  * (manifest-fed single scan, pruning, skipping), wrapped streaming
  * by the one-function shim.
  *
  * Batch semantics:
  *   - the FIRST batch (no start offset) is the INITIAL SNAPSHOT —
  *     every live row at the stream's first-seen head version, however
  *     the table got there (compactions included; the snapshot is the
  *     live set, not history) — unless `startingVersion` says "begin
  *     after version N" (no snapshot; the Delta `startingVersion`
  *     shape);
  *   - every later batch is a verified APPEND range: a compaction,
  *     upsert, replace, or restore inside the window FAILS the stream
  *     with a typed error, because feeding its rewritten files as new
  *     rows would be silent duplication. `ignoreNonAppend = true`
  *     opts into skipping such versions (Delta's `ignoreChanges`
  *     contract: rewritten rows are not re-fed — choose it for tables
  *     under maintenance compaction, where skipped commits add no new
  *     rows and the feed stays exact).
  *
  * Schema is pinned at stream start (the recorded head schema);
  * additively-widened columns appearing mid-stream are projected away
  * until the stream restarts — the engine requires a stable schema per
  * run. Vacuum retention must cover consumer lag, same as any change
  * feed: a batch whose files were vacuumed before the consumer read
  * them is unrecoverable (and fails loudly, not silently empty).
  */
final class ManifestStreamSource(spark: SparkSession, path: String,
                                 override val schema: StructType,
                                 startingVersion: Option[Long],
                                 ignoreNonAppend: Boolean) extends Source {

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] =
    ManifestLake.currentVersion(spark, path)
      // a head below startingVersion means "nothing to read yet", not
      // an empty-range getBatch call
      .filter(v => startingVersion.forall(v > _))
      .map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = versionOf(end)
    val batch = start.map(versionOf).orElse(startingVersion) match {
      case Some(fromV) =>
        ManifestLake.readChanges(spark, path, fromV, toV,
          skipNonAppend = ignoreNonAppend)
      case None =>
        // initial snapshot: the live set at toV, whatever history
        // produced it
        ManifestLake.readVersion(spark, path, toV)
    }
    // pin the stream-start schema: widened columns wait for a restart
    org.apache.spark.sql.graft.StreamingDataFrameShim.asStreaming(
      batch.select(schema.fieldNames.map(col): _*))
  }

  override def stop(): Unit = ()
}
