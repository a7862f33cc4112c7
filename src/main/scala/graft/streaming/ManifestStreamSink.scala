package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.etl.ManifestLake

/** Structured-Streaming SINK over a manifested table — the write half
  * of the `graft-manifest` format surface, so a PySpark/SQL-only user
  * can stream INTO the lake, not just from it:
  *
  * {{{
  *   df.writeStream.format("graft-manifest")
  *     .option("txnAppId", "events-ingest")
  *     .option("checkpointLocation", ckpt)
  *     .partitionBy("day")
  *     .start(path)
  * }}}
  *
  * Every micro-batch commits through the SAME exactly-once machinery
  * the Scala `foreachBatch` helpers use ([[EventStreams]]): one
  * manifest version per trigger, `(txnAppId, batchId)` recorded in the
  * transaction ledger, so a replayed batch (micro-batch delivery is
  * at-least-once) is detected against the ledger and publishes
  * NOTHING. `txnAppId` is deliberately REQUIRED — a defaulted id would
  * let two streams share a watermark and silently drop each other's
  * early batches (same stance as the helpers; Delta's txnAppId is
  * explicit opt-in for the same reason).
  *
  * Output modes map onto the manifest commit kinds:
  *  - Append   → append commit (new files only; the log-shaped sink);
  *  - Update   → upsert by `keyCols` (REQUIRED option, must include
  *               the partition columns — re-delivered keys overwrite);
  *  - Complete → replace commit (each trigger rewrites the table —
  *               the aggregation-result shape).
  *
  * Options: `txnAppId` (required), `keyCols` (Update mode),
  * `statsCols` (file-level [min,max] skipping stats, Append/Complete),
  * `maintainEvery` (run compact+vacuum after every n-th batch — the
  * sink is the single writer, so the maintenance cadence belongs
  * here), `changeFeed` (default true; false skips Update mode's
  * row-level change-file stamping — a per-trigger write cost a
  * high-frequency upsert stream that nothing reads through
  * readChangeFeed should not pay). Partitioning comes from
  * `.partitionBy(...)`, a `partitionCols` option, or — for appends
  * onto an existing table — the recorded header.
  *
  * The incoming frame is the trigger's streaming-internal one; it is
  * rewrapped batch-side ([[org.apache.spark.sql.graft
  * .StreamingDataFrameShim.asBatch]], the `ForeachBatchSink`
  * conversion) before entering the batch commit path.
  */
final class ManifestStreamSink(spark: SparkSession, path: String,
                               partitionCols: Seq[String],
                               mode: OutputMode, appId: String,
                               keyCols: Seq[String],
                               statsCols: Seq[String],
                               maintainEvery: Option[Int],
                               changeFeed: Boolean = true) extends Sink {

  require(appId.trim.nonEmpty,
    "graft-manifest sink needs option 'txnAppId': a non-empty stable " +
      "stream identity keyed into the exactly-once ledger (a default " +
      "would let two streams share a watermark and drop batches)")
  if (mode == OutputMode.Update())
    require(keyCols.nonEmpty,
      "Update mode upserts by key: set option 'keyCols' (comma-separated, " +
        "must include the partition columns)")
  maintainEvery.foreach(n => require(n > 0,
    s"maintainEvery must be positive, got $n (every batch = 1)"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graft.StreamingDataFrameShim.asBatch(data)
    val txn = Some((appId, batchId))
    mode match {
      case m if m == OutputMode.Complete() =>
        // a replace is meaningful even empty (the aggregation produced
        // nothing — the table SHOULD read empty at this version)
        ManifestLake.write(spark, batch, path, resolvedPartCols,
          replace = true, txn = txn, statsCols = statsCols): Unit
      case m if m == OutputMode.Update() =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ManifestLake.upsert(spark, path, batch, resolvedPartCols,
              keyCols, txn = txn, changeFeed = changeFeed): Unit
        } finally { batch.unpersist(); () }
      case _ =>
        // Append: an empty batch publishes nothing (the ledger not
        // advancing is harmless — a replayed empty batch is still empty)
        if (!batch.isEmpty)
          ManifestLake.write(spark, batch, path, resolvedPartCols,
            replace = false, txn = txn, statsCols = statsCols): Unit
    }
    maintainEvery.foreach { n =>
      if (batchId % n == n - 1)
        ManifestLake.maintain(spark, path,
          clusterBy = if (keyCols.nonEmpty) keyCols else Seq.empty)
    }
  }

  /** Declared partitioning, or — for appends joining an existing table
    * — the recorded header's (the steady-state stream shouldn't have
    * to restate what the manifest already knows). Resolved per batch:
    * batch 0 may CREATE the table.
    */
  private def resolvedPartCols: Seq[String] =
    if (partitionCols.nonEmpty) partitionCols
    else ManifestLake.recordedPartitionCols(spark, path).getOrElse(Seq.empty)
}
