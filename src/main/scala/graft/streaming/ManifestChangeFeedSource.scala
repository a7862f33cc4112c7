package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.etl.ManifestLake

/** Structured-Streaming source over the ROW-LEVEL CHANGE FEED of a
  * manifested table — the streaming twin of
  * [[ManifestLake.readChangeFeed]], and the CDC shape Delta serves
  * under `readChangeFeed=true`: each micro-batch carries the table
  * columns plus `_change_type` (insert / update_preimage /
  * update_postimage / delete) and `_commit_version` for every commit
  * in its version window. Downstream consumers maintain a mirror,
  * an index, or an aggregate INCREMENTALLY across upserts and deletes
  * — where the plain file stream must refuse (or skip) any rewrite,
  * because it can only speak in whole added files.
  *
  * Offsets are plain VERSION numbers ([[LongOffset]]): batch (s, e]
  * serves `readChangeFeed(s, e)`. `startingVersion` is REQUIRED —
  * changes strictly after it flow first. There is no implicit
  * initial-snapshot phase: "current content as inserts, then changes"
  * is `startingVersion = 0` on a table whose v1 is retained, and a
  * consumer that wants "changes from now" passes the current version.
  * (Requiring it keeps restart replay exact: the first batch's lower
  * bound is always the option value, never a re-resolved head that
  * moved while the stream was down.)
  *
  * Commit-kind semantics are the batch feed's, per version in the
  * window: appends serve their added files as `insert` rows; upserts,
  * merges, updates, and deletes (deletion-vector deletes included)
  * serve their exact stamped change rows; compactions and
  * constraint/schema commits serve NOTHING (layout- or metadata-only,
  * content proven invariant), and
  * replace/restore/pre-stamping commits FAIL the stream typed —
  * `skipUnresolved = true` opts into skipping those, acknowledging
  * the gap. Vacuum retention must cover consumer lag, as for any
  * change feed.
  *
  * `maxVersionsPerTrigger` bounds each micro-batch's window so a
  * large backlog (a historical replay from `startingVersion = 0`)
  * arrives as a sequence of checkpointed batches. A bounded stream is
  * STATEFUL in the same way the rate-limited file stream is — the
  * next offer depends on the last one — so the source keeps the same
  * FileStreamSource-precedent cursor log under its `metadataPath`:
  * each new offer is persisted BEFORE it is returned, and a restart
  * recovers the high-water mark instead of re-offering versions the
  * engine already committed.
  */
final class ManifestChangeFeedSource(spark: SparkSession, path: String,
                                     override val schema: StructType,
                                     startingVersion: Long,
                                     skipUnresolved: Boolean,
                                     maxVersionsPerTrigger: Option[Long] = None,
                                     metadataPath: Option[String] = None)
    extends Source {

  private val limited = maxVersionsPerTrigger.isDefined

  // ---- cursor persistence (bounded streams only; see scaladoc) ----
  private val cursorSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def cursorDir = metadataPath.map { p =>
    val (fs, dir) = ManifestLake.fsFor(spark, p)
    (fs, new org.apache.hadoop.fs.Path(dir, "graft-cdf-cursor"))
  }

  private def loadCursor(): Option[Long] = cursorDir.flatMap { case (fs, dir) =>
    if (!fs.exists(dir)) None
    else {
      // a stray or partially-written cursor-<non-numeric> entry must
      // not crash getOffset forever — skip what doesn't parse
      val entries = fs.listStatus(dir).toSeq.filter(st =>
        st.getPath.getName.startsWith("cursor-") &&
          st.getPath.getName.stripPrefix("cursor-").toLongOption.isDefined)
      entries.flatMap(_.getPath.getName.stripPrefix("cursor-").toLongOption)
        .maxOption.foreach(n => cursorSeq.set(n + 1))
      val versions = entries.flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLongOption
        finally in.close()
      }
      versions.maxOption
    }
  }

  private def persistCursor(v: Long): Unit = cursorDir.foreach { case (fs, dir) =>
    fs.mkdirs(dir)
    val n = cursorSeq.getAndIncrement()
    val p = new org.apache.hadoop.fs.Path(dir, f"cursor-$n%020d")
    val out = fs.create(p, false)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    try fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("cursor-") &&
        name.stripPrefix("cursor-").toLongOption.exists(_ < n))
        fs.delete(st.getPath, false)
    } catch { case _: java.io.IOException => () }
  }

  @volatile private var cursor: Option[Long] =
    if (limited) loadCursor() else None

  private def advanceCursor(v: Long): Unit = synchronized {
    if (cursor.forall(_ < v)) cursor = Some(v)
  }

  override def getOffset: Option[Offset] = {
    val head = ManifestLake.currentVersion(spark, path)
    head match {
      case None => cursor.map(LongOffset.apply)
      case Some(h) =>
        val base = cursor.getOrElse(startingVersion)
        if (h <= base) cursor.map(LongOffset.apply)
        else {
          val target = maxVersionsPerTrigger.map(m => math.min(h, base + m)).getOrElse(h)
          if (limited) persistCursor(target)
          advanceCursor(target)
          Some(LongOffset(target))
        }
    }
  }

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = versionOf(end)
    // restart replay: adopt the checkpointed end as the cursor so the
    // next advance continues after it
    advanceCursor(e)
    val s = start.map(versionOf).getOrElse(startingVersion)
    val feed = ManifestLake.readChangeFeed(spark, path, s, e, skipUnresolved)
    // pin the stream-start schema: columns widened mid-stream wait for
    // a restart, same contract as the file stream
    org.apache.spark.sql.graft.StreamingDataFrameShim.asStreaming(
      feed.select(schema.fieldNames.map(col): _*))
  }

  override def stop(): Unit = ()
}
