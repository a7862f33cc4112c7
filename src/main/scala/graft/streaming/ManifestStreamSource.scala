package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.etl.ManifestLake
import graft.etl.ManifestLake.LiveFile

/** Offset of the manifest stream: `(version, files, snapshot)` —
  * "every version before `version` is fully consumed, plus the first
  * `files` files of `version`'s list" (`files < 0` = all of them;
  * `snapshot` marks that `version`'s list is the full live SNAPSHOT
  * set rather than its append diff, so a mid-snapshot restart knows
  * which list to resume slicing).
  *
  * A fully-consumed offset serializes as the PLAIN version number —
  * byte-identical to the `LongOffset` json the pre-rate-limit source
  * checkpointed, so existing checkpoints restart seamlessly and an
  * unlimited stream's checkpoint stays human-readable ("offset 7" =
  * "consumed through v7").
  */
private[streaming] final case class ManifestSourceOffset(
    version: Long, files: Long, snapshot: Boolean) extends Offset {
  override def json: String =
    if (files < 0) version.toString
    else s"""{"version":$version,"files":$files,"snapshot":$snapshot}"""
  /** Total order: within a version, a partial slice sorts below the
    * fully-consumed (-1) form.
    */
  def rank: (Long, Long) = (version, if (files < 0) Long.MaxValue else files)
}

private[streaming] object ManifestSourceOffset {
  def parse(o: Offset): ManifestSourceOffset = o match {
    case m: ManifestSourceOffset => m
    case l: LongOffset => ManifestSourceOffset(l.offset, -1L, snapshot = false)
    case other =>
      val s = other.json.trim
      if (!s.startsWith("{")) ManifestSourceOffset(s.toLong, -1L, snapshot = false)
      else {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val j = JsonMethods.parse(s)
        def long(f: String): Option[Long] = j \ f match {
          case JInt(v) => Some(v.toLong)
          case JLong(v) => Some(v)
          case _ => None
        }
        val v = long("version").getOrElse(throw new IllegalArgumentException(
          s"unparseable manifest stream offset: $s"))
        val files = long("files").getOrElse(-1L)
        val snap = j \ "snapshot" match {
          case JBool(b) => b
          case _ => false
        }
        ManifestSourceOffset(v, files, snap)
      }
  }
}

/** Structured-Streaming SOURCE over a manifested table — the read twin
  * of the manifest sinks: `spark.readStream.format("graft-manifest")
  * .load(path)` turns the table's commit log into a micro-batch
  * stream. Offsets ride the commit log at FILE granularity
  * ([[ManifestSourceOffset]]): version-granular when unlimited, and
  * sliced into bounded chunks under `maxFilesPerTrigger` /
  * `maxBytesPerTrigger`, so the initial snapshot of a 100 TB table is
  * a SEQUENCE of checkpointed micro-batches — incremental progress, a
  * failure redoes one bounded batch, not everything — and a large
  * append burst is consumed in bounded bites (Delta's rate-limit
  * contract). Every batch reuses the batch read path (manifest-fed
  * single scan, pruning, skipping) over its file slice, wrapped
  * streaming by the one-function shim.
  *
  * Batch semantics:
  *   - the FIRST offsets (no start) cover the INITIAL SNAPSHOT — every
  *     live file at the stream's first-seen head version, path-sorted
  *     so chunk boundaries are deterministic across restarts — unless
  *     `startingVersion` says "begin after version N" (no snapshot;
  *     the Delta `startingVersion` shape);
  *   - later offsets advance through each version's APPEND diff: a
  *     compaction, upsert, replace, or restore in the window FAILS the
  *     stream with a typed error, because feeding its rewritten files
  *     as new rows would be silent duplication. `ignoreNonAppend =
  *     true` opts into skipping such versions (Delta's `ignoreChanges`
  *     contract: rewritten rows are not re-fed).
  *
  * Rate-limit semantics: a batch takes files (across version
  * boundaries) until it reaches `maxFilesPerTrigger` or CROSSES
  * `maxBytesPerTrigger` (always admitting at least one file, so a
  * single file larger than the byte budget still flows), never
  * splitting a file. Limits bound INTAKE per trigger; correctness is
  * unchanged — the same rows arrive, in more, smaller, individually
  * committed batches.
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
                                 ignoreNonAppend: Boolean,
                                 maxFilesPerTrigger: Option[Int] = None,
                                 maxBytesPerTrigger: Option[Long] = None,
                                 metadataPath: Option[String] = None)
    extends Source {

  private val limited = maxFilesPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  private val rankOrd = implicitly[Ordering[(Long, Long)]]

  // ---- cursor persistence (rate-limited streams only) ----
  // A rate-limited source is STATEFUL: the next offer depends on the
  // last one, and after a restart where the final batch COMMITTED the
  // engine never replays it into the fresh source instance — a cursor
  // rebuilt from nothing would re-offer consumed offsets. The V1
  // answer is the FileStreamSource precedent: the source keeps its own
  // tiny log under the engine-provided `metadataPath`. Each NEW offer
  // is persisted BEFORE it is returned, so the recovered cursor is
  // always at or ahead of anything the engine logged — the engine then
  // batches forward from its own committed offset, and rows between
  // the two arrive exactly once. Sequence-numbered ~40-byte files, max
  // rank wins on load, older files reaped after each write.
  private val cursorSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def cursorDir = metadataPath.map(p => {
    val (fs, dir) = graft.etl.ManifestLake.fsFor(spark, p)
    (fs, new org.apache.hadoop.fs.Path(dir, "graft-cursor"))
  })

  private def loadCursor(): Option[ManifestSourceOffset] = cursorDir.flatMap {
    case (fs, dir) =>
      if (!fs.exists(dir)) None
      else {
        val entries = fs.listStatus(dir).toSeq
          .filter(_.getPath.getName.startsWith("cursor-"))
        entries.map(_.getPath.getName.stripPrefix("cursor-").toLong)
          .maxOption.foreach(n => cursorSeq.set(n + 1))
        val offsets = entries.map { st =>
          val in = fs.open(st.getPath)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
          ManifestSourceOffset.parse(
            org.apache.spark.sql.execution.streaming.SerializedOffset(s))
        }
        offsets.sortBy(_.rank)(rankOrd).lastOption
      }
  }

  private def persistCursor(o: ManifestSourceOffset): Unit = cursorDir.foreach {
    case (fs, dir) =>
      fs.mkdirs(dir)
      val n = cursorSeq.getAndIncrement()
      val p = new org.apache.hadoop.fs.Path(dir, f"cursor-$n%020d")
      val out = fs.create(p, false)
      try out.write((o.json + "\n").getBytes("UTF-8")) finally out.close()
      // best-effort reap of superseded files — leftovers are harmless
      // (load takes the max rank), so failures here never fail a batch
      try fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("cursor-") && name.stripPrefix("cursor-").toLong < n)
          fs.delete(st.getPath, false)
      } catch { case _: java.io.IOException => () }
  }

  /** The highest offset this source has handed out (getOffset) or been
    * shown (getBatch replay after restart) — the anchor the next
    * bounded advance starts from. V1 sources own this cursor: the
    * engine only ever asks "what's available NOW", so rate limiting
    * lives in how far past the cursor we offer. Recovered from the
    * persisted log on (re)start for rate-limited streams.
    */
  @volatile private var cursor: Option[ManifestSourceOffset] =
    if (limited) loadCursor() else None

  private def advanceCursor(o: ManifestSourceOffset): Unit = synchronized {
    if (cursor.forall(c => rankOrd.lt(c.rank, o.rank))) cursor = Some(o)
  }

  /** Version `v`'s file list as this stream sees it: the full live
    * snapshot set for the snapshot version, the append diff otherwise.
    */
  private def listFor(v: Long, snapshot: Boolean): Seq[LiveFile] =
    if (snapshot) ManifestLake.liveFilesAt(spark, path, v)
    else ManifestLake.addedFilesAt(spark, path, v, skipNonAppend = ignoreNonAppend)

  /** Walk forward from `base` taking whole files until the budgets are
    * spent or `head` is fully consumed; returns the end offset of the
    * next batch, or None when nothing is pending. `snapshotAt` marks
    * the version whose list is the snapshot set (stream birth with no
    * startingVersion); it can only be `base.version` or absent.
    */
  private def nextOffset(base: Option[ManifestSourceOffset],
                         head: Long): Option[ManifestSourceOffset] = {
    val fileBudget = maxFilesPerTrigger.map(_.toLong).getOrElse(Long.MaxValue)
    val byteBudget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var taken = 0L
    var bytes = 0L
    def budgetLeft: Boolean = taken < fileBudget && bytes < byteBudget
    // (version, consumed files, list identity) walk state
    var (v, consumed, snap) = base match {
      case Some(b) if b.files >= 0 => (b.version, b.files, b.snapshot)
      case Some(b) => (b.version + 1, 0L, false)
      case None => startingVersion match {
        case Some(sv) => (sv + 1, 0L, false)
        // stream birth: the snapshot version is the first-seen head
        case None => (head, 0L, true)
      }
    }
    if (v > head) return None
    var end: Option[ManifestSourceOffset] = None
    var exhaustedHead = false
    while (!exhaustedHead && budgetLeft) {
      val list = listFor(v, snap)
      var i = consumed
      while (i < list.length && budgetLeft) {
        bytes += list(i.toInt).bytes
        taken += 1
        i += 1
      }
      if (i > consumed || i >= list.length) {
        // progress in this version (or it was empty): record the end
        end = Some(
          if (i >= list.length) ManifestSourceOffset(v, -1L, snap)
          else ManifestSourceOffset(v, i, snap))
      }
      if (i >= list.length) {
        if (v >= head) exhaustedHead = true
        else { v += 1; consumed = 0L; snap = false }
      } else consumed = i
    }
    // an offset equal to the base is "nothing new" — report None so the
    // engine doesn't schedule an empty batch
    end.filterNot(e => base.exists(_.rank == e.rank))
  }

  override def getOffset: Option[Offset] = {
    val headOpt = ManifestLake.currentVersion(spark, path)
      // a head below startingVersion means "nothing to read yet", not
      // an empty-range getBatch call
      .filter(v => startingVersion.forall(sv => v > sv) || cursor.isDefined)
    headOpt match {
      case None => cursor
      case Some(head) =>
        val next =
          if (!limited) {
            // unlimited: offer everything through the head in one batch
            // (one offset per advance, version-granular — the original
            // contract, byte-identical checkpoint json)
            val base = cursor
            val target = ManifestSourceOffset(head, -1L,
              snapshot = base.isEmpty && startingVersion.isEmpty)
            if (base.exists(b => rankOrd.gteq(b.rank, target.rank))) None
            else Some(target)
          } else nextOffset(cursor, head)
        // persist BEFORE returning: the engine may log and commit this
        // offer, and the recovered cursor must never sit behind it
        if (limited) next.foreach(persistCursor)
        next.foreach(advanceCursor)
        // once something was offered, keep reporting the high-water mark
        // (returning None after a non-None would confuse the engine)
        next.orElse(cursor)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = ManifestSourceOffset.parse(end)
    // restart replay: the checkpoint's end arrives before any getOffset
    // — adopt it as the cursor so the next advance continues after it
    advanceCursor(e)
    val s: Option[ManifestSourceOffset] =
      start.map(ManifestSourceOffset.parse).orElse(
        startingVersion.map(sv => ManifestSourceOffset(sv, -1L, snapshot = false)))
    val head = ManifestLake.manifestAtOrFail(spark, path, e.version)
    val files = Seq.newBuilder[LiveFile]
    s match {
      case None =>
        // stream birth, snapshot phase: e covers only the snapshot
        // version (the walk never crosses a version boundary before the
        // snapshot completes)
        val snap = ManifestLake.liveFilesAt(spark, path, e.version)
        files ++= (if (e.files < 0) snap else snap.take(e.files.toInt))
      case Some(b) =>
        var v = b.version
        // finish the partially-consumed version first
        if (b.files >= 0) {
          val list = listFor(b.version, b.snapshot)
          val upTo = if (v == e.version && e.files >= 0) e.files else list.length.toLong
          files ++= list.slice(b.files.toInt, upTo.toInt)
        }
        v += 1
        while (v <= e.version) {
          val list = listFor(v, snapshot = false)
          val upTo = if (v == e.version && e.files >= 0) e.files else list.length.toLong
          files ++= list.take(upTo.toInt)
          v += 1
        }
    }
    val batch = ManifestLake.readFileSliceLogical(spark, path, head, files.result())
    // pin the stream-start schema: widened columns wait for a restart
    org.apache.spark.sql.graft.StreamingDataFrameShim.asStreaming(
      batch.select(schema.fieldNames.map(col): _*))
  }

  override def stop(): Unit = ()
}
