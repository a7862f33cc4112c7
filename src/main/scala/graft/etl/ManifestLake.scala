package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed lake — the OBJECT-STORE-NATIVE commit path that
  * [[Lake.compact]]/[[Lake.upsert]] deliberately do not provide (their
  * rename-swap contract holds on HDFS/ABFS-HNS/GCS; see the storage
  * contract at Lake.compact). On S3-class stores rename is copy+delete,
  * so this layout never moves a data file at all:
  *
  *   - data files are written ONCE, under a per-commit directory
  *     `data/v<N>/…` (hive-partitioned inside it), and stay there for
  *     their whole life;
  *   - a commit is the publication of ONE SMALL manifest file
  *     `_manifest/v<N>.list` — one `<bytes>\t<relpath>` line per live
  *     data file (sizes ride along so maintenance decisions never
  *     stat a file). Readers resolve the highest published version
  *     and read exactly those files: data written by a crashed or
  *     in-flight commit is INVISIBLE because no manifest names it;
  *   - the manifest itself is staged hidden and renamed into place.
  *     On HDFS that rename is atomic; on S3-class stores it is a
  *     copy+delete of a KILOBYTE object — object PUT/copy is atomic
  *     per object, so readers see either no v<N> manifest or a
  *     complete one, never a torn file. (Contrast: renaming DATA files
  *     copies gigabytes and has a real crash window — the exact
  *     asymmetry this layout exists to exploit.)
  *
  * Failure contract: a crash ANYWHERE before manifest publication
  * leaves the table exactly at the previous version plus some
  * unreferenced files that [[vacuum]] later deletes. There is no
  * window where a reader can observe partial, duplicate, or missing
  * rows. Concurrency contract: SINGLE WRITER (same as Lake's
  * maintenance ops) — two simultaneous committers could both publish
  * the same next version; serializing committers (or a store with
  * conditional PUT) is the deployment's job and is documented here
  * rather than half-solved.
  *
  * Scale notes: the manifest lists every live file — fine into the
  * low millions of files as a flat list (a 100-byte line per file);
  * beyond that, production formats shard manifests per partition and
  * commit a root pointer (Iceberg's manifest list). This
  * implementation keeps the single-level list and says so — the
  * COMMIT mechanics (immutable data + tiny atomic pointer) are the
  * deliverable, and they do not change under sharding. Old versions
  * stay readable until vacuumed (readVersion), which is what makes
  * concurrent long scans safe during compaction: a scan planned on
  * v(N) keeps reading v(N)'s files while v(N+1) publishes.
  */
object ManifestLake {

  private val ManifestDir = "_manifest"
  private val DataDir = "data"

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def manifestPath(root: Path, v: Long): Path =
    new Path(new Path(root, ManifestDir), f"v$v%06d.list")

  /** Highest published version, or None for a not-yet-created table. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val (fs, root) = fsFor(spark, path)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toLong }
      .maxOption
  }

  /** One live data file: root-relative path plus its size. Sizes live
    * IN the manifest so maintenance decisions (compaction detection)
    * read zero file metadata — "the manifest IS the listing" has to
    * include the one attribute the decisions need, or every poll
    * degenerates into a per-file getFileStatus walk.
    */
  final case class LiveFile(bytes: Long, path: String)

  /** Live files of version `v`. Line format: `<bytes>\t<relpath>`. */
  private def readManifest(fs: FileSystem, root: Path, v: Long): Seq[LiveFile] = {
    val in = fs.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        LiveFile(line.substring(0, i).toLong, line.substring(i + 1))
      }
    finally in.close()
  }

  /** Publish `files` as version `v`: stage hidden, rename into place.
    * The rename target is a kilobyte object — see the class doc for why
    * this is the one rename the object-store path can afford.
    */
  private def publish(fs: FileSystem, root: Path, v: Long, files: Seq[LiveFile]): Unit = {
    val dir = new Path(root, ManifestDir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".tmp-v$v%06d.list")
    val out = fs.create(tmp, true)
    try out.write((files.sortBy(_.path)
      .map(f => s"${f.bytes}\t${f.path}").mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(root, v)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest version $v already published at $target — concurrent writer? " +
          "This layout is single-writer; serialize committers.")
    }
  }

  /** All parquet files under a per-commit data dir, root-relative, with
    * sizes straight off the listing (no extra RPCs).
    */
  private def stagedFiles(fs: FileSystem, root: Path, commitDir: Path): Seq[LiveFile] = {
    val rootQ = fs.makeQualified(root).toString
    val it = fs.listFiles(commitDir, true)
    val out = Seq.newBuilder[LiveFile]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        out += LiveFile(f.getLen,
          fs.makeQualified(f.getPath).toString.stripPrefix(rootQ).stripPrefix("/"))
    }
    out.result()
  }

  /** Write `df` as the NEXT version of the manifested table at `path`
    * (creating it at v1): data lands under `data/v<N>/` hive-partitioned
    * by `partitionCols`, is count-verified against the plan, and becomes
    * visible only when the manifest publishes. `replace = true`
    * publishes ONLY the new files (full-table replacement); `replace =
    * false` appends them to the previous version's live set.
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
            partitionCols: Seq[String], replace: Boolean = true): Long = {
    val (fs, root) = fsFor(spark, path)
    val v = currentVersion(spark, path).getOrElse(0L) + 1
    val commitDir = new Path(root, f"$DataDir/v$v%06d")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(commitDir.toString)
    // verify the staged copy while it is still invisible — same
    // verify-before-commit stance as Lake.compact, minus any window:
    // a failure here aborts with the table untouched at v-1
    val staged = stagedFiles(fs, root, commitDir)
    val rowsIn = df.count()
    // empty input stages no parquet files — nothing to re-read (an empty
    // replace is a defined state: the manifest lists nothing)
    val rowsOut =
      if (staged.isEmpty) 0L
      else spark.read.parquet(commitDir.toString).count()
    if (rowsOut != rowsIn || (rowsIn > 0 && staged.isEmpty)) {
      fs.delete(commitDir, true)
      throw new IllegalStateException(
        s"manifest write verification failed for $path v$v: $rowsIn rows in, " +
          s"$rowsOut staged — table still at v${v - 1}")
    }
    val carried =
      if (replace || v == 1) Seq.empty
      else readManifest(fs, root, v - 1)
    publish(fs, root, v, carried ++ staged)
    v
  }

  /** Read an explicit live-file set: one basePath per per-commit dir so
    * partition-column discovery works, later groups aligned to the
    * first group's schema (partition values are directory strings —
    * per-group inference may type them differently).
    */
  private def readFiles(spark: SparkSession, root: Path,
                        files: Seq[String]): DataFrame = {
    val groups = files.groupBy(_.split("/").take(2).mkString("/")).toSeq.sortBy(_._1)
    val frames = groups.map { case (commitDir, fls) =>
      spark.read
        .option("basePath", new Path(root, commitDir).toString)
        .parquet(fls.map(f => new Path(root, f).toString): _*)
    }
    frames.reduce { (a, b) =>
      val cols = a.schema.fields.map(f => col(f.name).cast(f.dataType))
      a.unionByName(b.select(cols: _*))
    }
  }

  /** Read a specific published version (time travel / in-flight scans). */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    val (fs, root) = fsFor(spark, path)
    val files = readManifest(fs, root, v)
    if (files.isEmpty) spark.emptyDataFrame
    else readFiles(spark, root, files.map(_.path))
  }

  /** Read the table at its highest published version. */
  def read(spark: SparkSession, path: String): DataFrame =
    currentVersion(spark, path) match {
      case Some(v) => readVersion(spark, path, v)
      case None => spark.emptyDataFrame
    }

  /** Metadata-only fragmentation inventory — [[Lake.inventory]]'s twin
    * for manifested tables, except it costs ONE manifest read and an
    * in-memory fold: no filesystem listing, no per-file stats. One row
    * per live partition with file count, bytes, largest file, and
    * whether [[compact]] would rewrite it at `targetBytes`.
    */
  def inventory(spark: SparkSession, path: String,
                targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val (fs, root) = fsFor(spark, path)
    val rows = currentVersion(spark, path) match {
      case None => Seq.empty
      case Some(v) =>
        readManifest(fs, root, v)
          .groupBy(f => f.path.split("/").drop(2).dropRight(1).mkString("/"))
          .toSeq.sortBy(_._1)
          .map { case (part, fls) =>
            val bytes = fls.map(_.bytes).sum
            val want = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
            (part, fls.length.toLong, bytes,
              if (fls.isEmpty) 0L else fls.map(_.bytes).max,
              fls.length > want)
          }
    }
    rows.toDF("partition_dir", "n_files", "total_bytes", "max_file_bytes",
      "needs_compaction")
  }

  /** Small-file compaction under manifest commit: partitions whose live
    * file count exceeds ceil(bytes/targetBytes) are rewritten into
    * `data/v<N>/` and the new manifest carries (untouched ∪ rewritten);
    * the OLD files are not touched — still serving v(N-1) scans until
    * [[vacuum]]. Detection reads ZERO file metadata: sizes live in the
    * manifest, so deciding what to compact is a pure in-memory fold
    * over it — the manifest IS the listing, which is the other thing
    * this layout buys at 720k-leaf scale (the rename-swap lake's
    * detection pass lists every partition per poll).
    *
    * Returns (partitionRelDir, filesBefore, filesAfter) per rewritten
    * partition.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Seq.empty): Seq[(String, Int, Int)] = {
    val (fs, root) = fsFor(spark, path)
    val v = currentVersion(spark, path).getOrElse(
      return Seq.empty)
    val live = readManifest(fs, root, v)
    // partition key = the hive dirs between data/v…/ and the file name
    def partOf(rel: String): String =
      rel.split("/").drop(2).dropRight(1).mkString("/")
    val byPart = live.groupBy(f => partOf(f.path))
    val plans = byPart.toSeq.sortBy(_._1).flatMap { case (part, fls) =>
      val bytes = fls.map(_.bytes).sum
      val want = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
      if (fls.length <= want) None else Some((part, fls, want))
    }
    if (plans.isEmpty) return Seq.empty
    val newV = v + 1
    val commitDir = new Path(root, f"$DataDir/v$newV%06d")
    val report = plans.map { case (part, fls, want) =>
      val src = spark.read.parquet(fls.map(f => new Path(root, f.path).toString): _*)
      val cluster = clusterBy.filter(src.columns.contains).map(col)
      // same file-count-target stance as Lake.compact: when the scan
      // bin-packs below the target, coalesce can only undershoot — range-
      // repartition on the cluster key (free row-group clustering) or
      // round-robin when the table has no sort key
      val shaped =
        if (src.rdd.getNumPartitions < want) {
          if (cluster.nonEmpty) src.repartitionByRange(want, cluster: _*)
          else src.repartition(want)
        } else src.coalesce(want)
      val sorted = if (cluster.nonEmpty) shaped.sortWithinPartitions(cluster: _*) else shaped
      val dest = if (part.isEmpty) commitDir else new Path(commitDir, part)
      sorted.write.mode(SaveMode.Overwrite).parquet(dest.toString)
      val rowsIn = src.count()
      val rowsOut = spark.read.parquet(dest.toString).count()
      if (rowsOut != rowsIn)
        throw new IllegalStateException(
          s"manifest compact verification failed for $path $part: " +
            s"$rowsIn rows in, $rowsOut staged — table still at v$v")
      (part, fls.length, stagedFiles(fs, root, dest).length)
    }
    val rewritten = plans.map(_._1).toSet
    val untouched = live.filterNot(f => rewritten.contains(partOf(f.path)))
    publish(fs, root, newV, untouched ++ stagedFiles(fs, root, commitDir))
    report
  }

  /** Key-level upsert (merge-into) under manifest commit — the
    * object-store twin of [[Lake.upsert]]: rows in `updates` replace
    * live rows with the same key, new keys append, and only the
    * AFFECTED partitions' data is rewritten — untouched partitions'
    * files carry into the new manifest by reference, zero I/O. The
    * merge becomes visible atomically when the manifest publishes; a
    * crash at any earlier point leaves the table at the previous
    * version (plus invisible orphans for [[vacuum]]).
    *
    * Affected partitions resolve from the UPDATE BATCH's partition
    * values rendered through Spark's own partition-path escaping, so
    * the dir names match what partitioned writes produced. `updates`
    * must be key-unique and its partition values non-null (both
    * checked — same loud-failure stance as Lake.upsert).
    *
    * Returns the published version.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             partitionCols: Seq[String], keyCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty,
      "manifest upsert needs a partitioned table (affected-partition " +
        "pruning keys on the partition columns); replace flat tables wholesale")
    require(partitionCols.forall(keyCols.contains),
      "partition columns must be part of the key")
    val (fs, root) = fsFor(spark, path)
    // the batch feeds ~5 actions (key-unique check, partition collect,
    // merge write, verification joins) — pin it for the call's lifetime
    // so each action reuses one evaluation instead of replaying the
    // caller's upstream plan
    updates.persist()
    try {
      upsertPinned(spark, fs, root, path, updates, partitionCols, keyCols)
    } finally {
      updates.unpersist()
      ()
    }
  }

  private def upsertPinned(spark: SparkSession, fs: FileSystem, root: Path,
                           path: String, updates: DataFrame,
                           partitionCols: Seq[String], keyCols: Seq[String]): Long = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val nUpd = updates.count()
    val nUpdKeys = updates.select(keyCols.map(col): _*).distinct().count()
    if (nUpd != nUpdKeys)
      throw new IllegalArgumentException(
        s"updates are not key-unique on ${keyCols.mkString(",")}: $nUpd rows, $nUpdKeys keys")
    val v = currentVersion(spark, path).getOrElse(0L)
    if (v == 0L) return write(spark, updates, path, partitionCols)

    // affected partition dirs, rendered exactly as partitioned writes
    // render them (one small collect — bounded by the batch's partition
    // spread, which is small against the lake by definition)
    val partRows = updates
      .select(partitionCols.map(c => col(c).cast("string").as(c)): _*)
      .distinct().collect()
    require(partRows.forall(r => partitionCols.indices.forall(i => !r.isNullAt(i))),
      "null partition values are not supported by the manifest upsert")
    val affectedDirs = partRows.map(r =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        s"${escapePathName(c)}=${escapePathName(r.getString(i))}"
      }.mkString("/")).toSet

    val live = readManifest(fs, root, v)
    def partOf(rel: String): String =
      rel.split("/").drop(2).dropRight(1).mkString("/")
    val (affectedFiles, untouched) = live.partition(f => affectedDirs.contains(partOf(f.path)))

    // merge: updates win key collisions outright (the batch is the
    // newer truth) — same shape as Lake.upsert's merge
    val updSchema = updates.schema
    val merged =
      if (affectedFiles.isEmpty) updates
      else {
        val affected = readFiles(spark, root, affectedFiles.map(_.path))
          .select(updSchema.fieldNames.map(n =>
            col(n).cast(updSchema(n).dataType)): _*)
        val byKey = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col("__src").desc)
        affected.withColumn("__src", lit(0))
          .unionByName(updates.withColumn("__src", lit(1)))
          .withColumn("__rn", row_number().over(byKey))
          .where(col("__rn") === 1)
          .drop("__src", "__rn")
      }

    val newV = v + 1
    val commitDir = new Path(root, f"$DataDir/v$newV%06d")
    merged.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(commitDir.toString)

    // verify the staged merge while it is invisible: key-unique and
    // every update key present
    val out = spark.read.parquet(commitDir.toString)
    val rowsOut = out.count()
    val keysOut = out.select(keyCols.map(col): _*).distinct().count()
    val updKeysOut = out.join(broadcast(updates.select(keyCols.map(col): _*)),
      keyCols.toSeq, "left_semi").count()
    if (rowsOut != keysOut || updKeysOut != nUpdKeys) {
      fs.delete(commitDir, true)
      throw new IllegalStateException(
        s"manifest upsert verification failed for $path: $rowsOut rows / " +
          s"$keysOut keys, $updKeysOut of $nUpdKeys update keys staged — " +
          s"table still at v$v")
    }
    publish(fs, root, newV, untouched ++ stagedFiles(fs, root, commitDir))
    newV
  }

  /** Delete everything no published-and-kept manifest references:
    * data files orphaned by crashes or superseded by compaction, and
    * manifests older than the `keepVersions` most recent. Run AFTER
    * the longest plausible scan on an old version could have finished
    * — the retention window is the deployment's scan-length SLA — and
    * NEVER concurrently with an in-flight commit: a committer's staged
    * files are unreferenced until its manifest publishes, so a
    * concurrent vacuum would delete them out from under it (the
    * single-writer contract covers this — vacuum is a maintenance op
    * of the same writer).
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val (fs, root) = fsFor(spark, path)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) return Seq.empty
    val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toLong }
      .sorted
    if (versions.isEmpty) return Seq.empty
    val keep = versions.takeRight(keepVersions)
    val liveAcrossKept = keep.flatMap(readManifest(fs, root, _)).map(_.path).toSet
    val dataRoot = new Path(root, DataDir)
    val removed = Seq.newBuilder[String]
    if (fs.exists(dataRoot)) {
      val rootQ = fs.makeQualified(root).toString
      val it = fs.listFiles(dataRoot, true)
      val dead = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        val rel = fs.makeQualified(f.getPath).toString.stripPrefix(rootQ).stripPrefix("/")
        if (f.isFile && !liveAcrossKept.contains(rel)) dead += f.getPath
      }
      dead.result().foreach { p =>
        removed += p.toString
        fs.delete(p, false)
      }
    }
    versions.dropRight(keepVersions).foreach { old =>
      removed += manifestPath(root, old).toString
      fs.delete(manifestPath(root, old), false)
    }
    removed.result()
  }
}
