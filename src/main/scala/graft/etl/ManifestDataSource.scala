package graft.etl

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `graft-manifest` — the data-source registration that makes the
  * manifest lake consumable WITHOUT touching [[ManifestLake]]'s Scala
  * API, i.e. from SQL, Python, R, and BI tools:
  *
  * {{{
  *   -- pure SQL (the only surface a spark.sql-only user has):
  *   CREATE TEMPORARY VIEW docs
  *     USING `graft-manifest` OPTIONS (path '/lake/docs', versionAsOf '7');
  *   SELECT lang, count(*) FROM docs GROUP BY lang;
  *
  *   // DataFrame API, any language binding:
  *   spark.read.format("graft-manifest").option("versionAsOf", 7).load(path)
  *   df.write.format("graft-manifest").partitionBy("lang")
  *     .option("statsCols", "doc_id").mode("append").save(path)
  * }}}
  *
  * Read options: `versionAsOf` (time travel; default = head version)
  * or `timestampAsOf` (epoch millis / ISO-8601 instant / session
  * `yyyy-MM-dd HH:mm:ss` — resolves the latest version whose manifest
  * was published at or before the instant; mutually exclusive with
  * `versionAsOf`).
  * Write options: `statsCols` (comma-separated columns to collect
  * file-level [min,max] skipping stats for), `txnAppId` + `txnBatchId`
  * (the exactly-once ledger — a replayed (appId, batchId) at or below
  * the recorded watermark publishes nothing). `partitionBy` comes from
  * the writer API itself. Save modes map onto the manifest commit kinds:
  * Overwrite = replace commit, Append = append commit (additive schema
  * evolution included), ErrorIfExists/Ignore behave per their contract
  * against table existence.
  *
  * Mechanism note: this is a V1 `RelationProvider` serving the SAME
  * `HadoopFsRelation`-over-[[ManifestFileIndex]] the programmatic read
  * plans — deliberately, and for the same reason Spark's own file
  * sources default to the V1 path (`spark.sql.sources.useV1SourceList`
  * ships with parquet/orc/csv/… in it) and Delta Lake registers its
  * format as a `RelationProvider`: `FileSourceScanExec` is where
  * partition pruning, file-level data skipping, parquet filter
  * pushdown, and whole-stage codegen already live. The manifest-fed
  * index plugs in unchanged, so the `format(...)` path plans the
  * IDENTICAL single-scan, pruned, skipping plan as
  * [[ManifestLake.read]] — asserted by ManifestDataSourceSpec's
  * plan-shape cases. (Spark's own `ResolveSQLOnFile` gates the
  * `` SELECT … FROM `fmt`.`path` `` direct-query syntax to
  * `FileFormat` classes — for table-format providers, Delta included,
  * it raises UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY. The injected
  * parser serves that spelling for manifest tables instead, plus
  * `VERSION AS OF` / `TIMESTAMP AS OF` — see
  * [[GraftSqlDml.rewriteReads]]; the temp-view form above remains the
  * extensions-free entry.)
  */
final class ManifestDataSource extends DataSourceRegister
    with RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft-manifest"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest needs a table path: .load(path) / OPTIONS (path '…')"))

  private def splitCols(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    // `view` serves the table's METADATA surfaces through the same SQL
    // entry point as the data — DESCRIBE HISTORY / DESCRIBE DETAIL for
    // a spark.sql-only user:
    //   CREATE TEMPORARY VIEW h USING `graft-manifest`
    //     OPTIONS (path '/lake/docs', view 'history');
    parameters.get("view").map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case Some("history") | Some("detail") =>
        require(!parameters.contains("versionAsOf") &&
          !parameters.contains("timestampAsOf"),
          "view 'history'/'detail' already spans versions — versionAsOf/" +
            "timestampAsOf do not apply")
        val isHistory = parameters("view").equalsIgnoreCase("history")
        def derive() =
          if (isHistory) ManifestLake.history(spark, path)
          else ManifestLake.detail(spark, path)
        // rows re-derive at SCAN time, not view-creation time — a temp
        // view over the history tracks the live table across commits
        return new MetadataViewRelation(sqlContext, derive().schema,
          () => derive().collect().toSeq)
      case Some("data") | None => ()
      case Some(other) => throw new IllegalArgumentException(
        s"unknown view '$other' — one of: data (default), history, detail")
    }
    val byVersion = parameters.get("versionAsOf").map { s =>
      s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf must be a version number, got '$s'"))
    }
    // timestampAsOf accepts epoch millis, an ISO-8601 instant, or the
    // session-zone `yyyy-MM-dd HH:mm:ss[.fff]` form SQL users write
    val byTs = parameters.get("timestampAsOf").map(s =>
      ManifestLake.versionAtTimestamp(spark, path,
        ManifestDataSource.parseMillis("timestampAsOf", s)))
    require(byVersion.isEmpty || byTs.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    ManifestLake.relation(spark, path, byVersion.orElse(byTs))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    // the writer API encodes .partitionBy(...) into an options key
    // (DataSourceUtils.PARTITIONING_COLUMNS_KEY, JSON list) for V1
    // creatable sources; a plain `partitionCols` option is accepted for
    // callers driving the source through SQL, where partitionBy doesn't
    // exist. An APPEND that names neither inherits the table's recorded
    // partitioning — the common steady-state append shouldn't have to
    // restate what the manifest already knows.
    val declared = parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(DataSourceUtils.decodePartitioningColumns)
      .orElse(parameters.get("partitionCols").map(splitCols))
    val statsCols = parameters.get("statsCols").map(splitCols).getOrElse(Seq.empty)
    val txn = (parameters.get("txnAppId"), parameters.get("txnBatchId")) match {
      case (Some(app), Some(b)) =>
        Some((app, b.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"txnBatchId must be a number, got '$b'"))))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnBatchId must be set together (the exactly-once " +
          "ledger keys on the pair)")
    }
    val exists = ManifestLake.currentVersion(spark, path).isDefined
    def recordedPartCols: Seq[String] =
      ManifestLake.recordedPartitionCols(spark, path).getOrElse(Seq.empty)
    mode match {
      case SaveMode.Overwrite =>
        ManifestLake.write(spark, data, path, declared.getOrElse(Seq.empty),
          replace = true, txn = txn, statsCols = statsCols): Unit
      case SaveMode.Append =>
        ManifestLake.write(spark, data, path,
          declared.getOrElse(if (exists) recordedPartCols else Seq.empty),
          replace = false, txn = txn, statsCols = statsCols): Unit
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"manifest table already exists at $path (mode ErrorIfExists); " +
            "use mode('append') or mode('overwrite')")
      case SaveMode.ErrorIfExists =>
        ManifestLake.write(spark, data, path, declared.getOrElse(Seq.empty),
          replace = true, txn = txn, statsCols = statsCols): Unit
      case SaveMode.Ignore =>
        if (!exists)
          ManifestLake.write(spark, data, path, declared.getOrElse(Seq.empty),
            replace = true, txn = txn, statsCols = statsCols): Unit
    }
    createRelation(sqlContext, parameters)
  }

  // ---- streaming source: spark.readStream.format("graft-manifest") ----
  // Read options: `startingVersion` (begin with changes AFTER version N
  // instead of an initial full snapshot), `ignoreNonAppend` (skip
  // compaction/upsert/replace/restore commits instead of failing the
  // stream — Delta's ignoreChanges contract), `maxFilesPerTrigger` /
  // `maxBytesPerTrigger` (bound each micro-batch's intake so the
  // initial snapshot and large append bursts arrive as a sequence of
  // checkpointed batches instead of one monolith — Delta's rate-limit
  // contract; at least one file always flows per trigger). Offsets are
  // (version, fileOrdinal) composites riding the commit log; see
  // [[graft.streaming.ManifestStreamSource]].
  //
  // `readChangeFeed = true` streams the ROW-LEVEL CHANGE FEED instead
  // of added files: table columns + _change_type/_commit_version per
  // commit, upserts/deletes served as exact stamped change rows —
  // requires an explicit `startingVersion`; `maxVersionsPerTrigger`
  // bounds each window; `ignoreNonAppend` maps to the batch feed's
  // skipUnresolved. See [[graft.streaming.ManifestChangeFeedSource]].

  private def isChangeFeedStream(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** The stream's schema: the RECORDED head schema at stream start (the
    * table must exist — an empty stream over a nonexistent table has no
    * schema to declare, same stance as Delta). Under
    * `readChangeFeed = true` the feed's `_change_type` /
    * `_commit_version` metadata columns are appended, nullabilities
    * matching the batch feed.
    */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    ManifestLake.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"cannot stream from $path: no manifest table exists there yet"))
    val table = ManifestLake.read(spark, path).schema
    // a schema arrives here on two routes: a user's .schema(...) —
    // refused unless it IS the recorded one (the stream serves the
    // table's schema, never a reinterpretation) — and the analyzer's
    // catalog-table streaming fallback, which echoes the catalog's own
    // rendering of the recorded schema back at us (FindDataSourceTable
    // passes CatalogTable.schema as the user schema); that echo must
    // pass, or readStream.table() could never resolve
    schema.filter(_.nonEmpty).foreach(s => require(
      org.apache.spark.sql.graftshim.SparkShims.sameType(s, table),
      "graft-manifest streams the table's recorded schema; a differing " +
        s"user-specified schema cannot be honored (recorded: ${table.sql})"))
    val out =
      if (!isChangeFeedStream(parameters)) table
      else StructType(table.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType)))
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val startingVersion = parameters.get("startingVersion").map { s =>
      s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startingVersion must be a version number, got '$s'"))
    }
    val ignoreNonAppend = parameters.get("ignoreNonAppend").exists(_.toBoolean)
    def positive[T](name: String, parse: String => Option[T], ok: T => Boolean): Option[T] =
      parameters.get(name).map { s =>
        parse(s).filter(ok).getOrElse(throw new IllegalArgumentException(
          s"$name must be a positive number, got '$s'"))
      }
    val maxFiles = positive[Int]("maxFilesPerTrigger", _.toIntOption, (n: Int) => n > 0)
    val maxBytes = positive[Long]("maxBytesPerTrigger", _.toLongOption, (n: Long) => n > 0)
    val (_, pinned) = sourceSchema(sqlContext, schema, providerName, parameters)
    if (isChangeFeedStream(parameters)) {
      // startingTimestamp resolves ONCE at stream creation to the last
      // version published at or before the instant — changes strictly
      // after it flow, the Delta CDF-stream contract; restart replay
      // stays exact because the checkpointed offsets carry versions
      val byStartTs = parameters.get("startingTimestamp").map(s =>
        ManifestLake.versionAtTimestamp(sqlContext.sparkSession, path,
          ManifestDataSource.parseMillis("startingTimestamp", s)))
      require(startingVersion.isEmpty || byStartTs.isEmpty,
        "startingVersion and startingTimestamp are mutually exclusive")
      val sv = startingVersion.orElse(byStartTs).getOrElse(
        throw new IllegalArgumentException(
        "a change-feed stream requires an explicit startingVersion (changes " +
          "strictly after it flow first; pass 0 for a full historical replay " +
          "on a fully-retained table, or the current version for changes from " +
          "now) or startingTimestamp — an implicit one could not replay its " +
          "first batch exactly across a restart"))
      require(maxFiles.isEmpty && maxBytes.isEmpty,
        "maxFilesPerTrigger/maxBytesPerTrigger do not apply to a change-feed " +
          "stream (its batches are version windows); use maxVersionsPerTrigger")
      val maxVersions =
        positive[Long]("maxVersionsPerTrigger", _.toLongOption, (n: Long) => n > 0)
      new graft.streaming.ManifestChangeFeedSource(sqlContext.sparkSession, path,
        pinned, sv, ignoreNonAppend, maxVersions, Some(metadataPath))
    } else
      new graft.streaming.ManifestStreamSource(sqlContext.sparkSession, path,
        pinned, startingVersion, ignoreNonAppend, maxFiles, maxBytes,
        Some(metadataPath))
  }

  // ---- streaming sink: df.writeStream.format("graft-manifest") ----
  // Options: `txnAppId` (REQUIRED — the exactly-once ledger identity),
  // `keyCols` (Update mode upserts by these), `statsCols`,
  // `maintainEvery`; partitioning via .partitionBy(...), a
  // `partitionCols` option, or the recorded header on append. Output
  // modes map to commit kinds (Append→append, Update→upsert,
  // Complete→replace); see [[graft.streaming.ManifestStreamSink]].
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    val declared =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitionCols").map(splitCols).getOrElse(Seq.empty)
    val appId = parameters.getOrElse("txnAppId", "")
    val keyCols = parameters.get("keyCols").map(splitCols).getOrElse(Seq.empty)
    val statsCols = parameters.get("statsCols").map(splitCols).getOrElse(Seq.empty)
    val maintainEvery = parameters.get("maintainEvery").map { s =>
      s.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"maintainEvery must be a positive number, got '$s'"))
    }
    val changeFeed = parameters.get("changeFeed").forall(_.toBoolean)
    new graft.streaming.ManifestStreamSink(sqlContext.sparkSession, path,
      declared, outputMode, appId, keyCols, statsCols, maintainEvery,
      changeFeed)
  }
}

object ManifestDataSource {

  /** Epoch millis from the three timestamp spellings every option here
    * accepts: raw millis, ISO-8601 instant, `yyyy-MM-dd HH:mm:ss[.fff]`.
    */
  private[etl] def parseMillis(opt: String, s: String): Long =
    if (s.forall(_.isDigit)) s.toLong
    else try java.time.Instant.parse(s).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.sql.Timestamp.valueOf(s).getTime
        catch {
          case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"$opt must be epoch millis, an ISO-8601 instant, " +
                s"or 'yyyy-MM-dd HH:mm:ss', got '$s'")
        }
    }
}

/** A metadata view (history / detail) served as a scannable relation:
  * rows re-derive from the manifest chain on every scan (so a temp
  * view stays current across commits) and parallelize from the driver
  * — the row count is metadata-scale (one per version / one total),
  * never data-scale.
  */
private[etl] final class MetadataViewRelation(
    @transient override val sqlContext: SQLContext,
    override val schema: StructType,
    rows: () => Seq[org.apache.spark.sql.Row])
  extends BaseRelation with org.apache.spark.sql.sources.TableScan {
  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    sqlContext.sparkContext.parallelize(rows(), 1)
}
