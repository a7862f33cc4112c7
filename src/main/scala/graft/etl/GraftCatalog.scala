package graft.etl

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NAMED manifest tables — a DataSource V2 [[TableCatalog]] mapping
  * `catalog.namespace.table` onto manifest roots under a warehouse
  * directory, so the whole SQL/DataFrame surface works by NAME instead
  * of spelling the path in every statement:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.etl.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /lake/warehouse
  *
  *   CREATE TABLE graft.genomics.calls (…) PARTITIONED BY (chrom)
  *   MERGE INTO graft.genomics.calls t USING updates s ON …
  *   SELECT * FROM graft.genomics.calls VERSION AS OF 3
  *   SHOW TABLES IN graft.genomics
  *   df.writeTo("graft.genomics.calls").append()
  * }}}
  *
  * `graft.ns.t` resolves to `<warehouse>/ns/t` — the table IS that
  * directory, exactly as with the explicit `` `graft-manifest`.`/path` ``
  * spelling; both spellings address the SAME table state and can be
  * mixed freely. A namespace is a directory; a table is a directory
  * holding a `_manifest` log. There is no separate metastore — the
  * filesystem IS the catalog, which is what makes the two spellings
  * trivially consistent (nothing to drift).
  *
  * Division of labor (the same one Delta's DeltaCatalog strikes):
  * verbs whose SEMANTICS the engine owns — DML, DDL, maintenance,
  * time travel — are claimed by the injected parser
  * ([[GraftSqlParser]]), which resolves `catalog.ns.t` through
  * [[GraftCatalog.identPath]] and dispatches to the engine exactly as
  * it does for path spellings. The catalog class itself serves the
  * CATALOG surface: existence/listing (`SHOW TABLES/NAMESPACES`,
  * `tableExists`), `DROP TABLE` (a NAMED table under a managed
  * warehouse is droppable — unlike a path spelling, where the
  * directory belongs to the storage layer), `spark.table(...)` and
  * `df.writeTo(...)` (which never pass through the parser — the
  * injected resolution rule [[GraftCatalogRule]] swaps the loaded
  * [[GraftNamedTable]] for the engine's plan / write commands).
  *
  * Scale note: every catalog call is O(one directory listing) or
  * delegates to the engine's manifest machinery — nothing here reads
  * data files, so the catalog adds zero per-query I/O beyond the
  * manifest read the engine performs anyway.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog $name needs a warehouse root — set " +
        s"spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private[etl] def warehousePath: String = warehouse

  override def defaultNamespace(): Array[String] = Array("default")

  private def spark: SparkSession = SparkSession.active

  private def pathOf(ident: Identifier): String =
    GraftCatalog.tablePath(warehouse, ident.namespace.toSeq, ident.name)

  private def nsPath(ns: Seq[String]): String = {
    ns.foreach(GraftCatalog.validSegment)
    (warehouse +: ns).mkString("/")
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val (fs, root) = ManifestLake.fsFor(spark, nsPath(namespace.toSeq))
    if (!fs.exists(root)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(root).filter(_.isDirectory)
      .filter(st => fs.exists(new Path(st.getPath, "_manifest")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    ManifestLake.currentVersion(spark, pathOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (ManifestLake.currentVersion(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    GraftNamedTable(spark, s"$catalogName.${ident.toString}",
      catalogName +: ident.namespace.toSeq :+ ident.name, path, None)
  }

  /** `VERSION AS OF` through the catalog route (spark.read.option /
    * DataFrameReader time travel) — SQL time travel is already claimed
    * at parse time by [[GraftSqlDml.rewriteReads]].
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"VERSION AS OF on a manifest table must be a version number, got '$version'"))
    if (ManifestLake.currentVersion(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    GraftNamedTable(spark, s"$catalogName.${ident.toString}",
      catalogName +: ident.namespace.toSeq :+ ident.name, path, Some(v))
  }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (ManifestLake.currentVersion(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    val v = ManifestLake.versionAtTimestamp(spark, path,
      Math.floorDiv(timestampMicros, 1000L))
    GraftNamedTable(spark, s"$catalogName.${ident.toString}",
      catalogName +: ident.namespace.toSeq :+ ident.name, path, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references().length == 1 &&
        t.references()(0).fieldNames().length == 1,
        s"unsupported partition transform $t — manifest tables partition " +
          "by identity columns")
      t.references()(0).fieldNames()(0)
    }
    // Spark stuffs bookkeeping keys (provider, owner, location hints)
    // into the properties map — those are not USER declarations and are
    // ignored; anything else unknown refuses, same stance as SQL CREATE
    val sparkManaged = Set("provider", "owner", "location",
      "is_managed_location", "external", "table_type", "comment", "collation")
    val props = properties.asScala
    // a USER-supplied location/comment must not be silently dropped: the
    // ignore-set covers only values Spark itself injects, so a location
    // differing from the computed warehouse path (or any non-empty
    // comment) refuses loudly — same stance as SQL CREATE's
    // validateCreateSpec
    props.get("location").foreach { loc =>
      require(loc == path || loc == s"file:$path" || loc.stripSuffix("/") ==
        path.stripSuffix("/"),
        s"LOCATION is not supported on manifest catalog tables — the " +
          s"catalog owns the layout (table resolves to $path, got $loc)")
    }
    props.get("comment").foreach(c =>
      require(!c.exists(ch => ch == '\t' || ch == '\n' || ch == '\r'),
        "a table COMMENT must not contain tabs or newlines"))
    val unknownGraft = props.keys.filter { k =>
      val lk = k.toLowerCase(java.util.Locale.ROOT)
      lk.startsWith("graft.") &&
        !Set("graft.statscols", "graft.bloomcols", "graft.clustercols").contains(lk)
    }
    require(unknownGraft.isEmpty,
      s"table properties ${unknownGraft.mkString(", ")} are not supported " +
        "on manifest tables (recognized engine facts: graft.statsCols, " +
        "graft.bloomCols, graft.clusterCols; non-graft keys store as " +
        "user properties)")
    val userProps = props.toSeq.filter { case (k, _) =>
      val lk = k.toLowerCase(java.util.Locale.ROOT)
      !lk.startsWith("graft.") && !lk.startsWith("option.") &&
        !sparkManaged.contains(lk)
    }
    require(props.get("provider").forall(p =>
      p.equalsIgnoreCase("graft-manifest") || p.equalsIgnoreCase("graft_manifest")),
      s"the graft catalog only creates graft-manifest tables " +
        s"(got USING ${props.getOrElse("provider", "")})")
    def propCols(key: String): Seq[String] = props.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) =>
        v.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    }.getOrElse(Seq.empty)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ManifestLake.write(spark, empty, path, partCols,
      statsCols = propCols("graft.statsCols"),
      bloomCols = propCols("graft.bloomCols"))
    if (propCols("graft.clusterCols").nonEmpty)
      ManifestLake.setTableProperties(spark, path, set =
        Map("graft.clusterCols" -> propCols("graft.clusterCols").mkString(","))): Unit
    if (userProps.nonEmpty)
      ManifestLake.setTableProperties(spark, path, set = userProps.toMap): Unit
    props.get("comment").filter(_.nonEmpty).foreach(c =>
      ManifestLake.setComments(spark, path, table = Some(Some(c))): Unit)
    GraftNamedTable(spark, s"$catalogName.${ident.toString}",
      catalogName +: ident.namespace.toSeq :+ ident.name, path, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER on a graft catalog table dispatches through the injected SQL " +
        "parser (spark.sql.extensions=graft.functions.GraftExtensions) — " +
        "run the ALTER TABLE statement with the extension registered")

  /** DROP of a NAMED table deletes its directory — managed-warehouse
    * semantics (the catalog owns the layout). Contrast the path
    * spelling, where DROP is deliberately refused because the
    * directory belongs to the storage layer, not the query engine.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (ManifestLake.currentVersion(spark, path).isEmpty) false
    else {
      val (fs, root) = ManifestLake.fsFor(spark, path)
      fs.delete(root, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val (fs, oldRoot) = ManifestLake.fsFor(spark, pathOf(oldIdent))
    val newRoot = new Path(pathOf(newIdent))
    fs.mkdirs(newRoot.getParent)
    require(fs.rename(oldRoot, newRoot),
      s"rename of ${oldIdent} to ${newIdent} failed at the filesystem")
    // manifest entries are cached under (path, mtime, length) — the new
    // path gets fresh keys, but a later re-CREATE at the old path within
    // mtime granularity is the documented blind spot; clear defensively
    ManifestLake.clearManifestCache()
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  // ---- namespaces (a namespace IS a warehouse subdirectory) ----

  override def listNamespaces(): Array[Array[String]] = {
    val (fs, root) = ManifestLake.fsFor(spark, warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && {
      val (fs, p) = ManifestLake.fsFor(spark, nsPath(namespace.toSeq))
      fs.exists(p)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace.toSeq)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"graft namespaces are single-level (warehouse subdirectories), " +
        s"got ${namespace.mkString(".")}")
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    val (fs, p) = ManifestLake.fsFor(spark, nsPath(namespace.toSeq))
    fs.mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata (they are directories)")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val (fs, p) = ManifestLake.fsFor(spark, nsPath(namespace.toSeq))
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
    fs.delete(p, true)
  }
}

object GraftCatalog {

  private val ClassName = classOf[GraftCatalog].getName

  /** A path segment a catalog identifier part may become — refuses
    * anything that could escape the warehouse ('..', '/') or corrupt
    * the manifest text format.
    */
  private[etl] def validSegment(s: String): Unit =
    require(s.nonEmpty && s != "." && s != ".." &&
      !s.exists(c => c == '/' || c == '\\' || c == '\u0000' ||
        c == '\t' || c == '\n' || c == '\r'),
      s"illegal catalog identifier segment '$s' — must be non-empty and " +
        "contain no path separators or control characters")

  private[etl] def tablePath(warehouse: String, ns: Seq[String],
                             table: String): String = {
    require(ns.length == 1,
      s"graft catalog tables live at <warehouse>/<namespace>/<table> — " +
        s"got a ${ns.length}-level namespace ${ns.mkString(".")}")
    (ns :+ table).foreach(validSegment)
    (warehouse +: ns :+ table).mkString("/")
  }

  /** The warehouse root of a CONFIGURED graft catalog named `cat`
    * (None when `cat` is not a graft catalog — the caller's reference
    * then belongs to someone else and must pass through untouched).
    */
  def warehouseOf(spark: SparkSession, cat: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$cat") match {
      case Some(cls) if cls == ClassName =>
        Some(spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
          .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
            s"graft catalog $cat has no warehouse root — set " +
              s"spark.sql.catalog.$cat.warehouse")))
      case _ => None
    }

  /** `cat.ns.t` (or `cat.t` through the default namespace) → the
    * manifest root it names, when `cat` is a configured graft catalog.
    * This is how the injected parser resolves NAMED tables for every
    * verb it claims — the named and path spellings collapse to the
    * same engine path before any command is built.
    */
  def identPath(spark: SparkSession, parts: Seq[String]): Option[String] =
    parts match {
      case Seq(cat, ns, t) =>
        warehouseOf(spark, cat).map(w => tablePath(w, Seq(ns), t))
      case Seq(cat, t) =>
        warehouseOf(spark, cat).map(w => tablePath(w, Seq("default"), t))
      case _ => None
    }

  /** A SINGLE-part name under the session's CURRENT catalog/namespace
    * (`USE graft.ns` then `MERGE INTO t …`) — resolved only when the
    * current catalog IS a graft catalog, so vanilla sessions never see
    * a behavior change. Temp views take precedence at every call site
    * (checked before this), mirroring Spark's own resolution order.
    */
  def currentIdentPath(spark: SparkSession, name: String): Option[String] =
    try {
      val cm = spark.sessionState.catalogManager
      cm.currentCatalog match {
        case g: GraftCatalog =>
          val ns = cm.currentNamespace.toSeq match {
            case Nil => Seq("default")
            case s => s
          }
          warehouseOf(spark, g.name).map(w => tablePath(w, ns, name))
        case _ => None
      }
    } catch { case _: Exception => None }
}

/** The [[Table]] handle [[GraftCatalog.loadTable]] returns. It never
  * executes a scan or a write itself: the injected [[GraftCatalogRule]]
  * swaps it for the engine's v1 plan (reads) or a manifest-commit
  * command (writeTo verbs) during analysis. The Supports* capabilities
  * exist so analysis ACCEPTS the plan shapes before the rule fires;
  * the builders below are unreachable with the extension registered
  * and refuse loudly without it — a write that silently bypassed the
  * manifest commit would corrupt the table.
  *
  * STREAMING by name rides the same split. `MICRO_BATCH_READ` is
  * declared so `spark.readStream.table("graft.ns.t")` passes the
  * analyzer's capability check; the injected rule then swaps the
  * [[org.apache.spark.sql.catalyst.streaming.StreamingRelationV2]]
  * for the V1 [[graft.streaming.ManifestStreamSource]] relation —
  * the SAME source (and checkpoint offsets) the path spelling
  * `.format("graft-manifest").load(path)` uses, options (incl.
  * `readChangeFeed`) passed through. Without the extension, micro-
  * batch planning reaches `newScanBuilder` and refuses loudly.
  * `STREAMING_WRITE` is deliberately NOT declared:
  * `DataStreamWriter.toTable` checks it BEFORE the
  * [[V2TableWithV1Fallback]] case, and declaring it would route the
  * stream onto a DSv2 row-level `StreamingWrite` — bypassing the
  * ledgered [[graft.streaming.ManifestStreamSink]]. Instead the
  * fallback's `v1Table` (provider + location) sends
  * `writeStream.format("graft-manifest").toTable("graft.ns.t")`
  * through the exactly-once v1 sink, exactly as Delta's
  * `DeltaTableV2` does.
  */
final case class GraftNamedTable(spark: SparkSession, fullName: String,
                                 nameParts: Seq[String],
                                 path: String, pinnedVersion: Option[Long])
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.graftshim.V1FallbackTableShim {

  private lazy val manifest: ManifestLake.Manifest = {
    val (fs, root) = ManifestLake.fsFor(spark, path)
    val v = pinnedVersion.orElse(ManifestLake.currentVersion(spark, path))
      .getOrElse(throw new NoSuchTableException(Seq(fullName)))
    ManifestLake.readManifest(fs, root, v)
  }

  override def name(): String = fullName

  override def schema(): StructType = ManifestLake.logicalSchemaOf(manifest)

  override def partitioning(): Array[Transform] =
    manifest.partCols.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] = {
    val m = manifest
    (Map("provider" -> "graft-manifest", "location" -> path) ++
      (if (m.statsColsDefault.nonEmpty)
        Map("graft.statsCols" -> m.statsColsDefault.mkString(",")) else Map.empty) ++
      (if (m.bloomCols.nonEmpty)
        Map("graft.bloomCols" -> m.bloomCols.mkString(",")) else Map.empty)).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.MICRO_BATCH_READ)

  /** The V1 identity `writeStream.toTable` (and the analyzer's
    * streaming-read fallback) dispatches on: provider + location are
    * the whole story — the filesystem IS the catalog, so the
    * `CatalogTable` is a rendering of the same two facts the named
    * spelling resolves to, never a second source of truth.
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    // the identifier is FUNCTIONAL, not cosmetic: the analyzer's
    // streaming fallback asserts a database part exists, and the V1
    // streaming write resolves these exact parts back through this
    // catalog — they must round-trip (catalog, namespace, table)
    CatalogTable(
      identifier = TableIdentifier(nameParts.last,
        Some(nameParts(nameParts.length - 2)), Some(nameParts.head)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new Path(path).toUri)),
      schema = schema(),
      provider = Some("graft-manifest"))
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      s"graft catalog table $fullName cannot be scanned without the graft " +
        "extension — set spark.sql.extensions=graft.functions.GraftExtensions " +
        "(the extension swaps in the manifest-aware plan with file skipping)")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    throw new IllegalStateException(
      s"graft catalog table $fullName cannot be written without the graft " +
        "extension — set spark.sql.extensions=graft.functions.GraftExtensions " +
        "(a vanilla write would land files with no manifest commit)")
}

/** Injected resolution rule completing the catalog story for the plan
  * shapes the PARSER never sees (they are built programmatically, not
  * from SQL text): `spark.table("graft.ns.t")` reads resolve through
  * the catalog into a [[org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation]]
  * over [[GraftNamedTable]], which this rule swaps for the engine's
  * manifest-aware v1 plan — aliased back to the relation's OWN exprIds
  * so references already resolved against it stay valid (the standard
  * v2→engine bridge move). `df.writeTo("graft.ns.t")` verbs —
  * append / overwritePartitions / overwrite(truncate) — rewrite to
  * engine-commit commands; any shape the engine cannot honor exactly
  * refuses loudly, never a vanilla fall-through that would write files
  * with no manifest commit.
  */
final class GraftCatalogRule(spark: SparkSession)
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  private def graftTable(rel: Any): Option[GraftNamedTable] = rel match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftNamedTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  /** The manifest path a CREATE-family identifier names under a graft
    * catalog — resolved (the analyzer got there first) or unresolved.
    */
  private def createIdentPath(name: LogicalPlan): Option[String] = name match {
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
      r.catalog match {
        case g: GraftCatalog =>
          Some(GraftCatalog.tablePath(g.warehousePath,
            r.identifier.namespace.toSeq match {
              case Nil => Seq("default"); case s => s
            }, r.identifier.name))
        case _ => None
      }
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
      GraftCatalog.identPath(spark, u.nameParts).orElse(u.nameParts match {
        case Seq(single) => GraftCatalog.currentIdentPath(spark, single)
        case _ => None
      })
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // df.writeTo(...).create() / .replace() / .createOrReplace() —
      // the programmatic CREATE-family shapes the parser never sees;
      // rewritten to the SAME engine command SQL CTAS uses. Only the
      // unresolved-spec form is claimed (the first resolution pass);
      // anything else falls to the catalog's loud WriteBuilder refusal
      // rather than a silent vanilla write.
      case c: CreateTableAsSelect
          if createIdentPath(c.name).isDefined && c.query.resolved &&
            c.tableSpec.isInstanceOf[UnresolvedTableSpec] =>
        val (cons, partCols, st, bl, cl, up, tc) = GraftSqlDml.validateCreateSpec(
          c.tableSpec.asInstanceOf[UnresolvedTableSpec], c.partitioning)
        GraftCreateTableCommand(createIdentPath(c.name).get,
          CreateAsSelect(c.query, c.ignoreIfExists),
          Seq.empty, partCols, cons, st, bl, clusterCols = cl,
          tableComment = tc, userProps = up)
      case r: ReplaceTableAsSelect
          if createIdentPath(r.name).isDefined && r.query.resolved &&
            r.tableSpec.isInstanceOf[UnresolvedTableSpec] =>
        val (cons, partCols, st, bl, cl, up, tc) = GraftSqlDml.validateCreateSpec(
          r.tableSpec.asInstanceOf[UnresolvedTableSpec], r.partitioning)
        GraftCreateTableCommand(createIdentPath(r.name).get,
          ReplaceAsSelect(r.query, r.orCreate),
          Seq.empty, partCols, cons, st, bl, clusterCols = cl,
          tableComment = tc, userProps = up)
      // writeTo verbs FIRST — top-down, so the relation under them is
      // consumed here and never separately rewritten as a read
      case a: AppendData if graftTable(a.table).isDefined && a.query.resolved =>
        GraftWriteToCommand(graftTable(a.table).get.path, a.query,
          WriteToAppend, a.isByName)
      case o: OverwritePartitionsDynamic
          if graftTable(o.table).isDefined && o.query.resolved =>
        GraftWriteToCommand(graftTable(o.table).get.path, o.query,
          WriteToDynamicOverwrite, o.isByName)
      case o: OverwriteByExpression
          if graftTable(o.table).isDefined && o.query.resolved =>
        o.deleteExpr match {
          case Literal(true, _) =>
            GraftWriteToCommand(graftTable(o.table).get.path, o.query,
              WriteToTruncate, o.isByName)
          case other => throw new IllegalArgumentException(
            s"writeTo(...).overwrite(condition) beyond a truncate " +
              s"(lit(true)) is not supported on manifest tables, got " +
              s"${other.sql} — use SQL INSERT OVERWRITE ... PARTITION " +
              "(one-commit partition replace) or MERGE")
        }
      // readStream.table("graft.ns.t") — the analyzer resolved the name
      // through the catalog into a StreamingRelationV2 over the named
      // table; swap it for the V1 relation over the SAME
      // graft-manifest source the path spelling plans (same offsets,
      // so checkpoints are interchangeable between the two spellings).
      // Options pass through: startingVersion, rate limits,
      // readChangeFeed (whose _change_type/_commit_version columns the
      // source's schema adds — they ride as extra output columns).
      case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if s.table.isInstanceOf[GraftNamedTable] =>
        val t = s.table.asInstanceOf[GraftNamedTable]
        require(t.pinnedVersion.isEmpty,
          s"cannot stream from a time-travel pinned table ${t.fullName} — " +
            "use startingVersion to begin a stream at a version")
        val opts = s.extraOptions.asScala.toMap
        opts.get("path").foreach(p => require(
          p.stripSuffix("/") == t.path.stripSuffix("/"),
          s"a 'path' option ($p) conflicts with the table's resolved " +
            s"location (${t.path}) — drop the option; the name IS the path"))
        val rel = org.apache.spark.sql.execution.streaming.runtime
          .StreamingRelation(
            org.apache.spark.sql.execution.datasources.DataSource(spark,
              className = "graft-manifest",
              options = opts + ("path" -> t.path)))
        // exprId continuity for the columns parents may have resolved
        // against; source-added metadata columns (change feed) ride
        // behind them with their own fresh ids
        val byName = rel.output.map(a => a.name.toLowerCase -> a).toMap
        val kept = s.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase,
            throw new IllegalStateException(
              s"catalog table ${t.fullName} lost column ${o.name} between " +
                "load and stream planning — concurrent schema change; " +
                "re-run the query"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        val extras = rel.output.filterNot(a =>
          s.output.exists(_.name.equalsIgnoreCase(a.name)))
        Project(kept ++ extras, rel)
      case r: DataSourceV2Relation if graftTable(r).isDefined =>
        val t = graftTable(r).get
        val df = t.pinnedVersion
          .map(v => ManifestLake.readVersion(spark, t.path, v))
          .getOrElse(ManifestLake.read(spark, t.path))
        // stamp the table identity onto the engine's file relation:
        // catalog machinery that walks a resolved plan back to its
        // table (spark.catalog.refreshTable — which the streaming
        // sink's post-commit refresh calls — and plan rendering)
        // expects a LogicalRelation under a name to carry it
        val v1 = df.queryExecution.analyzed.transform {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
              if lr.catalogTable.isEmpty =>
            lr.copy(catalogTable = Some(t.v1Table))
        }
        val byName = v1.output.map(a => a.name.toLowerCase -> a).toMap
        // alias the engine plan's output back to the v2 relation's
        // exprIds: parents that already resolved against the relation
        // keep resolving, and the swap is invisible above this node
        Project(r.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase,
            throw new IllegalStateException(
              s"catalog table ${t.fullName} lost column ${o.name} between " +
                "load and planning — concurrent schema change; re-run the query"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }, v1)
    }
}

/** How a `df.writeTo` verb lands on the manifest table. */
sealed trait GraftWriteToMode
case object WriteToAppend extends GraftWriteToMode
case object WriteToTruncate extends GraftWriteToMode
case object WriteToDynamicOverwrite extends GraftWriteToMode

/** The engine-commit command a rewritten `df.writeTo(...)` verb runs:
  * append / wholesale replace / dynamic partition overwrite, all
  * through the same ManifestLake paths as the Scala API and SQL.
  * writeTo is BY-NAME (DataFrameWriterV2 semantics): the batch aligns
  * to the table's logical columns case-insensitively; GENERATED
  * columns may be omitted (the engine computes them); anything extra
  * or missing refuses loudly.
  */
final case class GraftWriteToCommand(
    path: String,
    queryPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    mode: GraftWriteToMode,
    byName: Boolean)
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.LongType

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    Seq(queryPlan)
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  /** Store-assignment cast honoring `spark.sql.storeAssignmentPolicy`
    * (DSv2 writeTo semantics — the default ANSI policy fails loudly on
    * overflow/malformed values instead of wrapping/NULLing, and casts
    * the policy forbids are rejected here at analysis time, matching
    * the Spark path this command replaces).
    */
  private def storeAssignCast(spark: SparkSession, srcName: String,
                              from: org.apache.spark.sql.types.DataType,
                              to: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
    import org.apache.spark.sql.graftshim.SparkShims
    import org.apache.spark.sql.internal.SQLConf.StoreAssignmentPolicy
    val ref = UnresolvedAttribute.quoted(srcName)
    if (from == to) SparkShims.column(ref)
    else spark.sessionState.conf.storeAssignmentPolicy match {
      case StoreAssignmentPolicy.STRICT =>
        require(Cast.canUpCast(from, to),
          s"writeTo cannot safely cast $srcName: ${from.sql} to ${to.sql} " +
            "under storeAssignmentPolicy=STRICT")
        SparkShims.column(Cast(ref, to, None, EvalMode.ANSI))
      // LEGACY never reaches here: Spark's analyzer refuses the policy
      // for DSv2 writes before this command substitutes (pinned in
      // NamedCatalogSpec); ANSI is the default and the fallback
      case _ =>
        require(Cast.canANSIStoreAssign(from, to),
          s"writeTo cannot cast $srcName: ${from.sql} to ${to.sql} " +
            "under storeAssignmentPolicy=ANSI")
        SparkShims.column(Cast(ref, to, None, EvalMode.ANSI))
    }
  }

  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val df0 = org.apache.spark.sql.graftshim.SparkShims.ofRows(spark, queryPlan)
    val (fs, root) = ManifestLake.fsFor(spark, path)
    val v = ManifestLake.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no manifested table at $path (writeTo needs an existing table — " +
          "create it first)"))
    val m = ManifestLake.readManifest(fs, root, v)
    val logical = ManifestLake.logicalSchemaOf(m)
    // GENERATED and IDENTITY columns may be omitted — the engine
    // computes/assigns them (and refuses a SUPPLIED identity itself)
    val generated = m.generated.map(_._1.toLowerCase).toSet ++
      m.identity.map(_._1.toLowerCase)
    val aligned =
      if (byName) {
        val byLower = df0.columns.map(c => c.toLowerCase -> c).toMap
        val missing = logical.fieldNames.filterNot(n =>
          byLower.contains(n.toLowerCase) || generated.contains(n.toLowerCase))
        require(missing.isEmpty,
          s"writeTo batch is missing table column(s) ${missing.mkString(", ")} " +
            s"(batch columns: ${df0.columns.mkString(", ")})")
        val extra = df0.columns.filterNot(c =>
          logical.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(extra.isEmpty,
          s"writeTo batch carries column(s) ${extra.mkString(", ")} the table " +
            "does not have — MERGE WITH SCHEMA EVOLUTION or ALTER TABLE ADD " +
            "COLUMNS first")
        // store-assignment casts, DSv2 byName semantics: a LONG batch
        // column lands in a LONG table column even when the query
        // produced INT; the cast honors storeAssignmentPolicy (ANSI by
        // default — out-of-range/malformed values fail loudly)
        val srcType = df0.schema.fields.map(f => f.name -> f.dataType).toMap
        val present = logical.fields.filter(f =>
          byLower.contains(f.name.toLowerCase))
        df0.select(present.map { f =>
          val src = byLower(f.name.toLowerCase)
          storeAssignCast(spark, src, srcType(src), f.dataType).as(f.name)
        }.toSeq: _*)
      } else {
        require(df0.columns.length == logical.fields.length,
          s"writeTo by position needs exactly ${logical.fields.length} " +
            s"columns, got ${df0.columns.length}")
        val renamed = df0.toDF(logical.fieldNames.toSeq: _*)
        renamed.select(logical.fields.zip(renamed.schema.fields).map {
          case (f, src) =>
            storeAssignCast(spark, f.name, src.dataType, f.dataType).as(f.name)
        }.toSeq: _*)
      }
    val newV = mode match {
      case WriteToAppend =>
        ManifestLake.write(spark, aligned, path, m.partCols, replace = false)
      case WriteToTruncate =>
        ManifestLake.write(spark, aligned, path, m.partCols, replace = true)
      case WriteToDynamicOverwrite =>
        ManifestLake.overwritePartitions(spark, path, aligned)
    }
    Seq(org.apache.spark.sql.Row(newV))
  }
}
