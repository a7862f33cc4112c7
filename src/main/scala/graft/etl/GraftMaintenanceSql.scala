package graft.etl

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** The MAINTENANCE statements a lake-format SQL surface needs but
  * Spark's grammar does not carry — the Delta-SQL idioms, parsed by a
  * deliberately tiny recursive-descent parser and dispatched to the
  * SAME [[ManifestLake]] engine the Scala API drives:
  *
  *   - `VACUUM t [RETAIN <n> HOURS | KEEP <n> VERSIONS] [DRY RUN]`
  *     → [[ManifestLake.vacuum]]; returns the removed (or, under DRY
  *     RUN, would-be-removed) paths. `RETAIN <n> HOURS` maps the time
  *     horizon onto version retention: every version published inside
  *     the window is kept, plus the boundary version so a
  *     `TIMESTAMP AS OF` read at the horizon still resolves.
  *   - `OPTIMIZE t [FULL] [WHERE <partition predicate>]
  *     [ZORDER BY (c1, c2, …)]` → [[ManifestLake.compact]]; returns
  *     (partition, files_before, files_after) per rewritten partition.
  *     WHERE scopes the rewrite to the partitions a partition-column
  *     predicate selects — the steady-state cadence on a 100 TB table
  *     (compact the day that just closed, not the table); data-column
  *     predicates refuse. FULL rewrites every selected partition
  *     regardless of fragmentation — the verb for applying a
  *     newly-declared clustering (`CLUSTER BY`) to already-compacted
  *     data (Delta's liquid re-cluster idiom).
  *   - `REORG TABLE t [WHERE <partition predicate>] APPLY (PURGE)` →
  *     [[ManifestLake.compact]] in purge-only mode: rewrite exactly
  *     the deletion-vector-masked files (materializing their masks),
  *     never clean files — Delta's DV-purge verb.
  *   - `RESTORE [TABLE] t [TO] VERSION AS OF n | TIMESTAMP AS OF 'ts'`
  *     → [[ManifestLake.restore]]; returns the new head version.
  *   - `FSCK REPAIR TABLE t [DRY RUN]` → [[ManifestLake.fsck]]; drops
  *     references to data files deleted out-of-band (DRY RUN lists).
  *   - `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
  *     [PATTERN = '<glob>'] [FORMAT_OPTIONS (…)] [COPY_OPTIONS
  *     ('force' = 'true')] [VALIDATE]` → [[ManifestLake.copyInto]] —
  *     idempotent batch file ingestion, exactly-once by source-file
  *     identity; FORMAT_OPTIONS ('schema'='<DDL>') pins the CSV/JSON
  *     read schema (one pass, no inference); VALIDATE dry-runs the
  *     metadata checks without reading rows or committing.
  *   - `DESCRIBE HISTORY t [LIMIT n]` → [[ManifestLake.history]],
  *     newest first.
  *   - `DESCRIBE DETAIL t` → [[ManifestLake.detail]] — the one-row
  *     operational summary.
  *
  * Interception stance (mirrors [[GraftSqlDml]]'s): `VACUUM` /
  * `OPTIMIZE` / `RESTORE` do not exist in Spark's grammar at all — a
  * statement opening with one of those keywords can only be ours, so
  * malformed options and non-manifest targets refuse LOUDLY with the
  * real reason instead of Spark's opaque syntax error. `DESCRIBE
  * HISTORY` DOES collide with vanilla shapes (`DESCRIBE history` is a
  * legal describe of a table named history; `DESCRIBE HISTORY t` parses
  * as describe-column), so it is claimed ONLY when the full statement
  * parses in our grammar AND the target resolves to a manifest table —
  * every other spelling passes through byte-identical.
  */
object GraftMaintenanceSql {

  /** Claim `sqlText` if it is a manifest maintenance statement; None
    * lets the session parser serve it untouched. Called BEFORE the
    * delegate parse (two of the shapes would mis-parse rather than
    * fail there).
    */
  def parse(spark: SparkSession, sqlText: String): Option[LogicalPlan] = {
    // SHALLOW/DEEP CLONE leads with CREATE TABLE, which vanilla SQL
    // also does — claimed only when an identifier run (no '(' — that
    // would be a column list) sits between TABLE and the CLONE keyword,
    // a shape Spark's grammar cannot parse at all, so failures are loud
    val cloneLead = ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" +
      "(IF\\s+NOT\\s+EXISTS\\s+)?[^(]*?\\b(SHALLOW|DEEP)\\s+CLONE\\b").r
    if (cloneLead.findFirstIn(sqlText).isDefined)
      return Some(parseClone(spark, lex(sqlText)))
    // ALTER TABLE t MATERIALIZE is not in Spark's grammar (it would
    // refuse with an opaque syntax error) — claimed only on the exact
    // shape, so vanilla ALTER statements never reach this path
    val matLead = "(?is)^\\s*ALTER\\s+TABLE\\s+.+\\bMATERIALIZE\\s*;?\\s*$".r
    if (matLead.findFirstIn(sqlText).isDefined)
      return Some(parseMaterialize(spark, lex(sqlText)))
    // ALTER TABLE t DROP FEATURE '<name>' — not in Spark's grammar
    // (DROP there takes COLUMN/PARTITION/CONSTRAINT); claimed only on
    // the exact shape
    val dropFeatLead =
      ("(?is)^\\s*ALTER\\s+TABLE\\s+[^(]+\\bDROP\\s+FEATURE\\s+" +
        "('[^']*'|`[^`]*`|\\w+)\\s*;?\\s*$").r
    if (dropFeatLead.findFirstIn(sqlText).isDefined)
      return Some(parseDropFeature(spark, lex(sqlText)))
    // cheap keyword gate BEFORE lexing: the lexer is deliberately tiny
    // and refuses characters these four statements never carry — it
    // must never see (let alone fail on) general SQL
    val lead = "(?is)^\\s*(VACUUM|OPTIMIZE|REORG|RESTORE|CONVERT|FSCK|COPY|DESC(RIBE)?\\s+(HISTORY|DETAIL))\\b".r
    if (lead.findFirstIn(sqlText).isEmpty) return None
    val isDescribe = "(?is)^\\s*DESC".r.findFirstIn(sqlText).isDefined
    // DESCRIBE collides with vanilla shapes (`DESCRIBE history
    // PARTITION (a=1)` is a legal describe of a table named history,
    // and would not even lex here) — for that lead, ANY failure means
    // "not ours", never an error; the other three keywords cannot open
    // a vanilla statement, so their failures surface loudly.
    try {
      // OPTIMIZE may carry a WHERE predicate in FULL SQL (operators the
      // tiny lexer deliberately refuses) — split it out on raw text,
      // quote-aware, before lexing; Spark's expression parser serves it
      val (lexText, whereSql) =
        if ("(?is)^\\s*OPTIMIZE\\b".r.findFirstIn(sqlText).isDefined)
          splitOptimizeWhere(sqlText)
        else if ("(?is)^\\s*REORG\\b".r.findFirstIn(sqlText).isDefined)
          splitOptimizeWhere(sqlText, stopKw = "APPLY")
        else (sqlText, None)
      val toks = lex(lexText)
      toks.headOption.flatMap {
        case Word(w) if w.equalsIgnoreCase("VACUUM") =>
          Some(parseVacuum(spark, toks.tail))
        case Word(w) if w.equalsIgnoreCase("OPTIMIZE") =>
          Some(parseOptimize(spark, toks.tail, whereSql))
        case Word(w) if w.equalsIgnoreCase("REORG") =>
          Some(parseReorg(spark, toks.tail, whereSql))
        case Word(w) if w.equalsIgnoreCase("RESTORE") =>
          Some(parseRestore(spark, toks.tail))
        case Word(w) if w.equalsIgnoreCase("CONVERT") =>
          Some(parseConvert(spark, toks.tail))
        case Word(w) if w.equalsIgnoreCase("FSCK") =>
          Some(parseFsck(spark, toks.tail))
        case Word(w) if w.equalsIgnoreCase("COPY") =>
          Some(parseCopy(spark, toks.tail))
        case Word(w) if w.equalsIgnoreCase("DESCRIBE") || w.equalsIgnoreCase("DESC") =>
          toks.tail.head match {
            case Word(h) if h.equalsIgnoreCase("DETAIL") =>
              parseDetail(spark, toks.drop(2))
            case _ => parseHistory(spark, toks.drop(2))
          }
        case _ => None
      }
    } catch {
      case _: IllegalArgumentException if isDescribe => None
    }
  }

  // ---- lexer ---------------------------------------------------------

  private sealed trait Tok
  private final case class Word(s: String) extends Tok
  private final case class Quoted(s: String) extends Tok    // `ident`
  private final case class Str(s: String) extends Tok       // 'literal'
  private final case class Num(s: String) extends Tok
  private final case class Punct(c: Char) extends Tok

  private def lex(sql: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg in: $sql")
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql(i) == '`') {
            if (i + 1 < n && sql(i + 1) == '`') { sb += '`'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += sql(i); i += 1 }
        }
        if (!closed) fail("unterminated backquoted identifier")
        out += Quoted(sb.toString)
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql(i) == '\'') {
            if (i + 1 < n && sql(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += sql(i); i += 1 }
        }
        if (!closed) fail("unterminated string literal")
        out += Str(sb.toString)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql(i).isDigit || sql(i) == '.')) i += 1
        out += Num(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Word(sql.substring(start, i))
      } else if ("().,;=".contains(c)) {
        if (c != ';') out += Punct(c)
        i += 1
      } else fail(s"unexpected character '$c'")
    }
    out.toList
  }

  // ---- shared pieces --------------------------------------------------

  /** Consume a table reference — `` `graft-manifest`.`/path` `` (or the
    * graft_manifest spelling) or a temp-view name over the source —
    * returning (manifest path, remaining tokens). Loud when it is not
    * a manifest reference: these statements have no vanilla fallback.
    */
  private def target(spark: SparkSession, toks: List[Tok],
                     stmt: String): (String, List[Tok]) = {
    def ident(t: Tok): Option[String] = t match {
      case Word(w) => Some(w)
      case Quoted(q) => Some(q)
      case _ => None
    }
    toks match {
      case a :: Punct('.') :: b :: rest
        if ident(a).exists(f => f.equalsIgnoreCase("graft-manifest") ||
          f.equalsIgnoreCase("graft_manifest")) && ident(b).isDefined =>
        (ident(b).get, rest)
      // NAMED tables: cat.ns.t / cat.t where cat is a configured graft
      // catalog ([[GraftCatalog.identPath]]) — same engine path as the
      // explicit spelling
      case a :: Punct('.') :: b :: Punct('.') :: c :: rest
        if ident(a).isDefined && ident(b).isDefined && ident(c).isDefined &&
          GraftCatalog.identPath(spark,
            Seq(ident(a).get, ident(b).get, ident(c).get)).isDefined =>
        (GraftCatalog.identPath(spark,
          Seq(ident(a).get, ident(b).get, ident(c).get)).get, rest)
      case a :: Punct('.') :: b :: rest
        if ident(a).isDefined && ident(b).isDefined &&
          GraftCatalog.identPath(spark,
            Seq(ident(a).get, ident(b).get)).isDefined =>
        (GraftCatalog.identPath(spark,
          Seq(ident(a).get, ident(b).get)).get, rest)
      case a :: rest if ident(a).isDefined =>
        val name = ident(a).get
        if (GraftSqlDml.shadowedByTempView(spark, name))
          throw new IllegalArgumentException(
            s"$stmt: '$name' is a temp view that is not manifest-backed — " +
              "temp views take precedence over catalog tables; drop the " +
              "view or use the qualified table name")
        GraftSqlDml.tempViewManifestPath(spark, name)
          .orElse(GraftCatalog.currentIdentPath(spark, name)
            .filter(p => ManifestLake.currentVersion(spark, p).isDefined)) match {
          case Some(p) => (p, rest)
          case None => throw new IllegalArgumentException(
            s"$stmt targets manifest tables — $name is not a " +
              "`graft-manifest`.`/path` reference, a graft catalog name, " +
              "or a temp view over the graft-manifest source")
        }
      case _ => throw new IllegalArgumentException(
        s"$stmt needs a table reference")
    }
  }

  private def kw(t: Tok, w: String): Boolean = t match {
    case Word(x) => x.equalsIgnoreCase(w)
    case _ => false
  }

  private def num(t: Tok, what: String): Long = t match {
    case Num(s) => s.toLongOption.getOrElse(
      throw new IllegalArgumentException(s"$what must be an integer, got $s"))
    case other => throw new IllegalArgumentException(
      s"$what must be an integer, got $other")
  }

  private def end(rest: List[Tok], stmt: String): Unit =
    require(rest.isEmpty,
      s"unexpected trailing tokens in $stmt: ${rest.mkString(" ")}")

  // ---- statement parsers ----------------------------------------------

  private def parseVacuum(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    val (path, rest0) = target(spark, toks, "VACUUM")
    var rest = rest0
    var retainHours: Option[Long] = None
    var keepVersions: Option[Int] = None
    var dryRun = false
    while (rest.nonEmpty) rest match {
      case r :: nTok :: h :: tl if kw(r, "RETAIN") && kw(h, "HOURS") =>
        retainHours = Some(num(nTok, "RETAIN ... HOURS")); rest = tl
      case k :: nTok :: v :: tl if kw(k, "KEEP") && kw(v, "VERSIONS") =>
        val kv = num(nTok, "KEEP ... VERSIONS")
        require(kv >= 1, "KEEP ... VERSIONS must keep at least 1")
        keepVersions = Some(kv.toInt); rest = tl
      case d :: r :: tl if kw(d, "DRY") && kw(r, "RUN") =>
        dryRun = true; rest = tl
      case other => throw new IllegalArgumentException(
        "VACUUM options are [RETAIN <n> HOURS | KEEP <n> VERSIONS] " +
          s"[DRY RUN]; got: ${other.mkString(" ")}")
    }
    require(retainHours.isEmpty || keepVersions.isEmpty,
      "RETAIN ... HOURS and KEEP ... VERSIONS are mutually exclusive")
    GraftVacuumCommand(path, keepVersions, retainHours, dryRun)
  }

  /** Locate the first WHERE keyword OUTSIDE backquoted identifiers and
    * string literals (a path like `` `/lake/where/t` `` must not trip
    * it), and return (the statement with the predicate excised, the
    * predicate's raw SQL up to a quote-aware ZORDER or end-of-text).
    */
  private def splitOptimizeWhere(sql: String,
                                 stopKw: String = "ZORDER"): (String, Option[String]) = {
    def keywordAt(i: Int, kw: String): Boolean =
      sql.regionMatches(true, i, kw, 0, kw.length) &&
        (i == 0 || { val c = sql(i - 1); !c.isLetterOrDigit && c != '_' }) &&
        (i + kw.length >= sql.length || {
          val c = sql(i + kw.length); !c.isLetterOrDigit && c != '_' })
    def scan(from: Int, kw: String): Int = {
      var i = from; var bq = false; var sq = false
      while (i < sql.length) {
        val c = sql(i)
        if (bq) { if (c == '`') bq = false }
        else if (sq) { if (c == '\'') sq = false }
        else if (c == '`') bq = true
        else if (c == '\'') sq = true
        else if (keywordAt(i, kw)) return i
        i += 1
      }
      -1
    }
    val w = scan(0, "WHERE")
    if (w < 0) (sql, None)
    else {
      val z = scan(w + 5, stopKw)
      val end = if (z < 0) sql.length else z
      val pred = sql.substring(w + 5, end).trim
      require(pred.nonEmpty, "WHERE needs a predicate")
      (sql.substring(0, w) + " " + sql.substring(end), Some(pred))
    }
  }

  private def parseOptimize(spark: SparkSession, toks: List[Tok],
                            whereSql: Option[String]): LogicalPlan = {
    val (path, restF) = target(spark, toks, "OPTIMIZE")
    // `OPTIMIZE t FULL` — rewrite every selected partition regardless
    // of fragmentation (apply a newly-declared clustering)
    val (full, rest0) = restF match {
      case f :: tl if kw(f, "FULL") => (true, tl)
      case tl => (false, tl)
    }
    // the predicate must PARSE now (statement-time error, not run-time)
    whereSql.foreach { w =>
      try { spark.sessionState.sqlParser.parseExpression(w); () }
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"OPTIMIZE ... WHERE predicate does not parse: $w (${e.getMessage})")
      }
    }
    val zorder: Seq[String] = rest0 match {
      case Nil => Seq.empty
      case z :: b :: tl if kw(z, "ZORDER") && kw(b, "BY") =>
        val (inner, after) = tl match {
          case Punct('(') :: more =>
            val close = more.indexWhere { case Punct(')') => true; case _ => false }
            require(close >= 0, "unbalanced parentheses in ZORDER BY")
            (more.take(close), more.drop(close + 1))
          case more => (more, Nil)
        }
        end(after, "OPTIMIZE")
        val cols = inner.filterNot { case Punct(',') => true; case _ => false }
          .map {
            case Word(w) => w
            case Quoted(q) => q
            case other => throw new IllegalArgumentException(
              s"ZORDER BY expects column names, got $other")
          }
        require(cols.nonEmpty, "ZORDER BY needs at least one column")
        cols
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE options are [FULL] [WHERE <partition predicate>] " +
          s"[ZORDER BY (c1, …)]; got: ${other.mkString(" ")}")
    }
    GraftOptimizeCommand(path, zorder, whereSql, full)
  }

  /** `REORG TABLE t [WHERE <partition predicate>] APPLY (PURGE)` —
    * Delta's deletion-vector purge verb: rewrite exactly the DV-masked
    * files (materializing their masks), never clean files.
    */
  private def parseReorg(spark: SparkSession, toks: List[Tok],
                         whereSql: Option[String]): LogicalPlan = {
    val afterTable = toks match {
      case t :: tl if kw(t, "TABLE") => tl
      case other => throw new IllegalArgumentException(
        s"REORG spells REORG TABLE t [WHERE …] APPLY (PURGE); got: " +
          other.mkString(" "))
    }
    val (path, rest) = target(spark, afterTable, "REORG")
    whereSql.foreach { w =>
      try { spark.sessionState.sqlParser.parseExpression(w); () }
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"REORG ... WHERE predicate does not parse: $w (${e.getMessage})")
      }
    }
    rest match {
      case a :: Punct('(') :: p :: Punct(')') :: tl
        if kw(a, "APPLY") && kw(p, "PURGE") => end(tl, "REORG")
      case other => throw new IllegalArgumentException(
        s"REORG TABLE supports APPLY (PURGE) only; got: ${other.mkString(" ")}")
    }
    GraftReorgCommand(path, whereSql)
  }

  private def parseRestore(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    val afterTable = toks match {
      case t :: tl if kw(t, "TABLE") => tl
      case tl => tl
    }
    val (path, rest0) = target(spark, afterTable, "RESTORE")
    val rest = rest0 match {
      case t :: tl if kw(t, "TO") => tl
      case tl => tl
    }
    rest match {
      case v :: a :: o :: nTok :: tl
        if kw(v, "VERSION") && kw(a, "AS") && kw(o, "OF") =>
        end(tl, "RESTORE")
        GraftRestoreCommand(path, Left(num(nTok, "VERSION AS OF")))
      case t :: a :: o :: Str(s) :: tl
        if kw(t, "TIMESTAMP") && kw(a, "AS") && kw(o, "OF") =>
        end(tl, "RESTORE")
        GraftRestoreCommand(path, Right(s))
      case other => throw new IllegalArgumentException(
        "RESTORE needs TO VERSION AS OF <n> or TO TIMESTAMP AS OF " +
          s"'<instant>'; got: ${other.mkString(" ")}")
    }
  }

  /** `CONVERT TO GRAFT parquet.`<path>` [PARTITIONED BY (c TYPE, …)]`
    * — in-place adoption of an existing parquet directory (Delta's
    * CONVERT TO DELTA idiom): [[ManifestLake.adopt]] builds the v1
    * manifest over the files already there, zero data movement. The
    * directory spells as `` parquet.`/path` ``, a bare quoted path, or
    * a graft catalog name (`cat.ns.t` → the warehouse directory).
    * PARTITIONED BY declares partition VALUE types (single-word types
    * only — STRING is the default and always round-trips); the column
    * LIST itself is discovered from the hive layout and cross-checked.
    */
  private def parseConvert(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    def ident(t: Tok): Option[String] = t match {
      case Word(w) => Some(w)
      case Quoted(q) => Some(q)
      case _ => None
    }
    val afterTo = toks match {
      case t :: g :: tl if kw(t, "TO") && kw(g, "GRAFT") => tl
      case other => throw new IllegalArgumentException(
        s"CONVERT spells CONVERT TO GRAFT <directory>; got: ${other.mkString(" ")}")
    }
    val (path, rest0) = afterTo match {
      case p :: Punct('.') :: Quoted(dir) :: tl
        if kw(p, "parquet") => (dir, tl)
      case Quoted(dir) :: tl => (dir, tl)
      case a :: Punct('.') :: b :: Punct('.') :: c :: tl
        if ident(a).isDefined && ident(b).isDefined && ident(c).isDefined &&
          GraftCatalog.identPath(spark,
            Seq(ident(a).get, ident(b).get, ident(c).get)).isDefined =>
        (GraftCatalog.identPath(spark,
          Seq(ident(a).get, ident(b).get, ident(c).get)).get, tl)
      case other => throw new IllegalArgumentException(
        "CONVERT TO GRAFT needs a directory — parquet.`/path`, `/path`, " +
          s"or a graft catalog name; got: ${other.mkString(" ")}")
    }
    val types = rest0 match {
      case Nil => Seq.empty[(String, String)]
      case p :: b :: Punct('(') :: tl if kw(p, "PARTITIONED") && kw(b, "BY") =>
        // (name TYPE, name TYPE, …) — single-word types only
        def cols(ts: List[Tok], acc: Seq[(String, String)]): Seq[(String, String)] =
          ts match {
            case n :: Word(ty) :: Punct(',') :: more if ident(n).isDefined =>
              cols(more, acc :+ (ident(n).get -> ty))
            case n :: Word(ty) :: Punct(')') :: more if ident(n).isDefined =>
              end(more, "CONVERT"); acc :+ (ident(n).get -> ty)
            case other => throw new IllegalArgumentException(
              "PARTITIONED BY in CONVERT takes (name TYPE, …) with " +
                s"single-word types; got: ${other.mkString(" ")}")
          }
        cols(tl, Seq.empty)
      case other => throw new IllegalArgumentException(
        s"unexpected trailing tokens in CONVERT: ${other.mkString(" ")}")
    }
    GraftConvertCommand(path, types)
  }

  /** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] t SHALLOW CLONE s
    * [VERSION AS OF n | TIMESTAMP AS OF 'ts']` — one metadata commit
    * referencing the source's files by absolute path; see
    * [[ManifestLake.shallowClone]]. The new table spells as
    * `` `graft-manifest`.`/path` ``, a bare quoted path, or a graft
    * catalog name; the source additionally as a temp view or a
    * current-catalog bare name (it must exist).
    */
  private def parseClone(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    def ident(t: Tok): Option[String] = t match {
      case Word(w) => Some(w)
      case Quoted(q) => Some(q)
      case _ => None
    }
    val afterCreate = toks match {
      case c :: o :: r :: t :: tl if kw(c, "CREATE") && kw(o, "OR") &&
        kw(r, "REPLACE") && kw(t, "TABLE") => (true, false, tl)
      case c :: t :: i :: n :: e :: tl if kw(c, "CREATE") && kw(t, "TABLE") &&
        kw(i, "IF") && kw(n, "NOT") && kw(e, "EXISTS") => (false, true, tl)
      case c :: t :: tl if kw(c, "CREATE") && kw(t, "TABLE") =>
        (false, false, tl)
      case other => throw new IllegalArgumentException(
        s"SHALLOW CLONE spells CREATE [OR REPLACE] TABLE [IF NOT EXISTS] " +
          s"t SHALLOW CLONE s; got: ${other.mkString(" ")}")
    }
    val (orReplace, ifNotExists, afterTable) = afterCreate
    // the NEW table — resolved without requiring existence
    val (tgt, afterTgt) = afterTable match {
      case a :: Punct('.') :: Quoted(dir) :: tl
        if ident(a).exists(f => f.equalsIgnoreCase("graft-manifest") ||
          f.equalsIgnoreCase("graft_manifest")) => (dir, tl)
      case a :: Punct('.') :: b :: Punct('.') :: c :: tl
        if ident(a).isDefined && ident(b).isDefined && ident(c).isDefined &&
          GraftCatalog.identPath(spark,
            Seq(ident(a).get, ident(b).get, ident(c).get)).isDefined =>
        (GraftCatalog.identPath(spark,
          Seq(ident(a).get, ident(b).get, ident(c).get)).get, tl)
      case a :: Punct('.') :: b :: tl
        if ident(a).isDefined && ident(b).isDefined &&
          GraftCatalog.identPath(spark,
            Seq(ident(a).get, ident(b).get)).isDefined =>
        (GraftCatalog.identPath(spark,
          Seq(ident(a).get, ident(b).get)).get, tl)
      case Quoted(dir) :: tl => (dir, tl)
      case (a @ Word(_)) :: tl
        if GraftCatalog.currentIdentPath(spark, ident(a).get).isDefined =>
        (GraftCatalog.currentIdentPath(spark, ident(a).get).get, tl)
      case other => throw new IllegalArgumentException(
        "SHALLOW CLONE's new table spells `graft-manifest`.`/path`, a " +
          "quoted path, or a graft catalog name; got: " + other.mkString(" "))
    }
    val (deep, afterKind) = afterTgt match {
      case sh :: cl :: tl if kw(sh, "SHALLOW") && kw(cl, "CLONE") => (false, tl)
      case dp :: cl :: tl if kw(dp, "DEEP") && kw(cl, "CLONE") => (true, tl)
      case other => throw new IllegalArgumentException(
        s"expected SHALLOW CLONE or DEEP CLONE after the new table name, " +
          s"got: ${other.mkString(" ")}")
    }
    val what = if (deep) "DEEP CLONE" else "SHALLOW CLONE"
    val (src, rest) = target(spark, afterKind, what)
    val version = rest match {
      case Nil => None
      case v :: a :: o :: n :: tl if kw(v, "VERSION") && kw(a, "AS") &&
        kw(o, "OF") =>
        end(tl, what); Some(num(n, "VERSION AS OF"))
      case t :: a :: o :: Str(ts) :: tl if kw(t, "TIMESTAMP") && kw(a, "AS") &&
        kw(o, "OF") =>
        end(tl, what)
        Some(ManifestLake.versionAtTimestamp(spark, src,
          ManifestDataSource.parseMillis("TIMESTAMP AS OF", ts)))
      case other => throw new IllegalArgumentException(
        s"unexpected trailing tokens in $what: ${other.mkString(" ")}")
    }
    GraftCloneCommand(src, tgt, version, orReplace, ifNotExists, deep)
  }

  /** `ALTER TABLE t DROP FEATURE '<name>'` — remove a provably-unused
    * required table feature; see [[ManifestLake.dropFeature]]. The
    * name takes the quoted spellings ('deletion-vectors' or backquoted)
    * — feature names carry '-', which the tiny lexer's bare words
    * do not.
    */
  private def parseDropFeature(spark: SparkSession,
                               toks: List[Tok]): LogicalPlan = {
    val afterTable = toks match {
      case a :: t :: tl if kw(a, "ALTER") && kw(t, "TABLE") => tl
      case other => throw new IllegalArgumentException(
        s"DROP FEATURE spells ALTER TABLE t DROP FEATURE '<name>'; got: " +
          other.mkString(" "))
    }
    val (path, rest) = target(spark, afterTable, "DROP FEATURE")
    val name = rest match {
      case d :: f :: Str(nm) :: Nil if kw(d, "DROP") && kw(f, "FEATURE") => nm
      case d :: f :: Quoted(nm) :: Nil if kw(d, "DROP") && kw(f, "FEATURE") => nm
      case d :: f :: Word(nm) :: Nil if kw(d, "DROP") && kw(f, "FEATURE") => nm
      case other => throw new IllegalArgumentException(
        s"expected DROP FEATURE '<name>' after the table, got: " +
          other.mkString(" "))
    }
    GraftDropFeatureCommand(path, name)
  }

  /** `ALTER TABLE t MATERIALIZE` — untether external references in
    * place; see [[ManifestLake.materialize]].
    */
  private def parseMaterialize(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    val afterTable = toks match {
      case a :: t :: tl if kw(a, "ALTER") && kw(t, "TABLE") => tl
      case other => throw new IllegalArgumentException(
        s"MATERIALIZE spells ALTER TABLE t MATERIALIZE; got: " +
          other.mkString(" "))
    }
    val (path, rest) = target(spark, afterTable, "MATERIALIZE")
    rest match {
      case m :: tl if kw(m, "MATERIALIZE") => end(tl, "MATERIALIZE")
      case other => throw new IllegalArgumentException(
        s"expected MATERIALIZE after the table name, got: ${other.mkString(" ")}")
    }
    GraftMaterializeCommand(path)
  }

  /** `FSCK REPAIR TABLE t [DRY RUN]` — drop references to data files
    * deleted out-of-band; see [[ManifestLake.fsck]].
    */
  private def parseFsck(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    val afterRepair = toks match {
      case r :: t :: tl if kw(r, "REPAIR") && kw(t, "TABLE") => tl
      case other => throw new IllegalArgumentException(
        s"FSCK spells FSCK REPAIR TABLE <t> [DRY RUN]; got: " +
          other.mkString(" "))
    }
    val (path, rest) = target(spark, afterRepair, "FSCK REPAIR TABLE")
    val dryRun = rest match {
      case Nil => false
      case d :: r :: Nil if kw(d, "DRY") && kw(r, "RUN") => true
      case other => throw new IllegalArgumentException(
        s"unexpected trailing tokens in FSCK: ${other.mkString(" ")}")
    }
    GraftFsckCommand(path, dryRun)
  }

  /** `COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
    * [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', …)]
    * [COPY_OPTIONS ('force' = 'true')] [VALIDATE]` — idempotent batch
    * file ingestion; see [[ManifestLake.copyInto]]. PATTERN is a full
    * glob over the source-relative path (`**` and `{a,b}` braces, so
    * one pattern spans sibling directory trees);
    * FORMAT_OPTIONS ('schema' = '<DDL>') declares the CSV/JSON read
    * schema (one pass instead of inferSchema's two); VALIDATE dry-runs
    * the METADATA checks (listing + pattern, mutated-file identity,
    * schema drift, store-assignability) and reports what would load,
    * committing nothing — data-dependent refusals (CHECK constraints,
    * NOT NULL) surface on the real load, which reads rows.
    */
  private def parseCopy(spark: SparkSession, toks: List[Tok]): LogicalPlan = {
    val afterInto = toks match {
      case i :: tl if kw(i, "INTO") => tl
      case other => throw new IllegalArgumentException(
        s"COPY spells COPY INTO <t> FROM '<dir>' FILEFORMAT = <fmt> …; " +
          s"got: ${other.mkString(" ")}")
    }
    val (path, rest0) = target(spark, afterInto, "COPY INTO")
    val (source, rest1) = rest0 match {
      case f :: Str(dir) :: tl if kw(f, "FROM") => (dir, tl)
      case other => throw new IllegalArgumentException(
        s"COPY INTO needs FROM '<dir>' after the table, got: " +
          other.mkString(" "))
    }
    val (format, rest2) = rest1 match {
      case f :: Punct('=') :: Word(fmt) :: tl if kw(f, "FILEFORMAT") =>
        (fmt, tl)
      case other => throw new IllegalArgumentException(
        s"COPY INTO needs FILEFORMAT = PARQUET|CSV|JSON, got: " +
          other.mkString(" "))
    }
    def optionsList(tl0: List[Tok], what: String)
        : (Seq[(String, String)], List[Tok]) = {
      var tl = tl0 match {
        case Punct('(') :: r => r
        case other => throw new IllegalArgumentException(
          s"$what needs a parenthesized list, got: ${other.mkString(" ")}")
      }
      val out = Seq.newBuilder[(String, String)]
      var done = false
      while (!done) tl match {
        case Str(k) :: Punct('=') :: Str(v) :: Punct(',') :: r =>
          out += (k -> v); tl = r
        case Str(k) :: Punct('=') :: Str(v) :: Punct(')') :: r =>
          out += (k -> v); tl = r; done = true
        case Punct(')') :: r => tl = r; done = true
        case other => throw new IllegalArgumentException(
          s"$what entries spell 'key' = 'value', got: ${other.mkString(" ")}")
      }
      (out.result(), tl)
    }
    var rest = rest2
    var pattern: Option[String] = None
    var formatOptions = Seq.empty[(String, String)]
    var copyOptions = Seq.empty[(String, String)]
    var validate = false
    while (rest.nonEmpty) rest match {
      case v :: tl if kw(v, "VALIDATE") =>
        require(!validate, "VALIDATE given twice")
        validate = true; rest = tl
      case p :: Punct('=') :: Str(g) :: tl if kw(p, "PATTERN") =>
        require(pattern.isEmpty, "PATTERN given twice")
        pattern = Some(g); rest = tl
      case fo :: tl if kw(fo, "FORMAT_OPTIONS") =>
        require(formatOptions.isEmpty, "FORMAT_OPTIONS given twice")
        val (opts, r) = optionsList(tl, "FORMAT_OPTIONS")
        formatOptions = opts; rest = r
      case co :: tl if kw(co, "COPY_OPTIONS") =>
        require(copyOptions.isEmpty, "COPY_OPTIONS given twice")
        val (opts, r) = optionsList(tl, "COPY_OPTIONS")
        copyOptions = opts; rest = r
      case other => throw new IllegalArgumentException(
        s"unexpected trailing tokens in COPY INTO: ${other.mkString(" ")}")
    }
    val unknownCopyOpts = copyOptions.map(_._1).filterNot(_
      .equalsIgnoreCase("force"))
    require(unknownCopyOpts.isEmpty,
      s"COPY_OPTIONS supports 'force' only; got: ${unknownCopyOpts.mkString(", ")}")
    val force = copyOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("force") => v.equalsIgnoreCase("true")
    }.getOrElse(false)
    GraftCopyIntoCommand(path, source, format, pattern, formatOptions.toMap,
      force, validate)
  }

  /** None (not an exception) when the shape does not parse or the
    * target is not a manifest table — DESCRIBE has vanilla meanings.
    */
  private def parseDetail(spark: SparkSession,
                          toks: List[Tok]): Option[LogicalPlan] = {
    val (path, rest) = target(spark, toks, "DESCRIBE DETAIL")
    if (rest.isEmpty) Some(GraftDetailCommand(path)) else None
  }

  /** None (not an exception) when the shape does not parse or the
    * target is not a manifest table — DESCRIBE has vanilla meanings.
    */
  private def parseHistory(spark: SparkSession,
                           toks: List[Tok]): Option[LogicalPlan] = {
    val (path, rest) = target(spark, toks, "DESCRIBE HISTORY")
    rest match {
      case Nil => Some(GraftHistoryCommand(path, None))
      case l :: nTok :: Nil if kw(l, "LIMIT") =>
        Some(GraftHistoryCommand(path, Some(num(nTok, "LIMIT").toInt)))
      case _ => None
    }
  }
}

/** `VACUUM <manifest table> …` — returns the removed (or DRY RUN:
  * would-be-removed) paths, one row each. A BARE `VACUUM t` defaults to
  * a conservative RETAIN 168 HOURS horizon (the 7-day default retention
  * users know from the upstream lake format), NOT an aggressive
  * keep-2-versions: the same spelling must not be irreversibly more
  * destructive here than where they learned it. Tighter reaping is an
  * explicit opt-in via KEEP <n> VERSIONS or a shorter RETAIN.
  */
final case class GraftVacuumCommand(path: String, keepVersions: Option[Int],
                                    retainHours: Option[Long], dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val keep: Int = keepVersions match {
      case Some(k) => k
      case None =>
        val h = retainHours.getOrElse(168L)
        val cutoff = System.currentTimeMillis() - h * 3600L * 1000L
        val vs = ManifestLake.versions(spark, path).map(_._1)
        // the latest version at/under the horizon is the boundary: it
        // must survive so a TIMESTAMP AS OF read at the horizon still
        // resolves; everything younger is inside the window
        val boundary =
          try Some(ManifestLake.versionAtTimestamp(spark, path, cutoff))
          catch { case _: IllegalArgumentException => None }
        boundary match {
          case None => math.max(vs.length, 1) // table younger than horizon
          case Some(b) => math.max(vs.count(_ > b) + 1, 1)
        }
    }
    ManifestLake.vacuum(spark, path, keepVersions = keep, dryRun = dryRun)
      .sorted.map(Row(_))
  }
}

/** `OPTIMIZE <manifest table> [ZORDER BY …]` — one row per rewritten
  * partition: (partition, files_before, files_after). A single ZORDER
  * column degenerates to plain range clustering (a 1-D z-curve IS the
  * range order; the engine refuses the pointless 1-column curve, so
  * the statement maps it onto clusterBy).
  */
/** `REORG TABLE t [WHERE …] APPLY (PURGE)` — rewrite exactly the
  * DV-masked files, materializing their masks; returns (partition,
  * files_before, files_after) per touched partition.
  */
final case class GraftReorgCommand(path: String,
                                   whereSql: Option[String] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    ManifestLake.compact(spark, path,
      where = whereSql.map(org.apache.spark.sql.functions.expr),
      purgeOnly = true)
      .sortBy(_._1).map { case (p, b, a) => Row(p, b, a) }
}

final case class GraftOptimizeCommand(path: String, zorderBy: Seq[String],
                                      whereSql: Option[String] = None,
                                      full: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val where = whereSql.map(org.apache.spark.sql.functions.expr)
    val rewritten =
      if (zorderBy.length == 1)
        ManifestLake.compact(spark, path, clusterBy = zorderBy, where = where,
          full = full)
      else ManifestLake.compact(spark, path, zOrderBy = zorderBy, where = where,
        full = full)
    rewritten.sortBy(_._1).map { case (p, b, a) => Row(p, b, a) }
  }
}

/** `RESTORE [TABLE] <manifest table> TO VERSION/TIMESTAMP AS OF …` —
  * returns the NEW head version (the restore commit).
  */
final case class GraftRestoreCommand(path: String,
                                     to: Either[Long, String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = to match {
      case Left(n) => n
      case Right(ts) => ManifestLake.versionAtTimestamp(spark, path,
        ManifestDataSource.parseMillis("TIMESTAMP AS OF", ts))
    }
    Seq(Row(ManifestLake.restore(spark, path, v)))
  }
}

/** `DESCRIBE DETAIL <manifest table>` — the one-row operational
  * summary (head version, live files/bytes, partitioning, stats
  * coverage, writers, constraints, column mapping) the Scala
  * `ManifestLake.detail` serves.
  */
final case class GraftDetailCommand(path: String)
  extends LeafRunnableCommand {
  private def str = StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", str, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("total_bytes", LongType, nullable = false)(),
    AttributeReference("partition_cols", str, nullable = false)(),
    AttributeReference("n_columns", LongType, nullable = false)(),
    AttributeReference("bounds_coverage", str, nullable = false)(),
    AttributeReference("null_count_coverage", str, nullable = false)(),
    AttributeReference("value_set_coverage", str, nullable = false)(),
    AttributeReference("change_feed", org.apache.spark.sql.types.BooleanType,
      nullable = false)(),
    AttributeReference("n_writers", LongType, nullable = false)(),
    AttributeReference("constraints", str, nullable = false)(),
    AttributeReference("column_mapping", str, nullable = false)(),
    AttributeReference("clustering_cols", str, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    ManifestLake.detail(spark, path).collect().toSeq
}

/** `DESCRIBE HISTORY <manifest table> [LIMIT n]` — the commit ledger,
  * newest first (Delta's ordering).
  */
final case class GraftHistoryCommand(path: String, limit: Option[Int])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("total_bytes", LongType, nullable = false)(),
    AttributeReference("txns", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val rows = ManifestLake.history(spark, path).collect().toSeq
      .sortBy(-_.getLong(0))
    limit.fold(rows)(rows.take)
  }
}

/** `CONVERT TO GRAFT parquet.`/path`` — in-place adoption, dispatching
  * to [[ManifestLake.adopt]]; returns (version, n_files) of the v1
  * manifest built over the existing files.
  */
/** `COPY INTO t FROM '<dir>' FILEFORMAT = <fmt> …` — idempotent batch
  * file ingestion into a manifest table; one commit per invocation,
  * exactly-once by source-file identity. Returns what happened: the
  * head version (unchanged on a no-op re-run), files loaded, rows
  * loaded.
  */
final case class GraftCopyIntoCommand(path: String, source: String,
                                      format: String,
                                      pattern: Option[String],
                                      formatOptions: Map[String, String],
                                      force: Boolean,
                                      validate: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files_loaded", LongType, nullable = false)(),
    AttributeReference("num_rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = ManifestLake.copyInto(spark, path, source, format, pattern,
      formatOptions, force, validate)
    Seq(Row(r.version, r.filesLoaded, r.rowsLoaded))
  }
}

/** `FSCK REPAIR TABLE t [DRY RUN]` — lists (and without DRY RUN,
  * un-references) live entries whose data file vanished out-of-band.
  */
final case class GraftFsckCommand(path: String, dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("missing_file", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    ManifestLake.fsck(spark, path, dryRun).map(Row(_))
}

/** `CREATE TABLE t SHALLOW|DEEP CLONE s [VERSION AS OF n]` — dispatches
  * to [[ManifestLake.shallowClone]] / [[ManifestLake.deepClone]];
  * returns the new table's version and how many source files it
  * references (shallow: all by reference — the zero-copy contract;
  * deep: all copied into the clone's own tree).
  */
final case class GraftCloneCommand(sourcePath: String, targetPath: String,
                                   versionAsOf: Option[Long],
                                   orReplace: Boolean, ifNotExists: Boolean,
                                   deep: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_referenced", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(!(orReplace && ifNotExists),
      "CREATE OR REPLACE and IF NOT EXISTS cannot combine")
    val v =
      if (deep) ManifestLake.deepClone(spark, sourcePath, targetPath,
        versionAsOf, orReplace, ifNotExists)
      else ManifestLake.shallowClone(spark, sourcePath, targetPath,
        versionAsOf, orReplace, ifNotExists)
    val (fs, root) = ManifestLake.fsFor(spark, targetPath)
    Seq(Row(v, ManifestLake.readManifest(fs, root, v).files.length.toLong))
  }
}

/** `ALTER TABLE t DROP FEATURE '<name>'` — dispatches to
  * [[ManifestLake.dropFeature]]; returns the new head version.
  */
final case class GraftDropFeatureCommand(path: String, feature: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestLake.dropFeature(spark, path, feature)))
}

/** `ALTER TABLE t MATERIALIZE` — dispatches to
  * [[ManifestLake.materialize]]: copy every external reference into
  * the table's own tree; no-op (same version back) when nothing is
  * external. Returns the head version and how many files were copied.
  */
final case class GraftMaterializeCommand(path: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_copied", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val before = ManifestLake.currentVersion(spark, path)
    val v = ManifestLake.materialize(spark, path)
    val copied =
      if (before.contains(v)) 0L
      else {
        val (fs, root) = ManifestLake.fsFor(spark, path)
        val prev = ManifestLake.readManifest(fs, root, v - 1)
          .files.map(_.path).toSet
        ManifestLake.readManifest(fs, root, v).files
          .count(f => !prev(f.path)).toLong
      }
    Seq(Row(v, copied))
  }
}

final case class GraftConvertCommand(path: String,
                                     partitionTypes: Seq[(String, String)])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val types = partitionTypes.map { case (n, ty) =>
      n -> (try spark.sessionState.sqlParser.parseDataType(ty) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"PARTITIONED BY type $ty for column $n is not a data type", e)
      })
    }.toMap
    val v = ManifestLake.adopt(spark, path, partitionTypes = types)
    val (fs, root) = ManifestLake.fsFor(spark, path)
    Seq(Row(v, ManifestLake.readManifest(fs, root, v).files.length.toLong))
  }
}
