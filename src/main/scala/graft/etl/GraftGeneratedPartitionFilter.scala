package graft.etl

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Divide, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, NumericType, ShortType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftshim.SparkShims

/** Partition-filter INFERENCE for generated partition columns —
  * Delta's `OptimizeGeneratedColumn` idiom. A table partitioned by a
  * GENERATED column (`bkt GENERATED ALWAYS AS (CAST(doc_id % 4 AS
  * STRING))`) is usually queried by the BASE column (`WHERE doc_id =
  * 42`): without inference the scan reads EVERY partition, because the
  * predicate mentions no partition column. Since the engine validates
  * generated expressions as deterministic and computes them itself on
  * every write (supplied values refuse), every row with `doc_id = v`
  * provably lives in partition `bkt = f(v)` — so the rule derives that
  * predicate and conjoins it, and ordinary partition pruning does the
  * rest. At 100 TB this is the difference between scanning one
  * partition and scanning the table.
  *
  * Scope, deliberately conservative:
  *   - single-base expressions only (recorded at index-build time:
  *     [[ManifestFileIndex.genPartExprs]]);
  *   - equality (`base = lit`, either order) and IN-list shapes — the
  *     shapes where `f(lit)` is well-defined without monotonicity
  *     assumptions;
  *   - RANGE shapes (`base >= lo`, `base < hi`, BETWEEN's conjunct
  *     pair) when the generation expression is on the PROVABLY
  *     MONOTONE allowlist ([[monotoneOutType]]): CAST(ts AS DATE),
  *     to_date, date_trunc/trunc, year, floor(x / N) with N > 0, and
  *     substring(s, 1, k) — Delta's OptimizeGeneratedColumn shapes.
  *     For monotone non-decreasing f, `base >= lo` implies
  *     `g >= f(lo)` and `base <= hi` implies `g <= f(hi)`; a STRICT
  *     bound on a discrete base (integral/date/timestamp) tightens to
  *     its neighboring value before f applies (`ts < midnight` maps
  *     through f(midnight - 1µs) and excludes the boundary day —
  *     exact for the canonical half-open day range), and otherwise
  *     derives the non-strict partition bound (f collapses
  *     neighborhoods, so the boundary partition must stay readable).
  *     The derived comparison must also survive the partition
  *     column's STORAGE type: a cast that breaks ordering (number
  *     rendered as string) skips inference ([[orderPreservingCast]]
  *     — dates render ISO, which string-compares in date order).
  *     This is the layout 100 TB event tables actually use
  *     (`day GENERATED AS (CAST(ts AS DATE))` queried by a ts range)
  *     — without it every such query scans every day;
  *   - a derived value of NULL skips (an EqualTo against null would
  *     wrongly drop every row);
  *   - evaluation is driver-local constant folding over
  *     [[OneRowRelation]] — no Spark job at planning time;
  *   - idempotent: a derived conjunct semantically present is never
  *     re-added, so the optimizer's fixed point terminates.
  */
final class GraftGeneratedPartitionFilter(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: ManifestFileIndex if idx.genPartExprs.nonEmpty =>
            derive(cond, lr, idx) match {
              case Seq() => f
              case missing =>
                Filter(missing.foldLeft(cond)(And(_, _)), lr)
            }
          case _ => f
        }
        case _ => f
      }
  }

  private def derive(cond: Expression, lr: LogicalRelation,
                     idx: ManifestFileIndex): Seq[Expression] = {
    val split = splitAnd(cond)
    val outByName = lr.output.map(a => a.name.toLowerCase -> a).toMap
    val derived = idx.genPartExprs.flatMap { case (g, exprSql, base) =>
      outByName.get(g.toLowerCase).toSeq.flatMap { gAttr =>
        // range inference needs a provably monotone f whose value
        // ORDER survives storage in the partition column's type;
        // classified once per (expression, table) pair, not per conjunct
        lazy val monotone = outByName.get(base.toLowerCase).exists { bAttr =>
          monotoneShape(exprSql, base, bAttr.dataType)
            .exists(orderPreservingCast(_, gAttr.dataType))
        }
        def lower(l: Literal): Option[Expression] =
          if (!monotone) None
          else eval(exprSql, base, l, gAttr.dataType).map(GreaterThanOrEqual(gAttr, _))
        def upper(l: Literal): Option[Expression] =
          if (!monotone) None
          else eval(exprSql, base, l, gAttr.dataType).map(LessThanOrEqual(gAttr, _))
        // strict bounds on a DISCRETE base tighten to the neighboring
        // value BEFORE f is applied: `ts < midnight` excludes the
        // boundary day via f(midnight - 1µs), `id < 80` excludes
        // bucket floor(80/N) via f(79) — exact for the canonical
        // half-open day-range query. A non-discrete or extreme-valued
        // literal falls back to the non-strict derivation (sound).
        def lowerStrict(l: Literal): Option[Expression] =
          lower(neighbor(l, up = true).getOrElse(l))
        def upperStrict(l: Literal): Option[Expression] =
          upper(neighbor(l, up = false).getOrElse(l))
        split.flatMap {
          case EqualTo(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(base) =>
            eval(exprSql, base, l, gAttr.dataType).map(EqualTo(gAttr, _))
          case EqualTo(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(base) =>
            eval(exprSql, base, l, gAttr.dataType).map(EqualTo(gAttr, _))
          case In(a: AttributeReference, vs)
            if a.name.equalsIgnoreCase(base) && vs.nonEmpty &&
              vs.forall(_.isInstanceOf[Literal]) =>
            val mapped = vs.map(v =>
              eval(exprSql, base, v.asInstanceOf[Literal], gAttr.dataType))
            if (mapped.forall(_.isDefined))
              Some(In(gAttr, mapped.flatten.distinct))
            else None
          // range shapes, both operand orders; strict derives non-strict
          case GreaterThanOrEqual(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(base) => lower(l)
          case GreaterThan(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(base) => lowerStrict(l)
          case LessThanOrEqual(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(base) => upper(l)
          case LessThan(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(base) => upperStrict(l)
          case GreaterThanOrEqual(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(base) => upper(l)   // lit >= base
          case GreaterThan(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(base) => upperStrict(l)  // base < lit
          case LessThanOrEqual(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(base) => lower(l)   // lit <= base
          case LessThan(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(base) => lowerStrict(l)  // base > lit
          case _ => None
        }
      }
    }
    derived.filterNot(d => split.exists(_.semanticEquals(d)))
  }

  /** The generation expression's natural output type IF the expression
    * is provably monotone NON-DECREASING in `base` — else None. The
    * allowlist is shapes whose monotonicity is a mathematical fact,
    * not a data property: identity, date narrowing (CAST to DATE /
    * to_date / date_trunc / trunc / year over a date-or-timestamp
    * base), floor over a positive-constant division, and the
    * leading-substring of a string (prefix order embeds in
    * lexicographic order). Everything else — arithmetic with `%`,
    * hashes, format functions, multi-base expressions — returns None
    * and range inference stays off (equality/IN inference never needs
    * this proof). The tree is the PARSED, unresolved expression: the
    * same SQL text the write path validated and computes, matched
    * structurally.
    */
  private def monotoneShape(exprSql: String, base: String,
                            baseType: DataType): Option[DataType] =
    try {
      def walk(e: Expression): Option[DataType] = e match {
        case u: UnresolvedAttribute
          if u.nameParts.mkString(".").equalsIgnoreCase(base) => Some(baseType)
        case c: Cast => walk(c.child).flatMap { nt =>
          c.dataType match {
            // a DATE renders ISO `yyyy-MM-dd` — lexicographic order IS
            // date order, so the explicit to-string spelling of the
            // string-day layout stays monotone
            case StringType if nt == DateType => Some(StringType)
            case DateType if nt == TimestampType || nt == TimestampNTZType || nt == DateType => Some(DateType)
            case TimestampType if nt == TimestampType || nt == DateType =>
              Some(TimestampType)
            case TimestampNTZType if nt == TimestampNTZType || nt == DateType =>
              Some(TimestampNTZType)
            case _ => None
          }
        }
        case f: UnresolvedFunction if f.nameParts.length == 1 =>
          val args = f.arguments
          f.nameParts.head.toLowerCase match {
            case "to_date" if args.length == 1 =>
              walk(args.head).collect {
                case TimestampType | TimestampNTZType | DateType => DateType }
            case "date_trunc" if args.length == 2 &&
              args.head.isInstanceOf[Literal] =>
              walk(args(1)).collect {
                case t @ (TimestampType | TimestampNTZType | DateType) =>
                  if (t == DateType) TimestampType else t }
            case "trunc" if args.length == 2 &&
              args(1).isInstanceOf[Literal] =>
              walk(args.head).collect {
                case TimestampType | TimestampNTZType | DateType => DateType }
            case "year" if args.length == 1 =>
              walk(args.head).collect {
                case TimestampType | TimestampNTZType | DateType => IntegerType }
            case "floor" if args.length == 1 => args.head match {
              case Divide(x, Literal(n, _: NumericType), _)
                if n != null && numericPositive(n) =>
                walk(x).collect { case _: NumericType => LongType }
              case x => walk(x).collect { case _: NumericType => LongType }
            }
            case "substring" | "substr" if args.length == 3 =>
              (args(1), args(2)) match {
                case (Literal(p, _), Literal(k, _))
                  if p == 1 && k != null =>
                  walk(args.head).collect { case StringType => StringType }
                case _ => None
              }
            case _ => None
          }
        case _ => None
      }
      walk(spark.sessionState.sqlParser.parseExpression(exprSql))
    } catch { case NonFatal(_) => None }

  /** The next (up) or previous (down) representable value of a DISCRETE
    * literal — integral step 1, date step 1 day, timestamp step 1 µs —
    * or None for non-discrete types and at the extremes (where the
    * caller keeps the original literal and the non-strict bound).
    */
  private def neighbor(l: Literal, up: Boolean): Option[Literal] = {
    val d = if (up) 1L else -1L
    (l.value, l.dataType) match {
      case (null, _) => None
      case (v: Byte, ByteType) if v != (if (up) Byte.MaxValue else Byte.MinValue) =>
        Some(Literal((v + d).toByte, ByteType))
      case (v: Short, ShortType) if v != (if (up) Short.MaxValue else Short.MinValue) =>
        Some(Literal((v + d).toShort, ShortType))
      case (v: Int, IntegerType) if v != (if (up) Int.MaxValue else Int.MinValue) =>
        Some(Literal((v + d).toInt, IntegerType))
      case (v: Long, LongType) if v != (if (up) Long.MaxValue else Long.MinValue) =>
        Some(Literal(v + d, LongType))
      case (v: Int, DateType) if v != (if (up) Int.MaxValue else Int.MinValue) =>
        Some(Literal(v + d.toInt, DateType))
      case (v: Long, TimestampType) if v != (if (up) Long.MaxValue else Long.MinValue) =>
        Some(Literal(v + d, TimestampType))
      case (v: Long, TimestampNTZType) if v != (if (up) Long.MaxValue else Long.MinValue) =>
        Some(Literal(v + d, TimestampNTZType))
      case _ => None
    }
  }

  private def numericPositive(n: Any): Boolean = n match {
    case i: Int => i > 0
    case l: Long => l > 0
    case s: Short => s > 0
    case b: Byte => b > 0
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.signum > 0
    case f: Float => f > 0
    case d: Double => d > 0
    case _ => false
  }

  /** Does casting f's natural output type to the partition column's
    * declared type preserve ordering? Same type trivially; integral
    * widening; date<->timestamp (both order-embeddings); and
    * DATE-to-STRING (the engine renders dates ISO `yyyy-MM-dd`, whose
    * lexicographic order IS date order — the common
    * `day STRING GENERATED AS (CAST(ts AS DATE))` layout). A numeric
    * rendered as a string does NOT preserve order ("10" < "9") and
    * skips.
    */
  private def orderPreservingCast(from: DataType, to: DataType): Boolean = {
    def rank(dt: DataType): Int = dt match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => -1
    }
    (from, to) match {
      case (f, t) if f == t => true
      case (f, t) if rank(f) > 0 && rank(t) > 0 => rank(f) <= rank(t)
      case (DateType, TimestampType) | (TimestampType, DateType) => true
      case (DateType, TimestampNTZType) | (TimestampNTZType, DateType) => true
      case (DateType, StringType) => true
      case _ => false
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** `f(lit)` cast to the partition column's type, folded driver-side
    * over OneRowRelation (no job); None on null or any failure —
    * skipping inference is always sound.
    */
  private def eval(exprSql: String, base: String, lit: Literal,
                   gType: org.apache.spark.sql.types.DataType): Option[Literal] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(exprSql)
      val substituted = parsed.transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.mkString(".").equalsIgnoreCase(base) => lit
      }
      val one = Project(
        Seq(Alias(Cast(substituted, gType), "v")()), OneRowRelation())
      val v = SparkShims.ofRows(spark, one).head().get(0)
      if (v == null) None else Some(Literal.create(v, gType))
    } catch { case NonFatal(_) => None }
}
