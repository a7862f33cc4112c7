package graft.etl

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Expression, In, Literal}
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
  *     assumptions (range inference needs a provably monotone f);
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
          case _ => None
        }
      }
    }
    derived.filterNot(d => split.exists(_.semanticEquals(d)))
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
