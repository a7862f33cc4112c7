package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The two `private[sql]` bridges graft's SQL DML surface needs, and
  * nothing else. Spark deliberately scopes plan-construction helpers to
  * its own package; an extension that intercepts parsed `MERGE INTO` /
  * `UPDATE` / `DELETE` statements must still (a) wrap a parsed catalyst
  * `Expression` back into a public [[Column]] to hand it to the engine,
  * and (b) execute the statement's source sub-plan as a [[DataFrame]].
  * Every table-format extension that speaks SQL DML carries exactly this
  * pair; keeping them in one tiny leaf package makes the private-API
  * surface auditable — nothing outside this object touches
  * `org.apache.spark.sql.classic` internals.
  */
object SparkShims {

  /** Public [[Column]] over a catalyst expression (typically an
    * unresolved one straight from the parser — it resolves against
    * whatever frame it is later applied to).
    */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Execute a logical plan as a DataFrame — the source side of a parsed
    * MERGE statement (a table reference, a subquery, a VALUES list).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
