package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` bridge the V1 streaming contracts force, in
  * both directions:
  *
  *  - a SOURCE's `getBatch` must return a frame with
  *    `isStreaming = true` (`MicroBatchExecution` asserts it), and the
  *    only way to mint one is `Dataset.ofRows` over a
  *    `LogicalRDD(…, isStreaming = true)` — both `private[sql]`;
  *  - a SINK's `addBatch` receives a streaming-internal frame whose
  *    plan belongs to the trigger's `IncrementalExecution`; feeding it
  *    to batch writers directly re-plans streaming operators, so the
  *    engine's own `ForeachBatchSink` rewraps the executed RDD with
  *    `isStreaming = false` — the exact conversion [[asBatch]] applies
  *    for the manifest sink.
  *
  * Living one package inside `org.apache.spark.sql` is the established
  * connector answer (Delta ships `org.apache.spark.sql.delta` for
  * exactly this); the shim is deliberately two one-expression
  * functions so the internal-API surface area stays auditable.
  *
  * The input frame's ANALYZED plan supplies both the output attributes
  * and the executed RDD, so the converted rows are byte-identical to
  * what the source plan produces.
  */
object StreamingDataFrameShim {

  /** Mint a DataFrame over an already-analyzed logical plan — the SQL
    * DML commands ([[graft.etl.GraftSqlCommands]]) capture the resolved
    * source/query plan at analysis and re-enter the Dataset API at
    * run(), exactly what `Dataset.ofRows` exists for internally.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Column over a catalyst Expression — the SQL DML bridge converts
    * parsed DELETE/UPDATE/MERGE conditions (re-anchored to
    * UnresolvedAttribute so they re-resolve against the freshly-read
    * table) back into the public Column API.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true)(session))
  }

  def asBatch(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = false)(session))
  }
}
