package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` bridge the V1 streaming `Source` contract
  * forces: `MicroBatchExecution` asserts the DataFrame a source's
  * `getBatch` returns "ha[s] isStreaming=true", and the only way to
  * mint such a frame is `Dataset.ofRows` over a `LogicalRDD(…,
  * isStreaming = true)` — both `private[sql]`. Living one package
  * inside `org.apache.spark.sql` is the established connector answer
  * (Delta ships `org.apache.spark.sql.delta` for exactly this); the
  * shim is deliberately a single three-line function so the
  * internal-API surface area stays auditable.
  *
  * The input frame's ANALYZED plan supplies both the output attributes
  * and the executed RDD, so the streamed rows are byte-identical to
  * what the batch plan produces — the batch read path (manifest-fed
  * single scan, pruning, skipping) is reused wholesale under the
  * streaming engine.
  */
object StreamingDataFrameShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true)(session))
  }
}
