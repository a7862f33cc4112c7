package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting handles joins; for AGGREGATIONS over a hot
  * key (one user with 10⁹ events in a 100 TB log), partial aggregation
  * already combines map-side, but a single final reducer still receives
  * the hot key's partials from every map task. Two-stage salting spreads
  * the hot key over `salts` reducers first, then folds the salt out —
  * turning one straggler into `salts` even tasks.
  */
object Skew {

  /** Sum `valueCol` per `key` with `salts`-way salting. The salt derives
    * from spark_partition_id — deterministic for a given layout, and
    * correct regardless: stage 2 re-aggregates exactly.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Generic salted aggregate for any algebraic (partial, merge) pair. */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
