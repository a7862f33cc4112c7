package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — "the most recent right-side value at or before each
  * left row's timestamp", the time-series primitive training-data and
  * feature pipelines keep reinventing (latest model score per user at
  * event time, last checkpoint before a sample, …).
  *
  * Spark has no built-in; the naive formulation
  * `l JOIN r ON l.key = r.key AND l.ts >= r.ts` + argmax explodes to
  * the full per-key cross product before pruning. This implementation
  * is a tag + union + ONE window pass: both sides shuffle once on the
  * key, sort by (ts, side), and `last(ignoreNulls)` carries the latest
  * right payload forward into each left row — O(n log n) per key
  * group, zero row expansion, AQE-splittable like any window. That is
  * the shape that survives 100 TB; a broadcast-range variant only ever
  * helps when the right side is tiny.
  *
  * Tie semantics match DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`
  * (inclusive): a right row AT the left timestamp is visible to it.
  * Rows are left-join semantics — left rows with no prior right row
  * carry null. Multiple right rows at the same (key, ts) are
  * caller-resolved (pre-aggregate); which one wins is otherwise
  * unspecified, same as the SQL engines.
  */
object AsOf {

  /** @param rightPayload right column carried to the left rows
    * @param as           output column name for the carried payload
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: String, as: String = "asof"): DataFrame = {
    val lStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = right.schema(rightPayload).dataType
    val l = left.select(
      col(key).as("__k"), col(ts).as("__t"), lit(0).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__rp"))
    val r = right.select(
      col(key).as("__k"), col(ts).as("__t"), lit(1).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      col(rightPayload).as("__rp"))
    // side DESC puts right rows BEFORE left rows at equal ts — the
    // inclusive "at or before" contract
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn(as, last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(col("__l.*"), col(as))
  }
}
