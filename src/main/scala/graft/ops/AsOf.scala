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
  * (inclusive): a right row AT the left timestamp is visible to it;
  * a matched right row with a NULL payload yields null (not an older
  * value); right rows with null key or null ts never match, left rows
  * with no prior right row carry null — all per SQL join semantics.
  * Multiple right rows at the same (key, ts) are caller-resolved
  * (pre-aggregate); which one wins is otherwise unspecified, same as
  * the SQL engines.
  */
object AsOf {

  private val reserved = Seq("__k", "__t", "__side", "__l", "__m")

  /** @param rightPayload right column carried to the left rows
    * @param as           output column name for the carried payload
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: String, as: String = "asof"): DataFrame = {
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoin reserves the helper column names ${reserved.mkString(", ")}")
    require(!left.columns.contains(as),
      s"asofJoin output column '$as' collides with a left column")
    val lStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = right.schema(rightPayload).dataType
    // the carried value is a (marker, payload) struct, NEVER null for a
    // right row — last(ignoreNulls) must stop at the matched right row
    // even when its payload is null (skipping it would resurrect an
    // older value where SQL ASOF returns the matched row's null)
    val l = left.select(
      col(key).as("__k"), col(ts).as("__t"), lit(0).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("p", rType)))).as("__m"))
    val r = right
      // SQL join semantics: null keys never match and `ts >= null` is
      // never true — such right rows must not leak payloads through the
      // window (Spark would otherwise group null keys together and sort
      // null ts first)
      .where(col(key).isNotNull && col(ts).isNotNull)
      .select(
        col(key).as("__k"), col(ts).as("__t"), lit(1).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(lit(1).as("m"), col(rightPayload).as("p")).as("__m"))
    // side DESC puts right rows BEFORE left rows at equal ts — the
    // inclusive "at or before" contract
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(col("__l.*"), col("__last").getField("p").as(as))
  }
}
