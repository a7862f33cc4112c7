package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history and point-in-time
  * snapshots — the temporal-lineage primitives a training-data
  * pipeline needs the moment documents get recrawled: "what did this
  * key look like when the snapshot was taken" is the reproducibility
  * question behind dataset versioning, and the reference engine (an
  * append-only ingest) cannot ask it.
  *
  * Complements [[AsOf]]: as-of JOINS two event streams; scd2
  * materializes ONE change log into validity intervals that any number
  * of point-in-time queries then hit with a plain filter — pay the
  * window once, snapshot for free.
  */
object Temporal {

  /** SCD Type-2 interval materialization: a change log — one row per
    * (key, ts) carrying that version's attributes — becomes history
    * rows with HALF-OPEN validity `[valid_from, valid_to)`; the
    * current version has `valid_to` null. `(key, ts)` must be unique
    * (pre-aggregate collisions; a change log with two truths at one
    * instant has no deterministic history).
    *
    * Scale shape: one shuffle on the key and a per-key window sort —
    * partitions are single-key version chains (bounded by a key's
    * change count), so there is no global sort and no hot-partition
    * funnel short of one key changing pathologically often.
    */
  def scd2(log: DataFrame, key: String, ts: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    log
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .drop(ts)
  }

  /** Point-in-time snapshot over an [[scd2]] history: the version valid
    * AT instant `at` for every key that existed then (a version
    * starting exactly at `at` is visible — half-open semantics). Keys
    * whose first version begins after `at` are absent. Pure filter —
    * no join, no window; `valid_from` stays as provenance.
    */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history
      .where(col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
      .drop("valid_to")
}
