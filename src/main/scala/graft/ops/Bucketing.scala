package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time
  * so every later equi-join/aggregation on the bucket key runs with no
  * exchange at all.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once at ingest: two tables bucketed by
  * the same key into the same bucket count sort-merge-join with zero
  * Exchange nodes (asserted in BucketingSpec), and groupBy on the
  * bucket key skips its exchange too. Bucketed tables require the
  * catalog (`saveAsTable`) — path-only parquet cannot carry bucket
  * metadata.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(!table.contains("."),
      "writeBucketed takes a simple table name in the current database")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an orphaned location (e.g. from a killed run) blocks managed-table
    // creation even after DROP — clear it. The catalog lowercases
    // managed locations; only a local file: warehouse can be probed this
    // way (remote warehouses surface the collision at saveAsTable).
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    if (warehouse.startsWith("file:") || warehouse.startsWith("/")) {
      val loc = new java.io.File(
        warehouse.stripPrefix("file:"), table.toLowerCase(java.util.Locale.ROOT))
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the property bucketing buys.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
