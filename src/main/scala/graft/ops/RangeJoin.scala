package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: every point row paired with every
  * range row whose [lo, hi] contains it. Spark plans the naive
  * `ON p BETWEEN lo AND hi` as a broadcast-nested-loop or cartesian —
  * O(|points|·|ranges|) comparisons regardless of selectivity.
  *
  * The scale path is binning: ranges REPLICATE to each fixed-width
  * bucket they overlap, points hash to their single bucket, and a plain
  * bucket equi-join + residual BETWEEN evaluates only co-bucketed
  * candidates. A containing range shares exactly one bucket with the
  * point (the point's own), so each qualifying pair emerges exactly
  * once — no dedup pass. Cost: |ranges| × (span/binWidth) replicated
  * rows and a hash join, instead of the full cross product; pick
  * binWidth near the median range span so replication stays O(1) per
  * range.
  */
object RangeJoin {

  /** Inner containment join. Column names must not collide between the
    * two sides (standard join hygiene — select/alias first).
    */
  def binned(points: DataFrame, ranges: DataFrame, pointCol: String,
             loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!(points.columns ++ ranges.columns).contains("__bin"),
      "binned reserves the helper column name __bin")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val r = ranges.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
