package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: co-locate rows that are close in SEVERAL
  * dimensions at once, so per-file [min, max] stats prune files for
  * predicates on ANY clustered column — the multi-column answer to the
  * one-column `repartitionByRange` clustering the lake writers already
  * do. Lexicographic range clustering on (a, b) gives perfect skipping
  * on `a` and nearly none on `b` (every file spans the full `b` range);
  * interleaving the bit patterns of both columns' rank buckets gives
  * good (≈ sqrt-partitioned) ranges on each dimension, which is what
  * Delta's OPTIMIZE ZORDER BY and the z-curve literature exist for.
  *
  * Mechanism, all existing Spark machinery, executed in two steps:
  *   1. ONE `percentile_approx` aggregation computes 2^bits-quantile
  *      boundaries per clustered column over the batch (rank-normalizing
  *      skewed distributions — raw values would waste the curve on
  *      outliers);
  *   2. each row's per-column bucket (a broadcast-literal `aggregate`
  *      fold counting boundaries ≤ value) is bit-interleaved into one
  *      LONG z-value with `shiftleft`/`bitwiseOR`, and the batch is
  *      `repartitionByRange(zvalue)` + `sortWithinPartitions(zvalue)` —
  *      contiguous z-curve segments per file, codegen throughout, no
  *      UDF, no extra shuffle beyond the one any clustered write pays.
  *
  * Numeric/date/timestamp columns only (ranks need an ordered cast to
  * double); nulls take bucket 0 (sort first, never lost). The z-value
  * is a TRANSIENT layout key — dropped after the repartition, never
  * written — so readers and oracles see identical content, and the
  * effect is observable only through file-level stats pruning (spec'd
  * as strictly-fewer-files on BOTH dimensions vs lexicographic).
  */
object ZOrder {

  /** Per-column quantile boundaries (2^bits - 1 values each), one
    * aggregation job over `df`. Accuracy 10k is percentile_approx's
    * default; boundaries are layout hints, not semantics, so approx is
    * exactly right here.
    */
  private def boundaries(df: DataFrame, cols: Seq[String],
                         bits: Int): Seq[(String, Seq[Double])] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits))
    val aggs = cols.map(c =>
      percentile_approx(asDouble(df, c), typedlit(probs), lit(10000)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      // an all-null column yields a null boundary array -> empty bounds
      // (every row buckets to 0; the dimension degenerates harmlessly)
      c -> Option(row.getSeq[Double](i)).getOrElse(Seq.empty)
    }
  }

  /** An orderable cast to double for ranking. Dates/timestamps go
    * through their numeric epoch forms; anything non-numeric is a loud
    * failure (z-order needs an ordered embedding, and silently hashing
    * strings would LOOK clustered while pruning nothing).
    */
  private def asDouble(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case DateType => col(c).cast("int").cast("double")
      case TimestampType => unix_micros(col(c)).cast("double")
      case TimestampNTZType => unix_micros(col(c).cast("timestamp")).cast("double")
      case dt => throw new IllegalArgumentException(
        s"z-order column $c has unordered-castable type ${dt.catalogString} — " +
          "numeric, date, and timestamp columns only")
    }
  }

  /** Bucket id (0 .. 2^bits - 1) of `c` against broadcast-literal
    * boundaries: the count of boundaries ≤ value, a codegen'd
    * `aggregate` fold over ≤255 literals. Null -> 0.
    */
  private def bucket(df: DataFrame, c: String, bounds: Seq[Double]): Column =
    if (bounds.isEmpty) lit(0L)
    else {
      val v = asDouble(df, c)
      val counted = aggregate(typedlit(bounds), lit(0L),
        (acc, b) => acc + when(v >= b, 1L).otherwise(0L))
      when(v.isNull, 0L).otherwise(counted)
    }

  /** The interleaved z-value column for `cols` at `bits` bits per
    * dimension (cols.size * bits ≤ 63 so the curve fits one signed
    * long). Exposed for callers that want the key itself (e.g. to
    * range-bucket by z across batches); most callers want [[cluster]].
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.size >= 2,
      "z-order needs at least two columns (one column is plain range clustering)")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits overflows a signed long")
    val bs = boundaries(df, cols, bits)
    val buckets = bs.map { case (c, b) => bucket(df, c, b) }
    // bit i of column j lands at position i * m + j: low-order bits of
    // every dimension interleave first, which is what makes close-in-
    // all-dimensions rows close on the curve
    val m = cols.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * m + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** `df` re-laid-out along the z-curve of `cols` into `numFiles`
    * contiguous segments (write it with one file per partition — e.g.
    * through ManifestLake.compact's clusterBy seam or a direct
    * partitioned write). Content is untouched; only row placement
    * changes.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bits: Int = 8): DataFrame = {
    require(numFiles > 0, s"need numFiles > 0, got $numFiles")
    // collision-free transient key: withColumn REPLACES an existing
    // column of the same name, so a user table that happens to contain
    // __zvalue would lose that column's data — violating the layout-only
    // invariant. Suffix until unused.
    val zCol = Iterator.from(0).map {
      case 0 => "__zvalue"
      case i => s"__zvalue_$i"
    }.find(n => !df.columns.contains(n)).get
    val z = zvalue(df, cols, bits)
    df.withColumn(zCol, z)
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }
}
