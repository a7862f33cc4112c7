package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/dbt-tests shape): a
  * rule set evaluated against a table, one result row per rule with
  * its violation count — the admission gate an ingest pipeline runs
  * before data reaches the lake.
  *
  * Scale shape: every row-level predicate folds into ONE shared
  * aggregation pass over the table (a `sum(when(!cond))` per rule —
  * no per-rule scans); uniqueness is a partial-aggregated groupBy on
  * the key; referential integrity is a left-anti count against the
  * dimension, broadcast when the dimension is small. Nothing collects
  * to the driver; the result is rules-many rows.
  */
object Validation {

  sealed trait Rule { def name: String }

  /** Row-level invariant: rows where `cond` is false (or null) violate. */
  final case class Predicate(name: String, cond: Column) extends Rule

  /** Key uniqueness: every duplicated occurrence beyond the first
    * counts as a violation (so n_violations = n_rows - n_distinct_keys).
    *
    * Null-key semantics (pinned): keys compare with NULL-SAFE tuple
    * equality — SQL's IS NOT DISTINCT FROM — so rows whose key columns
    * are (partially) null form real key groups and a second all-null
    * key counts as a violation, exactly what `count_distinct(struct)`
    * computes. This deliberately differs from bare SQL
    * `count(DISTINCT col)`, which silently DROPS null keys and would
    * report a table of all-null keys as perfectly unique. The
    * cross-engine mirror is `count(DISTINCT ROW(cols...))` (the row
    * constructor is never null, so nothing drops).
    */
  final case class Unique(name: String, cols: Seq[String]) extends Rule

  /** Referential integrity: rows whose key has no match in `dim`
    * violate. Null keys violate too — an FK that is null is not a
    * match, matching SQL's NOT IN intuition rather than its
    * three-valued surprise.
    */
  final case class ForeignKey(name: String, cols: Seq[String],
                              dim: DataFrame, dimCols: Seq[String]) extends Rule

  /** Evaluate `rules` against `df`: (rule, n_checked, n_violations),
    * in the given rule order.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique")
    val predicates = rules.collect { case p: Predicate => p }
    // one pass for every predicate rule + the shared row count;
    // violation columns are aliased by POSITION, not rule name — a
    // name with dots/backticks must not break column resolution
    val predIdx = predicates.zipWithIndex.toMap
    val predAgg =
      if (predicates.isEmpty) None
      else Some(df.agg(
        count(lit(1)).as("__n"),
        predicates.zipWithIndex.map { case (p, i) =>
          sum(when(coalesce(p.cond, lit(false)), 0L).otherwise(1L))
            .as(s"__v_$i")
        }: _*))
    val spark = df.sparkSession
    import spark.implicits._
    val results: Seq[DataFrame] = rules.map {
      case p: Predicate =>
        predAgg.get.select(lit(p.name).as("rule"),
          col("__n").as("n_checked"),
          coalesce(col(s"__v_${predIdx(p)}"), lit(0L)).as("n_violations"))
      case u: Unique =>
        df.agg(count(lit(1)).as("__n"),
          count_distinct(struct(u.cols.map(col): _*)).as("__d"))
          .select(lit(u.name).as("rule"), col("__n").as("n_checked"),
            (col("__n") - col("__d")).as("n_violations"))
      case f: ForeignKey =>
        val dimKeys = f.dim.select(
          f.dimCols.zip(f.cols).map { case (d, c) => col(d).as(c) }: _*).distinct()
        val orphans = df.select(f.cols.map(col): _*)
          .join(dimKeys, f.cols, "left_anti")
        df.agg(count(lit(1)).as("__n")).crossJoin(
          orphans.agg(count(lit(1)).as("__v")))
          .select(lit(f.name).as("rule"), col("__n").as("n_checked"),
            col("__v").as("n_violations"))
    }
    results.reduce(_.unionAll(_))
  }
}
