package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy-key (edit-distance) joins — entity resolution across tables
  * whose keys differ by a typo: record linkage on names/titles/SKUs,
  * near-duplicate key discovery inside one table. The reference engine
  * has no fuzzy matching; a training-data pipeline needs it the moment
  * two source catalogs disagree on a key by one character.
  *
  * The naive formulation is a cross join with a `levenshtein` filter —
  * O(n·m) comparisons, impossible at scale, and exactly what the
  * DuckDB oracle runs (on gate-sized inputs) to certify this plan. The
  * scalable plan is DELETION-NEIGHBORHOOD BLOCKING (the SymSpell
  * dictionary trick, public domain): two strings within edit
  * distance 1 — one insertion, deletion, or substitution — MUST share
  * a member of each other's deletion neighborhood (the string itself
  * plus every single-character deletion, length+1 variants). So:
  * explode both sides' neighborhoods (linear blowup in key length),
  * hash-join on the variant, then confirm candidates with an exact
  * `levenshtein` — sharing a variant only bounds the distance by 2, so
  * the verify is what makes the result exact.
  */
object FuzzyJoin {

  /** The deletion neighborhood of `s`: s plus each single-character
    * deletion. Codegen'd HOF — no UDF.
    */
  private[ops] def deletionVariants(s: Column): Column = {
    val deletions = when(length(s) > 0,
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s)))))
      .otherwise(array().cast("array<string>"))
    array_union(array(s), deletions)
  }

  /** All (leftKey, rightKey, dist) pairs with levenshtein <= 1 between
    * the two tables' key columns, distinct, nulls dropped. `leftKey`
    * and `rightKey` name the OUTPUT columns too, so they must differ —
    * alias before calling for a self-join.
    *
    * Scale shape: each side explodes to (variants = len+1) rows per
    * distinct key — linear in key bytes — and the candidate join is
    * one hash shuffle on the variant. Skew guard comes free from the
    * distinct on each side (a key appearing a billion times still
    * contributes one neighborhood); a pathological VARIANT shared by
    * many distinct keys (very short keys) is the documented limit —
    * block on longer keys or pre-partition by length there.
    */
  def editDistance1Join(left: DataFrame, leftKey: String,
                        right: DataFrame, rightKey: String): DataFrame = {
    require(leftKey != rightKey,
      s"output columns collide: alias one side (got '$leftKey' twice)")
    val l = left.select(col(leftKey)).where(col(leftKey).isNotNull).distinct()
      .select(col(leftKey), explode(deletionVariants(col(leftKey))).as("__v"))
    val r = right.select(col(rightKey)).where(col(rightKey).isNotNull).distinct()
      .select(col(rightKey), explode(deletionVariants(col(rightKey))).as("__v"))
    l.join(r, Seq("__v"))
      .select(col(leftKey), col(rightKey))
      .distinct()
      .withColumn("dist", levenshtein(col(leftKey), col(rightKey)).cast("long"))
      .where(col("dist") <= 1)
  }
}
