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
    array_distinct(concat(array(s), deletions))
  }

  /** The depth-2 deletion neighborhood: s, every single-character
    * deletion, and every two-character deletion (positions i < j).
    * Quadratic in key LENGTH — ~1 + n + n²/2 variants for an n-char
    * key, ~200 for a 20-char name — which is the price of distance-2
    * blocking and still linear in corpus size. Codegen'd HOFs, no UDF.
    */
  private[ops] def deletionVariants2(s: Column): Column = {
    val dels1 = when(length(s) > 0,
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s)))))
      .otherwise(array().cast("array<string>"))
    val dels2 = when(length(s) >= 2,
      flatten(transform(sequence(lit(1), length(s) - 1), i =>
        transform(sequence(i + lit(1), length(s)), j =>
          concat(
            s.substr(lit(1), i - lit(1)),
            s.substr(i + lit(1), j - i - lit(1)),
            s.substr(j + lit(1), length(s)))))))
      .otherwise(array().cast("array<string>"))
    // one dedup pass over the whole neighborhood (repeated characters
    // make duplicate variants) instead of chained array_unions — same
    // set, roughly half the per-row array work at depth 2
    array_distinct(concat(array(s), dels1, dels2))
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
                        right: DataFrame, rightKey: String): DataFrame =
    editDistanceJoin(left, leftKey, right, rightKey, maxDist = 1)

  /** Generalized fuzzy key join: all (leftKey, rightKey, dist) pairs
    * with levenshtein <= `maxDist`, distinct, nulls dropped.
    *
    * `maxDist` is LIMITED TO 1 or 2 at this API: the deletion-
    * neighborhood guarantee (strings within edit distance d share a
    * depth-d deletion variant) holds for any d, but the neighborhood
    * size grows as n^d per key and variant-sharing between DISTINCT
    * keys grows with it — beyond d=2 the blocking stops pruning and
    * the join degenerates toward the quadratic scan it exists to
    * avoid. Sharing a depth-d variant only bounds the true distance by
    * 2d, so the exact `levenshtein` verify is what keeps the result
    * exact at either depth.
    *
    * `maxBucket` is the skew kill-switch, same contract as the LSH
    * chain's bucket cap (Dedup.candidatePairs): a VARIANT shared by
    * more than `maxBucket` distinct keys on a side is truncated to its
    * first `maxBucket` keys in md5-of-key order (deterministic,
    * key-assignment-independent). Short keys make such variants — ""
    * is in every 1-character key's neighborhood — and one hot variant
    * otherwise costs |l|·|r| candidate rows. The price is RECALL on
    * exactly those degenerate keys (a pair can only be missed if every
    * variant it shares is hot), and the default None stays exact —
    * which is what the oracle gate certifies.
    */
  def editDistanceJoin(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String,
                       maxDist: Int,
                       maxBucket: Option[Int] = None): DataFrame = {
    require(leftKey != rightKey,
      s"output columns collide: alias one side (got '$leftKey' twice)")
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (got $maxDist) — deeper neighborhoods stop blocking")
    // candidates join on 64-bit HASHES of the variants, generated by the
    // native DeletionHashes expression: the blocking only ever needs a
    // variant's IDENTITY, so no variant string materializes anywhere —
    // the HOF chain this replaces (nested transforms + array_distinct +
    // xxhash64 per exploded row) evaluated interpreted per element and
    // was ~90% of the join's wall at depth 2. The shuffle (or broadcast
    // map) moves 8-byte longs instead of key-length strings. Exactness
    // is untouched: a hash collision can only ADD a candidate pair, and
    // every candidate passes the exact levenshtein verify below.
    graft.functions.GraftFunctions.register(left.sparkSession)
    def side(df: DataFrame, key: String): DataFrame = {
      // spread the distinct keys to cluster parallelism BEFORE the
      // neighborhood fan-out: the explode amplifies each key to ~len^d
      // variants (~200× at d=2) and the candidate join + levenshtein
      // verify ride on top, but the distinct keys themselves are tiny,
      // so AQE coalesces the distinct's exchange to one partition and
      // the whole blocked join runs serial (measured at sf0.1: two
      // single-task jobs ≈ 3.1 s CPU on q86). A keyless round-robin
      // REPARTITION_BY_NUM exchange is never AQE-coalesced AND never
      // collapsed as redundant (a keyed repartition on the distinct key
      // is — the child is already hash-partitioned on it); it moves
      // only the distinct keys, once, evenly. Depth-2 only: the d=2
      // neighborhood amplifies ~len²/2 ≈ 200-400× (one advisory-sized
      // partition of keys becomes tens of GB of probe work — always
      // worth one extra skinny exchange), while d=1's ~len× fan-out is
      // modest enough that the exchange's fixed stage latency LOST to
      // the serial tail it removes (measured at sf0.1: q85 0.28 → 0.48 s
      // spread vs q86 1.27 → 0.68 s spread).
      val distinctKeys = df.select(col(key)).where(col(key).isNotNull).distinct()
      val keys =
        if (maxDist >= 2)
          distinctKeys.repartition(df.sparkSession.sparkContext.defaultParallelism)
        else distinctKeys
      val exploded = keys
        .select(col(key),
          explode(graft.functions.GraftFunctions.deletion_hashes(col(key), maxDist)).as("__v"))
      maxBucket match {
        case None => exploded
        case Some(cap) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__v")).orderBy(md5(col(key)), col(key))
          exploded.withColumn("__rk", row_number().over(w))
            .where(col("__rk") <= cap).drop("__rk")
      }
    }
    side(left, leftKey).join(side(right, rightKey), Seq("__v"))
      .select(col(leftKey), col(rightKey))
      .distinct()
      // banded levenshtein: the threshold caps the DP at an O(len·maxDist)
      // diagonal band and returns -1 past it — exact distances at or
      // under maxDist, which is all the filter and output need
      .withColumn("dist",
        levenshtein(col(leftKey), col(rightKey), maxDist).cast("long"))
      .where(col("dist") >= 0)
  }

  /** ROW-CARRYING fuzzy join — the entity-resolution output shape: every
    * (left row, right row) pair whose keys are within `maxDist`, with
    * ALL columns of both rows plus `dist`. The key-pair kernel above
    * dedups each side before blocking, so this adds exactly two hash
    * equi-joins to fan the matched key pairs back out to their rows —
    * the pair set is the small side by construction (distinct fuzzy
    * matches) and the planner broadcasts it when it fits, so neither
    * corpus-sized side moves more than once.
    *
    * Column names must be disjoint across the two inputs (checked) —
    * the output carries both rows side by side.
    */
  def fuzzyJoinRows(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    maxDist: Int = 1): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column collision between sides: ${overlap.mkString(", ")} — alias before joining")
    // `dist` is the reserved output column — an input already carrying
    // it would make the final select ambiguous at analysis time with a
    // far less useful error than this one
    val reserved = (left.columns ++ right.columns).filter(_ == "dist")
    require(reserved.isEmpty,
      "column 'dist' is reserved for the output distance — rename it on the input")
    val pairs = editDistanceJoin(left, leftKey, right, rightKey, maxDist)
    left.join(pairs, Seq(leftKey)).join(right, Seq(rightKey))
      .select((left.columns ++ right.columns).map(col) :+ col("dist"): _*)
  }
}
