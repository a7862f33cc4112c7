package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute force — exact, O(n²) pairs / O(n) per query; the correctness
  *    baseline and fine up to ~10⁴ vectors per partition-pair;
  *  - hyperplane-LSH bucketing — the 100 TB path: vectors shuffle once
  *    on a `planes`-bit sign sketch, candidate pairs form only within a
  *    bucket (collision probability (1-θ/π)^planes for angle θ), then
  *    exact cosine re-ranks. An IVF variant (k-means coarse quantizer)
  *    would slot in the same shape: assign → shuffle on centroid id →
  *    local scan.
  */
object Similarity {

  import VectorOps._

  /** All pairs (a < b) with cosine >= minCos, exact. The cross join is
    * intentional and documented as the small-n baseline; use lshPairs at
    * scale.
    */
  def bruteForcePairs(emb: DataFrame, id: String, vec: String,
                      minCos: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col(id).as("vec_a"), col(vec).as("va"))
    val b = emb.select(col(id).as("vec_b"), col(vec).as("vb"))
    a.crossJoin(b)
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }

  /** Exact top-k nearest neighbours of one stored vector, brute force.
    * The probe vector travels as a broadcast (no driver collect), so the
    * scan stays a single distributed pass.
    */
  def topK(emb: DataFrame, id: String, vec: String, queryId: Long,
           k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val probe = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    emb.where(col(id) =!= queryId)
      .crossJoin(broadcast(probe))
      .select(col(id),
        round(cosine(col(vec), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(id))
      .limit(k)
  }

  /** Near-neighbour pairs via sign-LSH buckets + exact re-rank. */
  def lshPairs(emb: DataFrame, id: String, vec: String, planes: Int,
               minCos: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val sk = emb.select(col(id), col(vec),
      hyperplaneSketch(col(vec), planes).as("bucket"))
    val a = sk.select(col("bucket"), col(id).as("vec_a"), col(vec).as("va"))
    val b = sk.select(col("bucket"), col(id).as("vec_b"), col(vec).as("vb"))
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
      .distinct()
  }
}
