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

  /** IVF (inverted-file) coarse quantization: every vector is assigned
    * to its most-similar of `k` centroids. The codebook here is the `k`
    * lowest-id vectors — a deterministic stand-in for a trained k-means
    * codebook; the operator shape (broadcast codebook → one argmax pass
    * → shuffle on cell id) is identical with real centroids.
    */
  def ivfAssign(emb: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val cents = emb.orderBy(col(id)).limit(k)
      .select(col(id).as("cent_id"), col(vec).as("cvec"))
    val w = Window.partitionBy(col(id)).orderBy(col("cell_sim").desc, col("cent_id"))
    emb.crossJoin(broadcast(cents))
      .select(col(id), col(vec), col("cent_id"),
        cosine(col(vec), col("cvec")).as("cell_sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(id), col(vec), col("cent_id").as("cell"))
  }

  /** ANN top-k via IVF: rank cells against the probe vector, scan only
    * the `nprobe` best cells, exact-cosine re-rank inside them. With
    * nprobe = k this degrades gracefully to exact brute force (asserted
    * in OpsSpec); at scale each query touches ~nprobe/k of the data.
    */
  def ivfTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
              topK: Int, cells: Int, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val assigned = ivfAssign(emb, id, vec, cells)
    val probe = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    // rank only NON-EMPTY cells against the probe: duplicate codebook
    // vectors leave their cells empty (ties assign to the lowest id),
    // and an empty cell at the top of the ranking would silently burn
    // nprobe budget
    val activeCells = assigned.select(col("cell")).distinct()
    val probeCells = emb.orderBy(col(id)).limit(cells)
      .select(col(id).as("cell"), col(vec).as("cvec"))
      .join(activeCells, Seq("cell"), "left_semi")
      .crossJoin(broadcast(probe))
      .select(col("cell"), cosine(col("cvec"), col("qv")).as("cell_sim"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
    assigned
      .join(broadcast(probeCells.select(col("cell"))), Seq("cell"))
      .where(col(id) =!= queryId)
      .crossJoin(broadcast(probe))
      .select(col(id), round(cosine(col(vec), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(id))
      .limit(topK)
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
