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

  /** IVF codebook: a hash-ordered sample of `k` stored vectors — the
    * md5-of-id order is deterministic yet independent of id assignment
    * and data order, unlike a lowest-id prefix which inherits whatever
    * structure ids carry — refined by ONE Lloyd step (each seed replaced
    * by the element-wise mean of the vectors assigned to it). One step
    * moves seeds to local density centers, which is what cell ranking
    * needs; full k-means training buys little for a coarse quantizer.
    *
    * Result: (cell, cvec) with `cell` = the seed vector's id. Tiny by
    * construction (k rows) — callers broadcast it. At 100 TB the
    * codebook is trained once and PERSISTED as a table, not recomputed
    * per query; these operators recompute it for self-containment.
    */
  def ivfCodebook(emb: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val seeds = emb
      .orderBy(md5(col(id).cast("string")), col(id))
      .limit(k)
      .select(col(id).as("cell"), col(vec).as("cvec"))
    assignTo(emb, id, vec, seeds)
      .select(col("cell"), posexplode(col(vec)))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("cvec"))
  }

  /** Nearest-cell assignment against a (cell, cvec) codebook; ties break
    * to the lowest cell id for determinism.
    */
  private def assignTo(emb: DataFrame, id: String, vec: String,
                       codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id)).orderBy(col("cell_sim").desc, col("cell"))
    emb.crossJoin(broadcast(codebook))
      .select(col(id), col(vec), col("cell"),
        cosine(col(vec), col("cvec")).as("cell_sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(id), col(vec), col("cell"))
  }

  /** IVF (inverted-file) coarse quantization: every vector is assigned
    * to its most-similar of `k` trained centroids (see ivfCodebook).
    * Shape: broadcast codebook → one argmax pass — no shuffle until a
    * consumer groups by cell.
    */
  def ivfAssign(emb: DataFrame, id: String, vec: String, k: Int): DataFrame =
    assignTo(emb, id, vec, ivfCodebook(emb, id, vec, k))

  /** ANN top-k via IVF: rank cells against the probe vector, scan only
    * the `nprobe` best cells, exact-cosine re-rank inside them. With
    * nprobe = k this degrades gracefully to exact brute force (asserted
    * in OpsSpec); at scale each query touches ~nprobe/k of the data.
    */
  def ivfTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
              topK: Int, cells: Int, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // eager checkpoint: the codebook subtree (full assign pass + Lloyd
    // averaging) feeds three consumers and its float-mean is
    // partition-order-dependent — materializing the k rows ONCE makes
    // every consumer see the same centroids and pays the training cost
    // once per call. Checkpoint blocks are GC'd with the RDD (nothing
    // pinned in the cache manager).
    val codebook = ivfCodebook(emb, id, vec, cells).localCheckpoint()
    val assigned = assignTo(emb, id, vec, codebook)
    val probe = emb.where(col(id) === queryId).select(col(vec).as("qv"))
    // rank only NON-EMPTY cells against the probe: a cell can lose all
    // members after refinement, and an empty cell at the top of the
    // ranking would silently burn nprobe budget
    val activeCells = assigned.select(col("cell")).distinct()
    val probeCells = codebook
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

  /** Per-vector int8 scalar quantization — the 4× storage/bandwidth cut
    * an embedding store takes before ANN indexing: each vector maps to
    * codes round((v-lo)·255/(hi-lo)) against its own [lo, hi] range,
    * plus the range itself for dequantization and the max absolute
    * reconstruction error as the quality signal. Pure per-row array
    * expressions in double (min/max are order-independent; every op is
    * a fixed IEEE expression tree, so any engine reproduces it bit-for-
    * bit) — no shuffle, fully parallel, linear in corpus size. Constant
    * vectors (hi == lo) quantize to code 0 with zero error.
    */
  def quantizeInt8(emb: DataFrame, id: String, vec: String): DataFrame = {
    val x = transform(col(vec), v => v.cast("double"))
    emb
      .select(col(id), x.as("x"))
      .select(col(id), col("x"),
        array_min(col("x")).as("lo"), array_max(col("x")).as("hi"))
      .select(col(id), col("x"), col("lo"), col("hi"),
        transform(col("x"), v =>
          when(col("hi") === col("lo"), lit(0L)).otherwise(
            round((v - col("lo")) * 255.0 / (col("hi") - col("lo"))).cast("long")))
          .as("codes"))
      .select(
        col(id),
        size(col("x")).cast("long").as("n_dims"),
        col("lo"), col("hi"), col("codes"),
        array_max(zip_with(col("x"), col("codes"), (v, q) =>
          abs(v - (col("lo") + q.cast("double") * (col("hi") - col("lo")) / 255.0))))
          .as("max_abs_err"))
  }
}
