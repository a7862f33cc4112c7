package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact (hash groupBy), MinHash+LSH (shingle → K min-hashes
  * → banded bucket self-join), exact n-gram Jaccard verification, and
  * SimHash sketches.
  *
  * Scale design: every stage is a hash shuffle on bounded keys — shingle
  * explosion is linear in corpus bytes; the LSH band join only pairs
  * documents sharing a band bucket, avoiding the O(n²) all-pairs
  * comparison entirely. Skewed buckets (boilerplate shingles) should be
  * capped at the caller (drop buckets with > maxBucket docs) — at 100 TB
  * a single viral page must not create a quadratic bucket.
  */
object Dedup {

  /** Exact duplicate groups by content hash; survivor = min(id) for
    * determinism (contrast dropDuplicates' arbitrary survivor).
    */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(id)).as("keep_id"))

  /** The min-id row per content hash: a HASH aggregation over (hash →
    * min id) ONLY, then a semi-join pulling the survivor rows back.
    * The min_by(struct(allCols)) formulation this replaces carried the
    * full row (text included) through the aggregation buffers, and a
    * struct buffer is not hash-agg mutable, so it planned as a
    * SortAggregate — full-text rows SORTED on both sides of the
    * exchange (measured: the (4)-(8) subtree in
    * plans/r22/q36_dedup_corpus_before.txt), a spill magnet at corpus
    * scale. Here the aggregation shuffles 24-byte (md5, id) pairs with
    * map-side combine and no sort anywhere; the survivor-id list is
    * ids-only, and the one exchange that carries full rows (the
    * semi-join probe, hash-partitioned on the unique id) moves them
    * once, unsorted. Ids are unique, so "row whose id is the group
    * min" selects exactly the min_by row.
    */
  private def exactSurvivorRows(docs: DataFrame, id: String, text: String): DataFrame = {
    val keep = docs.groupBy(md5(col(text)).as("__h"))
      .agg(min(col(id)).as("__keep"))
      .select(col("__keep").as(id))
    docs.join(keep, Seq(id), "left_semi")
  }

  /** One row per document with its DISTINCT shingle array — the
    * zero-shuffle form of the shingle set: dedup happens per row
    * (array_distinct), not via a cluster-wide distinct. A doc's array
    * is bounded by its text length, so row width stays small at any
    * corpus scale.
    */
  def shingleArrays(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(id),
      array_distinct(TextOps.charShingles(col(text), n)).as("shs"))
  }

  /** Distinct (id, shingle) pairs — the input of both MinHash and exact
    * Jaccard. Derived by exploding the per-doc distinct arrays: same
    * rows a global .distinct() would produce (ids differ across docs,
    * so cross-doc duplicates were never merged anyway) WITHOUT the
    * multi-million-row distinct shuffle.
    */
  def shingleSet(docs: DataFrame, id: String, text: String, n: Int): DataFrame =
    shingleArrays(docs, id, text, n)
      .select(col(id), explode(col("shs")).as("sh"))

  /** Per-doc distinct shingle sets in HASHED form: each shingle mapped
    * to its 64-bit xxhash64 before the per-row distinct. This is the
    * representation Jaccard verification wants at scale — set
    * cardinalities (and hence Jaccard) survive the hashing with
    * collision probability ~|shingles|²/2⁶⁴ per doc (≈1e-15 for
    * real documents; Broder's original shingling hashes shingles to
    * fixed-width tokens for exactly this reason), while the rows the
    * verification joins shuffle are ~3× smaller than string arrays and
    * array_intersect compares primitives instead of UTF8 strings. The
    * distinct itself also dedups longs, not strings.
    */
  def shingleHashArrays(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // sorted ascending at BUILD time (once per doc) so the verify can
    // count intersections with an allocation-free merge
    // (sorted_intersect_count) instead of a per-pair hash set — the
    // sort changes only the internal array ORDER, never the set
    docs.select(col(id),
      array_sort(
        array_distinct(transform(TextOps.charShingles(col(text), n), s => xxhash64(s))))
        .as("shl"))
  }

  /** K-permutation MinHash signature, one row per document. Each
    * "permutation" is the min over shingles of
    * (a_k·h1 + b_k·h2 + c_k) mod 2^61-1 where h1/h2 are two 60-bit md5
    * bases of the shingle — ONE digest per distinct (doc, shingle), K
    * integer mixes, all BIGINT/INT128-reproducible in any engine (see
    * graft.functions.Minhash for the contract). One
    * shuffle (groupBy id) computes all K mins via partial aggregation;
    * the fused native expression (MinhashMixes) avoids K digest trees
    * and all hex-string materialization on the hot path.
    */
  def minhashSignature(shingles: DataFrame, id: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(shingles.sparkSession)
    shingles
      .select(col(id),
        graft.functions.GraftFunctions.minhash_mixes(col("sh"), k).as("__hs"))
      .groupBy(col(id))
      .agg(
        min(element_at(col("__hs"), 1)).as("h0"),
        (1 until k).map(i =>
          min(element_at(col("__hs"), i + 1)).as(s"h$i")): _*)
  }

  /** Signature straight from documents, skipping the distinct shuffle:
    * min() is idempotent over repeated shingles, so explode → mix →
    * min-aggregate equals minhashSignature(shingleSet(...)) exactly
    * (spec-asserted) while shuffling only the map-side partial minima
    * (K longs per doc per partition) instead of millions of distinct
    * (doc, shingle) rows. Use when the shingle set is NOT also needed
    * downstream (signature-only pipelines); when Jaccard verification
    * follows, build shingleSet once and share it.
    */
  def minhashSignatureDirect(docs: DataFrame, id: String, text: String,
                             n: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    minhashSignature(
      docs.select(col(id), explode(TextOps.charShingles(col(text), n)).as("sh")),
      id, k)
  }

  /** LSH banding: signature split into bands of `r` hashes; band key =
    * the band slice joined as a delimited string (plain equality key —
    * hashing it again would buy nothing). Docs sharing any band key are
    * candidate duplicates.
    *
    * One explode, not a k/r-way union: the union form scans the
    * signature relation once PER BAND (4 scans at k=8, r=2 — cache
    * reads when persisted, full recomputes when not), while the
    * explode emits all bands in a single pass and keeps the band
    * fan-out inside one codegen stage.
    */
  def lshBands(sig: DataFrame, id: String, k: Int, r: Int): DataFrame = {
    require(k % r == 0, s"k=$k must be divisible by band size r=$r")
    val bandStructs = (0 until k / r).map { b =>
      struct(
        lit(b.toLong).as("band"),
        concat_ws("|",
          (b * r until (b + 1) * r).map(i => col(s"h$i").cast("string")): _*)
          .as("band_hash"))
    }
    sig.select(col(id), explode(array(bandStructs: _*)).as("__b"))
      .select(col(id), col("__b.band").as("band"), col("__b.band_hash").as("band_hash"))
  }

  /** Candidate pairs (a < b) from band-bucket collisions. The self-join
    * shuffles on (band, band_hash) — each bucket pairs locally.
    *
    * `maxBucket` is the 100 TB safety valve: a band bucket with B docs
    * produces B² pairs, so one boilerplate shingle pattern (a viral
    * page, a template) can go quadratic. Buckets over the cap degrade
    * to a CHAIN — consecutive pairs in id order, O(B) edges — instead
    * of being dropped outright: a cluster of near-identical documents
    * collides in EVERY band, so a flat drop would lose the whole
    * cluster, while the chain keeps it connected for greedy and
    * transitive dedup at linear cost. None (default) keeps exact LSH
    * semantics.
    */
  def candidatePairs(bands: DataFrame, id: String,
                     maxBucket: Option[Int] = None): DataFrame = {
    val full = maxBucket match {
      case Some(cap) =>
        // ONE window pass over ONE shuffle on (band, band_hash), NO
        // self-join and NO union: each row carries its bucket size and
        // the ≤cap member ids FOLLOWING it in id order (a cap-bounded
        // frame, so a viral bucket can never blow up the per-row
        // state), and a single projection explodes either every
        // follower (under-cap bucket → all a<b pairs, each emitted
        // once by its lower member) or just the first follower
        // (over-cap bucket → the O(B) consecutive chain). The previous
        // shape self-joined the windowed bands relying on exchange
        // reuse that AQE did not actually deliver — the band shuffle
        // materialized 3× (measured at sf0.1, ShuffleQueryStages 5/6/7
        // in the q22 final plan) plus a broadcast build of one join
        // side; a union of filtered branches still materialized it 2×.
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash")).orderBy(col(id))
        bands
          .withColumn("__bsz", count(lit(1)).over(
            byBucket.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing)))
          .withColumn("__nxts", collect_list(col(id)).over(byBucket.rowsBetween(1, cap)))
          .select(
            col(id).as("doc_a"),
            explode(when(col("__bsz") <= cap, col("__nxts"))
              .otherwise(slice(col("__nxts"), 1, 1))).as("doc_b"))
          // correctness rests on id uniqueness within a (band, band_hash)
          // bucket — guaranteed by lshBands output, but the public
          // `bands` parameter carries no such contract, and a duplicate
          // (band, band_hash, id) row would emit a self-pair the old
          // self-join's a<b filter dropped. Cheap codegen'd guard.
          .where(col("doc_a") =!= col("doc_b"))
      case None =>
        bands.select(col("band"), col("band_hash"), col(id).as("doc_a"))
          .join(
            bands.select(col("band"), col("band_hash"), col(id).as("doc_b")),
            Seq("band", "band_hash"))
          .where(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"))
    }
    full.distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: each side's shingle SET
    * rides as one array row, |A∩B| = size(array_intersect), |A∪B| =
    * |A|+|B|-|A∩B|. Two joins against the compact per-doc array table
    * replace the exploded shingle equi-join, whose intermediate was
    * |cand| × avg-shingles rows (tens of millions at sf0.1) — the
    * per-row set intersection does the same work with no shuffle of it.
    * A doc's shingle array is bounded by its text length, so per-row
    * memory stays small at any corpus scale. Returns pairs with
    * jaccard >= minJaccard (rounded to 4 dp — integer counts divided in
    * double, identical in any engine).
    */
  def jaccardVerify(cand: DataFrame, shingles: DataFrame, id: String,
                    minJaccard: Double): DataFrame =
    jaccardVerifySets(cand,
      shingles.groupBy(col(id)).agg(collect_set(col("sh")).as("shs")),
      id, minJaccard)

  /** jaccardVerify over precomputed per-doc distinct shingle ARRAYS
    * (see shingleArrays) — skips re-folding exploded rows back into
    * sets when the caller already has them. The string arrays are
    * mapped to 64-bit hashes BEFORE the joins (map-side, pre-shuffle):
    * Jaccard only needs cardinalities, which hashing preserves (see
    * shingleHashArrays), and the two verification joins then shuffle
    * skinny long arrays instead of the full shingle text.
    */
  def jaccardVerifySets(cand: DataFrame, sets: DataFrame, id: String,
                        minJaccard: Double): DataFrame =
    jaccardVerifyHashed(cand,
      sets.select(col(id),
        // distinct + sorted: jaccardVerifyHashed's merge-count contract
        // (shs is a set of strings, but two strings could hash equal)
        array_sort(array_distinct(transform(col("shs"), s => xxhash64(s)))).as("shl")),
      id, minJaccard)

  /** Jaccard verification over per-doc HASHED shingle sets (see
    * shingleHashArrays): |A∩B| by allocation-free merge over the
    * SORTED long arrays (sorted_intersect_count — numerically equal to
    * size(array_intersect) on distinct inputs, without building a hash
    * set + intersection array per pair: the optimizer pushes the two
    * predicates into the join condition and evaluates the intersection
    * up to 4× per candidate, so its per-evaluation cost is what the
    * verify stage pays). |A∪B| = |A|+|B|-|A∩B|. Two joins against the
    * compact per-doc array table; a doc's array is bounded by its text
    * length, so per-row memory stays small at any corpus scale.
    */
  def jaccardVerifyHashed(cand: DataFrame, hsets: DataFrame, id: String,
                          minJaccard: Double): DataFrame = {
    graft.functions.GraftFunctions.register(cand.sparkSession)
    val jac = round(
      col("__inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("__inter")).cast("double"), 4)
    cand
      .join(hsets.select(col(id).as("doc_a"), col("shl").as("sa")), Seq("doc_a"))
      .join(hsets.select(col(id).as("doc_b"), col("shl").as("sb")), Seq("doc_b"))
      .withColumn("__inter",
        graft.functions.GraftFunctions.sorted_intersect_count(col("sa"), col("sb")))
      // pairs must SHARE a shingle — the structural contract the old
      // shingle equi-join gave for free; without it, minJaccard <= 0
      // would emit every disjoint LSH candidate as (a, b, 0.0)
      .where(col("__inter") > 0)
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** End-to-end near-duplicate removal — the operation a training-data
    * pipeline actually runs: exact dups collapse by content hash, then
    * MinHash+LSH candidates verified by exact Jaccard mark near-dups.
    * Drop policy: a document is dropped iff it is the HIGHER-id member
    * of ANY verified near-dup pair — deterministic, one pass, no
    * transitive-closure iteration. Note the chain consequence: for
    * A~B~C with A≁C, both B and C drop (C pairs with B even though B
    * itself drops); a connected-components pass would keep C at the
    * cost of iterative joins.
    *
    * `maxBucket` plumbs the LSH bucket cap through (see
    * candidatePairs) — the guard a 100 TB corpus needs against
    * boilerplate-driven quadratic buckets.
    *
    * ==Caching contract==
    * Nothing stays cached after the call. The reused intermediates
    * (exact survivors, hashed shingle sets, signatures — each feeding
    * 2-8 plan branches) are persisted only while the DROP-ID LIST is
    * computed: that list is ids-only (orders of magnitude smaller than
    * the corpus), so it is materialized eagerly via localCheckpoint
    * while the caches are hot, then every intermediate is unpersisted
    * before returning — a long-lived ingest session calling this per
    * batch accretes nothing (the checkpoint blocks are
    * reference-tracked and GC'd when the returned plan is dropped).
    * The price is one recompute of the exact-survivor aggregation when
    * the caller's action runs the final anti-join — one scan + one
    * hash shuffle, the right trade against pinning corpus-sized caches
    * across an unbounded session. The shingle text is likewise scanned
    * twice (signature via the direct path, verification via the hashed
    * sets) — recomputing the cheap codegen'd shingle expression beats
    * persisting the full shingle-string arrays, which at corpus scale
    * is a multiple of the corpus itself in cache.
    */
  def deduplicate(docs: DataFrame, id: String, text: String,
                  n: Int = 8, k: Int = 8, r: Int = 2,
                  minJaccard: Double = 0.5,
                  maxBucket: Option[Int] = None): DataFrame = {
    val exactSurvivors = exactSurvivorRows(docs, id, text).persist()
    val hsets = shingleHashArrays(exactSurvivors, id, text, n).persist()
    val sig = minhashSignatureDirect(exactSurvivors, id, text, n, k).persist()
    val cand = candidatePairs(lshBands(sig, id, k, r), id, maxBucket)
    // eager: one job computes the small drop list through the hot caches
    val nearDups = jaccardVerifyHashed(cand, hsets, id, minJaccard)
      .select(col("doc_b").as(id)).distinct()
      .localCheckpoint()
    sig.unpersist(); hsets.unpersist(); exactSurvivors.unpersist()
    exactSurvivors.join(nearDups, Seq(id), "left_anti")
  }

  /** Duplicate-cluster assignment via connected components over the
    * verified near-dup pair graph: every document maps to the MINIMUM
    * id reachable through near-dup edges (so chains A~B~C cluster
    * together even when A≁C directly — the transitive semantics
    * `deduplicate`'s greedy policy trades away).
    *
    * Algorithm: min-label propagation WITH pointer jumping — each round
    * every node adopts the least of (its label, its neighbours' labels,
    * its label's label). The grandparent hop halves label-forest depth
    * per round, so convergence is O(log diameter) rounds, not
    * O(diameter) — a 10,000-link chain settles in ~15 rounds
    * (spec-asserted) where plain propagation would need 10,000.
    *
    * Each round is two joins + ONE action: the convergence probe rides
    * the same aggregate that materializes the round's labels (no
    * separate join + count pass). Lineage is truncated by an eager
    * localCheckpoint every `checkpointInterval` rounds — without it the
    * plan doubles per round and the driver's analysis/codegen time,
    * not the data, becomes the bottleneck at scale.
    *
    * Returns (id, cluster) for every id appearing in `pairs`; documents
    * with no near-dup edge are their own cluster and are absent.
    */
  /** Rounds the LAST [[duplicateClusters]] call took to converge —
    * deterministic for a given pair graph (the loop is pure label math
    * over a fixed edge set), exposed so specs can PIN the round count:
    * a regression that grew rounds would otherwise masquerade as
    * environment noise in wall-clock benchmarks (the q62 watch item —
    * at toy SF the wall is rounds × fixed job latency, so the round
    * count IS the plan-health signal, not the seconds).
    */
  @volatile private[graft] var lastClusterRounds: Int = -1

  def duplicateClusters(pairs: DataFrame, maxIterations: Int = 40,
                        checkpointInterval: Int = 5): DataFrame = {
    // symmetrize via ONE scan + explode — a unionAll of pairs with its
    // swap would run the (expensive) upstream pair-producing plan twice
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a"), col("doc_b")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("__e"))
      .select(col("__e.doc_a").as("doc_a"), col("__e.doc_b").as("doc_b"))
      .persist()
    var labels = edges.select(col("doc_a").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .persist()
    // the DataFrame actually holding this round's cache/checkpoint —
    // labels is a projection over it, so unpersist must target this one
    var materialized = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("id"))
        .agg(min(col("cluster")).as("n_min"))
      // pointer jump: label's label (labels self-joined on cluster = id;
      // every label IS some node's id, and ids are unique — no fanout)
      val grandparent = labels
        .select(col("id").as("cluster"), col("cluster").as("__gp"))
      val stepped = labels
        .join(neighbourMin, Seq("id"), "left")
        .join(grandparent, Seq("cluster"), "left")
        .select(col("id"), col("cluster").as("__prev"),
          least(
            col("cluster"),
            least(coalesce(col("n_min"), col("cluster")),
              coalesce(col("__gp"), col("cluster")))).as("cluster"))
      val next =
        if ((iter + 1) % checkpointInterval == 0) stepped.localCheckpoint()
        else stepped.persist()
      // single action: materializes next AND answers "did anything move?"
      val changed = next
        .agg(count(when(col("cluster") =!= col("__prev"), lit(1))).as("n"))
        .head().getLong(0)
      materialized.unpersist()
      materialized = next
      labels = next.select(col("id"), col("cluster"))
      converged = changed == 0
      iter += 1
    }
    lastClusterRounds = iter
    edges.unpersist()
    // hand back a self-contained checkpoint and release the last round's
    // cache entry: a projection over a persisted plan can't be
    // unpersisted by callers (sameResult fails against the cached plan),
    // so without this every call would pin one dataset forever.
    // Checkpoint blocks are reference-tracked and GC'd with the RDD.
    val result = labels.localCheckpoint()
    materialized.unpersist()
    result
  }

  /** deduplicate with transitive-cluster semantics: one survivor (the
    * minimum id) per connected near-dup cluster. Costs O(log diameter)
    * extra rounds over the greedy `deduplicate`. Same caching contract
    * as [[deduplicate]]: duplicateClusters' returned label table is a
    * small self-contained checkpoint, so every corpus-sized
    * intermediate unpersists before this returns.
    */
  def deduplicateTransitive(docs: DataFrame, id: String, text: String,
                            n: Int = 8, k: Int = 8, r: Int = 2,
                            minJaccard: Double = 0.5,
                            maxBucket: Option[Int] = None): DataFrame = {
    val exactSurvivors = exactSurvivorRows(docs, id, text).persist()
    val hsets = shingleHashArrays(exactSurvivors, id, text, n).persist()
    val sig = minhashSignatureDirect(exactSurvivors, id, text, n, k).persist()
    val cand = candidatePairs(lshBands(sig, id, k, r), id, maxBucket)
    val verified = jaccardVerifyHashed(cand, hsets, id, minJaccard)
    // duplicateClusters materializes its (small) label table eagerly
    // through the hot caches and hands back a checkpoint
    val drops = duplicateClusters(verified)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as(id))
    sig.unpersist(); hsets.unpersist(); exactSurvivors.unpersist()
    exactSurvivors.join(drops, Seq(id), "left_anti")
  }

  /** Incremental ingest dedup: drop every `batch` document that is an
    * exact or near duplicate of the existing `corpus` — the operation a
    * continuously-fed pipeline runs on each new crawl batch, where
    * re-deduplicating the whole corpus per batch is not an option.
    * Survivors keep every batch column. Batch-internal duplicates are
    * out of scope (run [[deduplicate]] on the batch first).
    *
    * Shape: an exact pass first (anti-join of content md5 against the
    * corpus fingerprint set — no shingle work for verbatim recrawls,
    * the common case), then cross-side LSH: band collisions BETWEEN
    * batch and corpus signatures (never corpus×corpus — the corpus side
    * is only probed), verified by exact Jaccard over hashed shingle
    * sets. At 100 TB the corpus signatures/fingerprints are maintained
    * as persisted tables, not recomputed per batch; this operator
    * recomputes them for self-containment.
    *
    * `maxBucket` caps each band bucket PER SIDE to its lowest-id
    * members: a boilerplate bucket is a near-identical cluster, so its
    * retained representatives still catch matching batch docs, while a
    * batch doc ranked past the cap in EVERY one of its bands can be
    * missed — the documented recall trade for bounded work (the
    * within-corpus chain trick does not apply: membership, not
    * connectivity, is the question here).
    */
  def dedupAgainstCorpus(batch: DataFrame, corpus: DataFrame, id: String,
                         text: String, n: Int = 8, k: Int = 8, r: Int = 2,
                         minJaccard: Double = 0.5,
                         maxBucket: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val corpusFp = corpus.select(md5(col(text)).as("__fp")).distinct()
    // Caching contract, same as [[deduplicate]]: `fresh` feeds three
    // consumers (bands, shingle hashes, final anti-join), so it is
    // persisted only while the SMALL drop-id list is materialized
    // eagerly below, then unpersisted before returning — a long-lived
    // per-batch ingest session accretes nothing. The caller's action
    // recomputes `fresh` once (batch scan + fingerprint anti-join).
    val fresh = batch.withColumn("__fp", md5(col(text)))
      .join(corpusFp, Seq("__fp"), "left_anti")
      .drop("__fp")
      .persist()
    def capped(bands: DataFrame): DataFrame = maxBucket match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash")).orderBy(col(id))
        bands.withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= cap).drop("__rk")
      case None => bands
    }
    val bBands = capped(lshBands(minhashSignatureDirect(fresh, id, text, n, k), id, k, r))
      .select(col("band"), col("band_hash"), col(id).as("__bid"))
    val cBands = capped(lshBands(minhashSignatureDirect(corpus, id, text, n, k), id, k, r))
      .select(col("band"), col("band_hash"), col(id).as("__cid"))
    val cand = bBands.join(cBands, Seq("band", "band_hash"))
      .select(col("__bid"), col("__cid")).distinct()
    val bH = shingleHashArrays(fresh, id, text, n)
      .select(col(id).as("__bid"), col("shl").as("sb"))
    val cH = shingleHashArrays(corpus, id, text, n)
      .select(col(id).as("__cid"), col("shl").as("sa"))
    val drops = cand
      .join(bH, Seq("__bid")).join(cH, Seq("__cid"))
      .withColumn("__inter",
        graft.functions.GraftFunctions.sorted_intersect_count(col("sa"), col("sb")))
      .where(col("__inter") > 0)
      .where(round(col("__inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("__inter")).cast("double"), 4)
        >= minJaccard)
      .select(col("__bid").as(id)).distinct()
      .localCheckpoint()
    fresh.unpersist()
    fresh.join(drops, Seq(id), "left_anti")
  }

  /** SimHash sketch: `bits`-bit fingerprint where bit j is the sign of
    * sum over token OCCURRENCES of ±1 (the j-th md5 bit of the token).
    * Near-identical documents differ in few bits (compare via hamming
    * distance on the bitstring). One explode + one groupBy shuffle.
    */
  def simhash(docs: DataFrame, id: String, text: String, bits: Int): DataFrame = {
    require(bits <= 32, "md5 hex has 32 digits")
    // md5 hex PROJECTED once per token occurrence below the aggregate:
    // written as `bits` md5Bit(tok, j) aggregate inputs, the digest
    // expression appears `bits` times in the agg update expressions and
    // its single evaluation rests on codegen subexpression elimination;
    // the explicit projection guarantees one digest per token in every
    // execution mode (bit-identical: md5Bit(tok, j) ≡ high bit of the
    // j-th hex digit of this projected hash).
    val toks = docs.select(col(id),
      explode(TextOps.tokens(col(text))).as("tok"))
      .select(col(id), md5(col("tok")).as("__h"))
    def hiBit(j: Int) = substring(col("__h"), j, 1)
      .isin("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = toks.groupBy(col(id))
      .agg(
        sum(when(hiBit(1), 1).otherwise(-1)).as("b1"),
        (2 to bits).map(j =>
          sum(when(hiBit(j), 1).otherwise(-1)).as(s"b$j")): _*)
    sums.select(col(id),
      concat((1 to bits).map(j => when(col(s"b$j") > 0, "1").otherwise("0")): _*)
        .as("simhash"))
  }

  /** All (id_a, id_b, hamming) pairs of [[simhash]] sketches within
    * `maxHamming` differing bits, id_a < id_b — the near-duplicate
    * JOIN the fingerprints exist for, without the quadratic all-pairs
    * scan. Blocking is the pigeonhole bound: split the `bits`-bit
    * sketch into `maxHamming + 1` bands; two sketches differing in at
    * most `maxHamming` bits can dirty at most `maxHamming` bands, so
    * they MUST agree exactly on at least one (bandIdx, bandValue) —
    * a hash-join key. Candidates then verify with an exact popcount
    * over the XOR (bit-identical to counting differing bitstring
    * positions), so the result is exact: blocking only bounds recall
    * work, never the answer.
    *
    * Scale shape: each sketch explodes to `maxHamming + 1` band rows
    * (constant, small), one hash shuffle on the band key, and the
    * verify is integer ops on the candidate volume. The degenerate
    * case is a band value shared by a large fraction of the corpus
    * (near-constant sketch regions — think boilerplate-dominated
    * docs): `maxBucket` truncates such buckets to their first
    * `maxBucket` members in md5-of-id order, same recall-for-bound
    * contract as the LSH and fuzzy-join caps, default off (exact —
    * what the oracle certifies).
    */
  def simhashPairs(sketches: DataFrame, id: String, bits: Int, maxHamming: Int,
                   maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bits,
      s"need 0 <= maxHamming < bits, got $maxHamming vs $bits bits")
    // the verify XORs the sketch as a signed long: 63+ bits would
    // overflow conv's cast (ANSI throws; legacy nulls out the sketch
    // and silently drops its pairs) — refuse loudly instead
    require(bits <= 62, s"sketches wider than 62 bits don't fit the popcount verify (got $bits)")
    val bands = maxHamming + 1
    // balanced exact partition of the bit positions — a lazy ceil-width
    // split would leave trailing bands EMPTY when bands does not divide
    // bits, and an empty band matches every sketch (a full cross join)
    val base = bits / bands
    val rem = bits % bands
    val widths = (0 until bands).map(j => base + (if (j < rem) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    def side(asId: String): DataFrame = {
      // spread the sketch rows to cluster parallelism BEFORE the band
      // fan-out: the explode → band join → popcount verify chain is
      // compute-amplifying (bands× rows, then quadratic pairing inside
      // each bucket), but its INPUT bytes are tiny (id + bits chars per
      // doc), so AQE coalesces the upstream sketch exchange to one
      // partition and the whole join tail runs serial (measured at
      // sf0.1: 3 single-task jobs ≈ 2 s wall). A keyless round-robin
      // REPARTITION_BY_NUM is never AQE-coalesced and never collapsed
      // as redundant (a keyed one on the sketch id is — the sketch
      // aggregate is already hash-partitioned on it); it moves only the
      // skinny sketch rows and both sides share it (one canonical
      // exchange — ReusedExchange — since the sides differ only in
      // aliases).
      val spread = sketches.repartition(
        sketches.sparkSession.sparkContext.defaultParallelism)
      val exploded = spread.select(
        col(id).as(asId),
        conv(col("simhash"), 2, 10).cast("long").as(s"__v_$asId"),
        posexplode(array((0 until bands).map(j =>
          substring(col("simhash"), starts(j) + 1, widths(j))): _*)))
        .select(col(asId), col(s"__v_$asId"),
          col("pos").as("__band"), col("col").as("__bv"))
      maxBucket match {
        case None => exploded
        case Some(cap) =>
          val win = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__band"), col("__bv"))
            .orderBy(md5(col(asId).cast("string")), col(asId))
          exploded.withColumn("__rk", row_number().over(win))
            .where(col("__rk") <= cap).drop("__rk")
      }
    }
    side("id_a").join(side("id_b"), Seq("__band", "__bv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__v_id_a").bitwiseXOR(col("__v_id_b"))).as("__x"))
      .distinct()
      .select(col("id_a"), col("id_b"), expr("bit_count(__x)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
