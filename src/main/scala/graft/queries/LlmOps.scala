package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Similarity, TextOps}

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables, each paired with a DuckDB oracle that mirrors
  * the md5-hash/left-fold determinism contract of graft.ops.
  */
object LlmOps {

  private val ShingleN = 8
  private val MinhashK = 8
  private val BandR = 2
  private val MaxBucket = 32
  private val SimhashBits = 16
  private val hiHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
  private val hiHexSql = hiHex.map(h => s"'$h'").mkString(", ")
  private[queries] val stops = Seq("the", "a", "of", "and", "to", "in")

  // ---- shared oracle SQL fragments ----

  /** Distinct (doc_id, shingle) set, 8-char shingles, over `from`.
    * Single source of truth for the shingle semantics that must stay
    * bit-identical to the native CharShingles expression (including the
    * shorter-than-n truncated-tail case).
    */
  private def shSqlFrom(from: String): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, greatest(length(text)-$ShingleN+2, 2)),
       |      i -> substring(text, CAST(i AS INT), $ShingleN))) AS sh
       |  FROM $from)""".stripMargin

  private val shSql = shSqlFrom("documents")

  /** The minhash mix contract of graft.functions.Minhash in DuckDB:
    * two 60-bit md5 bases, v_k = (a_k·h1 + b_k·h2 + c_k) mod 2^61-1
    * with INT128 (HUGEINT) widening for the multiplies. Constants come
    * from the SAME Scala definitions the native expression uses — one
    * source of truth.
    */
  private val sigSql = {
    import graft.functions.Minhash.{P, a, b, c}
    val mins = (0 until MinhashK)
      .map(k =>
        s"min(CAST((${a(k)}::HUGEINT * h1 + ${b(k)}::HUGEINT * h2 + ${c(k)}) % $P AS BIGINT)) AS h$k")
      .mkString(", ")
    s"""shh AS (SELECT doc_id, ('0x'||substr(md5(sh),1,15))::BIGINT AS h1,
       |  ('0x'||substr(md5(sh),16,15))::BIGINT AS h2 FROM sh),
       |sig AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id)""".stripMargin
  }

  private val bandsSql = {
    val rows = (0 until MinhashK / BandR).map { b =>
      val slice = (b * BandR until (b + 1) * BandR)
        .map(i => s"CAST(h$i AS VARCHAR)").mkString("||'|'||")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, $slice AS band_hash FROM sig"
    }
    s"bands AS (${rows.mkString(" UNION ALL ")})"
  }

  /** Candidate pairs WITH the boilerplate-bucket cap (maxBucket): a band
    * bucket of B docs yields B² pairs, and a single common shingle
    * winning a band minimum routinely creates buckets of 10%+ of the
    * corpus — the cap is part of the operator's production semantics,
    * so the gate runs it and the oracle mirrors it. Over-cap buckets
    * degrade to consecutive-pair chains (see Dedup.candidatePairs).
    */
  private val candSql =
    s"""bsized AS (
       |  SELECT b.*, bsz FROM bands b JOIN (
       |    SELECT band, band_hash, COUNT(*) AS bsz FROM bands
       |    GROUP BY band, band_hash) s USING (band, band_hash)),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM (SELECT * FROM bsized WHERE bsz <= $MaxBucket) a
       |    JOIN (SELECT * FROM bsized WHERE bsz <= $MaxBucket) b
       |      USING (band, band_hash)
       |    WHERE a.doc_id < b.doc_id
       |    UNION ALL
       |    SELECT doc_id AS doc_a, nxt AS doc_b FROM (
       |      SELECT doc_id,
       |        lead(doc_id) OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS nxt
       |      FROM bsized WHERE bsz > $MaxBucket)
       |    WHERE nxt IS NOT NULL))""".stripMargin

  /** Left-fold dot product — the exact cross-engine contract of
    * VectorOps.dot (index-ascending, double precision).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)), (x,y) -> x+y)"

  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  /** Prefixed minhash CTE chain for a second shingle source: mirrors
    * shSql/sigSql/bandsSql (same constants, same mix contract) with
    * every CTE named `<p>sh`/`<p>shh`/`<p>sig`/`<p>bands`, plus the
    * per-side bucket cap of Dedup.dedupAgainstCorpus as
    * `<p>cb` (row_number <= cap per (band, band_hash), id order).
    */
  private def minhashSideSqlFor(p: String, from: String, cap: Int): String = {
    import graft.functions.Minhash.{P, a, b, c}
    val mins = (0 until MinhashK)
      .map(k =>
        s"min(CAST((${a(k)}::HUGEINT * h1 + ${b(k)}::HUGEINT * h2 + ${c(k)}) % $P AS BIGINT)) AS h$k")
      .mkString(", ")
    val bandRows = (0 until MinhashK / BandR).map { bI =>
      val slice = (bI * BandR until (bI + 1) * BandR)
        .map(i => s"CAST(h$i AS VARCHAR)").mkString("||'|'||")
      s"SELECT doc_id, CAST($bI AS BIGINT) AS band, $slice AS band_hash FROM ${p}sig"
    }
    s"""${p}sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, greatest(length(text)-$ShingleN+2, 2)),
       |      i -> substring(text, CAST(i AS INT), $ShingleN))) AS sh
       |  FROM $from),
       |${p}shh AS (SELECT doc_id, ('0x'||substr(md5(sh),1,15))::BIGINT AS h1,
       |  ('0x'||substr(md5(sh),16,15))::BIGINT AS h2 FROM ${p}sh),
       |${p}sig AS (SELECT doc_id, $mins FROM ${p}shh GROUP BY doc_id),
       |${p}bands AS (${bandRows.mkString(" UNION ALL ")}),
       |${p}cb AS (
       |  SELECT doc_id, band, band_hash FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS rk
       |    FROM ${p}bands)
       |  WHERE rk <= $cap)""".stripMargin
  }

  /** Unrounded cosine — used where the value feeds an argmax, which
    * must compare full-precision doubles exactly like the Spark side.
    */
  private def cosRawSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** The k-means contract of Similarity.kmeansCodebook/kmeansAssign in
    * DuckDB CTEs: md5-ordered seeds, `iters` Lloyd rounds (argmax-cosine
    * assignment, per-dimension double mean truncated to FLOAT), final
    * assignment `af(vec_id, cell, cell_sim)` against the last centroids.
    * The FLOAT truncation after each mean is what makes the iteration
    * cross-engine deterministic: it absorbs summation-order noise before
    * the next round's argmax consumes the centroids.
    */
  private def kmeansSql(k: Int, iters: Int): String = {
    def assign(cents: String, out: String, withSim: Boolean): String = {
      val sim = if (withSim) s", round(cos, 6) AS cell_sim" else ""
      s"""$out AS (
         |  SELECT vec_id, embedding, cell$sim FROM (
         |    SELECT e.vec_id, e.embedding, c.cell,
         |      ${cosRawSql("e.embedding", "c.cvec")} AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.embedding", "c.cvec")} DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    }
    def mean(assigned: String, out: String): String =
      s"""$out AS (
         |  SELECT cell, list(CAST(m AS FLOAT) ORDER BY i) AS cvec FROM (
         |    SELECT cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS m
         |    FROM $assigned, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
         |    GROUP BY cell, i)
         |  GROUP BY cell)""".stripMargin
    val seeds =
      s"""c0 AS (
         |  SELECT vec_id AS cell, embedding AS cvec FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)""".stripMargin
    val rounds = (1 to iters).flatMap(i =>
      Seq(assign(s"c${i - 1}", s"a$i", withSim = false), mean(s"a$i", s"c$i")))
    (Seq(seeds) ++ rounds :+ assign(s"c$iters", "af", withSim = true))
      .mkString(",\n")
  }

  private def projSql(p: Int): String =
    s"list_reduce(list_transform(range(1, len(embedding)+1), " +
      s"i -> CASE WHEN substring(md5('$p-'||i), 1, 1) IN ($hiHexSql) " +
      s"THEN CAST(embedding[i] AS DOUBLE) ELSE -CAST(embedding[i] AS DOUBLE) END), (x,y) -> x+y)"

  private[queries] def tokSql = s"string_split_regex(lower(text), '\\s+')"

  val all: Seq[Q] = Seq(

    Q(
      "q20_dedup_exact",
      (s, dir) => Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    Q(
      "q21_minhash_pairs",
      (s, dir) => {
        // signature-only pipeline: the direct path skips the distinct
        // shuffle (min is idempotent over repeated shingles); the band
        // self-join references sig several times — materialize once
        val sig = Dedup.minhashSignatureDirect(Tables.documents(s, dir),
          "doc_id", "text", ShingleN, MinhashK).persist()
        Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", MinhashK, BandR), "doc_id",
          maxBucket = Some(MaxBucket))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH $shSql, $sigSql, $bandsSql, $candSql
              |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin)),

    Q(
      "q22_minhash_jaccard",
      (s, dir) => {
        // hashed shingle sets for verification + direct-path signature:
        // the shingle expression runs twice (cheap, codegen'd) so the
        // persisted intermediates stay skinny — long arrays and K-long
        // signatures, never the shingle strings; no cluster-wide
        // distinct shuffle anywhere in the chain
        val docs = Tables.documents(s, dir)
        val hsets = Dedup.shingleHashArrays(docs, "doc_id", "text", ShingleN).persist()
        val sig = Dedup.minhashSignatureDirect(docs, "doc_id", "text", ShingleN, MinhashK)
          .persist()
        val cand = Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", MinhashK, BandR), "doc_id",
          maxBucket = Some(MaxBucket))
        Dedup.jaccardVerifyHashed(cand, hsets, "doc_id", 0.2)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH $shSql, $sigSql, $bandsSql, $candSql,
              |lists AS (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY doc_id),
              |scored AS (
              |  SELECT doc_a, doc_b,
              |    round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
              |          CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS DOUBLE), 4) AS jaccard
              |  FROM cand
              |  JOIN lists a ON a.doc_id = doc_a
              |  JOIN lists b ON b.doc_id = doc_b)
              |SELECT doc_a, doc_b, jaccard FROM scored
              |WHERE jaccard >= 0.2
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // Duplicate-cluster assignment: connected components over the
    // verified near-dup graph (q22's edges), every doc labeled with the
    // MINIMUM id reachable through near-dup edges. The Spark side is
    // the O(log diameter) pointer-jumping loop; the oracle reaches the
    // same fixpoint declaratively with a recursive CTE (min id over the
    // transitive closure) — tractable because near-dup components are
    // small even when the corpus isn't. Bench note: most of this
    // query's wall time at toy SF is the iterative loop's fixed
    // per-round job latency (a few rounds × scheduling/AQE overhead on
    // KB-sized labels), the same family as q22/q36's stage latency — at
    // real scale rounds cost compute, and O(log diameter) rounds is the
    // optimum, so the loop is not tuned for the toy numbers.
    // WATCH CLOSED (r18): the oscillation across rounds (6.37 → 3.82 →
    // 4.85 s) is host noise, not a plan change. Two pieces of evidence:
    // (1) the round COUNT is now deterministic and spec-pinned (OpsSpec:
    // 16 rounds for a 10k-link chain, 3 for the toy graph;
    // Dedup.lastClusterRounds) — a plan regression would fail the spec,
    // never hide in the wall clock; (2) a same-host A/B re-ran the
    // UNCHANGED round-17 code minutes apart from round 18's bench:
    // r17 code measured 5.07-5.57 s on this host (vs its recorded
    // 4.85 s), r18 code 5.64-6.06 s — the shift rides the host (this
    // query is ~16 driver-latency-bound rounds on KB labels, the shape
    // most sensitive to scheduler jitter), with r18-vs-r17 code inside
    // the run-to-run variance band.
    Q(
      "q62_dup_clusters",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val hsets = Dedup.shingleHashArrays(docs, "doc_id", "text", ShingleN).persist()
        val sig = Dedup.minhashSignatureDirect(docs, "doc_id", "text", ShingleN, MinhashK)
          .persist()
        val cand = Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", MinhashK, BandR), "doc_id",
          maxBucket = Some(MaxBucket))
        val verified = Dedup.jaccardVerifyHashed(cand, hsets, "doc_id", 0.2)
        Dedup.duplicateClusters(verified)
          .select(col("id").cast("long").as("doc_id"),
            col("cluster").cast("long").as("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $shSql, $sigSql, $bandsSql, $candSql,
              |lists AS (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY doc_id),
              |scored AS (
              |  SELECT doc_a, doc_b,
              |    round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
              |          CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS DOUBLE), 4) AS jaccard
              |  FROM cand
              |  JOIN lists a ON a.doc_id = doc_a
              |  JOIN lists b ON b.doc_id = doc_b),
              |ver AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.2),
              |e AS (SELECT doc_a, doc_b FROM ver
              |      UNION ALL SELECT doc_b, doc_a FROM ver),
              |cc AS (
              |  SELECT DISTINCT doc_a AS id, doc_a AS comp FROM e
              |  UNION
              |  SELECT e.doc_b AS id, cc.comp AS comp
              |  FROM cc JOIN e ON cc.id = e.doc_a)
              |SELECT id AS doc_id, min(comp) AS cluster
              |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin)),

    Q(
      "q23_simhash",
      (s, dir) => Dedup.simhash(Tables.documents(s, dir), "doc_id", "text", SimhashBits)
        .orderBy(col("doc_id")),
      Some {
        val sums = (1 to SimhashBits).map(j =>
          s"SUM(CASE WHEN substring(md5(tok), $j, 1) IN ($hiHexSql) THEN 1 ELSE -1 END) AS b$j")
          .mkString(", ")
        val bitsExpr = (1 to SimhashBits).map(j =>
          s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)").mkString("||")
        s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
           |s AS (SELECT doc_id, $sums FROM t GROUP BY doc_id)
           |SELECT doc_id, $bitsExpr AS simhash FROM s ORDER BY doc_id""".stripMargin
      }),

    // SimHash near-duplicate JOIN: pigeonhole band blocking (hamming<=4
    // over 16 bits -> 5 exact-band keys) + exact popcount verify, vs
    // the naive quadratic bitstring-compare oracle. doc_id < 1000 keeps
    // the oracle's all-pairs replay bounded at every SF.
    Q(
      "q94_simhash_join",
      (s, dir) => {
        val sk = Dedup.simhash(
          Tables.documents(s, dir).where(col("doc_id") < 1000),
          "doc_id", "text", SimhashBits)
        Dedup.simhashPairs(sk, "doc_id", SimhashBits, maxHamming = 4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val sums = (1 to SimhashBits).map(j =>
          s"SUM(CASE WHEN substring(md5(tok), $j, 1) IN ($hiHexSql) THEN 1 ELSE -1 END) AS b$j")
          .mkString(", ")
        val bitsExpr = (1 to SimhashBits).map(j =>
          s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)").mkString("||")
        s"""WITH t AS (
           |  SELECT doc_id, unnest($tokSql) AS tok FROM documents WHERE doc_id < 1000),
           |s AS (SELECT doc_id, $sums FROM t GROUP BY doc_id),
           |sh AS (SELECT doc_id, $bitsExpr AS simhash FROM s),
           |p AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(len(list_filter(range(1, ${SimhashBits + 1}),
           |      i -> substr(a.simhash, i, 1) != substr(b.simhash, i, 1))) AS BIGINT) AS hamming
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 4
           |ORDER BY id_a, id_b""".stripMargin
      }),

    Q(
      "q24_embed_neardup",
      (s, dir) => Similarity.bruteForcePairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.35)
        .orderBy(col("vec_a"), col("vec_b")),
      Some(s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Int8 scalar quantization of the embedding store (4× bandwidth cut
    // before ANN): per-vector [lo, hi] range codes + max reconstruction
    // error. Codes hash via the array-serialization recipe; lo/hi ride
    // raw — float32→double promotion and array min/max are exact, and
    // the error expression is one fixed IEEE tree on both engines.
    Q(
      "q64_quantize",
      (s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("n_dims"), col("lo"), col("hi"),
          md5(array_join(transform(col("codes"), c => c.cast("string")), "|"))
            .as("codes_md5"),
          round(col("max_abs_err"), 6).as("max_abs_err"))
        .orderBy(col("vec_id")),
      Some("""WITH x AS (
             |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
             |  FROM embeddings),
             |m AS (
             |  SELECT vec_id, x,
             |    list_aggregate(x, 'min') AS lo, list_aggregate(x, 'max') AS hi
             |  FROM x),
             |q AS (
             |  SELECT vec_id, x, lo, hi,
             |    list_transform(x, v -> CASE WHEN hi = lo THEN 0
             |      ELSE CAST(round((v - lo) * 255.0 / (hi - lo)) AS BIGINT) END) AS codes
             |  FROM m)
             |SELECT vec_id, CAST(len(x) AS BIGINT) AS n_dims, lo, hi,
             |  md5(array_to_string(codes, '|')) AS codes_md5,
             |  round(list_aggregate(list_transform(range(1, len(x) + 1),
             |    i -> abs(x[i] - (lo + CAST(codes[i] AS DOUBLE) * (hi - lo) / 255.0))),
             |    'max'), 6) AS max_abs_err
             |FROM q ORDER BY vec_id""".stripMargin)),

    Q(
      "q25_ann_topk",
      (s, dir) => Similarity.topK(Tables.embeddings(s, dir), "vec_id", "embedding", 0L, 10),
      Some(s"""SELECT e.vec_id, ${cosSql("e.embedding", "q.qv")} AS cos_sim
              |FROM embeddings e,
              |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
              |WHERE e.vec_id <> 0
              |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin)),

    Q(
      "q26_ann_lsh",
      (s, dir) => Similarity.lshPairs(Tables.embeddings(s, dir), "vec_id", "embedding", 4, 0.35)
        .orderBy(col("vec_a"), col("vec_b")),
      Some {
        val bucket = (0 until 4).map(p =>
          s"(CASE WHEN ${projSql(p)} > 0 THEN '1' ELSE '0' END)").mkString("||")
        s"""WITH sk AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
           |FROM sk a JOIN sk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
           |ORDER BY vec_a, vec_b""".stripMargin
      }),

    // k-NN graph over the same sign-LSH buckets as q26: per-vector
    // top-3 bucket-mates by exact cosine. The oracle replays the
    // hyperplane signs and ranks with the same rounded-cosine ordering
    // — pinning both the candidate containment (bucket) and the
    // per-src ranking cutoff.
    Q(
      "q90_knn_graph",
      (s, dir) => Similarity.knnGraph(Tables.embeddings(s, dir),
        "vec_id", "embedding", planes = 4, k = 3)
        .orderBy(col("src"), col("rank")),
      Some {
        val bucket = (0 until 4).map(p =>
          s"(CASE WHEN ${projSql(p)} > 0 THEN '1' ELSE '0' END)").mkString("||")
        s"""WITH sk AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
           |cand AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ${cosSql("a.embedding", "b.embedding")} AS cos_sim
           |  FROM sk a JOIN sk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
           |ranked AS (
           |  SELECT src, dst, cos_sim,
           |    row_number() OVER (PARTITION BY src
           |      ORDER BY cos_sim DESC, dst) AS rank
           |  FROM cand)
           |SELECT src, dst, cos_sim, rank FROM ranked WHERE rank <= 3
           |ORDER BY src, rank""".stripMargin
      }),

    Q(
      "q27_text_stats",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val nTok = size(toks).cast("double")
        val nChars = length(col("text")).cast("double")
        // BPE-ish pre-tokenization: letter runs / digit runs / single
        // punctuation marks, the shape of GPT-style byte-pair pre-splits
        val bpe = regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
        val punctRatio = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
          .cast("double") / nChars
        val stopRatio = TextOps.stopwordCount(toks, stops).cast("double") / nTok
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          bpe.cast("long").as("n_bpe_tokens"),
          round(stopRatio, 4).as("stop_ratio"),
          round(punctRatio, 4).as("punct_ratio"),
          round(nChars / nTok, 4).as("chars_per_token"),
          // composite quality score: stopword presence up, punctuation
          // soup down, degenerate token lengths down
          round(stopRatio * lit(2.0) - punctRatio * lit(5.0) +
            when(nChars / nTok >= 3 && nChars / nTok <= 12, 1.0).otherwise(0.0), 4)
            .as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stopList = stops.map(t => s"'$t'").mkString(", ")
        val stopR = s"CAST(len(list_filter($tokSql, t -> list_contains([$stopList], t))) AS DOUBLE) / CAST(len($tokSql) AS DOUBLE)"
        val punctR = s"CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
        val cpt = s"CAST(length(text) AS DOUBLE) / CAST(len($tokSql) AS DOUBLE)"
        s"""SELECT doc_id,
           |  len($tokSql) AS n_tokens,
           |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
           |  round($stopR, 4) AS stop_ratio,
           |  round($punctR, 4) AS punct_ratio,
           |  round($cpt, 4) AS chars_per_token,
           |  round($stopR * 2.0 - $punctR * 5.0 +
           |        (CASE WHEN $cpt >= 3 AND $cpt <= 12 THEN 1.0 ELSE 0.0 END), 4) AS quality_score
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    Q(
      "q28_lang_id",
      (s, dir) => {
        val markers = Seq(
          "en" -> Seq("the", "and", "of", "to"),
          "es" -> Seq("el", "la", "de", "que"),
          "de" -> Seq("der", "die", "und", "ist"),
          "fr" -> Seq("le", "les", "et", "dans"))
        val toks = TextOps.tokens(col("text"))
        val scored = Tables.documents(s, dir).select(
          col("doc_id") +: col("lang") +:
            markers.map { case (l, ms) =>
              TextOps.stopwordCount(toks, ms).cast("long").as(s"s_$l")
            }: _*)
        scored.withColumn("pred_lang",
          when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")), "en")
            .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
          .orderBy(col("doc_id"))
      },
      Some {
        def score(ms: Seq[String]) = {
          val l = ms.map(t => s"'$t'").mkString(", ")
          s"len(list_filter($tokSql, t -> list_contains([$l], t)))"
        }
        s"""SELECT doc_id, lang,
           |  ${score(Seq("the", "and", "of", "to"))} AS s_en,
           |  ${score(Seq("el", "la", "de", "que"))} AS s_es,
           |  ${score(Seq("der", "die", "und", "ist"))} AS s_de,
           |  ${score(Seq("le", "les", "et", "dans"))} AS s_fr,
           |  CASE WHEN ${score(Seq("the", "and", "of", "to"))} >= greatest(${score(Seq("el", "la", "de", "que"))}, ${score(Seq("der", "die", "und", "ist"))}, ${score(Seq("le", "les", "et", "dans"))}) THEN 'en'
           |       WHEN ${score(Seq("el", "la", "de", "que"))} >= greatest(${score(Seq("der", "die", "und", "ist"))}, ${score(Seq("le", "les", "et", "dans"))}) THEN 'es'
           |       WHEN ${score(Seq("der", "die", "und", "ist"))} >= ${score(Seq("le", "les", "et", "dans"))} THEN 'de'
           |       ELSE 'fr' END AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Language-ID via character n-gram profiles (the n-gram heuristic
    // companion to q28's stopword markers): counts are replace-based
    // substring occurrences — integer-exact, no regex dialect risk.
    Q(
      "q39_lang_ngram",
      (s, dir) => {
        val profiles = Seq(
          "en" -> Seq(" th", "he ", "ing"),
          "es" -> Seq(" el", " de", "os "),
          "de" -> Seq("sch", "der", "ein"),
          "fr" -> Seq(" le", "es ", "ent"))
        val t = lower(col("text"))
        val scored = Tables.documents(s, dir).select(
          col("doc_id") +: col("lang") +:
            profiles.map { case (l, ngs) =>
              TextOps.langNgramScore(t, ngs).as(s"ng_$l")
            }: _*)
        scored.withColumn("pred_lang",
          when(col("ng_en") >= greatest(col("ng_es"), col("ng_de"), col("ng_fr")), "en")
            .when(col("ng_es") >= greatest(col("ng_de"), col("ng_fr")), "es")
            .when(col("ng_de") >= col("ng_fr"), "de")
            .otherwise("fr"))
          .orderBy(col("doc_id"))
      },
      Some {
        def cnt(ng: String) =
          s"CAST((length(lower(text)) - length(replace(lower(text), '$ng', ''))) / ${ng.length} AS BIGINT)"
        def score(ngs: Seq[String]) = ngs.map(cnt).mkString("(", " + ", ")")
        val en = score(Seq(" th", "he ", "ing")); val es = score(Seq(" el", " de", "os "))
        val de = score(Seq("sch", "der", "ein")); val fr = score(Seq(" le", "es ", "ent"))
        s"""SELECT doc_id, lang,
           |  $en AS ng_en, $es AS ng_es, $de AS ng_de, $fr AS ng_fr,
           |  CASE WHEN $en >= greatest($es, $de, $fr) THEN 'en'
           |       WHEN $es >= greatest($de, $fr) THEN 'es'
           |       WHEN $de >= $fr THEN 'de'
           |       ELSE 'fr' END AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // The end-to-end dedup OPERATION (corpus in → surviving corpus out):
    // exact-hash collapse, MinHash+LSH candidates, Jaccard-verified
    // near-dups dropped greedily (lower id survives).
    Q(
      "q36_dedup_corpus",
      (s, dir) => Dedup.deduplicate(Tables.documents(s, dir), "doc_id", "text",
        minJaccard = 0.5, maxBucket = Some(MaxBucket))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some(s"""WITH exact AS (
              |  SELECT * FROM (
              |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              |    FROM documents) t
              |  WHERE rn = 1),
              |${shSqlFrom("exact")},
              |${sigSql}, ${bandsSql}, ${candSql},
              |lists AS (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY doc_id),
              |drops AS (
              |  SELECT DISTINCT doc_b AS doc_id
              |  FROM cand
              |  JOIN lists a ON a.doc_id = doc_a
              |  JOIN lists b ON b.doc_id = doc_b
              |  WHERE round(CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
              |        CAST(len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)) AS DOUBLE), 4) >= 0.5)
              |SELECT doc_id, lang, source FROM exact
              |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
              |ORDER BY doc_id""".stripMargin)),

    // IVF ANN through the gate (rows-only: the deterministic stand-in
    // codebook makes results reproducible, but the cell-ranking plan is
    // not worth mirroring in SQL — correctness is pinned by the
    // nprobe=cells ≡ brute-force equivalence in OpsSpec).
    Q(
      "q35_ann_ivf",
      (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 0L, topK = 10, cells = 16, nprobe = 4),
      None),

    // IVF ANN with the WHOLE probe path hash-matched: the coarse
    // quantizer (one Lloyd round over md5 seeds — kmeansSql(iters=1)),
    // the active-cell ranking against the probe vector, the nprobe cut,
    // and the exact-cosine re-rank inside probed cells all replay in
    // DuckDB. Upgrades q35's rows-only evidence to end-to-end value
    // equality — ANN probe results, not just result shape.
    Q(
      "q104_ann_ivf_exact",
      (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryId = 7L, topK = 12, cells = 16, nprobe = 4),
      Some(s"""WITH ${kmeansSql(k = 16, iters = 1)},
              |probe AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
              |active AS (SELECT DISTINCT cell FROM af),
              |pc AS (
              |  SELECT c.cell FROM c1 c
              |  JOIN active a ON a.cell = c.cell
              |  CROSS JOIN probe
              |  ORDER BY ${cosRawSql("c.cvec", "qv")} DESC, c.cell
              |  LIMIT 4)
              |SELECT af.vec_id, round(${cosRawSql("af.embedding", "qv")}, 6) AS cos_sim
              |FROM af JOIN pc ON af.cell = pc.cell CROSS JOIN probe
              |WHERE af.vec_id <> 7
              |ORDER BY cos_sim DESC, af.vec_id
              |LIMIT 12""".stripMargin)),

    // Multimodal plumbing through the gate: documents' text bytes stand
    // in for media payloads; the batched mapPartitions feature extractor
    // Perceptual image hashing through the gate: documents' text bytes
    // stand in for media payloads (all stub-path — deterministic), and
    // the cross-modal near-dup JOIN reuses the q94-certified banded
    // hamming machinery. Rows-only by nature (a JVM codec hash has no
    // SQL mirror); the real-decode behavior — re-encode stability,
    // local sensitivity, the near/far separation — is pinned by
    // MultimodalSpec on generated PNG/BMP images.
    Q(
      "q112_perceptual_hash",
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
        graft.ops.Multimodal.perceptualHash(media).toDF()
          .select(col("media_id"), col("phash"), col("decoded"))
          .orderBy(col("media_id"))
      },
      None),

    // (stub codec) runs distributed. No SQL oracle — mapPartitions is
    // not SQL-expressible — so the driver records a rows-only check.
    Q(
      "q33_media_features",
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
        graft.ops.Multimodal.extractFeatures(media, dim = 8)
          .toDF("media_id", "features")
          .select(col("media_id"), round(element_at(col("features"), 1), 6).as("f0"))
          .orderBy(col("media_id"))
      },
      None),

    // Frame sampling through the gate. Documents' text bytes are not
    // ImageIO-readable, so every payload takes the deterministic STUB
    // path (k evenly spaced byte slices) — which IS SQL-expressible:
    // the corpus is pure ASCII (octet_length == length at every SF), so
    // DuckDB's 1-based char substring reproduces the byte slices and
    // md5 hashes them comparably. The REAL decoded path (animated GIF →
    // composited frames) is pinned by MultimodalSpec — no SQL oracle
    // can re-run a JVM codec.
    Q(
      "q59_frame_sample",
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
        graft.ops.Multimodal.sampleFrames(media, k = 4, frameBytes = 16)
          .toDF()
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            md5(col("frame")).as("frame_md5"), col("decoded"), col("reason"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id, i AS frame_idx, text,
             |    strlen(text) AS len,
             |    greatest((strlen(text) - 16) // 3, 1) AS step
             |  FROM documents, (SELECT unnest(range(0, 4)) AS i)),
             |o AS (
             |  SELECT media_id, frame_idx, text, len,
             |    least(frame_idx * step, greatest(len - 1, 0)) AS frm
             |  FROM f)
             |SELECT media_id, frame_idx,
             |  md5(substring(text, CAST(frm + 1 AS INT),
             |    CAST(least(frm + 16, len) - frm AS INT))) AS frame_md5,
             |  false AS decoded,
             |  'no_jvm_codec:unknown' AS reason
             |FROM o ORDER BY media_id, frame_idx""".stripMargin)),

    Q(
      "q29_fingerprint",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        sha2(col("text"), 256).as("content_sha256"),
        TextOps.rollingHash(col("text")).as("rolling_hash"),
        octet_length(col("text")).cast("long").as("n_bytes"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
             |  sha256(text) AS content_sha256,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, length(text)+1),
             |        i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 2147483647) AS rolling_hash,
             |  strlen(text) AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Skew-salted two-stage aggregation (§2.10 extension): the salt
    // spreads a hot key over `salts` reducers, the second stage folds it
    // out — and because the aggregate runs in DECIMAL (associative), the
    // result is bit-equal to the oracle's plain one-stage GROUP BY, which
    // is exactly the operator's correctness contract.
    Q(
      "q44_skew_salted",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("v", Q.dec(col("value")))
        graft.ops.Skew.saltedAgg(e, "event_type", 8,
          Seq(sum(col("v")).as("__p"), count(lit(1)).as("__c")),
          Seq(sum(col("__p")).cast("string").as("sum_value"),
            sum(col("__c")).as("n_events")))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS sum_value,
             |  COUNT(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Corpus clustering: k-means (md5 seeds + 2 full Lloyd rounds) with
    // the whole iteration — seeds, argmax assignment, float-truncated
    // centroid means — replicated in the oracle, so the gate pins the
    // trained clustering itself, not just its shape. q70/q71/q83 share
    // ONE trained codebook per corpus dir (the persisted-trained-table
    // production pattern, via Similarity's driver-side memo) — training
    // is deterministic, so sharing changes nothing the oracle can see.
    Q(
      "q70_kmeans",
      (s, dir) => Similarity.kmeansAssign(
        Tables.embeddings(s, dir), "vec_id", "embedding", k = 8, iters = 2,
        cacheKey = Some(s"$dir/embeddings"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"),
          round(avg(col("cell_sim")), 4).as("avg_cos"),
          min(col("vec_id")).as("min_member"))
        .orderBy(col("cell")),
      Some(s"""WITH ${kmeansSql(k = 8, iters = 2)}
              |SELECT cell, count(*) AS n_members,
              |  round(avg(cell_sim), 4) AS avg_cos,
              |  min(vec_id) AS min_member
              |FROM af GROUP BY cell ORDER BY cell""".stripMargin)),

    // SemDeDup: drop every vector with a lower-id near-duplicate
    // (cosine >= 0.35) inside its k-means cell; survivors keep their
    // row. The pairwise scan is cell-local — that containment is the
    // operator's scale story, and the oracle replays it exactly.
    Q(
      "q71_semantic_dedup",
      (s, dir) => Similarity.semanticDedup(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, minCos = 0.35, cacheKey = Some(s"$dir/embeddings"))
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id")),
      Some(s"""WITH ${kmeansSql(k = 8, iters = 2)},
              |losers AS (
              |  SELECT DISTINCT b.vec_id
              |  FROM af a JOIN af b
              |    ON a.cell = b.cell AND a.vec_id < b.vec_id
              |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35)
              |SELECT e.vec_id, e.label FROM embeddings e
              |WHERE e.vec_id NOT IN (SELECT vec_id FROM losers)
              |ORDER BY e.vec_id""".stripMargin)),

    // Cluster-balanced (diversity) sampling: the SemDeDup companion —
    // an eval/train subset drawn evenly across k-means cells instead of
    // at corpus random, via the deterministic md5-rank stratified
    // sampler with the CELL as the stratum. Oracle replays clustering
    // + per-cell ranking.
    Q(
      "q83_cluster_sample",
      (s, dir) => {
        val assigned = Similarity.kmeansAssign(
          Tables.embeddings(s, dir), "vec_id", "embedding", k = 8, iters = 2,
          cacheKey = Some(s"$dir/embeddings"))
        graft.ops.CorpusOps.stratifiedSample(
          assigned.select(col("vec_id"), col("cell")), "cell", "vec_id",
          perStratum = 5)
          .orderBy(col("cell"), col("vec_id"))
      },
      Some(s"""WITH ${kmeansSql(k = 8, iters = 2)},
              |ranked AS (
              |  SELECT cell, vec_id,
              |    row_number() OVER (PARTITION BY cell
              |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
              |  FROM af)
              |SELECT vec_id, cell FROM ranked WHERE rn <= 5
              |ORDER BY cell, vec_id""".stripMargin)),

    // Assignment against a PERSISTED codebook at production k: 200
    // cells × dim 64 = 12,800 floats — past Similarity's literal-fold
    // threshold, so the GATE exercises the broadcast-join + max_by
    // argmax path end-to-end (the OpsSpec path-equivalence case covers
    // semantics; this pins it against DuckDB's windowed argmax on the
    // same cells). The codebook here is the md5-ordered seed prefix
    // for self-containment; production reads a trained table. The
    // oracle hoists per-vector norms — numerically identical to the
    // one-pass cosine (same accumulations, same final expression),
    // ~8× fewer list folds over the 200-cell cross space.
    Q(
      "q87_codebook_assign",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cb = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
          .limit(200)
          .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
        Similarity.assignToCodebook(e, "vec_id", "embedding", cb)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH cb AS (
              |  SELECT vec_id AS cell, embedding AS cvec FROM embeddings
              |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 200),
              |en AS (SELECT vec_id, embedding,
              |  sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
              |cn AS (SELECT cell, cvec,
              |  sqrt(${dotSql("cvec", "cvec")}) AS nrm FROM cb),
              |scored AS (
              |  SELECT e.vec_id, c.cell,
              |    ${dotSql("e.embedding", "c.cvec")} / (e.nrm * c.nrm) AS cos
              |  FROM en e CROSS JOIN cn c),
              |best AS (
              |  SELECT vec_id, cell, cos,
              |    row_number() OVER (PARTITION BY vec_id
              |      ORDER BY cos DESC, cell) AS rn
              |  FROM scored)
              |SELECT vec_id, cell, round(cos, 6) AS cell_sim
              |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // The SQL-text API form: the same near-dup scan as q24 expressed as
    // a `spark.sql` string over a temp view, with the NATIVE registered
    // vec_cosine expression resolved by name — pins that the SQL
    // registration path produces bit-identical results to the
    // DataFrame/Column path (which q24 gates), under the same oracle.
    Q(
      "q81_sql_native",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_v")
        s.sql("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                |  round(vec_cosine(a.embedding, b.embedding), 6) AS cos_sim
                |FROM embeddings_v a JOIN embeddings_v b ON a.vec_id < b.vec_id
                |WHERE round(vec_cosine(a.embedding, b.embedding), 6) >= 0.35
                |ORDER BY vec_a, vec_b""".stripMargin)
      },
      Some(s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Incremental ingest dedup: a synthetic crawl batch (verbatim
    // recrawls, near-dup prefix-trims, genuinely fresh docs — all
    // derived deterministically from the corpus itself) deduplicated
    // AGAINST the corpus; the oracle replays the exact pass and the
    // cross-side LSH+Jaccard with both sides' minhash chains.
    Q(
      "q77_incremental_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def cls(m: Int) = docs.where(pmod(col("doc_id"), lit(10L)) === m)
        val batch = cls(1)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            expr("substring(text, 11)").as("text"))
          .unionByName(cls(2)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
          .unionByName(cls(3)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(lit("zq "), md5(col("text")), lit(" fresh doc")).as("text")))
        Dedup.dedupAgainstCorpus(batch, docs.select(col("doc_id"), col("text")),
          "doc_id", "text", n = ShingleN, k = MinhashK, r = BandR,
          minJaccard = 0.5, maxBucket = Some(MaxBucket))
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH batch AS (
              |  SELECT doc_id + 2000000 AS doc_id, substring(text, 11) AS text
              |  FROM documents WHERE doc_id % 10 = 1
              |  UNION ALL
              |  SELECT doc_id + 2000000 AS doc_id, text
              |  FROM documents WHERE doc_id % 10 = 2
              |  UNION ALL
              |  SELECT doc_id + 2000000 AS doc_id, 'zq ' || md5(text) || ' fresh doc' AS text
              |  FROM documents WHERE doc_id % 10 = 3),
              |fresh AS (
              |  SELECT * FROM batch
              |  WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)),
              |${minhashSideSqlFor("b", "fresh", MaxBucket)},
              |${minhashSideSqlFor("c", "documents", MaxBucket)},
              |cand AS (
              |  SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
              |  FROM bcb b JOIN ccb c USING (band, band_hash)),
              |bl AS (SELECT doc_id, list(sh) AS shs FROM bsh GROUP BY doc_id),
              |cl AS (SELECT doc_id, list(sh) AS shs FROM csh GROUP BY doc_id),
              |drops AS (
              |  SELECT DISTINCT bid FROM cand
              |  JOIN bl ON bl.doc_id = bid
              |  JOIN cl ON cl.doc_id = cid
              |  WHERE len(list_intersect(bl.shs, cl.shs)) > 0
              |    AND round(CAST(len(list_intersect(bl.shs, cl.shs)) AS DOUBLE) /
              |          CAST(len(bl.shs) + len(cl.shs)
              |               - len(list_intersect(bl.shs, cl.shs)) AS DOUBLE), 4) >= 0.5)
              |SELECT doc_id FROM fresh
              |WHERE doc_id NOT IN (SELECT bid FROM drops)
              |ORDER BY doc_id""".stripMargin))
  )
}
