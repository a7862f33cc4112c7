package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{CorpusOps, TextOps}

/** Corpus-governance query pack: repetition detection, PII scrubbing,
  * benchmark contamination, deterministic splits, and the composed
  * quality-filter pipeline — the operations a training-data pipeline
  * runs between raw ingest and tokenization. Every query carries a
  * DuckDB oracle built from the same constants.
  */
object Corpus {

  private val ContaminationN = 3
  private val BenchCutoff = 50L

  /** The corpus is lowercase words and spaces only, so operators that
    * need digits/punctuation to be interesting (PII scrub q49, BPE-ish
    * token counting q63) run over a deterministic augmented view: each
    * doc gains a contact line derived from its id. Same construction
    * on both engines.
    */
  private def augText = concat(
    col("text"), lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or +1-555-"),
    lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
    lit(" ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
    lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"), lit(" end"))

  private val augSql = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
    "'@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
    "' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || " +
    "CAST((doc_id * 7) % 256 AS VARCHAR) || ' end'"

  /** The corpus has no newlines, so the line-level operators (q60/q61)
    * run over a constructed multi-line view: each document becomes 5
    * lines of 8 tokens (the tiny synthetic vocabulary makes 8-token
    * lines repeat heavily across documents — exactly the boilerplate
    * shape the operators exist for). Both engines build the view from
    * the same token arrays.
    */
  private def multilineDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      concat_ws("\n",
        (0 until 5).map(i => concat_ws(" ", slice(toks, 1 + 8 * i, 8))): _*)
        .as("text"))
  }

  private val multilineSql =
    s"""toks AS (SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
       |ml AS (
       |  -- array_to_string of an EMPTY slice is NULL in DuckDB (Spark's
       |  -- concat_ws gives '') -> coalesce each line (determinism memo)
       |  SELECT doc_id,
       |    coalesce(array_to_string(t[1:8], ' '), '')   || chr(10) ||
       |    coalesce(array_to_string(t[9:16], ' '), '')  || chr(10) ||
       |    coalesce(array_to_string(t[17:24], ' '), '') || chr(10) ||
       |    coalesce(array_to_string(t[25:32], ' '), '') || chr(10) ||
       |    coalesce(array_to_string(t[33:40], ' '), '') AS text
       |  FROM toks),
       |l AS (
       |  SELECT doc_id,
       |    unnest(range(0, len(string_split(text, chr(10))))) AS line_no,
       |    unnest(string_split(text, chr(10))) AS line
       |  FROM ml)""".stripMargin

  val all: Seq[Q] = Seq(

    // Gopher-style repetition signals: distinct-token ratio plus the
    // share of the most frequent unigram / bigram. Low distinct ratio
    // or a dominant gram marks degenerate (loop-generated) text.
    Q(
      "q48_repetition",
      (s, dir) => CorpusOps.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |scalars AS (
              |  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
              |  FROM toks),
              |uni AS (
              |  SELECT doc_id, max(c) AS top_uni FROM (
              |    SELECT doc_id, tok, count(*) AS c
              |    FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
              |    GROUP BY doc_id, tok)
              |  GROUP BY doc_id),
              |bi AS (
              |  SELECT doc_id, max(c) AS top_bi FROM (
              |    SELECT doc_id, g, count(*) AS c
              |    FROM (SELECT doc_id,
              |            unnest(list_transform(range(1, len(t)),
              |              i -> t[i] || ' ' || t[i+1])) AS g
              |          FROM toks WHERE len(t) >= 2)
              |    GROUP BY doc_id, g)
              |  GROUP BY doc_id)
              |SELECT s.doc_id, n_tokens,
              |  round(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS distinct_ratio,
              |  round(CAST(coalesce(top_uni, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS top_unigram_frac,
              |  round(CAST(coalesce(top_bi, 0) AS DOUBLE) /
              |        CAST(nullif(n_tokens - 1, 0) AS DOUBLE), 4) AS top_bigram_frac
              |FROM scalars s
              |LEFT JOIN uni USING (doc_id)
              |LEFT JOIN bi USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // PII scrubbing: the corpus has no native PII, so each doc is
    // augmented with a deterministic synthetic contact line (email,
    // phone, IPv4 derived from doc_id) — the redactor then has real
    // work whose output both engines must reproduce byte-identically
    // (compared via md5 of the scrubbed text).
    Q(
      "q49_pii_scrub",
      (s, dir) => {
        val aug = augText
        Tables.documents(s, dir).select(
          col("doc_id"),
          regexp_count(aug, lit(TextOps.EmailRe)).cast("long").as("n_emails"),
          regexp_count(aug, lit(TextOps.PhoneRe)).cast("long").as("n_phones"),
          regexp_count(aug, lit(TextOps.Ipv4Re)).cast("long").as("n_ips"),
          md5(TextOps.redactPii(aug)).as("redacted_hash"))
          .orderBy(col("doc_id"))
      },
      Some {
        // DuckDB standard strings keep backslashes literal, so the Java
        // regex text embeds verbatim (no quotes appear in the patterns)
        val email = TextOps.EmailRe
        val phone = TextOps.PhoneRe
        val ip = TextOps.Ipv4Re
        s"""WITH aug AS (SELECT doc_id, $augSql AS a FROM documents)
           |SELECT doc_id,
           |  len(regexp_extract_all(a, '$email')) AS n_emails,
           |  len(regexp_extract_all(a, '$phone')) AS n_phones,
           |  len(regexp_extract_all(a, '$ip')) AS n_ips,
           |  md5(regexp_replace(regexp_replace(regexp_replace(a,
           |    '$email', '<EMAIL>', 'g'),
           |    '$phone', '<PHONE>', 'g'),
           |    '$ip', '<IP>', 'g')) AS redacted_hash
           |FROM aug ORDER BY doc_id""".stripMargin
      }),

    // Benchmark contamination: docs 0..49 stand in for the held-out
    // eval suite; every other document reports what fraction of its
    // word 3-grams leak from it. The benchmark gram set broadcasts —
    // the 100 TB-side scan never shuffles its grams.
    Q(
      "q50_contamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        CorpusOps.ngramContamination(
          docs.where(col("doc_id") >= BenchCutoff),
          docs.where(col("doc_id") < BenchCutoff),
          "doc_id", "text", ContaminationN)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |grams AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${ContaminationN - 2}),
              |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
              |  FROM toks WHERE len(t) >= $ContaminationN),
              |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < $BenchCutoff)
              |SELECT doc_id, count(*) AS n_grams,
              |  count(*) FILTER (g IN (SELECT g FROM bench)) AS n_contaminated,
              |  round(CAST(count(*) FILTER (g IN (SELECT g FROM bench)) AS DOUBLE) /
              |        CAST(count(*) AS DOUBLE), 4) AS contamination_frac
              |FROM grams WHERE doc_id >= $BenchCutoff
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Frequent n-gram mining: the top-k bigram phrases by total
    // occurrences (ties broken by gram text) with per-gram document
    // frequency — the mined boilerplate list that seeds line/shingle
    // blacklists. Spark's plan is explode → partial-agg groupBy →
    // TakeOrderedAndProject (per-partition heap, no full sort shuffle);
    // the oracle replays the same counts declaratively.
    Q(
      "q84_frequent_ngrams",
      (s, dir) => CorpusOps.frequentNgrams(
        Tables.documents(s, dir), "doc_id", "text", n = 2, k = 25),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |grams AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
              |    i -> t[i] || ' ' || t[i+1])) AS gram
              |  FROM toks WHERE len(t) >= 2)
              |SELECT gram, count(*) AS n_occurrences,
              |  count(DISTINCT doc_id) AS n_docs
              |FROM grams GROUP BY gram
              |ORDER BY n_occurrences DESC, gram
              |LIMIT 25""".stripMargin)),

    // Deterministic hash split: assignment is a pure function of the
    // doc id (stable across runs/machines/partitioning — never rand()).
    Q(
      "q51_split_assign",
      (s, dir) => CorpusOps.deterministicSplit(Tables.documents(s, dir), "doc_id")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"), col("split")),
      Some("""WITH b AS (
             |  SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 AS bucket
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
             |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // Inverted index: term -> df + first-10 ascending postings (the
    // cap is the operator's row-width bound; arrays serialize via the
    // proven join-as-string recipe for the comparator).
    Q(
      "q56_inverted_index",
      (s, dir) => CorpusOps.invertedIndex(Tables.documents(s, dir), "doc_id", "text",
        maxPostings = 10)
        .select(col("term"), col("df"),
          array_join(transform(col("postings"), p => p.cast("string")), "|")
            .as("postings"))
        .orderBy(col("term")),
      Some(s"""WITH t AS (
              |  SELECT doc_id, unnest(list_distinct(${LlmOps.tokSql})) AS term
              |  FROM documents)
              |SELECT term, count(*) AS df,
              |  array_to_string(list_sort(list(doc_id))[1:10], '|') AS postings
              |FROM t GROUP BY term ORDER BY term""".stripMargin)),

    // Sliding-window chunking: 40-token chunks, 8-token overlap —
    // every token covered, consecutive chunks share the overlap, final
    // chunk may run short. chunk_text rides whole so the gate hashes
    // the actual chunk payloads, not just counts.
    Q(
      "q55_chunking",
      (s, dir) => CorpusOps.chunk(Tables.documents(s, dir), "doc_id", "text",
        size = 40, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |starts AS (
              |  SELECT doc_id, t,
              |    unnest(range(1, greatest(len(t) - 8, 1) + 1, 32)) AS s
              |  FROM toks)
              |SELECT doc_id,
              |  CAST((s - 1) / 32 AS BIGINT) AS chunk_id,
              |  least(40, len(t) - s + 1) AS n_chunk_tokens,
              |  array_to_string(t[s:s+39], ' ') AS chunk_text
              |FROM starts ORDER BY doc_id, chunk_id""".stripMargin)),

    // Deterministic stratified sample: 20 docs per language in
    // md5-of-id order — reproducible eval-set construction (sample()
    // is neither cross-run nor cross-partitioning stable).
    Q(
      "q57_stratified_sample",
      (s, dir) => CorpusOps.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id")),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin)),

    // Span-level duplication: fraction of each doc's rolling 10-token
    // spans that also occur in another document — the partial-copy /
    // quotation signal doc-level dedup misses.
    Q(
      "q67_dup_passages",
      (s, dir) => CorpusOps.duplicatedPassages(Tables.documents(s, dir),
        "doc_id", "text", n = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |grams AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 8),
              |    i -> ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT)) AS g
              |  FROM toks WHERE len(t) >= 10),
              |dup AS (
              |  SELECT g FROM (
              |    SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
              |  WHERE df >= 2)
              |SELECT doc_id, count(*) AS n_spans,
              |  count(*) FILTER (g IN (SELECT g FROM dup)) AS n_dup_spans,
              |  round(CAST(count(*) FILTER (g IN (SELECT g FROM dup)) AS DOUBLE) /
              |        CAST(count(*) AS DOUBLE), 4) AS dup_frac
              |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Span-level duplication REMOVAL (the act to q67's diagnostic):
    // every token covered by a cross-document 10-token span is excised
    // and the survivor text rebuilt from the kept tokens. The oracle
    // replays the whole pipeline — span hashing, df>=2, coverage
    // expansion, positional anti-join, ordered reassembly — so the
    // rebuilt TEXT must match byte-for-byte, not just the counts.
    Q(
      "q93_passage_removal",
      (s, dir) => CorpusOps.removeDuplicatedPassages(Tables.documents(s, dir),
        "doc_id", "text", n = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |pre AS (
              |  SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS s
              |  FROM toks WHERE len(t) >= 10),
              |grams AS (
              |  SELECT doc_id, s,
              |    ('0x' || substr(md5(array_to_string(t[s:s+9], ' ')), 1, 15))::BIGINT AS g
              |  FROM pre),
              |dup AS (
              |  SELECT g FROM (
              |    SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
              |  WHERE df >= 2),
              |covoff AS (
              |  SELECT doc_id, s, unnest(range(0, 10)) AS off
              |  FROM grams WHERE g IN (SELECT g FROM dup)),
              |covered AS (SELECT DISTINCT doc_id, s + off AS p FROM covoff),
              |pos AS (
              |  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks),
              |tok AS (SELECT doc_id, p, t[p] AS tok FROM pos),
              |kept AS (
              |  SELECT k.doc_id, k.p, k.tok FROM tok k
              |  LEFT JOIN covered c ON k.doc_id = c.doc_id AND k.p = c.p
              |  WHERE c.p IS NULL),
              |reb AS (
              |  SELECT doc_id, count(*) AS n_kept,
              |    string_agg(tok, ' ' ORDER BY p) AS text_clean
              |  FROM kept GROUP BY doc_id)
              |SELECT b.doc_id,
              |  coalesce(r.text_clean, '') AS text_clean,
              |  CAST(len(b.t) AS BIGINT) AS n_tokens,
              |  CAST(len(b.t) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
              |FROM toks b LEFT JOIN reb r USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // Token budgeting: whitespace count vs BPE-ish pre-token count
    // (GPT-2-shape regex, RE2/Java-identical) over the augmented view —
    // the contact line's digits/punctuation is where the two estimates
    // diverge, as they do on real web text.
    Q(
      "q63_token_count",
      (s, dir) => {
        val aug = augText
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(TextOps.tokens(aug)).cast("long").as("n_ws_tokens"),
          TextOps.bpeishTokenCount(aug).as("n_bpeish"),
          round(TextOps.bpeishTokenCount(aug).cast("double") /
            size(TextOps.tokens(aug)).cast("double"), 4).as("bpeish_per_ws"))
          .orderBy(col("doc_id"))
      },
      Some {
        val pat = TextOps.BpeishRe.replace("'", "''")
        s"""WITH aug AS (SELECT doc_id, $augSql AS a FROM documents)
           |SELECT doc_id,
           |  len(string_split_regex(lower(a), '\\s+')) AS n_ws_tokens,
           |  len(regexp_extract_all(lower(a), '$pat')) AS n_bpeish,
           |  round(CAST(len(regexp_extract_all(lower(a), '$pat')) AS DOUBLE) /
           |        CAST(len(string_split_regex(lower(a), '\\s+')) AS DOUBLE), 4) AS bpeish_per_ws
           |FROM aug ORDER BY doc_id""".stripMargin
      }),

    // Corpus-wide exact line dedup (CCNet-style): every distinct line
    // survives once, at its smallest (doc_id, line_no); documents are
    // rebuilt from surviving lines in order. Doc-level dedup can't see
    // cross-document boilerplate — this is the operator that does.
    Q(
      "q60_line_dedup",
      (s, dir) => CorpusOps.dedupLines(multilineDocs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH $multilineSql,
              |surv AS (
              |  SELECT doc_id, line_no, line FROM l WHERE trim(line) <> ''
              |  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1
              |  UNION ALL
              |  SELECT doc_id, line_no, line FROM l WHERE trim(line) = ''),
              |reb AS (
              |  SELECT doc_id, count(*) AS n_lines_kept,
              |    string_agg(line, chr(10) ORDER BY line_no) AS text_deduped
              |  FROM surv GROUP BY doc_id)
              |SELECT m.doc_id,
              |  CAST(len(string_split(m.text, chr(10))) AS BIGINT) AS n_lines,
              |  CAST(coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
              |  coalesce(r.text_deduped, '') AS text_deduped
              |FROM ml m LEFT JOIN reb r USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // Boilerplate-line removal: a line in more than 3 DISTINCT docs is
    // chrome, not content — every occurrence goes (dedupLines keeps the
    // first; this keeps none). The boilerplate set is few distinct
    // strings by construction, so the verdict joins back broadcast.
    Q(
      "q61_boilerplate",
      (s, dir) => CorpusOps.stripBoilerplate(multilineDocs(s, dir), "doc_id", "text",
        maxDocs = 3)
        .orderBy(col("doc_id")),
      Some(s"""WITH $multilineSql,
              |boiler AS (
              |  SELECT line FROM (
              |    SELECT line, count(DISTINCT doc_id) AS line_df FROM l
              |    WHERE trim(line) <> '' GROUP BY line)
              |  WHERE line_df > 3),
              |kept AS (
              |  SELECT doc_id, line_no, line FROM l
              |  WHERE line NOT IN (SELECT line FROM boiler)),
              |reb AS (
              |  SELECT doc_id, count(*) AS n_lines_kept,
              |    string_agg(line, chr(10) ORDER BY line_no) AS text_stripped
              |  FROM kept GROUP BY doc_id)
              |SELECT m.doc_id,
              |  CAST(len(string_split(m.text, chr(10))) AS BIGINT) AS n_lines,
              |  CAST(coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
              |  coalesce(r.text_stripped, '') AS text_stripped
              |FROM ml m LEFT JOIN reb r USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // The composed quality-filter pipeline (C4/Gopher shape): token
    // count, stopword ratio, punctuation ratio, and chars-per-token
    // thresholds; per-language survival rates.
    Q(
      "q52_quality_filter",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val nTok = size(toks).cast("double")
        val nChars = length(col("text")).cast("double")
        val stopRatio = TextOps.stopwordCount(toks, LlmOps.stops).cast("double") / nTok
        val punctRatio = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
          .cast("double") / nChars
        val cpt = nChars / nTok
        val keep = size(toks).geq(10) && size(toks).leq(1000) &&
          stopRatio.geq(0.01) && punctRatio.leq(0.3) &&
          cpt.geq(3.0) && cpt.leq(12.0)
        Tables.documents(s, dir)
          .select(col("lang"), keep.as("keep"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), count(when(col("keep"), 1)).as("n_keep"))
          .select(col("lang"), col("n_docs"), col("n_keep"),
            round(col("n_keep").cast("double") / col("n_docs").cast("double"), 4)
              .as("keep_rate"))
          .orderBy(col("lang"))
      },
      Some {
        val stopList = LlmOps.stops.map(t => s"'$t'").mkString(", ")
        val tok = LlmOps.tokSql
        val stopR = s"CAST(len(list_filter($tok, t -> list_contains([$stopList], t))) AS DOUBLE) / CAST(len($tok) AS DOUBLE)"
        val punctR = s"CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
        val cpt = s"CAST(length(text) AS DOUBLE) / CAST(len($tok) AS DOUBLE)"
        s"""WITH k AS (
           |  SELECT lang,
           |    (len($tok) >= 10 AND len($tok) <= 1000 AND
           |     $stopR >= 0.01 AND $punctR <= 0.3 AND
           |     $cpt >= 3.0 AND $cpt <= 12.0) AS keep
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs, count(*) FILTER (keep) AS n_keep,
           |  round(CAST(count(*) FILTER (keep) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS keep_rate
           |FROM k GROUP BY lang ORDER BY lang""".stripMargin
      }),

    // Bigram LM fluency scoring (CCNet shape): the model is trained on
    // the corpus itself — self-scoring flags outlier documents whose
    // bigrams are rare against the corpus distribution.
    Q(
      "q68_lm_score",
      (s, dir) => CorpusOps.bigramLmScore(
        Tables.documents(s, dir), Tables.documents(s, dir),
        "doc_id", "text", k = 0.5)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |grams AS (
              |  SELECT doc_id,
              |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
              |  FROM toks WHERE len(t) >= 2),
              |uni AS (
              |  SELECT tok AS w1, count(*) AS c1
              |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
              |big AS (SELECT g, count(*) AS c2 FROM grams GROUP BY g),
              |v AS (SELECT count(*) AS vc FROM uni)
              |SELECT doc_id, count(*) AS n_bigrams,
              |  round(avg(-ln((c2 + 0.5) / (c1 + 0.5 * vc))), 4) AS avg_nll
              |FROM (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM grams)
              |JOIN big USING (g)
              |JOIN uni USING (w1)
              |CROSS JOIN v
              |GROUP BY doc_id
              |ORDER BY doc_id""".stripMargin)),

    // Temperature-based language rebalancing (alpha-sampling, alpha=0.5):
    // per-language keep rates (n_min/n_lang)^0.5, decided by md5-of-id.
    Q(
      "q69_temp_sample",
      (s, dir) => CorpusOps.temperatureSample(
        Tables.documents(s, dir), "lang", "doc_id", alpha = 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          round(min(col("keep_rate")), 4).as("keep_rate"))
        .orderBy(col("lang")),
      Some("""WITH c AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang),
             |m AS (SELECT min(n_stratum) AS nmin FROM c),
             |r AS (
             |  SELECT lang,
             |    pow(CAST(nmin AS DOUBLE) / CAST(n_stratum AS DOUBLE), 0.5) AS keep_rate
             |  FROM c CROSS JOIN m),
             |kept AS (
             |  SELECT d.lang, d.doc_id, r.keep_rate
             |  FROM documents d JOIN r USING (lang)
             |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS DOUBLE)
             |        / 16777216.0 < keep_rate)
             |SELECT lang, count(*) AS n_kept,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id,
             |  round(min(keep_rate), 4) AS keep_rate
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // BM25 ranked retrieval for a 3-term query, top 20 by rounded score
    // (rounded-score ordering keeps the cut deterministic cross-engine).
    Q(
      "q72_bm25",
      (s, dir) => CorpusOps.bm25(Tables.documents(s, dir), "doc_id", "text",
        Seq("join", "dup", "window"), k1 = 1.2, b = 0.75)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20),
      Some(s"""WITH toks AS (SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |lens AS (SELECT doc_id, len(t) AS dl FROM toks),
              |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
              |hits AS (
              |  SELECT doc_id, tok AS term
              |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
              |  WHERE tok IN ('join', 'dup', 'window')),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY doc_id, term),
              |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM hits) GROUP BY term)
              |SELECT doc_id,
              |  round(sum(
              |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
              |    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
              |FROM tf
              |JOIN df USING (term)
              |JOIN lens USING (doc_id)
              |CROSS JOIN stats
              |GROUP BY doc_id
              |ORDER BY bm25 DESC, doc_id
              |LIMIT 20""".stripMargin)),

    // Sequence packing: shard-local concat-then-chunk bin assignment,
    // summarized per bin. All-integer — exact in any engine.
    Q(
      "q73_seq_pack",
      (s, dir) => CorpusOps.packSequences(Tables.documents(s, dir), "doc_id", "text",
        binTokens = 512, shardDocs = 100)
        .groupBy(col("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("offset")).as("last_offset"))
        .orderBy(col("bin_id")),
      Some(s"""WITH base AS (
              |  SELECT doc_id, doc_id // 100 AS shard,
              |    len(${LlmOps.tokSql}) AS n_tokens
              |  FROM documents),
              |off AS (
              |  SELECT doc_id, shard, n_tokens,
              |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
              |  FROM base)
              |SELECT shard || ':' || ("offset" // 512) AS bin_id,
              |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              |  min(doc_id) AS first_doc, max("offset") AS last_offset
              |FROM off GROUP BY 1 ORDER BY bin_id""".stripMargin)),

    // CCNet head/middle/tail tiers: per-language ntile(3) over the
    // bigram-LM score (q68's signal composed with a ranking window) —
    // the bucketing CCNet uses to keep "head" (most fluent) data.
    // Scale note: ntile funnels each language through ONE window
    // partition (fine at gate SF, a sort bottleneck when one language
    // is most of a 100 TB corpus). The production variant computes the
    // two tercile BOUNDARIES per language with approx_percentile (one
    // partial-aggregated pass, k·2 doubles of state) and assigns tiers
    // by comparison — same buckets up to boundary ties, no global
    // sort. The gate keeps exact ntile because the oracle must match
    // row-for-row, which approximate boundaries cannot guarantee.
    Q(
      "q74_ppl_tiers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val scored = CorpusOps.bigramLmScore(docs, docs, "doc_id", "text", k = 0.5)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val w = Window.partitionBy(col("lang")).orderBy(col("avg_nll"), col("doc_id"))
        scored
          .withColumn("t", ntile(3).over(w))
          .withColumn("tier",
            when(col("t") === 1, "head").when(col("t") === 2, "middle")
              .otherwise("tail"))
          .groupBy(col("lang"), col("tier"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("avg_nll")), 4).as("mean_nll"),
            min(col("doc_id")).as("min_id"))
          .orderBy(col("lang"), col("tier"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${LlmOps.tokSql} AS t FROM documents),
              |grams AS (
              |  SELECT doc_id,
              |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
              |  FROM toks WHERE len(t) >= 2),
              |uni AS (
              |  SELECT tok AS w1, count(*) AS c1
              |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
              |big AS (SELECT g, count(*) AS c2 FROM grams GROUP BY g),
              |v AS (SELECT count(*) AS vc FROM uni),
              |scored AS (
              |  SELECT doc_id, round(avg(-ln((c2 + 0.5) / (c1 + 0.5 * vc))), 4) AS avg_nll
              |  FROM (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM grams)
              |  JOIN big USING (g) JOIN uni USING (w1) CROSS JOIN v
              |  GROUP BY doc_id),
              |tiered AS (
              |  SELECT d.lang, s.avg_nll,  s.doc_id,
              |    ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_nll, s.doc_id) AS t
              |  FROM scored s JOIN documents d USING (doc_id))
              |SELECT lang,
              |  CASE WHEN t = 1 THEN 'head' WHEN t = 2 THEN 'middle' ELSE 'tail' END AS tier,
              |  count(*) AS n_docs, round(avg(avg_nll), 4) AS mean_nll,
              |  min(doc_id) AS min_id
              |FROM tiered GROUP BY 1, 2 ORDER BY lang, tier""".stripMargin)),

    // Compression-ratio quality signal. DEFLATE has no SQL mirror
    // (rows-only by nature, like the media codecs); the row carries its
    // own evidence — raw sizes are oracle-comparable via n_chars, and
    // the ratio column is bounded (0, ~1.05] by construction. The spec
    // pins ordering (repetitive < prose < incompressible).
    Q(
      "q78_compression",
      (s, dir) => CorpusOps.compressionSignals(
        Tables.documents(s, dir), "doc_id", "text")
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("deflate_bytes"), col("ratio"))
        .orderBy(col("doc_id")),
      None),

    // Explicit-mixture materialization: the weights say en 40% / de,
    // es, fr 20% each (zh unweighted → drops), the scarcest stratum
    // (fr at sf0.01) caps the total, and the oracle replays the exact
    // min-cap + md5-uniform keep arithmetic. Downsample-only: a weight
    // a stratum cannot fill shrinks the whole mixture, never silently
    // re-normalizes.
    Q(
      "q102_mixture",
      (s, dir) => CorpusOps.mixToWeights(
        Tables.documents(s, dir), "lang", "doc_id",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          round(min(col("keep_rate")), 6).as("keep_rate"))
        .orderBy(col("lang")),
      Some("""WITH w(lang, w) AS (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2), ('fr', 0.2)),
             |c AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang),
             |s AS (SELECT lang, n_stratum, CAST(w AS DOUBLE) AS w,
             |        CAST(n_stratum AS DOUBLE) / CAST(w AS DOUBLE) AS cap
             |      FROM c JOIN w USING (lang)),
             |t AS (SELECT min(cap) AS t FROM s),
             |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE),
             |        w * t / CAST(n_stratum AS DOUBLE)) AS keep_rate
             |      FROM s CROSS JOIN t),
             |kept AS (
             |  SELECT d.lang, d.doc_id, r.keep_rate
             |  FROM documents d JOIN r USING (lang)
             |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS DOUBLE)
             |        / 16777216.0 < keep_rate)
             |SELECT lang, count(*) AS n_kept,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id,
             |  round(min(keep_rate), 6) AS keep_rate
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // Token-budget mixture: the production mix spec ("N tokens of X")
    // rather than row proportions — greedy md5-priority prefix per
    // stratum until the budget, the straddling document dropped, no
    // back-fill. The oracle replays the window cut exactly (n_chars
    // stands in for the token weight; the op takes any weight column).
    Q(
      "q111_token_budget",
      (s, dir) => CorpusOps.mixToTokenBudgets(
        Tables.documents(s, dir), "lang", "doc_id", col("n_chars"),
        Map("en" -> 40000L, "de" -> 15000L, "fr" -> 8000L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("kept_tokens"),
          max(col("cum_tokens")).cast("long").as("max_cum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang")),
      Some("""WITH b(lang, budget) AS (VALUES ('en', 40000), ('de', 15000), ('fr', 8000)),
             |ranked AS (
             |  SELECT d.lang, d.doc_id, d.n_chars, b.budget,
             |    sum(d.n_chars) OVER (PARTITION BY d.lang
             |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS cum_tokens
             |  FROM documents d JOIN b USING (lang)),
             |kept AS (SELECT * FROM ranked WHERE cum_tokens <= budget)
             |SELECT lang, count(*) AS n_kept,
             |  CAST(sum(n_chars) AS BIGINT) AS kept_tokens,
             |  CAST(max(cum_tokens) AS BIGINT) AS max_cum,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // DSIR-shaped hashed importance: the TARGET is the English slice,
    // features are 256 md5-hashed token buckets, and each document's
    // smoothed target/source bucket masses are EXACT integer sums the
    // oracle reproduces bucket by bucket. Top-20 by the (rounded)
    // mass ratio with doc_id tiebreak keeps the cut deterministic.
    Q(
      "q103_importance",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        CorpusOps.importanceMass(docs, docs.where(col("lang") === "en"),
          "doc_id", "text", buckets = 256)
          .select(col("doc_id"), col("n_tokens"), col("target_mass"),
            col("source_mass"), round(col("importance"), 6).as("importance"))
          .orderBy(round(col("importance"), 6).desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH tt AS (
             |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
             |  FROM documents WHERE lang = 'en'),
             |ct AS (SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS b,
             |         count(*) AS ct FROM tt GROUP BY 1),
             |st AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
             |  FROM documents),
             |sb AS (SELECT doc_id,
             |         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS b FROM st),
             |cs AS (SELECT b, count(*) AS cs FROM sb GROUP BY b),
             |mass AS (
             |  SELECT doc_id, count(*) AS n_tokens,
             |    CAST(sum(COALESCE(ct, 0) + 1) AS BIGINT) AS target_mass,
             |    CAST(sum(cs + 1) AS BIGINT) AS source_mass
             |  FROM sb LEFT JOIN ct USING (b) JOIN cs USING (b)
             |  GROUP BY doc_id)
             |SELECT doc_id, n_tokens, target_mass, source_mass,
             |  round(CAST(target_mass AS DOUBLE) / CAST(source_mass AS DOUBLE), 6) AS importance
             |FROM mass
             |ORDER BY importance DESC, doc_id LIMIT 20""".stripMargin))
  )
}
