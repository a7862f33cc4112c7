package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators.
  *
  * Everything here is built from codegen'd Catalyst expressions — no
  * UDFs — so the hot path stays inside whole-stage codegen and the same
  * logic is expressible in ANSI SQL for the correctness oracle.
  *
  * Cross-engine determinism contract: hashes are md5 hex strings
  * (identical in every engine), folds are index-ascending, and ratios are
  * exact integer counts divided in double precision.
  */
object TextOps {

  /** Whitespace tokenization over lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Character n-gram shingles, one per start offset; texts shorter than
    * `n` yield their single truncated tail (same semantics as SQL
    * substring past end-of-string). Declarative reference version —
    * interpreted per element; hot paths use the bit-identical native
    * CharShingles expression via Dedup.shingleSet.
    */
  def charShinglesHof(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Native codegen'd shingles (requires GraftFunctions registration —
    * DataFrame-level callers like Dedup.shingleSet handle that).
    */
  def charShingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.char_shingles(text, n)

  /** Word n-grams as space-joined strings over a token array; fewer
    * than `n` tokens yields an empty array (NOT a truncated gram —
    * contamination checks must never match partial grams). Native
    * codegen'd expression (requires GraftFunctions registration —
    * callers handle that); [[wordNgramsHof]] is the bit-identical
    * declarative reference on NON-NULL input. NULL-input divergence
    * (spec-pinned): the native expression null-propagates (NULL token
    * array → NULL), while the HOF's when/otherwise yields an empty
    * array — indistinguishable to every current caller (all explode the
    * result, and explode emits no rows for NULL and empty alike), but a
    * non-explode caller over nullable text must pick a side explicitly.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    graft.functions.GraftFunctions.word_ngrams(toks, n)

  /** Declarative reference version of [[wordNgrams]] — interpreted
    * per element (HOF lambdas don't codegen), kept for the equivalence
    * spec; hot paths use the native expression.
    */
  def wordNgramsHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** PII patterns shared by the redactor, its counts, and the SQL
    * oracle — deliberately restricted to syntax RE2 and Java regex
    * interpret identically (char classes, bounded repetition, \b).
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Scrub emails, then phone numbers, then IPv4 addresses (the order
    * matters: the placeholders contain no digits or dots, so later
    * passes cannot re-match earlier replacements). Pure codegen'd
    * regexp_replace chain — runs inside whole-stage codegen.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** BPE-ish pre-tokenization pattern (GPT-2 shape, lookahead-free so
    * RE2 and Java regex match identically — probed on both): common
    * contractions, then space-prefixed letter runs / digit runs /
    * punctuation runs, then bare whitespace. Token COUNT under this
    * pattern is the budgeting estimate a training pipeline uses before
    * the real tokenizer runs — whitespace counts undershoot badly on
    * punctuation- or digit-heavy text.
    */
  val BpeishRe = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"

  /** Number of BPE-ish pre-tokens (see [[BpeishRe]]); pure codegen'd
    * regexp count, no explode.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpeishRe)).cast("long")

  /** Canonical form for content fingerprinting: lowercase, alnum only. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** Content fingerprint of the canonical form. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** How many tokens fall in `stops` (with duplicates). */
  def stopwordCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*)))

  /** High bit of the j-th (1-based) hex digit of md5(token) — the
    * deterministic "random" bit used by the SimHash sketch.
    */
  def md5Bit(token: Column, j: Int): Column =
    substring(md5(token), j, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")

  /** Non-overlapping occurrences of a literal substring, via
    * length-delta of replace-all — integer-exact in any engine, no
    * regex. (count = (len - len_without) / len(pat).)
    */
  def substringCount(text: Column, pat: String): Column = {
    require(pat.nonEmpty)
    // divide by CODE POINTS, not UTF-16 units — length() counts code
    // points, so a non-BMP pattern char would halve the count otherwise
    val patLen = pat.codePointCount(0, pat.length)
    ((length(text) - length(replace(text, lit(pat), lit("")))) / lit(patLen))
      .cast("long")
  }

  /** Character n-gram language-ID heuristic: each language scores by
    * the total count of its characteristic n-grams; argmax with a fixed
    * tiebreak order. Returns (scores..., predicted) columns — the
    * profiles travel with the caller so the oracle can mirror exactly.
    */
  def langNgramScore(text: Column, ngrams: Seq[String]): Column =
    ngrams.map(substringCount(text, _)).reduce(_ + _)

  /** Polynomial rolling hash over characters: h = (h*31 + codepoint)
    * mod (2^31-1), folded left-to-right from 0. Values stay < 2^36, so
    * 64-bit integer arithmetic is exact — identical in any engine.
    * (Declarative HOF fold: one pass per document, cold path.)
    */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(charShinglesHof(text, 1), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(2147483647L)))
}
