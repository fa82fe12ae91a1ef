package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis functions for large-scale training-data
  * pipelines: tokenization, quality signals, language-ID scores, document
  * normalization/fingerprinting, and 64-bit SimHash.
  *
  * Everything here is built from codegen'd built-in expressions (split /
  * regexp_* / higher-order array functions) — no UDFs — so the whole text
  * surface stays inside WholeStageCodegen and distributes trivially: each
  * function is a per-row scalar over the `text` column.
  */
object Text {

  /** Whitespace tokens of the trimmed input (empty string → [""] — callers
    * that need emptiness-safety should filter `length(c) > 0`). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokensLower(c: Column): Column = tokens(lower(c))

  /** BPE-ish regex tokenizer: letter runs, digit runs, or single
    * non-alphanumeric marks — the classic pre-tokenization split. */
  def regexTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  def regexTokenCount(c: Column): Column = size(regexTokens(c))

  def punctCount(c: Column): Column = regexp_count(c, lit("[.,;:!?]"))

  /** Sum of token lengths (for mean-token-length quality signals). */
  def tokenCharSum(c: Column): Column =
    aggregate(transform(tokens(c), t => length(t)), lit(0), (acc, v) => acc + v)

  /** Number of token OCCURRENCES that appear in `words` (not distinct —
    * "the the the" counts 3). */
  def occurrenceCount(c: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    size(filter(tokensLower(c), t => array_contains(dict, t)))
  }

  /** Language-marker dictionaries for the n-gram/stopword language-ID
    * heuristic. Public-knowledge function words per language. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  /** Marker-occurrence score for one language. */
  def langScore(c: Column, lang: String): Column =
    occurrenceCount(c, langMarkers.toMap.apply(lang))

  /** Deterministic argmax over the language scores (ties resolved in
    * langMarkers order: en > de > fr > es). */
  def langPredict(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    scores.init.foldRight(lit(scores.last._1): Column) { case ((l, s), rest) =>
      val laterScores = scores.dropWhile(_._1 != l).tail.map(_._2)
      when(laterScores.foldLeft(lit(true): Column)((acc, o) => acc && s >= o), l)
        .otherwise(rest)
    }
  }

  /** Canonical text normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace — on the native one-pass fast path
    * ([[graft.plans.Normalize]]; bit-identical to [[normalizedPortable]],
    * NativeExprPropertySpec fuzzes the equivalence). Requires
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def normalized(c: Column): Column = call_function("graft_normalize", c)

  /** The portable composed form of [[normalized]] (what the DuckDB oracles
    * mirror): four passes — lowercase, two regex replaces, trim. Kept as
    * the native expression's reference twin. */
  def normalizedPortable(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Document fingerprint = md5 of the normalized text: case/punctuation/
    * spacing variants of the same content collide (the cheap near-dup
    * tier before MinHash). */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Word n-gram shingles joined with single spaces.
    *
    * NOTE for hot paths: pass an already-materialized token ARRAY column
    * (via [[ngramsFromTokens]] over a separate projection) rather than the
    * raw text — lambda bodies re-evaluate their argument expression per
    * element, so shingling straight off `split(text)` re-runs the split
    * once per shingle position. */
  def wordNgrams(c: Column, n: Int): Column = ngramsFromTokens(tokens(c), n)

  /** N-gram shingles from a token-array column. */
  def ngramsFromTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(ts) - (n - 1)),
        i => array_join(slice(ts, i, lit(n)), " ")))

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, ±1 vote per
    * bit position, sign of the vote sum becomes the output bit. Entirely
    * higher-order-function math — one pass over the token array per row.
    */
  def simhash64(c: Column): Column = {
    // fold over the token HASHES, not the tokens — a lambda body referencing
    // xxhash64(t) would recompute the hash once per bit position
    def bitSigns(h: Column): Column = array((0 until 64).map { i =>
      when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))
    }: _*)
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      transform(tokens(c), t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitSigns(h), (a, b) => a + b),
      acc => aggregate(zip_with(acc, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
        lit(0L), (a, b) => a.bitwiseOR(b)))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 60-bit engine-portable UNIFORM integer hash: the first 15 hex chars
    * of the md5 digest. Both engines produce identical hex (Spark `md5`
    * over utf-8 bytes == DuckDB `md5(VARCHAR)`) and can parse it
    * (`conv(...,16,10)` / `('0x'||substr(md5(x),1,15))::BIGINT`). Use
    * this — not [[rollingHash]] — wherever hash QUALITY matters
    * (sketches, sampling priorities): polynomial hashes of
    * near-consecutive keys form dense arithmetic runs whose bit fields
    * stay correlated (measured: an HLL keyed on rolling hashes
    * under-estimated by 40–80%). */
  def md5Long(c: Column): Column =
    call_function("graft_md5_long", c.cast("binary"))

  /** The portable composed form of [[md5Long]] (what the DuckDB oracles
    * mirror): md5 → 32-char hex string → substring → conv parse. Kept as
    * the native expression's reference twin (NativeExprPropertySpec pins
    * bit-equality). */
  def md5LongPortable(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private val RollPrime = 2147483647L // 2^31 - 1
  private val RollBase = 31L
  private val RollSeed = 7L

  /** Per-character codepoints of the input. */
  private def charCodes(c: Column): Column =
    transform(split(c, ""), ch => ascii(ch).cast("long"))

  /** Polynomial (Rabin–Karp) rolling hash of the whole string:
    * fold acc = (acc·31 + codepoint) mod (2³¹−1), seed 7 — pure integer
    * math, identical in any engine. Empty input hashes to the seed. */
  def rollingHash(c: Column): Column =
    when(length(c) === 0, lit(RollSeed))
      .otherwise(aggregate(charCodes(c), lit(RollSeed),
        (acc, o) => (acc * RollBase + o) % RollPrime))

  /** Rolling hashes of every k-length character window (portable
    * higher-order form — O(len·k) interpreted; see [[kgramHashesNative]]
    * for the O(len) codegen'd fast path with identical values). */
  def kgramHashes(c: Column, k: Int): Column =
    when(length(c) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), length(c) - (k - 1)),
        i => aggregate(charCodes(c.substr(i, lit(k))), lit(RollSeed),
          (acc, o) => (acc * RollBase + o) % RollPrime)))

  /** Codegen'd sliding-window k-gram hashes via the native
    * [[graft.plans.KgramHashes]] expression — bit-identical to
    * [[kgramHashes]], O(len) instead of O(len·k). Requires the session to
    * be built with `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def kgramHashesNative(c: Column, k: Int): Column = {
    // bit-identity with the HOF form is only defined for k > 0 (at k = 0
    // the HOF's `length < k` guard never fires and it yields len+1
    // seed-fold hashes, while the native loop yields an empty array)
    require(k > 0, s"graft_kgrams requires k > 0, got $k")
    call_function("graft_kgrams", c, lit(k))
  }

  /** Winnowing-style fingerprint: the minimum k-gram rolling hash —
    * overlapping content between documents yields matching fingerprints
    * with probability rising in the overlap length. Null for inputs
    * shorter than k. */
  def winnowFingerprint(c: Column, k: Int = 8): Column =
    array_min(kgramHashes(c, k))

  /** [[winnowFingerprint]] on the native k-gram fast path. */
  def winnowFingerprintNative(c: Column, k: Int = 8): Column =
    array_min(kgramHashesNative(c, k))

  /** Deterministic 62-bit SimHash from per-token Rabin–Karp hashes: two
    * independent 31-bit vote lanes (the token hash pushed through two fixed
    * affine diffusions mod 2³¹−1 — raw rolling hashes of short tokens
    * underfill the high bits, which would degenerate the high LSH bands),
    * concatenated as lane2 << 31 | lane1. Pure integer math — bit-identical
    * in any engine — unlike [[simhash64]]'s xxhash64 votes, so dedup built
    * on it is DuckDB-oracle-able. One fold pass over the token array. */
  def simhashDet(c: Column): Column = {
    def diffuse(h: Column, a: Long, b: Long): Column = (h * a + b) % RollPrime
    def bitSigns(h: Column): Column = array((0 until 31).map { i =>
      when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))
    }: _*)
    val powers = array((0 until 62).map(i => lit(1L << i)): _*)
    aggregate(
      // fold over the token HASHES (h is the fold value — computed once per
      // token); the two diffusions re-run per bit position but are 3 ops
      transform(tokens(c), t => rollingHash(t)),
      array_repeat(lit(0L), 62),
      (acc, h) => zip_with(acc,
        concat(bitSigns(diffuse(h, 1103515245L, 12345L)),
          bitSigns(diffuse(h, 69069L, 362437L))),
        (a, b) => a + b),
      acc => aggregate(zip_with(acc, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
        lit(0L), (a, b) => a.bitwiseOR(b)))
  }

  /** [[simhashDet]] on the native codegen'd fast path
    * ([[graft.plans.SimhashDet]]) — bit-identical values, one tight loop
    * per row instead of the interpreted 62-vote fold. Requires
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def simhashDetNative(c: Column): Column = call_function("graft_simhash", c)

  /** [[simhash64]] on the native codegen'd fast path
    * ([[graft.plans.Simhash64]]) — bit-identical, one loop per row
    * instead of the interpreted 64-vote HOF fold. */
  def simhash64Native(c: Column): Column = call_function("graft_simhash64", c)

  /** Deterministic minhash signature over a shingle-hash array: element j is
    * min over shingles of the fixed affine mixer (a_j·h + b_j) mod (2³¹−1),
    * a_j = 1 + j·1299721, b_j = 7 + j·104729. Unlike MLlib's seeded
    * MinHashLSH this is pure integer math — any engine (the DuckDB oracle
    * included) reproduces it bit-for-bit. No overflow: h < 2³¹ and
    * a_j < 2²⁴ keep every product under 2⁵⁶.
    *
    * Pass a MATERIALIZED shingle-array column (separate projection) — the
    * numHashes transform lambdas each reference it, so an inline expression
    * would re-evaluate the whole shingle pipeline per hash function. */
  def minhashSignatures(shingles: Column, numHashes: Int = 12): Column =
    array((0 until numHashes).map { j =>
      val a = 1L + j * 1299721L
      val b = 7L + j * 104729L
      array_min(transform(shingles, h => (h * a + b) % RollPrime))
    }: _*)

  /** Fused native minhash signature straight from the normalized string —
    * bit-identical to
    * `minhashSignatures(array_distinct(kgramHashesNative(c, k)), numHashes)`
    * (the distinct cannot change any minimum; NativeExprPropertySpec
    * fuzzes the equivalence) in ONE sliding-window pass with no
    * intermediate arrays ([[graft.plans.MinhashSig]]). Requires
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def minhashSigNative(c: Column, k: Int = 8, numHashes: Int = 12): Column =
    call_function("graft_minhash_sig", c, lit(k), lit(numHashes))

  /** Fused native `[n_grams, n_distinct]` k-gram counts — bit-identical to
    * `[size(g), size(array_distinct(g))]` over `g = kgramHashesNative(c, k)`
    * without materializing either array ([[graft.plans.KgramStats]]).
    * Requires `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def kgramStatsNative(c: Column, k: Int): Column =
    call_function("graft_kgram_stats", c, lit(k))
}
