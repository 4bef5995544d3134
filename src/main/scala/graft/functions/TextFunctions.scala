package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting, shingling.
  *
  * All pure Catalyst expressions (split / higher-order array functions /
  * hash) — codegen'd, no UDFs, so a 100 TB scan stays in WholeStageCodegen.
  * Token model is deliberately ASCII-regex based so the DuckDB oracle can
  * reproduce it exactly.
  */
object TextFunctions {

  /** Lowercased word tokens; empty fragments removed.
    *
    * The `*Of(toks)` variants below take a pre-computed token array so hot
    * paths can tokenize ONCE (ideally with the native
    * [[graft.plans.TextNative.tokens]], bit-identical output) and fan the
    * array into several measures, instead of re-running the tokenizer
    * inside every HOF composition. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace-ish token count (the reference's len(text.split())). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish proxy: number of subword units if words split every 4 chars
    * (ceil(len/4) summed over tokens) — a cheap deterministic stand-in for a
    * real tokenizer's token count. */
  def subwordCount(text: Column): Column = subwordCountOf(tokens(text))

  def subwordCountOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with", "by", "at", "from", "as", "this", "that")

  /** Fraction of tokens that are English stopwords. Deliberately NOT
    * rounded: the raw int/int double division is bit-identical across
    * engines, while rounding a dyadic ratio (e.g. x/128) can round-half
    * differently between engines. */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  def stopwordRatioOf(toks: Column): Column = {
    val hits = size(filter(toks, t => t.isInCollection(stopwordsEn)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** n-gram heuristic language ID. The stopword tables are tiny on purpose:
    * the point is the *operator shape* (per-language evidence scores +
    * deterministic argmax), which scales as a single projection. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "un", "una", "por", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que", "du"))

  /** Detected language code, or "und" when no evidence. Ties break by the
    * fixed language order above (deterministic). CJK is detected by
    * codepoint range before the stopword vote. */
  def detectLang(text: Column): Column = detectLangOf(text, tokens(text))

  def detectLangOf(text: Column, toks: Column): Column = {
    val scores = langStopwords.map { case (lang, words) =>
      (lang, size(filter(toks, t => t.isInCollection(words))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val vote = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(vote)
  }

  /** Heuristic document quality score in [0,1]: rewards mid-length docs,
    * healthy alphabetic ratio, presence of stopwords; penalizes
    * over-punctuation. Deterministic arithmetic, rounded. */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  def qualityScoreOf(text: Column, toks: Column): Column = {
    val len       = length(text).cast("double")
    val alpha     = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val punct     = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val alphaR    = when(len > 0, alpha / len).otherwise(lit(0.0))
    val punctR    = when(len > 0, punct / len).otherwise(lit(0.0))
    val lenScore  = least(len / lit(200.0), lit(1.0))
    val raw = lenScore * 0.3 + alphaR * 0.4 + stopwordRatioOf(toks) * 0.3 - punctR * 0.5
    round(greatest(least(raw, lit(1.0)), lit(0.0)), 6)
  }

  /** Rolling fingerprint over tokens (Rabin-Karp style chaining):
    * acc = xxhash64(acc, hash(token)), over tokens in order — order-
    * sensitive like a polynomial hash but overflow-free under ANSI mode.
    * Stable across partitions/executors; not oracle-replicable
    * (engine-specific hash). */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, xxhash64(t)))

  /** 60-bit hash from the md5 hex prefix — replicable in DuckDB as
    * ('0x'||substr(md5(x),1,15))::BIGINT, unlike engine-native xxhash64.
    * 15 hex chars = 60 bits, always < 2^63, so the signed cast is safe. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 28-bit md5-prefix hash (same idea as [[md5Hash60]]) — small enough
    * that a 31x multiply-accumulate chain mod 2^31-1 never overflows a
    * long under ANSI mode. */
  def md5Hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Oracle-replicable rolling fingerprint: polynomial chain of 28-bit
    * md5-prefix token hashes mod the Mersenne prime 2^31-1 — order-
    * sensitive like [[fingerprint]], but every step is expressible in
    * DuckDB (list_reduce over the same token list), so the driver can
    * hash-verify it instead of a rows-only check. */
  def fingerprintPortable(text: Column): Column =
    fingerprintPortableOf(tokens(text))

  def fingerprintPortableOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * lit(31L) + md5Hash28(t)) % lit(2147483647L))

  /** Word-level shingles of size n, as strings ("w1 w2 ... wn").
    *
    * Implementation note: built by zipping n shifted slices of the token
    * array rather than indexing `toks` inside a `transform` lambda — an
    * expensive column referenced inside a higher-order lambda is
    * re-evaluated once PER ELEMENT (and projection collapse inlines the
    * whole tokenizer there), which turns a linear scan quadratic. The zip
    * shape evaluates the tokenizer a constant number of times per row. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = greatest(size(toks) - (n - 1), lit(0))
    val shifted = (1 to n).map(off => slice(toks, lit(off), m))
    when(size(toks) >= n,
      transform(arrays_zip(shifted: _*),
        st => concat_ws(" ", (0 until n).map(i => st.getField(i.toString)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Character n-grams of the lowercased text (for n-gram Jaccard). */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    val idx = sequence(lit(1), greatest(length(t) - (n - 1), lit(1)))
    transform(idx, i => t.substr(i, lit(n)))
  }
}
