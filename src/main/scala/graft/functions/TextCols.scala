package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines, all as
  * pure Catalyst column expressions (codegen'd, DuckDB-oracle-compatible).
  *
  * These extend the engine beyond the reference's surface (SURVEY.md §2 has
  * no text ops) with the operators an LLM-data pipeline needs: token
  * counting, quality scoring, language ID, document fingerprinting.
  */
object TextCols {

  /** Whitespace tokens (single-space convention of the documents table). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Count of `markers` present in the distinct token set. Computed as a
    * filter over the marker list so Spark and DuckDB agree exactly. */
  def markerHits(text: Column, markers: Seq[String]): Column = {
    val dt = distinctTokens(text)
    size(filter(array(markers.map(lit): _*), m => array_contains(dt, m)))
  }

  /** Type-token ratio: distinct tokens / tokens (lexical diversity). */
  def uniqueRatio(text: Column): Column =
    size(distinctTokens(text)).cast("double") / size(tokens(text))

  /** Mean token length in characters. */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text))

  /** Small function-word sets per language for the n-gram/marker heuristic
    * language ID. Deterministic tie-break: first language in this order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "por", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "den", "von"),
    "it" -> Seq("il", "la", "che", "di", "e", "per", "una", "sono"))

  /** Heuristic language ID: language with the most marker hits; "und" when
    * nothing matches. Ties resolve to the earliest language in LangMarkers. */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, markers) =>
      (lang, markerHits(text, markers))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h > 0 && h === best, lit(lang)).otherwise(acc)
    }
  }

  /** Stopword ratio: distinct-stopword hits / distinct tokens (English
    * function words; a standard quality signal). */
  def stopwordRatio(text: Column): Column =
    markerHits(text, LangMarkers.head._2).cast("double") /
      size(distinctTokens(text))

  /** Composite quality score in [0,1]: blends length saturation, lexical
    * diversity, and stopword presence. Deterministic, oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(size(tokens(text)).cast("double") / 100.0, lit(1.0))
    val diversity = uniqueRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    lenScore * 0.3 + diversity * 0.4 + stop * 0.3
  }

  /** '_'-joined n-token shingles of a whitespace-tokenized text; texts
    * shorter than n collapse to one whole-text shingle (documents must
    * not silently vanish from shingle-based ops). Shared convention with
    * the Jaccard/decontamination operators (CorpusOps delegates here). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // bind the token array ONCE per row via a 1-element transform: with
    // the split() inlined into each element_at, Spark re-evaluates the
    // tokenization per shingle element (no subexpression elimination
    // inside lambdas) — measured 9x slower on the sf0.1 corpus
    val sh = flatten(transform(array(toks), t =>
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws("_", (0 until n).map(j => element_at(t, i + j + 1)): _*))))
    when(size(toks) < lit(n), array(regexp_replace(text, " ", "_")))
      .otherwise(sh)
  }

  /** Occurrence count of the single most frequent token — integer, O(d*n)
    * per row over the distinct set, no shuffle. */
  def maxTokenCount(text: Column): Column =
    // same once-per-row binding trick as shingles: the token array must
    // not re-tokenize inside the per-distinct-token filter lambda
    array_max(flatten(transform(array(tokens(text)), t =>
      transform(array_distinct(t), x => size(filter(t, y => y === x))))))

  /** Gopher-style repetition signal: fraction of n-gram occurrences that
    * are repeats of an earlier n-gram, `1 - distinct/total` (0 when every
    * n-gram is unique). One integer division then a subtraction — the
    * exact arithmetic shape the oracle mirrors. */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val sh = shingles(text, n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  /** Canonical document fingerprint: md5 of the lower-cased,
    * whitespace-collapsed text. Identical fingerprints = exact duplicates
    * up to case/whitespace. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** BPE-ish subword tokenization: letter runs, digit runs, and
    * punctuation runs (the GPT-2 pre-tokenizer shape without merges).
    * Kept to a regex subset with identical semantics in Spark (Java regex)
    * and DuckDB (RE2) so it is oracle-checkable. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** First 32 bits of md5(token) as a non-negative long — a per-token hash
    * both Spark and DuckDB compute bit-identically
    * (`('0x' || substr(md5(t),1,8))::BIGINT` on the DuckDB side), which
    * keeps the rolling fingerprint oracle-checkable. */
  def md5Bits32(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Rolling polynomial fingerprint of the token sequence (base-31 over
    * 32-bit md5 token hashes mod the Mersenne prime 2^31-1) — an
    * order-sensitive content signature, unlike the set-based md5
    * fingerprint. The modulus keeps every step well inside long range
    * (ANSI-safe). Pure Catalyst fold. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(7919L),
      (acc, t) => pmod(acc * lit(31L) + md5Bits32(t), lit(2147483647L)))
}
