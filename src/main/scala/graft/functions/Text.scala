package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (BASELINE.json scope
  * extension): normalization, tokenization, shingling, and a deterministic
  * md5-derived 64-bit hash that is reproducible in any engine (the DuckDB
  * oracle mirrors it as `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`).
  *
  * Everything here is pure Catalyst column arithmetic — codegen'd, no UDFs —
  * so the hot dedup paths stay inside whole-stage codegen at 100 TB.
  */
object Text {

  /** Whitespace-collapsed, lower-cased canonical form. Lowering is the
    * locale-pinned [[RootLower]], NOT `lower()`: Spark's non-ASCII path
    * lowers through the JVM default locale, which would give a
    * Turkish-locale executor different signatures than the rest of the
    * cluster (and than the Scala-side kernels, which pin Locale.ROOT).
    */
  def norm(c: Column): Column = trim(regexp_replace(RootLower(c), "\\s+", " "))

  /** Whitespace tokens of the canonical form. */
  def tokens(c: Column): Column = split(norm(c), " ")

  /** Deterministic 60-bit positive hash from the md5 hex prefix. */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Content fingerprint (rolling-hash analogue): md5 of the canonical form. */
  def fingerprint(c: Column): Column = md5(norm(c).cast("binary"))

  /** Word k-gram shingles from an already-materialized token-array COLUMN
    * (empty array when shorter than k tokens — mirrors generate_series
    * emptiness in SQL). Callers must materialize the tokens in their own
    * projection first: putting `tokens(text)` directly in here would place
    * the whole regex/split subtree inside the `transform` lambda, and
    * Catalyst re-evaluates lambda-captured subtrees once PER ELEMENT —
    * measured 12s → 1s on 5000 docs.
    */
  def shinglesFromTokens(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k)))))
      .otherwise(array())

  /** Count of regex matches (shared stopword machinery for lang-id/quality). */
  def patternCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("int")

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
    * punctuation. Valid in both Java regex and RE2 so the oracle mirrors it
    * verbatim via `regexp_extract_all`.
    */
  val BpePattern = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"

  /** PRE-TOKEN count under the pattern — the cheap column-level proxy for
    * corpus triage (quality features, token_stats). Operators that budget
    * REAL tokenizer tokens (token-budget selection, packing, chunking) use
    * the merges-table encoder instead: [[Bpe]] / `TextOps.bpeEncode`.
    */
  def bpeTokenCount(c: Column): Column = patternCount(c, BpePattern)
}
