package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the document-pipeline operators (tokenize, shingle,
  * hash-signature) — all built-in codegen'd functions, no UDFs.
  *
  * The testdata `documents.text` is single-space-separated tokens, so the
  * simple split is exact there; `tokensWs` is the general whitespace+regex
  * variant for messier input.
  */
object TextFunctions {
  /** Exact single-space tokenizer (matches DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace-robust tokenizer (BPE-ish: splits on any non-word run). */
  def tokensWs(text: Column): Column =
    filter(split(text, "\\W+"), t => length(t) > 0)

  /** Word k-shingles: n_tok-k+1 strings of k space-joined tokens; if the
    * doc has fewer than k tokens, one shingle = the whole text. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
    .otherwise(array(concat_ws(" ", toks)))

  /** Strict word k-shingles: empty array (not whole-text fallback) when
    * the doc has fewer than k tokens — for overlap/repetition ops where
    * a degenerate shingle would fabricate matches. */
  def shinglesStrict(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
    .otherwise(array().cast("array<string>"))

  /** One MinHash signature slot: min over re-hashed shingle hashes.
    * Slot independence comes from mixing the slot index into xxhash64
    * (rather than a*h+b permutation arithmetic, which trips Spark 4's
    * default ANSI overflow checking). `h` = xxhash64(shingle). */
  def minhashSlot(h: Column, i: Int): Column = min(xxhash64(h, lit(i)))
}
