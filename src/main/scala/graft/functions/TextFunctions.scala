package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for training-data pipelines:
  * tokenization, shingling, quality ratios, language scoring, and document
  * fingerprints. Everything here is a narrow per-row expression — no
  * shuffles — so these compose into scans that stay embarrassingly
  * parallel at any scale. The oracle-checked queries in
  * `graft.queries.TextOps` / `DedupOps` are built from these.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (the reference's
    * `bytes.split` / `str.split` convention, examples/network_wordcount.py:11).
    * Native kernel — equivalent to `filter(split(text, " "), _ =!= "")`
    * but a single codegen-compatible pass (NativeHashSpec pins equality).
    */
  def tokens(text: Column): Column = native.tokens(text)

  /** Distinct 3-token shingles of a text column (empty when < 3 tokens),
    * first-occurrence order. Native kernel — equivalent to
    * `array_distinct(transform(sequence(1, n-2), i → concat_ws(" ", ...)))`
    * over [[tokens]], in one pass with no intermediate arrays. */
  def shingles3(text: Column): Column = native.shingles3(text)

  /** Distinct-token / total-token ratio (lexical diversity). */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks)

  /** Stopword-hit count for one language's stopword list (language-ID
    * scoring: compute per candidate language, take the argmax). */
  def langScore(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast("long")

  /** Content-defined document fingerprint: min MD5 over the 3-token
    * shingles — stable under re-chunking and order-independent. */
  def fingerprint(sharr: Column): Column =
    array_min(transform(sharr, s => md5(s)))

  /** BPE-ish subword count: whitespace tokens further split at
    * letter/digit/punctuation boundaries (a cheap, deterministic stand-in
    * for a real tokenizer's token count). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, """\s+|(?<=[a-zA-Z])(?=\d)|(?<=\d)(?=[a-zA-Z])|(?=[^\sa-zA-Z0-9])"""), t => t =!= ""))
}
