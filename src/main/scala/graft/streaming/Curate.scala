package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Curation

/** The curation stage (queries/CurationOps) on unbounded streams: PII
  * scrubbing and Gopher repetition quality-filtering are per-DOCUMENT
  * decisions, so their streaming form is stateless — zero state, zero
  * shuffle, valid in append mode with no watermark. Both transforms are
  * spec'd bit-identical to the batch path (CurateStreamSpec), so a
  * pipeline can curate live ingest and a backfill with the same verdicts.
  *
  * Reference frame: streamz has no curation surface; this mirrors its
  * `Stream.map/filter` composition (reference streamz/core.py:680) over
  * the operators a training-data pipeline needs.
  */
object Curate {

  /** Chained email → IPv4 → long-digit-run scrub with chain-positional
    * per-class counts — the text_pii_redact semantics: n_ip counts on
    * the email-redacted string and n_longnum on the ip-redacted one, so
    * digits inside an email or IP are never double-counted. Adds
    * `redacted, n_email, n_ip, n_longnum`. Narrow per-row plan. */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val r1 = regexp_replace(col(textCol), Curation.EmailRe, "<EMAIL>")
    val r2 = regexp_replace(r1, Curation.Ipv4Re, "<IP>")
    df.withColumn("redacted", regexp_replace(r2, Curation.LongNumRe, "<NUM>"))
      .withColumn("n_email",
        regexp_count(col(textCol), lit(Curation.EmailRe)).cast("long"))
      .withColumn("n_ip", regexp_count(r1, lit(Curation.Ipv4Re)).cast("long"))
      .withColumn("n_longnum",
        regexp_count(r2, lit(Curation.LongNumRe)).cast("long"))
  }

  /** HTML main-text extraction per document — drop script/style bodies
    * and comments, strip tags, decode the six core entities, collapse
    * whitespace (the text_html_extract semantics). Adds
    * `<htmlCol>_main`. Stateless narrow map. */
  def htmlExtract(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn(s"${htmlCol}_main", Curation.htmlExtract(col(htmlCol)))

  /** Web-text normalization per document — NFC (zero-copy on pure-ASCII
    * rows), C0/DEL control strip, whitespace-run collapse, trim. Adds
    * `<textCol>_norm`. Stateless narrow map; bit-identical to the batch
    * text_normalize path by construction (one shared transform). */
  def normalize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(s"${textCol}_norm", Curation.normalizeText(col(textCol)))

  /** The C4 + Gopher doc-level heuristic battery + keep verdict — the
    * quality_heuristics semantics on a live stream. Stateless: every
    * rule is a per-document measure, so append mode needs no watermark
    * and no state. Shared with the batch query via
    * [[Curation.qualityHeuristics]]. */
  def qualityHeuristics(df: DataFrame, textCol: String,
                        minWords: Long, minMeanWordLen: Double,
                        maxMeanWordLen: Double, minStopHits: Long,
                        stops: Seq[String]): DataFrame =
    Curation.qualityHeuristics(df, textCol,
      minWords, minMeanWordLen, maxMeanWordLen, minStopHits, stops)

  /** Gopher repetition metrics + keep verdict per document — the
    * O(doc-length) per-row kernel rather than an explode + keyed
    * aggregation: a streaming aggregation would need shuffle state and
    * a watermark for what is a purely per-document measure. Shared with
    * the batch query via [[Curation.qualityRepetition]], spec'd
    * bit-identical to the distributed explode+agg path. */
  def qualityRepetition(df: DataFrame, idCol: String, textCol: String,
                        maxTop2GramFrac: Double, maxDup2GramFrac: Double,
                        maxDupWordFrac: Double): DataFrame =
    Curation.qualityRepetition(df, idCol, textCol,
      maxTop2GramFrac, maxDup2GramFrac, maxDupWordFrac)

  /** Context-window chunking on a stream — per-document, so stateless:
    * a document chunks identically whether it arrived live or in a
    * backfill (shared with the chunk_documents query via
    * [[Curation.chunkDocuments]]; parity spec'd in CurateStreamSpec). */
  def chunk(df: DataFrame, textCol: String, win: Int, stride: Int): DataFrame =
    Curation.chunkDocuments(df, textCol, win, stride)
}
