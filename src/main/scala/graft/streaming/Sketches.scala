package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.native

/** Streaming sketches — the per-window approximate observability layer
  * of a training-data ingest (distinct sources per hour, token
  * frequency spikes, "is this doc in the blocked set") at a fixed state
  * budget per window.
  *
  * The batch sketch kernels ([[graft.functions.Sketches]]) are ordinary
  * Catalyst aggregates, so the streaming story is Structured
  * Streaming's own windowed aggregation: state per (key, window) is ONE
  * sketch buffer (256 B HLL / 24 KiB CMS), micro-batch partials merge
  * through the aggregate's `merge` (register max / counter add — both
  * order- and batching-independent), and the watermark retires window
  * state exactly as for built-in aggs. No custom StatefulProcessor is
  * needed — that is the point: sketches make "distinct per window" a
  * BOUNDED-state streaming aggregation, where exact distinct state
  * grows with the key universe.
  *
  * SketchStreamSpec pins batch parity bit-for-bit: any chunking of the
  * stream produces the batch pipeline's registers, hence its exact
  * estimate bits (the PackingStreamSpec contract, applied to sketches).
  */
object Sketches {

  /** Approximate distinct `valueCol` per (`keyCols`, event-time window):
    * watermarked windowed aggregation whose state per group is one
    * 256-byte HLL sketch. Emits the sketch itself (for downstream
    * [[graft.functions.native.hll_merge]] rollups — e.g. hourly sketches
    * re-merged into daily cardinalities without re-reading data) plus
    * its deterministic estimate.
    */
  def windowedDistinct(df: DataFrame, eventTimeCol: String, windowDuration: String,
                       delay: String, keyCols: Seq[Column], valueCol: Column): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(keyCols :+ window(col(eventTimeCol), windowDuration): _*)
      .agg(native.hll_sketch(valueCol.cast("string")).as("hll"))
      .withColumn("distinct_est", native.hll_estimate(col("hll")))
      .withColumn("nonzero_registers", native.hll_nonzero(col("hll")))

  /** Count-Min frequency grid per (`keyCols`, event-time window): one
    * 24 KiB counter grid per group; point-query the emitted sketch with
    * [[graft.functions.native.cms_query]] (e.g. per-hour frequency of a
    * watchlist of tokens, without a per-token group). */
  def windowedFrequencies(df: DataFrame, eventTimeCol: String, windowDuration: String,
                          delay: String, keyCols: Seq[Column], valueCol: Column): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(keyCols :+ window(col(eventTimeCol), windowDuration): _*)
      .agg(native.cms_sketch(valueCol.cast("string")).as("cms"))

  /** Log-histogram bucket counts per (`keyCols`, event-time window)
    * over a positive long `valueCol` — the streaming face of
    * `sketch_quantile_hist`'s bucket build, on the SAME
    * [[graft.functions.Sketches.logBucket]] binning. State per group is
    * one long counter per populated bucket (≤ ~1024); counts merge by
    * addition across micro-batches and re-merge across windows for
    * rollups. The ≤1024-row quantile walk (rank → bucket →
    * [[graft.functions.Sketches.bucketLo]]/`bucketHi` bounds) belongs
    * in the consumer — `foreachBatch` or a downstream report join — not
    * in the stream. */
  def windowedHistogram(df: DataFrame, eventTimeCol: String, windowDuration: String,
                        delay: String, keyCols: Seq[Column], valueCol: Column): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(keyCols ++ Seq(window(col(eventTimeCol), windowDuration),
        graft.functions.Sketches.logBucket(valueCol).as("bucket")): _*)
      .agg(count(lit(1)).as("c"))

  /** Tag a stream against a batch-built Bloom bitset (the nightly
    * blocked-set build of `sketch_bloom_decontaminate`): `bits` is the
    * ONE-ROW DataFrame produced by `agg(bloom_sketch(...))`; the stream
    * side stays narrow — a broadcast of 2 KiB attaches the bitset and
    * `bloom_contains` filters in-row, whatever the blocked set's true
    * size. No false negatives: a `bloom_hit = false` row is PROVABLY not
    * in the blocked set; hits carry the documented FP rate and go to
    * exact verification downstream (the engine's filter-verify shape).
    */
  def tagBlocked(stream: DataFrame, bits: DataFrame, valueCol: Column): DataFrame =
    stream.crossJoin(broadcast(bits))
      .withColumn("bloom_hit", native.bloom_contains(col("bits"), valueCol.cast("string")))
      .drop("bits")
}
