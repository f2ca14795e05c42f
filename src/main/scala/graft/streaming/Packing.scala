package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming GPT-style sequence packing — the unbounded counterpart of
  * `functions.Curation.packSequences`: documents arrive continuously,
  * each shard keeps a running char/token offset in the state store, and
  * every doc is assigned its training-window coordinates the moment it
  * is admitted. Built directly on [[Stateful.scan]] (a per-key running
  * fold), so restart-resume, RocksDB spillability, and in-batch `seq`
  * ordering are the proven machinery, not new code. State per shard is
  * ONE long — bounded forever, however long the stream runs.
  *
  * Offsets continue across micro-batches and restarts: the packing a
  * training run reads is identical whether the corpus streamed in over
  * a month or was packed in one batch pass (PackingStreamSpec pins
  * batch parity and cross-batch continuation).
  */
object Packing {

  /** Coordinates of one packed doc: where its bytes start in the
    * shard's concatenation, the window that owns that offset, the
    * offset inside it, and how many windows the doc straddles. */
  final case class Placement(seqStart: Long, windowId: Long,
                             windowOffset: Long, nWindows: Long)

  /** Pack a stream of `(shard, docId, size)` — `docId` doubles as the
    * in-shard order key — into `budget`-sized training windows. Emits
    * `(shard, docId, placement)` per doc, append-mode.
    */
  def pack(ds: Dataset[(Long, Long, Long)], budget: Long)(
      implicit e1: org.apache.spark.sql.Encoder[(Long, Long, Packing.Placement)],
      e2: org.apache.spark.sql.Encoder[(Long, Long, Long)],
      e3: org.apache.spark.sql.Encoder[Long]): Dataset[(Long, Long, Placement)] = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    Stateful.scan(ds, 0L) { (offset: Long, size: Long) =>
      val start = offset
      val winId = start / budget
      // EXACTLY the batch packSequences formula (truncating division,
      // no size clamp) so streaming and batch placements can never
      // diverge — including the zero-size corners: at start = 0 a
      // zero-size doc reports 1 window ((0-1)/budget = 0 truncating),
      // at a window boundary it reports 0 (it occupies no offset there)
      val placement = Placement(
        seqStart = start,
        windowId = winId,
        windowOffset = start % budget,
        nWindows = (start + size - 1L) / budget - winId + 1L)
      (offset + size, placement)
    }
  }
}
