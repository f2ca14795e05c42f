package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{DataStreamReader, ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Flow control: the reference's `delay` (core.py:1485-1512) and
  * `rate_limit` (core.py:1515-1542), both of which are emission PACERS —
  * consecutive emissions are spaced at least `interval` apart, the first
  * element passes promptly. They differ only in where backpressure lands
  * (delay parks elements in an unbounded queue; rate_limit suspends the
  * upstream coroutine), which in Spark is execution-internal — admission
  * is bounded by trigger pacing / maxOffsetsPerTrigger, not by operator
  * back-pressure — so one implementation serves both names.
  *
  * Mechanics: per key, spacing is enforced at EMISSION time, exactly like
  * the reference's pacer coroutine (emit, then sleep the remaining
  * interval) — an element emits only when `now ≥ lastEmission +
  * interval`, everything else parks and a processing-time timer re-wakes
  * the key for its next emission. The parked backlog is two-tier so both
  * sides of the state traffic stay bounded: the next ≤ [[WindowCap]]
  * elements sit in a single ValueState row (a timer fire reads THAT row,
  * O(1), never the backlog), everything behind them in a CHUNKED
  * MapState queue — overflow appends new ≤ WindowCap-element chunks at
  * the tail index, a refill gets-and-removes exactly one chunk at the
  * head index. Every backlog element is written once and read once, so
  * draining a deep backlog costs exactly n tail reads — not the
  * Θ(n²/chunk) a ListState skip-pointer scheme pays re-deserializing
  * the dead prefix on every refill, nor the O(n²) of a read-the-whole-
  * queue-per-emission pacer (FlowSpec pins the read bound via
  * [[stateRowsRead]], mirroring WindowsSpec's write bound) — and a
  * consumed chunk is removed on the spot, so no dead state outlives
  * its drain. A
  * processing stall does NOT cause a catch-up burst: after the
  * stall the backlog still drains one element per interval (timer fires
  * sharing one batch timestamp emit at most once — the spec pins this).
  * Timers and queue live in the state store: checkpointed, restart-safe
  * (FlowSpec pins backlog drain across a stop/start). One engine nuance:
  * a RESTARTED query that is otherwise fully idle may not schedule
  * batches for timer wake-ups alone — on a live stream (any traffic on
  * any key) pending backlogs drain normally, which the recovery spec
  * reproduces with an unrelated-key trickle.
  * `buffer(n)` (core.py:1546) maps to micro-batch admission control —
  * [[buffer]] below is the callable symbol for it.
  *
  * Scale: state per key is the in-flight backlog only; a hot key's queue
  * grows when its input rate exceeds 1/interval — which is the USER'S
  * contract with a pacer, same as the reference's unbounded delay queue.
  */
object Flow {

  /** Elements held in the ValueState emission window — large enough to
    * make refills rare, small enough that the per-fire row stays tiny. */
  private[streaming] val WindowCap = 64

  /** Backlog (tail chunk) entries deserialized — local[*] test
    * observability for the read-amplification bound, the mirror of
    * [[Windows.stateRowsWritten]]. */
  private[streaming] val stateRowsRead = new java.util.concurrent.atomic.LongAdder

  /** Derive an `Encoder[Seq[T]]` from the element encoder (for the
    * window ValueState — one state row holding the next few elements). */
  private def seqEncoder[T](e: Encoder[T]): Encoder[Seq[T]] = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders, ToAgnosticEncoder}
    val ag = e match {
      case a: AgnosticEncoder[T] => a
      case t: ToAgnosticEncoder[T @unchecked] => t.encoder
    }
    // hand the state store the agnostic encoder itself — it resolves and
    // binds internally (an ExpressionEncoder built here would carry an
    // unresolved MapObjects deserializer into the executor)
    AgnosticEncoders.IterableEncoder(
      scala.reflect.classTag[Seq[T]], ag, containsNull = false, lenientSerialization = false)
  }

  private final class Pacer[K, V](intervalMs: Long, windowCap: Int,
      qEnc: Encoder[(Long, V)], winEnc: Encoder[Seq[(Long, V)]])
      extends StatefulProcessor[K, (K, Long, V), (K, Long, V)] {
    // earliest ms the next emission may happen
    @transient private var nextFree: ValueState[Long] = _
    // the next ≤ windowCap elements to emit, in seq order: ONE state row,
    // so a timer fire never touches the tail queue except on refill
    @transient private var win: ValueState[Seq[(Long, V)]] = _
    // Tail backlog as a CHUNKED QUEUE over MapState: chunk index → up to
    // windowCap elements, live indices in [head, tail). A refill GETs and
    // REMOVEs exactly one chunk (map point-lookup, no prefix scan); an
    // overflow batch appends new chunks at `tail`. Every element is
    // written once and read once — O(chunk) per operation, O(n) total
    // for an n-element drain, and nothing dead ever lingers (a consumed
    // chunk is removed on the spot). A ListState cannot do this: its
    // iterator always starts at the head, so any skip-pointer scheme
    // re-deserializes the dead prefix each refill — Θ(n²/chunk) reads
    // over a drain (the round-6 design; ADVICE + review flagged it).
    // MIGRATION: the r6 layout ("ptr" ValueState + "queue" ListState) is
    // NOT readable from this version — see COMPATIBILITY.md. Spark's
    // transformWithState does NOT reject a checkpoint whose state
    // variables changed (measured: the restart runs and the old column
    // families are silently orphaned), so the processor itself guards:
    // it re-declares the old "ptr" variable as a tombstone and throws at
    // the first touch of any key that still carries old-layout state
    // (FlowSpec pins the loud failure). Drain in-flight pacer queries
    // before upgrading; fresh checkpoints are unaffected.
    @transient private var bounds: ValueState[(Long, Long)] = _ // (head, tail)
    @transient private var chunks: MapState[Long, Seq[(Long, V)]] = _
    // tombstone for the retired r6 layout: never written, only probed
    @transient private var legacyPtr: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nextFree = getHandle.getValueState[Long]("nextFree", Encoders.scalaLong, TTLConfig.NONE)
      win = getHandle.getValueState[Seq[(Long, V)]]("win", winEnc, TTLConfig.NONE)
      bounds = getHandle.getValueState[(Long, Long)]("bounds",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      chunks = getHandle.getMapState[Long, Seq[(Long, V)]]("chunks",
        Encoders.scalaLong, winEnc, TTLConfig.NONE)
      legacyPtr = getHandle.getValueState[Long]("ptr", Encoders.scalaLong, TTLConfig.NONE)
    }
    /** Loud failure on a key whose checkpoint still carries r6 pacer
      * state: the old parked backlog is unreadable here and running on
      * would orphan it silently. One point lookup, and only until the
      * key writes its first new-layout row. */
    private def guardLegacy(): Unit =
      if (!nextFree.exists() && legacyPtr.exists())
        throw new IllegalStateException(
          "Flow.pace: this checkpoint holds pre-r7 pacer state ('ptr'+'queue' " +
            "layout) for the current key; its parked backlog cannot be read by " +
            "the chunked-queue layout and would be orphaned. Drain the query on " +
            "the old version or restart from a fresh checkpoint. See COMPATIBILITY.md.")
    private def readWin(): Vector[(Long, V)] =
      if (win.exists()) win.get().toVector else Vector.empty
    /** Promote the next chunk into the window: one map get + remove. */
    private def refill(head0: Long, tail0: Long): (Vector[(Long, V)], Long) = {
      if (head0 == tail0) return (Vector.empty, head0)
      val chunk = chunks.getValue(head0).toVector
      chunks.removeKey(head0)
      stateRowsRead.add(chunk.size)
      (chunk, head0 + 1)
    }
    override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
        timerValues: TimerValues): Iterator[(K, Long, V)] = {
      guardLegacy()
      val now = timerValues.getCurrentProcessingTimeInMs()
      var free = if (nextFree.exists()) nextFree.get() else 0L
      var w = readWin()
      var (head, tail) = if (bounds.exists()) bounds.get() else (0L, 0L)
      var wDirty = false
      val overflow = Vector.newBuilder[(Long, V)]
      var nOverflow = 0
      val out = Vector.newBuilder[(K, Long, V)]
      rows.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
        if (w.isEmpty && head == tail && nOverflow == 0 && now >= free) {
          out += ((key, seq, v)) // no backlog, free: emit now
          free = now + intervalMs
        } else if (head == tail && nOverflow == 0 && w.size < windowCap) {
          w :+= ((seq, v)) // window has room (tail empty, order holds)
          wDirty = true
        } else {
          overflow += ((seq, v))
          nOverflow += 1
        }
      }
      overflow.result().grouped(windowCap).foreach { chunk =>
        chunks.updateValue(tail, chunk) // new chunks only: never rewrite old
        tail += 1
      }
      if (w.nonEmpty || head < tail) getHandle.registerTimer(math.max(free, now + 1))
      if (wDirty) win.update(w)
      nextFree.update(free)
      bounds.update((head, tail))
      out.result().iterator
    }
    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(K, Long, V)] = {
      guardLegacy()
      val now = timerValues.getCurrentProcessingTimeInMs()
      var free = if (nextFree.exists()) nextFree.get() else 0L
      var w = readWin()
      var (head, tail) = if (bounds.exists()) bounds.get() else (0L, 0L)
      if (w.isEmpty && head == tail) return Iterator.empty // stale fire
      if (now < free) { // early or duplicate fire (same-batch stall drain):
        getHandle.registerTimer(free) // re-arm, emit nothing — keeps spacing
        return Iterator.empty
      }
      if (w.isEmpty) { // defensive: invariant says this can't happen, but a
        val r = refill(head, tail) // refill costs one chunk, not correctness
        w = r._1; head = r._2
      }
      val (seq, v) = w.head
      w = w.tail
      free = now + intervalMs
      if (w.isEmpty && head < tail) {
        val r = refill(head, tail)
        w = r._1; head = r._2
      }
      if (w.nonEmpty || head < tail) getHandle.registerTimer(free)
      win.update(w)
      nextFree.update(free)
      bounds.update((head, tail))
      Iterator.single((key, seq, v))
    }
  }

  /** Paced emission: ≥ `intervalMs` between consecutive per-key
    * emissions (reference delay AND rate_limit contract — see object
    * scaladoc). Requires the RocksDB state store provider and a
    * ProcessingTime trigger no coarser than the wanted resolution. */
  def pace[K, V](ds: Dataset[(K, Long, V)], intervalMs: Long,
      windowCap: Int = WindowCap)(
      implicit ke: Encoder[K], qe: Encoder[(Long, V)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {
    require(intervalMs >= 0, s"intervalMs must be >= 0, got $intervalMs")
    require(windowCap >= 1, s"windowCap must be >= 1, got $windowCap")
    ds.groupByKey(_._1)
      .transformWithState(new Pacer[K, V](intervalMs, windowCap, qe, seqEncoder(qe)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** streamz delay (core.py:1485): queue + paced emission. */
  def delay[K, V](ds: Dataset[(K, Long, V)], intervalMs: Long)(
      implicit ke: Encoder[K], qe: Encoder[(Long, V)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = pace(ds, intervalMs)

  /** streamz rate_limit (core.py:1515): identical spacing contract. */
  def rateLimit[K, V](ds: Dataset[(K, Long, V)], intervalMs: Long)(
      implicit ke: Encoder[K], qe: Encoder[(Long, V)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = pace(ds, intervalMs)

  /** streamz buffer(n) (core.py:1545-1572): decouple a fast producer
    * from a slow consumer through a queue of bounded size. In the
    * micro-batch model that queue is the SOURCE's unread backlog and the
    * bound is admission control — what each trigger is allowed to pull —
    * so `buffer` configures the reader rather than inserting an
    * operator: `maxFilesPerTrigger`=n for file sources and
    * `maxOffsetsPerTrigger`=n for Kafka (each source reads its own
    * option and ignores the other's, so one combinator serves both).
    * Downstream stages then see at most n units per batch no matter how
    * bursty the upstream backlog is, which is exactly the reference's
    * decoupling contract — with the queue checkpoint-tracked instead of
    * in-heap. Unlike the reference there is no `loses data on overflow`
    * variant: the un-admitted backlog stays in the source, nothing is
    * dropped. FlowSpec drives a bursty file backlog through a bounded
    * drain and pins the per-batch admission.
    */
  def buffer(reader: DataStreamReader, n: Long): DataStreamReader = {
    require(n >= 1, s"buffer size must be >= 1, got $n")
    reader
      .option("maxFilesPerTrigger", n)   // file-based sources
      .option("maxOffsetsPerTrigger", n) // kafka
  }
}
