package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * interval`, everything else parks in a ListState queue (append-only;
  * head-pointer eviction with amortized compaction) and a single pending
  * processing-time timer re-wakes the key for its next emission. A
  * processing stall therefore does NOT cause a catch-up burst: after the
  * stall the backlog still drains one element per interval (timer fires
  * sharing one batch timestamp emit at most once — the spec pins this).
  * Timers and queue live in the state store: checkpointed, restart-safe
  * (FlowSpec pins backlog drain across a stop/start). One engine nuance:
  * a RESTARTED query that is otherwise fully idle may not schedule
  * batches for timer wake-ups alone — on a live stream (any traffic on
  * any key) pending backlogs drain normally, which the recovery spec
  * reproduces with an unrelated-key trickle.
  * `buffer(n)` (core.py:1546) stays a documented design row — decoupling
  * stages with a bounded queue IS micro-batch admission control
  * (maxOffsetsPerTrigger et al.), with no analytic output to test.
  *
  * Scale: state per key is the in-flight backlog only; a hot key's queue
  * grows when its input rate exceeds 1/interval — which is the USER'S
  * contract with a pacer, same as the reference's unbounded delay queue.
  */
object Flow {

  private final class Pacer[K, V](intervalMs: Long,
      qEnc: Encoder[(Long, V)])
      extends StatefulProcessor[K, (K, Long, V), (K, Long, V)] {
    // earliest ms the next emission may happen
    @transient private var nextFree: ValueState[Long] = _
    // (headIdx, totalLen) of the backlog queue; entries before headIdx
    // are already emitted and reclaimed lazily by compaction
    @transient private var ptr: ValueState[(Long, Long)] = _
    @transient private var queue: ListState[(Long, V)] = _ // (seq, v)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nextFree = getHandle.getValueState[Long]("nextFree", Encoders.scalaLong, TTLConfig.NONE)
      ptr = getHandle.getValueState[(Long, Long)]("ptr",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      queue = getHandle.getListState[(Long, V)]("queue", qEnc, TTLConfig.NONE)
    }
    override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
        timerValues: TimerValues): Iterator[(K, Long, V)] = {
      val now = timerValues.getCurrentProcessingTimeInMs()
      var free = if (nextFree.exists()) nextFree.get() else 0L
      var (head, tot) = if (ptr.exists()) ptr.get() else (0L, 0L)
      val out = Vector.newBuilder[(K, Long, V)]
      rows.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
        if (head == tot && now >= free) { // empty backlog and free: emit now
          out += ((key, seq, v))
          free = now + intervalMs
        } else {
          queue.appendValue((seq, v)) // one append, no rewrite
          tot += 1
        }
      }
      if (head < tot) getHandle.registerTimer(math.max(free, now + 1))
      nextFree.update(free)
      ptr.update((head, tot))
      out.result().iterator
    }
    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(K, Long, V)] = {
      val now = timerValues.getCurrentProcessingTimeInMs()
      var free = if (nextFree.exists()) nextFree.get() else 0L
      var (head, tot) = if (ptr.exists()) ptr.get() else (0L, 0L)
      if (head == tot) return Iterator.empty // stale fire
      if (now < free) { // early or duplicate fire (same-batch stall drain):
        getHandle.registerTimer(free) // re-arm, emit nothing — keeps spacing
        return Iterator.empty
      }
      val q = queue.get().toVector
      val (seq, v) = q(head.toInt)
      head += 1
      free = now + intervalMs
      if (head * 2 > q.size) { // amortized compaction: reclaim emitted prefix
        queue.clear()
        val rest = q.drop(head.toInt)
        if (rest.nonEmpty) queue.appendList(rest.toArray)
        tot -= head
        head = 0
      }
      if (head < tot) getHandle.registerTimer(free)
      nextFree.update(free)
      ptr.update((head, tot))
      Iterator.single((key, seq, v))
    }
  }

  /** Paced emission: ≥ `intervalMs` between consecutive per-key
    * emissions (reference delay AND rate_limit contract — see object
    * scaladoc). Requires the RocksDB state store provider and a
    * ProcessingTime trigger no coarser than the wanted resolution. */
  def pace[K, V](ds: Dataset[(K, Long, V)], intervalMs: Long)(
      implicit ke: Encoder[K], qe: Encoder[(Long, V)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {
    require(intervalMs >= 0, s"intervalMs must be >= 0, got $intervalMs")
    ds.groupByKey(_._1)
      .transformWithState(new Pacer[K, V](intervalMs, qe),
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
}
