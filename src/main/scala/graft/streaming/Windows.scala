package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The reference's trailing-window semantics that differ from Spark's
  * aligned tumbling/sliding windows (SURVEY §7.4 risk #1/#2):
  *
  *  - `window(n=N)` — last N rows seen, across batch boundaries
  *    (aggregations.py:173-207 `diff_iloc`);
  *  - `window(value='2h')` — rows in `(max_seen_ts - 2h, max_seen_ts]`,
  *    anchored at the *latest event seen*, not at clock-aligned boundaries
  *    (aggregations.py:210-245 `diff_loc`);
  *  - windowed groupby with retraction and empty-group pruning
  *    (aggregations.py:323-404).
  *
  * One emission per micro-batch (the reference emits per emitted chunk) —
  * "updating" outputs.
  *
  * State-store discipline: [[lastN]] and [[trailingTime]] run on Spark 4's
  * transformWithState (requires the RocksDB state store provider) with the
  * window buffer in a ListState — a micro-batch APPENDS its rows and
  * eviction is an amortized compaction (rewrite only once stale rows
  * outnumber live ones), so per-batch state writes are O(batch), not
  * O(window). The flatMapGroupsWithState alternative rewrites the full
  * buffer every batch — O(window) write amplification per key per batch,
  * which at 100 TB-scale window sizes is the dominant state-store cost.
  * WindowsSpec pins a bounded-write assertion via [[stateRowsWritten]].
  */
object Windows {

  /** Test/diagnostic instrumentation: rows written into window ListStates
    * (appends + compaction rewrites), summed across the JVM. In local-mode
    * tests this exposes the write-amplification bound; meaningless across
    * real executors (per-JVM), so production code must not read it.
    */
  private[streaming] val stateRowsWritten = new java.util.concurrent.atomic.LongAdder

  /** window(n=N).agg: aggregate of the last `n` rows per key, one output
    * per key per micro-batch that touched the key. Window buffer in an
    * append-only ListState; stale prefix rows are compacted away only when
    * they outnumber the window (≤ 1 rewrite of n rows per n appends —
    * amortized ≤ 2 state-row writes per input row).
    */
  def lastN[K, V, O](
      ds: Dataset[(K, Long, V)], n: Int)(agg: Seq[V] => O)(
      implicit ke: Encoder[K], ve: Encoder[(Long, V)],
      out: Encoder[(K, O)], kv: Encoder[(K, Long, V)]): Dataset[(K, O)] = {
    require(n >= 1, s"n must be >= 1, got $n")
    val processor = new StatefulProcessor[K, (K, Long, V), (K, O)] {
      @transient private var buf: ListState[(Long, V)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        buf = getHandle.getListState[(Long, V)]("buf", ve, TTLConfig.NONE)
      override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
          timerValues: TimerValues): Iterator[(K, O)] = {
        val incoming = rows.toVector.sortBy(_._2).map { case (_, s, v) => (s, v) }
        incoming.foreach(buf.appendValue) // append-only: no buffer rewrite
        stateRowsWritten.add(incoming.size)
        // the aggregate needs the window contents anyway, so the O(stored)
        // read is inherent; list order is append order = arrival order
        val stored = buf.get().toVector
        val win = stored.takeRight(n)
        if (stored.size > 2L * n) { // amortized compaction of the stale prefix
          buf.clear()
          win.foreach(buf.appendValue)
          stateRowsWritten.add(win.size)
        }
        Iterator.single((key, agg(win.map(_._2))))
      }
    }
    ds.groupByKey(_._1)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** window(value=interval).agg: aggregate of rows with
    * eventTime ∈ (maxSeen - intervalMicros, maxSeen], maxSeen = latest
    * event time observed for the key so far. Event times are µs.
    * Reference semantics (aggregations.py:210-245): out-of-order rows
    * older than the window are dropped on entry; the aggregate sees the
    * live rows sorted by event time. Buffer is an append-only ListState
    * (in-window arrivals only); rows expired by a later maxSeen are
    * filtered on read and compacted away once they outnumber live rows.
    */
  def trailingTime[K, V, O](
      ds: Dataset[(K, Long, V)], intervalMicros: Long)(agg: Seq[V] => O)(
      implicit ke: Encoder[K], ve: Encoder[(Long, V)], le: Encoder[Long],
      out: Encoder[(K, O)], kv: Encoder[(K, Long, V)]): Dataset[(K, O)] = {
    require(intervalMicros >= 1, s"intervalMicros must be >= 1, got $intervalMicros")
    val processor = new StatefulProcessor[K, (K, Long, V), (K, O)] {
      @transient private var buf: ListState[(Long, V)] = _
      @transient private var maxTs: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        buf = getHandle.getListState[(Long, V)]("buf", ve, TTLConfig.NONE)
        maxTs = getHandle.getValueState[Long]("maxTs", le, TTLConfig.NONE)
      }
      override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
          timerValues: TimerValues): Iterator[(K, O)] = {
        val incoming = rows.toVector.map { case (_, ts, v) => (ts, v) }
        val prevMax = if (maxTs.exists()) maxTs.get() else Long.MinValue
        val maxSeen = (prevMax +: incoming.map(_._1)).max
        if (maxSeen != prevMax) maxTs.update(maxSeen)
        val lo = maxSeen - intervalMicros // window is (lo, maxSeen]
        val keep = incoming.filter(_._1 > lo) // drop-late-on-entry
        keep.foreach(buf.appendValue) // append-only: no buffer rewrite
        stateRowsWritten.add(keep.size)
        val stored = buf.get().toVector
        val live = stored.filter(_._1 > lo).sortBy(_._1)
        if (stored.size >= 2L * math.max(live.size, 1L)) { // amortized compaction
          buf.clear()
          live.foreach(buf.appendValue)
          stateRowsWritten.add(live.size)
        }
        Iterator.single((key, agg(live.map(_._2))))
      }
    }
    ds.groupByKey(_._1)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** streamz partition_unique (core.py:1168): buffer until `n` *distinct*
    * keys collected, then emit the group. keep="first"|"last" picks which
    * value survives a duplicate key.
    */
  def partitionUnique[K: Encoder, V](
      ds: Dataset[(K, Long, V)], n: Int, keep: String = "first",
      groupKey: V => String = (v: V) => String.valueOf(v))(
      implicit buf: Encoder[Seq[(String, Long, V)]], out: Encoder[(K, Seq[V])],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Seq[V])] = {
    require(keep == "first" || keep == "last", s"keep must be first|last: $keep")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[Seq[(String, Long, V)]]) =>
          var buf = state.getOption.getOrElse(Seq.empty).toVector
          val emitted = Vector.newBuilder[(K, Seq[V])]
          it.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
            val gk = groupKey(v)
            val i = buf.indexWhere(_._1 == gk)
            if (i < 0) buf = buf :+ ((gk, seq, v))
            // keep="last": the key *moves* to the most-recent position —
            // the reference (core.py:1245-1254) pops and re-inserts it
            else if (keep == "last") buf = buf.filterNot(_._1 == gk) :+ ((gk, seq, v))
            if (buf.size == n) {
              emitted += ((key, buf.sortBy(_._2).map(_._3)))
              buf = Vector.empty
            }
          }
          state.update(buf)
          emitted.result().iterator
      }
  }

  /** Windowed groupby with empty-group pruning (aggregations.py:323-404):
    * `agg` of the values per group over the last `n` rows per stream key.
    * The snapshot is recomputed over the bounded buffer — O(n), equivalent
    * to the reference's incremental add/retract for bounded windows (the
    * truly incremental path is Aggregation.windowed) — and groups that
    * fall out of the buffer vanish, which is the reference's empty-group
    * pruning. Emits the snapshot once per key per micro-batch ("updating").
    */
  def lastNGroupbyAgg[K: Encoder, A](
      ds: Dataset[(K, Long, String, Double)], n: Int)(agg: Seq[Double] => A)(
      implicit buf: Encoder[Seq[(Long, String, Double)]],
      out: Encoder[(K, Map[String, A])],
      kv: Encoder[(K, Long, String, Double)]): Dataset[(K, Map[String, A])] = {
    require(n >= 1, s"n must be >= 1, got $n")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, String, Double)],
         state: GroupState[Seq[(Long, String, Double)]]) =>
          val win = (state.getOption.getOrElse(Seq.empty).toVector ++
            it.toVector.sortBy(_._2).map { case (_, s, g, v) => (s, g, v) }).takeRight(n)
          state.update(win)
          val snapshot = win.groupBy(_._2).map { case (g, rows) =>
            g -> agg(rows.map(_._3))
          }
          Iterator.single((key, snapshot))
      }
  }

  /** The (sum, count) form of [[lastNGroupbyAgg]] — enough to derive the
    * reference's windowed-groupby sum/count/size/mean surface. */
  def lastNGroupby[K: Encoder](
      ds: Dataset[(K, Long, String, Double)], n: Int)(
      implicit buf: Encoder[Seq[(Long, String, Double)]],
      out: Encoder[(K, Map[String, (Double, Long)])],
      kv: Encoder[(K, Long, String, Double)]): Dataset[(K, Map[String, (Double, Long)])] =
    lastNGroupbyAgg(ds, n)(vs => (vs.sum, vs.size.toLong))
}
