package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  */
object Windows {

  /** window(n=N).agg: aggregate of the last `n` rows per key, one output
    * per key per micro-batch that touched the key.
    */
  def lastN[K: Encoder, V, O](
      ds: Dataset[(K, Long, V)], n: Int)(agg: Seq[V] => O)(
      implicit buf: Encoder[Seq[(Long, V)]], out: Encoder[(K, O)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, O)] = {
    require(n >= 1, s"n must be >= 1, got $n")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[Seq[(Long, V)]]) =>
          val win = (state.getOption.getOrElse(Seq.empty).toVector ++
            it.toVector.sortBy(_._2).map { case (_, s, v) => (s, v) }).takeRight(n)
          state.update(win)
          Iterator.single((key, agg(win.map(_._2))))
      }
  }

  /** window(value=interval).agg: aggregate of rows with
    * eventTime ∈ (maxSeen - intervalMicros, maxSeen], maxSeen = latest
    * event time observed for the key so far. Event times are µs.
    */
  def trailingTime[K: Encoder, V, O](
      ds: Dataset[(K, Long, V)], intervalMicros: Long)(agg: Seq[V] => O)(
      implicit buf: Encoder[(Long, Seq[(Long, V)])], out: Encoder[(K, O)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, O)] = {
    require(intervalMicros >= 1, s"intervalMicros must be >= 1, got $intervalMicros")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[(Long, Seq[(Long, V)])]) =>
          val (prevMax, prevBuf) = state.getOption.getOrElse((Long.MinValue, Seq.empty[(Long, V)]))
          val incoming = it.toVector.map { case (_, ts, v) => (ts, v) }
          val maxSeen = (prevMax +: incoming.map(_._1)).max
          // reference semantics: out-of-order rows older than the window are
          // dropped on entry; the buffer stays sorted by event time
          val buf = (prevBuf.toVector ++ incoming)
            .filter(_._1 > maxSeen - intervalMicros)
            .sortBy(_._1)
          state.update((maxSeen, buf))
          Iterator.single((key, agg(buf.map(_._2))))
      }
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
