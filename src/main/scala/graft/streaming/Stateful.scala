package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Keyed, ordered stateful operators — the pieces of the reference's surface
  * that Structured Streaming does not provide natively (SURVEY §4.3):
  * generic running folds, row-count trailing windows, EWM, element grouping.
  *
  * All operators take `(key, seq, value)` rows: `key` partitions state
  * (use a constant key to reproduce the reference's single global stream —
  * correct but single-partition; keyed streams scale out), and `seq` is the
  * arrival order *within* a micro-batch (Spark hands the group iterator in
  * no particular order). State lives in the state store: checkpointed,
  * spillable (RocksDB provider), recovered on restart — which is exactly
  * the reference's `start=`/RefCounter machinery for free.
  *
  * Reference semantics: accumulate core.py:928-1026, sliding_window
  * core.py:1269-1316, partition core.py:1078-1165, EWM aggregations.py:151-170.
  */
object Stateful {

  /** streamz `accumulate`/`scan` (core.py:928): per-key running fold.
    * Emits one output per input element, in `seq` order within the key.
    */
  def scan[K: Encoder, V, S: Encoder, O](
      ds: Dataset[(K, Long, V)], start: S)(step: (S, V) => (S, O))(
      implicit kvo: Encoder[(K, Long, O)], kv: Encoder[(K, Long, V)]): Dataset[(K, Long, O)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[S]) =>
          var s = state.getOption.getOrElse(start)
          val out = it.toVector.sortBy(_._2).map { case (_, seq, v) =>
            val (s2, o) = step(s, v)
            s = s2
            (key, seq, o)
          }
          state.update(s)
          out.iterator
      }

  /** streamz `accumulate` with `start=no_default` (core.py:946-949): the
    * first element *seeds* the state and is emitted unchanged (no `step`
    * call); every later element folds via `step`. The no-seed mode forces
    * state and output to share the element type — for distinct state types
    * use [[scan]] with an explicit start, exactly like the reference.
    */
  def scanFromFirst[K: Encoder, V](
      ds: Dataset[(K, Long, V)])(step: (V, V) => V)(
      implicit kv: Encoder[(K, Long, V)], st: Encoder[V]): Dataset[(K, Long, V)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[V]) =>
          var s: Option[V] = state.getOption
          val out = it.toVector.sortBy(_._2).map { case (_, seq, v) =>
            val o = s match {
              case None       => v // first element ever: seed + emit as-is
              case Some(prev) => step(prev, v)
            }
            s = Some(o)
            (key, seq, o)
          }
          s.foreach(state.update)
          out.iterator
      }

  /** streamz `sliding_window` (core.py:1269): per element, the trailing
    * window of up to `n` elements (including itself), aggregated by `agg`.
    * `returnPartial=false` mirrors the reference flag: suppress output
    * until the window is full.
    */
  def slidingWindow[K: Encoder, V, O](
      ds: Dataset[(K, Long, V)], n: Int, returnPartial: Boolean = true)(
      agg: Seq[V] => O)(
      implicit buf: Encoder[Seq[(Long, V)]], kvo: Encoder[(K, Long, O)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, O)] = {
    require(n >= 1, s"n must be >= 1, got $n")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[Seq[(Long, V)]]) =>
          var win = state.getOption.getOrElse(Seq.empty).toVector
          val out = Vector.newBuilder[(K, Long, O)]
          it.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
            win = (win :+ (seq, v)).takeRight(n)
            if (returnPartial || win.size == n)
              out += ((key, seq, agg(win.map(_._2))))
          }
          state.update(win)
          out.result().iterator
      }
  }

  /** streamz `partition` (core.py:1078): group every `n` consecutive
    * elements into one output. Remainders stay buffered in state; with
    * `timeoutMs > 0` a partial group is flushed `timeoutMs` after its
    * FIRST element arrived (the reference arms the timer once at
    * `len(buffer)==1`, core.py:1163-1166, so the flush latency is bounded
    * even under a steady trickle — the deadline is NOT pushed out by new
    * arrivals). State carries the buffer plus the armed deadline; each
    * invocation re-registers the *remaining* time because the state-store
    * timeout resets on every function call.
    */
  def partitionN[K: Encoder, V](
      ds: Dataset[(K, Long, V)], n: Int, timeoutMs: Long = 0)(
      implicit buf: Encoder[(Seq[(Long, V)], Long)], out: Encoder[(K, Seq[V])],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Seq[V])] = {
    require(n >= 1, s"n must be >= 1, got $n")
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[(Seq[(Long, V)], Long)]) =>
          if (state.hasTimedOut) {
            val (rest, _) = state.getOption.getOrElse((Seq.empty[(Long, V)], 0L))
            state.remove()
            if (rest.nonEmpty) Iterator.single((key, rest.map(_._2)))
            else Iterator.empty
          } else {
            val (prev, prevDeadline) = state.getOption.getOrElse((Seq.empty[(Long, V)], 0L))
            val buffered = prev.toVector ++
              it.toVector.sortBy(_._2).map { case (_, seq, v) => (seq, v) }
            val (full, rest) = buffered.splitAt(buffered.size / n * n)
            val now = System.currentTimeMillis()
            // deadline: keep the existing one while the buffer has been
            // continuously non-empty; a remainder whose elements all
            // arrived this batch (prev emptied or was empty) arms fresh
            val deadline =
              if (rest.isEmpty) 0L
              else if (prev.nonEmpty && rest.headOption == prev.headOption) prevDeadline
              else now + timeoutMs
            val fullGroups = full.grouped(n).map(g => (key, g.map(_._2))).toVector
            // the state-store timeout only fires in data-free batches, so
            // under continuous arrivals the expiry must be checked here too
            if (timeoutMs > 0 && rest.nonEmpty && now >= deadline) {
              state.update((Seq.empty[(Long, V)], 0L))
              (fullGroups :+ ((key, rest.map(_._2)))).iterator
            } else {
              state.update((rest, deadline))
              if (timeoutMs > 0 && rest.nonEmpty)
                state.setTimeoutDuration(math.max(deadline - now, 1L))
              fullGroups.iterator
            }
          }
      }
  }

  /** streamz `ewm(alpha).mean()` (aggregations.py:151-170), pandas
    * adjust=true semantics: y_t = num_t/den_t with num ← x + (1-α)·num,
    * den ← 1 + (1-α)·den. Order-dependent, hence a keyed ordered scan.
    */
  def ewmMean[K: Encoder](ds: Dataset[(K, Long, Double)], alpha: Double)(
      implicit kvo: Encoder[(K, Long, Double)],
      st: Encoder[(Double, Double)]): Dataset[(K, Long, Double)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    scan[K, Double, (Double, Double), Double](ds, (0.0, 0.0)) {
      case ((num, den), x) =>
        val n2 = x + (1 - alpha) * num
        val d2 = 1 + (1 - alpha) * den
        ((n2, d2), n2 / d2)
    }
  }

  /** Incremental-state variant of [[partitionN]] on Spark 4's
    * transformWithState API (requires the RocksDB state store provider):
    * elements are `appendValue`d to a ListState and a counter tracks the
    * fill level, so a growing partial group never rewrites the whole
    * buffer into the state store per batch — the flatMapGroupsWithState
    * ops above serialize their full buffer every batch, which is the
    * right trade only for small windows. At 100 TB-scale group sizes the
    * append-only path is the one to use.
    */
  def partitionNIncremental[K, V](
      ds: Dataset[(K, Long, V)], n: Int)(
      implicit ke: Encoder[K], ve: Encoder[(Long, V)], le: Encoder[Long],
      out: Encoder[(K, Seq[V])], kv: Encoder[(K, Long, V)]): Dataset[(K, Seq[V])] = {
    require(n >= 1, s"n must be >= 1, got $n")
    val processor = new StatefulProcessor[K, (K, Long, V), (K, Seq[V])] {
      @transient private var buf: ListState[(Long, V)] = _
      @transient private var cnt: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        buf = getHandle.getListState[(Long, V)]("buf", ve, TTLConfig.NONE)
        cnt = getHandle.getValueState[Long]("cnt", le, TTLConfig.NONE)
      }
      override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
          timerValues: TimerValues): Iterator[(K, Seq[V])] = {
        var count = if (cnt.exists()) cnt.get() else 0L
        val emitted = Vector.newBuilder[(K, Seq[V])]
        rows.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
          buf.appendValue((seq, v)) // append-only: no buffer rewrite
          count += 1
          if (count == n) {
            emitted += ((key, buf.get().toVector.map(_._2)))
            buf.clear()
            count = 0
          }
        }
        cnt.update(count)
        emitted.result().iterator
      }
    }
    ds.groupByKey(_._1)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** Incremental-state variant of [[uniqueLru]] on transformWithState
    * (requires the RocksDB state store provider), for the scale case the
    * Seq-state version can't handle: [[uniqueLru]] rewrites its whole
    * recency Seq into the state store every batch — O(history) per key per
    * batch, unbounded at the default maxsize. Here membership lives in a
    * `MapState[hash → recency tick]`, so a batch writes only the entries it
    * touched (O(batch), not O(history)), and the unbounded default never
    * reads the full map at all.
    *
    * Eviction (bounded `maxsize`) matches the reference's per-insert LRU
    * exactly (core.py:1776 with history=maxsize): when an insert would
    * exceed maxsize, the least-recently-seen hash is dropped *at that
    * element* — an evicted value re-arriving later in the same batch is
    * re-emitted, same as across batches. To find the LRU entry the map is
    * loaded into an in-memory tick index once per evicting batch — O(state)
    * but state is capped at `maxsize` entries by construction, so the load
    * is bounded by the user's own cap and only paid when evicting.
    */
  def uniqueLruIncremental[K, V](
      ds: Dataset[(K, Long, V)], maxsize: Int = Int.MaxValue,
      dedupBy: V => String = (v: V) => String.valueOf(v))(
      implicit ke: Encoder[K], se: Encoder[String], le: Encoder[Long],
      me: Encoder[(Long, Long)], kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {
    require(maxsize >= 1, s"maxsize must be >= 1, got $maxsize")
    val processor = new StatefulProcessor[K, (K, Long, V), (K, Long, V)] {
      @transient private var seen: MapState[String, Long] = _ // hash → tick
      @transient private var meta: ValueState[(Long, Long)] = _ // (nextTick, count)
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        seen = getHandle.getMapState[String, Long]("seen", se, le, TTLConfig.NONE)
        meta = getHandle.getValueState[(Long, Long)]("meta", me, TTLConfig.NONE)
      }
      override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
          timerValues: TimerValues): Iterator[(K, Long, V)] = {
        var (tick, count) = if (meta.exists()) meta.get() else (0L, 0L)
        // tick → hash recency index, built lazily from the map state the
        // first time this batch actually needs to evict, then kept in sync
        // for the rest of the batch; never built on the unbounded path
        var recency: scala.collection.mutable.TreeMap[Long, String] = null
        def index(): scala.collection.mutable.TreeMap[Long, String] = {
          if (recency == null)
            recency = scala.collection.mutable.TreeMap.from(
              seen.iterator().map { case (h, t) => (t, h) })
          recency
        }
        val out = Vector.newBuilder[(K, Long, V)]
        rows.toVector.sortBy(_._2).foreach { case row @ (_, _, v) =>
          val h = dedupBy(v)
          if (seen.containsKey(h)) { // duplicate: refresh recency only
            if (recency != null) { recency -= seen.getValue(h); recency += (tick -> h) }
            seen.updateValue(h, tick)
          } else {
            out += row
            seen.updateValue(h, tick)
            if (recency != null) recency += (tick -> h)
            count += 1
            if (count > maxsize) { // evict the least-recently-seen hash NOW
              val (lruTick, lruHash) = index().head
              recency -= lruTick
              seen.removeKey(lruHash)
              count -= 1
            }
          }
          tick += 1
        }
        meta.update((tick, count))
        out.result().iterator
      }
    }
    ds.groupByKey(_._1)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** The reference's ewm parameterizations (dataframe/core.py:694-718):
    * exactly one of com/span/halflife/alpha, converted to alpha with the
    * same domain checks (com ≥ 0, span ≥ 1, halflife > 0, 0 < alpha ≤ 1).
    */
  def ewmAlpha(com: Option[Double] = None, span: Option[Double] = None,
               halflife: Option[Double] = None,
               alpha: Option[Double] = None): Double = {
    require(Seq(com, span, halflife, alpha).count(_.isDefined) == 1,
      "provide exactly one of com, span, halflife, alpha")
    val c = (com, span, halflife, alpha) match {
      case (Some(c0), _, _, _) =>
        require(c0 >= 0, "com must satisfy: com >= 0"); c0
      case (_, Some(s0), _, _) =>
        require(s0 >= 1, "span must satisfy: span >= 1"); (s0 - 1) / 2
      case (_, _, Some(h0), _) =>
        require(h0 > 0, "halflife must satisfy: halflife > 0")
        1 / (1 - math.exp(math.log(0.5) / h0)) - 1
      case (_, _, _, Some(a0)) =>
        require(a0 > 0 && a0 <= 1, "alpha must satisfy: 0 < alpha <= 1")
        (1 - a0) / a0
      case _ => throw new IllegalArgumentException("unreachable")
    }
    1 / (1 + c) // center-of-mass → alpha
  }

  /** streamz `unique` (core.py:1776) with bounded history: drop elements
    * whose key was seen in the last `maxsize` distinct values (LRU), or
    * ever (maxsize = None ≡ Int.MaxValue). Spark's dropDuplicates covers
    * the unbounded + watermark cases; this covers the LRU semantics.
    *
    * State-store cost caveat: this variant serializes the FULL recency Seq
    * per key per batch — fine for small bounded `maxsize`, but at the
    * unbounded default (or large histories) use [[uniqueLruIncremental]],
    * whose MapState writes only the entries a batch touches.
    */
  def uniqueLru[K: Encoder, V](
      ds: Dataset[(K, Long, V)], maxsize: Int = Int.MaxValue,
      dedupBy: V => String = (v: V) => String.valueOf(v))(
      implicit buf: Encoder[Seq[String]], kv: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {
    require(maxsize >= 1, s"maxsize must be >= 1, got $maxsize")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, it: Iterator[(K, Long, V)], state: GroupState[Seq[String]]) =>
          // LinkedHashSet = O(1) membership + insertion-order recency, so a
          // batch costs O(batch) not O(history²). State serializes as the
          // recency-ordered Seq. For unbounded dedup without LRU refresh
          // semantics prefer dropDuplicates, which shards state per value.
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          state.getOption.foreach(_.foreach(seen += _))
          val out = Vector.newBuilder[(K, Long, V)]
          it.toVector.sortBy(_._2).foreach { case row @ (_, _, v) =>
            val h = dedupBy(v)
            if (!seen.contains(h)) {
              out += row
              seen += h
              if (seen.size > maxsize) seen -= seen.head // evict LRU
            } else {
              seen -= h; seen += h // LRU refresh: move to most-recent
            }
          }
          state.update(seen.toSeq)
          out.result().iterator
      }
  }
}
