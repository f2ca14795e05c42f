package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-stream alignment operators (SURVEY §2.9): the reference's only
  * "joins" are by arrival order, not by key — `zip` (core.py:1575),
  * `combine_latest` (core.py:1652), `zip_latest` (core.py:1948).
  *
  * Implementation: tag each side, union (cheap, narrow), then one keyed
  * stateful pass. The alignment key plays the same scaling role as in
  * [[Stateful]]: a constant key reproduces the reference's global stream;
  * a real key (e.g. user_id) shards alignment state across executors.
  * Sequence numbers order elements within and across micro-batches.
  */
object Align {

  /** Internal envelope: side = 0 (left) / 1 (right). */
  private type Tagged[K, A, B] = (K, Long, Int, Option[A], Option[B])

  private def tag[K, A, B](left: Dataset[(K, Long, A)], right: Dataset[(K, Long, B)])(
      implicit enc: Encoder[(K, Long, Int, Option[A], Option[B])]): Dataset[Tagged[K, A, B]] = {
    val l = left.map { case (k, s, a) => (k, s, 0, Some(a): Option[A], None: Option[B]) }
    val r = right.map { case (k, s, b) => (k, s, 1, None: Option[A], Some(b): Option[B]) }
    l.union(r)
  }

  /** Bound a buffer to `maxsize` (core.py:1589). The reference *blocks* the
    * upstream once a buffer holds maxsize un-paired elements; Structured
    * Streaming has no in-operator backpressure, so the documented divergence
    * is a bounded buffer instead: `drop_oldest` keeps the newest maxsize
    * elements, `error` fails the query (fail-fast when silent loss is
    * unacceptable). The cap is applied incrementally as each element is
    * folded in — never to a whole batch at once — so results do not depend
    * on how the element sequence happens to split across micro-batches.
    */
  private def cap[E](buf: Seq[E], maxsize: Int, onOverflow: String): Seq[E] =
    if (buf.size <= maxsize) buf
    else if (onOverflow == "error")
      throw new IllegalStateException(
        s"zip buffer overflow: ${buf.size} un-paired elements > maxsize=$maxsize")
    else buf.takeRight(maxsize)

  private def checkOverflow(onOverflow: String): Unit =
    require(onOverflow == "drop_oldest" || onOverflow == "error",
      s"onOverflow must be drop_oldest|error: $onOverflow")

  /** streamz `zip`: pair the i-th left element with the i-th right element
    * (lossless, buffers the faster side). Emits in pair order. The faster
    * side's leftover buffer is bounded by `maxsize` (reference default 10,
    * core.py:1589) — see [[cap]] for the backpressure divergence.
    */
  def zip[K: Encoder, A, B](
      left: Dataset[(K, Long, A)], right: Dataset[(K, Long, B)],
      maxsize: Int = 10, onOverflow: String = "drop_oldest")(
      implicit tagged: Encoder[(K, Long, Int, Option[A], Option[B])],
      st: Encoder[(Seq[(Long, A)], Seq[(Long, B)])],
      out: Encoder[(K, A, B)]): Dataset[(K, A, B)] = {
    require(maxsize > 0, s"maxsize must be positive: $maxsize")
    checkOverflow(onOverflow)
    tag(left, right).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Tagged[K, A, B]],
         state: GroupState[(Seq[(Long, A)], Seq[(Long, B)])]) =>
          var (la, lb) = state.getOption.getOrElse((Seq.empty[(Long, A)], Seq.empty[(Long, B)]))
          val out = Vector.newBuilder[(K, A, B)]
          // element-at-a-time: pair immediately against the opposite buffer
          // or buffer-with-cap, so within-batch behavior is identical to the
          // same sequence split across batches (invariant: at most one of
          // la/lb is non-empty at any point)
          it.toVector.sortBy(_._2).foreach {
            case (_, seq, 0, Some(a), _) =>
              if (lb.nonEmpty) { out += ((key, a, lb.head._2)); lb = lb.tail }
              else la = cap(la :+ ((seq, a)), maxsize, onOverflow)
            case (_, seq, _, _, Some(b)) =>
              if (la.nonEmpty) { out += ((key, la.head._2, b)); la = la.tail }
              else lb = cap(lb :+ ((seq, b)), maxsize, onOverflow)
            case _ =>
          }
          state.update((la, lb))
          out.result().iterator
      }
  }

  /** N-ary streamz `zip` (core.py:1575-1649): `Stream.zip(s0, s1, ..., sN)`
    * over homogeneous element type V, emitting one Seq[V] tuple when every
    * stream has produced an element. `literals` are the reference's
    * non-Stream upstreams (core.py:1589-1593 + pack_literals): constant
    * values spliced into every output tuple at their positional index —
    * `zip(s0, 7, s1)` is `literals = Seq((1, 7))` with output arity 3.
    * Buffers are bounded by `maxsize` as in [[zip]].
    */
  def zipN[K: Encoder, V](
      streams: Seq[Dataset[(K, Long, V)]],
      literals: Seq[(Int, V)] = Seq.empty,
      maxsize: Int = 10, onOverflow: String = "drop_oldest")(
      implicit tagged: Encoder[(K, Long, Int, V)],
      st: Encoder[Seq[Seq[(Long, V)]]],
      out: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] = {
    val n = streams.size
    require(n >= 1, "zipN needs at least one stream")
    require(maxsize > 0, s"maxsize must be positive: $maxsize")
    checkOverflow(onOverflow)
    val arity = n + literals.size
    require(literals.forall { case (i, _) => i >= 0 && i < arity },
      s"literal positions must be in [0, $arity): ${literals.map(_._1)}")
    require(literals.map(_._1).distinct.size == literals.size,
      s"duplicate literal positions: ${literals.map(_._1)}")
    val litByPos = literals.toMap
    tagN(streams).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, Int, V)],
         state: GroupState[Seq[Seq[(Long, V)]]]) =>
          var bufs = state.getOption.getOrElse(Seq.fill(n)(Seq.empty[(Long, V)])).toVector
          val out = Vector.newBuilder[(K, Seq[V])]
          // element-at-a-time (see zip): append, emit a tuple whenever every
          // buffer is non-empty, then cap the appended side — batch-split
          // independent (invariant: some buffer is empty between elements)
          it.toVector.sortBy(_._2).foreach { case (_, seq, side, v) =>
            bufs = bufs.updated(side, bufs(side) :+ ((seq, v)))
            while (bufs.forall(_.nonEmpty)) {
              val streamVals = bufs.map(_.head._2).iterator
              out += ((key, (0 until arity).map(p => litByPos.getOrElse(p, streamVals.next()))))
              bufs = bufs.map(_.tail)
            }
            bufs = bufs.updated(side, cap(bufs(side), maxsize, onOverflow))
          }
          state.update(bufs)
          out.result().iterator
      }
  }

  /** N-ary streamz `combine_latest` (core.py:1652): on every arrival from
    * any stream, emit the tuple of latest values once every stream has
    * produced one. `emitOn` (core.py:1661-1680) restricts which stream
    * indices trigger emission; empty = all streams emit.
    */
  def combineLatestN[K: Encoder, V](
      streams: Seq[Dataset[(K, Long, V)]],
      emitOn: Set[Int] = Set.empty)(
      implicit tagged: Encoder[(K, Long, Int, V)],
      st: Encoder[Seq[Option[V]]],
      out: Encoder[(K, Long, Seq[V])]): Dataset[(K, Long, Seq[V])] = {
    val n = streams.size
    require(n >= 1, "combineLatestN needs at least one stream")
    require(emitOn.forall(i => i >= 0 && i < n),
      s"emitOn indices must be in [0, $n): $emitOn")
    val emitting = if (emitOn.isEmpty) (0 until n).toSet else emitOn
    tagN(streams).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, Int, V)],
         state: GroupState[Seq[Option[V]]]) =>
          var cur = state.getOption.getOrElse(Seq.fill(n)(None: Option[V])).toVector
          val out = Vector.newBuilder[(K, Long, Seq[V])]
          it.toVector.sortBy(_._2).foreach { case (_, seq, side, v) =>
            cur = cur.updated(side, Some(v))
            if (emitting(side) && cur.forall(_.isDefined))
              out += ((key, seq, cur.map(_.get)))
          }
          state.update(cur)
          out.result().iterator
      }
  }

  /** Index-tag and union N homogeneous streams (narrow, no shuffle). */
  private def tagN[K, V](streams: Seq[Dataset[(K, Long, V)]])(
      implicit enc: Encoder[(K, Long, Int, V)]): Dataset[(K, Long, Int, V)] =
    streams.zipWithIndex.map { case (s, i) =>
      s.map { case (k, seq, v) => (k, seq, i, v) }
    }.reduce(_ union _)

  /** streamz `combine_latest`: on every arrival from either side, emit the
    * pair of latest values (once both sides have produced one).
    * `emitOn` restricts which sides trigger an emission (core.py:1661-1680
    * `emit_on=`): updates from a non-emitting side only refresh state.
    * Side 0 = left, 1 = right; default emits on both.
    */
  def combineLatest[K: Encoder, A, B](
      left: Dataset[(K, Long, A)], right: Dataset[(K, Long, B)],
      emitOn: Set[Int] = Set(0, 1))(
      implicit tagged: Encoder[(K, Long, Int, Option[A], Option[B])],
      st: Encoder[(Option[A], Option[B])],
      out: Encoder[(K, Long, A, B)]): Dataset[(K, Long, A, B)] = {
    require(emitOn.nonEmpty && emitOn.subsetOf(Set(0, 1)),
      s"emitOn must be a non-empty subset of {0, 1}: $emitOn")
    tag(left, right).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Tagged[K, A, B]],
         state: GroupState[(Option[A], Option[B])]) =>
          var (curA, curB) = state.getOption.getOrElse((None: Option[A], None: Option[B]))
          val out = Vector.newBuilder[(K, Long, A, B)]
          it.toVector.sortBy(_._2).foreach { case (_, seq, side, a, b) =>
            if (side == 0) curA = a else curB = b
            (curA, curB) match {
              case (Some(x), Some(y)) if emitOn(side) => out += ((key, seq, x, y))
              case _ =>
            }
          }
          state.update((curA, curB))
          out.result().iterator
      }
  }

  /** streamz `zip_latest`: lossless on the left stream — every left element
    * is paired with the most recent right value seen before it (as-of by
    * arrival). Left elements arriving before any right value are *buffered*,
    * not dropped (core.py:1948 `lossless_buffer`): once the right side
    * produces its first value, all buffered left elements are flushed paired
    * with that value, then pairing proceeds as-of.
    */
  def zipLatest[K: Encoder, A, B](
      left: Dataset[(K, Long, A)], right: Dataset[(K, Long, B)])(
      implicit tagged: Encoder[(K, Long, Int, Option[A], Option[B])],
      st: Encoder[(Seq[(Long, A)], Option[B])],
      out: Encoder[(K, Long, A, B)]): Dataset[(K, Long, A, B)] =
    tag(left, right).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Tagged[K, A, B]],
         state: GroupState[(Seq[(Long, A)], Option[B])]) =>
          var (pending, latest) =
            state.getOption.getOrElse((Seq.empty[(Long, A)], None: Option[B]))
          val out = Vector.newBuilder[(K, Long, A, B)]
          it.toVector.sortBy(_._2).foreach {
            case (_, seq, 0, Some(a), _) =>
              latest match {
                case Some(b) => out += ((key, seq, a, b))
                case None    => pending = pending :+ ((seq, a))
              }
            case (_, _, _, _, b @ Some(bv)) =>
              if (latest.isEmpty && pending.nonEmpty) {
                pending.foreach { case (seq, a) => out += ((key, seq, a, bv)) }
                pending = Seq.empty
              }
              latest = b
            case _ =>
          }
          state.update((pending, latest))
          out.result().iterator
      }
}
