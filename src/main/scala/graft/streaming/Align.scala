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

  /** streamz `zip`: pair the i-th left element with the i-th right element
    * (lossless, buffers the faster side). Emits in pair order.
    */
  def zip[K: Encoder, A, B](
      left: Dataset[(K, Long, A)], right: Dataset[(K, Long, B)])(
      implicit tagged: Encoder[(K, Long, Int, Option[A], Option[B])],
      st: Encoder[(Seq[(Long, A)], Seq[(Long, B)])],
      out: Encoder[(K, A, B)]): Dataset[(K, A, B)] =
    tag(left, right).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Tagged[K, A, B]],
         state: GroupState[(Seq[(Long, A)], Seq[(Long, B)])]) =>
          var (la, lb) = state.getOption.getOrElse((Seq.empty[(Long, A)], Seq.empty[(Long, B)]))
          it.toVector.sortBy(_._2).foreach {
            case (_, seq, 0, Some(a), _) => la = la :+ (seq, a)
            case (_, seq, _, _, Some(b)) => lb = lb :+ (seq, b)
            case _ =>
          }
          val k = math.min(la.size, lb.size)
          val out = la.take(k).zip(lb.take(k)).map { case ((_, a), (_, b)) => (key, a, b) }
          state.update((la.drop(k), lb.drop(k)))
          out.iterator
      }

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
