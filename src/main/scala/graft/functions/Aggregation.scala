package graft.functions

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's user-facing custom-aggregation contract
  * (docs/source/dataframes.rst:75-123, aggregations.py:15-33):
  * `initial`, `on_new(state, value) → (state, result)`, and — only needed
  * inside trailing windows — the retraction `on_old`.
  */
trait Aggregation[V, S, O] extends Serializable {
  def initial: S
  def onNew(state: S, value: V): (S, O)
  /** Retraction of an evicted element; required only for windowed use. */
  def onOld(state: S, value: V): (S, O) =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} does not support windowed (retracting) use")
}

object Aggregation {

  /** Global/grouped streaming accumulation (streamz
    * `sdf.aggregate(customAgg)`, dataframe/core.py:53-57): a keyed ordered
    * scan that emits the aggregation result after every element.
    */
  def accumulate[K: Encoder, V, S: Encoder, O](
      ds: Dataset[(K, Long, V)], agg: Aggregation[V, S, O])(
      implicit kvo: Encoder[(K, Long, O)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, O)] =
    graft.streaming.Stateful.scan(ds, agg.initial)(agg.onNew)

  /** Windowed accumulation with retraction (streamz `window(n=...)
    * .aggregate(customAgg)`, aggregations.py:280-320): maintains the
    * aggregation state incrementally — `onNew` for each entering element,
    * `onOld` for each evicted one — never recomputing the window.
    */
  def windowed[K: Encoder, V, S, O](
      ds: Dataset[(K, Long, V)], n: Int, agg: Aggregation[V, S, O])(
      implicit st: Encoder[(S, Seq[(Long, V)])], kvo: Encoder[(K, Long, O)],
      kv: Encoder[(K, Long, V)]): Dataset[(K, Long, O)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[(K, Long, V)], state: GroupState[(S, Seq[(Long, V)])]) =>
          var (s, win) = state.getOption.getOrElse((agg.initial, Seq.empty[(Long, V)]))
          val out = Vector.newBuilder[(K, Long, O)]
          it.toVector.sortBy(_._2).foreach { case (_, seq, v) =>
            val (s1, rNew) = agg.onNew(s, v)
            s = s1
            win = win :+ (seq, v)
            var r = rNew
            while (win.size > n) {
              val (_, old) = win.head
              val (s2, rOld) = agg.onOld(s, old)
              s = s2
              r = rOld
              win = win.tail
            }
            out += ((key, seq, r))
          }
          state.update((s, win))
          out.result().iterator
      }

  /** Bridge to a Spark typed [[Aggregator]] for batch/SQL use. streamz
    * aggregations are sequential and have no merge; the caller supplies one
    * (states must be mergeable — true for all the reference's built-ins).
    */
  def toSparkAggregator[V, S, O](
      agg: Aggregation[V, S, O], mergeFn: (S, S) => S,
      result: S => O)(
      implicit se: Encoder[S], oe: Encoder[O]): Aggregator[V, S, O] =
    new Aggregator[V, S, O] {
      override def zero: S = agg.initial
      override def reduce(s: S, v: V): S = agg.onNew(s, v)._1
      override def merge(a: S, b: S): S = mergeFn(a, b)
      override def finish(s: S): O = result(s)
      override def bufferEncoder: Encoder[S] = se
      override def outputEncoder: Encoder[O] = oe
    }
}
