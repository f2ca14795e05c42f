package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Native stream-stream joins beyond the reference (which only aligns by
  * arrival order — see [[Align]]). The watermarked interval join is the
  * streaming twin of `queries.ScaleOps.join_range_band`: where the batch
  * plan bins time and equi-joins on (key, bin±1), Structured Streaming
  * keeps a time-bounded buffer of each side keyed by the equi-key and
  * matches new rows against it — same completeness, same density bound.
  * Both watermarks plus the two-sided time-range condition are what let
  * Spark EVICT state: a row can only match rows within `band` of itself,
  * so buffered state is (per-key rate × (band + delay))-bounded however
  * long the streams run — the streaming face of the batch plan's
  * "per-task work bounded by rate × band" argument.
  */
object Joins {

  /** Watermarked inner interval equi-join: pairs of left/right rows that
    * share `key` and whose `tsCol` event times differ by at most
    * `bandSeconds` (inclusive, both directions). `delay` is the
    * lateness allowance; rows later than it may silently lose matches —
    * the standard watermark contract, choose it per source. Both inputs
    * must carry `key` and `tsCol`; output columns are qualified `l`/`r`.
    *
    * Keep downstream CROSS-SIDE predicates out of the streaming plan:
    * a filter like `l.id < r.id` (the usual self-join canonicalization)
    * gets pushed INTO the join condition, where Spark's
    * StreamingJoinHelper fails to extract the state-watermark constraint
    * from the now-mixed conjunction — join state then outlives the band
    * (it logs `Error trying to extract state constraint` per batch).
    * Canonicalize in `foreachBatch` or after the sink instead
    * (JoinsStreamSpec shows the pattern).
    */
  def interval(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               bandSeconds: Long, delay: String = "2 minutes"): DataFrame = {
    require(bandSeconds >= 0, s"bandSeconds must be >= 0: $bandSeconds")
    val l = left.withWatermark(tsCol, delay).alias("l")
    val r = right.withWatermark(tsCol, delay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key" +
        s" AND r.$tsCol >= l.$tsCol - interval $bandSeconds seconds" +
        s" AND r.$tsCol <= l.$tsCol + interval $bandSeconds seconds"))
  }
}
