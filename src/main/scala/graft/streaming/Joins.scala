package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native stream-stream joins beyond the reference (which only aligns by
  * arrival order — see [[Align]]). The watermarked interval join is the
  * streaming twin of `queries.ScaleOps.join_range_band`, and it uses the
  * SAME bin trick, for a reason that is easy to miss: Spark's symmetric
  * hash join organizes each side's buffered state by the EQUI-key only —
  * the time-range conjuncts bound how long rows are RETAINED (state
  * eviction), but not how many rows a probe SCANS. Join on a low-
  * cardinality key alone (5 event types) and every arriving row walks
  * every buffered row of its key: O(n²/k) probe work — measured as a
  * wall-clock hang at 100k rows/side. Folding `floor(time / band)` into
  * the equi-key (right side replicated into its 3 adjacent bins, exactly
  * the batch plan) bounds both: state per (key, bin) is per-key rate ×
  * band, probes scan only that, and any pair within the band still
  * matches exactly once.
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
    require(bandSeconds >= 1, s"bandSeconds must be >= 1: $bandSeconds")
    // loud collision check (same contract as Governance.capPerDomain):
    // withColumn would silently REPLACE a caller's __graft_bin and the
    // final drop would then remove it from the output
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      require(!df.columns.contains("__graft_bin"),
        s"$side input already has a __graft_bin column — rename it before interval()")
    }
    val bandUs = bandSeconds * 1000000L
    def bin(shift: Long): Column =
      expr(s"unix_micros($tsCol) DIV $bandUs") + lit(shift)
    val l = left.withColumn("__graft_bin", bin(0))
      .withWatermark(tsCol, delay).alias("l")
    val r = right
      .withColumn("__graft_bin", explode(array(bin(-1), bin(0), bin(1))))
      .withWatermark(tsCol, delay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND l.__graft_bin = r.__graft_bin" +
        s" AND r.$tsCol >= l.$tsCol - interval $bandSeconds seconds" +
        s" AND r.$tsCol <= l.$tsCol + interval $bandSeconds seconds"))
      .drop(col("l.__graft_bin")).drop(col("r.__graft_bin"))
  }
}
