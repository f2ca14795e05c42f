package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving as a Column expression — the layout key
  * behind `zorder_layout` / `zorder_layout_ranked` (queries.ScaleOps) and
  * the periodic re-layout stage of the streaming maintenance loop
  * (examples.TrainingDataPipeline): sorting by the interleaved key places
  * rows close in BOTH dimensions into the same parquet files, so footer
  * min/max stats prune either predicate.
  *
  * Inputs must already be normalized to [0, 2^bits) — min/max or rank
  * normalization is the caller's choice (ScaleOps shows both; feeding
  * wider values silently truncates to the low `bits` bits, which is the
  * usual Z-order convention but worth knowing). The sum is exact OR:
  * every term occupies a distinct bit. ScaleOps renders the same
  * interleave for DuckDB, and the oracle equality of zorder_layout pins
  * this Column form bit-identical to that independent rendering.
  */
object Zorder {

  /** Morton key of two `bits`-wide dimensions: Σᵢ ((x≫i)&1)≪2i +
    * ((y≫i)&1)≪(2i+1). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // widen to long BEFORE shifting: shiftleft preserves the input type,
    // so an IntegerType input with bits > 15 would overflow int32 and
    // corrupt the Morton key — the long key is the contract either way
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
