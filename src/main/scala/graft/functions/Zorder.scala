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

  /** N-dimensional Morton key: bit `i` of dimension `j` lands at
    * position `i·k + j` — for k = 2 this is bit-identical to
    * [[interleave]] (ZorderSpec pins the equality). Same input
    * contract: each column already normalized to [0, 2^bits), and
    * `bits · k` must fit a positive long. */
  def interleaveAll(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 2, s"interleaveAll needs >= 2 dimensions, got $k")
    require(bits >= 1 && bits * k <= 63,
      s"bits*dims must be in [1, 63]: bits=$bits over $k dims")
    val longs = cols.map(_.cast("long"))
    (for { i <- 0 until bits; j <- 0 until k }
      yield shiftleft(shiftright(longs(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ + _)
  }
}
