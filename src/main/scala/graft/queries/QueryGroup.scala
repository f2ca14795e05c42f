package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named group of SparkEntry queries plus their DuckDB oracle SQL.
  *
  * Oracle-parity rules (the driver hash-compares our parquet output with
  * DuckDB's result for the same SQL, so values must match bit-for-bit):
  *
  *  - Sums/averages of doubles go through [[dsum]]: cast each addend to
  *    DECIMAL(38,s) and sum exactly, so the result is independent of
  *    aggregation order. Both Spark and DuckDB convert double→decimal via
  *    the shortest-decimal representation, so the casts agree too.
  *  - COUNT is always a BIGINT on both sides (DuckDB SUM(int) would be
  *    HUGEINT — never sum raw ints in the oracle without a cast).
  *  - events.ts ordering uses (ts, event_id) so ties can't reorder;
  *    DuckDB orders by CAST(ts AS TIMESTAMP) to match our µs truncation.
  *  - Every computed column is aliased identically on both sides.
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q]
  def oracle: Map[String, String]

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** Ensure a scan feeding compute-heavy per-row kernels (hashing, dot
    * products) has at least `defaultParallelism` partitions. The test
    * parquet files are single-row-group, so without this a narrow in-row
    * pipeline runs on ONE core; on a real cluster the scan already has
    * more splits than cores and this is a no-op.
    */
  protected def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact-arithmetic (order-independent) sum of a double column. */
  protected def dec(c: Column, scale: Int): Column =
    c.cast(DecimalType(38, scale))
  /** Bit-identical to `sum(dec(c, scale)).cast("double")` — the oracle's
    * DSUM — but accumulating in FixedSum's two-long 128-bit buffer, which
    * keeps hot aggregates inside whole-stage codegen instead of paying
    * per-row Decimal38 (de)serialization (2.9× on q1_agg at sf1, see
    * tools/IsoAgg). Parity pinned bit-for-bit by FixedSumSpec.
    *
    * Domain rule (FixedSum throws past |x| ≥ ~9.2e18/10^s): use [[dsum]]
    * only for columns whose domain is bounded a priori — schema-bounded
    * amounts (prices ≤ ~1e5, quantities ≤ 50, their squares/products) and
    * [0,1] ratios, where the bound sits ≥4 orders of magnitude out at any
    * data scale. Columns whose magnitude GROWS with corpus size (counts,
    * count-derived ratios like inv_p = N/df) take [[dsumWide]] instead —
    * same bits, decimal buffer, no term bound. */
  protected def dsum(c: Column, scale: Int = 4): Column =
    graft.functions.native.fixed_sum(c, scale)
  /** The decimal-cast twin of [[dsum]] for outlier-capable columns: terms
    * up to ~1e34 and a silent null past DECIMAL(38) instead of FixedSum's
    * 64-bit term bound. Slower (per-row BigDecimal traffic) — only for
    * sums whose term domain scales with the data. */
  protected def dsumWide(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast("double")
  /** Oracle-side fragment matching [[dsum]]. */
  protected def DSUM(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,$scale))) AS DOUBLE)"

  /** DuckDB ORDER BY fragment matching our normalized event time. */
  protected val EVT_ORDER = "CAST(ts AS TIMESTAMP), event_id"
}
