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

  /** [[spread]] gated on bytes per split — for scans whose downstream
    * work is heavy ENOUGH per byte to amortize one round-robin exchange,
    * but only once the split carries real data. Three-way behavior, all
    * from the same rule (guide §2: scale-adaptive, never a constant):
    *  - real cluster / many splits: no-op (the partition-count gate);
    *  - tiny local inputs (the driver's sf0.1 files): no-op — r17
    *    measured a blanket spread() SLOWER on 9 of 10 text queries at
    *    that size because the exchange outweighed sub-second kernels,
    *    and this keeps the driver's bench rows byte-identical to r17;
    *  - the 20×+ scaling fixtures (single-row-group files, multi-second
    *    kernels): repartition — the r18 scaling runs measured every
    *    heavy text/agg query serialized on a 1-task scan without it
    *    (e.g. text_lm_surprisal 17.7 s with an 11.4 s single-task stage).
    * `minTotalBytes` is a property of the KERNEL CLASS (how much work
    * one byte of input generates), not of any scale factor — callers
    * pass ~1 MB for regex/hash-heavy document kernels, more for cheap
    * columnar aggregates. TOTAL scan bytes, not per split: a 4-split
    * scan of a heavy kernel is still 8× short of the core count, and
    * the exchange cost the gate weighs scales with total bytes. Size
    * comes from the optimizer's scan stats (file bytes), no job runs. */
  protected def spreadHeavy(df: DataFrame, minTotalBytes: Long): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (df.queryExecution.optimizedPlan.stats.sizeInBytes >
        BigInt(minTotalBytes)) df.repartition(target)
    else df
  }

  /** [[spread]] + an eager [[graft.functions.Materialize.cut]] of the
    * repartitioned RAW rows, applied ONLY when the repartition actually
    * widened a narrow scan. Why the cut: Catalyst pushes deterministic
    * projections below a repartition's exchange, so a heavy kernel
    * projection (shingles3, minhash prep) otherwise evaluates inside the
    * 1-task scan stage — once per consumer subtree (r17 measured two
    * ~1.2 s single-task stages at sf0.1 growing to two ~6 s stages at
    * 20×, RDD-lineage-verified). Cutting the raw rows pins them wide so
    * every consumer's kernel runs at full width, and costs only the raw
    * bytes (pre-kernel, no arrays). At real scale the scan is already
    * wide and NOTHING is materialized — the no-op branch. */
  protected def spreadCut(df: DataFrame, minTotalBytes: Long = 0L): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (minTotalBytes == 0L ||
        df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(minTotalBytes))
      graft.functions.Materialize.cut(df.repartition(target))
    else df // below the byte gate: the exchange+cut would outweigh the kernel
  }

  /** Does `df` scan narrow (fewer splits than cores) AND heavy (more
    * than `minBytesPerSplit` per split)? The [[spreadHeavy]] predicate,
    * exposed for queries that must pick a PLAN SHAPE from it (e.g. an
    * explicit-width co-partitioned join that is pure overhead at tiny
    * scale) — results are identical either way, only the physical width
    * changes. False on any multi-split scan (real clusters). */
  protected def narrowHeavyScan(df: DataFrame, minTotalBytes: Long): Boolean = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    df.rdd.getNumPartitions < target &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(minTotalBytes)
  }

  /** [[spreadHeavy]] thresholds by kernel class — how many TOTAL scan
    * bytes before the downstream work dwarfs one exchange of them.
    * Chosen from the r18 20× stage tables (multi-second kernels at a few
    * MB per split) against r17's sf0.1 negative results (sub-second
    * kernels at ≤ 2 MB lost to the exchange). */
  protected val SpreadDocKernel: Long = 1L << 20 // regex/hash/explode doc kernels
  protected val SpreadRowKernel: Long = 8L << 20 // per-row JSON/struct parses
  protected val SpreadAggScan: Long = 48L << 20 // cheap columnar partial aggregates

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
