package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global total-order operations that scale.
  *
  * A `ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY funnels the
  * whole dataset through a single task (Spark even warns). The reference's
  * positional operators (`slice` core.py:1029, `zip` core.py:1575,
  * `partition` core.py:1078) are defined on global arrival order, so the
  * engine needs a global numbering that stays parallel: range-partition by
  * the sort key, sort within partitions, then add per-partition row-count
  * offsets — the DataFrame analogue of `RDD.zipWithIndex`. Two passes over
  * the (cached) sorted data: one tiny count job, one main job.
  */
object GlobalOrder {

  /** Append `rnCol` = 1-based global row number under the total order
    * `order` (which must be tie-free for determinism). Parallelism =
    * `defaultParallelism` range partitions; no single-partition window
    * anywhere in the plan.
    */
  def withRowNumber(df: DataFrame, rnCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // adaptive: a 1-split input already fits one task, so the plain window
    // (one sort, no extra jobs) is the better plan there; any multi-split
    // input takes the parallel offsets path below
    if (df.rdd.getNumPartitions <= 1)
      return df.withColumn(rnCol,
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
          .cast("long"))
    // cache so the count job and the main job see the identical partition
    // layout (range boundaries come from sampling the same materialization)
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .init.map(_._2) // cumulative rows before each partition, in pid order
    val offMap = map(counts.map(_._1).zip(offsets).flatMap {
      case (pid, off) => Seq(lit(pid), lit(off))
    }: _*)
    // monotonically_increasing_id = (pid << 33) | index-within-partition,
    // assigned in iteration order — i.e. the sorted order within each part
    sorted
      .withColumn(rnCol,
        element_at(offMap, col("__pid"))
          + (monotonically_increasing_id() - (col("__pid").cast("long") * lit(1L << 33))) + 1L)
      .drop("__pid")
  }

}
