package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global total-order operations that scale.
  *
  * A `ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY funnels the
  * whole dataset through a single task (Spark even warns). The reference's
  * positional operators (`slice` core.py:1029, `zip` core.py:1575,
  * `partition` core.py:1078) are defined on global arrival order, so the
  * engine needs a global numbering that stays parallel: range-partition by
  * the sort key, sort within partitions, then `RDD.zipWithIndex` (one
  * count job + one main job over the SAME shuffled RDD, so the range
  * boundaries are computed once and shuffle files are reused — no cache
  * pinned, nothing leaked).
  */
object GlobalOrder {

  /** Largest rank bound [[slice]] serves via the top-k plan: a per-task
    * heap of this many rows (~10 MB at 100 B/row) plus one merge task
    * holding it once — past this, two-pass parallel numbering wins. */
  val MaxTake = 100000L

  /** Append `rnCol` = 1-based global row number under the total order
    * `order` (which must be tie-free for determinism). Parallelism =
    * `defaultParallelism` range partitions; no single-partition window
    * anywhere in the multi-split plan.
    */
  def withRowNumber(df: DataFrame, rnCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // adaptive: a 1-split input already fits one task, so the plain window
    // (one sort, no extra jobs) is the better plan there; any multi-split
    // input takes the parallel path below
    if (df.rdd.getNumPartitions <= 1)
      return df.withColumn(rnCol,
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
          .cast("long"))
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(rnCol, LongType, nullable = false))
    // RDD-level persist (not DataFrame .cache): downstream actions reuse
    // the sorted+numbered rows instead of re-running the reduce-side sort,
    // and the blocks are dropped by the ContextCleaner once the RDD is
    // unreachable — nothing pins storage for the session's lifetime.
    // (zipWithIndex runs its count job eagerly here — inherent to the
    // two-pass numbering, same as RDD.zipWithIndex anywhere.)
    val withRn = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    spark.createDataFrame(withRn, schema)
  }

  /** Rows with `lo < rn <= hi` under the global order `order`, with
    * `rnCol` attached — WITHOUT numbering anything beyond rank `hi`.
    *
    * `sort(order).limit(hi)` plans as TakeOrderedAndProject when `hi`
    * is under `spark.sql.execution.topKSortFallbackThreshold`: each scan
    * task keeps a `hi`-row heap and one merge assembles `hi` rows — no
    * range shuffle of the full dataset, no count job, nothing written
    * to shuffle storage beyond `tasks × hi` rows. At 100 TB that is the
    * difference between "slice the first 200 rows" touching every byte
    * twice ([[withRowNumber]]'s two passes) and a single scan that
    * discards everything below the heap threshold. The merged ≤`hi`-row
    * result is then numbered with the single-partition window ON
    * PURPOSE — it is `hi` rows by construction (PlanSpec pins the
    * TakeOrderedAndProject shape and the absence of a range exchange).
    *
    * For large `hi` the per-task heap and single merge stop being a
    * win (Spark's own `topKSortFallbackThreshold` defaults to unlimited,
    * so the planner will NOT protect us) — beyond [[MaxTake]] rows, or
    * beyond the session threshold if the deployment lowered it, this
    * delegates to [[withRowNumber]] + filter: two passes, but parallel
    * and memory-bounded.
    */
  def slice(df: DataFrame, rnCol: String, lo: Long, hi: Long,
            order: Column*): DataFrame = {
    require(lo >= 0 && hi > lo, s"need 0 <= lo < hi: $lo, $hi")
    val spark = df.sparkSession
    // Spark plans TakeOrderedAndProject only when limit < threshold
    // (strict), so the session threshold is an EXCLUSIVE bound: hi ==
    // threshold would silently take a full global sort. MaxTake is our
    // own inclusive constant.
    val topK = spark.conf.getOption("spark.sql.execution.topKSortFallbackThreshold")
      .map(_.toLong - 1).getOrElse(MaxTake).min(MaxTake)
    if (hi > topK)
      return withRowNumber(df, rnCol, order: _*)
        .filter(col(rnCol) > lo && col(rnCol) <= hi)
    df.sort(order: _*).limit(hi.toInt)
      .withColumn(rnCol,
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
          .cast("long"))
      .filter(col(rnCol) > lo)
  }
}
