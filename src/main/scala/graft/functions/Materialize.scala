package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Fault-tolerance-aware plan materialization — the one place iterative
  * and multi-consumer operators cut lineage / pin an intermediate result.
  *
  * Why not `localCheckpoint()` everywhere: localCheckpoint stores blocks
  * on executors ONLY and truncates the recompute lineage. On a real
  * cluster, losing one executor (preemption is routine at 100 TB scale)
  * kills the whole query with no recovery path. It is only safe when the
  * executor failure domain equals the driver's — i.e. `local[*]`, where
  * losing "the executor" is losing the JVM anyway.
  *
  * Policy (override with conf `spark.graft.materialize`):
  *  - `reliable` — `df.checkpoint()`: eager, lineage truncated, blocks in
  *    the (replicated, driver-independent) checkpoint dir. Chosen by
  *    `auto` whenever `SparkContext.setCheckpointDir` has been called.
  *  - `local` — `df.localCheckpoint()`: fastest; executor-resident blocks,
  *    no recompute path. Chosen by `auto` only on a `local[*]` master.
  *  - `disk` — `persist(DISK_ONLY_2)` + eager count: blocks on 2
  *    executors' disks AND the recompute lineage intact, so an executor
  *    loss degrades to a re-read, never a query failure. Chosen by
  *    `auto` on a cluster master with no checkpoint dir. Lineage is NOT
  *    truncated (Catalyst swaps the cached fragment in at planning), so
  *    release superseded rounds with [[release]] in long loops.
  */
object Materialize {

  val ConfKey = "spark.graft.materialize"

  /** Resolve the effective mode for this session: the explicit conf value,
    * or `auto`'s environment-driven choice (see object doc). */
  def mode(spark: SparkSession): String = {
    val conf = spark.conf.get(ConfKey, "auto")
    conf match {
      case "reliable" | "local" | "disk" => conf
      case "auto" =>
        if (spark.sparkContext.getCheckpointDir.isDefined) "reliable"
        else if (spark.sparkContext.isLocal) "local"
        else "disk"
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be auto|reliable|local|disk, got: $other")
    }
  }

  /** Eagerly materialize `df` under the session's fault-tolerance policy
    * and return the DataFrame downstream consumers should use. Always
    * eager — on return the result exists and multi-consumer plans will
    * not recompute the input. */
  def cut(df: DataFrame): DataFrame = mode(df.sparkSession) match {
    case "reliable" => df.checkpoint() // eager by default
    case "local"    => df.localCheckpoint()
    case "disk" =>
      df.persist(StorageLevel.DISK_ONLY_2)
      df.count() // materialize now; replicated blocks + intact lineage
      df
  }

  /** Free a cut that has been superseded (iterative loops) or fully
    * consumed. No-op for checkpoint-based cuts — their cleanup is the
    * checkpoint dir's lifecycle / ContextCleaner's, not per-round. */
  def release(df: DataFrame): Unit =
    if (df.storageLevel != StorageLevel.NONE) df.unpersist(blocking = false)
}
