package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE definition of the ANN benches' shared data construction —
  * corpus replication and the seeded query-vector stream — so
  * [[AnnGeometryBench]] and [[AnnServeBench]] can never desync on the
  * id-offset scheme or the RNG sequence that makes their rows
  * cross-round and cross-bench comparable. */
object AnnBenchData {

  /** Query ids start here — above every replica id
    * ([[replicated]] offsets by at most rep × 10⁹ over small base ids). */
  val QueryIdBase = 3000000000000L

  /** Planted-neighbor ids ([[AnnGeometryBench]]) start here. */
  val PlantedIdBase = 4000000000000L

  /** The sf embeddings corpus replicated `rep`× with distinct ids and
    * identical vectors: bucket occupancy scales exactly, planted recall
    * is untouched, and the data stays deterministic across rounds. */
  def replicated(spark: SparkSession, sfDir: String, rep: Int): DataFrame = {
    import spark.implicits._
    val base = spark.read.parquet(sfDir + "/embeddings.parquet")
      .select($"vec_id", $"embedding")
    if (rep == 1) base
    else spark.range(rep).crossJoin(base)
      .select(($"vec_id" + $"id" * 1000000000L).as("vec_id"), $"embedding")
  }

  /** The benches' RNG: one fixed seed, consumed SEQUENTIALLY — queries
    * first, then (in the geometry bench) the planted neighbors — so the
    * exact vector stream reproduces across rounds. */
  def rng(): scala.util.Random = new scala.util.Random(421)

  def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
  }

  def gauss(r: scala.util.Random, dim: Int): Array[Double] =
    unit(Array.fill(dim)(r.nextGaussian()))

  /** `n` seeded unit-gaussian query vectors with ids from
    * [[QueryIdBase]]. */
  def queries(r: scala.util.Random, dim: Int,
              n: Int): Array[(Long, Array[Float])] =
    Array.tabulate(n)(i => (QueryIdBase + i, gauss(r, dim).map(_.toFloat)))

  /** Drop a built index's tables and its tombstone sidecar. */
  def dropIndex(spark: SparkSession,
                idx: graft.functions.AnnIndex.Handle): Unit =
    Seq(idx.probeTable, idx.vecTable, idx.probeTable + "_tombs")
      .foreach(graft.functions.Bucketing.dropTableAndLocation(spark, _))
}
