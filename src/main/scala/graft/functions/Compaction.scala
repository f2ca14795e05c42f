package graft.functions

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the maintenance pass every streaming-sink
  * table needs: micro-batch writers emit a file per (batch × partition),
  * and a month of 30-second triggers turns a table into 10⁵ kilobyte
  * files whose open/footer overhead dominates every later scan. Compact
  * rewrites the table into files near a target size.
  *
  * Scale design: the file count is derived from the table's ACTUAL bytes
  * (filesystem metadata, no data read), and the rewrite is one
  * `repartition(n)` — a single round-robin shuffle, no driver-side
  * row handling. Rewrite-then-swap keeps the operation crash-safe:
  * the new files land in a staging directory and replace the table only
  * after the write commits (on a real deployment the swap is the table
  * format's transaction — Delta/Iceberg `OPTIMIZE`; on raw directories
  * it is a rename, and readers mid-swap see the old listing).
  */
object Compaction {

  /** Bytes of all data files under `dir` (filesystem metadata only). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Target output file count for `bytes` of data: ceil(bytes/target),
    * min 1. */
  def targetFiles(bytes: Long, targetBytes: Long): Int = {
    require(targetBytes >= 1, s"targetBytes must be >= 1: $targetBytes")
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Compact the parquet table at `dir` into ~`targetBytes` files via a
    * staging rewrite + atomic-as-the-filesystem-allows rename swap.
    * Returns the number of files written. */
  def compactParquet(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val n = targetFiles(dataBytes(spark, dir), targetBytes)
    val staging = dir.stripSuffix("/") + "__compacting"
    spark.read.parquet(dir).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val path = new org.apache.hadoop.fs.Path(dir)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "__precompact")
    if (!fs.rename(path, backup))
      throw new java.io.IOException(s"could not stage out $dir")
    if (!fs.rename(stagingPath, path)) {
      fs.rename(backup, path) // restore; staging left for inspection
      throw new java.io.IOException(s"could not swap $staging into $dir")
    }
    fs.delete(backup, true)
    n
  }

  /** Plan-only variant for sinks still being written: coalesce `df` to
    * the file count its estimated bytes call for. `bytesPerRow` comes
    * from a sampled or historical measurement; coalesce (not
    * repartition) so the pre-write shuffle is avoided when shrinking. */
  def coalesceForWrite(df: DataFrame, rows: Long, bytesPerRow: Long,
                       targetBytes: Long): DataFrame =
    df.coalesce(targetFiles(rows * bytesPerRow, targetBytes))
}
