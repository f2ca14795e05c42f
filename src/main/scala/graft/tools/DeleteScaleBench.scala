package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.TableLog

/** Measures the claim behind [[TableLog.deleteRange]]/[[TableLog.deleteIn]]:
  * on a table compacted `layoutBy` the delete column, a takedown's cost
  * tracks the VICTIM SPAN (manifest stats confine both the locate scan
  * and the rewrite to the files whose recorded range holds the targets),
  * not the table — while a delete on a column the layout knows nothing
  * about honestly pays an O(table) locate scan.
  *
  * `runMain graft.tools.DeleteScaleBench [factor]` builds two TableLog
  * tables of synthetic (id, payload) rows — one at the base row count,
  * one `factor`× larger — each compacted `layoutBy id`, then times on
  * each:
  *  - a `deleteRange` of the SAME fixed-width id span (stats-pruned
  *    path): time and files-opened should stay ~flat across table sizes;
  *  - a predicate `delete` on the md5 payload (no stats for it): the
  *    locate pass reads every file, so time should track the table.
  * One JSON line, the [[AnnAppendBench]] report shape. */
object DeleteScaleBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(16)
    val baseRows = args.lift(1).map(_.toLong).getOrElse(2_000_000L)
    val spark = Sessions.local(appName = "graft-delete-scale-bench")

    def mkTable(rows: Long, chunks: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_delbench").toString + "/t"
      val per = rows / chunks
      (0 until chunks).foreach { b =>
        val df = spark.range(b * per, (b + 1) * per)
          .select(col("id"), md5(col("id").cast("string")).as("payload"))
        TableLog.appendBatch(df, dir, "bench", b.toLong)
      }
      // ~32 files in the base table, scaling with rows so the per-file
      // row count (and thus the pruning geometry) matches across sizes
      val m = TableLog.latest(spark, dir).get
      TableLog.compact(spark, dir, targetBytes = m.bytes / (32 * rows / baseRows),
        layoutBy = Seq("id"))
      dir
    }
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def run(rows: Long): (Long, Double, Long, Long, Double, Long) = {
      val dir = mkTable(rows, chunks = 8)
      val files = TableLog.latest(spark, dir).get.files.size.toLong
      // fixed-width victim span in the middle — the takedown shape; the
      // SAME absolute width on both tables, so flat time = stats pruning
      val lo = rows / 2
      val hi = lo + 999L
      val opened = TableLog.prunedFiles(spark, dir, "id", lo, hi).size.toLong
      val (tRange, nRange) = timed(TableLog.deleteRange(spark, dir, "id", lo, hi))
      require(nRange == 1000L, s"ranged delete removed $nRange of 1000")
      // payload carries no manifest stats: the locate pass must read the
      // whole table; a rare prefix keeps the rewrite itself small so the
      // measured growth is the scan, not rewrite volume
      val (tScan, nScan) = timed(
        TableLog.delete(spark, dir, col("payload").startsWith("00000")))
      (files, tRange, opened, nRange, tScan, nScan)
    }
    run(baseRows / 4) // session/JIT warmup, discarded
    val (fS, trS, opS, _, tsS, nsS) = run(baseRows)
    val (fB, trB, opB, _, tsB, nsB) = run(baseRows * factor)
    println(f"""{"rows_small":$baseRows,"rows_big":${baseRows * factor},"factor":$factor,"files_small":$fS,"files_big":$fB,"ranged_sec_small":$trS%.2f,"ranged_sec_big":$trB%.2f,"ranged_files_opened_small":$opS,"ranged_files_opened_big":$opB,"ranged_ratio":${trB / trS}%.2f,"scan_sec_small":$tsS%.2f,"scan_sec_big":$tsB%.2f,"scan_rows_small":$nsS,"scan_rows_big":$nsB,"scan_ratio":${tsB / tsS}%.2f}""")
    spark.stop()
  }
}
