package graft.tools

import java.nio.file.Files

import graft.Sessions
import graft.functions.TableLog

/** Multi-writer commit contention, standalone (the StreamBench row 13
  * harness extracted so the group-commit fold can be measured without
  * the 6-minute full streaming suite): N driver threads with DISTINCT
  * runKeys interleave 1k-row batches into ONE table. The final
  * manifest must hold every batch — a mismatch prints a NEGATIVE rate
  * so a lost batch can never read as fast. Prints one JSON line with
  * commits/s at 2, 4 and 8 writers. */
object MwBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-mwbench")
    import spark.implicits._
    val mwRows = 1000
    val mwBatches = 8
    def rmTemp(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    def mwRun(writers: Int): Double = {
      val mwRoot = Files.createTempDirectory("graft_mw")
      val mwDir = mwRoot.toString + "/t"
      def mwDf(w: Int, b: Int) =
        Seq.tabulate(mwRows)(i =>
          (w * 1000000000L + b * 10000L + i, s"w$w-b$b", 0L))
          .toDF("doc_id", "text", "seq").coalesce(1)
      TableLog.appendBatch(mwDf(99, 0), mwDir, "warm", 0L) // schema + JIT
      val threads = (0 until writers).map { w =>
        new Thread(() => (0 until mwBatches).foreach { b =>
          TableLog.appendBatch(mwDf(w, b), mwDir, s"w$w", b.toLong)
        })
      }
      val t = System.nanoTime()
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t) / 1e9
      val ok = TableLog.rows(spark, mwDir) ==
        (writers * mwBatches + 1).toLong * mwRows
      rmTemp(mwRoot)
      (if (ok) 1 else -1) * writers * mwBatches / sec
    }
    mwRun(2) // JIT/classload warmup pass, unrecorded
    val r2 = mwRun(2)
    val r4 = mwRun(4)
    val r8 = mwRun(8)
    println(f"""{"multi_writer_commits_per_sec":$r2%.1f,"multi_writer4_commits_per_sec":$r4%.1f,"multi_writer8_commits_per_sec":$r8%.1f}""")
    spark.stop()
  }
}
