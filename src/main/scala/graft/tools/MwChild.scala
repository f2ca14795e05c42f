package graft.tools

import graft.Sessions
import graft.functions.TableLog

/** One CONTENDING WRITER PROCESS of the cross-process multi-writer
  * proof: a standalone JVM (spawned by [[ForkedJvm]] from
  * CrossProcessSpec or `MwBench --fork`) that appends a run of batches
  * to a shared TableLog table and records each commit's outcome.
  * Nothing is shared with its siblings except the table directory —
  * no group-commit queue, no store mutex, no JVM statics — so every
  * landed batch rode the [[graft.functions.CommitStore]] CAS across
  * real OS processes.
  *
  * Args: tableDir runKey batchLo batchHi rowsPerBatch resultFile
  * [barrierDir]. Writes one `batchId:true|false` line per attempted
  * batch (true = committed, false = zombie-fenced by a replica in
  * another process) plus a final `done:<epochMillis>` line to
  * `resultFile`; exits 0 on success, 2 on any error.
  *
  * With `barrierDir`, the child touches `ready-<runKey>` after its
  * session is up and BLOCKS until the parent creates `go` — so a
  * measured fork run times contended appends, not Spark startup
  * jitter. */
object MwChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val runKey = args(1)
    val lo = args(2).toLong; val hi = args(3).toLong
    val rows = args(4).toInt; val resultFile = args(5)
    val barrier = args.lift(6)
    try {
      val spark = Sessions.local(cpus = "4", appName = s"graft-mw-$runKey")
      import spark.implicits._
      val pid = ProcessHandle.current().pid()
      barrier.foreach { bd =>
        val d = java.nio.file.Paths.get(bd)
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.write(d.resolve(s"ready-$runKey"),
          Array.empty[Byte])
        val go = d.resolve("go")
        val deadline = System.currentTimeMillis() + 120000L
        while (!java.nio.file.Files.exists(go)) {
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException("barrier 'go' never appeared")
          Thread.sleep(20)
        }
      }
      val out = new java.io.PrintWriter(
        new java.io.FileWriter(resultFile, /*append=*/ false))
      try {
        (lo until hi).foreach { b =>
          val df = Seq.tabulate(rows)(i =>
            (pid * 1000000000L + b * 100000L + i, s"$runKey-b$b"))
            .toDF("id", "v").coalesce(1)
          val landed = TableLog.appendBatch(df, dir, runKey, b)
          out.println(s"$b:$landed")
        }
        out.println(s"done:${System.currentTimeMillis()}")
      } finally out.close()
      spark.stop()
      sys.exit(0)
    } catch {
      case t: Throwable =>
        t.printStackTrace()
        sys.exit(2)
    }
  }
}
