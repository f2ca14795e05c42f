package graft.tools

import graft.Sessions
import graft.functions.TableLog

/** The MAINTENANCE PROCESS of the cross-process race proof
  * (CrossProcessSpec): a standalone JVM running the one-at-a-time
  * maintenance loop — compact, a takedown-shaped deleteIn, vacuum under
  * a real grace — against a table that OTHER processes are appending
  * to. Every commit it makes contends the [[graft.functions.CommitStore]]
  * CAS with the appenders' commits: a lost CAS re-plans (compact
  * rebases over the appends that beat it; delete re-plans on
  * write-skew), never clobbers.
  *
  * Args: tableDir rounds deleteBase resultFile. Per round r it deletes
  * ids `[deleteBase + r*10, deleteBase + r*10 + 10)` (the parent plants
  * those rows and asserts exactly they are gone), compacts, and vacuums
  * with a 10-minute grace (so a sibling's just-landed but not-yet-
  * committed files are never swept). Writes one `round:<r>:ok` line per
  * completed round plus `done:<ms>`; exits 0 on success, 2 on error. */
object MaintChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val rounds = args(1).toInt
    val deleteBase = args(2).toLong; val resultFile = args(3)
    try {
      val spark = Sessions.local(cpus = "4", appName = "graft-maint")
      val out = new java.io.PrintWriter(
        new java.io.FileWriter(resultFile, /*append=*/ false))
      try {
        (0 until rounds).foreach { r =>
          val victims = (0 until 10).map(i => deleteBase + r * 10 + i)
          val deleted = TableLog.deleteIn(spark, dir, "id", victims)
          require(deleted == 10L,
            s"maintenance round $r deleted $deleted of 10 planted rows")
          TableLog.compact(spark, dir, targetBytes = 8L << 20)
          TableLog.vacuum(spark, dir, graceMs = 600000L)
          out.println(s"round:$r:ok")
          out.flush()
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
