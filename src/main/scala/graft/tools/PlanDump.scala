package graft.tools

import java.nio.file.{Files, Paths}

/** Plan-audit batch tool: dump `.explain("formatted")` of every SparkEntry
  * query (or a comma-separated subset) to `<outDir>/<query>_<tag>.txt` in
  * ONE JVM — the per-plan sibling of [[graft.Explain]], for the
  * optimization rounds' before/after plan artifacts. Plans are built but
  * NOT executed (construction only), so the dump is cheap and the files
  * show the AQE initial plan exactly as `explain` prints it.
  *
  * usage: runMain graft.tools.PlanDump <outDir> <tag> [sfDir] [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [sfDir] [names]")
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.Sessions.local(appName = "graft-plandump")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
