package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TableLog

/** Measures [[graft.functions.TableLog.mirror]] — the change-feed
  * replicated-copy consumer:
  *
  *  - BACKLOG catch-up: a `versions`-deep source history (appends with
  *    interleaved deletes) cleared by one standing mirror from a cold
  *    checkpoint — the whole span arrives as ONE feed micro-batch and
  *    applies per source version, so this prices the per-version fixed
  *    cost (head read + delete + ledger-fenced append) times the lag.
  *  - LIVE cadence: one source commit round (append + every 4th round
  *    a delete) followed by the mirror converging, repeated — the
  *    steady-state lag a serving copy runs at.
  *
  * The mirror is verified row-identical to the source at the end; a
  * mismatch makes every reported rate negative so a broken run can
  * never read as a fast one. `runMain graft.tools.MirrorBench
  * [rowsPerVersion] [backlogVersions] [liveRounds]` (defaults 2000, 24,
  * 12; the 20× leg passes 40000; the DEEP-BACKLOG leg passes e.g.
  * `200 1000 4` — an overnight-scale lag, where the judged claims are
  * that the per-version catch-up cost stays flat as the backlog grows
  * ~42×, that driver-side feed ANALYSIS stays bounded (the pairwise
  * readChanges union fold is O(n log n), and the mirror's 256-version
  * admission cap means each feed trigger analyzes a bounded window),
  * and that heap does not scale with the backlog). Prints one JSON
  * line, including `mirror_catchup_sec_per_version` (the flatness
  * number to compare across legs) and `driver_heap_used_mb` measured
  * after the catch-up. */
object MirrorBench {

  private def heapMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
  }

  def main(args: Array[String]): Unit = {
    val rowsPerV = args.headOption.map(_.toInt).getOrElse(2000)
    val backlogVersions = args.lift(1).map(_.toInt).getOrElse(24)
    val liveRounds = args.lift(2).map(_.toInt).getOrElse(12)
    // the deep leg COMMITS thousands of times building its history, and
    // Spark's status store retains execution/job/stage metadata (plan
    // strings included) for up to 1000 of them — harness noise that
    // would otherwise dominate the "mirror heap is flat in backlog
    // depth" measurement. SparkConf reads spark.* system properties.
    System.setProperty("spark.sql.ui.retainedExecutions", "50")
    System.setProperty("spark.ui.retainedJobs", "100")
    System.setProperty("spark.ui.retainedStages", "100")
    val spark = graft.Sessions.local(appName = "graft-mirrorbench")
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mb").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    val ck = s"$root/ck"

    def batch(v: Int) =
      Seq.tabulate(rowsPerV)(i => (v * 1000000L + i, s"payload-$v-$i"))
        .toDF("id", "v").coalesce(1)
    // every 4th version deletes a slice of an EARLIER version's rows —
    // the feed then carries both change types through the whole run
    def commitRound(v: Int): Unit = {
      TableLog.appendBatch(batch(v), src, "w", v.toLong)
      if (v % 4 == 3)
        TableLog.deleteRange(spark, src, "id",
          (v - 2) * 1000000L, (v - 2) * 1000000L + rowsPerV / 4)
    }

    // production posture for a takedown-bearing table: track per-file
    // id stats from the first commit (ingest is id-monotone here, so
    // every deleteRange prunes to the one file holding its span).
    // Without this the build loop's every-4th-round delete scans ALL
    // live files to locate victims — an O(history²) bench-harness
    // artifact that swamps the head-resolution cost this leg measures.
    commitRound(0)
    TableLog.trackStats(spark, src, Seq("id"))
    (1 until backlogVersions).foreach(commitRound)
    val srcVersions = TableLog.latest(spark, src).get.version + 1

    // heap before/after the catch-up (post-GC), the "memory flat in
    // backlog depth" witness: the feed plan and the delete-key collects
    // must be window-bounded, so the catch-up's heap DELTA must not
    // scale with srcVersions (the before number carries whatever the
    // history build itself retained)
    val heapBeforeMb = heapMb()
    val t0 = System.nanoTime()
    val q = TableLog.mirror(spark, src, dst, "id", ck)
    q.processAllAvailable()
    val catchupSec = (System.nanoTime() - t0) / 1e9
    val heapUsedMb = heapMb()

    val t1 = System.nanoTime()
    (backlogVersions until backlogVersions + liveRounds).foreach { v =>
      commitRound(v)
      q.processAllAvailable()
    }
    val liveSec = (System.nanoTime() - t1) / 1e9
    q.stop()

    def canon(dir: String): java.math.BigDecimal =
      TableLog.read(spark, dir)
        .select(xxhash64($"id", $"v").cast("decimal(38,0)").as("h"))
        .agg(sum($"h")).head().getDecimal(0)
    val ok = canon(src) == canon(dst) &&
      TableLog.rows(spark, src) == TableLog.rows(spark, dst)
    val sign = if (ok) 1 else -1
    val srcRows = TableLog.rows(spark, src)

    println(f"""{"mirror_catchup_sec":${sign * catchupSec}%.2f,"mirror_catchup_versions":$srcVersions,"mirror_catchup_versions_per_sec":${sign * srcVersions / catchupSec}%.1f,"mirror_catchup_sec_per_version":${sign * catchupSec / srcVersions}%.4f,"mirror_live_rounds_per_sec":${sign * liveRounds / liveSec}%.2f,"mirror_live_sec_per_round":${sign * liveSec / liveRounds}%.2f,"rows_per_version":$rowsPerV,"source_rows":$srcRows,"driver_heap_before_mb":$heapBeforeMb,"driver_heap_used_mb":$heapUsedMb,"match":$ok}""")

    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
