package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TableLog.mirror]]: the generic change-feed consumer — a second
  * TableLog table that converges to the source through appends,
  * deletes, restores and compactions, exactly-once across restarts and
  * idempotent under foreachBatch's at-least-once replay. */
class MirrorSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mir_$tag").toString + "/t"

  private def rows(ids: Range, tag: String): DataFrame =
    ids.map(i => (i.toLong, tag)).toDF("id", "v").coalesce(1)

  private def canon(df: DataFrame): Seq[String] =
    df.select($"id", $"v").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("the mirror converges to the source through delete/restore/compact, across a restart") {
    val src = fresh("src")
    val dst = fresh("dst")
    val ck = java.nio.file.Files.createTempDirectory("graft_mir_ck").toString
    TableLog.appendBatch(rows(0 until 100, "b0"), src, "r", 0L)   // v0
    TableLog.appendBatch(rows(100 until 200, "b1"), src, "r", 1L) // v1
    TableLog.delete(spark, src, col("id") < 30)                   // v2
    val q1 = TableLog.mirror(spark, src, dst, "id", ck)
    try q1.processAllAvailable() finally q1.stop()
    assert(canon(TableLog.read(spark, dst)) == canon(TableLog.read(spark, src)))
    // offline source churn while the mirror is down: restore re-adds
    // the deleted rows, compact rewrites files without changing rows,
    // and fresh appends + another delete land on top
    TableLog.restore(spark, src, 1L)                              // v3
    TableLog.compact(spark, src, 1L << 20)                        // v4
    TableLog.appendBatch(rows(200 until 250, "b2"), src, "r", 2L) // v5
    TableLog.delete(spark, src, col("id") >= 240)                 // v6
    val q2 = TableLog.mirror(spark, src, dst, "id", ck)
    try {
      q2.processAllAvailable()
      val got = canon(TableLog.read(spark, dst))
      assert(got == canon(TableLog.read(spark, src)),
        s"mirror diverged after restart: ${got.length} rows")
      // exactly-once: no row committed twice across the two runs
      assert(TableLog.read(spark, dst).select($"id").distinct().count() ==
        TableLog.read(spark, dst).count())
    } finally q2.stop()
  }

  test("replaying a micro-batch is a no-op — update-shaped changes included") {
    val src = fresh("rsrc")
    val dst = fresh("rdst")
    TableLog.appendBatch(rows(0 until 50, "old"), src, "r", 0L)    // v0
    // an update shaped as delete-then-re-add of the SAME keys across
    // versions: the replay hazard is the re-run delete killing the
    // already-fenced re-add
    TableLog.delete(spark, src, col("id") < 10)                    // v1
    TableLog.appendBatch(rows(0 until 10, "new"), src, "r", 1L)    // v2
    val batch = TableLog.readChanges(spark, src, -1L)._1.get
    TableLog.applyChanges(spark, dst, "id", "mk", batch)
    val once = canon(TableLog.read(spark, dst))
    assert(once == canon(TableLog.read(spark, src)))
    assert(once.count(_.endsWith("|new")) == 10)
    // foreachBatch redelivers the identical batch after a crash
    TableLog.applyChanges(spark, dst, "id", "mk", batch)
    assert(canon(TableLog.read(spark, dst)) == once,
      "a replayed batch changed the mirror")
    assert(TableLog.latest(spark, dst).get.commits("mk") == 2L)
  }

  test("a source evolve fails the mirror loudly; the restart re-pins AND widens the mirror table") {
    val src = fresh("esrc")
    val dst = fresh("edst")
    val ck = java.nio.file.Files.createTempDirectory("graft_mir_eck").toString
    TableLog.appendBatch(rows(0 until 40, "b0"), src, "r", 0L)
    val q1 = TableLog.mirror(spark, src, dst, "id", ck)
    try {
      q1.processAllAvailable()
      val cur = TableLog.latest(spark, src).get.schema.get
      TableLog.evolve(spark, src, cur.add(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType, nullable = true)))
      TableLog.appendBatch(
        (40 until 50).map(i => (i.toLong, "b1", i.toLong)).toDF("id", "v", "w")
          .coalesce(1), src, "r2", 0L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("schema drift"), e.getCause.getMessage)
    } finally q1.stop()
    // the documented recovery — a plain restart — must WORK: the feed
    // re-pins (id, v, w) and the mirror's append path aligns the
    // add-only drift into dst as its own evolve instead of rejecting
    // every batch forever
    val q2 = TableLog.mirror(spark, src, dst, "id", ck)
    try {
      q2.processAllAvailable()
      val dstDf = TableLog.read(spark, dst)
      assert(dstDf.schema.fieldNames.toSeq == Seq("id", "v", "w"))
      assert(dstDf.count() == 50L)
      assert(dstDf.filter($"w".isNotNull).count() == 10L)
    } finally q2.stop()
  }

  test("a ledger strictly inside a replayed window never re-applies the prefix") {
    val src = fresh("psrc")
    val dst = fresh("pdst")
    TableLog.appendBatch(rows(0 until 50, "b0"), src, "r", 0L) // v0
    TableLog.delete(spark, src, col("id") < 10)                // v1
    TableLog.appendBatch(rows(50 until 80, "b1"), src, "r", 1L) // v2
    val feed = TableLog.readChanges(spark, src, -1L)._1.get
    // an older per-version applier (or a future partial one) left the
    // ledger MID-window: v0 applied, v1..v2 not
    TableLog.applyChanges(spark, dst, "id", "mk",
      feed.filter($"_commit_version" <= 0L))
    assert(TableLog.read(spark, dst).count() == 50L)
    // the engine replays the FULL window — the applied prefix must not
    // be re-netted (its rows are not in the net deletes, so re-applying
    // would duplicate them)
    TableLog.applyChanges(spark, dst, "id", "mk", feed)
    val got = TableLog.read(spark, dst)
    assert(got.count() == 70L, s"prefix re-applied: ${got.count()} rows")
    assert(got.select($"id").distinct().count() == 70L)
    assert(canon(got) == canon(TableLog.read(spark, src)))
  }

  test("a null delete key fails the mirror loudly instead of silently skipping the row") {
    val dst = fresh("ndst")
    TableLog.appendBatch(rows(0 until 10, "b0"), dst, "boot", 0L)
    val batch = Seq((Option.empty[Long], "x", "delete", 1L))
      .toDF("id", "v", "_change_type", "_commit_version")
    val e = intercept[IllegalArgumentException] {
      TableLog.applyChanges(spark, dst, "id", "mk", batch)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("a mirror that would apply deletes before any append fails loudly") {
    val src = fresh("dsrc")
    val dst = fresh("ddst")
    TableLog.appendBatch(rows(0 until 20, "b0"), src, "r", 0L)
    TableLog.delete(spark, src, col("id") < 5)
    // only the delete slice of the feed — the shape a mid-history
    // start would deliver first
    val delsOnly = TableLog.readChanges(spark, src, -1L)._1.get
      .filter($"_change_type" === "delete")
    val e = intercept[IllegalArgumentException] {
      TableLog.applyChanges(spark, dst, "id", "mk", delsOnly)
    }
    assert(e.getMessage.contains("before any append"), e.getMessage)
  }
}
