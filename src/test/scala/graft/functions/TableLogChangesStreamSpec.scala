package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STREAMING face of the change feed ([[TableLog.readTailChanges]] /
  * `readStream.format("tablelog").option("readChangeFeed", "true")`):
  * the same fold-equals-snapshot judge as the batch feed, delivered
  * through version offsets with checkpointed exactly-once restarts, and
  * loud on mid-stream drift (a mirror must re-pin). */
class TableLogChangesStreamSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_cdfs").toString + "/t"
  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft_cdfs_ck").toString

  private def rows(ids: Range, tag: String): DataFrame =
    ids.map(i => (i.toLong, tag)).toDF("id", "v").coalesce(1)

  private def canon(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("a mirror folded from the STREAMED feed equals readAt(v) at every version") {
    val dir = fresh()
    val out = ckpt() + "/out"
    val ck = ckpt()
    TableLog.appendBatch(rows(0 until 100, "b0"), dir, "r", 0L)   // v0
    TableLog.appendBatch(rows(100 until 200, "b1"), dir, "r", 1L) // v1
    TableLog.delete(spark, dir, col("id") < 30)                   // v2
    TableLog.appendBatch(rows(200 until 250, "b2"), dir, "r", 2L) // v3
    TableLog.restore(spark, dir, 2L)                              // v4
    TableLog.compact(spark, dir, 1L << 20)                        // v5
    val q = TableLog.readTailChanges(spark, dir, since = Some(-1L))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    try {
      q.processAllAvailable()
      // live commits keep flowing after the backlog
      TableLog.appendBatch(rows(300 until 310, "b3"), dir, "r2", 0L) // v6
      TableLog.delete(spark, dir, col("id") >= 305)                  // v7
      q.processAllAvailable()
    } finally q.stop()
    val feed = spark.read.parquet(out)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version"))
    for (v <- 0L to 7L) {
      val expected = TableLog.readAt(spark, dir, v)
      val upTo = feed.filter($"_commit_version" <= v)
      val apps = upTo.filter($"_change_type" === "append")
        .drop("_change_type", "_commit_version")
      val dels = upTo.filter($"_change_type" === "delete")
        .drop("_change_type", "_commit_version")
      assert(canon(apps.exceptAll(dels), Seq("id", "v")) ==
        canon(expected, Seq("id", "v")),
        s"streamed mirror diverges from readAt($v)")
    }
    // and the streamed multiset IS the batch feed's
    val batchFeed = TableLog.readChanges(spark, dir, -1L)._1.get
    assert(canon(feed, feed.columns.toSeq) ==
      canon(batchFeed, feed.columns.toSeq))
  }

  test("the streamed feed with updateImages tags an upsert's pairs; plain streams keep plain tags") {
    val dir = fresh()
    val out = ckpt() + "/out"
    val ck = ckpt()
    TableLog.appendBatch(rows(0 until 50, "old"), dir, "r", 0L) // v0
    TableLog.upsertByKey(spark, dir, rows(40 until 55, "new"), "id", "u", 0L) // v1
    val q = TableLog.readTailChanges(spark, dir, since = Some(-1L),
        updateKeyColumn = Some("id"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.read.parquet(out)
    val byType = feed.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("append" -> 55L, "update_preimage" -> 10L,
      "update_postimage" -> 10L), s"got $byType")
    // and the batch face agrees exactly
    val batchFeed = TableLog.readChangesWithUpdates(spark, dir, -1L,
      keyColumn = "id")._1.get
    assert(canon(feed, feed.columns.toSeq) ==
      canon(batchFeed, feed.columns.toSeq))
    // option validation is loud at load()
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("tablelog").option("readChangeFeed", "true")
        .option("updateImages", "true").option("since", "-1").load(dir)
    }
    assert(e.getMessage.contains("keyColumn"), e.getMessage)
  }

  test("checkpointed restart resumes the feed exactly once — deletes included") {
    val dir = fresh()
    val out = ckpt() + "/out"
    val ck = ckpt()
    TableLog.appendBatch(rows(0 until 100, "b0"), dir, "r", 0L)
    def start() = spark.readStream.format("tablelog")
      .option("readChangeFeed", "true").option("since", "-1")
      .load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 100L)
    // offline: an append and a delete land while the consumer is down
    TableLog.appendBatch(rows(100 until 150, "b1"), dir, "r", 1L)
    TableLog.delete(spark, dir, col("id") < 10)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val feed = spark.read.parquet(out)
      assert(feed.filter($"_change_type" === "append").count() == 150L)
      assert(feed.filter($"_change_type" === "delete").count() == 10L)
      val batchFeed = TableLog.readChanges(spark, dir, -1L)._1.get
      assert(canon(feed, feed.columns.toSeq) ==
        canon(batchFeed, feed.columns.toSeq),
        "restart re-emitted or lost change rows")
    } finally q2.stop()
  }

  test("pre-evolve windows align to the stream's pinned schema — never era-shaped rows under the wrong ordinals") {
    val dir = fresh()
    val out = ckpt() + "/out"
    val ck = ckpt()
    TableLog.appendBatch(rows(0 until 50, "b0"), dir, "r", 0L)  // v0 (id, v)
    TableLog.appendBatch(rows(50 until 90, "b1"), dir, "r", 1L) // v1 (id, v)
    val cur = TableLog.latest(spark, dir).get.schema.get
    TableLog.evolve(spark, dir, cur.add(                        // v2
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType, nullable = true)))
    TableLog.appendBatch(                                       // v3
      (90 until 100).map(i => (i.toLong, "b2", i.toLong * 2))
        .toDF("id", "v", "w").coalesce(1), dir, "r2", 0L)
    // a FRESH stream pins (id, v, w); maxVersionsPerTrigger=1 forces
    // windows that lie ENTIRELY before the evolve (toV <= pinnedAt, so
    // the drift guard is correctly silent) — their readChanges frames
    // are era-shaped (id, v) and must be null-filled to the pin, not
    // bound positionally under it
    val q = TableLog.readTailChanges(spark, dir, since = Some(-1L),
        maxVersionsPerTrigger = Some(1))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.read.parquet(out)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("id", "v", "w", "_change_type", "_commit_version"))
    assert(feed.count() == 100L)
    assert(feed.filter($"_commit_version" <= 1L && $"w".isNull).count() == 90L,
      "pre-evolve rows must null-fill the added column")
    assert(feed.filter($"_commit_version" === 3L)
      .select($"w").as[Long].collect().sorted.toSeq ==
      (90L until 100L).map(_ * 2),
      "post-evolve rows lost their real column values")
    assert(feed.select($"_change_type").distinct().as[String].collect()
      .toSeq == Seq("append"), "tag columns bound to wrong ordinals")
  }

  test("mid-stream evolve fails the change feed loudly; drift opt-out is rejected up front") {
    val dir = fresh()
    val ck = ckpt()
    TableLog.appendBatch(rows(0 until 10, "b0"), dir, "r", 0L)
    val q = TableLog.readTailChanges(spark, dir, since = Some(-1L))
      .writeStream.format("noop")
      .option("checkpointLocation", ck).outputMode("append").start()
    try {
      q.processAllAvailable()
      val cur = TableLog.latest(spark, dir).get.schema.get
      TableLog.evolve(spark, dir, cur.add(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType, nullable = true)))
      TableLog.appendBatch(
        (10 until 20).map(i => (i.toLong, "b1", i.toLong)).toDF("id", "v", "w")
          .coalesce(1), dir, "r2", 0L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("schema drift"), e.getCause.getMessage)
    } finally q.stop()
    val bad = intercept[IllegalArgumentException] {
      spark.readStream.format("tablelog")
        .option("readChangeFeed", "true")
        .option("failOnSchemaDrift", "false")
        .load(dir)
        .writeStream.format("noop").outputMode("append").start()
    }
    assert(bad.getMessage.contains("signal-only"), bad.getMessage)
  }
}
