package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import graft.functions.native
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sketches must equal the batch kernels bit-for-bit on the
  * same data, however the stream is chunked into micro-batches — the
  * sketch merge laws (register max / counter add) are what make that
  * guarantee possible, and this spec is the tripwire that they hold
  * through Structured Streaming's state machinery.
  */
class SketchStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  // two hour-windows of users: window A (10:xx) sees u0..u39 (some twice),
  // window B (11:xx) sees u20..u49 — split mid-window across micro-batches
  private val batch1 = (0 until 40).map(i => (ts(i % 60), s"u$i")) ++
    (0 until 10).map(i => (ts(30 + i % 20), s"u$i"))
  private val batch2 = (20 until 50).map(i =>
    (Timestamp.valueOf(f"2026-01-01 11:${i % 60}%02d:00"), s"u$i")) ++
    (0 until 15).map(i => (ts(i), s"u$i")) // window-A stragglers, replayed users

  test("windowedDistinct: streaming estimate == batch sketch bits per window") {
    val in = MemoryStream[(Timestamp, String)]
    val out = Sketches.windowedDistinct(
      in.toDS().toDF("ts", "user"), "ts", "1 hour", "2 hours", Nil, $"user")
    val q = out.writeStream.format("memory").queryName("hll_win")
      .outputMode("complete").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("hll_win")
      .select($"window.start".cast("string"), $"distinct_est", $"nonzero_registers")
      .as[(String, Double, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap

    val batch = (batch1 ++ batch2).toDF("ts", "user")
      .groupBy(window($"ts", "1 hour"))
      .agg(native.hll_sketch($"user").as("sk"))
      .select($"window.start".cast("string"),
        native.hll_estimate($"sk"), native.hll_nonzero($"sk"))
      .as[(String, Double, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap

    assert(got == batch, s"streaming $got\nbatch $batch")
    assert(got.size == 2)
    // sanity: window A truly saw 40 distinct users
    val exactA = (batch1 ++ batch2).filter(_._1.toString.startsWith("2026-01-01 10"))
      .map(_._2).distinct.size
    assert(exactA == 40)
  }

  test("windowedFrequencies: streaming CMS point estimates == batch, across chunkings") {
    val in = MemoryStream[(Timestamp, String)]
    val out = Sketches.windowedFrequencies(
      in.toDS().toDF("ts", "tok"), "ts", "1 hour", "2 hours", Nil, $"tok")
    val q = out.writeStream.format("memory").queryName("cms_win")
      .outputMode("complete").start()
    try {
      // deliberately different chunking than the hll test: 3 adds
      in.addData(batch1.take(13): _*); q.processAllAvailable()
      in.addData(batch1.drop(13): _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val probes = Seq("u0", "u5", "u25", "u49", "nobody")
    def estimates(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.select($"window.start".cast("string").as("w"), $"cms")
        .crossJoin(probes.toDF("p"))
        .select($"w", $"p", native.cms_query($"cms", $"p").as("est"))
        .as[(String, String, Long)].collect()
        .map { case (w, p, e) => (w, p) -> e }.toMap

    val got = estimates(spark.table("cms_win"))
    val batch = estimates((batch1 ++ batch2).toDF("ts", "tok")
      .groupBy(window($"ts", "1 hour"))
      .agg(native.cms_sketch($"tok").as("cms")))
    assert(got == batch, s"streaming $got\nbatch $batch")

    // one-sided error vs true counts in window A
    val winA = (batch1 ++ batch2).filter(_._1.toString.startsWith("2026-01-01 10"))
    val exact = winA.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wA = got.keys.map(_._1).filter(_.startsWith("2026-01-01 10")).head
    probes.foreach(p =>
      assert(got((wA, p)) >= exact.getOrElse(p, 0L), s"under-count for $p"))
  }

  test("windowedHistogram: streaming bucket counts == batch logBucket histogram") {
    val vals = batch1.zipWithIndex.map { case ((t, _), i) => (t, (i * 37L + 1) % 5000 + 1) } ++
      batch2.zipWithIndex.map { case ((t, _), i) => (t, (1L << (i % 40)) + i) }
    val in = MemoryStream[(Timestamp, Long)]
    val q = Sketches.windowedHistogram(
      in.toDS().toDF("ts", "v"), "ts", "1 hour", "2 hours", Nil, $"v")
      .writeStream.format("memory").queryName("hist_win")
      .outputMode("complete").start()
    try {
      in.addData(vals.take(17): _*); q.processAllAvailable()
      in.addData(vals.drop(17): _*); q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.select($"window.start".cast("string"), $"bucket", $"c")
        .as[(String, Long, Long)].collect().toSet
    val got = rows(spark.table("hist_win"))
    val batch = rows(vals.toDF("ts", "v")
      .groupBy(window($"ts", "1 hour"),
        graft.functions.Sketches.logBucket($"v").as("bucket"))
      .agg(count(lit(1)).as("c")))
    assert(got == batch, s"streaming $got\nbatch $batch")
    // and the consumer-side walk brackets the true p50 per window
    val winA = vals.filter(_._1.toString.startsWith("2026-01-01 10")).map(_._2).sorted
    val p50 = winA((winA.size + 1) / 2 - 1)
    val histA = got.toSeq.filter(_._1.startsWith("2026-01-01 10"))
      .map { case (_, b, c) => (b, c) }.sortBy(_._1)
    val rank = (winA.size + 1) / 2
    val bucket = histA.scanLeft((0L, 0L)) { case ((_, cum), (b, c)) => (b, cum + c) }
      .find(_._2 >= rank).get._1
    val lo = Seq(bucket).toDF("b")
      .select(graft.functions.Sketches.bucketLo($"b")).as[Long].head()
    val hi = Seq(bucket).toDF("b")
      .select(graft.functions.Sketches.bucketHi($"b")).as[Long].head()
    assert(lo <= p50 && p50 <= hi, s"p50=$p50 outside [$lo,$hi]")
  }

  test("windowedDistinct state survives a checkpoint restart bit-for-bit") {
    // the sketch buffer lives in the state store between micro-batches —
    // a restart must recover the registers exactly, so the final window
    // estimate equals the batch bits over ALL rows, pre- and post-restart
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("graft_skrec_src").toString
    val ckpt = Files.createTempDirectory("graft_skrec_ckpt").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user", StringType)))
    def write(rows: Seq[(Timestamp, String)]): Unit =
      rows.toDF("ts", "user").coalesce(1).write.mode("append").parquet(src)
    def start() = Sketches.windowedDistinct(
        spark.readStream.schema(schema).parquet(src),
        "ts", "1 hour", "2 hours", Nil, $"user")
      .select($"window.start".cast("string").as("w"), $"distinct_est", $"nonzero_registers")
      .writeStream.format("memory").queryName("hll_rec")
      .option("checkpointLocation", ckpt).outputMode("complete").start()

    write(batch1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    write(batch2)
    val q2 = start(); q2.processAllAvailable()
    val got = spark.table("hll_rec").as[(String, Double, Long)].collect()
      .map { case (w, e, n) => w -> ((e, n)) }.toMap
    q2.stop()

    val batch = (batch1 ++ batch2).toDF("ts", "user")
      .groupBy(window($"ts", "1 hour"))
      .agg(native.hll_sketch($"user").as("sk"))
      .select($"window.start".cast("string"),
        native.hll_estimate($"sk"), native.hll_nonzero($"sk"))
      .as[(String, Double, Long)].collect()
      .map { case (w, e, n) => w -> ((e, n)) }.toMap
    assert(got == batch, s"restarted stream drifted: $got vs $batch")
  }

  test("tagBlocked: stream filtered by a batch-built bloom, no false negatives") {
    val blocked = (0 until 200).map(i => s"bad-$i")
    val bits = blocked.toDF("v")
      .agg(native.bloom_sketch($"v").as("bits"))

    val in = MemoryStream[String]
    val q = Sketches.tagBlocked(in.toDS().toDF("doc"), bits, $"doc")
      .writeStream.format("memory").queryName("bloom_tag")
      .outputMode("append").start()
    try {
      in.addData(blocked.take(50) ++ Seq("clean-1", "clean-2"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("bloom_tag").as[(String, Boolean)].collect().toMap
    blocked.take(50).foreach(b => assert(got(b), s"false negative for $b"))
    // the clean rows' verdicts must equal the batch kernel's (FPs allowed,
    // but only the deterministic ones the batch side also produces)
    val batchVerdict = Seq("clean-1", "clean-2").toDF("doc")
      .crossJoin(bits)
      .select($"doc", native.bloom_contains($"bits", $"doc"))
      .as[(String, Boolean)].collect().toMap
    Seq("clean-1", "clean-2").foreach(c => assert(got(c) == batchVerdict(c)))
  }
}
