package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Flow.pace (reference delay/rate_limit): first element passes promptly,
  * the rest are spaced by the interval via processing-time timers, order
  * and key independence hold.
  */
class FlowSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("pace: burst of 4 drains in seq order, spaced by the interval") {
    withRocksDBState {
      val in = MemoryStream[(Int, Long, String)]
      val out = Flow.pace(in.toDS(), intervalMs = 700)
      val q = out.toDF("key", "seq", "v").writeStream
        .format("memory").queryName("pace_t").outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        in.addData((1, 1L, "a"), (1, 2L, "b"), (1, 3L, "c"), (1, 4L, "d"))
        val t0 = System.nanoTime()
        def rows() = spark.table("pace_t").as[(Int, Long, String)].collect().toSeq
        val deadline = t0 + 30L * 1000 * 1000 * 1000
        var tFirst = -1L
        var tAll = -1L
        while (tAll < 0 && System.nanoTime() < deadline) {
          Thread.sleep(50)
          val n = rows().size
          if (n >= 1 && tFirst < 0) tFirst = System.nanoTime()
          if (n == 4) tAll = System.nanoTime()
        }
        assert(tAll > 0, s"only ${rows().size} of 4 emitted within the deadline")
        // 3 queued elements at 700 ms spacing: the drain must take
        // noticeably longer than one trigger; generous margin for CI load
        assert((tAll - tFirst) / 1e6 > 1000,
          s"burst drained in ${(tAll - tFirst) / 1e6} ms — not paced")
        assert(rows().sortBy(_._2) == rows(), "emission order != seq order")
        assert(rows().map(_._2) == Seq(1L, 2L, 3L, 4L))
      } finally stopQuiesced(q)
    }
  }

  test("pace: backlog and spacing state survive a restart from the checkpoint") {
    withRocksDBState {
      val src = java.nio.file.Files.createTempDirectory("graft_pace_src").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_pace_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("graft_pace_out").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
      def start() = {
        val ds = spark.readStream.schema(schema).parquet(src).as[(Int, Long, String)]
        // wide interval: the parquet-read polling below costs ~0.5 s per
        // probe, so the drain must be slow enough to observe mid-flight
        Flow.pace(ds, intervalMs = 6000)
          .toDF("key", "seq", "v")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append")
          .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      }
      def emitted() =
        try spark.read.parquet(out).as[(Int, Long, String)].collect().toSeq
        catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty } // no files yet
      Seq((1, 1L, "a"), (1, 2L, "b"), (1, 3L, "c"), (1, 4L, "d")).toDF("key", "seq", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val q1 = start()
      val deadline1 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (emitted().isEmpty && System.nanoTime() < deadline1) Thread.sleep(50)
      // measure BEFORE stopping: stopQuiesced may wait through several
      // triggers for a quiet gap, during which the drain keeps going
      val atObserve = emitted().size
      assert(atObserve >= 1 && atObserve < 4,
        s"want a partial drain while running, got $atObserve")
      stopQuiesced(q1)

      val q2 = start() // resume: queue, head pointer, nextFree recovered
      // timer-driven wake-ups alone need not schedule batches on a fully
      // idle restarted query — keep the stream live with a trickle on an
      // UNRELATED key (realistic: traffic never stops), which must not
      // disturb key 1's recovered backlog order or spacing
      val deadline2 = System.nanoTime() + 90L * 1000 * 1000 * 1000
      var tick = 100L
      while (emitted().count(_._1 == 1) < 4 && q2.exception.isEmpty &&
        System.nanoTime() < deadline2) {
        tick += 1
        Seq((2, tick, "t")).toDF("key", "seq", "v")
          .coalesce(1).write.mode("append").parquet(src)
        Thread.sleep(400)
      }
      assert(q2.exception.isEmpty, s"restart failed: ${q2.exception}")
      stopQuiesced(q2)
      val key1 = emitted().filter(_._1 == 1).sortBy(_._2)
      assert(key1.map(_._2) == Seq(1L, 2L, 3L, 4L), s"got $key1") // all, once, in order
    }
  }

  test("pace: draining a deep backlog reads O(1) amortized tail state per emission") {
    withRocksDBState {
      val n = 40
      val in = MemoryStream[(Int, Long, String)]
      // tiny window so the drain exercises many refills
      val out = Flow.pace(in.toDS(), intervalMs = 1, windowCap = 4)
      val q = out.toDF("key", "seq", "v").writeStream
        .format("memory").queryName("pace_reads").outputMode("append")
        .trigger(Trigger.ProcessingTime("25 milliseconds"))
        .start()
      try {
        Flow.stateRowsRead.reset()
        in.addData((1 to n).map(i => (1, i.toLong, "v" + i)))
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        def rows() = spark.table("pace_reads").as[(Int, Long, String)].collect().toSeq
        while (rows().size < n && System.nanoTime() < deadline) Thread.sleep(50)
        assert(rows().size == n)
        assert(rows().map(_._2).sorted == (1 to n).map(_.toLong))
        val reads = Flow.stateRowsRead.sum()
        // chunked-queue contract: every backlog element is read exactly
        // once (the input batch absorbs 4 straight into the window, the
        // other 36 go through chunks — ≤ n reads total). The round-6
        // ListState skip-pointer design paid ~3n here and Θ(n²/chunk)
        // asymptotically; a read-the-whole-queue-per-emission pacer ~n²/2.
        assert(reads <= n.toLong, s"$reads tail-entry reads for $n rows — not read-once")
      } finally stopQuiesced(q)
    }
  }

  test("pace: restart from a pre-r7 'ptr'+'queue' checkpoint fails loudly, not silently") {
    // The chunked-queue layout (COMPATIBILITY.md) cannot read the old
    // pacer state. The acceptable failure mode is a LOUD one: the
    // restarted query must fail, never run on and silently orphan the
    // parked backlog. Spark's transformWithState does NOT reject a
    // changed state-variable set by itself (measured), so Pacer carries
    // its own legacy-layout guard — this stub re-creates the old
    // layout's state variables, parks a backlog, restarts with the real
    // Pacer on the same checkpoint, and touches the key again.
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    final class OldLayoutPacer extends StatefulProcessor[Int, (Int, Long, String), (Int, Long, String)] {
      @transient private var ptr: ValueState[Long] = _
      @transient private var queue: ListState[(Long, String)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        ptr = getHandle.getValueState[Long]("ptr", Encoders.scalaLong, TTLConfig.NONE)
        queue = getHandle.getListState[(Long, String)]("queue",
          Encoders.product[(Long, String)], TTLConfig.NONE)
      }
      override def handleInputRows(key: Int, rows: Iterator[(Int, Long, String)],
          timerValues: TimerValues): Iterator[(Int, Long, String)] = {
        rows.foreach { case (_, seq, v) => queue.appendValue((seq, v)) } // park all
        ptr.update(0L)
        Iterator.empty
      }
    }
    withRocksDBState {
      val src = java.nio.file.Files.createTempDirectory("graft_oldpace_src").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_oldpace_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("graft_oldpace_out").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
      def source() = spark.readStream.schema(schema).parquet(src).as[(Int, Long, String)]
      Seq((1, 1L, "a"), (1, 2L, "b")).toDF("key", "seq", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val q1 = source().groupByKey(_._1)
        .transformWithState(new OldLayoutPacer, TimeMode.ProcessingTime(), OutputMode.Append())
        .toDF("key", "seq", "v")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      val deadline1 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.forall(_.numInputRows == 0) &&
        System.nanoTime() < deadline1) Thread.sleep(50)
      stopQuiesced(q1) // checkpoint now holds a parked backlog in the old layout
      assert(q1.exception.isEmpty, s"old-layout run failed: ${q1.exception}")

      val q2 = Flow.pace(source(), intervalMs = 100)
        .toDF("key", "seq", "v")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      // new traffic touches key 1 → the legacy-state guard must kill the
      // query before anything is emitted
      Seq((1, 5L, "e")).toDF("key", "seq", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val failed = try { q2.awaitTermination(30000); q2.exception.isDefined }
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
        finally { if (q2.isActive) stopQuiesced(q2) }
      assert(failed,
        "restart from an old-layout checkpoint ran instead of failing loudly")
      val emitted =
        try spark.read.parquet(out).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      assert(emitted == 0L, s"restarted query emitted $emitted rows from orphaned state")
    }
  }

  test("pace: keys are paced independently; interval 0 passes everything through") {
    withRocksDBState {
      val in = MemoryStream[(Int, Long, String)]
      val out = Flow.rateLimit(in.toDS(), intervalMs = 0)
      val q = out.toDF("key", "seq", "v").writeStream
        .format("memory").queryName("pace0_t").outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        in.addData((1, 1L, "a"), (2, 2L, "b"), (1, 3L, "c"), (2, 4L, "d"))
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var n = 0L
        while (n < 4 && System.nanoTime() < deadline) {
          Thread.sleep(50); n = spark.table("pace0_t").count()
        }
        assert(n == 4) // zero interval = no holding, both keys complete
      } finally stopQuiesced(q)
    }
  }

  test("buffer: a bursty 12-file backlog drains in bounded per-batch admissions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buffer").toString
    // the burst: 12 one-row files land before the query ever starts
    (0 until 12).foreach { i =>
      Seq(s"row-$i").toDF("value").coalesce(1)
        .write.mode("append").text(dir)
    }
    val buffered = graft.streaming.Flow.buffer(spark.readStream, 3).text(dir)
    val sinkName = "flow_buffer_sink"
    val q = buffered.writeStream.format("memory").queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      // every row arrived, nothing dropped (the no-overflow-loss contract)
      val got = spark.table(sinkName).as[String].collect().toSet
      assert(got == (0 until 12).map(i => s"row-$i").toSet)
      // and admission was bounded: ≥ ceil(12/3) batches, ≤ 3 rows each
      // (one row per file, so rows-per-batch IS files-per-trigger)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"backlog drained in ${batches.length} batches — admission not bounded")
      assert(batches.forall(_.numInputRows <= 3),
        s"a batch overran the buffer: ${batches.map(_.numInputRows).mkString(",")}")
      intercept[IllegalArgumentException](
        graft.streaming.Flow.buffer(spark.readStream, 0))
    } finally q.stop()
  }
}
