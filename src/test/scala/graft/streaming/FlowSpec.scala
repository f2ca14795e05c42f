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
}
