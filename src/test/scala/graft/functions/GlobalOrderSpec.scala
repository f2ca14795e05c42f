package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSuite {
  import spark.implicits._

  test("withRowNumber (offsets path) matches the window ROW_NUMBER") {
    val e = spark.read.parquet(s"${sf()}/events.parquet")
      .select($"event_id", $"user_id").repartition(8)
    val got = GlobalOrder.withRowNumber(e, "rn", $"event_id")
      .select($"event_id", $"rn").as[(Long, Long)].collect().toMap
    val want = e.withColumn("rn", row_number().over(Window.orderBy($"event_id")))
      .select($"event_id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("slice (rank-bounded path) matches withRowNumber + filter, incl. edge ranks") {
    val e = spark.read.parquet(s"${sf()}/events.parquet")
      .select($"event_id", $"user_id").repartition(8)
    for ((lo, hi) <- Seq((100L, 200L), (0L, 1L), (0L, 50L))) {
      val got = GlobalOrder.slice(e, "rn", lo, hi, $"event_id")
        .select($"event_id", $"rn").as[(Long, Long)].collect().toSet
      val want = GlobalOrder.withRowNumber(e, "rn", $"event_id")
        .filter($"rn" > lo && $"rn" <= hi)
        .select($"event_id", $"rn").as[(Long, Long)].collect().toSet
      assert(got == want, s"lo=$lo hi=$hi")
      assert(got.size == (hi - lo).min(e.count() - lo).max(0L), s"lo=$lo hi=$hi size")
    }
  }

  test("slice beyond MaxTake falls back to the parallel numbering path") {
    val e = spark.read.parquet(s"${sf()}/events.parquet")
      .select($"event_id").repartition(8)
    val big = GlobalOrder.slice(e, "rn", 0L, GlobalOrder.MaxTake + 1, $"event_id")
    assert(!big.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(big.count() == math.min(GlobalOrder.MaxTake + 1, e.count()))
  }

  test("multi-split input takes the plan with no single-partition window") {
    val e = spark.read.parquet(s"${sf()}/events.parquet").repartition(8)
    val numbered = GlobalOrder.withRowNumber(e, "rn", $"event_id")
    // the range shuffle + zipWithIndex live in the RDD lineage; the SQL
    // plan must contain no WindowExec at all
    assert(!numbered.queryExecution.executedPlan.toString.contains("Window ["),
      "unexpected WindowExec")
    assert(numbered.rdd.getNumPartitions > 1, "numbering must stay parallel")
  }

  test("1-split fallback emits no WindowExec partition warning (clean bench logs)") {
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import scala.jdk.CollectionConverters._
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender("graft-warn-capture", null, null, true,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        events.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      // 1-split input: the documented plain-window fallback runs — the
      // warning Sessions.local silences must NOT reach the logs
      val df = (1 to 100).map(i => (i * 13 % 100, i)).toDF("k", "v").coalesce(1)
      val rns = GlobalOrder.withRowNumber(df, "rn", col("k"), col("v"))
        .select($"rn").as[Long].collect().sorted
      assert(rns.toSeq == (1L to 100L))
      val offending = events.asScala.filter(_.contains("No Partition Defined"))
      assert(offending.isEmpty, s"WindowExec warning leaked: $offending")
    } finally {
      cfg.getRootLogger.removeAppender("graft-warn-capture")
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("withRowNumber is dense and 1-based across partitions") {
    val df = (1 to 1000).map(i => (i * 7 % 1000, i)).toDF("k", "payload")
    val rns = GlobalOrder.withRowNumber(df, "rn", col("k"), col("payload"))
      .select($"rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to 1000L))
  }
}
