package graft.streaming

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming interval join must find EXACTLY the pairs the batch
  * join_range_band query finds on the same events — same key, same
  * inclusive µs band — including a pair that straddles a micro-batch
  * boundary (one side buffered in join state until the other arrives).
  *
  * The stream emits RAW matches (both orientations + self-pairs) and the
  * `a < b` canonicalization happens on the collected result: a cross-side
  * id predicate in the streaming plan would be pushed into the join
  * condition, where it defeats watermark state-constraint extraction
  * (see Joins.interval scaladoc).
  */
class JoinsStreamSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream-stream interval join == batch join_range_band pair set") {
    // (event_id, event_type, ts µs) in event-time order so batch 2 never
    // falls behind batch 1's watermark
    val rows = graft.Tables(spark, sf(), "events")
      .select($"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._3, r._1))
    val batch = SparkEntry.queries("join_range_band")(spark, sf())
      .as[(String, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no pairs — band too narrow")

    // split so a known qualifying pair straddles the boundary: its later
    // event opens batch 2 while its earlier one sits in batch 1's state
    val pos = rows.map(_._1).zipWithIndex.toMap
    val pair = batch.minBy(p => math.max(pos(p._2), pos(p._3)))
    val cut = math.max(pos(pair._2), pos(pair._3))
    assert(math.min(pos(pair._2), pos(pair._3)) < cut,
      s"degenerate pair positions for $pair")
    val (b1, b2) = rows.splitAt(cut)

    val inL = MemoryStream[(Long, String, Long)]
    val inR = MemoryStream[(Long, String, Long)]
    def side(in: MemoryStream[(Long, String, Long)]) =
      in.toDF().toDF("event_id", "event_type", "us")
        .withColumn("ts", timestamp_micros($"us"))
    val joined = Joins.interval(side(inL), side(inR),
        key = "event_type", tsCol = "ts", bandSeconds = 60)
      .select(expr("l.event_type").as("event_type"),
        expr("l.event_id").as("event_a"), expr("r.event_id").as("event_b"),
        abs(expr("l.us") - expr("r.us")).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName("ivj_t")
      .outputMode("append").start()
    try {
      inL.addData(b1.toSeq: _*); inR.addData(b1.toSeq: _*); q.processAllAvailable()
      inL.addData(b2.toSeq: _*); inR.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    // canonicalize driver-side: keep one orientation, drop self-pairs
    val got = spark.table("ivj_t")
      .as[(String, Long, Long, Long)].collect()
      .filter(p => p._2 < p._3).toSet
    assert(got == batch,
      s"stream pairs diverged: only-stream=${got -- batch} only-batch=${batch -- got}")
    // the planted cross-boundary pair came out of buffered join state
    assert(got.contains(pair), s"cross-boundary pair $pair missing")
  }
}
