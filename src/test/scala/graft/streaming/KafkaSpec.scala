package graft.streaming

import graft.SparkSuite

/** Kafka wrapper round trip, env-gated the same way the reference gates its
  * Kafka suite (tests/test_kafka.py:21 `STREAMZ_LAUNCH_KAFKA`): set
  * `GRAFT_LAUNCH_KAFKA=host:port` to a reachable broker to run; otherwise
  * the tests cancel with an explicit reason (visible in the report — not a
  * silent pass). The container this repo builds in has no broker and no
  * Kafka connector jars, so in CI these cancel by design; the wrappers
  * themselves are thin declarative config over Spark's Kafka source/sink.
  */
class KafkaSpec extends SparkSuite {
  import spark.implicits._

  private val bootstrap = sys.env.get("GRAFT_LAUNCH_KAFKA")

  test("kafka: to_kafka → from_kafka round trip (gated: GRAFT_LAUNCH_KAFKA)") {
    assume(bootstrap.isDefined,
      "set GRAFT_LAUNCH_KAFKA=host:port to run the Kafka round trip")
    val bs = bootstrap.get
    val topic = s"graft_rt_${System.currentTimeMillis()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kafka_ckpt").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    in.addData("k1", "k2", "k3")
    val toQ = Sinks.kafka(
      in.toDS().toDF("value").selectExpr("CAST(null AS STRING) AS key", "value"),
      bs, topic, ckpt)
    toQ.processAllAvailable()

    val fromQ = Sources.kafka(spark, bs, topic, startingOffsets = "earliest")
      .selectExpr("CAST(value AS STRING) AS value")
      .writeStream.format("memory").queryName("kafka_rt").outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var got = Seq.empty[String]
      while (got.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        got = spark.table("kafka_rt").as[String].collect().toSeq
      }
      assert(got.sorted == Seq("k1", "k2", "k3"))
    } finally { fromQ.stop(); toQ.stop() }
  }

  test("kafkaConfirmed: delivery acks appear after produce (gated: GRAFT_LAUNCH_KAFKA)") {
    assume(bootstrap.isDefined,
      "set GRAFT_LAUNCH_KAFKA=host:port to run the Kafka ack round trip")
    val bs = bootstrap.get
    val topic = s"graft_ack_${System.currentTimeMillis()}"

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    in.addData("a1", "a2")
    val h = Sinks.kafkaConfirmed(
      in.toDS().toDF("value").selectExpr("CAST(null AS STRING) AS key", "value"),
      bs, topic)
    try {
      h.query.processAllAvailable()
      in.addData("a3")
      h.query.processAllAvailable()
      assert(h.acks.map(_.records).sum == 3)
      assert(h.acks.forall(_.topic == topic))
    } finally h.query.stop()
  }
}
