package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** File-based source/sink surface (reference from_textfile/filenames,
  * sources.py:116-209; sink_to_textfile, sinks.py:76): new files in a
  * watched directory become events; the text sink writes exactly-once.
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("socket: line-delimited TCP source (reference from_tcp, sources.py:212)") {
    val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val done = new java.util.concurrent.CountDownLatch(1)
    // accept one client (the Spark socket source), push lines, then hold
    // the connection open until the assertions below have completed —
    // a fixed timer here would race a slow first micro-batch
    val pusher = new Thread(() => {
      val client = server.accept()
      val w = new java.io.PrintWriter(client.getOutputStream, true)
      Seq("one", "two", "three").foreach(w.println)
      w.flush()
      done.await(60, java.util.concurrent.TimeUnit.SECONDS)
      client.close(); server.close()
    })
    pusher.setDaemon(true); pusher.start()

    val q = Sources.socket(spark, "localhost", port)
      .writeStream.format("memory").queryName("sock_t").outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var got = Seq.empty[String]
      while (got.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("sock_t").as[String].collect().toSeq
      }
      assert(got.sorted == Seq("one", "three", "two"))
    } finally { q.stop(); done.countDown() }
  }

  test("httpServer: POSTed bodies become rows and are acked 200 " +
    "(reference from_http_server, tests/test_sources.py http cases)") {
    val port = { // find a free port, then hand it to the source
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    val q = Sources.httpServer(spark, port, host = "127.0.0.1")
      .writeStream.format("memory").queryName("http_t").outputMode("append").start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(body: String): Int = {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      // the server only comes up with the stream's first micro-batch plan;
      // retry the first POST until the listener answers
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var first = -1
      while (first != 200 && System.nanoTime() < deadline) {
        first = try post("alpha") catch { case _: java.net.ConnectException => Thread.sleep(100); -1 }
      }
      assert(first == 200)
      assert(post("beta") == 200)
      var got = Seq.empty[String]
      while (got.size < 2 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("http_t").select("value").as[String].collect().toSeq
      }
      assert(got.sorted == Seq("alpha", "beta"))
      // ts is a real arrival timestamp, usable for watermarking
      assert(spark.table("http_t").select("ts").schema.head.dataType.typeName == "timestamp")
    } finally q.stop()
  }

  test("process: subprocess stdout lines become rows " +
    "(reference from_process, sources.py:332-388)") {
    val q = Sources.process(spark, "printf 'l1\\nl2\\nl3\\n'")
      .writeStream.format("memory").queryName("proc_t").outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var got = Seq.empty[String]
      while (got.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("proc_t").select("value").as[String].collect().toSeq
      }
      assert(got == Seq("l1", "l2", "l3")) // stdout order is preserved
    } finally q.stop()
  }

  test("websocket round-trip: to_websocket sink (client) pushes into the " +
    "from_websocket source (server) — sources.py:798-838 + sinks.py:198-232") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    // source side: a listening websocket server, rows into a memory table
    val srcQ = Sources.webSocket(spark, port, host = "127.0.0.1")
      .writeStream.format("memory").queryName("ws_t").outputMode("append").start()
    val in = MemoryStream[String]
    var sinkQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // the ws server only binds with the source's first micro-batch plan;
      // wait for it before pointing the sink's client handshake at it
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var up = false
      while (!up && System.nanoTime() < deadline) {
        up = try { new java.net.Socket("127.0.0.1", port).close(); true }
        catch { case _: java.io.IOException => Thread.sleep(100); false }
      }
      assert(up, "websocket source server did not bind")
      // sink side: each element one masked text frame
      in.addData("w1", "w2", "w3")
      sinkQ = Sinks.websocket(in.toDS(), "127.0.0.1", port)
      sinkQ.processAllAvailable()
      var got = Seq.empty[String]
      while (got.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("ws_t").select("value").as[String].collect().toSeq
      }
      assert(got.sorted == Seq("w1", "w2", "w3"))
    } finally { if (sinkQ != null) sinkQ.stop(); srcQ.stop() }
  }

  test("mqtt round-trip: to_mqtt sink publishes through a broker to the " +
    "from_mqtt source — sources.py:879-932 + sinks.py:235-273") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val broker = new graft.sources.net.MiniMqttBroker
    // subscribe first: the mini broker (QoS 0, no retained messages) only
    // delivers messages published after the subscription, like the reference
    val srcQ = Sources.mqttSource(spark, "127.0.0.1", broker.port, "graft/t")
      .writeStream.format("memory").queryName("mqtt_t").outputMode("append").start()
    val in = MemoryStream[String]
    var sinkQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      // the source subscribes on its first micro-batch; give the SUBSCRIBE a
      // moment to land before publishing (QoS 0 has no catch-up)
      srcQ.processAllAvailable()
      Thread.sleep(500)
      in.addData("m1", "m2")
      sinkQ = Sinks.mqtt(in.toDS(), "127.0.0.1", broker.port, "graft/t")
      sinkQ.processAllAvailable()
      var got = Seq.empty[String]
      while (got.size < 2 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("mqtt_t").select("value").as[String].collect().toSeq
      }
      assert(got.sorted == Seq("m1", "m2"))
    } finally { if (sinkQ != null) sinkQ.stop(); srcQ.stop(); broker.close() }
  }

  test("periodic: rate ticks arrive with timestamp + value " +
    "(reference from_periodic/PeriodicDataFrame, sources.py:85)") {
    val q = Sources.periodic(spark, rowsPerSecond = 100)
      .writeStream.format("memory").queryName("rate_t").outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 10 && System.nanoTime() < deadline) {
        Thread.sleep(200); n = spark.table("rate_t").count()
      }
      assert(n >= 10)
      val cols = spark.table("rate_t").schema.map(f => f.name -> f.dataType.typeName).toMap
      assert(cols == Map("timestamp" -> "timestamp", "value" -> "long"))
    } finally q.stop()
  }

  test("random: demo source streams (timestamp, x, y, z) with the documented " +
    "distributions (reference Random/random_datablock, dataframe/core.py:1029-1074)") {
    val q = Sources.random(spark, rowsPerSecond = 200)
      .writeStream.format("memory").queryName("random_t").outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 100 && System.nanoTime() < deadline) {
        Thread.sleep(200); n = spark.table("random_t").count()
      }
      assert(n >= 100)
      val cols = spark.table("random_t").schema.map(f => f.name -> f.dataType.typeName).toMap
      assert(cols == Map("timestamp" -> "timestamp", "x" -> "double",
        "y" -> "long", "z" -> "double"))
      val rows = spark.table("random_t")
        .select("x", "y", "z").collect()
      assert(rows.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) < 1.0))
      assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 8L))
      assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
      // Poisson(1): ~37% zeros; uniform x: mean ~0.5 — loose 5-sigma-ish
      // envelopes at n >= 100, just enough to catch a wired-wrong column
      val zeroFrac = rows.count(_.getLong(1) == 0L).toDouble / rows.length
      assert(zeroFrac > 0.15 && zeroFrac < 0.6, s"P(y=0) = $zeroFrac")
      val xMean = rows.map(_.getDouble(0)).sum / rows.length
      assert(xMean > 0.3 && xMean < 0.7, s"mean(x) = $xMean")
    } finally q.stop()
  }

  test("textDir: appended files stream through as lines; text sink round-trips") {
    val src = Files.createTempDirectory("graft_txt_src").toString
    val out = Files.createTempDirectory("graft_txt_out").toString
    val ckpt = Files.createTempDirectory("graft_txt_ckpt").toString

    Files.writeString(Paths.get(src, "a.txt"), "alpha\nbeta\n")
    val lines = Sources.textDir(spark, src)
      .select(upper($"value").as("value")) // a map over the line stream
    val q = Sinks.files(lines, "text", out, ckpt)
    q.processAllAvailable()
    // a new file appearing in the directory is picked up incrementally
    Files.writeString(Paths.get(src, "b.txt"), "gamma\n")
    q.processAllAvailable(); q.stop()

    val got = spark.read.text(out).as[String].collect().sorted
    assert(got.toSeq == Seq("ALPHA", "BETA", "GAMMA"))
  }

  test("confirmed sink: one ack per delivered batch; failed delivery emits no ack " +
      "(reference to_kafka pushes responses downstream, sinks.py:115-195)") {
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val h = Sinks.confirmed(in.toDF(), "t1") { (batch, _) =>
      batch.collect().foreach(r => delivered.add(r.getString(0)))
    }
    in.addData("a", "b"); h.query.processAllAvailable()
    in.addData("c"); h.query.processAllAvailable()
    h.query.stop()
    assert(delivered.size == 3)
    assert(h.acks.map(_.records) == Vector(2L, 1L))
    assert(h.acks.map(_.topic).distinct == Vector("t1"))
    assert(h.acks.map(_.batchId) == h.acks.map(_.batchId).sorted) // epoch order

    // a write that throws must emit NO ack and fail the query (Spark then
    // re-runs the epoch on restart — at-least-once, like the reference's
    // produce retry loop). The failure is the behavior under test — mute
    // ERROR logging for its duration to keep logs clean.
    spark.sparkContext.setLogLevel("OFF")
    try {
      val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val h2 = Sinks.confirmed(in2.toDF(), "t2") { (_, _) =>
        throw new RuntimeException("broker unavailable")
      }
      in2.addData("x")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        h2.query.processAllAvailable()
      }
      assert(h2.acks.isEmpty)
    } finally spark.sparkContext.setLogLevel("WARN")
  }
}
