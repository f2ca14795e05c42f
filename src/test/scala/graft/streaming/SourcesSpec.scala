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
}
