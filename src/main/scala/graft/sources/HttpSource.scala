package graft.sources

import java.io.InputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** streamz `from_http_server` (sources.py:273-329): an embedded HTTP
  * listener; each request body becomes one event, the client gets the
  * reference's same 200 acknowledgement once the event is buffered.
  *
  * Options: `port` (required), `host` (default 0.0.0.0), `path` (default /),
  * `numPartitions` (default 1 — a webhook trickle rarely needs more).
  *
  * ```scala
  * spark.readStream
  *   .format(classOf[graft.sources.HttpSourceProvider].getName)
  *   .option("port", 8080)
  *   .load()                      // → (value STRING, ts TIMESTAMP)
  * ```
  *
  * Delivery/scale contract: see [[PushSource]] — driver-side ingestion
  * edge, ack = buffered (not committed), so a driver crash can drop acked
  * events (the reference's tornado server has the same window between
  * `write("OK")` and downstream processing).
  */
class HttpSourceProvider extends PushTableProvider {
  override protected def sourceName: String = "graft-http"

  override protected def buildStream(options: CaseInsensitiveStringMap): PushMicroBatchStream = {
    val port = Option(options.get("port")).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("graft-http source requires option 'port'"))
    val host = Option(options.get("host")).getOrElse("0.0.0.0")
    val path = Option(options.get("path")).getOrElse("/")
    val parts = Option(options.get("numpartitions")).map(_.toInt).getOrElse(1)

    new PushMicroBatchStream(parts) {
      private var server: HttpServer = _
      private var pool: java.util.concurrent.ExecutorService = _

      private def readAll(in: InputStream): String = {
        val out = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](8192)
        var n = in.read(b)
        while (n >= 0) { out.write(b, 0, n); n = in.read(b) }
        new String(out.toByteArray, StandardCharsets.UTF_8)
      }

      override protected def startFeeder(): Unit = {
        server = HttpServer.create(new InetSocketAddress(host, port), 0)
        // without an executor the JDK server handles requests on its single
        // dispatch thread — concurrent webhook posts would serialize acks
        pool = java.util.concurrent.Executors.newFixedThreadPool(8,
          r => { val t = new Thread(r, "graft-http-handler"); t.setDaemon(true); t })
        server.setExecutor(pool)
        server.createContext(path, (exchange: HttpExchange) => {
          try {
            val body = readAll(exchange.getRequestBody)
            push(body)
            val ack = "ok".getBytes(StandardCharsets.UTF_8)
            exchange.sendResponseHeaders(200, ack.length.toLong)
            exchange.getResponseBody.write(ack)
          } finally exchange.close()
        })
        server.start()
      }

      override protected def stopFeeder(): Unit = {
        if (server != null) server.stop(0)
        if (pool != null) pool.shutdown() // else 8 threads leak per query
      }
    }
  }
}
