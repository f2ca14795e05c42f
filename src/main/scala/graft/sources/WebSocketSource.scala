package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.net.WebSocket

/** streamz `from_websocket` (sources.py:798-838): LISTEN on host:port;
  * every message any connected client pushes becomes one event. (The
  * reference is also the server side — `websockets.serve` — not a
  * subscriber.) Driver-side ingestion edge: see [[PushSource]].
  *
  * Options: `port` (required), `host` (default 0.0.0.0),
  * `numPartitions` (default 1).
  */
class WebSocketSourceProvider extends PushTableProvider {
  override protected def sourceName: String = "graft-websocket"

  override protected def buildStream(options: CaseInsensitiveStringMap): PushMicroBatchStream = {
    val port = Option(options.get("port")).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("graft-websocket source requires option 'port'"))
    val host = Option(options.get("host")).getOrElse("0.0.0.0")
    val parts = Option(options.get("numpartitions")).map(_.toInt).getOrElse(1)

    new PushMicroBatchStream(parts) {
      private var server: WebSocket.Server = _
      override protected def startFeeder(): Unit =
        server = new WebSocket.Server(host, port)(push)
      override protected def stopFeeder(): Unit =
        if (server != null) server.close()
    }
  }
}

/** streamz `from_mqtt` (sources.py:879-932): CONNECT to a broker,
  * SUBSCRIBE to one topic, emit each message's payload. The reference
  * emits MQTTMessage objects (topic/payload/timestamp); here `value` is
  * the payload and `ts` the arrival time — the schema every push source
  * shares ([[PushSource.Schema]]).
  *
  * Options: `host`, `port`, `topic` (required); `user`/`password`
  * (optional); `numPartitions` (default 1).
  */
class MqttSourceProvider extends PushTableProvider {
  override protected def sourceName: String = "graft-mqtt"

  override protected def buildStream(options: CaseInsensitiveStringMap): PushMicroBatchStream = {
    def req(k: String): String = Option(options.get(k))
      .getOrElse(throw new IllegalArgumentException(s"graft-mqtt source requires option '$k'"))
    val host = req("host")
    val port = req("port").toInt
    val topic = req("topic")
    val user = Option(options.get("user"))
    val pw = Option(options.get("password"))
    val parts = Option(options.get("numpartitions")).map(_.toInt).getOrElse(1)

    new PushMicroBatchStream(parts) {
      private var client: graft.sources.net.Mqtt.Client = _
      private var listener: Thread = _
      override protected def startFeeder(): Unit = {
        client = new graft.sources.net.Mqtt.Client(host, port,
          clientId = s"graft-src-${java.util.UUID.randomUUID().toString.take(8)}",
          user = user, pw = pw)
        listener = new Thread(() => client.subscribeAndListen(topic)(push),
          "graft-mqtt-feeder")
        listener.setDaemon(true)
        listener.start()
      }
      override protected def stopFeeder(): Unit = {
        if (client != null) client.close()
        if (listener != null) listener.join(2000)
      }
    }
  }
}
