package graft.sources.net

import java.io.{BufferedInputStream, BufferedOutputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}

/** Test-only in-process MQTT 3.1.1 micro-broker: CONNECT→CONNACK,
  * SUBSCRIBE→SUBACK (all topics treated as matching — tests use one topic),
  * QoS-0 PUBLISH fan-out to every subscriber, PINGREQ→PINGRESP. Exists so
  * the mqtt source/sink specs run against a real socket protocol exchange
  * without a broker service in the container (the reference env-gates its
  * equivalent suites the same way).
  */
final class MiniMqttBroker {
  private val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile private var running = true
  private val subscribers =
    java.util.concurrent.ConcurrentHashMap.newKeySet[OutputStream]()

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "mini-mqtt-conn")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    }
  }, "mini-mqtt-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      var open = true
      while (open && running) {
        val b0 = in.read()
        if (b0 < 0) open = false
        else {
          val len = Mqtt.readRemainingLength(in)
          val body = Mqtt.readFully(in, len)
          (b0 >> 4) match {
            case 1 => // CONNECT
              Mqtt.writePacket(out, 0x20, Array[Byte](0, 0)) // CONNACK accepted
            case 8 => // SUBSCRIBE: echo packet id, grant QoS 0
              Mqtt.writePacket(out, 0x90, Array[Byte](body(0), body(1), 0))
              subscribers.add(out)
            case 3 => // PUBLISH: fan out verbatim to every subscriber
              subscribers.forEach { s =>
                try s.synchronized { Mqtt.writePacket(s, 0x30, body) }
                catch { case _: java.io.IOException => subscribers.remove(s) }
              }
            case 12 => Mqtt.writePacket(out, 0xD0, Array.empty) // PINGREQ
            case 14 => open = false // DISCONNECT
            case _ => ()
          }
        }
      }
    } catch { case _: java.io.IOException => () }
    finally { subscribers.remove(out); sock.close() }
  }

  def close(): Unit = { running = false; server.close() }
}
