package graft.sources.net

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal MQTT 3.1.1 client — the subset the reference's surface needs:
  * `from_mqtt` CONNECTs and SUBSCRIBEs to one topic, emitting each PUBLISH
  * payload (sources.py:879-932); `to_mqtt` CONNECTs and PUBLISHes one
  * QoS-0 message per event (sinks.py:235-273). No QoS>0, no retained
  * messages, no TLS, no auth beyond optional username/password — matching
  * the reference's defaults (paho `Client()` + `publish(topic, x)`).
  *
  * Packet framing (MQTT 3.1.1 spec §2): fixed header byte (type<<4 |
  * flags), remaining-length varint, then the type's variable header +
  * payload. Strings are 2-byte-BE-length-prefixed UTF-8.
  */
object Mqtt {

  private[net] def encodeRemainingLength(n0: Int): Array[Byte] = {
    var n = n0
    val out = Vector.newBuilder[Byte]
    var continue = true
    while (continue) {
      var digit = n % 128
      n /= 128
      if (n > 0) digit |= 0x80 else continue = false
      out += digit.toByte
    }
    out.result().toArray
  }

  private[net] def readRemainingLength(in: InputStream): Int = {
    var multiplier = 1
    var value = 0
    var digit = 0
    do {
      digit = in.read()
      if (digit < 0) throw new java.io.EOFException("mqtt peer closed")
      value += (digit & 0x7F) * multiplier
      multiplier *= 128
    } while ((digit & 0x80) != 0)
    value
  }

  private[net] def mqttString(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xFF).toByte) ++ b
  }

  private[net] def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new java.io.EOFException("mqtt peer closed mid-packet")
      off += r
    }
    b
  }

  private[net] def writePacket(out: OutputStream, typeAndFlags: Int, body: Array[Byte]): Unit = {
    out.write(typeAndFlags)
    out.write(encodeRemainingLength(body.length))
    out.write(body)
    out.flush()
  }

  /** One connected client. `clientId` must be broker-unique. */
  final class Client(host: String, port: Int, clientId: String,
      user: Option[String] = None, pw: Option[String] = None,
      keepaliveSecs: Int = 60) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), 10000)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private val in = new BufferedInputStream(sock.getInputStream)

    locally { // CONNECT → CONNACK
      val flags = 0x02 | // clean session
        user.map(_ => 0x80).getOrElse(0) | pw.map(_ => 0x40).getOrElse(0)
      val body = mqttString("MQTT") ++ Array[Byte](4 /* 3.1.1 */ , flags.toByte,
        (keepaliveSecs >> 8).toByte, (keepaliveSecs & 0xFF).toByte) ++
        mqttString(clientId) ++
        user.map(mqttString).getOrElse(Array.empty[Byte]) ++
        pw.map(mqttString).getOrElse(Array.empty[Byte])
      writePacket(out, 0x10, body)
      val (t, ack) = readPacket()
      require(t == 2 && ack.length >= 2 && ack(1) == 0,
        s"mqtt CONNECT refused (type=$t rc=${if (ack.length >= 2) ack(1) else -1})")
    }

    /** (packetType, body) of the next control packet. */
    private def readPacket(): (Int, Array[Byte]) = {
      val b0 = in.read()
      if (b0 < 0) throw new java.io.EOFException("mqtt peer closed")
      val len = readRemainingLength(in)
      (b0 >> 4, readFully(in, len))
    }

    /** QoS-0 publish (fire and forget — the reference's `client.publish`). */
    def publish(topic: String, payload: String): Unit = synchronized {
      writePacket(out, 0x30, mqttString(topic) ++ payload.getBytes(StandardCharsets.UTF_8))
    }

    /** SUBSCRIBE (QoS 0) then deliver every PUBLISH payload to `onMessage`
      * until [[close]]; runs the read loop on the calling thread.
      */
    def subscribeAndListen(topic: String)(onMessage: String => Unit): Unit = {
      synchronized {
        val body = Array[Byte](0, 1 /* packet id 1 */) ++ mqttString(topic) ++ Array[Byte](0)
        writePacket(out, 0x82, body) // SUBSCRIBE has reserved flags 0b0010
      }
      var suback = false
      try {
        while (true) {
          val (t, body) = readPacket()
          t match {
            case 9 => suback = true // SUBACK
            case 3 => // PUBLISH (QoS 0): topic string then payload
              require(suback, "mqtt PUBLISH before SUBACK")
              val topicLen = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
              val payload = body.drop(2 + topicLen)
              onMessage(new String(payload, StandardCharsets.UTF_8))
            case _ => () // PINGRESP etc.: ignore
          }
        }
      } catch { case _: java.io.IOException => () /* closed */ }
    }

    def close(): Unit = {
      try synchronized { writePacket(out, 0xE0, Array.empty) } // DISCONNECT
      catch { case _: java.io.IOException => () }
      sock.close()
    }
  }
}
