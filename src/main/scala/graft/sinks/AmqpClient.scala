package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** The RabbitMQ delivery CLIENT — the socket half of the rabbitmq sink,
  * speaking AMQP 0-9-1 (the public protocol spec: frame = type(1)
  * channel(2) size(4) payload end(0xCE); connection/channel method
  * handshake; Basic.Publish = method frame + content-header frame +
  * body frame) with PUBLISHER CONFIRMS (Confirm.Select, then
  * Basic.Ack/Nack per delivery tag) so delivery is confirmed per
  * message, not fire-and-forget.
  *
  * Reference semantics (`/root/reference/lib/sequin/sinks/rabbitmq/
  * client.ex`): each routed message publishes to (exchange,
  * routing_key) with `message_id` + `content_type: application/json`
  * properties (`:49-64`), halting the batch on the first error
  * (`:18-30`); `test_connection` = TCP reachability + a live AMQP
  * handshake (`:33-46`). [[SinkAdapters.rabbitmqWire]] decides WHAT to
  * publish; this client owns the socket.
  *
  * Scale shape: one connection/channel per partition-task, publishes
  * pipelined within the partition with a confirm barrier per chunk
  * (ack of the chunk's last delivery tag, `multiple` covering the
  * rest), partitions in parallel across executors. Egress: dials only
  * the host it is given; the spec runs a scripted 127.0.0.1 broker.
  */
object AmqpClient {

  // ---- low-level encoding (network byte order) ---------------------------

  private def frame(ftype: Int, channel: Int, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(7 + payload.length + 1)
    buf.put(ftype.toByte).putShort(channel.toShort).putInt(payload.length)
      .put(payload).put(0xCE.toByte)
    buf.array()
  }

  private def shortstr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 255, s"shortstr too long: ${b.length}")
    Array(b.length.toByte) ++ b
  }

  private def longstr(b: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(4).putInt(b.length).array() ++ b

  /** Field table of string values ('S' longstr entries). */
  private def fieldTable(kvs: Seq[(String, String)]): Array[Byte] = {
    val body = kvs.flatMap { case (k, v) =>
      shortstr(k) ++ Array('S'.toByte) ++ longstr(v.getBytes(UTF_8))
    }.toArray
    ByteBuffer.allocate(4).putInt(body.length).array() ++ body
  }

  private def method(classId: Int, methodId: Int, args: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(4).putShort(classId.toShort)
      .putShort(methodId.toShort).array() ++ args

  /** Basic.Publish method payload (60,40): reserved, exchange,
    * routing-key, mandatory/immediate bits clear.
    */
  def publishMethod(exchange: String, routingKey: String): Array[Byte] =
    method(60, 40, Array[Byte](0, 0) ++ shortstr(exchange) ++
      shortstr(routingKey) ++ Array[Byte](0))

  /** Content HEADER payload for class 60: weight 0, body size, property
    * flags for content-type (bit 15), headers (13, when present) and
    * message-id (7), then the property values in flag order.
    */
  def contentHeader(bodySize: Long, messageId: String,
      headers: Seq[(String, String)]): Array[Byte] = {
    val withHeaders = headers.nonEmpty
    val flags = 0x8000 | (if (withHeaders) 0x2000 else 0) | 0x0080
    val props = shortstr("application/json") ++
      (if (withHeaders) fieldTable(headers) else Array.emptyByteArray) ++
      shortstr(messageId)
    ByteBuffer.allocate(14).putShort(60).putShort(0).putLong(bodySize)
      .putShort(flags.toShort).array() ++ props
  }

  // ---- connection --------------------------------------------------------

  final class Connection(host: String, port: Int, user: String = "guest",
      password: String = "guest", vhost: String = "/",
      timeoutMs: Int = 10000) extends AutoCloseable {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream))
    private var publishedTags = 0L
    private var confirmedTags = 0L

    // handshake: header → Start/StartOk → Tune/TuneOk → Open/OpenOk →
    // Channel.Open/OpenOk → Confirm.Select/SelectOk
    out.write("AMQP".getBytes(UTF_8) ++ Array[Byte](0, 0, 9, 1))
    out.flush()
    expectMethod(10, 10) // Connection.Start
    out.write(frame(1, 0, method(10, 11,
      fieldTable(Seq("product" -> "graft")) ++ shortstr("PLAIN") ++
        longstr(Array[Byte](0) ++ user.getBytes(UTF_8) ++
          Array[Byte](0) ++ password.getBytes(UTF_8)) ++
        shortstr("en_US"))))
    out.flush()
    private val tune = expectMethod(10, 30) // Connection.Tune
    private val frameMax = {
      val b = ByteBuffer.wrap(tune)
      b.getShort // channel-max
      val fm = b.getInt
      if (fm == 0) 131072 else math.min(fm, 131072)
    }
    out.write(frame(1, 0, method(10, 31,
      ByteBuffer.allocate(8).putShort(0).putInt(frameMax).putShort(0).array())))
    out.write(frame(1, 0, method(10, 40,
      shortstr(vhost) ++ shortstr("") ++ Array[Byte](0))))
    out.flush()
    expectMethod(10, 41) // Connection.OpenOk
    out.write(frame(1, 1, method(20, 10, shortstr(""))))
    out.flush()
    expectMethod(20, 11) // Channel.OpenOk
    out.write(frame(1, 1, method(85, 10, Array[Byte](0)))) // Confirm.Select
    out.flush()
    expectMethod(85, 11) // Confirm.SelectOk

    private def readFrame(): (Int, Int, Array[Byte]) = {
      val t = in.readUnsignedByte()
      val ch = in.readUnsignedShort()
      val len = in.readInt()
      val payload = new Array[Byte](len)
      in.readFully(payload)
      require(in.readUnsignedByte() == 0xCE, "missing frame-end octet")
      (t, ch, payload)
    }

    /** Read method frames until (classId, methodId); fail on
      * Connection.Close / Channel.Close, count Basic.Ack/Nack.
      */
    private def expectMethod(classId: Int, methodId: Int): Array[Byte] = {
      while (true) {
        val (t, _, payload) = readFrame()
        if (t == 1) {
          val b = ByteBuffer.wrap(payload)
          val c = b.getShort.toInt
          val m = b.getShort.toInt
          if (c == classId && m == methodId) {
            val rest = new Array[Byte](b.remaining())
            b.get(rest)
            return rest
          }
          (c, m) match {
            case (60, 80) => // Basic.Ack: tag u64 + multiple bit
              val tag = b.getLong
              val multiple = (b.get() & 1) == 1
              confirmedTags = if (multiple) tag else confirmedTags + 1
            case (60, 120) =>
              throw new java.io.IOException("broker nacked a publish")
            case (10, 50) | (20, 40) =>
              throw new java.io.IOException(
                s"broker closed: ${new String(payload, UTF_8).trim}")
            case _ => () // heartbeats handled by frame type below
          }
        } // type 8 = heartbeat: ignore
      }
      throw new IllegalStateException("unreachable")
    }

    /** Publish a chunk (method + header + single body frame each), then
      * block until the broker's confirms cover every tag in the chunk.
      */
    def publishChunk(msgs: Seq[(String, String, String, Seq[(String, String)], Array[Byte])]): Unit = {
      msgs.foreach { case (exchange, routingKey, messageId, headers, body) =>
        require(body.length + 8 < frameMax,
          s"body exceeds negotiated frame max: ${body.length}")
        out.write(frame(1, 1, publishMethod(exchange, routingKey)))
        out.write(frame(2, 1, contentHeader(body.length.toLong, messageId, headers)))
        out.write(frame(3, 1, body))
        publishedTags += 1
      }
      out.flush()
      while (confirmedTags < publishedTags) {
        val (t, _, payload) = readFrame()
        if (t == 1) {
          val b = ByteBuffer.wrap(payload)
          val c = b.getShort.toInt
          val m = b.getShort.toInt
          (c, m) match {
            case (60, 80) =>
              val tag = b.getLong
              val multiple = (b.get() & 1) == 1
              confirmedTags = if (multiple) tag else confirmedTags + 1
            case (60, 120) =>
              throw new java.io.IOException("broker nacked a publish")
            case (10, 50) | (20, 40) =>
              throw new java.io.IOException(
                s"broker closed: ${new String(payload, UTF_8).trim}")
            case _ => ()
          }
        }
      }
    }

    override def close(): Unit = {
      try {
        out.write(frame(1, 0, method(10, 50, // Connection.Close
          ByteBuffer.allocate(4).putShort(200).putShort(0).array() ++
            shortstr("bye") ++
            ByteBuffer.allocate(4).putShort(0).putShort(0).array())))
        out.flush()
      } catch { case _: Exception => () }
      socket.close()
    }
  }

  // ---- wire rows → delivery ----------------------------------------------

  final case class AmqpRequest(
      ack_id: String,
      group_id: String,
      exchange: String,
      routing_key: String,
      message_id: String,
      payload: String)

  final case class AmqpResult(
      ack_id: String,
      group_id: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.rabbitmqWire]] rows → publish requests; message_id
    * (= idempotency key) is the delivery identity, routing_key the
    * ordering group.
    */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[AmqpRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("exchange"),
        col("routing_key"), col("message_id"), col("payload"))
      .as[(String, String, String, String, String, String)]
      .map { case (ackId, groupId, ex, rk, mid, payload) =>
        AmqpRequest(ackId, groupId, ex, rk, mid, payload)
      }
  }

  def deliver(reqs: Dataset[AmqpRequest], host: String, port: Int,
      user: String = "guest", password: String = "guest",
      vhost: String = "/", timeoutMs: Int = 10000, chunkSize: Int = 50)(
      implicit spark: SparkSession): Dataset[AmqpResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conn =
          try Some(new Connection(host, port, user, password, vhost, timeoutMs))
          catch { case _: Exception => None }
        val results = Vector.newBuilder[AmqpResult]
        var broken: Option[String] = if (conn.isEmpty) Some("no_connection") else None
        it.grouped(chunkSize).foreach { chunk =>
          broken match {
            case Some(e) =>
              chunk.foreach(r =>
                results += AmqpResult(r.ack_id, r.group_id, ok = false, e))
            case None =>
              try {
                conn.get.publishChunk(chunk.map(r => (r.exchange,
                  r.routing_key, r.message_id, Nil, r.payload.getBytes(UTF_8))))
                chunk.foreach(r =>
                  results += AmqpResult(r.ack_id, r.group_id, ok = true, ""))
              } catch {
                case _: java.net.SocketTimeoutException =>
                  broken = Some("timeout")
                  chunk.foreach(r =>
                    results += AmqpResult(r.ack_id, r.group_id, ok = false, "timeout"))
                case e: java.io.IOException =>
                  broken = Some("no_connection")
                  chunk.foreach(r =>
                    results += AmqpResult(r.ack_id, r.group_id, ok = false,
                      Option(e.getMessage).filter(_.startsWith("broker"))
                        .getOrElse("no_connection")))
              }
          }
        }
        conn.foreach(c => try c.close() catch { case _: Exception => () })
        results.result().iterator
      }
    }
  }

  def commands(results: Dataset[AmqpResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
