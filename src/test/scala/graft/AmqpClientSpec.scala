package graft

import graft.model.Cdc
import graft.sinks.{AmqpClient, SinkAdapters}
import graft.sinks.AmqpClient.AmqpRequest
import java.io.{BufferedInputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The AMQP 0-9-1 client driven against a scripted loopback broker: the
  * full handshake (protocol header, Start/StartOk with SASL PLAIN,
  * Tune/TuneOk, Open, channel, Confirm.Select), Basic.Publish method +
  * content-header + body frame triples parsed by an INDEPENDENT
  * server-side decoder, publisher confirms (single and `multiple`
  * acks), and nack/close failure modes. Zero egress: 127.0.0.1 only.
  */
class AmqpClientSpec extends SparkSpec {

  /** One recorded publish: exchange, routing key, message id, body. */
  private final case class Pub(exchange: String, routingKey: String,
      messageId: String, contentType: String, body: String)

  private final class ScriptedBroker(nackAfter: Int = Int.MaxValue,
      multipleAcks: Boolean = false) {
    val published = new ConcurrentLinkedQueue[Pub]()
    @volatile var sawPlainAuth = ""
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private def frame(t: Int, ch: Int, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(7 + payload.length + 1)
      b.put(t.toByte).putShort(ch.toShort).putInt(payload.length)
        .put(payload).put(0xCE.toByte)
      b.array()
    }
    private def method(c: Int, m: Int, args: Array[Byte]): Array[Byte] =
      ByteBuffer.allocate(4).putShort(c.toShort).putShort(m.toShort)
        .array() ++ args
    private def shortstr(s: String): Array[Byte] =
      Array(s.length.toByte) ++ s.getBytes(UTF_8)
    private def readShortstr(b: ByteBuffer): String = {
      val n = b.get() & 0xFF
      val arr = new Array[Byte](n); b.get(arr)
      new String(arr, UTF_8)
    }

    private val thread = new Thread(() => {
      while (running) {
        var sock: Socket = null
        try {
          sock = server.accept()
          val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
          val out = new DataOutputStream(sock.getOutputStream)
          val hdr = new Array[Byte](8); in.readFully(hdr)
          require(new String(hdr.take(4), UTF_8) == "AMQP")
          // Connection.Start: versions + empty server props + mechanisms + locales
          out.write(frame(1, 0, method(10, 10,
            Array[Byte](0, 9) ++ ByteBuffer.allocate(4).putInt(0).array() ++
              ByteBuffer.allocate(4).putInt(5).array() ++ "PLAIN".getBytes(UTF_8) ++
              ByteBuffer.allocate(4).putInt(5).array() ++ "en_US".getBytes(UTF_8))))
          out.flush()
          var deliveryTag = 0L
          var pendingExchange: Option[(String, String)] = None
          var pendingMeta: Option[(String, String, Long)] = None
          var done = false
          while (!done) {
            val t = in.readUnsignedByte()
            in.readUnsignedShort() // channel
            val len = in.readInt()
            val payload = new Array[Byte](len); in.readFully(payload)
            require(in.readUnsignedByte() == 0xCE)
            t match {
              case 1 =>
                val b = ByteBuffer.wrap(payload)
                val c = b.getShort.toInt
                val m = b.getShort.toInt
                (c, m) match {
                  case (10, 11) => // StartOk: props table, mechanism, response
                    val tlen = b.getInt; b.position(b.position() + tlen)
                    val mech = readShortstr(b)
                    require(mech == "PLAIN", mech)
                    val rlen = b.getInt
                    val resp = new Array[Byte](rlen); b.get(resp)
                    sawPlainAuth = new String(resp, UTF_8)
                    out.write(frame(1, 0, method(10, 30, // Tune
                      ByteBuffer.allocate(8).putShort(2047.toShort)
                        .putInt(131072).putShort(60).array())))
                    out.flush()
                  case (10, 31) => () // TuneOk
                  case (10, 40) =>
                    out.write(frame(1, 0, method(10, 41, shortstr(""))))
                    out.flush()
                  case (20, 10) =>
                    out.write(frame(1, 1, method(20, 11,
                      ByteBuffer.allocate(4).putInt(0).array())))
                    out.flush()
                  case (85, 10) =>
                    out.write(frame(1, 1, method(85, 11, Array.emptyByteArray)))
                    out.flush()
                  case (60, 40) =>
                    b.getShort // reserved
                    val ex = readShortstr(b)
                    val rk = readShortstr(b)
                    pendingExchange = Some((ex, rk))
                  case (10, 50) => done = true // Connection.Close
                  case _ => ()
                }
              case 2 => // content header: class, weight, size, flags, props
                val b = ByteBuffer.wrap(payload)
                b.getShort; b.getShort
                val bodySize = b.getLong
                val flags = b.getShort & 0xFFFF
                var contentType = ""
                if ((flags & 0x8000) != 0) contentType = readShortstr(b)
                if ((flags & 0x2000) != 0) {
                  val tl = b.getInt; b.position(b.position() + tl)
                }
                var messageId = ""
                if ((flags & 0x0080) != 0) messageId = readShortstr(b)
                pendingMeta = Some((contentType, messageId, bodySize))
              case 3 =>
                val (ex, rk) = pendingExchange.get
                val (ct, mid, size) = pendingMeta.get
                require(payload.length.toLong == size)
                published.add(Pub(ex, rk, mid, ct, new String(payload, UTF_8)))
                deliveryTag += 1
                if (published.size > nackAfter)
                  out.write(frame(1, 1, method(60, 120, // Basic.Nack
                    ByteBuffer.allocate(10).putLong(deliveryTag)
                      .put(0.toByte).put(0.toByte).array())))
                else if (!multipleAcks)
                  out.write(frame(1, 1, method(60, 80, // Basic.Ack
                    ByteBuffer.allocate(9).putLong(deliveryTag)
                      .put(0.toByte).array())))
                else if (deliveryTag % 5 == 0)
                  out.write(frame(1, 1, method(60, 80, // multiple ack
                    ByteBuffer.allocate(9).putLong(deliveryTag)
                      .put(1.toByte).array())))
                out.flush()
              case 8 => () // heartbeat
              case _ => ()
            }
          }
          sock.close()
        } catch { case _: Exception => if (sock != null) sock.close() }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; server.close() }
  }

  test("handshake + publish + per-message confirms over the live socket") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedBroker()
    try {
      val reqs = (1 to 20).map(i => AmqpRequest(s"m$i", "rk", "sequin",
        f"events.$i%02d", s"m$i", s"""{"n":$i}"""))
      val out = AmqpClient.deliver(spark.createDataset(reqs).repartition(1),
        "127.0.0.1", srv.port, user = "app", password = "s3cret").collect()
      assert(out.length == 20 && out.forall(_.ok))
      // SASL PLAIN carried NUL-separated user/pass
      assert(srv.sawPlainAuth == "\u0000app\u0000s3cret")
      val pubs = srv.published.asScala.toVector
      assert(pubs.length == 20)
      assert(pubs.forall(p => p.exchange == "sequin" &&
        p.contentType == "application/json"))
      // partition order preserved; message ids intact
      assert(pubs.map(_.routingKey) == pubs.map(_.routingKey).sorted)
      assert(pubs.map(_.messageId).toSet == reqs.map(_.message_id).toSet)
    } finally srv.stop()
  }

  test("multiple-flag confirms cover whole chunks") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedBroker(multipleAcks = true)
    try {
      val reqs = (1 to 25).map(i => AmqpRequest(s"m$i", "g", "ex", "rk",
        s"m$i", "{}"))
      val out = AmqpClient.deliver(spark.createDataset(reqs).repartition(1),
        "127.0.0.1", srv.port, chunkSize = 5).collect()
      assert(out.length == 25 && out.forall(_.ok))
    } finally srv.stop()
  }

  test("a broker nack fails the chunk closed; dead port = no_connection") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedBroker(nackAfter = 1)
    try {
      val reqs = (1 to 4).map(i => AmqpRequest(s"m$i", "g", "ex", "rk",
        s"m$i", "{}"))
      val out = AmqpClient.deliver(spark.createDataset(reqs).repartition(1),
        "127.0.0.1", srv.port, chunkSize = 4).collect()
      assert(out.forall(!_.ok))
      assert(out.exists(_.err.contains("nacked")))
      val cmds = AmqpClient.commands(AmqpClient.deliver(
          spark.createDataset(reqs).repartition(1), "127.0.0.1", srv.port,
          chunkSize = 4)).collect()
      assert(cmds.forall(_.kind == "nack"))
    } finally srv.stop()
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val out2 = AmqpClient.deliver(
      spark.createDataset(Seq(AmqpRequest("a", "g", "ex", "rk", "a", "{}")))
        .repartition(1), "127.0.0.1", dead).collect()
    assert(out2.forall(r => !r.ok && r.err == "no_connection"))
  }

  test("END TO END: the rabbitmq wire publishes with message_id identity") {
    implicit val s = spark
    val srv = new ScriptedBroker()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(15)
      val wire = SinkAdapters.rabbitmqWire(cdc, exchange = "sequin")
      val out = AmqpClient.deliver(AmqpClient.requests(wire),
        "127.0.0.1", srv.port).collect()
      assert(out.length == 15 && out.forall(_.ok))
      val pubs = srv.published.asScala.toVector
      assert(pubs.length == 15)
      // routing key mirrors the NATS subject shape
      assert(pubs.forall(_.routingKey.startsWith("sequin.postgres.")))
      val wireIds = wire.select("message_id").collect()
        .map(_.getString(0)).toSet
      assert(out.map(_.ack_id).toSet == wireIds)
      assert(pubs.map(_.messageId).toSet == wireIds)
    } finally srv.stop()
  }
}
